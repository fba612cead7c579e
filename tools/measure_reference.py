"""Measure the reference binary's single-core genotyping throughput on
simulated bench-scale loci, writing tools/reference_baseline.json.

Usage: python tools/measure_reference.py [--binary /tmp/refbuild/HipSTR]
       [--loci 100] [--samples 3] [--reads 20]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--binary", default="/tmp/refbuild/HipSTR")
    ap.add_argument("--loci", type=int, default=100)
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--reads", type=int, default=20)
    args = ap.parse_args()

    if not os.path.exists(args.binary):
        print(f"reference binary not found at {args.binary}; "
              "build it first (see BASELINE.md)", file=sys.stderr)
        return 1

    with tempfile.TemporaryDirectory() as tmp:
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "make_golden_data.py"),
             tmp, "--loci", str(args.loci), "--samples", str(args.samples),
             "--reads", str(args.reads)],
            check=True)
        cmd = [args.binary, "--bams", os.path.join(tmp, "sim.bam"),
               "--fasta", os.path.join(tmp, "sim.fa"),
               "--regions", os.path.join(tmp, "regions.bed"),
               "--str-vcf", os.path.join(tmp, "out.vcf.gz"),
               "--use-unpaired", "--min-reads", "10", "--def-stutter-model",
               "--silent"]
        t0 = time.perf_counter()
        res = subprocess.run(cmd, capture_output=True, text=True)
        dt = time.perf_counter() - t0
        if res.returncode != 0:
            print(res.stderr[-2000:], file=sys.stderr)
            return 1
        loci_per_sec = args.loci / dt
        # shallow (20 reads/sample) keeps the legacy key names; the deep
        # 30x-coverage config (the headline workload, README.md:87 of the
        # reference: a deeply-sequenced trio) lands under *_deep keys so
        # bench.py reports vs_baseline for both
        deep = args.reads >= 100
        prefix = "ref_deep" if deep else "ref"
        out = {
            f"{prefix}_loci_per_sec": round(loci_per_sec, 3),
            f"{prefix}_wall_seconds": round(dt, 3),
            f"{prefix}_loci": args.loci,
            f"{prefix}_samples": args.samples,
            f"{prefix}_reads_per_sample": args.reads,
            "binary": args.binary,
            "note": "single-core reference binary, simulated trio-scale loci "
                    "(python tools/measure_reference.py)",
        }
        if not deep:
            out["ref_loci_per_sec"] = round(loci_per_sec, 3)
            out["wall_seconds"] = round(dt, 3)
            out["loci"] = args.loci
            out["samples"] = args.samples
            out["reads_per_sample"] = args.reads
        path = os.path.join(os.path.dirname(__file__),
                            "reference_baseline.json")
        merged = {}
        if os.path.exists(path):
            try:
                with open(path) as fh:
                    merged = json.load(fh)
            except Exception:
                merged = {}
        merged.update(out)
        with open(path, "w") as fh:
            json.dump(merged, fh, indent=2)
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
