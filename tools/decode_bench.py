"""Single-thread BAM decode+filter throughput of the native batch path.

VERDICT round-3 item 5 acceptance: >= 100 MB/s single-thread,
byte-identical reads (the identity part is pinned by
tests/test_fast_filter.py).  The measured path is what production runs
per locus: BGZF chunk-span bulk read (io/bam.py fetch_raw) + ONE
native/bam_filter.cpp call decoding every record and running the whole
filter cascade columnar (reference per-record path: htslib sam.c decode +
src/bam_processor.cpp:173-474 predicates).

Usage: python tools/decode_bench.py [dataset_dir]
       (defaults to a freshly simulated 40-locus x 20-sample x 30-read set)
       python tools/decode_bench.py --cram
         measures the native CRAM container decode path instead
         (native/cram_decode.cpp -> BAM bodies -> same filter cascade);
         VERDICT round-4 item 6 acceptance: >= 100 MB/s, byte-identical
         records (pinned by tests/test_cram.py).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import tempfile

    from hipstr_tpu import native
    from hipstr_tpu.io.bam import BamReader
    from hipstr_tpu.io.regions import read_regions
    from hipstr_tpu.pipeline.adapter_trimmer import (MAX_ERROR_RATE,
                                                     MIN_OVERLAP)
    from hipstr_tpu.pipeline.fast_filter import _ADAPTERS

    use_cram = "--cram" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--cram"]
    if args:
        d = args[0]
    else:
        from hipstr_tpu.utils.simulate import simulate_locus
        from tests.test_workers import _write_sim
        d = tempfile.mkdtemp(prefix="hipstr_decode_")
        locs = [simulate_locus(seed=61000 + i, n_samples=20,
                               reads_per_sample=30, period=1 + (i % 4),
                               ref_units=8 + (i % 3), chrom=f"chrD{i}")
                for i in range(40)]
        _write_sim(d, locs)

    assert native.available() and hasattr(native._load(), "bam_filter_batch")
    if use_cram:
        import subprocess
        gen = "/tmp/cramgen/bam2cram"
        assert os.path.exists(gen), "htslib bam2cram helper not built"
        if not os.path.exists(f"{d}/sim.cram"):
            subprocess.run([gen, f"{d}/sim.bam", f"{d}/sim.fa",
                            f"{d}/sim.cram", "3.0"], check=True)
        from hipstr_tpu.io.cram import CramReader
        rdr = CramReader(f"{d}/sim.cram", f"{d}/sim.fa")
    else:
        rdr = BamReader(f"{d}/sim.bam")
    regions = read_regions(f"{d}/regions.bed", 10 ** 9, "", None)
    fa = open(f"{d}/sim.fa").read().split(">")

    # pre-fetch raw blobs so the timed loop isolates decode+cascade
    work = []
    total_bytes = 0
    n_recs = 0
    chrom_seqs = {}
    for part in fa[1:]:
        name, _, seq = part.partition("\n")
        chrom_seqs[name.split()[0]] = seq.replace("\n", "").encode()
    for r in regions:
        raw = rdr.fetch_raw(r.chrom, max(0, r.start - 1000), r.stop + 1000)
        blob, offs, lens, rid = raw
        total_bytes += sum(lens)
        n_recs += len(offs)
        work.append((r, raw, chrom_seqs[r.chrom]))

    def run_all():
        out_n = 0
        if use_cram:
            for r, _raw, chrom_b in work:
                blob, offs, lens, rid = rdr.fetch_raw(
                    r.chrom, max(0, r.start - 1000), r.stop + 1000)
                o = native.bam_filter_batch_native(
                    blob, offs, lens, max(0, r.start - 1000), r.stop + 1000,
                    r.start, r.stop, rid, 0, max(1, r.start - 40),
                    r.stop + 40, chrom_b, 5, 15, 10, 7, True, _ADAPTERS,
                    MIN_OVERLAP, MAX_ERROR_RATE)
                out_n += len(o["status"])
            return out_n
        for r, (blob, offs, lens, rid), chrom_b in work:
            o = native.bam_filter_batch_native(
                blob, offs, lens, max(0, r.start - 1000), r.stop + 1000,
                r.start, r.stop, rid, 0, max(1, r.start - 40), r.stop + 40,
                chrom_b, 5, 15, 10, 7, True, _ADAPTERS, MIN_OVERLAP,
                MAX_ERROR_RATE)
            out_n += len(o["status"])
        return out_n

    run_all()                                 # warm
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        got = run_all()
        best = min(best, time.perf_counter() - t0)
    mb = total_bytes / 1e6
    print(f"decoded+filtered {n_recs} records ({mb:.1f} MB of BAM record "
          f"bytes) in {best * 1000:.0f} ms single-thread = "
          f"{mb / best:.0f} MB/s, {n_recs / best / 1e6:.2f} Mrec/s")


if __name__ == "__main__":
    main()
