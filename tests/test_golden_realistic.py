"""Golden comparison vs the reference binary on REALISTIC simulated reads.

Round-1 golden tests all used clean reads (uniform qualities, all-M
CIGARs, no contamination).  Real sequencing data brings artifacts that
exercise entirely different code paths: decaying quality curves with
quality-driven errors, N bases, soft-clipped read ends, adapter
read-through, MAPQ spread, XA multimappers, and PCR duplicates.  Genuinely
real BAMs are unreachable in this environment (zero egress), so this test
feeds both engines an identical artifact-bearing BAM
(utils/simulate._messy_record) and asserts the same read-level parity the
clean golden tests do (reference paths exercised:
src/bam_processor.cpp:173-474 filter cascade, src/adapter_trimmer.cpp,
src/pcr_duplicates.cpp, src/base_quality.cpp).

The reference is invoked once per chromosome to dodge its SetRegion
iterator-reuse bug (see test_golden_vs_reference.py docstring).
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # multi-minute suite (VERDICT r4 item 5)

REF_BINARY = "/tmp/refbuild/HipSTR"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

INT_FIELDS = {"DP", "DSNP", "DSTUTTER", "DFLANKINDEL", "DAB"}
EXACT_FIELDS = {"GT", "GB", "ALLREADS", "MALLREADS", "PSNP"}


def _compare(ref_recs, tpu_recs):
    assert len(ref_recs) == len(tpu_recs) > 0
    for rr, tr in zip(sorted(ref_recs), sorted(tpu_recs)):
        rf, tf = rr.split("\t"), tr.split("\t")
        assert rf[:5] == tf[:5], (rf[:5], tf[:5])
        fmt = rf[8].split(":")
        assert rf[8] == tf[8]
        for s in range(9, len(rf)):
            rparts = rf[s].strip().split(":")
            tparts = tf[s].strip().split(":")
            if rf[s].strip() == "." or tf[s].strip() == ".":
                assert rf[s].strip() == tf[s].strip(), (rf[0], rf[s], tf[s])
                continue
            assert len(rparts) == len(tparts)
            for name, rv, tv in zip(fmt, rparts, tparts):
                if rv == tv:
                    continue
                if name in EXACT_FIELDS or "." in (rv, tv):
                    assert rv == tv, (rf[0], name, rv, tv)
                elif name in INT_FIELDS:
                    assert int(rv) == int(tv), (rf[0], name, rv, tv)
                elif rv != "." and tv != ".":
                    # fast-math drift band (see test_golden_vs_reference)
                    for rx, tx in zip(rv.split("|"), tv.split("|")):
                        assert abs(float(rx) - float(tx)) <= 0.2, \
                            (rf[0], name, rv, tv)


@pytest.mark.skipif(not os.path.exists(REF_BINARY),
                    reason="reference binary not built")
def test_golden_realistic_reads(tmp_path):
    out = str(tmp_path)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_golden_data.py"),
         out, "--loci", "6", "--samples", "3", "--reads", "45",
         "--realistic", "--seed", "4242"], check=True)
    common = ["--use-unpaired", "--min-reads", "15", "--def-stutter-model"]

    chroms = sorted({l.split()[0] for l in open(f"{out}/regions.bed")})
    ref_recs = []
    for chrom in chroms:
        subprocess.run(
            [REF_BINARY, "--bams", f"{out}/sim.bam",
             "--fasta", f"{out}/sim.fa", "--regions", f"{out}/regions.bed",
             "--chrom", chrom, "--str-vcf", f"{out}/ref_{chrom}.vcf.gz",
             "--silent"] + common, check=True)
        from hipstr_tpu.io.bgzf import BgzfReader
        text = BgzfReader(f"{out}/ref_{chrom}.vcf.gz").read_all().decode()
        ref_recs.extend(l for l in text.splitlines() if not l.startswith("#"))

    env = dict(os.environ, PYTHONPATH=REPO)
    subprocess.run([sys.executable, "-m", "hipstr_tpu.cli",
                    "--bams", f"{out}/sim.bam", "--fasta", f"{out}/sim.fa",
                    "--regions", f"{out}/regions.bed",
                    "--str-vcf", f"{out}/tpu.vcf", "--dtype", "float64",
                    "--silent"] + common, check=True, env=env, cwd=REPO)

    tpu_recs = [l for l in open(f"{out}/tpu.vcf").read().splitlines()
                if not l.startswith("#")]
    _compare(ref_recs, tpu_recs)


@pytest.mark.skipif(not os.path.exists(REF_BINARY),
                    reason="reference binary not built")
def test_golden_deep_coverage(tmp_path):
    """Deep-coverage parity: 250 reads/sample (750 reads/locus) pushes the
    pooling, pruning and P-bucket padding paths the 20-read goldens never
    reach (reference guards allow up to 1e6 reads/locus,
    src/bam_processor.h:91-96)."""
    out = str(tmp_path)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_golden_data.py"),
         out, "--loci", "2", "--samples", "3", "--reads", "250",
         "--seed", "777"], check=True)
    common = ["--use-unpaired", "--min-reads", "20", "--def-stutter-model"]

    chroms = sorted({l.split()[0] for l in open(f"{out}/regions.bed")})
    ref_recs = []
    for chrom in chroms:
        subprocess.run(
            [REF_BINARY, "--bams", f"{out}/sim.bam",
             "--fasta", f"{out}/sim.fa", "--regions", f"{out}/regions.bed",
             "--chrom", chrom, "--str-vcf", f"{out}/ref_{chrom}.vcf.gz",
             "--silent"] + common, check=True)
        from hipstr_tpu.io.bgzf import BgzfReader
        text = BgzfReader(f"{out}/ref_{chrom}.vcf.gz").read_all().decode()
        ref_recs.extend(l for l in text.splitlines() if not l.startswith("#"))

    env = dict(os.environ, PYTHONPATH=REPO)
    subprocess.run([sys.executable, "-m", "hipstr_tpu.cli",
                    "--bams", f"{out}/sim.bam", "--fasta", f"{out}/sim.fa",
                    "--regions", f"{out}/regions.bed",
                    "--str-vcf", f"{out}/tpu.vcf", "--dtype", "float64",
                    "--silent"] + common, check=True, env=env, cwd=REPO)

    tpu_recs = [l for l in open(f"{out}/tpu.vcf").read().splitlines()
                if not l.startswith("#")]
    _compare(ref_recs, tpu_recs)


@pytest.mark.skipif(not os.path.exists(REF_BINARY),
                    reason="reference binary not built")
def test_golden_realistic_paired(tmp_path):
    """Paired-end realism: both mates carry quality curves, errors, and
    3'-end clips / adapter read-through — the configuration the
    reference's adapter trimmer and mate-pair machinery were built for
    (src/adapter_trimmer.cpp, bam_processor.cpp mate maps)."""
    out = str(tmp_path)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_golden_data.py"),
         out, "--loci", "4", "--samples", "3", "--reads", "45",
         "--paired", "--realistic", "--seed", "9191"], check=True)
    common = ["--min-reads", "15", "--def-stutter-model"]

    chroms = sorted({l.split()[0] for l in open(f"{out}/regions.bed")})
    ref_recs = []
    for chrom in chroms:
        subprocess.run(
            [REF_BINARY, "--bams", f"{out}/sim.bam",
             "--fasta", f"{out}/sim.fa", "--regions", f"{out}/regions.bed",
             "--chrom", chrom, "--str-vcf", f"{out}/ref_{chrom}.vcf.gz",
             "--silent"] + common, check=True)
        from hipstr_tpu.io.bgzf import BgzfReader
        text = BgzfReader(f"{out}/ref_{chrom}.vcf.gz").read_all().decode()
        ref_recs.extend(l for l in text.splitlines() if not l.startswith("#"))

    env = dict(os.environ, PYTHONPATH=REPO)
    subprocess.run([sys.executable, "-m", "hipstr_tpu.cli",
                    "--bams", f"{out}/sim.bam", "--fasta", f"{out}/sim.fa",
                    "--regions", f"{out}/regions.bed",
                    "--str-vcf", f"{out}/tpu.vcf", "--dtype", "float64",
                    "--silent"] + common, check=True, env=env, cwd=REPO)

    tpu_recs = [l for l in open(f"{out}/tpu.vcf").read().splitlines()
                if not l.startswith("#")]
    _compare(ref_recs, tpu_recs)
