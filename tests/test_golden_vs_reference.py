"""Golden comparison against the reference HipSTR binary.

Runs both the reference binary (if built at /tmp/refbuild/HipSTR — see
BASELINE.md) and our CLI on identical simulated BAM/FASTA/BED inputs and
compares VCFs: GT/GB exact, integer depths + read classifications exact,
float fields within the reference's fast-math log-sum-exp tolerance.

The reference is invoked once per chromosome (--chrom).  When it processes
multiple loci in one run, its BamCramReader leaks per-locus iterator state
across region switches: SetRegion (reference: src/bam_io.cpp:203-230)
updates chrom_/start_ and only afterwards evaluates
`reuse_offset = (... && chrom.compare(chrom_) == 0 && start >= start_)`,
which is then always true, so a stale min_offset_/first_aln_ from the
PREVIOUS locus is replayed into the next fetch.  The stale alignment
carries the previous chromosome's coordinates/bases, collides with the
same-named genuine read in read_and_filter_reads' mate maps, and knocks a
real read out of the analysis (observed as DP off by one and shifted
PDP/GLDIFF/MALLREADS).  Per-chromosome invocation avoids the bug and lets
this test assert exact read-level parity.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # multi-minute suite (VERDICT r4 item 5)

REF_BINARY = "/tmp/refbuild/HipSTR"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.path.exists(REF_BINARY),
                    reason="reference binary not built")
def test_golden_vcf_comparison(tmp_path):
    out = str(tmp_path)
    subprocess.run([sys.executable, os.path.join(REPO, "tools/make_golden_data.py"),
                    out, "--loci", "3", "--samples", "3", "--reads", "40"],
                   check=True)
    common = ["--use-unpaired", "--min-reads", "20", "--def-stutter-model"]

    chroms = sorted({l.split()[0] for l in open(f"{out}/regions.bed")})
    ref_recs = []
    for chrom in chroms:
        subprocess.run(
            [REF_BINARY, "--bams", f"{out}/sim.bam", "--fasta", f"{out}/sim.fa",
             "--regions", f"{out}/regions.bed", "--chrom", chrom,
             "--str-vcf", f"{out}/ref_{chrom}.vcf.gz", "--silent"] + common,
            check=True)
        from hipstr_tpu.io.bgzf import BgzfReader
        text = BgzfReader(f"{out}/ref_{chrom}.vcf.gz").read_all().decode()
        ref_recs.extend(l for l in text.splitlines() if not l.startswith("#"))

    env = dict(os.environ, PYTHONPATH=REPO)
    subprocess.run([sys.executable, "-m", "hipstr_tpu.cli",
                    "--bams", f"{out}/sim.bam", "--fasta", f"{out}/sim.fa",
                    "--regions", f"{out}/regions.bed",
                    "--str-vcf", f"{out}/tpu.vcf", "--dtype", "float64",
                    "--silent"] + common, check=True, env=env, cwd=REPO)

    tpu = open(f"{out}/tpu.vcf").read()
    tpu_recs = [l for l in tpu.splitlines() if not l.startswith("#")]
    assert len(ref_recs) == len(tpu_recs) > 0

    for rr, tr in zip(sorted(ref_recs), sorted(tpu_recs)):
        rf, tf = rr.split("\t"), tr.split("\t")
        # site-level columns
        assert rf[:5] == tf[:5], (rf[:5], tf[:5])
        fmt = rf[8].split(":")
        assert rf[8] == tf[8]
        int_fields = {"DP", "DSNP", "DSTUTTER", "DFLANKINDEL", "DAB"}
        exact_fields = {"GT", "GB", "ALLREADS", "MALLREADS", "PSNP"}
        for s in range(9, len(rf)):
            rparts = rf[s].strip().split(":")
            tparts = tf[s].strip().split(":")
            if rf[s].strip() == "." or tf[s].strip() == ".":
                assert rf[s].strip() == tf[s].strip()
                continue
            assert len(rparts) == len(tparts)
            for name, rv, tv in zip(fmt, rparts, tparts):
                if name in exact_fields:
                    assert rv == tv, (rf[0], name, rv, tv)
                elif name in int_fields:
                    assert int(rv) == int(tv), (rf[0], name, rv, tv)
                elif rv != "." and tv != ".":
                    # Q/PQ/AB/FS/GLDIFF/PDP: the reference uses the Mineiro
                    # fast-math log-sum-exp (src/mathops.cpp:86-106); we are
                    # exact.  0.2 bounds the observed fast-math drift.
                    for rx, tx in zip(rv.split("|"), tv.split("|")):
                        assert abs(float(rx) - float(tx)) <= 0.2, \
                            (rf[0], name, rv, tv)


@pytest.mark.skipif(not os.path.exists(REF_BINARY),
                    reason="reference binary not built")
def test_golden_snp_phasing_comparison(tmp_path):
    """Phased-SNP mode: the reference binary consumes OUR bgzip+tabix SNP
    VCF; DSNP/PSNP/PQ/PDP and all genotype fields must match."""
    out = str(tmp_path)
    subprocess.run([sys.executable,
                    os.path.join(REPO, "tools/make_golden_data.py"),
                    out, "--loci", "2", "--samples", "3", "--reads", "40",
                    "--snp-offset", "25"], check=True)
    common = ["--use-unpaired", "--min-reads", "20", "--def-stutter-model",
              "--snp-vcf", f"{out}/snps.vcf.gz"]
    chroms = sorted({l.split()[0] for l in open(f"{out}/regions.bed")})
    ref_recs = []
    for chrom in chroms:
        subprocess.run(
            [REF_BINARY, "--bams", f"{out}/sim.bam", "--fasta",
             f"{out}/sim.fa", "--regions", f"{out}/regions.bed",
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
    tpu_recs = [l for l in open(f"{out}/tpu.vcf") if not l.startswith("#")]
    assert len(ref_recs) == len(tpu_recs) == 2

    int_exact = {"DP", "DSNP", "DSTUTTER", "DFLANKINDEL", "DAB"}
    str_exact = {"GT", "GB", "ALLREADS", "MALLREADS", "PSNP"}
    saw_phased = False
    for rr, tr in zip(sorted(ref_recs), sorted(tpu_recs)):
        rf, tf = rr.split("\t"), tr.strip().split("\t")
        assert rf[:5] == tf[:5]
        fmt = rf[8].split(":")
        for s in range(9, len(rf)):
            rp = rf[s].strip().split(":")
            tp = tf[s].strip().split(":")
            assert len(rp) == len(tp)
            for name, rv, tv in zip(fmt, rp, tp):
                if (rv == ".") != (tv == ".") and name in ("AB", "DAB", "FS"):
                    # AB/FS are only computed for haplotype-level hets; a
                    # posterior near-tie (fast-math side) can flip the best
                    # hap pair between hom/het without changing the genotype
                    continue
                if name in str_exact or rv == "." or tv == ".":
                    assert rv == tv, (rf[0], name, rv, tv)
                elif name in int_exact:
                    assert int(rv) == int(tv), (rf[0], name, rv, tv)
                elif rv != "." and tv != ".":
                    # GLDIFF compounds per-read fast-math logsumexp error
                    # across the whole sample; allow a wider band there
                    band = 0.5 if name == "GLDIFF" else 0.2
                    for rx, tx in zip(rv.split("|"), tv.split("|")):
                        assert abs(float(rx) - float(tx)) <= band, \
                            (rf[0], name, rv, tv)
                if name == "DSNP" and rv != "." and int(rv) > 0:
                    saw_phased = True
    assert saw_phased


@pytest.mark.skipif(not os.path.exists(REF_BINARY),
                    reason="reference binary not built")
def test_golden_em_stutter_comparison(tmp_path):
    """EM-learned stutter mode (no --def-stutter-model): the trained
    stutter parameters and genotypes must match the reference."""
    out = str(tmp_path)
    subprocess.run([sys.executable,
                    os.path.join(REPO, "tools/make_golden_data.py"),
                    out, "--loci", "2", "--samples", "8", "--reads", "40"],
                   check=True)
    common = ["--use-unpaired", "--min-reads", "20"]
    chroms = sorted({l.split()[0] for l in open(f"{out}/regions.bed")})
    ref_recs = []
    for chrom in chroms:
        subprocess.run(
            [REF_BINARY, "--bams", f"{out}/sim.bam", "--fasta",
             f"{out}/sim.fa", "--regions", f"{out}/regions.bed",
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
    tpu_recs = [l for l in open(f"{out}/tpu.vcf") if not l.startswith("#")]
    assert len(ref_recs) == len(tpu_recs) == 2

    stutter_keys = ("INFRAME_PGEOM", "INFRAME_UP", "INFRAME_DOWN",
                    "OUTFRAME_PGEOM", "OUTFRAME_UP", "OUTFRAME_DOWN")
    for rr, tr in zip(sorted(ref_recs), sorted(tpu_recs)):
        rf, tf = rr.split("\t"), tr.strip().split("\t")
        assert rf[:5] == tf[:5]
        ri = dict(kv.split("=", 1) for kv in rf[7].split(";") if "=" in kv)
        ti = dict(kv.split("=", 1) for kv in tf[7].split(";") if "=" in kv)
        for k in stutter_keys:
            assert abs(float(ri[k]) - float(ti[k])) <= 0.011, (k, ri[k], ti[k])
        fmt = rf[8].split(":")
        gt_idx, gb_idx = fmt.index("GT"), fmt.index("GB")
        for s in range(9, len(rf)):
            rp = rf[s].strip().split(":")
            tp = tf[s].strip().split(":")
            if len(rp) > 1 and len(tp) > 1:
                assert rp[gt_idx] == tp[gt_idx]
                assert rp[gb_idx] == tp[gb_idx]


@pytest.mark.skipif(not os.path.exists(REF_BINARY),
                    reason="reference binary not built")
def test_golden_10x_hp_tags_comparison(tmp_path):
    """--10x-bams mode: HP-tag phasing matches the reference."""
    out = str(tmp_path)
    subprocess.run([sys.executable,
                    os.path.join(REPO, "tools/make_golden_data.py"),
                    out, "--loci", "2", "--samples", "3", "--reads", "40",
                    "--hp-tags"], check=True)
    common = ["--use-unpaired", "--min-reads", "20", "--def-stutter-model",
              "--10x-bams"]
    chroms = sorted({l.split()[0] for l in open(f"{out}/regions.bed")})
    ref_recs = []
    for chrom in chroms:
        subprocess.run(
            [REF_BINARY, "--bams", f"{out}/sim.bam", "--fasta",
             f"{out}/sim.fa", "--regions", f"{out}/regions.bed",
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
    tpu_recs = [l for l in open(f"{out}/tpu.vcf") if not l.startswith("#")]
    assert len(ref_recs) == len(tpu_recs) == 2

    int_exact = {"DP", "DSNP", "DSTUTTER", "DFLANKINDEL", "DAB"}
    str_exact = {"GT", "GB", "ALLREADS", "MALLREADS", "PSNP"}
    for rr, tr in zip(sorted(ref_recs), sorted(tpu_recs)):
        rf, tf = rr.split("\t"), tr.strip().split("\t")
        assert rf[:5] == tf[:5]
        fmt = rf[8].split(":")
        for s in range(9, len(rf)):
            rp = rf[s].strip().split(":")
            tp = tf[s].strip().split(":")
            assert len(rp) == len(tp)
            for name, rv, tv in zip(fmt, rp, tp):
                if (rv == ".") != (tv == ".") and name in ("AB", "DAB", "FS"):
                    continue
                if name in str_exact or rv == "." or tv == ".":
                    assert rv == tv, (rf[0], name, rv, tv)
                elif name in int_exact:
                    assert int(rv) == int(tv), (rf[0], name, rv, tv)
                else:
                    band = 0.5 if name == "GLDIFF" else 0.2
                    for rx, tx in zip(rv.split("|"), tv.split("|")):
                        assert abs(float(rx) - float(tx)) <= band, \
                            (rf[0], name, rv, tv)


@pytest.mark.skipif(not os.path.exists(REF_BINARY),
                    reason="reference binary not built")
@pytest.mark.parametrize("period", [1, 4])
def test_golden_other_periods(tmp_path, period):
    """Period-1 (homopolymer) and period-4 loci: genotype fields match the
    reference exactly (exercises the homopolymer transition tables and the
    HapBlock homopolymer-length carry quirk)."""
    out = str(tmp_path)
    subprocess.run([sys.executable,
                    os.path.join(REPO, "tools/make_golden_data.py"),
                    out, "--loci", "2", "--samples", "3", "--reads", "40",
                    "--period", str(period), "--ref-units", "10"],
                   check=True)
    common = ["--use-unpaired", "--min-reads", "20", "--def-stutter-model"]
    chroms = sorted({l.split()[0] for l in open(f"{out}/regions.bed")})
    ref_recs = []
    for chrom in chroms:
        subprocess.run(
            [REF_BINARY, "--bams", f"{out}/sim.bam", "--fasta",
             f"{out}/sim.fa", "--regions", f"{out}/regions.bed",
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
    tpu_recs = [l for l in open(f"{out}/tpu.vcf") if not l.startswith("#")]
    assert len(ref_recs) == len(tpu_recs) > 0

    hard = {"GT", "GB", "DP", "DSTUTTER", "DFLANKINDEL", "ALLREADS",
            "MALLREADS"}
    for rr, tr in zip(sorted(ref_recs), sorted(tpu_recs)):
        rf, tf = rr.split("\t"), tr.strip().split("\t")
        assert rf[:5] == tf[:5]
        fmt = rf[8].split(":")
        for s in range(9, len(rf)):
            rp = rf[s].strip().split(":")
            tp = tf[s].strip().split(":")
            assert len(rp) == len(tp)
            for name, rv, tv in zip(fmt, rp, tp):
                if name in hard:
                    assert rv == tv, (period, rf[0], name, rv, tv)


@pytest.mark.skipif(not os.path.exists(REF_BINARY),
                    reason="reference binary not built")
def test_golden_paired_end_comparison(tmp_path):
    """Proper mate pairs, WITHOUT --use-unpaired: the mate-pairing filter
    path and mate-aware bookkeeping match the reference."""
    out = str(tmp_path)
    subprocess.run([sys.executable,
                    os.path.join(REPO, "tools/make_golden_data.py"),
                    out, "--loci", "2", "--samples", "3", "--reads", "40",
                    "--paired"], check=True)
    common = ["--min-reads", "15", "--def-stutter-model"]
    chroms = sorted({l.split()[0] for l in open(f"{out}/regions.bed")})
    ref_recs = []
    for chrom in chroms:
        subprocess.run(
            [REF_BINARY, "--bams", f"{out}/sim.bam", "--fasta",
             f"{out}/sim.fa", "--regions", f"{out}/regions.bed",
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
    tpu_recs = [l for l in open(f"{out}/tpu.vcf") if not l.startswith("#")]
    assert len(ref_recs) == len(tpu_recs) == 2

    hard = {"GT", "GB", "DP", "DSTUTTER", "DFLANKINDEL", "ALLREADS",
            "MALLREADS", "PSNP"}
    for rr, tr in zip(sorted(ref_recs), sorted(tpu_recs)):
        rf, tf = rr.split("\t"), tr.strip().split("\t")
        assert rf[:5] == tf[:5]
        fmt = rf[8].split(":")
        for s in range(9, len(rf)):
            rp = rf[s].strip().split(":")
            tp = tf[s].strip().split(":")
            assert len(rp) == len(tp)
            for name, rv, tv in zip(fmt, rp, tp):
                if name in hard:
                    assert rv == tv, (rf[0], name, rv, tv)
