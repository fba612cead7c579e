"""CRAM 3.0 reader tests.

The committed fixture (tests/data/cram_fix.{bam,cram,fa}) was produced by an
htslib BAM->CRAM conversion; the CRAM decode must reproduce the BAM records
exactly (reference capability: src/bam_io.{h,cpp} BamCramReader).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "tests", "data")


def test_cram_matches_bam_fixture():
    from hipstr_tpu.io.bam import BamReader
    from hipstr_tpu.io.cram import CramReader

    cram = CramReader(os.path.join(DATA, "cram_fix.cram"),
                      os.path.join(DATA, "cram_fix.fa"))
    bam = list(BamReader(os.path.join(DATA, "cram_fix.bam")))
    crecs = list(cram)
    assert len(crecs) == len(bam) > 0
    bidx = {(r.name, r.ref_id): r for r in bam}
    for r in crecs:
        b = bidx[(r.name, r.ref_id)]
        for attr in ("pos", "flag", "mapq", "seq", "qual", "cigar"):
            assert getattr(r, attr) == getattr(b, attr), (r.name, attr)
        for tag in ("RG", "XT"):
            assert set(r.tags) == set(b.tags)
            assert r.tags.get(tag) == b.tags.get(tag), (r.name, tag)


def test_cram_region_fetch():
    from hipstr_tpu.io.bam import BamReader
    from hipstr_tpu.io.cram import CramReader

    cram = CramReader(os.path.join(DATA, "cram_fix.cram"),
                      os.path.join(DATA, "cram_fix.fa"))
    bam = BamReader(os.path.join(DATA, "cram_fix.bam"))
    chrom = cram.ref_names[0]
    for window in ((0, 1000), (100, 180), (150, 151)):
        got = sorted((r.name, r.pos) for r in cram.fetch(chrom, *window))
        want = sorted((r.name, r.pos) for r in bam.fetch(chrom, *window))
        assert got == want, window


def test_cram_pipeline_identical_to_bam(tmp_path):
    """Genotyping from CRAM input produces a byte-identical VCF."""
    from hipstr_tpu.utils.simulate import simulate_locus
    from tests.test_cli_modes import _write_inputs, _run_cli, _records

    gen = "/tmp/cramgen/bam2cram"
    if not os.path.exists(gen):
        pytest.skip("htslib BAM->CRAM generator not built")

    locus = simulate_locus(seed=71, n_samples=3, reads_per_sample=30,
                           period=3, ref_units=8)
    out = str(tmp_path)
    _write_inputs(locus, out)
    subprocess.run([gen, f"{out}/sim.bam", f"{out}/sim.fa",
                    f"{out}/sim.cram", "3.0"], check=True)

    _run_cli(out, ["--str-vcf", f"{out}/from_bam.vcf", "--def-stutter-model"])
    env = dict(os.environ, PYTHONPATH=REPO)
    subprocess.run([sys.executable, "-m", "hipstr_tpu.cli",
                    "--bams", f"{out}/sim.cram", "--fasta", f"{out}/sim.fa",
                    "--regions", f"{out}/regions.bed", "--use-unpaired",
                    "--min-reads", "20", "--dtype", "float64", "--silent",
                    "--str-vcf", f"{out}/from_cram.vcf",
                    "--def-stutter-model"], check=True, env=env, cwd=REPO)
    assert _records(f"{out}/from_bam.vcf") == _records(f"{out}/from_cram.vcf")


def test_cram_realistic_reads_roundtrip(tmp_path):
    """Reference-encoded CRAM of artifact-bearing reads (soft clips, aux
    tags, per-base quality curves, MAPQ spread) decodes bit-identically to
    the source BAM, and genotyping from the CRAM matches the BAM."""
    if not os.path.exists("/tmp/cramgen/bam2cram"):
        pytest.skip("htslib bam2cram helper not built")
    out = str(tmp_path)
    repo = REPO
    subprocess.run([sys.executable, os.path.join(repo,
                    "tools/make_golden_data.py"), out, "--loci", "3",
                    "--samples", "3", "--reads", "40", "--realistic",
                    "--seed", "5511"], check=True)
    subprocess.run(["/tmp/cramgen/bam2cram", f"{out}/sim.bam",
                    f"{out}/sim.fa", f"{out}/sim.cram", "3.0"], check=True)

    from hipstr_tpu.io.bam import BamReader
    from hipstr_tpu.io.cram import CramReader
    crecs = sorted(CramReader(f"{out}/sim.cram", f"{out}/sim.fa"),
                   key=lambda r: (r.ref_id, r.pos, r.name))
    brecs = sorted(BamReader(f"{out}/sim.bam"),
                   key=lambda r: (r.ref_id, r.pos, r.name))
    assert len(crecs) == len(brecs) > 0
    for c, b in zip(crecs, brecs):
        assert (c.name, c.pos, c.seq, c.qual, c.cigar, c.mapq,
                c.tags.get("XA")) == (b.name, b.pos, b.seq, b.qual,
                                      b.cigar, b.mapq, b.tags.get("XA"))

    env = dict(os.environ, PYTHONPATH=repo)
    common = ["--fasta", f"{out}/sim.fa", "--regions", f"{out}/regions.bed",
              "--min-reads", "15", "--use-unpaired", "--def-stutter-model",
              "--dtype", "float64", "--silent"]
    subprocess.run([sys.executable, "-m", "hipstr_tpu.cli", "--bams",
                    f"{out}/sim.bam", "--str-vcf", f"{out}/b.vcf"] + common,
                   check=True, env=env, cwd=repo)
    subprocess.run([sys.executable, "-m", "hipstr_tpu.cli", "--bams",
                    f"{out}/sim.cram", "--str-vcf", f"{out}/c.vcf"] + common,
                   check=True, env=env, cwd=repo)
    a = [l for l in open(f"{out}/b.vcf") if not l.startswith("#")]
    b = [l for l in open(f"{out}/c.vcf") if not l.startswith("#")]
    assert len(a) == len(b) > 0 and a == b


def test_cram_native_fetch_raw_identity(tmp_path):
    """The native container decoder (native/cram_decode.cpp) emits BAM
    record bodies bit-identical to the python object decoder, on an
    htslib-written CRAM of realistic reads (soft clips, aux tags, MAPQ
    spread, paired mates)."""
    if not os.path.exists("/tmp/cramgen/bam2cram"):
        pytest.skip("htslib bam2cram helper not built")
    out = str(tmp_path)
    subprocess.run([sys.executable, os.path.join(REPO,
                    "tools/make_golden_data.py"), out, "--loci", "2",
                    "--samples", "3", "--reads", "40", "--realistic",
                    "--paired", "--seed", "9182"], check=True)
    subprocess.run(["/tmp/cramgen/bam2cram", f"{out}/sim.bam",
                    f"{out}/sim.fa", f"{out}/sim.cram", "3.0"], check=True)

    from hipstr_tpu.io.bam import decode_record
    from hipstr_tpu.io.cram import CramReader
    r = CramReader(f"{out}/sim.cram", f"{out}/sim.fa")
    checked = 0
    for ci, chrom in enumerate(r.ref_names):
        end = r.ref_lens[ci]
        py = list(r.fetch(chrom, 0, end))
        raw = r.fetch_raw(chrom, 0, end)
        assert raw is not None, "native CRAM decode fell back"
        blob, offs, lens, rid = raw
        nat = [decode_record(blob[o:o + l]) for o, l in zip(offs, lens)]
        nat = [x for x in nat if x.ref_id == rid and x.pos < end
               and x.end_position() > 0]
        assert len(nat) == len(py)
        for a, b in zip(py, nat):
            for f in ("name", "flag", "ref_id", "pos", "mapq", "cigar",
                      "mate_ref_id", "mate_pos", "tlen", "seq", "qual",
                      "tags"):
                assert getattr(a, f) == getattr(b, f), (a.name, f)
        checked += len(py)
    assert checked > 100
