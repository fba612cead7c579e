"""Parity: native columnar filter cascade vs the object read path.

read_and_filter_reads_fast must reproduce the object path's survivors —
same reads, same order, same trimmed state, same grouping — and the
full pipeline must emit byte-identical VCFs under both paths.
"""

import os
import tempfile

import pytest

from hipstr_tpu import native as _native
from hipstr_tpu.io.regions import read_regions
from hipstr_tpu.models.stutter import StutterModel
from hipstr_tpu.pipeline.fast_filter import read_and_filter_reads_fast
from hipstr_tpu.pipeline.processor import (GenotyperPipeline, Logger,
                                           PipelineOptions)
from hipstr_tpu.utils.simulate import simulate_locus
from tests.test_workers import _write_sim


def _native_ok():
    lib = _native._load()
    return lib is not None and hasattr(lib, "bam_filter_batch")


def _mk_pipeline(tmp, n_loci=6, reads=24, paired=True):
    locs = [simulate_locus(seed=9100 + i, n_samples=3,
                           reads_per_sample=reads, period=1 + (i % 4),
                           ref_units=8 + (i % 3), chrom=f"chrF{i}")
            for i in range(n_loci)]
    _write_sim(tmp, locs)
    opts = PipelineOptions(
        min_reads=10, use_unpaired=True, dtype="float64",
        def_stutter_model=StutterModel(0.9, 0.1, 0.08, 0.9, 0.02, 0.02, 2))
    p = GenotyperPipeline([f"{tmp}/sim.bam"], f"{tmp}/sim.fa", opts,
                          Logger(quiet=True))
    regions = read_regions(f"{tmp}/regions.bed", 100, "", None)
    return p, regions


def _read_state(aln):
    return (aln.name, aln.pos, aln.end_pos, aln.bases, aln.quals,
            [(n, op) for n, op in aln.cigar],
            getattr(aln, "pass_two", None),
            aln.rec.pos, aln.rec.mate_pos, aln.rec.is_first_mate,
            aln.rec.is_reverse, aln.get_tag("RG"), aln.get_tag("XA"))


@pytest.mark.skipif(not _native_ok(), reason="native filter unavailable")
def test_filter_cascade_parity():
    tmp = tempfile.mkdtemp(prefix="ff_test_")
    p, regions = _mk_pipeline(tmp)
    for region in regions:
        chrom_seq = p.fasta.get_sequence(region.chrom)
        fast = read_and_filter_reads_fast(p, region, chrom_seq)
        assert fast is not None
        slow = p.read_and_filter_reads(region, chrom_seq)
        f_names, f_pairs, f_mates, f_unp, f_many = fast
        s_names, s_pairs, s_mates, s_unp, s_many = slow
        assert f_names == s_names
        assert f_many == s_many
        for fa, sa in zip(f_pairs, s_pairs):
            assert [_read_state(a) for a in fa] == \
                [_read_state(a) for a in sa]
        for fa, sa in zip(f_mates, s_mates):
            assert [_read_state(a) for a in fa] == \
                [_read_state(a) for a in sa]
        for fa, sa in zip(f_unp, s_unp):
            assert [_read_state(a) for a in fa] == \
                [_read_state(a) for a in sa]


@pytest.mark.skipif(not _native_ok(), reason="native filter unavailable")
def test_left_align_trim_parity():
    """The precomputed region±40 trim must match BamAlign.trim_alignment."""
    tmp = tempfile.mkdtemp(prefix="ff_trim_")
    p, regions = _mk_pipeline(tmp, n_loci=4, reads=30)
    for region in regions:
        chrom_seq = p.fasta.get_sequence(region.chrom)
        fast = read_and_filter_reads_fast(p, region, chrom_seq)
        slow = p.read_and_filter_reads(region, chrom_seq)
        lo = region.start - 40 if region.start > 40 else 1
        hi = region.stop + 40
        for fa, sa in zip(fast[1], slow[1]):
            for f, s in zip(fa, sa):
                f.trim_alignment(lo, hi)
                s.trim_alignment(lo, hi)
                assert (f.pos, f.end_pos, f.bases, f.quals) == \
                    (s.pos, s.end_pos, s.bases, s.quals)
                assert [(n, op) for n, op in f.cigar] == \
                    [(n, op) for n, op in s.cigar]
                assert f.matches_reference() == s.matches_reference()


@pytest.mark.slow
@pytest.mark.skipif(not _native_ok(), reason="native filter unavailable")
def test_pipeline_vcf_identical_fast_vs_slow():
    from hipstr_tpu.parallel.executor import run_batched

    def run(flag):
        tmp = tempfile.mkdtemp(prefix=f"ff_e2e_{flag}_")
        p, _ = _mk_pipeline(tmp, n_loci=8, reads=22)
        os.environ["HIPSTR_TPU_FAST_FILTER"] = flag
        try:
            run_batched(p, f"{tmp}/regions.bed", f"{tmp}/out.vcf",
                        batch_size=8)
        finally:
            os.environ.pop("HIPSTR_TPU_FAST_FILTER", None)
        with open(f"{tmp}/out.vcf") as fh:
            return [ln for ln in fh if not ln.startswith("##")]

    assert run("1") == run("0")
