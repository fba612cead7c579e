"""Parity: native columnar trace summaries vs the object trace path.

The hmm_trace_summary_batch native entry must reproduce, field for field,
the summaries derived from the full AlignmentTrace object path (which is
itself golden-pinned against the reference binary's traceback semantics).
"""

import numpy as np
import pytest

from hipstr_tpu import native as _native
from hipstr_tpu.align.trace_summary import (compute_summaries,
                                            summaries_via_objects)


def _locus_jobs(seed, period=2, reads_per_sample=25, n_samples=3):
    """Build a prepared genotyper and a representative trace-job list."""
    import tempfile

    from hipstr_tpu.models.stutter import StutterModel
    from hipstr_tpu.pipeline.processor import (GenotyperPipeline, Logger,
                                               PipelineOptions)
    from hipstr_tpu.io.regions import read_regions
    from hipstr_tpu.utils.simulate import simulate_locus
    from tests.test_workers import _write_sim

    tmp = tempfile.mkdtemp(prefix="ts_test_")
    locs = [simulate_locus(seed=seed, n_samples=n_samples,
                           reads_per_sample=reads_per_sample, period=period,
                           ref_units=9, chrom="chrT")]
    _write_sim(tmp, locs)
    opts = PipelineOptions(
        min_reads=10, use_unpaired=True, dtype="float64",
        def_stutter_model=StutterModel(0.9, 0.1, 0.08, 0.9, 0.02, 0.02,
                                       period))
    p = GenotyperPipeline([f"{tmp}/sim.bam"], f"{tmp}/sim.fa", opts,
                          Logger(quiet=True))
    region = read_regions(f"{tmp}/regions.bed", 10, "", None)[0]
    chrom_seq = p.fasta.get_sequence(region.chrom)
    g = p.prepare_locus_genotyper(region, chrom_seq)
    assert g is not None
    g.calc_hap_aln_probs()
    g.calc_log_sample_posteriors()

    # trace jobs: every pool against a spread of haplotypes
    jobs = []
    H = g.num_alleles
    for pool_idx in g.valid_pools():
        pooled = g.pooler.pooled_alns[pool_idx]
        blw, blc = g._pool_logq(pool_idx)
        seed_base = int(g.pool_seeds[pool_idx])
        for h in {0, H // 2, H - 1}:
            jobs.append((h, pooled, seed_base, blw, blc))
    return g.haplotype, jobs, g.hap_info


@pytest.mark.parametrize("seed,period", [(101, 1), (202, 2), (303, 4)])
def test_summary_native_matches_objects(seed, period):
    if not _native.available() or not hasattr(_native._load(),
                                              "hmm_trace_summary_batch"):
        pytest.skip("native summary entry unavailable")
    haplotype, jobs, hap_info = _locus_jobs(seed, period)
    assert jobs, "no trace jobs generated"
    nat = compute_summaries(haplotype, jobs, hap_info, n_threads=2)
    assert nat is not None
    # fresh caches for the object path (hap_info caches are shared and fine)
    obj = summaries_via_objects(haplotype, jobs, hap_info, n_threads=1)
    assert len(nat) == len(obj) == len(jobs)
    nb = haplotype.num_blocks()
    for i, (a, b) in enumerate(zip(nat, obj)):
        assert abs(a.LL - b.LL) < 1e-9, i
        assert a.start == b.start and a.stop == b.stop, i
        assert a.flank_ins == b.flank_ins, i
        assert a.flank_del == b.flank_del, i
        assert a.stut_valid == b.stut_valid, i
        assert a.stut_size == b.stut_size, i
        assert a.str_bytes == b.str_bytes, i
        assert a.flank_bytes == b.flank_bytes, i
        # full traced alignment (viz path): CIGAR + aligned string + span
        ta, tb = a.traced_aln, b.traced_aln
        assert ta.start == tb.start and ta.stop == tb.stop, i
        assert ta.alignment == tb.alignment, i
        assert [(c.type, c.num) for c in ta.cigar] == \
            [(c.type, c.num) for c in tb.cigar], i


def test_summary_trace_accessors():
    if not _native.available() or not hasattr(_native._load(),
                                              "hmm_trace_summary_batch"):
        pytest.skip("native summary entry unavailable")
    haplotype, jobs, hap_info = _locus_jobs(404, 3)
    nat = compute_summaries(haplotype, jobs, hap_info)
    assert nat is not None
    s = nat[0]
    rb = next(b for b in range(haplotype.num_blocks())
              if haplotype.blocks[b].is_repeat)
    if s.stut_valid[rb]:
        assert s.stutter_size(rb) == s.stut_size[rb]
        assert s.str_seq(rb) == s.str_bytes[rb].decode("latin1")
    assert s.total_stutter_size() == sum(
        sz for v, sz in zip(s.stut_valid, s.stut_size) if v)
