"""Native mate-pairing (native/pair_reads.cpp) vs the Python pairing loop.

The C++ state machine must reproduce fast_filter.py's pairing decisions
exactly — same pairs, same order, same leftover-unpaired set (reference
semantics: src/bam_processor.cpp:97-152, 303-437) — across paired reads,
unpaired reads, and XA multimappers.
"""

import os
import shutil
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_pair_filter_parity():
    from hipstr_tpu import native as _native
    from hipstr_tpu.io.regions import read_regions
    from hipstr_tpu.models.stutter import StutterModel
    from hipstr_tpu.pipeline.fast_filter import read_and_filter_reads_fast
    from hipstr_tpu.pipeline.processor import (GenotyperPipeline, Logger,
                                               PipelineOptions)
    from hipstr_tpu.utils.simulate import simulate_locus
    from tests.test_workers import _write_sim

    if _native._load() is None:
        pytest.skip("native library unavailable")

    tmp = tempfile.mkdtemp(prefix="pairnat_")
    try:
        locs = [simulate_locus(seed=61000 + i, n_samples=3,
                               reads_per_sample=40, period=1 + (i % 4),
                               ref_units=8 + (i % 3), chrom=f"chrQ{i}",
                               paired=bool(i % 2),
                               realism=bool((i // 2) % 2))
                for i in range(24)]
        _write_sim(tmp, locs)
        opts = PipelineOptions(
            min_reads=10, use_unpaired=True, dtype="float32",
            def_stutter_model=StutterModel(0.95, 0.05, 0.05, 0.95, 0.01,
                                           0.01, 2))
        p = GenotyperPipeline([f"{tmp}/sim.bam"], f"{tmp}/sim.fa", opts,
                              Logger(quiet=True))
        regions = read_regions(f"{tmp}/regions.bed", opts.max_regions,
                               None, None)
        real = _native.pair_filter_batch_native

        def snap(res):
            rg_names, paired, mates, unpaired, too_many = res
            out = [tuple(rg_names), too_many]
            for groups in (paired, mates, unpaired):
                out.append([[(a.name, a.pos, a.end_pos, a.bases, a.quals,
                              a.pass_two, a.rec.flag) for a in g]
                            for g in groups])
            return out

        checked = 0
        for region in regions:
            chrom_seq = p.fasta.get_sequence(region.chrom)
            a = read_and_filter_reads_fast(p, region, chrom_seq)
            try:
                _native.pair_filter_batch_native = lambda *ar, **kw: None
                b = read_and_filter_reads_fast(p, region, chrom_seq)
            finally:
                _native.pair_filter_batch_native = real
            assert a is not None and b is not None
            assert snap(a) == snap(b), f"pairing mismatch at {region}"
            checked += 1
        assert checked == len(locs)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
