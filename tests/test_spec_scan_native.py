"""Native speculative-candidate scan vs the Python predictors.

spec_scan (native/spec_scan.cpp) must produce the same stutter-allele and
alt-flank candidate sets as the Python _stutter_support_py /
_predict_flank_candidates paths (pipeline/genotyper.py).  Speculation is
best-effort for output exactness (reference mining loops:
src/seq_stutter_genotyper.cpp:843-879, :40-217), but hit-rate parity is a
performance contract, so the sets are asserted equal.
"""

import os
import shutil
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _check_dataset(tmp, locs):
    from hipstr_tpu.io.regions import read_regions
    from hipstr_tpu.models.stutter import StutterModel
    from hipstr_tpu.pipeline.genotyper import order_key
    from hipstr_tpu.pipeline.processor import (GenotyperPipeline, Logger,
                                               PipelineOptions)
    from tests.test_workers import _write_sim

    _write_sim(tmp, locs)
    opts = PipelineOptions(
        min_reads=10, use_unpaired=True, dtype="float32",
        def_stutter_model=StutterModel(0.95, 0.05, 0.05, 0.95, 0.01, 0.01, 2))
    p = GenotyperPipeline([f"{tmp}/sim.bam"], f"{tmp}/sim.fa", opts,
                          Logger(quiet=True))
    regions = read_regions(f"{tmp}/regions.bed", opts.max_regions, None, None)
    checked = 0
    for region in regions:
        chrom_seq = p.fasta.get_sequence(region.chrom)
        g = p.prepare_locus_genotyper(region, chrom_seq)
        if g is None:
            continue
        native = g._spec_scan_native()
        if native is None:
            pytest.skip("native library unavailable")
        rep_n, flank_n = native
        for bi, block in enumerate(g.haplotype.blocks):
            if not block.is_repeat:
                continue
            assert g._stutter_support_py(block) == rep_n.get(bi, {}), \
                f"repeat-candidate mismatch at {region} block {bi}"
        pyf = dict(g._predict_flank_candidates())
        natf = {}
        for fbi, sup in flank_n.items():
            if sup:
                cands = sorted(sup, key=lambda q: (-sup[q], order_key(q)))[:4]
                natf[fbi] = sorted(cands, key=order_key)
        assert pyf == natf, f"flank-candidate mismatch at {region}"
        checked += 1
    assert checked >= len(locs) // 2


def test_spec_scan_parity_sweep():
    from hipstr_tpu.utils.simulate import simulate_locus
    tmp = tempfile.mkdtemp(prefix="specscan_")
    try:
        locs = []
        for i in range(36):
            locs.append(simulate_locus(
                seed=52000 + i, n_samples=3,
                reads_per_sample=20 + 15 * (i % 4),
                period=1 + (i % 6), ref_units=6 + (i % 5),
                error_rate=0.002 + 0.004 * (i % 3),
                chrom=f"chrP{i}", realism=bool(i % 2)))
        _check_dataset(tmp, locs)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
