"""Pallas flank-scan kernel parity (interpreter mode on CPU).

On the real TPU the Mosaic kernel was verified bit-exact against the
lax.scan path (diff 0.0) and ~1.7x faster in kernel time; this test runs
the same comparison through the Pallas interpreter so it works everywhere.
"""

import os

import numpy as np
import pytest


import pytest


@pytest.mark.parametrize("mode", ["flank", "fused"])
def test_pallas_flank_scan_matches_scan_path(monkeypatch, mode):
    monkeypatch.setenv("HIPSTR_TPU_PALLAS", "1")
    monkeypatch.setenv("HIPSTR_TPU_PALLAS_MODE", mode)
    monkeypatch.setenv("HIPSTR_TPU_PALLAS_INTERPRET", "1")
    from tests.test_hmm_kernel import _mk_haplotype, _reads_from_hap
    import hipstr_tpu.pipeline.hap_aligner as ha
    from hipstr_tpu.pipeline.hap_aligner import compute_hap_log_likelihoods

    rng = np.random.default_rng(0)
    hap = _mk_haplotype(rng, 3, 7, n_rep_alts=2, n_flank_alts=1)
    seqs, quals, seeds = _reads_from_hap(rng, hap, 6, 60)
    ha._jitted.cache_clear()
    try:
        LL_pallas = np.asarray(compute_hap_log_likelihoods(
            hap, seqs, quals, seeds, dtype="float64"))
        monkeypatch.setenv("HIPSTR_TPU_PALLAS", "0")
        ha._jitted.cache_clear()
        LL_scan = np.asarray(compute_hap_log_likelihoods(
            hap, seqs, quals, seeds, dtype="float64"))
    finally:
        ha._jitted.cache_clear()
    tol = 1e-9 if mode == "flank" else 1e-8
    assert np.max(np.abs(LL_pallas - LL_scan)) < tol
