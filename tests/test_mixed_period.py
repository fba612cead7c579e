"""Runtime-period kernels: one compiled shape serves mixed-period batches.

Round 3 moved the repeat period (and the real-haplotype count) from
compile-time statics into per-locus runtime data so the executor can merge
dispatch groups across periods (reference scope: the per-locus artifact
grids of StutterAlignerClass/HapAligner, src/SeqAlignment/*.cpp).  These
tests pin: (a) the emission kernel with a `periods` array matches the
per-period static calls; (b) the full v2 forward with `h_real` padding
matches the unpadded result on real columns.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hipstr_tpu.ops.pallas_emission import stutter_emissions_pallas
from hipstr_tpu.ops.pallas_hmm2 import batched_forward_v2
from hipstr_tpu.parallel.batch_builder import build_demo_batch


@pytest.mark.slow
def test_emission_mixed_periods_match_static():
    rng = np.random.default_rng(0)
    G, O, P, L, B = 3, 4, 8, 128, 64
    codes = jnp.asarray(rng.integers(0, 4, (G, P, L)), jnp.int32)
    blw = jnp.asarray(rng.uniform(-8, -4, (G, P, L)), jnp.float32)
    blc = jnp.asarray(rng.uniform(-0.01, -0.0001, (G, P, L)), jnp.float32)
    brev = jnp.asarray(rng.integers(0, 4, (G, O, B)), jnp.int32)
    blen = jnp.asarray(rng.integers(8, 30, (G, O)), jnp.int32)
    # one padded option per locus (blen=0 sentinel): values are unspecified,
    # sliced away below
    blen = blen.at[:, O - 1].set(0)
    pers = [1, 2, 3]

    mixed = np.asarray(stutter_emissions_pallas(
        codes, blw, blc, brev, blen, 0, dtype=jnp.float32, interpret=True,
        periods=jnp.asarray(pers, jnp.int32)))
    for g, p in enumerate(pers):
        ref = np.asarray(stutter_emissions_pallas(
            codes[g:g + 1], blw[g:g + 1], blc[g:g + 1], brev[g:g + 1],
            blen[g:g + 1], p, dtype=jnp.float32, interpret=True))
        np.testing.assert_allclose(mixed[g, :O - 1], ref[0, :O - 1],
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("period", [2, 3])
def test_v2_h_real_padding_matches_full(period):
    G = 3
    batch, statics, _ = build_demo_batch(G, n_samples=2, reads_per_sample=10,
                                         period=period)
    R_f, R_r, sr_f, sr_r, per = statics
    H = batch.fw_meta.row_char.shape[1]

    full = np.asarray(batched_forward_v2(
        batch.l_seg, batch.r_seg, batch.fw_meta, batch.rev_meta, batch.seed,
        batch.seed_codes, batch.seed_quals, R_f, R_r, per, sr_f, sr_r,
        dtype=jnp.float64, interpret=True))

    h_real = np.full(G, max(1, H - 2), np.int32)
    got = np.asarray(batched_forward_v2(
        batch.l_seg, batch.r_seg, batch.fw_meta, batch.rev_meta, batch.seed,
        batch.seed_codes, batch.seed_quals, R_f, R_r, 0, sr_f, sr_r,
        dtype=jnp.float64, interpret=True,
        h_real=jnp.asarray(h_real),
        periods=jnp.full((G,), per, jnp.int32)))

    for g in range(G):
        np.testing.assert_allclose(got[g, :, :h_real[g]],
                                   full[g, :, :h_real[g]],
                                   rtol=1e-7, atol=1e-7)
