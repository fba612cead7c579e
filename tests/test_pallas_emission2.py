"""Parity: the slab-parallel emission kernel v2 vs the dense formulation.

v2's deletion terms read lanes j + d*period, so it is exact only for
read offsets with lane headroom (j + 6*period < L) — the comparison
masks the top lanes (prepare_locus guarantees real reads never land
there).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipstr_tpu.models.base_quality import BaseQuality
from hipstr_tpu.ops.pallas_emission2 import stutter_emissions_pallas2
from hipstr_tpu.ops.stutter_emission import stutter_emissions_tpu


@pytest.mark.parametrize("period,Bmax,L", [(3, 16, 64), (1, 16, 64),
                                           (2, 32, 128), (6, 64, 128)])
def test_emission2_matches_generic(period, Bmax, L):
    rng = np.random.default_rng(hash((period, Bmax, L)) % 2**32)
    G, O, P = 2, 2, 8
    codes = rng.integers(0, 4, size=(G, P, L)).astype(np.int32)
    q = rng.integers(35, 70, size=(G, P, L)).astype(np.uint8)
    blw = BaseQuality.log_error_table[q]
    blc = BaseQuality.log_correct_table[q]
    brev = rng.integers(0, 4, size=(G, O, Bmax)).astype(np.int32)
    blen = rng.integers(1, Bmax, size=(G, O)).astype(np.int32)

    ref = np.zeros((G, O, 13, P, L))
    for g in range(G):
        for o in range(O):
            for p in range(P):
                ref[g, o, :, p, :] = stutter_emissions_tpu(
                    np, codes[g, p], blw[g, p], blc[g, p], brev[g, o],
                    int(blen[g, o]), period=period, max_units=6)

    got = np.asarray(stutter_emissions_pallas2(
        jnp.asarray(codes), jnp.asarray(blw), jnp.asarray(blc),
        jnp.asarray(brev), jnp.asarray(blen), period,
        dtype=jnp.float64, interpret=True))
    valid = L - 6 * period
    np.testing.assert_allclose(got[..., :valid], ref[..., :valid],
                               rtol=1e-10, atol=1e-10)
