"""Parity: the v2 (locus x hap grid) Pallas kernel vs the XLA scan path."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipstr_tpu.ops.hmm import hmm_forward
from hipstr_tpu.ops.pallas_hmm2 import batched_forward_v2
from hipstr_tpu.parallel.batch_builder import build_demo_batch


@pytest.mark.slow
@pytest.mark.parametrize("reads,period", [(12, 3), (8, 2)])
def test_v2_matches_xla_scan(reads, period):
    os.environ["HIPSTR_TPU_PALLAS"] = "0"
    G = 3
    batch, statics, n_samples = build_demo_batch(
        G, n_samples=2, reads_per_sample=reads, period=period)
    R_f, R_r, sr_f, sr_r, per = statics

    def one(l_seg, r_seg, fw, rev, sd, sc, sq):
        return hmm_forward(l_seg, r_seg, fw, rev, sd, sc, sq,
                           R_f, R_r, per, sr_f, sr_r, jnp.float64)

    ref = jax.jit(jax.vmap(one))(batch.l_seg, batch.r_seg, batch.fw_meta,
                                 batch.rev_meta, batch.seed, batch.seed_codes,
                                 batch.seed_quals)

    got = batched_forward_v2(batch.l_seg, batch.r_seg, batch.fw_meta,
                             batch.rev_meta, batch.seed, batch.seed_codes,
                             batch.seed_quals,
                             R_f, R_r, per, sr_f, sr_r,
                             dtype=jnp.float64, interpret=True)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
