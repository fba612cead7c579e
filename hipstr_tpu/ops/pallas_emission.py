"""Pallas TPU kernel for the dense stutter-block emission tensor.

The XLA formulations (ops/stutter_emission.py) materialize
[artifacts, block+1, L] intermediates per (locus, pool, option) — tens of
GB of HBM traffic per batch, which made E ~80% of the forward pass.  This
kernel streams the same math through VMEM: grid = (loci, options), each
program holds [P, L] pool slabs and sweeps the block axis with static
lane-rolls, so nothing bigger than [P, L] ever leaves registers/VMEM.

Structure per program (math identical to `stutter_emissions`, reference:
src/SeqAlignment/StutterAlignerClass.cpp:55-162):
  pass 1  forward column sweep accumulating the no-artifact prefix (E0 at
          p = blen) and per-deletion prefixes (totals at p = blen - dp);
  pass 2  second sweep forming the deletion position log-sum-exp online;
  pass 3  insertion sweep: periodic-extension scores, per-unit position-
          shift deltas, and the P*-clamped position LSE with the clamp
          tail folded in closed form (count * cum[P*]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


def _emission_kernel(codes_ref, blw_ref, blc_ref,
                     brev_ref, blen_ref,
                     E_ref,
                     e0_s, pref0_s, run6_s, tot6_s, mx6_s, sm6_s, cum6_s,
                     star6_s,
                     *, Bmax, period, max_units, P, L, dtype):
    g = pl.program_id(0)
    o = pl.program_id(1)
    codes = codes_ref[0]
    blw = blw_ref[0]
    blc = blc_ref[0]
    blen = blen_ref[g, o]
    nd = max_units
    nD = 2 * max_units + 1
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (P, L), 1)
    zeros = jnp.zeros((P, L), dtype)
    dps = [(max_units - d) * period for d in range(nd)]   # 6p, 5p, .., 1p
    kps = [(k + 1) * period for k in range(nd)]           # 1p .. 6p
    max_ins = max_units * period

    def col_S(k):
        """Score column k: log P(read char | block char b_rev[k]), zero
        outside the block (k >= blen) or beyond the padded width."""
        if k >= Bmax:
            return zeros
        ch = brev_ref[g, o, k]
        Sk = jnp.where(codes == ch, blc, blw)
        return jnp.where(k < blen, Sk, zeros)

    def sheared(x, t):
        """x[j - t] with zero fill for j < t (static lane roll)."""
        if t == 0:
            return x
        if t >= L:
            return zeros
        return jnp.where(j_ids >= t, jnp.roll(x, t, axis=1), zeros)

    # ---- pass 1: forward prefixes; capture E0 and deletion totals --------
    e0_s[:] = zeros
    pref0_s[:] = zeros
    for d in range(nd):
        run6_s[d] = zeros
        tot6_s[d] = zeros
    for t in range(Bmax):
        pref0_s[:] = pref0_s[:] + sheared(col_S(t), t)

        @pl.when(t + 1 == blen)
        def _():
            e0_s[:] = pref0_s[:]

        for d in range(nd):
            dp = dps[d]
            run6_s[d] = run6_s[d] + sheared(col_S(t + dp), t)

            @pl.when(t + 1 == blen - dp)
            def _():
                tot6_s[d] = run6_s[d]

    # ---- pass 2: deletion position LSE (evaluate at p, then extend) ------
    pref0_s[:] = zeros
    for d in range(nd):
        run6_s[d] = zeros
        mx6_s[d] = jnp.full((P, L), NEG_INF, dtype)
        sm6_s[d] = zeros
    for p in range(Bmax + 1):
        for d in range(nd):
            dp = dps[d]

            @pl.when(p <= blen - dp)
            def _():
                val = pref0_s[:] + tot6_s[d] - run6_s[d]
                new_max = jnp.maximum(mx6_s[d], val)
                sm6_s[d] = (sm6_s[d] * jnp.exp(mx6_s[d] - new_max)
                            + jnp.exp(val - new_max))
                mx6_s[d] = new_max
        if p < Bmax:
            pref0_s[:] = pref0_s[:] + sheared(col_S(p), p)
            for d in range(nd):
                run6_s[d] = run6_s[d] + sheared(col_S(p + dps[d]), p)

    for d in range(nd):
        rem = blen - dps[d]
        prior = -jnp.log(jnp.maximum(rem + 1, 1).astype(dtype))
        lse = mx6_s[d] + jnp.log(sm6_s[d])
        E_ref[0, 0, d] = jnp.where(rem >= 0, prior + lse,
                                   jnp.full((P, L), NEG_INF, dtype))

    # no-artifact row
    E_ref[0, 0, nd] = e0_s[:]

    # ---- pass 3: insertions ----------------------------------------------
    # inserted-base scores with periodic extension; plain log-correct when
    # the periodic index falls outside the block
    pref0_s[:] = zeros                      # reused as the insertion cumsum
    for t in range(max_ins):
        cm = t % period
        ch = brev_ref[g, o, cm]
        Sk = jnp.where(codes == ch, blc, blw)
        pair = jnp.where(cm < blen, Sk, blc)
        pref0_s[:] = pref0_s[:] + sheared(pair, t)
        for k in range(nd):
            if kps[k] == t + 1:
                # cum[k] starts at LL0 = ins0[k] + rest[k]
                cum6_s[k] = pref0_s[:] + sheared(e0_s[:], kps[k])

    # position sweep: cum[k, p] evaluated online with the P*-clamp
    for k in range(nd):
        mx6_s[k] = jnp.full((P, L), NEG_INF, dtype)
        sm6_s[k] = zeros
        star6_s[k] = zeros
    for p in range(Bmax + 1):
        for k in range(nd):
            kp = kps[k]
            # P*[j] = clip(min(blen + kp, j + 1) - kp, 0, blen)
            Pstar = jnp.clip(jnp.minimum(blen, j_ids + 1 - kp), 0, blen)

            @pl.when(p <= blen)
            def _():
                val = cum6_s[k]
                star6_s[k] = jnp.where(p == Pstar, val, star6_s[k])
                contrib = jnp.where(p <= Pstar, val,
                                    jnp.full((P, L), NEG_INF, dtype))
                new_max = jnp.maximum(mx6_s[k], contrib)
                sm6_s[k] = (sm6_s[k] * jnp.exp(mx6_s[k] - new_max)
                            + jnp.exp(contrib - new_max))
                mx6_s[k] = new_max
        if p < Bmax:
            # accumulate deltas: cum[k] += sum_{m<=k} G[m, q=p] where
            # G[m] is the (frozen-masked) score delta rolled by m_sh[m]
            q = p
            diff = col_S(q + period) - col_S(q)
            diff = jnp.where(q + period >= blen, zeros, diff)
            base = sheared(diff, q)
            run = zeros
            for m in range(nd):
                run = run + sheared(base, kps[m])
                cum6_s[m] = cum6_s[m] + run

    for k in range(nd):
        kp = kps[k]
        Pstar = jnp.clip(jnp.minimum(blen, j_ids + 1 - kp), 0, blen)
        count = (blen - Pstar).astype(dtype)
        tail = jnp.where(count > 0,
                         star6_s[k] + jnp.log(jnp.maximum(count, 1.0)),
                         jnp.full((P, L), NEG_INF, dtype))
        new_max = jnp.maximum(mx6_s[k], tail)
        sm = (sm6_s[k] * jnp.exp(mx6_s[k] - new_max)
              + jnp.exp(tail - new_max))
        lse = new_max + jnp.log(sm)
        prior = -jnp.log((blen + 1).astype(dtype))
        E_ref[0, 0, nd + 1 + k] = prior + lse


def stutter_emissions_pallas(codes, blw, blc, brev, blen, period,
                             max_units=6, dtype=jnp.float32,
                             interpret=False):
    """E [G, O, nD, P, L] for a batch: codes [G,P,L] int32, blw/blc [G,P,L],
    brev [G,O,Bmax] int32, blen [G,O] int32."""
    G, P, L = codes.shape
    O, Bmax = brev.shape[1], brev.shape[2]
    nD = 2 * max_units + 1

    kernel = functools.partial(_emission_kernel, Bmax=Bmax, period=period,
                               max_units=max_units, P=P, L=L, dtype=dtype)
    pool_spec = pl.BlockSpec((1, P, L), lambda g, o: (g, 0, 0),
                             memory_space=pltpu.VMEM)
    smem_full = pl.BlockSpec(memory_space=pltpu.SMEM)
    six = pltpu.VMEM((P, L), dtype)
    E = pl.pallas_call(
        kernel,
        grid=(G, O),
        in_specs=[pool_spec, pool_spec, pool_spec, smem_full, smem_full],
        out_specs=pl.BlockSpec((1, 1, nD, P, L),
                               lambda g, o: (g, o, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, O, nD, P, L), dtype),
        scratch_shapes=[six, six,
                        pltpu.VMEM((6, P, L), dtype),
                        pltpu.VMEM((6, P, L), dtype),
                        pltpu.VMEM((6, P, L), dtype),
                        pltpu.VMEM((6, P, L), dtype),
                        pltpu.VMEM((6, P, L), dtype),
                        pltpu.VMEM((6, P, L), dtype)],
        interpret=interpret,
    )(codes, blw, blc, brev, blen)
    return E
