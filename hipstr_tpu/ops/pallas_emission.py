"""Pallas TPU kernel for the dense stutter-block emission tensor.

The XLA formulations (ops/stutter_emission.py) materialize
[artifacts, block+1, L] intermediates per (locus, pool, option) — tens of
GB of HBM traffic per batch, which made E ~80% of the forward pass.  This
kernel streams the same math through VMEM: grid = (loci, options), each
program holds [P, L] pool slabs and sweeps the block axis, so nothing
bigger than [P, L] ever leaves registers/VMEM.

The block sweeps are `lax.fori_loop`s with *runtime* trip counts (the
real block length, not the bucket pad): a fully unrolled formulation
traced O(Bmax * artifacts) jaxpr (50s of host time per compiled shape and
2.7MB Mosaic payloads), while the loops keep the jaxpr O(artifacts) and
skip padded columns at run time.  Dynamic lane shears are binary-
decomposition static rolls + iota mask (Mosaic has no dynamic rotate on
non-128 lane dims), batched so each loop iteration pays one shear over a
stacked [artifacts+1, P, L] slab.

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


def _unrolled_loop(jaxlib, lo, hi, body, unroll):
    """fori_loop with manual unrolling for TRACED bounds: runs body(t) for
    t in [lo, hi) plus up to unroll-1 overrun steps, which every caller's
    body makes exact no-ops (masked columns are zeros / NEG contributions).
    Amortizes the per-iteration VMEM scratch read/write over `unroll`
    column updates."""
    if unroll <= 1:
        jaxlib.lax.fori_loop(lo, hi, lambda t, c: (body(t), 0)[1], 0)
        return

    def blk(i, c):
        t0 = lo + i * unroll
        for k in range(unroll):
            body(t0 + k)
        return 0

    n = (hi - lo + unroll - 1) // unroll
    jaxlib.lax.fori_loop(0, n, blk, 0)


def _emission_kernel(codes_ref, blw_ref, blc_ref,
                     brev_ref, blen_ref, per_ref,
                     E_ref,
                     e0_s, pref0_s, run6_s, tot6_s, mx6_s, sm6_s, cum6_s,
                     star6_s, e0sh_s,
                     *, Bmax, max_units, P, L, dtype, unroll=1):
    g = pl.program_id(0)
    o = pl.program_id(2)
    codes = codes_ref[0]
    blw = blw_ref[0]
    blc = blc_ref[0]
    blen = blen_ref[g, o]
    # the repeat period is per-locus runtime data so ONE compiled kernel
    # serves every period in a mixed dispatch (dispatch consolidation)
    period = per_ref[g]
    nd = max_units
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (P, L), 1)
    zeros = jnp.zeros((P, L), dtype)
    dps = [(max_units - d) * period for d in range(nd)]   # 6p, 5p, .., 1p
    kps = [(k + 1) * period for k in range(nd)]           # 1p .. 6p
    max_ins = max_units * period

    def col_S(k):
        """Score column k (k may be traced): log P(read char | block char
        b_rev[k]), zero outside the block (k >= blen)."""
        kc = jnp.clip(k, 0, Bmax - 1)
        ch = brev_ref[g, o, kc]
        Sk = jnp.where(codes == ch, blc, blw)
        return jnp.where(k < blen, Sk, zeros)

    def dyn_shear(x, t, max_shift=None):
        """x[..., j - t] with zero fill for j < t.  Static roll for
        compile-time t; binary-decomposition static rolls + mask for traced
        t (works for t >= L: the mask empties the row).  A static
        `max_shift` bound (t < max_shift always) drops the high-bit rolls:
        the repeat period is <= 9, so period shears need 4 rolls, not
        log2(L)."""
        if isinstance(t, (int, np.integer)):
            if t == 0:
                return x
            if t >= L:
                return jnp.zeros_like(x)
            return jnp.where(j_ids >= t, jnp.roll(x, t, axis=-1),
                             jnp.zeros_like(x))
        bs = t % L
        y = x
        k = 1
        hi = max_shift if max_shift is not None else L
        while k < hi:
            y = jnp.where((bs & k) != 0, jnp.roll(y, k, axis=-1), y)
            k *= 2
        return jnp.where(j_ids >= t, y, jnp.zeros_like(x))

    def stack_cols(t):
        """[nd+1, P, L] stacked score columns (t, t+dp_0..dp_{nd-1})
        sheared by t with ONE batched shear."""
        cols = jnp.stack([col_S(t)] + [col_S(t + dp) for dp in dps])
        return dyn_shear(cols, t)

    # ---- pass 1: forward prefixes; capture E0 and deletion totals --------
    e0_s[:] = zeros
    pref0_s[:] = zeros
    for d in range(nd):
        run6_s[d] = zeros
        tot6_s[d] = zeros

    def body1(t):
        sc = stack_cols(t)
        pref0_s[:] = pref0_s[:] + sc[0]
        e0_s[:] = jnp.where(t + 1 == blen, pref0_s[:], e0_s[:])
        for d in range(nd):
            run6_s[d] = run6_s[d] + sc[1 + d]
            tot6_s[d] = jnp.where(t + 1 == blen - dps[d], run6_s[d],
                                  tot6_s[d])

    _unrolled_loop(jax, 0, blen, body1, unroll)

    # ---- pass 2: deletion position LSE (evaluate at p, then extend) ------
    pref0_s[:] = zeros
    for d in range(nd):
        run6_s[d] = zeros
        mx6_s[d] = jnp.full((P, L), NEG_INF, dtype)
        sm6_s[d] = zeros

    def body2(p):
        for d in range(nd):
            ok = p <= blen - dps[d]
            val = pref0_s[:] + tot6_s[d] - run6_s[d]
            contrib = jnp.where(ok, val, jnp.full((P, L), NEG_INF, dtype))
            new_max = jnp.maximum(mx6_s[d], contrib)
            sm6_s[d] = (sm6_s[d] * jnp.exp(mx6_s[d] - new_max)
                        + jnp.exp(contrib - new_max))
            mx6_s[d] = new_max
        sc = stack_cols(p)          # adds zeros once p >= blen
        pref0_s[:] = pref0_s[:] + sc[0]
        for d in range(nd):
            run6_s[d] = run6_s[d] + sc[1 + d]

    _unrolled_loop(jax, 0, blen + 1, body2, unroll)

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
    # the periodic index falls outside the block.  The capture shears of E0
    # by each kps[k] are loop-invariant: hoist them into scratch (built by
    # composing shears of `period`, since shear(shear(x,a),b)=shear(x,a+b)).
    pref0_s[:] = zeros                      # reused as the insertion cumsum
    cur = dyn_shear(e0_s[:], period, max_shift=16)
    e0sh_s[0] = cur
    for k in range(1, nd):
        cur = dyn_shear(cur, period, max_shift=16)
        e0sh_s[k] = cur

    def body3(t):
        cm = jax.lax.rem(t, period)
        ch = brev_ref[g, o, cm]
        Sk = jnp.where(codes == ch, blc, blw)
        pair = jnp.where(cm < blen, Sk, blc)
        # overrun steps of the unrolled loop (t >= max_ins) must be no-ops
        pair = jnp.where(t < max_ins, pair, zeros)
        pref0_s[:] = pref0_s[:] + dyn_shear(pair, t)
        for k in range(nd):
            start = pref0_s[:] + e0sh_s[k]
            cum6_s[k] = jnp.where(t + 1 == kps[k], start, cum6_s[k])

    for k in range(nd):
        cum6_s[k] = zeros
    _unrolled_loop(jax, 0, max_ins, body3, unroll)

    # position sweep: cum[k, p] evaluated online with the P*-clamp
    for k in range(nd):
        mx6_s[k] = jnp.full((P, L), NEG_INF, dtype)
        sm6_s[k] = zeros
        star6_s[k] = zeros

    def body4(p):
        for k in range(nd):
            kp = kps[k]
            # P*[j] = clip(min(blen + kp, j + 1) - kp, 0, blen)
            Pstar = jnp.clip(jnp.minimum(blen, j_ids + 1 - kp), 0, blen)
            val = cum6_s[k]
            star6_s[k] = jnp.where(p == Pstar, val, star6_s[k])
            contrib = jnp.where(p <= Pstar, val,
                                jnp.full((P, L), NEG_INF, dtype))
            new_max = jnp.maximum(mx6_s[k], contrib)
            sm6_s[k] = (sm6_s[k] * jnp.exp(mx6_s[k] - new_max)
                        + jnp.exp(contrib - new_max))
            mx6_s[k] = new_max
        # accumulate deltas: cum[k] += sum_{m<=k} G[m, q=p] where G[m] is
        # the (frozen-masked) score delta rolled by kps[m]; the per-m shears
        # compose incrementally from shears of `period`
        q = p
        diff = col_S(q + period) - col_S(q)
        diff = jnp.where(q + period >= blen, zeros, diff)
        base = dyn_shear(diff, q)
        run = zeros
        cur = base
        for m in range(nd):
            cur = dyn_shear(cur, period, max_shift=16)
            run = run + cur
            cum6_s[m] = cum6_s[m] + run

    _unrolled_loop(jax, 0, blen + 1, body4, unroll)

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
                             interpret=False, unroll=None, periods=None):
    """E [G, O, nD, P, L] for a batch: codes [G,P,L] int32, blw/blc [G,P,L],
    brev [G,O,Bmax] int32, blen [G,O] int32.

    The repeat period is runtime data: pass `periods` [G] int32 for a
    mixed-period batch (one compiled kernel serves them all); the scalar
    `period` fallback broadcasts."""
    G, P, L = codes.shape
    O, Bmax = brev.shape[1], brev.shape[2]
    nD = 2 * max_units + 1
    if periods is None:
        periods = jnp.full((G,), period, jnp.int32)
    periods = periods.astype(jnp.int32)

    if unroll is None:
        import os
        # measured (2026-08-20, v5e): unroll=4 best at P<=64 pools/program,
        # unroll=2 best at the deep-coverage P=128 slabs (VMEM scratch
        # pressure); docs/DESIGN.md round-5 notes
        default = "2" if P >= 128 else "4"
        unroll = int(os.environ.get("HIPSTR_TPU_E_UNROLL", default))
    # tile the pool axis: VMEM scratch scales with the pool-slab rows, so
    # large dispatches (deep coverage / many samples -> P >= 256) exceed
    # the 16MB scoped-VMEM budget unless each program holds <=128 pools.
    # Pools are independent rows; grid order (G, T, O) keeps one pool slab
    # resident across the O sweep.
    PT = P if P <= 128 else 128
    assert P % PT == 0, "pool buckets are powers of two"
    T = P // PT
    kernel = functools.partial(_emission_kernel, Bmax=Bmax,
                               max_units=max_units, P=PT, L=L, dtype=dtype,
                               unroll=unroll)
    pool_spec = pl.BlockSpec((1, PT, L), lambda g, t, o: (g, t, 0),
                             memory_space=pltpu.VMEM)
    smem_full = pl.BlockSpec(memory_space=pltpu.SMEM)
    six = pltpu.VMEM((PT, L), dtype)
    E = pl.pallas_call(
        kernel,
        grid=(G, T, O),
        in_specs=[pool_spec, pool_spec, pool_spec, smem_full, smem_full,
                  smem_full],
        out_specs=pl.BlockSpec((1, 1, nD, PT, L),
                               lambda g, t, o: (g, o, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, O, nD, P, L), dtype),
        scratch_shapes=[six, six,
                        pltpu.VMEM((6, PT, L), dtype),
                        pltpu.VMEM((6, PT, L), dtype),
                        pltpu.VMEM((6, PT, L), dtype),
                        pltpu.VMEM((6, PT, L), dtype),
                        pltpu.VMEM((6, PT, L), dtype),
                        pltpu.VMEM((6, PT, L), dtype),
                        pltpu.VMEM((6, PT, L), dtype)],
        interpret=interpret,
    )(codes, blw, blc, brev, blen, periods)
    return E
