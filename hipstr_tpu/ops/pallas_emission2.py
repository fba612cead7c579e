"""Pallas emission kernel v2: slab-parallel instead of column-sequential.

The v1 kernel (pallas_emission.py) sweeps the block axis with ~3*blen
sequential fori_loop iterations, each touching ~25 [P, L] VMEM scratch
slabs — per-iteration overhead dominates (~75-140 ms/locus measured).
This kernel ports the dense host formulation (ops/stutter_emission.py
`stutter_emissions_tpu`, itself a re-derivation of reference
src/SeqAlignment/StutterAlignerClass.cpp:55-162) into VMEM-resident
[B, Pc, L] slabs:

* the score matrix S[t, p, j] is built once, sheared along lanes with
  log2(B) masked rolls, and prefix-summed along the block axis with
  log2(B) row-shifted adds (Hillis-Steele) -> PR[p] = diagonal prefixes;
* deletions use the identity  val_d[p, j] = PR[p, j] + E0[j+dp]
  - PR[p+dp, j+dp]  (the PR[dp] terms cancel), so each artifact size is
  a row/lane-shifted slab subtraction + masked LSE over the p axis;
* insertions use ONE row-prefix H of the frozen-masked period-shift
  delta slab: lane-rolls commute with row-sums, so
  cum_k = LL0_k + sum_{m<=k} roll(H, m*period), followed by the
  reference's P*-clamp (positions beyond P* repeat the value at P*).

Grid = (loci, options, pool chunks); everything per program is O(log B)
full-slab passes instead of O(B) scalar-driven iterations.

LANE-HEADROOM CONTRACT: deletion terms read lanes j + d*period, so E is
exact only for read offsets j with j + 6*period < L; lanes above that
are zeroed.  hap_aligner.prepare_locus sizes the L bucket so every real
read offset has headroom.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


def _shift_rows_down(x, k):
    """y[t] = x[t - k] (zero-fill top rows); static k along axis 0."""
    if k == 0:
        return x
    tio = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(tio >= k, jnp.roll(x, k, axis=0), 0.0)


def _shift_rows_up(x, k):
    """y[t] = x[t + k] (zero-fill bottom rows); static k along axis 0."""
    if k == 0:
        return x
    B = x.shape[0]
    tio = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(tio < B - k, jnp.roll(x, -k, axis=0), 0.0)


def _roll_lanes_right(x, k):
    """y[..., j] = x[..., j - k] (zero-fill lanes j < k); static k."""
    if k == 0:
        return x
    jio = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(jio >= k, jnp.roll(x, k, axis=-1), 0.0)


def _roll_lanes_left(x, k):
    """y[..., j] = x[..., j + k] (zero-fill top lanes); static k."""
    if k == 0:
        return x
    L = x.shape[-1]
    jio = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(jio < L - k, jnp.roll(x, -k, axis=-1), 0.0)


def _emission2_kernel(brev_ref, blen_ref,
                      codes_ref, blw_ref, blc_ref,
                      E_ref,
                      S3, PR, TMP, ICUM,
                      *, Bmax, period, max_units, Pc, L, dtype):
    g = pl.program_id(0)
    o = pl.program_id(1)
    blen = blen_ref[g, o]
    nd = max_units
    max_ins = max_units * period
    codes = codes_ref[0]                       # [Pc, L] int32
    blw = blw_ref[0]
    blc = blc_ref[0]

    tio3 = jax.lax.broadcasted_iota(jnp.int32, (Bmax, Pc, L), 0)
    jio3 = jax.lax.broadcasted_iota(jnp.int32, (Bmax, Pc, L), 2)
    jio2 = jax.lax.broadcasted_iota(jnp.int32, (Pc, L), 1)
    rio = jax.lax.broadcasted_iota(jnp.int32, (Bmax + 1, Pc, L), 0)
    zeros2 = jnp.zeros((Pc, L), dtype)

    # ---- S[t, :, j] = log P(read[j] | block char b_rev[t]); 0 for t >= blen
    for t in range(Bmax):
        ch = brev_ref[g, o, t]
        row = jnp.where(codes == ch, blc, blw)
        S3[t] = jnp.where(t < blen, row, zeros2)

    # ---- sheared copy + diagonal prefix PR[p] = sum_{t<p} S[t, j-t] -------
    X = S3[:]
    k = 1
    while k < Bmax:
        X = jnp.where((tio3 & k) != 0, jnp.roll(X, k, axis=2), X)
        k *= 2
    X = jnp.where(jio3 >= tio3, X, 0.0)
    k = 1
    while k < Bmax:
        X = X + _shift_rows_down(X, k)
        k *= 2
    PR[1:] = X
    PR[0] = zeros2

    # ---- no-artifact row: E0[j] = PR[blen, j] -----------------------------
    E0 = jnp.sum(jnp.where(rio == blen, PR[:], 0.0), axis=0)
    E_ref[0, 0, nd] = E0

    # ---- deletions: dps = (6..1)*period, E rows 0..5 ----------------------
    # val_d[p, j] = PR[p, j] + E0[j+dp] - PR[p+dp, j+dp]; LSE over
    # p <= blen - dp with uniform prior -log(blen - dp + 1)
    for d in range(nd):
        dp = (max_units - d) * period
        PRs = _roll_lanes_left(_shift_rows_up(PR[:], dp), dp)
        E0s = _roll_lanes_left(E0, dp)
        val = PR[:] + E0s[None] - PRs
        ok = rio <= blen - dp
        val = jnp.where(ok, val, NEG_INF)
        m = jnp.max(val, axis=0)
        s = jnp.sum(jnp.exp(val - m[None]), axis=0)
        rem = blen - dp
        prior = -jnp.log(jnp.maximum(rem + 1, 1).astype(dtype))
        E_ref[0, 0, d] = jnp.where(rem >= 0, prior + m + jnp.log(s),
                                   jnp.full((Pc, L), NEG_INF, dtype))

    # ---- insertions: kps = (1..6)*period, E rows nd+1 .. nd+6 -------------
    # inserted-base scores with periodic extension
    for t in range(max_ins):
        cm = t % period
        ch = brev_ref[g, o, cm]
        row = jnp.where(codes == ch, blc, blw)
        row = jnp.where(cm < blen, row, blc)
        ICUM[t] = row
    tioI = jax.lax.broadcasted_iota(jnp.int32, (max_ins, Pc, L), 0)
    jioI = jax.lax.broadcasted_iota(jnp.int32, (max_ins, Pc, L), 2)
    Y = ICUM[:max_ins]
    k = 1
    while k < max_ins:
        Y = jnp.where((tioI & k) != 0, jnp.roll(Y, k, axis=2), Y)
        k *= 2
    Y = jnp.where(jioI >= tioI, Y, 0.0)
    k = 1
    while k < max_ins:
        Y = Y + _shift_rows_down(Y, k)
        k *= 2
    ICUM[1:max_ins + 1] = Y                   # inclusive; row kp = sum_{t<kp}
    ICUM[0] = zeros2

    # per-unit position-shift delta slab, frozen-masked, sheared
    SA = _shift_rows_up(S3[:], period)        # SA[t] = S[t + period]
    Gb = SA - S3[:]
    Gb = jnp.where(tio3 + period >= blen, 0.0, Gb)
    k = 1
    while k < Bmax:
        Gb = jnp.where((tio3 & k) != 0, jnp.roll(Gb, k, axis=2), Gb)
        k *= 2
    Gb = jnp.where(jio3 >= tio3, Gb, 0.0)
    # H = exclusive row-prefix of Gb, rows 0..Bmax
    k = 1
    while k < Bmax:
        Gb = Gb + _shift_rows_down(Gb, k)
        k *= 2
    PR[1:] = Gb                               # PR reused as H
    PR[0] = zeros2

    TMP[:] = jnp.zeros((Bmax + 1, Pc, L), dtype)   # running sum_m roll(H)
    for ki in range(nd):
        kp = (ki + 1) * period
        TMP[:] = TMP[:] + _roll_lanes_right(PR[:], kp)
        LL0 = ICUM[min(kp, max_ins)] + _roll_lanes_right(E0, kp)
        cum = LL0[None] + TMP[:]
        base_len = jnp.minimum(blen + kp, jio2 + 1)
        Pstar = jnp.clip(base_len - kp, 0, blen)     # [Pc, L]
        cum_at = jnp.sum(jnp.where(rio == Pstar[None], cum, 0.0), axis=0)
        LLf = jnp.where(rio <= Pstar[None], cum, cum_at[None])
        LLf = jnp.where(rio <= blen, LLf, NEG_INF)
        m = jnp.max(LLf, axis=0)
        s = jnp.sum(jnp.exp(LLf - m[None]), axis=0)
        prior = -jnp.log((blen + 1).astype(dtype))
        E_ref[0, 0, nd + 1 + ki] = prior + m + jnp.log(s)


def _pick_pc(Bmax: int, L: int, P: int) -> int:
    """Largest pool-chunk keeping ~3.2 [B, Pc, L] slabs under ~10MB."""
    budget = 10 * 2 ** 20
    for pc in (128, 64, 32, 16, 8):
        if pc <= P and 3.2 * (Bmax + 1) * pc * L * 4 <= budget:
            return pc
    return 8


def stutter_emissions_pallas2(codes, blw, blc, brev, blen, period,
                              max_units=6, dtype=jnp.float32,
                              interpret=False):
    """E [G, O, nD, P, L]; same contract as stutter_emissions_pallas but
    exact only for lanes j with j + max_units*period < L (see module
    docstring); higher lanes are zero-filled garbage the HMM never uses."""
    G, P, L = codes.shape
    O, Bmax = brev.shape[1], brev.shape[2]
    nD = 2 * max_units + 1
    Pc = _pick_pc(Bmax, L, P)
    n_pc = -(-P // Pc)
    if P % Pc:
        pad = n_pc * Pc - P
        codes = jnp.pad(codes, ((0, 0), (0, pad), (0, 0)))
        blw = jnp.pad(blw, ((0, 0), (0, pad), (0, 0)))
        blc = jnp.pad(blc, ((0, 0), (0, pad), (0, 0)))

    max_ins = max_units * period
    kernel = functools.partial(_emission2_kernel, Bmax=Bmax, period=period,
                               max_units=max_units, Pc=Pc, L=L, dtype=dtype)
    pool_spec = pl.BlockSpec((1, Pc, L), lambda g, o, c: (g, c, 0),
                             memory_space=pltpu.VMEM)
    smem_full = pl.BlockSpec(memory_space=pltpu.SMEM)
    E = pl.pallas_call(
        kernel,
        grid=(G, O, n_pc),
        in_specs=[smem_full, smem_full, pool_spec, pool_spec, pool_spec],
        out_specs=pl.BlockSpec((1, 1, nD, Pc, L),
                               lambda g, o, c: (g, o, 0, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, O, nD, n_pc * Pc, L), dtype),
        scratch_shapes=[pltpu.VMEM((Bmax, Pc, L), dtype),
                        pltpu.VMEM((Bmax + 1, Pc, L), dtype),
                        pltpu.VMEM((Bmax + 1, Pc, L), dtype),
                        pltpu.VMEM((max_ins + 1, Pc, L), dtype)],
        interpret=interpret,
    )(brev, blen, codes, blw, blc)
    return E[:, :, :, :P, :]
