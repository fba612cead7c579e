"""Pallas TPU kernel for the flank-row phases of the forward HMM.

The XLA path (ops/hmm.py segment_forward) runs the row recurrence as a
`lax.scan`, which materializes the [P,H,L] carry through HBM between steps.
This kernel fuses the whole row loop into one Mosaic program: the three DP
states live in VMEM scratch for the entire scan, each grid cell owning one
(pool, haplotype-tile) slab.  Semantics are identical to `_flank_row`
(reference: src/SeqAlignment/HapAligner.cpp:110-156); the in-row insert
recurrence uses the same cummax formulation, computed by log-doubling
shifted maxima (Mosaic has no cummax primitive).

Enabled with HIPSTR_TPU_PALLAS=1 (or pallas=True on segment_forward); the
parity test runs it in interpreter mode on CPU against the scan path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.alignment_model import (
    LOG_DEL_TO_DEL,
    LOG_DEL_TO_MATCH,
    LOG_INS_TO_INS,
    LOG_INS_TO_MATCH,
)

NEG = -1.0e30


def _shift_right_lanes(x, fill):
    """x[..., j] <- x[..., j-1], first lane <- fill (lane-axis shift)."""
    L = x.shape[-1]
    ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    rolled = jnp.roll(x, 1, axis=-1)
    return jnp.where(ids >= 1, rolled, fill)


def _cummax_lanes(x):
    """Cumulative max along the lane axis by log-doubling."""
    L = x.shape[-1]
    ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    k = 1
    while k < L:
        rolled = jnp.roll(x, k, axis=-1)
        x = jnp.maximum(x, jnp.where(ids >= k, rolled, NEG))
        k *= 2
    return x


def _scan_kernel(codes_ref, blw_ref, blc_ref, C_ref, Csh_ref, onehot_ref,
                 chars_ref, m2m_ref, m2i_ref, m2d_ref, active_ref,
                 M0_ref, I0_ref, D0_ref,
                 Mcol_ref, Mout_ref, Iout_ref, Dout_ref,
                 M_s, I_s, D_s, *, n_rows, dtype):
    codes = codes_ref[0, 0]       # [L] int32
    blw = blw_ref[0, 0]           # [L]
    blc = blc_ref[0, 0]
    C = C_ref[0, 0]
    Csh = Csh_ref[0, 0]
    onehot = onehot_ref[0, 0]     # [L] 1.0 at the segment's last column
    TILE_H, L = M0_ref.shape[1], M0_ref.shape[2]
    jj = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, L), 1).astype(dtype)

    M_s[:] = M0_ref[0]
    I_s[:] = I0_ref[0]
    D_s[:] = D0_ref[0]

    def body(r, _):
        M = M_s[:]
        I = I_s[:]
        D = D_s[:]
        char = chars_ref[r, :]    # [TILE_H]
        m2m = m2m_ref[r, :][:, None]
        m2i = m2i_ref[r, :][:, None]
        m2d = m2d_ref[r, :][:, None]
        active = active_ref[r, 0] != 0

        emit = jnp.where(codes[None, :] == char[:, None],
                         blc[None, :], blw[None, :])

        D_new = jnp.maximum(M + LOG_DEL_TO_MATCH, D + LOG_DEL_TO_DEL)

        A = _shift_right_lanes(M + LOG_INS_TO_MATCH, 0.0)
        F = A - Csh[None, :] - jj * LOG_INS_TO_INS
        I_new = (C[None, :] + jj * LOG_INS_TO_INS + _cummax_lanes(F))

        Msh = _shift_right_lanes(M, NEG)
        Dsh = _shift_right_lanes(D, NEG)
        Ish = _shift_right_lanes(I_new, NEG)
        T = jnp.maximum(Ish + m2i, jnp.maximum(Msh + m2m, Dsh + m2d))
        ids0 = jax.lax.broadcasted_iota(jnp.int32, T.shape, 1)
        T = jnp.where(ids0 == 0, 0.0, T)
        M_new = emit + T

        M_s[:] = jnp.where(active, M_new, M)
        I_s[:] = jnp.where(active, I_new, I)
        D_s[:] = jnp.where(active, D_new, D)
        # last-valid-column extraction (the only value later rows consume)
        Mcol_ref[0, r, :] = jnp.sum(M_s[:] * onehot[None, :], axis=-1)
        return 0

    jax.lax.fori_loop(0, n_rows, body, 0)
    Mout_ref[0] = M_s[:]
    Iout_ref[0] = I_s[:]
    Dout_ref[0] = D_s[:]


IMPOSSIBLE = -1000000000.0


def _flank_step(M, I, D, emit, C, Csh, jj, m2m, m2i, m2d):
    D_new = jnp.maximum(M + LOG_DEL_TO_MATCH, D + LOG_DEL_TO_DEL)
    A = _shift_right_lanes(M + LOG_INS_TO_MATCH, 0.0)
    F = A - Csh[None, :] - jj * LOG_INS_TO_INS
    I_new = C[None, :] + jj * LOG_INS_TO_INS + _cummax_lanes(F)
    Msh = _shift_right_lanes(M, NEG)
    Dsh = _shift_right_lanes(D, NEG)
    Ish = _shift_right_lanes(I_new, NEG)
    T = jnp.maximum(Ish + m2i, jnp.maximum(Msh + m2m, Dsh + m2d))
    ids0 = jax.lax.broadcasted_iota(jnp.int32, T.shape, 1)
    T = jnp.where(ids0 == 0, 0.0, T)
    return emit + T, I_new, D_new


def _segment_kernel(codes_ref, blw_ref, blc_ref, C_ref, Csh_ref, onehot_ref,
                    chars_ref, m2m_ref, m2i_ref, m2d_ref, active_ref,
                    E_ref, lpmf_ref, opt1h_ref, shifts_ref,
                    Mcol_ref, M_s, I_s, D_s, mx_s, sm_s, acc_s,
                    *, R, sr, n_opts, n_art, period, dtype):
    codes = codes_ref[0, 0]
    blw = blw_ref[0, 0]
    blc = blc_ref[0, 0]
    C = C_ref[0, 0]
    Csh = Csh_ref[0, 0]
    onehot = onehot_ref[0, 0]
    H, L = M_s.shape
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, L), 1).astype(dtype)

    def emit_for(char):
        return jnp.where(codes[None, :] == char[:, None],
                         blc[None, :], blw[None, :])

    def write_col(r):
        Mcol_ref[0, r, :] = jnp.sum(M_s[:] * onehot[None, :], axis=-1)

    def flank_row(r, carry=0):
        M, I, D = M_s[:], I_s[:], D_s[:]
        Mn, In, Dn = _flank_step(
            M, I, D, emit_for(chars_ref[r, :]), C, Csh, jj,
            m2m_ref[r, :][:, None], m2i_ref[r, :][:, None],
            m2d_ref[r, :][:, None])
        active = active_ref[r, 0] != 0
        M_s[:] = jnp.where(active, Mn, M)
        I_s[:] = jnp.where(active, In, I)
        D_s[:] = jnp.where(active, Dn, D)
        write_col(r)
        return 0

    # row 0
    M_s[:] = emit_for(chars_ref[0, :]) + Csh[None, :]
    I_s[:] = jnp.broadcast_to(C[None, :], (H, L)).astype(dtype)
    D_s[:] = jnp.full((H, L), IMPOSSIBLE, dtype)
    write_col(0)

    # phase 1: flank rows 1..sr-1
    if sr > 1:
        jax.lax.fori_loop(1, sr, flank_row, 0)

    # stutter row: online logsumexp over artifact sizes; entry values come
    # from the previous match row shifted by (rep_len[opt] + artifact).
    # Decomposition: one dynamic circular base roll per OPTION (binary bits
    # of rep_len[o] + D_min), then one static circular roll per ARTIFACT —
    # circular wrap needs no fill because the per-artifact validity mask
    # (j >= shift) zeroes the wrapped region, and for invalid artifacts
    # (negative shift) every value is <= 0 so the IMPOSSIBLE clamp holds.
    Mprev = M_s[:]
    mx_s[:] = jnp.full((H, L), NEG, dtype)
    sm_s[:] = jnp.zeros((H, L), dtype)
    ids = jax.lax.broadcasted_iota(jnp.int32, (H, L), 1)
    opt_cols = jax.lax.broadcasted_iota(jnp.int32, opt1h_ref.shape, 1)
    acc_s[:] = jnp.zeros_like(acc_s)

    def per_option(o, carry):
        base_shift = shifts_ref[0, o] % L     # shift of the smallest artifact
        base = Mprev
        k = 1
        while k < L:
            cand = jnp.roll(base, k, axis=1)  # circular, no fill needed
            base = jnp.where((base_shift & k) != 0, cand, base)
            k *= 2
        sel = jnp.sum(jnp.where(opt_cols == o, opt1h_ref[:], 0.0), axis=1)
        for d in range(n_art):
            step = (d * period) % L
            ent = jnp.roll(base, step, axis=1) if step else base
            s_d = shifts_ref[d, o]
            ent = jnp.where(ids >= s_d, ent, 0.0)
            E_row = E_ref[0, d, o]
            acc_s[d] = acc_s[d] + sel[:, None] * (ent + E_row[None, :])
        return carry

    jax.lax.fori_loop(0, n_opts, per_option, 0)
    for d in range(n_art):
        val = lpmf_ref[d, :][:, None] + acc_s[d]
        val = jnp.maximum(val, IMPOSSIBLE)
        new_max = jnp.maximum(mx_s[:], val)
        sm_s[:] = (sm_s[:] * jnp.exp(mx_s[:] - new_max)
                   + jnp.exp(val - new_max))
        mx_s[:] = new_max
    M_s[:] = mx_s[:] + jnp.log(sm_s[:])
    I_s[:] = jnp.full((H, L), IMPOSSIBLE, dtype)
    D_s[:] = jnp.full((H, L), IMPOSSIBLE, dtype)
    write_col(sr)

    # forced-match row after the repeat block
    if sr + 1 < R:
        T = _shift_right_lanes(M_s[:], NEG)
        ids0 = jax.lax.broadcasted_iota(jnp.int32, T.shape, 1)
        T = jnp.where(ids0 == 0, 0.0, T)
        M_s[:] = emit_for(chars_ref[sr + 1, :]) + T
        write_col(sr + 1)

    # phase 3: remaining flank rows
    if sr + 2 < R:
        jax.lax.fori_loop(sr + 2, R, flank_row, 0)


def segment_scan_pallas(codes, blw, blc, C, Csh, last_col, meta, E,
                        R, sr, period, dtype=jnp.float32, interpret=False):
    """Full segment forward pass in one Mosaic program.

    E: [P, O, L, nD] dense stutter emissions (XLA-computed).  Returns
    Mcol [R, P, H] — the per-row last-valid-column match values, the only
    quantities the seed combination consumes.
    """
    P, L = codes.shape
    H = meta.row_char.shape[0]
    n_opts = meta.rep_len.shape[0]
    n_art = meta.lpmf.shape[1]
    onehot = (jnp.arange(L)[None, :] == last_col[:, None]).astype(dtype)
    active2d = meta.row_active.astype(jnp.int32)[:, None]
    lpmf_h = meta.lpmf[meta.hap_opt].T.astype(dtype)            # [nD, H]
    opt1h = (meta.hap_opt[:, None]
             == jnp.arange(n_opts)[None, :]).astype(dtype)        # [H, O]
    # artifact size d is max_deletion + d*period (RepeatStutterInfo bounds);
    # the entry offset for (artifact, option) is rep_len[o] + D_d
    D_sizes = (jnp.arange(n_art, dtype=jnp.int32)
               - (n_art - 1) // 2) * period
    shifts = (meta.rep_len[None, :].astype(jnp.int32)
              + D_sizes[:, None])                                # [nD, O]

    pool3 = lambda x: x[:, None, :]
    E_t = jnp.moveaxis(E, -1, 1).astype(dtype)                   # [P,nD,O,L]

    grid = (P,)
    kernel = functools.partial(_segment_kernel, R=R, sr=sr, n_opts=n_opts,
                               n_art=n_art, period=period, dtype=dtype)
    pool_spec = pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((R, H), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    Mcol = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pool_spec, pool_spec, pool_spec, pool_spec, pool_spec,
                  pool_spec,
                  row_spec, row_spec, row_spec, row_spec,
                  pl.BlockSpec((R, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, n_art, n_opts, L), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((n_art, H), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((H, n_opts), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, R, H), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, R, H), dtype),
        scratch_shapes=[pltpu.VMEM((H, L), dtype)] * 5
        + [pltpu.VMEM((n_art, H, L), dtype)],
        interpret=interpret,
    )(pool3(codes), pool3(blw), pool3(blc), pool3(C), pool3(Csh),
      pool3(onehot),
      meta.row_char.T, meta.row_m2m.T.astype(dtype),
      meta.row_m2i.T.astype(dtype), meta.row_m2d.T.astype(dtype),
      active2d, E_t, lpmf_h, opt1h, shifts)
    return jnp.moveaxis(Mcol, 0, 1)


def flank_scan_pallas(codes, blw, blc, C, Csh, last_col,
                      row_char, row_m2m, row_m2i, row_m2d, row_active,
                      M, I, D, dtype=jnp.float32, interpret=False):
    """Fused flank-row scan.

    codes/blw/blc/C/Csh: [P, L]; last_col: [P]; row_*: [n_rows, H] (already
    sliced + transposed); row_active: [n_rows]; M/I/D: [P, H, L].
    Returns (M, I, D, Mcol [n_rows, P, H]).
    """
    P, L = codes.shape
    n_rows, H = row_char.shape
    onehot = (jnp.arange(L)[None, :] == last_col[:, None]).astype(dtype)
    active2d = row_active.astype(jnp.int32)[:, None]

    # grid over pools; each cell owns the full [H, L] state slab in VMEM
    grid = (P,)
    kernel = functools.partial(_scan_kernel, n_rows=n_rows, dtype=dtype)
    out_shape = (
        jax.ShapeDtypeStruct((P, n_rows, H), dtype),
        jax.ShapeDtypeStruct((P, H, L), dtype),
        jax.ShapeDtypeStruct((P, H, L), dtype),
        jax.ShapeDtypeStruct((P, H, L), dtype),
    )
    pool_spec = pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((n_rows, H), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((1, H, L), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    exp = lambda x: x[:, None, :]   # pools as [P, 1, L]
    Mcol, Mn, In, Dn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pool_spec, pool_spec, pool_spec, pool_spec, pool_spec,
                  pool_spec,
                  row_spec, row_spec, row_spec, row_spec,
                  pl.BlockSpec((n_rows, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  state_spec, state_spec, state_spec],
        out_specs=(
            pl.BlockSpec((1, n_rows, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            state_spec, state_spec, state_spec),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((H, L), dtype)] * 3,
        interpret=interpret,
    )(exp(codes), exp(blw), exp(blc), exp(C), exp(Csh), exp(onehot),
      row_char, row_m2m.astype(dtype), row_m2i.astype(dtype),
      row_m2d.astype(dtype), active2d, M, I, D)
    return Mn, In, Dn, jnp.moveaxis(Mcol, 0, 1)
