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
