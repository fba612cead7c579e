"""Dense stutter-block emission tensors.

Computes, for every read-suffix offset j and artifact size D, the
log-likelihood of the read suffix ending at j against a repeat-block allele
carrying a PCR stutter artifact of size D, marginalized over artifact
positions — the quantity the reference produces sequentially per offset in
StutterAlignerClass::align_stutter_region_reverse (reference:
src/SeqAlignment/StutterAlignerClass.cpp:55-162).

Re-designed for TPU: instead of the reference's O(1)-amortized sequential
position updates, position-marginal probabilities come from prefix-sum tables
along anti-diagonals (gathers + cumulative sums), with the artifact-size axis
carried as a real tensor dimension (no unrolled per-size code), so the whole
[read_offsets x artifact_sizes] emission tensor is one dense vector-ops graph.
Semantics match the reference exactly, including its truncation rules and the
frozen-delta behavior near the block start (StutterAlignerClass.cpp:89-90).

All functions are written against an `xp` array namespace so the same code
runs under numpy (oracle tests, float64) and jax.numpy (device kernels).
Shapes are static in the padded block length `Bmax`; the true block length is
a runtime scalar so one compiled kernel serves all repeat-allele lengths.
"""

from __future__ import annotations

import numpy as np

NEG_INF = -1.0e30


def _score_matrix(xp, read_codes, blw, blc, block_rev_codes, block_len, Bmax):
    """S[t, k] = log P(read[t] | block char b_rev[k]); 0 outside the block."""
    eq = read_codes[:, None] == block_rev_codes[None, :Bmax]
    S = xp.where(eq, blc[:, None], blw[:, None])
    kmask = xp.arange(Bmax)[None, :] < block_len
    return xp.where(kmask, S, 0.0)


def _hankel_prefix(xp, S, Bmax):
    """pref[..., j, p] = sum_{t<p, t<=j} S[..., j-t, t] for p in [0, Bmax].

    Anti-diagonal prefix sums over the last two axes: gather S into
    X[..., j, t] = S[..., j-t, t] (zero when j < t), then cumulative-sum.
    """
    L = S.shape[-2]
    j_idx = xp.arange(L)[:, None]
    t_idx = xp.arange(Bmax)[None, :]
    rows = j_idx - t_idx                       # [L, Bmax]
    valid = rows >= 0
    rows_b = xp.broadcast_to(rows, S.shape[:-2] + rows.shape)
    X = xp.take_along_axis(S, xp.clip(rows_b, 0, L - 1), axis=-2)
    X = xp.where(valid, X, 0.0)
    csum = xp.cumsum(X, axis=-1)
    zero = xp.zeros(S.shape[:-1] + (1,), dtype=S.dtype)
    return xp.concatenate([zero, csum], axis=-1)  # [..., L, Bmax+1]


def _logsumexp(xp, x, axis):
    m = xp.max(x, axis=axis, keepdims=True)
    m = xp.where(xp.isfinite(m), m, 0.0)
    return xp.squeeze(m, axis=axis) + xp.log(xp.sum(xp.exp(x - m), axis=axis))


def stutter_emissions(xp, read_codes, blw, blc, block_rev_codes, block_len,
                      period, max_units=6):
    """Emission tensor E[L, nD] over artifact sizes D = k*period,
    k in [-max_units, max_units] (deletions first, ascending).

    Entries with block_len + D < 0 are NEG_INF (impossible artifact).
    `block_len` may be a traced scalar; `period`, `max_units`, and the padded
    length of `block_rev_codes` (Bmax) are static.
    """
    L = read_codes.shape[0]
    Bmax = block_rev_codes.shape[0]
    dtype = blc.dtype

    blen = xp.asarray(block_len, dtype=np.int32)
    S = _score_matrix(xp, read_codes, blw, blc, block_rev_codes, blen, Bmax)
    pref0 = _hankel_prefix(xp, S, Bmax)        # [L, Bmax+1]
    p_axis = xp.arange(Bmax + 1)
    j_axis = xp.arange(L)

    def fdt(v):
        return xp.asarray(v).astype(dtype)

    # ---- no-artifact: E0[j] = pref0[j, block_len] ---------------------------
    E0 = xp.take_along_axis(
        pref0, xp.broadcast_to(blen, (L, 1)).astype(np.int32), axis=1)[:, 0]

    # ---- deletions (D = -dp, dp = d*period, d = max_units..1) ---------------
    nd = max_units
    dps = xp.asarray(np.arange(max_units, 0, -1) * period)        # [nd]
    colidx = xp.arange(Bmax)[None, :] + dps[:, None]              # [nd, Bmax]
    col_ok = (colidx < blen) & (colidx < Bmax)
    SD = xp.take_along_axis(
        xp.broadcast_to(S[None], (nd, L, Bmax)),
        xp.broadcast_to(xp.clip(colidx, 0, Bmax - 1)[:, None, :],
                        (nd, L, Bmax)), axis=-1)
    SD = xp.where(col_ok[:, None, :], SD, 0.0)                    # [nd, L, Bmax]
    prefD = _hankel_prefix(xp, SD, Bmax)                          # [nd, L, Bmax+1]
    rem = xp.clip(blen - dps, 0, Bmax)                            # [nd]
    totalD = xp.take_along_axis(
        prefD, xp.broadcast_to(rem[:, None, None], (nd, L, 1)
                               ).astype(np.int32), axis=-1)[..., 0]  # [nd, L]
    LLp = pref0[None] + (totalD[..., None] - prefD)               # [nd, L, Bmax+1]
    pmask = p_axis[None, None, :] <= (blen - dps)[:, None, None]
    LLp = xp.where(pmask, LLp, NEG_INF)
    lse_del = _logsumexp(xp, LLp, axis=-1)                        # [nd, L]
    prior_del = -xp.log(fdt(xp.maximum(blen - dps + 1, 1)))       # [nd]
    E_del = xp.where((blen - dps >= 0)[:, None],
                     prior_del[:, None] + lse_del, NEG_INF)       # [nd, L]

    # ---- insertions (D = kp, kp = k*period, k = 1..max_units) ---------------
    max_ins = max_units * period
    t_idx = xp.arange(max_ins)[None, :]
    rows = j_axis[:, None] - t_idx                                # [L, max_ins]
    rvalid = rows >= 0
    rclip = xp.clip(rows, 0, L - 1)
    colmod = xp.asarray(np.arange(max_ins) % period, dtype=np.int32)
    # inserted-base scores: periodic extension b_rev[t % period]; plain
    # log-correct when the periodic index falls outside the block
    # (load_read, StutterAlignerClass.cpp:40-48)
    Speri = xp.take_along_axis(
        S, xp.broadcast_to(colmod[None, :], (L, max_ins)), axis=1)
    isc = xp.take_along_axis(Speri, rclip, axis=0)
    blc_sh = xp.take_along_axis(
        xp.broadcast_to(blc[:, None], (L, max_ins)), rclip, axis=0)
    isc = xp.where(colmod[None, :] >= blen, blc_sh, isc)
    isc = xp.where(rvalid, isc, 0.0)
    ins_cum = xp.concatenate(
        [xp.zeros((L, 1), dtype=dtype), xp.cumsum(isc, axis=1)], axis=1)

    kps = np.arange(1, max_units + 1) * period                    # static [nk]
    ins0 = ins_cum[:, np.minimum(kps, max_ins)]                   # [L, nk]
    # match remainder after the insertion: E0[j - kp] when j >= kp
    rest_rows = j_axis[None, :] - xp.asarray(kps)[:, None]        # [nk, L]
    rest = xp.take_along_axis(
        xp.broadcast_to(E0[None, :], (len(kps), L)),
        xp.clip(rest_rows, 0, L - 1), axis=1)
    rest = xp.where(rest_rows >= 0, rest, 0.0)                    # [nk, L]
    LL0 = ins0.T + rest                                           # [nk, L]

    # per-unit position-shift deltas (the incremental update of
    # StutterAlignerClass.cpp:73-96 in closed form), stacked over units m
    q_idx = xp.arange(1, Bmax + 1)[None, :]                       # [1, Q]
    SA = _shifted_cols(xp, S, period, Bmax)    # SA[t, q-1] = S[t, q-1+period]
    SB = S                                     # SB[t, q-1] = S[t, q-1]
    m_sh = xp.asarray(np.arange(1, max_units + 1) * period)       # [nm]
    rows_m = (j_axis[None, :, None] - (q_idx[None] - 1)
              - m_sh[:, None, None])                              # [nm, L, Q]
    rv = rows_m >= 0
    rc = xp.clip(rows_m, 0, L - 1)
    gA = xp.take_along_axis(xp.broadcast_to(SA[None], rc.shape), rc, axis=1)
    gB = xp.take_along_axis(xp.broadcast_to(SB[None], rc.shape), rc, axis=1)
    G = gA - gB
    frozen = (q_idx - 1 + period) >= blen                         # [1, Q]
    G = xp.where(frozen[None] | ~rv, 0.0, G)
    deltas = xp.cumsum(G, axis=0)                                 # [nm, L, Q]

    cum = xp.concatenate(
        [xp.zeros((len(kps), L, 1), dtype=dtype),
         xp.cumsum(deltas, axis=-1)], axis=-1) + LL0[..., None]   # [nk, L, Bmax+1]
    # configs beyond P*(j,k) repeat the value at P*
    base_len = xp.minimum(blen + xp.asarray(kps)[:, None], j_axis[None, :] + 1)
    Pstar = xp.clip(base_len - xp.asarray(kps)[:, None], 0, blen)  # [nk, L]
    pc = xp.minimum(xp.broadcast_to(p_axis[None, None, :],
                                    (len(kps), L, Bmax + 1)),
                    Pstar[..., None]).astype(np.int32)
    LLfinal = xp.take_along_axis(cum, pc, axis=-1)
    pmask_i = p_axis[None, None, :] <= blen
    LLfinal = xp.where(pmask_i, LLfinal, NEG_INF)
    lse_ins = _logsumexp(xp, LLfinal, axis=-1)                    # [nk, L]
    E_ins = -xp.log(fdt(blen + 1)) + lse_ins

    return xp.concatenate(
        [xp.swapaxes(E_del, 0, 1), E0[:, None], xp.swapaxes(E_ins, 0, 1)],
        axis=1)  # [L, 2*max_units+1]


def _shifted_cols(xp, S, period, Bmax):
    """SA[t, q] = S[t, q + period] for q in [0, Bmax), zero beyond."""
    L = S.shape[0]
    if period < Bmax:
        pad = xp.zeros((L, period), dtype=S.dtype)
        return xp.concatenate([S[:, period:], pad], axis=1)[:, :Bmax]
    return xp.zeros((L, Bmax), dtype=S.dtype)


# ---------------------------------------------------------------------------
# TPU-oriented variant: identical math, no gathers.
#
# take_along_axis lowers to XLA gather, which is the dominant cost of this
# module on TPU.  Every gather above has Hankel/Toeplitz structure (indices
# j - t), so it can be realized as static circular lane-rolls selected by a
# bit decomposition of the per-column shift.  Arrays are oriented [.., B, L]
# with the read axis L on lanes, so all rolls are lane-rolls and all prefix
# sums run along sublanes.
# ---------------------------------------------------------------------------


def _shear_lanes(xp, X, fill=0.0):
    """Y[..., t, j] = X[..., t, j - t] (fill when j < t).

    The per-row shift equals the row index t; realized as log2(B) masked
    circular rolls along the lane axis.
    """
    B, L = X.shape[-2], X.shape[-1]
    t_idx = xp.arange(B)[:, None]
    k = 1
    while k < B:
        mask = (t_idx & k) != 0
        Xr = xp.roll(X, k, axis=-1)
        X = xp.where(mask, Xr, X)
        k *= 2
    j_idx = xp.arange(L)[None, :]
    return xp.where(j_idx >= t_idx, X, fill)


def _roll_rows(xp, X, shift, fill=0.0):
    """Y[..., j] = X[..., j - shift] along the lane axis, static shift."""
    if shift == 0:
        return X
    L = X.shape[-1]
    j_idx = xp.arange(L)
    return xp.where(j_idx >= shift, xp.roll(X, shift, axis=-1), fill)


def stutter_emissions_tpu(xp, read_codes, blw, blc, block_rev_codes,
                          block_len, period, max_units=6):
    """Gather-free reimplementation of `stutter_emissions`.

    Returns E [nD, L] (note the transpose vs the generic version: artifact
    axis leading, read axis on lanes).  Bit-identical math to the generic
    path; parity enforced by tests/test_stutter_emission.py.
    """
    L = read_codes.shape[0]
    Bmax = block_rev_codes.shape[0]
    dtype = blc.dtype

    blen = xp.asarray(block_len, np.int32)
    t_col = xp.arange(Bmax)[:, None]                           # [B, 1]
    p_col = xp.arange(Bmax + 1)[:, None]                       # [B+1, 1]
    j_row = xp.arange(L)[None, :]                              # [1, L]

    # S_T[t, j] = log P(read[j] | block char b_rev[t]); 0 outside the block
    eq = read_codes[None, :] == block_rev_codes[:, None]
    S = xp.where(eq, blc[None, :], blw[None, :])
    S = xp.where(t_col < blen, S, 0.0)                         # [B, L]

    def hankel_prefix(M):
        """pref[..., p, j] = sum_{t < p, t <= j} M[..., t, j - t]."""
        X = _shear_lanes(xp, M)
        csum = xp.cumsum(X, axis=-2)
        zero = xp.zeros(M.shape[:-2] + (1, L), dtype=dtype)
        return xp.concatenate([zero, csum], axis=-2)           # [.., B+1, L]

    def pick_row(M, row):
        """M[..., row, :] for a traced scalar row index (one-hot reduce)."""
        n = M.shape[-2]
        oh = (xp.arange(n)[:, None] == row).astype(dtype)
        return xp.sum(M * oh, axis=-2)

    pref0 = hankel_prefix(S)                                   # [B+1, L]

    # ---- no-artifact ------------------------------------------------------
    E0 = pick_row(pref0, blen)                                 # [L]

    def fdt(v):
        return xp.asarray(v).astype(dtype)

    # ---- deletions (D = -dp, dp = d*period, d = max_units..1) -------------
    dps = np.arange(max_units, 0, -1) * period                 # static [nd]
    SD_list = []
    for dp in dps:
        dp = int(dp)
        if dp < Bmax:
            SDd = xp.concatenate(
                [S[dp:, :], xp.zeros((dp, L), dtype=dtype)], axis=0)
        else:
            SDd = xp.zeros((Bmax, L), dtype=dtype)
        SDd = xp.where(t_col + dp < blen, SDd, 0.0)
        SD_list.append(SDd)
    SD = xp.stack(SD_list)                                     # [nd, B, L]
    prefD = hankel_prefix(SD)                                  # [nd, B+1, L]
    rem = xp.clip(blen - xp.asarray(dps), 0, Bmax)             # [nd]
    totalD = pick_row(prefD, rem[:, None, None])               # [nd, L]
    LLp = pref0[None] + (totalD[:, None, :] - prefD)           # [nd, B+1, L]
    pmask = p_col[None] <= (blen - xp.asarray(dps))[:, None, None]
    LLp = xp.where(pmask, LLp, NEG_INF)
    m = xp.max(LLp, axis=-2)
    lse_del = m + xp.log(xp.sum(xp.exp(LLp - m[:, None, :]), axis=-2))
    prior_del = -xp.log(fdt(xp.maximum(blen - xp.asarray(dps) + 1, 1)))
    E_del = xp.where((blen - xp.asarray(dps) >= 0)[:, None],
                     prior_del[:, None] + lse_del, NEG_INF)    # [nd, L]

    # ---- insertions (D = kp, kp = k*period, k = 1..max_units) -------------
    max_ins = max_units * period
    reps = -(-max_ins // period)
    Speri = xp.concatenate([S[:period, :]] * reps, axis=0)[:max_ins]
    colmod = np.arange(max_ins) % period                       # static
    blc_b = xp.broadcast_to(blc[None, :], (max_ins, L))
    # inserted-base scores, with plain log-correct when the periodic index
    # falls outside the block (load_read, StutterAlignerClass.cpp:40-48)
    pair = xp.where((xp.asarray(colmod)[:, None] >= blen), blc_b, Speri)
    isc = _shear_lanes(xp, pair)                               # [max_ins, L]
    ins_cum = xp.concatenate(
        [xp.zeros((1, L), dtype=dtype), xp.cumsum(isc, axis=0)], axis=0)

    kps = np.arange(1, max_units + 1) * period                 # static [nk]
    nk = len(kps)
    ins0 = xp.stack([ins_cum[int(min(kp, max_ins))] for kp in kps])  # [nk, L]
    rest = xp.stack([_roll_rows(xp, E0, int(kp)) for kp in kps])     # [nk, L]
    LL0 = ins0 + rest                                          # [nk, L]

    # per-unit position-shift deltas, gathered via shear + static rolls
    SA = _shifted_cols_rows(xp, S, period, Bmax)               # [B, L]
    gA0 = _shear_lanes(xp, SA)                                 # [q-1 shear]
    gB0 = _shear_lanes(xp, S)
    frozen = (t_col + period) >= blen                          # [B, 1]
    G_list = []
    for m_sh in (np.arange(1, max_units + 1) * period):
        gA = _roll_rows(xp, gA0, int(m_sh))
        gB = _roll_rows(xp, gB0, int(m_sh))
        G_list.append(xp.where(frozen, 0.0, gA - gB))
    deltas = xp.cumsum(xp.stack(G_list), axis=0)               # [nm, B, L]

    cum = xp.concatenate(
        [xp.zeros((nk, 1, L), dtype=dtype),
         xp.cumsum(deltas, axis=-2)], axis=-2) + LL0[:, None, :]  # [nk,B+1,L]
    base_len = xp.minimum(blen + xp.asarray(kps)[:, None], j_row + 1)
    Pstar = xp.clip(base_len - xp.asarray(kps)[:, None], 0, blen)  # [nk, L]
    cum_at = xp.sum(
        cum * (p_col[None] == Pstar[:, None, :]).astype(dtype), axis=-2)
    LLfinal = xp.where(p_col[None] <= Pstar[:, None, :], cum, cum_at[:, None, :])
    LLfinal = xp.where(p_col[None] <= blen, LLfinal, NEG_INF)
    m2 = xp.max(LLfinal, axis=-2)
    lse_ins = m2 + xp.log(xp.sum(xp.exp(LLfinal - m2[:, None, :]), axis=-2))
    E_ins = -xp.log(fdt(blen + 1)) + lse_ins                   # [nk, L]

    return xp.concatenate([E_del, E0[None, :], E_ins], axis=0)  # [nD, L]


def _shifted_cols_rows(xp, S, period, Bmax):
    """SA[t, j] = S[t + period, j] for t in [0, Bmax), zero beyond."""
    L = S.shape[-1]
    if period < Bmax:
        pad = xp.zeros((period, L), dtype=S.dtype)
        return xp.concatenate([S[period:, :], pad], axis=0)[:Bmax]
    return xp.zeros((Bmax, L), dtype=S.dtype)
