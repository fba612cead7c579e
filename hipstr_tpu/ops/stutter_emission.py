"""Dense stutter-block emission tensors.

Computes, for every read-suffix offset j and artifact size D, the
log-likelihood of the read suffix ending at j against a repeat-block allele
carrying a PCR stutter artifact of size D, marginalized over artifact
positions — the quantity the reference produces sequentially per offset in
StutterAlignerClass::align_stutter_region_reverse (reference:
src/SeqAlignment/StutterAlignerClass.cpp:55-162).

Re-designed for TPU: instead of the reference's O(1)-amortized sequential
position updates, we materialize position-marginal probabilities from
prefix-sum tables along anti-diagonals (a few gathers + cumulative sums), so
the whole [read_offsets x artifact_sizes] emission tensor is produced with
dense vector ops.  Semantics match the reference exactly, including its
truncation rules and the frozen-delta behavior near the block start
(StutterAlignerClass.cpp:89-90).

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
    """pref[j, p] = sum_{t<p, t<=j} S[j-t, t] for p in [0, Bmax].

    Anti-diagonal prefix sums: gather S into X[j, t] = S[j-t, t] (zero when
    j < t) and cumulative-sum over t.
    """
    L = S.shape[0]
    j_idx = xp.arange(L)[:, None]
    t_idx = xp.arange(Bmax)[None, :]
    rows = j_idx - t_idx
    valid = rows >= 0
    X = xp.take_along_axis(S, xp.clip(rows, 0, L - 1), axis=0)
    X = xp.where(valid, X, 0.0)
    csum = xp.cumsum(X, axis=1)
    zero = xp.zeros((L, 1), dtype=S.dtype)
    return xp.concatenate([zero, csum], axis=1)  # [L, Bmax+1]


def stutter_emissions(xp, read_codes, blw, blc, block_rev_codes, block_len,
                      period, max_units=6):
    """Emission tensor E[L, nD] over artifact sizes D = k*period,
    k in [-max_units, max_units].

    Entries with block_len + D < 0 are NEG_INF (impossible artifact).
    `block_len` may be a traced scalar; `period`, `max_units`, and the padded
    length of `block_rev_codes` (Bmax) are static.

    Matches StutterAlignerClass::align_stutter_region_reverse semantics for a
    segment whose rightmost considered base is read[j] (offset j); the no-
    artifact column is the plain reverse match probability
    (StutterAlignerClass.cpp:55-57).
    """
    L = read_codes.shape[0]
    Bmax = block_rev_codes.shape[0]
    dtype = blc.dtype

    blen_i = xp.asarray(block_len, dtype=np.int32)  # runtime scalar
    S = _score_matrix(xp, read_codes, blw, blc, block_rev_codes, blen_i, Bmax)
    pref0 = _hankel_prefix(xp, S, Bmax)  # [L, Bmax+1]
    p_axis = xp.arange(Bmax + 1)
    j_axis = xp.arange(L)

    def _fdt(v):
        return xp.asarray(v).astype(dtype)

    # ---- no-artifact: E0[j] = pref0[j, block_len] ---------------------------
    E0 = xp.take_along_axis(
        pref0, xp.broadcast_to(blen_i, (L, 1)).astype(np.int32), axis=1)[:, 0]

    # ---- deletions ----------------------------------------------------------
    del_cols = []
    for d in range(max_units, 0, -1):
        dp = d * period
        valid_art = blen_i - dp >= 0
        # SD[t, k] = S[t, k + dp] (block chars shifted left by the deletion)
        if dp < Bmax:
            SD = xp.concatenate(
                [S[:, dp:], xp.zeros((L, dp), dtype=dtype)], axis=1)
        else:
            SD = xp.zeros((L, Bmax), dtype=dtype)
        # also zero where k + dp >= block_len
        kmask = (xp.arange(Bmax)[None, :] + dp) < blen_i
        SD = xp.where(kmask, SD, 0.0)
        prefD = _hankel_prefix(xp, SD, Bmax)
        rem = xp.clip(blen_i - dp, 0, Bmax)
        totalD = xp.take_along_axis(
            prefD, xp.broadcast_to(rem, (L, 1)).astype(np.int32), axis=1)[:, 0]
        LLp = pref0 + (totalD[:, None] - prefD)  # [L, Bmax+1]
        pmask = p_axis[None, :] <= (blen_i - dp)
        LLp = xp.where(pmask, LLp, NEG_INF)
        lse = _logsumexp(xp, LLp, axis=1)
        prior = -xp.log(_fdt(xp.maximum(blen_i - dp + 1, 1)))
        col = xp.where(valid_art, prior + lse, NEG_INF)
        del_cols.append(col)

    # ---- insertions ---------------------------------------------------------
    max_ins = max_units * period
    # iscore0[j, t]: inserted-base scores for an insertion at the block's right
    # end; periodic extension b_rev[t % period], plain log-correct when the
    # periodic index falls outside the block (load_read,
    # StutterAlignerClass.cpp:40-48).
    t_idx = xp.arange(max_ins)[None, :]
    rows = j_axis[:, None] - t_idx
    rvalid = rows >= 0
    rclip = xp.clip(rows, 0, L - 1)
    colmod = xp.asarray(np.arange(max_ins) % period, dtype=np.int32)
    Speri = S[:, :period] if period <= Bmax else S  # b_rev[0:period]
    isc = xp.take_along_axis(
        xp.take_along_axis(Speri, xp.broadcast_to(colmod[None, :], (L, max_ins)),
                           axis=1),
        rclip, axis=0)
    blc_sh = xp.take_along_axis(
        xp.broadcast_to(blc[:, None], (L, max_ins)), rclip, axis=0)
    use_blc = colmod[None, :] >= blen_i
    isc = xp.where(use_blc, blc_sh, isc)
    isc = xp.where(rvalid, isc, 0.0)
    ins_cum = xp.concatenate(
        [xp.zeros((L, 1), dtype=dtype), xp.cumsum(isc, axis=1)], axis=1)

    # Gm[j, q] for q in [1, Bmax]: per-unit position-shift deltas
    # (the incremental update of StutterAlignerClass.cpp:73-96, closed form).
    q_idx = xp.arange(1, Bmax + 1)[None, :]
    deltas = []
    for m in range(1, max_units + 1):
        rows_m = j_axis[:, None] - (q_idx - 1) - m * period
        rvalid_m = rows_m >= 0
        rclip_m = xp.clip(rows_m, 0, L - 1)
        # columns q-1+period and q-1 of S, as [L(t), Q] slices
        SA = _shifted_cols(xp, S, period, Bmax)   # SA[t, q-1] = S[t, q-1+period]
        SB = S[:, :Bmax]                          # SB[t, q-1] = S[t, q-1]
        gA = xp.take_along_axis(SA, rclip_m, axis=0)
        gB = xp.take_along_axis(SB, rclip_m, axis=0)
        G = gA - gB
        # frozen delta when q-1+period >= block_len
        frozen = (q_idx - 1 + period) >= blen_i
        G = xp.where(frozen | ~rvalid_m, 0.0, G)
        deltas.append(G)
    deltas = xp.cumsum(xp.stack(deltas, axis=0), axis=0)  # [max_units, L, Bmax]

    ins_cols = []
    for k in range(1, max_units + 1):
        kp = k * period
        ins0 = ins_cum[:, min(kp, max_ins)]
        # match remainder after the insertion: pref0[j-kp, block_len] if j>=kp
        if kp < L:
            rest = xp.concatenate(
                [xp.zeros((kp,), dtype=dtype), E0[:L - kp]], axis=0)
            rest = xp.where(j_axis >= kp, rest, 0.0)
        else:
            rest = xp.zeros((L,), dtype=dtype)
        LL0 = ins0 + rest
        cum = xp.concatenate(
            [xp.zeros((L, 1), dtype=dtype),
             xp.cumsum(deltas[k - 1], axis=1)], axis=1) + LL0[:, None]
        # configs beyond P*(j) repeat the value at P*
        base_len = xp.minimum(blen_i + kp, j_axis + 1)
        Pstar = xp.clip(base_len - kp, 0, blen_i)  # = max(0, min(blen, j+1-kp))
        pc = xp.minimum(xp.broadcast_to(p_axis[None, :], (L, Bmax + 1)),
                        Pstar[:, None]).astype(np.int32)
        LLfinal = xp.take_along_axis(cum, pc, axis=1)
        pmask = p_axis[None, :] <= blen_i
        LLfinal = xp.where(pmask, LLfinal, NEG_INF)
        lse = _logsumexp(xp, LLfinal, axis=1)
        prior = -xp.log(_fdt(blen_i + 1))
        ins_cols.append(prior + lse)

    cols = del_cols + [E0] + ins_cols
    return xp.stack(cols, axis=1)  # [L, 2*max_units+1]


def _shifted_cols(xp, S, period, Bmax):
    """SA[t, q] = S[t, q + period] for q in [0, Bmax), zero beyond."""
    L = S.shape[0]
    if period < Bmax:
        pad = xp.zeros((L, period), dtype=S.dtype)
        return xp.concatenate([S[:, period:], pad], axis=1)[:, :Bmax]
    return xp.zeros((L, Bmax), dtype=S.dtype)


def _logsumexp(xp, x, axis):
    m = xp.max(x, axis=axis, keepdims=True)
    m = xp.where(xp.isfinite(m), m, 0.0)
    return xp.squeeze(m, axis=axis) + xp.log(
        xp.sum(xp.exp(x - m), axis=axis))
