"""Batched stutter-aware forward HMM on device.

TPU-first re-design of the reference's per-(read, haplotype) DP
(reference: src/SeqAlignment/HapAligner.cpp:26-231):

* batch: all read pools x all haplotypes of a locus advance together; the DP
  is a `lax.scan` over haplotype rows carrying [pools, haps, read_len] state.
* within a row, the insert-state recurrence I[j] = blc[j] + max(entry[j],
  I[j-1] + ins_extend) is solved with a cumulative max after an affine
  transform (no sequential inner loop), the delete state is elementwise from
  the previous row, and the match state needs only shifted previous-row
  values.
* a repeat block collapses to a single row whose emissions come from the
  dense stutter-emission tensor (ops/stutter_emission.py), marginalized over
  artifact sizes with an online log-sum-exp.
* the final likelihood needs only the *last valid column* of each match row
  (seed-anchored combination, reference HapAligner.cpp:163-231), so the scan
  emits one [pools, haps] column per row.

Row structure is shared by all haplotypes of a locus (flank-block options are
length-preserving; repeat blocks are always one row), so row metadata packs
into dense [haps, rows] tensors (align/packing.py) and the only control flow
is a three-phase split: pre-stutter rows, stutter + forced-match row,
post-stutter rows.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .stutter_emission import stutter_emissions

IMPOSSIBLE = -1.0e9
NEG = -1.0e30
LOG_INS_TO_INS = -1.0
LOG_INS_TO_MATCH = float(np.log1p(-np.exp(-1.0)))
LOG_DEL_TO_DEL = -1.0
LOG_DEL_TO_MATCH = float(np.log1p(-np.exp(-1.0)))


class SegmentInputs(NamedTuple):
    """One read segment per pool (left of seed, or reversed right of seed).

    Reads travel host->device as raw codes + quality bytes (2 bytes/base);
    log-probabilities are expanded on device via `expand_quals`."""

    codes: jax.Array      # [P, L] int8 base codes (4 = N/pad)
    quals: jax.Array      # [P, L] uint8 raw quality bytes (0 = padding)
    last_col: jax.Array   # [P] int32: segment_len - 1


class HapMeta(NamedTuple):
    """Per-haplotype row metadata for one orientation (fw or rev)."""

    row_char: jax.Array   # [H, R] int8 hap char codes
    row_m2m: jax.Array    # [H, R] match->match log prob for the row
    row_m2i: jax.Array    # [H, R] match->ins
    row_m2d: jax.Array    # [H, R] match->del
    rep_rev_codes: jax.Array  # [O, Bmax] repeat allele codes, right-to-left
    rep_len: jax.Array    # [O] int32
    lpmf: jax.Array       # [O, nD] log P(artifact size), IMPOSSIBLE if invalid
    hap_opt: jax.Array    # [H] int32 repeat option per haplotype
    row_active: jax.Array  # [R] bool; False marks bucket-padding rows


def expand_quals(quals, dtype):
    """Raw quality bytes -> (log P(error), log P(correct)) via the
    BaseQuality tables (reference: src/base_quality.h:44-75)."""
    from ..models.base_quality import BaseQuality
    idx = quals.astype(jnp.int32)
    blw = jnp.take(jnp.asarray(BaseQuality.log_error_table, dtype), idx)
    blc = jnp.take(jnp.asarray(BaseQuality.log_correct_table, dtype), idx)
    return blw, blc


class SeedMeta(NamedTuple):
    seed_fw_row: jax.Array   # [S] int32 fw structural row for M_l anchor
    seed_rev_row: jax.Array  # [S] int32 rev structural row for M_r anchor
    seed_char: jax.Array     # [H, S] int32 hap char under the seed
    seed_valid: jax.Array    # [S] bool
    first_char: jax.Array    # [H]
    last_char: jax.Array     # [H]
    log_num_seeds: jax.Array  # scalar: -log(#flank positions)
    cfg_fw_row: jax.Array    # scalar int: fw row of hap position n-2
    cfg_rev_row: jax.Array   # scalar int: rev row of rev position n-2


def _emit(codes, char, blc, blw):
    """[P,H,L] emission: codes [P,L] vs per-hap char [H]."""
    eq = codes[:, None, :] == char[None, :, None]
    return jnp.where(eq, blc[:, None, :], blw[:, None, :])


def _shift_right(x, fill):
    return jnp.concatenate(
        [jnp.full(x.shape[:-1] + (1,), fill, x.dtype), x[..., :-1]], axis=-1)


def _flank_row(M, I, D, emit, C, Csh, jj, m2m, m2i, m2d):
    """One flank row of the DP (reference HapAligner.cpp:110-156)."""
    m2m = m2m[None, :, None]
    m2i = m2i[None, :, None]
    m2d = m2d[None, :, None]

    D_new = jnp.maximum(M + LOG_DEL_TO_MATCH, D + LOG_DEL_TO_DEL)

    A = _shift_right(M + LOG_INS_TO_MATCH, 0.0)
    A = A.at[..., 0].set(0.0)
    F = A - Csh[:, None, :] - jj * LOG_INS_TO_INS
    I_new = (C[:, None, :] + jj * LOG_INS_TO_INS
             + jax.lax.cummax(F, axis=F.ndim - 1))

    Msh = _shift_right(M, NEG)
    Dsh = _shift_right(D, NEG)
    Ish = _shift_right(I_new, NEG)
    T = jnp.maximum(Ish + m2i, jnp.maximum(Msh + m2m, Dsh + m2d))
    T = T.at[..., 0].set(0.0)
    M_new = emit + T
    return M_new, I_new, D_new


def _forced_match_row(M, emit):
    """Row immediately after a repeat block: must be entered by a match
    (reference HapAligner.cpp:124-139)."""
    T = _shift_right(M, NEG).at[..., 0].set(0.0)
    M_new = emit + T
    bad = jnp.full_like(M_new, IMPOSSIBLE)
    return M_new, bad, bad


def _stutter_row(M, meta: HapMeta, E, period, dtype):
    """The collapsed repeat-block row (reference HapAligner.cpp:62-108).

    M: previous row's match state [P,H,L].  E: [P,O,L,nD] emissions.
    Online log-sum-exp over artifact sizes keeps memory at [P,H,L].
    Entry offsets (j - rep_len - D) are computed here from rep_len/hap_opt.
    """
    L = M.shape[-1]
    nD = meta.lpmf.shape[-1]
    D_min = -((nD - 1) // 2) * period
    art = D_min + jnp.arange(nD, dtype=jnp.int32) * period
    shift = (meta.rep_len.astype(jnp.int32)[meta.hap_opt][:, None]
             + art[None, :])                                   # [H, nD]
    jjL = jnp.arange(L, dtype=jnp.int32)
    entry_idx = jnp.clip(jjL[None, None, :] - shift[:, :, None], 0, L - 1)
    entry_ok = jjL[None, None, :] >= shift[:, :, None]         # [H, nD, L]
    lpmf_h = meta.lpmf[meta.hap_opt]  # [H, nD]
    E_h = E[:, meta.hap_opt]          # [P, H, L, nD]

    def one_artifact(carry, xs):
        run_max, run_sum = carry
        lpmf_d, E_d, idx, ok = xs     # [H], [P,H,L], [H,L], [H,L]
        entry = jnp.take_along_axis(
            M, jnp.broadcast_to(idx[None], M.shape), axis=-1)
        entry = jnp.where(ok[None], entry, 0.0)
        val = lpmf_d[None, :, None] + E_d + entry
        val = jnp.maximum(val, IMPOSSIBLE)  # invalid artifacts -> IMPOSSIBLE
        new_max = jnp.maximum(run_max, val)
        run_sum = run_sum * jnp.exp(run_max - new_max) + jnp.exp(val - new_max)
        return (new_max, run_sum), None

    init = (jnp.full(M.shape, NEG, dtype), jnp.zeros(M.shape, dtype))
    xs = (lpmf_h.T.astype(dtype), jnp.moveaxis(E_h, -1, 0),
          jnp.swapaxes(entry_idx, 0, 1),
          jnp.swapaxes(entry_ok, 0, 1))
    (run_max, run_sum), _ = jax.lax.scan(one_artifact, init, xs)
    M_st = run_max + jnp.log(run_sum)
    bad = jnp.full_like(M_st, IMPOSSIBLE)
    return M_st, bad, bad


def segment_forward(seg: SegmentInputs, meta: HapMeta, R: int, period: int,
                    sr: int, dtype=jnp.float32):
    """Run the DP for one orientation; returns (Mcol [R,P,H], seg_logsum [P]).

    seg_logsum is the all-bases-soft-clipped probability (the reference's
    `left_prob`, HapAligner.cpp:34-42).
    """
    import os
    use_pallas = os.environ.get("HIPSTR_TPU_PALLAS", "") not in ("", "0")
    pallas_interpret = os.environ.get("HIPSTR_TPU_PALLAS_INTERPRET",
                                      "") not in ("", "0")
    # "fused" runs the whole segment (incl. the stutter row) in one Mosaic
    # program; "flank" keeps the stutter row in XLA and fuses only the
    # flank-row scans (measured faster: XLA's gathers beat the masked-
    # accumulation entry select on the repeat row)
    pallas_mode = os.environ.get("HIPSTR_TPU_PALLAS_MODE", "flank")

    P, L = seg.codes.shape
    H = meta.row_char.shape[0]
    blw, blc = expand_quals(seg.quals, dtype)
    codes = seg.codes.astype(jnp.int32)
    C = jnp.cumsum(blc, axis=-1)
    Csh = _shift_right(C, 0.0)
    jj = jnp.arange(L, dtype=dtype)

    def col(Mrow):
        idx = jnp.broadcast_to(seg.last_col[:, None, None], (P, H, 1))
        return jnp.take_along_axis(Mrow, idx, axis=-1)[..., 0]

    # stutter-block emission tensors, one per repeat option: E [P,O,L,nD]
    def one(codes_p, w_p, c_p, rev_o, len_o):
        return stutter_emissions(jnp, codes_p, w_p, c_p, rev_o, len_o,
                                 period=period, max_units=6)

    per_opt = jax.vmap(one, in_axes=(None, None, None, 0, 0), out_axes=0)
    per_pool = jax.vmap(per_opt, in_axes=(0, 0, 0, None, None), out_axes=0)
    E = per_pool(codes, blw, blc,
                 meta.rep_rev_codes.astype(jnp.int32),
                 meta.rep_len).astype(dtype)

    if use_pallas and pallas_mode == "fused":
        # fully fused Mosaic program: row 0 + flank rows + stutter row +
        # forced-match row in one kernel, state resident in VMEM throughout
        from .pallas_hmm import segment_scan_pallas
        Mcol = segment_scan_pallas(
            codes, blw, blc, C, Csh, seg.last_col, meta, E,
            R, sr, period, dtype=dtype, interpret=pallas_interpret)
        seg_logsum = jnp.take_along_axis(C, seg.last_col[:, None],
                                         axis=-1)[:, 0]
        return Mcol, seg_logsum

    # row 0: leftmost haplotype char; preceding read bases soft-clip at blc
    emit0 = _emit(codes, meta.row_char[:, 0].astype(jnp.int32), blc, blw)
    M = emit0 + Csh[:, None, :]
    I = jnp.broadcast_to(C[:, None, :], (P, H, L)).astype(dtype)
    D = jnp.full((P, H, L), IMPOSSIBLE, dtype)
    pieces = [col(M)[None]]

    def scan_rows(M, I, D, lo, hi):
        if hi <= lo:
            return (M, I, D), None
        if use_pallas:
            # fused Mosaic kernel for the flank rows only; the stutter row
            # stays in XLA
            from .pallas_hmm import flank_scan_pallas
            Mn, In, Dn, Mcol_rows = flank_scan_pallas(
                codes, blw, blc, C, Csh, seg.last_col,
                meta.row_char[:, lo:hi].T, meta.row_m2m[:, lo:hi].T,
                meta.row_m2i[:, lo:hi].T, meta.row_m2d[:, lo:hi].T,
                meta.row_active[lo:hi], M, I, D, dtype=dtype,
                interpret=pallas_interpret)
            return (Mn, In, Dn), Mcol_rows

        def body(carry, xs):
            M, I, D = carry
            char, m2m, m2i, m2d, active = xs
            emit = _emit(codes, char, blc, blw)
            Mn, In, Dn = _flank_row(M, I, D, emit, C, Csh, jj, m2m, m2i, m2d)
            # inactive (bucket-padding) rows pass the carry through untouched
            M = jnp.where(active, Mn, M)
            I = jnp.where(active, In, I)
            D = jnp.where(active, Dn, D)
            return (M, I, D), col(M)

        xs = (meta.row_char[:, lo:hi].T, meta.row_m2m[:, lo:hi].T,
              meta.row_m2i[:, lo:hi].T, meta.row_m2d[:, lo:hi].T,
              meta.row_active[lo:hi])
        (M, I, D), ys = jax.lax.scan(body, (M, I, D), xs)
        return (M, I, D), ys

    # phase 1: flank rows 1 .. sr-1
    (M, I, D), ys = scan_rows(M, I, D, 1, sr)
    if ys is not None:
        pieces.append(ys)

    # phase 2: stutter row, then forced-match row
    M, I, D = _stutter_row(M, meta, E, period, dtype)
    pieces.append(col(M)[None])
    if sr + 1 < R:
        emit = _emit(codes, meta.row_char[:, sr + 1].astype(jnp.int32), blc, blw)
        M, I, D = _forced_match_row(M, emit)
        pieces.append(col(M)[None])

    # phase 3: remaining flank rows
    (M, I, D), ys = scan_rows(M, I, D, sr + 2, R)
    if ys is not None:
        pieces.append(ys)

    Mcol = jnp.concatenate(pieces, axis=0)  # [R, P, H]
    seg_logsum = jnp.take_along_axis(C, seg.last_col[:, None], axis=-1)[:, 0]
    return Mcol, seg_logsum


def hmm_forward(l_seg: SegmentInputs, r_seg: SegmentInputs,
                fw_meta: HapMeta, rev_meta: HapMeta, seed: SeedMeta,
                seed_codes, seed_quals,
                R_fw: int, R_rev: int, period: int, sr_fw: int, sr_rev: int,
                dtype=jnp.float32):
    """Full forward pass: [P, H] log-likelihoods.

    Mirrors HapAligner::process_read + compute_aln_logprob
    (src/SeqAlignment/HapAligner.cpp:573-709, :163-231): the left segment
    aligns against the forward haplotype, the reversed right segment against
    the reversed haplotype, and the seed base marginalizes over anchor
    positions with a uniform prior over flank positions.
    """
    seed_blw, seed_blc = expand_quals(seed_quals, dtype)
    seed_codes = seed_codes.astype(jnp.int32)
    Mcol_fw, l_prob = segment_forward(l_seg, fw_meta, R_fw, period, sr_fw, dtype)
    Mcol_rev, r_prob = segment_forward(r_seg, rev_meta, R_rev, period, sr_rev,
                                       dtype)

    prior = jnp.asarray(seed.log_num_seeds).astype(dtype)

    # interior seed configs: [P, H, S]
    eq = seed_codes[:, None, None] == seed.seed_char[None, :, :]
    sc_seed = jnp.where(eq, seed_blc[:, None, None], seed_blw[:, None, None])
    Ml = jnp.moveaxis(Mcol_fw[seed.seed_fw_row], 0, -1)    # [P, H, S]
    Mr = jnp.moveaxis(Mcol_rev[seed.seed_rev_row], 0, -1)  # [P, H, S]
    vals = prior + sc_seed + Ml + Mr
    vals = jnp.where(seed.seed_valid[None, None, :], vals, NEG)

    # off-haplotype configs (seed at hap position 0 / n-1): [P, H]
    eqA = seed_codes[:, None] == seed.first_char[None, :]
    scA = jnp.where(eqA, seed_blc[:, None], seed_blw[:, None])
    cfgA = prior + scA + l_prob[:, None] + jnp.take(Mcol_rev,
                                                    seed.cfg_rev_row, axis=0)
    eqB = seed_codes[:, None] == seed.last_char[None, :]
    scB = jnp.where(eqB, seed_blc[:, None], seed_blw[:, None])
    cfgB = prior + scB + r_prob[:, None] + jnp.take(Mcol_fw,
                                                    seed.cfg_fw_row, axis=0)

    allv = jnp.concatenate([vals, cfgA[:, :, None], cfgB[:, :, None]], axis=-1)
    m = jnp.max(allv, axis=-1)
    LL = m + jnp.log(jnp.sum(jnp.exp(allv - m[..., None]), axis=-1))
    return LL
