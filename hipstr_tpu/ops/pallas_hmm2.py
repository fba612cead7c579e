"""Pallas TPU kernel v2 for the stutter-aware forward HMM.

Round-1's kernels gridded over pools with [H, L] tiles (H is typically 4-8),
leaving vregs mostly empty and paying per-program overhead 128 times per
locus.  This kernel inverts the layout:

* grid = (loci, haplotypes); each program owns the whole [P, L] pool slab
  for one (locus, haplotype) pair — P is 64-128, so every VPU op runs on
  full (8, 128) vregs.
* the three DP states live in VMEM scratch for the entire row scan; HBM
  traffic is inputs once + the [R, P] last-column output.
* per-(haplotype, row) metadata is packed into ONE int32 SMEM stream
  (char code + 16 * homopolymer index) decoded against tiny transition
  LUTs in SMEM; the repeat-row entry offsets are computed in-kernel from
  one shift scalar (binary-decomposition circular rolls), so the
  [H, nD, L] entry tables round-1 shipped from host are not needed.
* bucket-padding rows are skipped via runtime loop bounds instead of
  where-passthrough, so padded rows cost nothing.

Semantics match ops/hmm.py `segment_forward` (reference:
src/SeqAlignment/HapAligner.cpp:26-231); parity is enforced by
tests/test_pallas_hmm2.py against the XLA scan path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.alignment_model import (
    LOG_DEL_TO_DEL,
    LOG_DEL_TO_MATCH,
    LOG_INS_TO_INS,
    LOG_INS_TO_MATCH,
    LOG_MATCH_TO_DEL,
    LOG_MATCH_TO_INS,
    LOG_MATCH_TO_MATCH,
)
from .hmm import expand_quals
from .stutter_emission import stutter_emissions_tpu

NEG = -1.0e30
IMPOSSIBLE = -1.0e9
STRIDE = 1024   # per-(locus, hap) scalar-stream stride; 1-D VMEM tile size


def _shift_right_lanes(x, fill):
    ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    rolled = jnp.roll(x, 1, axis=-1)
    return jnp.where(ids >= 1, rolled, fill)


def _cummax_lanes(x):
    L = x.shape[-1]
    ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    k = 1
    while k < L:
        rolled = jnp.roll(x, k, axis=-1)
        x = jnp.maximum(x, jnp.where(ids >= k, rolled, NEG))
        k *= 2
    return x


def _seg_kernel(opt_ref, shift_ref, bounds_ref,       # scalar prefetch (SMEM)
                meta_hbm, lpmf_hbm,                   # [G,H,*] in ANY/HBM
                codes_ref, blw_ref, blc_ref, C_ref, Csh_ref, oh_ref,
                lutm_ref, luti_ref, lutd_ref,
                E_ref,
                Mcol_ref,
                M_s, I_s, D_s, meta_ref, lpmf_ref, dma_sem,
                *, R, sr, nD, dtype, H):
    g = pl.program_id(0)
    h = pl.program_id(1)

    # rows skipped by the loop bounds keep NEG (they are bucket padding and
    # never referenced by seed metadata); columns of bucket-padding
    # haplotypes (h >= h_real) are NEG wholesale and skip all compute
    Mcol_ref[0, 0] = jnp.full((R, codes_ref.shape[1]), NEG, dtype)

    @pl.when(h < bounds_ref[g, 2])
    def _compute():
        # per-(locus, hap) scalar streams are DMAd into SMEM scratch per
        # grid step — full-array scalar prefetch is O(G*H*R) and overflows
        # the ~1MB SMEM budget at G=32, while blocked SMEM specs violate
        # the (8,128) block-shape rule.  The streams are FLATTENED to 1-D
        # with a 1024-element stride per (locus, hap): Mosaic rejects
        # [1, 1, Rp] slices of a [G, H, Rp] tiled ref (size-1 slice of the
        # 8-tiled middle dim), and 1-D VMEM refs are 1024-tiled, so both
        # the slice offset and length must be 1024 multiples.
        idx = g * H + h
        cp = pltpu.make_async_copy(meta_hbm.at[pl.ds(idx * STRIDE, STRIDE)],
                                   meta_ref, dma_sem)
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(lpmf_hbm.at[pl.ds(idx * STRIDE, STRIDE)],
                                   lpmf_ref, dma_sem)
        cp.start()
        cp.wait()
        codes = codes_ref[0]      # [P, L] int32
        blw = blw_ref[0]
        blc = blc_ref[0]
        C = C_ref[0]
        Csh = Csh_ref[0]
        onehot = oh_ref[0]        # [P, L]; 1.0 at each pool's last column
        P, L = codes.shape
        jj = jax.lax.broadcasted_iota(jnp.int32, (P, L), 1).astype(dtype)
        ids = jax.lax.broadcasted_iota(jnp.int32, (P, L), 1)
        # the repeat period is per-locus runtime data (mixed-period
        # dispatches share one compiled kernel)
        period = bounds_ref[g, 3]

        def emit_for(ch):
            return jnp.where(codes == ch, blc, blw)

        def write_col(r):
            Mcol_ref[0, 0, r, :] = jnp.sum(M_s[:] * onehot, axis=-1)

        def circ_roll(x, t):
            """Circular roll by a traced lane count (binary decomposition)."""
            bs = t % L
            y = x
            k = 1
            while k < L:
                y = jnp.where((bs & k) != 0, jnp.roll(y, k, axis=1), y)
                k *= 2
            return y

        # row 0: leftmost hap char; earlier read bases soft-clip at blc
        M_s[:] = emit_for(meta_ref[0] % 16) + Csh
        I_s[:] = C
        D_s[:] = jnp.full((P, L), IMPOSSIBLE, dtype)
        write_col(0)

        def flank_row(r, carry):
            M = M_s[:]
            I = I_s[:]
            D = D_s[:]
            v = meta_ref[r]
            emit = emit_for(v % 16)
            hp = v // 16
            m2m = lutm_ref[hp]
            m2i = luti_ref[hp]
            m2d = lutd_ref[hp]
            D_new = jnp.maximum(M + LOG_DEL_TO_MATCH, D + LOG_DEL_TO_DEL)
            A = _shift_right_lanes(M + LOG_INS_TO_MATCH, 0.0)
            F = A - Csh - jj * LOG_INS_TO_INS
            I_new = C + jj * LOG_INS_TO_INS + _cummax_lanes(F)
            Msh = _shift_right_lanes(M, NEG)
            Dsh = _shift_right_lanes(D, NEG)
            Ish = _shift_right_lanes(I_new, NEG)
            T = jnp.maximum(Ish + m2i, jnp.maximum(Msh + m2m, Dsh + m2d))
            T = jnp.where(ids == 0, 0.0, T)
            M_s[:] = emit + T
            I_s[:] = I_new
            D_s[:] = D_new
            write_col(r)
            return carry

        # phase 1: flank rows start1..sr-1 (1..start1-1 are bucket padding)
        start1 = bounds_ref[g, 0]
        jax.lax.fori_loop(start1, sr, flank_row, 0)

        # stutter row: online log-sum-exp over artifact sizes; the entry
        # value for artifact d is Mprev shifted by rep_len + D_min +
        # d*period lanes, realized as dynamic circular rolls (binary
        # decomposition).  Wrapped lanes are zeroed by the validity mask;
        # invalid artifacts have lpmf <= IMPOSSIBLE so their wrapped
        # garbage underflows out of the LSE.
        shift = shift_ref[g, h]           # rep_len[opt] + D_min (may be < 0)
        base = circ_roll(M_s[:], shift)
        mx = jnp.full((P, L), NEG, dtype)
        sm = jnp.zeros((P, L), dtype)
        cur = base
        for d in range(nD):
            if d:
                cur = circ_roll(cur, period)
            s_d = shift + d * period
            ent = jnp.where(ids >= s_d, cur, 0.0)
            val = lpmf_ref[d] + E_ref[0, 0, d] + ent
            val = jnp.maximum(val, IMPOSSIBLE)
            new_max = jnp.maximum(mx, val)
            sm = sm * jnp.exp(mx - new_max) + jnp.exp(val - new_max)
            mx = new_max
        M_s[:] = mx + jnp.log(sm)
        I_s[:] = jnp.full((P, L), IMPOSSIBLE, dtype)
        D_s[:] = jnp.full((P, L), IMPOSSIBLE, dtype)
        write_col(sr)

        # forced-match row: the repeat block must be exited via a match
        T = _shift_right_lanes(M_s[:], NEG)
        T = jnp.where(ids == 0, 0.0, T)
        M_s[:] = emit_for(meta_ref[sr + 1] % 16) + T
        write_col(sr + 1)

        # phase 3: remaining flank rows (tail bucket padding skipped)
        end3 = bounds_ref[g, 1]
        jax.lax.fori_loop(sr + 2, end3, flank_row, 0)


def segment_forward_v2(codes, quals, last_col, meta, E,
                       R, sr, period, dtype=jnp.float32, interpret=False,
                       h_real=None, periods=None):
    """Batched one-orientation forward pass.

    codes [G,P,L] int8, quals [G,P,L] uint8, last_col [G,P] int32; meta is a
    HapMeta pytree with a leading locus axis; E [G,O,nD,P,L] stutter
    emissions.  Returns (Mcol [G,R,P,H], seg_logsum [G,P]).

    The repeat period is runtime data (`periods` [G] int32; the scalar
    `period` broadcasts) so mixed-period batches share one compiled
    kernel.  `h_real` [G] int32 marks the real haplotype count per locus:
    bucket-padding columns h >= h_real[g] skip all compute and hold NEG.
    """
    G, P, L = codes.shape
    H = meta.row_char.shape[1]
    nD = meta.lpmf.shape[-1]
    if periods is None:
        periods = jnp.full((G,), period, jnp.int32)
    periods = periods.astype(jnp.int32)
    if h_real is None:
        h_real = jnp.full((G,), H, jnp.int32)
    h_real = h_real.astype(jnp.int32)
    D_min = -((nD - 1) // 2) * periods                          # [G]

    blw32, blc32 = expand_quals(quals, dtype)
    codes = codes.astype(jnp.int32)
    C = jnp.cumsum(blc32, axis=-1)
    zero = jnp.zeros((G, P, 1), dtype)
    Csh = jnp.concatenate([zero, C[..., :-1]], axis=-1)
    oh = (jnp.arange(L)[None, None, :] == last_col[..., None]).astype(dtype)

    # pack (char, homopolymer index) into one int32 stream; the homopolymer
    # index is recovered from the m2i value against the 16-entry LUT (rows
    # whose transitions are unused carry 0.0 and map to LUT slot 0)
    lut_m2m = jnp.asarray(LOG_MATCH_TO_MATCH, dtype)
    lut_m2i = jnp.asarray(LOG_MATCH_TO_INS, dtype)
    lut_m2d = jnp.asarray(LOG_MATCH_TO_DEL, dtype)
    hp = jnp.argmin(jnp.abs(meta.row_m2i.astype(dtype)[..., None] - lut_m2i),
                    axis=-1).astype(jnp.int32)                 # [G,H,R]
    meta_packed = meta.row_char.astype(jnp.int32) + 16 * hp

    lpmf_h = jnp.take_along_axis(
        meta.lpmf.astype(dtype),
        meta.hap_opt[:, :, None].astype(jnp.int32), axis=1)    # [G,H,nD]
    shift_h = (jnp.take_along_axis(
        meta.rep_len.astype(jnp.int32), meta.hap_opt.astype(jnp.int32),
        axis=1) + D_min[:, None])                              # [G,H]

    # runtime loop bounds from the active-row mask: phase-1 padding sits at
    # rows 1..start1-1, phase-3 padding at rows end3..R-1
    idx = jnp.arange(R)[None, :]
    act = meta.row_active.astype(bool)                         # [G,R]
    mask1 = act & (idx >= 1) & (idx < sr)
    start1 = jnp.minimum(jnp.min(jnp.where(mask1, idx, R), axis=1), sr)
    mask3 = act & (idx >= sr + 2)
    end3 = jnp.maximum(jnp.max(jnp.where(mask3, idx + 1, 0), axis=1), sr + 2)
    bounds = jnp.stack([start1, end3, h_real, periods],
                       axis=1).astype(jnp.int32)                 # [G,4]

    opt_tab = meta.hap_opt.astype(jnp.int32)                   # [G,H]
    shift_h = shift_h.astype(jnp.int32)
    lpmf_h = lpmf_h.astype(dtype)
    # 1-D VMEM refs are 1024-tiled: every per-(locus, hap) stream occupies
    # one STRIDE-sized chunk so DMA offsets/lengths stay 1024-aligned
    assert R <= STRIDE and nD <= STRIDE
    meta_packed = jnp.pad(meta_packed,
                          ((0, 0), (0, 0), (0, STRIDE - R))).reshape(-1)
    lpmf_h = jnp.pad(lpmf_h, ((0, 0), (0, 0), (0, STRIDE - nD))).reshape(-1)

    kernel = functools.partial(_seg_kernel, R=R, sr=sr,
                               nD=nD, dtype=dtype, H=H)
    pool_spec = pl.BlockSpec((1, P, L), lambda g, h, o, sh, b: (g, 0, 0),
                             memory_space=pltpu.VMEM)
    smem_full = pl.BlockSpec(memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G, H),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # meta_packed [G,H,R]
            pl.BlockSpec(memory_space=pl.ANY),      # lpmf_h [G,H,nD]
            pool_spec, pool_spec, pool_spec, pool_spec, pool_spec, pool_spec,
            smem_full, smem_full, smem_full,   # transition LUTs [16]
            pl.BlockSpec((1, 1, nD, P, L),
                         lambda g, h, o, sh, b: (g, o[g, h], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, R, P),
                               lambda g, h, o, sh, b: (g, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((P, L), dtype)] * 3
        + [pltpu.SMEM((STRIDE,), jnp.int32), pltpu.SMEM((STRIDE,), dtype),
           pltpu.SemaphoreType.DMA],
    )
    Mcol = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, H, R, P), dtype),
        interpret=interpret,
    )(opt_tab, shift_h, bounds, meta_packed, lpmf_h,
      codes, blw32, blc32, C, Csh, oh,
      lut_m2m, lut_m2i, lut_m2d,
      E.astype(dtype))

    seg_logsum = jnp.take_along_axis(C, last_col[..., None], axis=-1)[..., 0]
    return jnp.transpose(Mcol, (0, 2, 3, 1)), seg_logsum


def emissions_batched(codes, quals, rep_rev_codes, rep_len, period,
                      dtype=jnp.float32, use_kernel=None, interpret=False,
                      periods=None):
    """E [G, O, nD, P, L] stutter-block emissions for a batch of loci.

    Pass `periods` [G] int32 for a mixed-period batch (Mosaic kernel path
    only; the XLA fallback keeps a static period and is compiled per
    period by its callers)."""
    import os
    blw, blc = expand_quals(quals, dtype)
    codes = codes.astype(jnp.int32)
    rep_rev_codes = rep_rev_codes.astype(jnp.int32)
    if use_kernel is None:
        flag = os.environ.get("HIPSTR_TPU_E_KERNEL", "auto")
        if flag == "auto":
            # v1 (column-sequential): measured faster AND hardware-exact;
            # a slab-parallel rewrite (pallas_emission2) mis-lowered under
            # Mosaic and was removed in round 3 (docs/DESIGN.md)
            use_kernel = "1" if jax.default_backend() != "cpu" else "0"
        else:
            use_kernel = flag
    elif use_kernel is True:
        use_kernel = "1"
    elif use_kernel is False:
        use_kernel = "0"
    if use_kernel == "1":
        from .pallas_emission import stutter_emissions_pallas
        return stutter_emissions_pallas(codes, blw, blc, rep_rev_codes,
                                        rep_len.astype(jnp.int32), period,
                                        dtype=dtype, interpret=interpret,
                                        periods=periods)

    def per_locus(codes_l, w_l, c_l, rev_l, len_l):
        def per_opt(rev_o, len_o):
            def per_pool(cp, wp, ccp):
                return stutter_emissions_tpu(jnp, cp, wp, ccp, rev_o, len_o,
                                             period=period, max_units=6)
            return jax.vmap(per_pool)(codes_l, w_l, c_l)       # [P, nD, L]
        return jax.vmap(per_opt)(rev_l, len_l)                 # [O, P, nD, L]

    E = jax.vmap(per_locus)(codes, blw, blc,
                            rep_rev_codes, rep_len)            # [G,O,P,nD,L]
    return jnp.swapaxes(E, 2, 3)                               # [G,O,nD,P,L]


def seed_combine(Mcol_fw, Mcol_rev, l_prob, r_prob, seed,
                 seed_codes, seed_blw, seed_blc, dtype=jnp.float32):
    """Seed-anchor marginalization for one locus (same math as the tail of
    ops/hmm.hmm_forward; reference HapAligner.cpp:163-231)."""
    seed_blc = seed_blc.astype(dtype)
    seed_blw = seed_blw.astype(dtype)
    seed_codes = seed_codes.astype(jnp.int32)
    prior = jnp.asarray(seed.log_num_seeds).astype(dtype)

    eq = seed_codes[:, None, None] == seed.seed_char[None, :, :]
    sc_seed = jnp.where(eq, seed_blc[:, None, None], seed_blw[:, None, None])
    Ml = jnp.moveaxis(Mcol_fw[seed.seed_fw_row], 0, -1)    # [P, H, S]
    Mr = jnp.moveaxis(Mcol_rev[seed.seed_rev_row], 0, -1)  # [P, H, S]
    vals = prior + sc_seed + Ml + Mr
    vals = jnp.where(seed.seed_valid[None, None, :], vals, NEG)

    eqA = seed_codes[:, None] == seed.first_char[None, :]
    scA = jnp.where(eqA, seed_blc[:, None], seed_blw[:, None])
    cfgA = prior + scA + l_prob[:, None] + jnp.take(Mcol_rev,
                                                   seed.cfg_rev_row, axis=0)
    eqB = seed_codes[:, None] == seed.last_char[None, :]
    scB = jnp.where(eqB, seed_blc[:, None], seed_blw[:, None])
    cfgB = prior + scB + r_prob[:, None] + jnp.take(Mcol_fw,
                                                   seed.cfg_fw_row, axis=0)

    allv = jnp.concatenate([vals, cfgA[:, :, None], cfgB[:, :, None]],
                           axis=-1)
    m = jnp.max(allv, axis=-1)
    return m + jnp.log(jnp.sum(jnp.exp(allv - m[..., None]), axis=-1))


def batched_forward_v2(l_seg, r_seg, fw_meta, rev_meta, seed,
                       seed_codes, seed_quals,
                       R_fw, R_rev, period, sr_fw, sr_rev,
                       dtype=jnp.float32, interpret=False,
                       h_real=None, periods=None):
    """Batched full forward pass: [G, P, H] log-likelihoods.

    Drop-in batched replacement for vmap(hmm_forward): same stacked pytree
    inputs the executor already builds, same output.  With `periods` [G]
    the batch may mix repeat periods (one compiled kernel); with `h_real`
    [G] bucket-padding haplotype columns skip compute and return NEG
    garbage — callers slice to their real column count.
    """
    # in interpret mode run the Mosaic emission kernel interpreted too, so
    # CPU tests cover the runtime-period path end to end
    ek = "1" if interpret else None
    E_fw = emissions_batched(l_seg.codes, l_seg.quals,
                             fw_meta.rep_rev_codes, fw_meta.rep_len,
                             period, dtype, use_kernel=ek,
                             interpret=interpret, periods=periods)
    E_rev = emissions_batched(r_seg.codes, r_seg.quals,
                              rev_meta.rep_rev_codes, rev_meta.rep_len,
                              period, dtype, use_kernel=ek,
                              interpret=interpret, periods=periods)
    Mcol_fw, l_prob = segment_forward_v2(
        l_seg.codes, l_seg.quals, l_seg.last_col, fw_meta, E_fw,
        R_fw, sr_fw, period, dtype, interpret, h_real, periods)
    Mcol_rev, r_prob = segment_forward_v2(
        r_seg.codes, r_seg.quals, r_seg.last_col, rev_meta, E_rev,
        R_rev, sr_rev, period, dtype, interpret, h_real, periods)
    seed_blw, seed_blc = expand_quals(seed_quals, dtype)

    def tail(mf, mr, lp, rp, sd, sc, sw, sb):
        return seed_combine(mf, mr, lp, rp, sd, sc, sw, sb, dtype)

    return jax.vmap(tail)(Mcol_fw, Mcol_rev, l_prob, r_prob, seed,
                          seed_codes, seed_blw, seed_blc)
