"""Device-batched PCR-stutter EM: many loci per dispatch.

The per-locus host EM (ops/em.py) re-implements EMStutterGenotyper
(reference: src/em_stutter_genotyper.cpp:170-226) in numpy; in default mode
it runs for *every* locus inside the hot prepare path.  This module batches
the whole train loop across a wave of loci as one jitted
`lax.while_loop`: every iteration runs the E-step (stutter-PMF alignment
probs -> genotype posteriors) and M-step (allele frequencies + the six
stutter parameters from expected artifact counts, with the reference's
pseudocounts, em_stutter_genotyper.cpp:63-127) for ALL loci in dense
[G, R, A] tensors, and a per-locus `active` mask freezes loci that have
converged (LL-dip, LL-delta, or parameter-delta rules identical to the
reference train loop).

Padding contract: padded reads carry weight 0 and sample_index pointing at
a real slot (they add zeros); padded alleles carry NEG priors and NEG
alignment probs (they underflow out of every logsumexp); padded samples
have no reads and are masked out of the total-LL / prior reductions.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

NEG = -1.0e30
TOLERANCE = 1e-10
PSEUDO_GEOM = math.log(1.1)   # the reference's geometric-denominator seed


# --------------------------------------------------------------------------
# host-side problem packing
# --------------------------------------------------------------------------

@dataclass
class EMProblem:
    """One locus's EM inputs (host lists -> dense arrays)."""
    haploid: bool
    period: int
    bps: np.ndarray            # [A] int, bps[0] = ref allele (0)
    allele_index: np.ndarray   # [R] int
    sample_index: np.ndarray   # [R] int
    log_p1: np.ndarray         # [R]
    log_p2: np.ndarray         # [R]
    num_samples: int
    reads_per_sample: np.ndarray  # [S]

    @classmethod
    def build(cls, haploid: bool, period: int, num_bps: List[List[int]],
              log_p1: List[List[float]], log_p2: List[List[float]],
              ref_allele: int = 0) -> "EMProblem":
        sizes = sorted({b for per_sample in num_bps for b in per_sample
                        if b != ref_allele})
        bps = [ref_allele] + sizes
        index = {b: i for i, b in enumerate(bps)}
        ai, p1, p2, si, rps = [], [], [], [], []
        for s, per_sample in enumerate(num_bps):
            rps.append(len(per_sample))
            for j, b in enumerate(per_sample):
                ai.append(index[b])
                p1.append(log_p1[s][j])
                p2.append(log_p2[s][j])
                si.append(s)
        return cls(haploid, period, np.asarray(bps, np.int32),
                   np.asarray(ai, np.int32), np.asarray(si, np.int32),
                   np.asarray(p1, np.float64), np.asarray(p2, np.float64),
                   len(num_bps), np.asarray(rps, np.float64))


def _bucket(n: int, buckets=(8, 16, 32, 64, 128, 256, 512, 1024,
                             2048, 4096, 10240)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def pack_problems(problems: List[EMProblem], pad_g: Optional[int] = None):
    """Stack problems into padded arrays; returns (arrays dict, (Rm, Am, Sm)).

    pad_g: pad the locus axis to this extent by repeating the first problem
    (one-shape dispatch policy — a fresh TPU compile costs far more than
    training a few duplicate loci)."""
    if pad_g is not None and len(problems) < pad_g:
        problems = problems + [problems[0]] * (pad_g - len(problems))
    G = len(problems)
    Rm = _bucket(max(p.allele_index.size for p in problems))
    Am = _bucket(max(p.bps.size for p in problems), (2, 4, 8, 16, 32, 64,
                                                     128, 256))
    Sm = _bucket(max(p.num_samples for p in problems), (1, 2, 4, 8, 16, 32,
                                                        64, 128, 256, 512))
    d = dict(
        bps=np.zeros((G, Am), np.int32),
        allele_mask=np.zeros((G, Am), bool),
        allele_index=np.zeros((G, Rm), np.int32),
        sample_index=np.zeros((G, Rm), np.int32),
        read_mask=np.zeros((G, Rm), bool),
        log_p1=np.zeros((G, Rm), np.float64),
        log_p2=np.zeros((G, Rm), np.float64),
        sample_mask=np.zeros((G, Sm), bool),
        inv_rps=np.zeros((G, Sm), np.float64),   # 1 / reads-per-sample
        period=np.zeros((G,), np.int32),
        haploid=np.zeros((G,), bool),
    )
    for g, p in enumerate(problems):
        A, R, S = p.bps.size, p.allele_index.size, p.num_samples
        d["bps"][g, :A] = p.bps
        d["allele_mask"][g, :A] = True
        d["allele_index"][g, :R] = p.allele_index
        d["sample_index"][g, :R] = p.sample_index
        d["read_mask"][g, :R] = True
        d["log_p1"][g, :R] = p.log_p1
        d["log_p2"][g, :R] = p.log_p2
        d["sample_mask"][g, :S] = True
        with np.errstate(divide="ignore"):
            d["inv_rps"][g, :S] = np.where(p.reads_per_sample > 0,
                                           1.0 / np.maximum(
                                               p.reads_per_sample, 1), 0.0)
        d["period"][g] = p.period
        d["haploid"][g] = p.haploid
    return d, (Rm, Am, Sm)


# --------------------------------------------------------------------------
# device kernel
# --------------------------------------------------------------------------

def _masked_lse(xp, x, mask, axis):
    x = xp.where(mask, x, NEG)
    m = xp.max(x, axis=axis, keepdims=True)
    m = xp.where(m > NEG / 2, m, 0.0)
    out = xp.squeeze(m, axis=axis) + xp.log(
        xp.sum(xp.exp(x - m), axis=axis))
    return xp.where(xp.any(mask, axis=axis), out, NEG)


def _log_pmf(jnp, diff, params, period):
    """Vectorized stutter log-PMF (reference: src/stutter_model.cpp:29-53).

    diff [...]: read_bp - allele_bp; params: dict of [G]-shaped logs;
    period [G] broadcastable to diff.
    """
    in_frame = diff % period == 0
    tdiv = jnp.trunc(diff / period).astype(diff.dtype)
    eff = diff - tdiv
    out_pmf = jnp.where(
        eff < 0,
        params["l_out_down"] + params["l_out_geom"]
        + params["l1m_out_geom"] * (-eff - 1),
        params["l_out_up"] + params["l_out_geom"]
        + params["l1m_out_geom"] * (eff - 1))
    rep = diff // period
    in_pmf = jnp.where(
        rep == 0,
        params["l_equal"],
        jnp.where(rep < 0,
                  params["l_in_down"] + params["l_in_geom"]
                  + params["l1m_in_geom"] * (-rep - 1),
                  params["l_in_up"] + params["l_in_geom"]
                  + params["l1m_in_geom"] * (rep - 1)))
    return jnp.where(in_frame, in_pmf, out_pmf)


def _param_logs(jnp, params):
    """params [G, 6] = (in_geom, in_up, in_down, out_geom, out_up, out_down)
    -> broadcastable log terms [G, 1, 1]."""
    pg = params[:, 0][:, None, None]
    pu = params[:, 1][:, None, None]
    pd = params[:, 2][:, None, None]
    og = params[:, 3][:, None, None]
    ou = params[:, 4][:, None, None]
    od = params[:, 5][:, None, None]
    return dict(
        l_in_geom=jnp.log(pg), l1m_in_geom=jnp.log1p(-pg),
        l_in_up=jnp.log(pu), l_in_down=jnp.log(pd),
        l_out_geom=jnp.log(og), l1m_out_geom=jnp.log1p(-og),
        l_out_up=jnp.log(ou), l_out_down=jnp.log(od),
        l_equal=jnp.log1p(-(pu + pd + ou + od)))


@functools.partial(__import__("jax").jit, static_argnames=(
    "Sm", "max_iter", "dtype_name"))
def em_train_batch(arrays, Sm: int, max_iter: int = 100,
                   min_LL_abs_change: float = 0.01,
                   min_LL_frac_change: float = 0.001,
                   dtype_name: str = "float32"):
    """Batched EM train loop; returns dict with params [G, 6],
    converged [G], iters [G], total_LL [G], log_gt_priors [G, Am].

    Math identical to ops/em.EMStutterGenotyper.train (reference:
    src/em_stutter_genotyper.cpp:170-226) per locus, with per-locus
    convergence freezing.
    """
    import jax
    import jax.numpy as jnp

    dtype = jnp.dtype(dtype_name)
    LOG_ONE_HALF = math.log(0.5)
    MAX_PARAM_DIFF = 1e-4

    bps = arrays["bps"].astype(jnp.int32)
    allele_mask = arrays["allele_mask"]
    allele_index = arrays["allele_index"].astype(jnp.int32)
    sample_index = arrays["sample_index"].astype(jnp.int32)
    read_mask = arrays["read_mask"]
    log_p1 = arrays["log_p1"].astype(dtype)
    log_p2 = arrays["log_p2"].astype(dtype)
    sample_mask = arrays["sample_mask"]
    inv_rps = arrays["inv_rps"].astype(dtype)
    period = arrays["period"].astype(jnp.int32)
    haploid = arrays["haploid"]

    G, Am = bps.shape
    Rm = allele_index.shape[1]
    read_bp = jnp.take_along_axis(bps, allele_index, axis=1)     # [G, R]
    diff_ra = (read_bp[:, :, None] - bps[:, None, :]).astype(dtype)  # [G,R,A]
    per = period[:, None, None].astype(dtype)
    pair_mask = read_mask[:, :, None] & allele_mask[:, None, :]  # [G, R, A]

    # ---- init priors: pseudocount 1 + sum_r 1/reads_per_sample ----------
    w_read = jnp.take_along_axis(inv_rps, sample_index, axis=1)  # [G, R]
    w_read = jnp.where(read_mask, w_read, 0.0)
    counts = jnp.ones((G, Am), dtype) + jax.vmap(
        lambda ai, w: jax.ops.segment_sum(w, ai, num_segments=Am))(
            allele_index, w_read)
    counts = jnp.where(allele_mask, counts, 0.0)
    n_all = jnp.sum(counts, axis=1, keepdims=True)
    log_gt_priors0 = jnp.where(allele_mask, jnp.log(counts) - jnp.log(n_all),
                               NEG)

    params0 = jnp.tile(jnp.asarray([[0.9, 0.1, 0.1, 0.8, 0.01, 0.01]],
                                   dtype), (G, 1))

    def e_step(params, log_gt_priors):
        pl = _param_logs(jnp, params)
        aln = _log_pmf(jnp, diff_ra, pl, per)                   # [G, R, A]
        aln = jnp.where(pair_mask, aln, NEG)
        # genotype priors from allele freqs (em_stutter_genotyper.cpp:129-144)
        pri = log_gt_priors[:, :, None] + log_gt_priors[:, None, :]
        diag = jnp.eye(Am, dtype=bool)[None]
        pri = jnp.where(haploid[:, None, None],
                        jnp.where(diag, log_gt_priors[:, :, None], NEG), pri)
        # per-read genotype contributions
        t1 = LOG_ONE_HALF + log_p1[:, :, None] + aln            # [G, R, A]
        t2 = LOG_ONE_HALF + log_p2[:, :, None] + aln
        a = t1[:, :, :, None]
        b = t2[:, :, None, :]
        mx = jnp.maximum(a, b)
        lse = mx + jnp.log1p(jnp.exp(jnp.minimum(a, b) - mx))   # [G,R,A,A]
        contrib = jnp.where(read_mask[:, :, None, None], lse, 0.0)
        sums = jax.vmap(lambda c, si: jax.ops.segment_sum(
            c, si, num_segments=Sm))(contrib, sample_index)     # [G,S,A,A]
        unnorm = pri[:, None] + sums
        gmask = allele_mask[:, :, None] & allele_mask[:, None, :]
        unnorm = jnp.where(gmask[:, None], unnorm, NEG)
        flat = unnorm.reshape(G, Sm, Am * Am)
        m = jnp.max(flat, axis=2)
        totals = m + jnp.log(jnp.sum(jnp.exp(flat - m[:, :, None]), axis=2))
        log_post = unnorm - totals[:, :, None, None]
        totals = jnp.where(sample_mask, totals, 0.0)
        return aln, t1, t2, log_post, jnp.sum(totals, axis=1)

    def m_step(aln, t1, t2, log_post):
        # new allele freqs
        post_m = jnp.where(sample_mask[:, :, None, None], log_post, NEG)
        first = _masked_lse(jnp, post_m, jnp.ones_like(post_m, bool), 3)
        first = _masked_lse(jnp, first, jnp.ones_like(first, bool), 1)
        second = _masked_lse(jnp, post_m, jnp.ones_like(post_m, bool), 2)
        second = _masked_lse(jnp, second, jnp.ones_like(second, bool), 1)
        cnt = jnp.logaddexp(first, second)                       # [G, A]
        cnt = jnp.where(allele_mask, cnt, NEG)
        tot = _masked_lse(jnp, cnt, allele_mask, 1)
        new_priors = jnp.where(allele_mask, cnt - tot[:, None], NEG)

        # per-read phase posteriors folded into genotype weights:
        # W0[r, a] = lse_b post[s_r, a, b] + ph1[r, a, b]
        tot_ph = jnp.logaddexp(t1[:, :, :, None], t2[:, :, None, :])
        ph1 = t1[:, :, :, None] - tot_ph                         # [G,R,A,A]
        ph2 = t2[:, :, None, :] - tot_ph
        post_r = jnp.take_along_axis(
            log_post, sample_index[:, :, None, None], axis=1)    # [G,R,A,A]
        m0 = pair_mask[:, :, :, None] & allele_mask[:, None, None, :]
        W0 = _masked_lse(jnp, post_r + ph1, m0, 3)               # [G, R, A]
        W1 = _masked_lse(jnp, post_r + ph2,
                         jnp.swapaxes(m0, 2, 3), 2)              # [G, R, A]

        in_frame = diff_ra % per == 0
        tdiv = jnp.trunc(diff_ra / per)
        eff_out = diff_ra - tdiv
        eff_in = jnp.floor(diff_ra / per)
        log_abs_out = jnp.log(jnp.maximum(jnp.abs(eff_out), 1.0))
        log_abs_in = jnp.log(jnp.maximum(jnp.abs(eff_in), 1.0))

        def cat(mask, extra=None):
            """logsumexp of W0, W1 (+extra) over the category mask."""
            mask = mask & pair_mask
            v0 = W0 if extra is None else W0 + extra
            v1 = W1 if extra is None else W1 + extra
            both = jnp.stack([jnp.where(mask, v0, NEG),
                              jnp.where(mask, v1, NEG)], 1)     # [G,2,R,A]
            return _masked_lse(jnp, both.reshape(G, -1),
                               jnp.ones((G, 2 * Rm * Am), bool), 1)

        zero = jnp.zeros((G,), dtype)
        in_eq = jnp.logaddexp(zero, cat(in_frame & (diff_ra == 0)))
        in_up = jnp.logaddexp(zero, cat(in_frame & (diff_ra > 0)))
        in_down = jnp.logaddexp(zero, cat(in_frame & (diff_ra < 0)))
        in_diffs = jnp.logaddexp(
            jnp.logaddexp(zero, jnp.full((G,), PSEUDO_GEOM, dtype)),
            cat(in_frame & (diff_ra != 0), log_abs_in))
        out_up = jnp.logaddexp(zero, cat(~in_frame & (diff_ra > 0)))
        out_down = jnp.logaddexp(zero, cat(~in_frame & (diff_ra < 0)))
        out_diffs = jnp.logaddexp(
            jnp.logaddexp(zero, jnp.full((G,), PSEUDO_GEOM, dtype)),
            cat(~in_frame, log_abs_out))

        out_tot = jnp.logaddexp(out_up, out_down)
        in_pgeom = jnp.minimum(
            0.999, jnp.exp(jnp.logaddexp(in_up, in_down) - in_diffs))
        out_pgeom = jnp.minimum(0.999, jnp.exp(out_tot - out_diffs))
        log_total = jnp.logaddexp(
            jnp.logaddexp(jnp.logaddexp(in_up, in_down), in_eq), out_tot)
        new_params = jnp.stack(
            [in_pgeom,
             jnp.exp(in_up - log_total), jnp.exp(in_down - log_total),
             out_pgeom,
             jnp.exp(out_up - log_total), jnp.exp(out_down - log_total)],
            axis=1)
        return new_priors, new_params

    def cond(state):
        it, active, *_ = state
        return jnp.logical_and(it <= max_iter, jnp.any(active))

    def body(state):
        (it, active, LL, params, priors, converged, iters) = state
        aln, t1, t2, log_post, new_LL = e_step(params, priors)

        # rule 1 (em_stutter_genotyper.cpp:195-199): LL dipped -> converged,
        # keep the PREVIOUS params
        dip = new_LL < LL + TOLERANCE
        conv1 = active & dip

        new_priors, new_params = m_step(aln, t1, t2, log_post)

        abs_change = new_LL - LL
        frac_change = -(new_LL - LL) / LL
        small = (abs_change < min_LL_abs_change) & \
                (frac_change < min_LL_frac_change)
        p_same = jnp.all(jnp.abs(new_params - params) < MAX_PARAM_DIFF,
                         axis=1)
        conv2 = active & ~dip & (small | p_same)

        upd = active & ~dip
        params = jnp.where(upd[:, None], new_params, params)
        priors = jnp.where(upd[:, None], new_priors, priors)
        LL = jnp.where(upd, new_LL, LL)
        # a dipped locus reports the DIPPED LL (host parity: _result(new_LL))
        LL = jnp.where(conv1, new_LL, LL)
        iters = jnp.where(active, it, iters)
        converged = converged | conv1 | conv2
        active = active & ~(conv1 | conv2)
        return (it + 1, active, LL, params, priors, converged, iters)

    state0 = (jnp.ones((), jnp.int32), jnp.ones((G,), bool),
              jnp.full((G,), -1.0e37, dtype), params0, log_gt_priors0,
              jnp.zeros((G,), bool), jnp.zeros((G,), jnp.int32))
    (_, _, LL, params, priors, converged, iters) = \
        __import__("jax").lax.while_loop(cond, body, state0)
    return dict(params=params, converged=converged, iters=iters,
                total_LL=LL, log_gt_priors=priors)
