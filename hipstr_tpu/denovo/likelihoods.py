"""Dense de novo mutation likelihood kernels (log10 space).

Capability parity with the reference scanners' likelihood sums (reference:
src/denovos/denovo_scanner.cpp:155-273 for the phased family scan,
src/denovos/trio_denovo_scanner.cpp for the unphased trio scan,
src/denovos/mutation_model.h, src/denovos/denovo_allele_priors.{h,cpp}).

Re-design: the reference prunes negligible configurations while streaming
over nested loops; here each scenario is a dense tensor contraction over the
[A^4 (x A mutation)] genotype grid — exact (no pruning) and batchable on
device.  All functions take an `xp` namespace (numpy or jax.numpy).
"""

from __future__ import annotations

import functools
import math
from typing import List, Sequence, Tuple

import numpy as np

NEG = -1.0e30


def _lse10(xp, x, axis=None):
    m = xp.max(x, axis=axis, keepdims=True)
    m = xp.where(xp.isfinite(m), m, 0.0)
    out = m + xp.log10(xp.sum(xp.power(10.0, x - m), axis=axis, keepdims=True))
    if axis is None:
        return xp.squeeze(out)
    return xp.squeeze(out, axis=axis)


def _lse_ref(xp, x, axis=None):
    """Reference-parity aggregation: the reference's streaming accumulator
    (src/mathops.cpp:72-84, update/finish_streaming_log_sum_exp) applies
    NATURAL exp/log to the log10-space scenario terms, so the 'log10'
    values it reports are really max + ln(sum(e^(x - max))).  Replicated
    here verbatim so golden comparisons against the DenovoFinder binary
    match; pass exact_lse=True to the kernels for true log10 semantics."""
    m = xp.max(x, axis=axis, keepdims=True)
    m = xp.where(xp.isfinite(m), m, 0.0)
    out = m + xp.log(xp.sum(xp.exp(x - m), axis=axis, keepdims=True))
    if axis is None:
        return xp.squeeze(out)
    return xp.squeeze(out, axis=axis)


def uniform_log10_freqs(num_alleles: int) -> np.ndarray:
    return np.full(num_alleles, -math.log10(num_alleles))


def population_log10_freqs(num_alleles: int, founder_genotypes) -> np.ndarray:
    """Pseudocount-1 founder allele frequencies (reference:
    denovo_allele_priors.cpp:7-34).  founder_genotypes: iterable of
    (gt_a, gt_b) for non-missing founders."""
    counts = np.ones(num_alleles)
    total = float(num_alleles)
    for a, b in founder_genotypes:
        counts[a] += 1
        counts[b] += 1
        total += 2
    return np.log10(counts / total)


def expand_phased_gls(gl: Sequence[float], num_alleles: int) -> np.ndarray:
    """PHASEDGL vector (index a*A+b) -> [A, A] matrix."""
    return np.asarray(gl, dtype=np.float64).reshape(num_alleles, num_alleles)


def expand_unphased_gls(gl: Sequence[float], num_alleles: int) -> np.ndarray:
    """GL vector (VCF diploid order) -> symmetric [A, A] matrix."""
    out = np.empty((num_alleles, num_alleles))
    for i in range(num_alleles):
        for j in range(i + 1):
            v = gl[i * (i + 1) // 2 + j]
            out[i, j] = v
            out[j, i] = v
    return out


def _child_tensor(xp, glc, mat_idx: int, pat_idx: int, A: int):
    """GL_child over the [mat_i, mat_j, pat_i, pat_j] grid given the child's
    inheritance pattern, plus the (ci_axis, cj_axis) it was built from.

    mat_idx/pat_idx use the reference encoding 0..3 = 1+1, 1+2, 2+1, 2+2
    (child hap + parent hap).
    """
    # maternal: idx 0 -> ci = mat_i (axis 0); 1 -> ci = mat_j (axis 1);
    #           2 -> cj = mat_i; 3 -> cj = mat_j
    if mat_idx in (0, 1):
        ci_axis = 0 if mat_idx == 0 else 1
        assert pat_idx in (2, 3)
        cj_axis = 2 if pat_idx == 2 else 3
    else:
        cj_axis = 0 if mat_idx == 2 else 1
        assert pat_idx in (0, 1)
        ci_axis = 2 if pat_idx == 0 else 3
    # build GLC[ci, cj] broadcast onto the 4D grid
    shape_ci = [1, 1, 1, 1]
    shape_ci[ci_axis] = A
    shape_cj = [1, 1, 1, 1]
    shape_cj[cj_axis] = A
    idx_ci = xp.reshape(xp.arange(A), shape_ci)
    idx_cj = xp.reshape(xp.arange(A), shape_cj)
    return glc[idx_ci, idx_cj], ci_axis, cj_axis


def phased_family_lls(xp, gl_mother, gl_father, gl_children,
                      maternal_indices: List[int], paternal_indices: List[int],
                      log10_freqs, log10_mut_prior: float,
                      exact_lse: bool = False):
    """Returns (ll_no_mutation, ll_one_denovo[C], ll_one_other[C]).

    gl_* are [A, A] phased-GL matrices; children's transmission patterns come
    from SNP-haplotype inheritance (reference: denovo_scanner.cpp:155-273).
    By default the final reductions use the reference's hybrid natural-log
    aggregation (see _lse_ref); exact_lse=True gives true log10 LSE.
    """
    _lse = _lse10 if exact_lse else _lse_ref
    A = gl_mother.shape[0]
    f = xp.asarray(log10_freqs)
    M = f[:, None] + f[None, :] + gl_mother           # [A, A]
    P = f[:, None] + f[None, :] + gl_father
    base = M[:, :, None, None] + P[None, None, :, :]  # [A,A,A,A]

    child_t = []
    for c in range(len(maternal_indices)):
        t, ci_axis, cj_axis = _child_tensor(xp, gl_children[c],
                                            maternal_indices[c],
                                            paternal_indices[c], A)
        child_t.append((t, ci_axis, cj_axis))

    nomut = base
    for t, _, _ in child_t:
        nomut = nomut + t
    ll_no_mutation = _lse(xp, nomut)

    iota = xp.arange(A)
    grid = [xp.reshape(iota, [A if d == i else 1 for i in range(4)])
            for d in range(4)]
    # denovo mask over [A,A,A,A,m]: m differs from all four genotype alleles
    m_ax = xp.reshape(iota, (1, 1, 1, 1, A))
    denovo_mask = ((m_ax != grid[0][..., None]) & (m_ax != grid[1][..., None])
                   & (m_ax != grid[2][..., None]) & (m_ax != grid[3][..., None]))

    ll_denovo, ll_other = [], []
    for t, ci_axis, cj_axis in child_t:
        config = nomut - t  # base + other children
        glc = gl_children[len(ll_denovo)]
        ci_val = grid[ci_axis]
        cj_val = grid[cj_axis]

        # mutate haplotype 1 (ci -> m): GLC[m, cj]
        shape_cj = [1, 1, 1, 1]
        shape_cj[cj_axis] = A
        idx_cj = xp.reshape(iota, shape_cj)
        t1 = (config[..., None] + glc[m_ax, idx_cj[..., None]]
              + log10_mut_prior)
        t1 = xp.where(m_ax == ci_val[..., None], NEG, t1)

        # mutate haplotype 2 (cj -> m): GLC[ci, m]
        shape_ci = [1, 1, 1, 1]
        shape_ci[ci_axis] = A
        idx_ci = xp.reshape(iota, shape_ci)
        t2 = (config[..., None] + glc[idx_ci[..., None], m_ax]
              + log10_mut_prior)
        t2 = xp.where(m_ax == cj_val[..., None], NEG, t2)

        both = xp.stack([t1, t2])
        dmask = xp.stack([denovo_mask, denovo_mask])
        ll_denovo.append(_lse(xp, xp.where(dmask, both, NEG)))
        ll_other.append(_lse(xp, xp.where(dmask, NEG, both)))
    return ll_no_mutation, xp.stack(ll_denovo), xp.stack(ll_other)


def trio_unphased_lls(xp, gl_mother, gl_father, gl_child, log10_freqs,
                      log10_mut_prior: float, exact_lse: bool = False):
    """Returns (ll_no_mutation, ll_one_denovo, ll_one_other) for one trio
    with unphased [A, A] symmetric GL matrices (reference:
    trio_denovo_scanner.cpp:81-180).  Final reductions default to the
    reference's hybrid natural-log aggregation (see _lse_ref)."""
    _lse = _lse10 if exact_lse else _lse_ref
    A = gl_mother.shape[0]
    f = xp.asarray(log10_freqs)
    LOG2 = math.log10(2.0)
    LOG_ONE_FOURTH = -math.log10(4.0)

    iota = xp.arange(A)
    het = iota[:, None] != iota[None, :]
    pri = f[:, None] + f[None, :] + xp.where(het, LOG2, 0.0)
    # only genotypes with j <= i are enumerated
    lower = iota[:, None] >= iota[None, :]
    M = xp.where(lower, pri + gl_mother, NEG)
    P = xp.where(lower, pri + gl_father, NEG)
    config = (M[:, :, None, None] + P[None, None, :, :]
              + LOG_ONE_FOURTH)  # [mat_i, mat_j, pat_i, pat_j]

    grid = [xp.reshape(iota, [A if d == i else 1 for i in range(4)])
            for d in range(4)]
    m_ax = xp.reshape(iota, (1, 1, 1, 1, A))
    denovo_mask = ((m_ax != grid[0][..., None]) & (m_ax != grid[1][..., None])
                   & (m_ax != grid[2][..., None]) & (m_ax != grid[3][..., None]))

    nomut_parts = []
    den_parts, oth_parts = [], []
    for mat_axis in (0, 1):
        for pat_axis in (2, 3):
            sh_m = [1, 1, 1, 1]
            sh_m[mat_axis] = A
            sh_p = [1, 1, 1, 1]
            sh_p[pat_axis] = A
            ia = xp.reshape(iota, sh_m)
            ib = xp.reshape(iota, sh_p)
            nomut_parts.append(config + gl_child[ia, ib])

            # maternal-allele mutations: GLC[m, pat_allele]
            t1 = (config[..., None] + gl_child[m_ax, ib[..., None]]
                  + log10_mut_prior)
            t1 = xp.where(m_ax == grid[mat_axis][..., None], NEG, t1)
            # paternal-allele mutations: GLC[mat_allele, m]
            t2 = (config[..., None] + gl_child[ia[..., None], m_ax]
                  + log10_mut_prior)
            t2 = xp.where(m_ax == grid[pat_axis][..., None], NEG, t2)
            for t in (t1, t2):
                den_parts.append(xp.where(denovo_mask, t, NEG))
                oth_parts.append(xp.where(denovo_mask, NEG, t))

    ll_nomut = _lse(xp, xp.stack(nomut_parts))
    ll_denovo = _lse(xp, xp.stack(den_parts))
    ll_other = _lse(xp, xp.stack(oth_parts))
    return ll_nomut, ll_denovo, ll_other


# --------------------------------------------------------------------------
# device batching: jit(vmap) over padded job stacks
#
# The A^4 (phased-family) and A^4 x A (mutation-marginal) contractions above
# are pure tensor algebra in the `xp` namespace, so the device path is the
# same code traced with jax.numpy and vmapped over many (record, family)
# jobs per dispatch (reference hot loop: src/denovos/denovo_scanner.cpp:
# 173-252).  Jobs are padded to a shared allele bucket with NEG GLs/freqs:
# padded configurations underflow out of every log10-sum-exp exactly, so
# results are bitwise identical to the per-job numpy path in float64.
# --------------------------------------------------------------------------

def bucket_alleles(A: int) -> int:
    for b in (2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128):
        if A <= b:
            return b
    return A


def pad_gl(gl: np.ndarray, Ap: int) -> np.ndarray:
    A = gl.shape[0]
    if A == Ap:
        return gl
    out = np.full((Ap, Ap), NEG, dtype=gl.dtype)
    out[:A, :A] = gl
    return out


def pad_freqs(f: np.ndarray, Ap: int) -> np.ndarray:
    A = f.shape[0]
    if A == Ap:
        return f
    out = np.full(Ap, NEG, dtype=f.dtype)
    out[:A] = f
    return out


@functools.lru_cache(maxsize=64)
def _trio_jitted(Ap: int):
    import jax
    import jax.numpy as jnp

    def one(gm, gf, gc, f, mp):
        return trio_unphased_lls(jnp, gm, gf, gc, f, mp)

    return jax.jit(jax.vmap(one))


def trio_unphased_lls_batched(gms, gfs, gcs, freqs, mut_priors):
    """Device path: stacked padded [N, Ap, Ap] GLs (+ [N, Ap] freqs,
    [N] priors) -> (nomut [N], denovo [N], other [N]) in one dispatch."""
    out = _trio_jitted(gms.shape[1])(gms, gfs, gcs, freqs, mut_priors)
    return tuple(np.asarray(o) for o in out)


@functools.lru_cache(maxsize=256)
def _phased_jitted(Ap: int, mat: tuple, pat: tuple):
    import jax
    import jax.numpy as jnp
    C = len(mat)

    def one(gm, gf, gcs, f, mp):
        return phased_family_lls(jnp, gm, gf, [gcs[c] for c in range(C)],
                                 list(mat), list(pat), f, mp)

    return jax.jit(jax.vmap(one))


def phased_family_lls_batched(gms, gfs, gcs, mat: tuple, pat: tuple,
                              freqs, mut_priors):
    """Device path for families sharing a transmission pattern: stacked
    padded [N, Ap, Ap] parent GLs, [N, C, Ap, Ap] child GLs ->
    (nomut [N], denovo [N, C], other [N, C])."""
    out = _phased_jitted(gms.shape[1], tuple(mat), tuple(pat))(
        gms, gfs, gcs, freqs, mut_priors)
    return tuple(np.asarray(o) for o in out)
