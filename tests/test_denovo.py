"""De novo scanner tests: dense kernels vs brute-force reference loops, and
the DenovoFinder CLI end-to-end."""

import math
import os
import subprocess
import sys

import numpy as np
import pytest

from hipstr_tpu.denovo.likelihoods import (
    NEG, expand_unphased_gls, phased_family_lls, trio_unphased_lls,
    uniform_log10_freqs)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def lse10(vals):
    """Reference-parity aggregation: the reference's streaming LSE
    (mathops.cpp:72-84) applies natural exp/log to log10-space terms, and
    the kernels replicate that hybrid by default."""
    vals = [v for v in vals if v > -1e20]
    if not vals:
        return NEG
    m = max(vals)
    return m + math.log(sum(math.exp(v - m) for v in vals))


def brute_trio(gm, gf, gc, freqs, mut_prior):
    """Literal transcription of the reference trio loops
    (trio_denovo_scanner.cpp:81-180), without pruning."""
    A = gm.shape[0]
    L14 = -math.log10(4)
    L2 = math.log10(2)
    nomut, den, oth = [], [], []
    for mat_i in range(A):
        for mat_j in range(mat_i + 1):
            pri_m = freqs[mat_i] + freqs[mat_j] + (L2 if mat_i != mat_j else 0)
            mat_ll = pri_m + gm[mat_j, mat_i]
            for pat_i in range(A):
                for pat_j in range(pat_i + 1):
                    pri_f = freqs[pat_i] + freqs[pat_j] + \
                        (L2 if pat_i != pat_j else 0)
                    config = mat_ll + pri_f + gf[pat_j, pat_i] + L14
                    for mat_allele in (mat_i, mat_j):
                        for pat_allele in (pat_i, pat_j):
                            nomut.append(config + gc[min(mat_allele, pat_allele),
                                                     max(mat_allele, pat_allele)])
                            for m in range(A):
                                if m != mat_allele:
                                    p = config + gc[min(m, pat_allele),
                                                    max(m, pat_allele)] + mut_prior
                                    if m not in (mat_i, mat_j, pat_i, pat_j):
                                        den.append(p)
                                    else:
                                        oth.append(p)
                                if m != pat_allele:
                                    p = config + gc[min(mat_allele, m),
                                                    max(mat_allele, m)] + mut_prior
                                    if m not in (mat_i, mat_j, pat_i, pat_j):
                                        den.append(p)
                                    else:
                                        oth.append(p)
    return lse10(nomut), lse10(den), lse10(oth)


def brute_phased(gm, gf, gcs, mat_idx, pat_idx, freqs, mut_prior):
    """Literal transcription of denovo_scanner.cpp:173-252, no pruning."""
    A = gm.shape[0]
    nomut = []
    den = [[] for _ in gcs]
    oth = [[] for _ in gcs]
    for mi in range(A):
        for mj in range(A):
            mat_ll = freqs[mi] + freqs[mj] + gm[mi, mj]
            for pi in range(A):
                for pj in range(A):
                    pat_ll = freqs[pi] + freqs[pj] + gf[pi, pj]
                    cfg = mat_ll + pat_ll
                    total_children = 0.0
                    cvals = []
                    for c, gc in enumerate(gcs):
                        ci = cj = None
                        if mat_idx[c] == 0:
                            ci = mi
                        elif mat_idx[c] == 1:
                            ci = mj
                        elif mat_idx[c] == 2:
                            cj = mi
                        else:
                            cj = mj
                        if pat_idx[c] == 0:
                            ci = pi
                        elif pat_idx[c] == 1:
                            ci = pj
                        elif pat_idx[c] == 2:
                            cj = pi
                        else:
                            cj = pj
                        cvals.append((ci, cj, gc[ci, cj]))
                        total_children += gc[ci, cj]
                    nomut.append(cfg + total_children)
                    for c, gc in enumerate(gcs):
                        ci, cj, v = cvals[c]
                        base = cfg + total_children - v
                        for m in range(A):
                            if m != ci:
                                p = base + gc[m, cj] + mut_prior
                                (den if m not in (mi, mj, pi, pj)
                                 else oth)[c].append(p)
                            if m != cj:
                                p = base + gc[ci, m] + mut_prior
                                (den if m not in (mi, mj, pi, pj)
                                 else oth)[c].append(p)
    return (lse10(nomut), [lse10(x) for x in den], [lse10(x) for x in oth])


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_trio_kernel_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    A = 4
    freqs = uniform_log10_freqs(A)
    mats = [np.round(rng.uniform(-8, 0, (A, A)), 2) for _ in range(3)]
    mats = [np.minimum(m, m.T) * 0 + (m + m.T) / 2 for m in mats]  # symmetric
    nomut, den, oth = trio_unphased_lls(np, mats[0], mats[1], mats[2],
                                        freqs, -1.0)
    bn, bd, bo = brute_trio(mats[0], mats[1], mats[2], freqs, -1.0)
    assert np.isclose(float(nomut), bn, atol=1e-9)
    assert np.isclose(float(den), bd, atol=1e-9)
    assert np.isclose(float(oth), bo, atol=1e-9)


@pytest.mark.parametrize("seed,mat_idx,pat_idx", [
    (1, [0], [2]), (2, [1], [3]), (3, [2], [0]), (4, [3], [1]),
    (5, [0, 2], [3, 1]),
])
def test_phased_kernel_matches_bruteforce(seed, mat_idx, pat_idx):
    rng = np.random.default_rng(seed)
    A = 3
    freqs = uniform_log10_freqs(A)
    gm = np.round(rng.uniform(-8, 0, (A, A)), 2)
    gf = np.round(rng.uniform(-8, 0, (A, A)), 2)
    gcs = [np.round(rng.uniform(-8, 0, (A, A)), 2) for _ in mat_idx]
    nomut, den, oth = phased_family_lls(np, gm, gf, gcs, mat_idx, pat_idx,
                                        freqs, -1.0)
    bn, bd, bo = brute_phased(gm, gf, gcs, mat_idx, pat_idx, freqs, -1.0)
    assert np.isclose(float(nomut), bn, atol=1e-9)
    for c in range(len(gcs)):
        assert np.isclose(float(den[c]), bd[c], atol=1e-9), (c, den, bd)
        assert np.isclose(float(oth[c]), bo[c], atol=1e-9)


def test_denovo_finder_cli(tmp_path):
    """Trio with a child allele absent from both parents -> DENOVO >> NOMUT."""
    A = 3
    # condensed diploid GL order for A=3: (0,0),(1,0),(1,1),(2,0),(2,1),(2,2)
    def gl(best_pair):
        out = []
        for i in range(A):
            for j in range(i + 1):
                out.append(0.0 if (j, i) == best_pair else -8.0)
        return ",".join(str(x) for x in out)

    # mother 0/0, father 0/0, child 0/2 (allele 2 de novo)
    vcf = tmp_path / "str.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.1\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n'
        '##FORMAT=<ID=GL,Number=G,Type=Float,Description="G">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tMOM\tDAD\tKID\n"
        "chr1\t1000\t.\tACACAC\tACAC,ACACACAC\t.\t.\t"
        "BPDIFFS=-2,2;START=1000;END=1005;PERIOD=2\tGT:GL\t"
        f"0|0:{gl((0, 0))}\t0|0:{gl((0, 0))}\t0|2:{gl((0, 2))}\n")
    fam = tmp_path / "ped.fam"
    fam.write_text("F1\tKID\tDAD\tMOM\t1\t0\n")
    out = tmp_path / "denovo.vcf"

    env = dict(os.environ, PYTHONPATH=REPO)
    subprocess.run([sys.executable, "-m", "hipstr_tpu.denovo_finder",
                    "--fam", str(fam), "--str-vcf", str(vcf),
                    "--denovo-vcf", str(out)], check=True, env=env, cwd=REPO)
    recs = [l for l in open(out) if not l.startswith("#")]
    assert len(recs) == 1
    fields = recs[0].strip().split("\t")
    assert fields[8] == "NOMUT:DENOVO:OTHER"
    nomut, denovo, other = (float(x) for x in fields[9].split(":"))
    assert denovo > nomut + 2
    assert denovo > other


def test_denovo_kernels_run_under_jit():
    """The de novo contractions are xp-generic: under jax.jit they produce
    the same log10 likelihoods as the numpy path (device kernel parity)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    rng = np.random.default_rng(5)
    A = 4
    def rand_gl():
        m = rng.uniform(-8, 0, size=(A, A))
        return m
    gm, gf, gc = rand_gl(), rand_gl(), rand_gl()
    freqs = np.log10(np.ones(A) / A)
    mut_prior = -np.log10(2.0 * (A - 1))

    n_np = trio_unphased_lls(np, gm, gf, gc, freqs, mut_prior)

    @partial(jax.jit, static_argnums=())
    def run(gm, gf, gc, freqs):
        return trio_unphased_lls(jnp, gm, gf, gc, freqs, mut_prior)

    n_j = run(gm, gf, gc, freqs)
    for a, b in zip(n_np, n_j):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-10)

    gcs = [rand_gl() for _ in range(2)]
    p_np = phased_family_lls(np, gm, gf, gcs, [0, 1], [2, 3], freqs,
                             mut_prior)
    p_j = phased_family_lls(jnp, jnp.asarray(gm), jnp.asarray(gf),
                            [jnp.asarray(g) for g in gcs], [0, 1], [2, 3],
                            jnp.asarray(freqs), mut_prior)
    for a, b in zip(p_np, p_j):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-10)


def test_batched_device_kernels_match_host():
    """jit(vmap)ed padded-job batches (likelihoods.*_batched) match the
    per-job numpy path bitwise in float64, across allele buckets."""
    from hipstr_tpu.denovo.likelihoods import (
        bucket_alleles, pad_freqs, pad_gl, phased_family_lls_batched,
        trio_unphased_lls_batched)

    rng = np.random.default_rng(17)
    for A in (2, 3, 5):
        Ap = bucket_alleles(A)
        freqs = uniform_log10_freqs(A)
        jobs = []
        for _ in range(4):
            m = rng.uniform(-8, 0, (A, A))
            jobs.append(((m + m.T) / 2, rng.uniform(-8, 0, (A, A)),
                         rng.uniform(-8, 0, (A, A))))
        gms = np.stack([pad_gl(j[0], Ap) for j in jobs])
        gfs = np.stack([pad_gl(j[1], Ap) for j in jobs])
        gcs = np.stack([pad_gl(j[2], Ap) for j in jobs])
        fr = np.stack([pad_freqs(freqs, Ap)] * 4)
        mp = np.full(4, -1.25)
        bn, bd, bo = trio_unphased_lls_batched(gms, gfs, gcs, fr, mp)
        for i, (gm, gf, gc) in enumerate(jobs):
            n, d, o = trio_unphased_lls(np, gm, gf, gc, freqs, -1.25)
            # jnp reassociates the final reductions: allow 1-2 ULP
            assert np.isclose(float(n), bn[i], rtol=0, atol=1e-12)
            assert np.isclose(float(d), bd[i], rtol=0, atol=1e-12)
            assert np.isclose(float(o), bo[i], rtol=0, atol=1e-12)

    # phased family groups (2 children, fixed transmission pattern)
    A = 3
    Ap = bucket_alleles(A)
    freqs = uniform_log10_freqs(A)
    mat, pat = (0, 2), (3, 1)
    fams = []
    for _ in range(3):
        fams.append((rng.uniform(-8, 0, (A, A)), rng.uniform(-8, 0, (A, A)),
                     [rng.uniform(-8, 0, (A, A)) for _ in range(2)]))
    gms = np.stack([pad_gl(f[0], Ap) for f in fams])
    gfs = np.stack([pad_gl(f[1], Ap) for f in fams])
    gcs = np.stack([[pad_gl(g, Ap) for g in f[2]] for f in fams])
    fr = np.stack([pad_freqs(freqs, Ap)] * 3)
    mp = np.full(3, -0.9)
    bn, bd, bo = phased_family_lls_batched(gms, gfs, gcs, mat, pat, fr, mp)
    for i, (gm, gf, gcl) in enumerate(fams):
        n, d, o = phased_family_lls(np, gm, gf, gcl, list(mat), list(pat),
                                    freqs, -0.9)
        assert np.isclose(float(n), bn[i], rtol=0, atol=1e-12)
        assert np.allclose(np.asarray(d), bd[i], rtol=0, atol=1e-12)
        assert np.allclose(np.asarray(o), bo[i], rtol=0, atol=1e-12)


def test_trio_scanner_device_batch_identical(tmp_path):
    """TrioDenovoScanner with device_batch produces byte-identical VCFs."""
    import io
    from hipstr_tpu.denovo.scanner import TrioDenovoScanner
    from hipstr_tpu.io.vcf_read import VCFReader
    from hipstr_tpu.phasing.pedigree import extract_pedigree_nuclear_families

    rng = np.random.default_rng(23)

    def gl_text(A):
        n = A * (A + 1) // 2
        return ",".join(f"{v:.2f}" for v in rng.uniform(-9, 0, n))

    lines = ["##fileformat=VCFv4.1\n",
             '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n',
             '##FORMAT=<ID=GL,Number=G,Type=Float,Description="G">\n',
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
             "\tMOM\tDAD\tKID\n"]
    for i, A in enumerate((2, 3, 4, 2, 5, 3, 2)):
        alts = ",".join("A" * (k + 1) for k in range(1, A))
        lines.append(
            f"chr1\t{1000 + 100 * i}\t.\tAC\t{alts}\t.\t.\t"
            f"BPDIFFS=2;START={1000 + 100 * i};END={1001 + 100 * i};PERIOD=2"
            f"\tGT:GL\t0|0:{gl_text(A)}\t0|0:{gl_text(A)}\t0|1:{gl_text(A)}\n")
    vcf = tmp_path / "str.vcf"
    vcf.write_text("".join(lines))
    fam = tmp_path / "ped.fam"
    fam.write_text("F1\tKID\tDAD\tMOM\t1\t0\n")

    families = extract_pedigree_nuclear_families(
        str(fam), {"MOM", "DAD", "KID"})
    outs = []
    for db in (0, 3):
        buf = io.StringIO()
        sc = TrioDenovoScanner(families, buf)
        sc.scan(VCFReader(str(vcf)), device_batch=db)
        outs.append(buf.getvalue())
    assert outs[0] == outs[1] and outs[0].count("chr1") == 7
