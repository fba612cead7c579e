"""Device-batched EM vs the host per-locus EM (ops/em.py).

The batched kernel must reproduce the host train loop per locus: same
convergence flags, same iteration counts, and stutter parameters/LL equal
to float tolerance, with padded loci/reads/alleles changing nothing.
(reference train loop: src/em_stutter_genotyper.cpp:170-226)
"""

import numpy as np
import pytest

from hipstr_tpu.models.stutter import StutterModel
from hipstr_tpu.ops.em import EMStutterGenotyper
from hipstr_tpu.ops.em_batched import EMProblem, em_train_batch, pack_problems


def _simulate_problem(rng, period, n_samples, reads_per_sample,
                      haploid=False):
    model = StutterModel(0.92, 0.07, 0.06, 0.9, 0.02, 0.015, period)
    # true genotypes: bp offsets as multiples of period
    alleles = [0, period, -period, 2 * period]
    num_bps, p1s, p2s = [], [], []
    for s in range(n_samples):
        gt = rng.choice(alleles, size=2)
        obs = []
        for _ in range(reads_per_sample):
            true_bp = int(gt[rng.integers(2)])
            # sample an artifact from the true stutter model
            u = rng.random()
            if u < 0.85:
                d = 0
            elif u < 0.93:
                d = period * int(rng.integers(1, 3))
            elif u < 0.985:
                d = -period * int(rng.integers(1, 3))
            else:
                d = int(rng.integers(1, period)) if period > 1 else 1
            obs.append(true_bp + d)
        num_bps.append(obs)
        p1s.append([0.0] * len(obs))
        p2s.append([0.0] * len(obs))
    return EMProblem.build(haploid, period, num_bps, p1s, p2s), \
        (haploid, period, num_bps, p1s, p2s)


def test_batched_matches_host_em():
    rng = np.random.default_rng(11)
    problems, raws = [], []
    for period in (1, 2, 3, 4):
        for n_samples in (3, 7):
            p, raw = _simulate_problem(rng, period, n_samples, 25)
            problems.append(p)
            raws.append(raw)

    arrays, (Rm, Am, Sm) = pack_problems(problems)
    out = em_train_batch(arrays, Sm, dtype_name="float64")
    params = np.asarray(out["params"])
    conv = np.asarray(out["converged"])
    iters = np.asarray(out["iters"])
    LL = np.asarray(out["total_LL"])

    for g, (haploid, period, num_bps, p1s, p2s) in enumerate(raws):
        em = EMStutterGenotyper(haploid, period, num_bps, p1s, p2s, 0)
        res = em.train()
        assert bool(conv[g]) == res.converged, (g, period)
        assert int(iters[g]) == res.num_iterations, (g, period)
        sm = res.stutter_model
        ref = [sm.in_geom, sm.in_up, sm.in_down,
               sm.out_geom, sm.out_up, sm.out_down]
        np.testing.assert_allclose(params[g], ref, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(LL[g], res.total_LL, rtol=1e-9)


def test_padding_invariance():
    rng = np.random.default_rng(5)
    p, _ = _simulate_problem(rng, 2, 4, 20)
    arrays1, (_, _, Sm1) = pack_problems([p])
    out1 = em_train_batch(arrays1, Sm1, dtype_name="float64")

    # pack alongside a bigger problem to force larger R/A/S padding
    big, _ = _simulate_problem(rng, 3, 17, 40)
    arrays2, (_, _, Sm2) = pack_problems([big, p])
    out2 = em_train_batch(arrays2, Sm2, dtype_name="float64")
    np.testing.assert_allclose(np.asarray(out2["params"])[1],
                               np.asarray(out1["params"])[0],
                               rtol=1e-10, atol=1e-12)
    assert bool(out2["converged"][1]) == bool(out1["converged"][0])
    assert int(out2["iters"][1]) == int(out1["iters"][0])


def test_haploid_batch():
    rng = np.random.default_rng(7)
    p, raw = _simulate_problem(rng, 3, 5, 30, haploid=True)
    arrays, (_, _, Sm) = pack_problems([p])
    out = em_train_batch(arrays, Sm, dtype_name="float64")
    haploid, period, num_bps, p1s, p2s = raw
    res = EMStutterGenotyper(haploid, period, num_bps, p1s, p2s, 0).train()
    sm = res.stutter_model
    ref = [sm.in_geom, sm.in_up, sm.in_down,
           sm.out_geom, sm.out_up, sm.out_down]
    np.testing.assert_allclose(np.asarray(out["params"])[0], ref,
                               rtol=1e-8, atol=1e-10)
    assert bool(out["converged"][0]) == res.converged


@pytest.mark.slow
def test_device_em_cli_identical_to_host_em(monkeypatch, tmp_path):
    """Batched run with wave-level device EM (HIPSTR_TPU_DEVICE_EM=1,
    float64 on CPU) produces the same VCF body as the host per-locus EM."""
    from hipstr_tpu.parallel.executor import run_batched
    from hipstr_tpu.pipeline.processor import (GenotyperPipeline, Logger,
                                               PipelineOptions)
    from tests.test_workers import _write_sim
    from hipstr_tpu.utils.simulate import simulate_locus

    tmp = str(tmp_path)
    locs = [simulate_locus(seed=900 + i, n_samples=3, reads_per_sample=25,
                           period=2 + (i % 3), ref_units=8,
                           chrom=f"chrE{i}") for i in range(5)]
    _write_sim(tmp, locs)
    opts = PipelineOptions(min_reads=12, use_unpaired=True, dtype="float64")

    monkeypatch.setenv("HIPSTR_TPU_DEVICE_EM", "0")
    p = GenotyperPipeline([f"{tmp}/sim.bam"], f"{tmp}/sim.fa", opts,
                          Logger(quiet=True))
    run_batched(p, f"{tmp}/regions.bed", f"{tmp}/host.vcf", batch_size=4)

    monkeypatch.setenv("HIPSTR_TPU_DEVICE_EM", "1")
    p2 = GenotyperPipeline([f"{tmp}/sim.bam"], f"{tmp}/sim.fa", opts,
                           Logger(quiet=True))
    c2 = run_batched(p2, f"{tmp}/regions.bed", f"{tmp}/dev.vcf", batch_size=4)

    a = [l for l in open(f"{tmp}/host.vcf") if not l.startswith("#")]
    b = [l for l in open(f"{tmp}/dev.vcf") if not l.startswith("#")]
    assert len(a) == 5 and a == b
    assert c2.genotype_success == 5
