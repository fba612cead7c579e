"""Stutter-EM recovery tests (simulation-based, mirroring the reference's EM
harness strategy, reference: test/run_stutter_em_tests.sh + em_stutter_test).
"""

import math

import numpy as np

from hipstr_tpu.models.stutter import StutterModel
from hipstr_tpu.ops.em import EMStutterGenotyper


def simulate_reads(rng, model: StutterModel, n_samples, reads_per_sample,
                   allele_pool, freqs):
    """Diploid samples; reads carry stutter artifacts drawn from the model."""
    num_bps, log_p1, log_p2 = [], [], []
    period = model.period
    for s in range(n_samples):
        a1, a2 = rng.choice(allele_pool, size=2, p=freqs)
        bps, p1s, p2s = [], [], []
        for _ in range(reads_per_sample):
            true_len = a1 if rng.random() < 0.5 else a2
            r = rng.random()
            if r < model.in_up:
                d = rng.geometric(model.in_geom) * period
            elif r < model.in_up + model.in_down:
                d = -rng.geometric(model.in_geom) * period
            elif r < model.in_up + model.in_down + model.out_up:
                d = rng.geometric(model.out_geom)
                d += (d % period == 0)
            elif r < model.in_up + model.in_down + model.out_up + model.out_down:
                d = -rng.geometric(model.out_geom)
                d -= (d % period == 0)
            else:
                d = 0
            bps.append(int(true_len + d))
            p1s.append(math.log(0.5))
            p2s.append(math.log(0.5))
        num_bps.append(bps)
        log_p1.append(p1s)
        log_p2.append(p2s)
    return num_bps, log_p1, log_p2


def test_em_recovers_stutter_params():
    rng = np.random.default_rng(7)
    true = StutterModel(0.85, 0.08, 0.12, 0.9, 0.01, 0.01, 3)
    alleles = np.array([30, 33, 36, 39])
    freqs = np.array([0.4, 0.3, 0.2, 0.1])
    num_bps, lp1, lp2 = simulate_reads(rng, true, n_samples=120,
                                       reads_per_sample=25,
                                       allele_pool=alleles, freqs=freqs)
    em = EMStutterGenotyper(False, 3, num_bps, lp1, lp2, ref_allele=33)
    res = em.train()
    assert res.converged
    m = res.stutter_model
    assert abs(m.in_up - true.in_up) < 0.04
    assert abs(m.in_down - true.in_down) < 0.04
    assert abs(m.in_geom - true.in_geom) < 0.12
    assert m.out_up < 0.05 and m.out_down < 0.05


def test_em_monotone_ll_and_genotypes():
    rng = np.random.default_rng(3)
    true = StutterModel(0.9, 0.05, 0.05, 0.9, 0.005, 0.005, 2)
    alleles = np.array([20, 24])
    freqs = np.array([0.5, 0.5])
    num_bps, lp1, lp2 = simulate_reads(rng, true, 40, 30, alleles, freqs)
    em = EMStutterGenotyper(False, 2, num_bps, lp1, lp2, ref_allele=20)
    res = em.train()
    assert res.converged
    # posteriors are normalized
    post = res.log_sample_posteriors
    tot = np.exp(post).sum(axis=(1, 2))
    assert np.allclose(tot, 1.0, atol=1e-8)


def test_em_haploid():
    rng = np.random.default_rng(11)
    true = StutterModel(0.9, 0.06, 0.06, 0.9, 0.01, 0.01, 4)
    alleles = np.array([40, 44])
    num_bps, lp1, lp2 = simulate_reads(rng, true, 50, 20, alleles,
                                       np.array([0.6, 0.4]))
    em = EMStutterGenotyper(True, 4, num_bps, lp1, lp2, ref_allele=40)
    res = em.train()
    assert res.converged
    post = res.log_sample_posteriors
    # off-diagonal genotypes impossible for haploid
    off = post[:, ~np.eye(post.shape[1], dtype=bool)]
    assert np.all(off < -100)


def test_em_parameter_sweep():
    """Scaled-down version of the reference's EM simulation sweep
    (reference: test/run_stutter_em_tests.sh — {100,250,500} samples x
    stutter-param grid x 25 reps): EM must recover the generating stutter
    probabilities across a parameter grid."""
    rng = np.random.default_rng(7)
    period = 3
    allele_pool = np.array([18, 21, 24, 27])
    freqs = np.ones(4) / 4
    n_fail = n_total = 0
    for in_up in (0.02, 0.08):
        for in_down in (0.02, 0.10):
            for n_samples in (60, 150):
                model = StutterModel(0.9, in_up, in_down, 0.9, 0.005, 0.005,
                                     period)
                num_bps, log_p1, log_p2 = simulate_reads(
                    rng, model, n_samples, 30, allele_pool, freqs)
                em = EMStutterGenotyper(False, period, num_bps, log_p1,
                                        log_p2, 21)
                res = em.train(100, 0.01, 0.001)
                n_total += 1
                got = res.stutter_model
                ok = (abs(got.in_up - in_up) < 0.025
                      and abs(got.in_down - in_down) < 0.025
                      and abs(got.in_geom - 0.9) < 0.12)
                n_fail += not ok
    # the reference harness tolerates occasional misconvergence; demand
    # at least 7/8 grid cells recovered
    assert n_fail <= 1, (n_fail, n_total)
