import pytest
"""Fused device posteriors vs the host per-locus recompute.

With HIPSTR_TPU_DEVICE_POST=1 the batched dispatch returns
(LL, log_post, totals) and the executor installs the device posteriors
instead of recomputing on host (reference: src/genotyper.cpp:44-80).  On
CPU/float64 the results must be byte-identical at the VCF surface.
"""

from hipstr_tpu.parallel.executor import run_batched
from hipstr_tpu.pipeline.processor import (GenotyperPipeline, Logger,
                                           PipelineOptions)
from hipstr_tpu.models.stutter import StutterModel
from hipstr_tpu.utils.simulate import simulate_locus
from tests.test_workers import _write_sim

pytestmark = pytest.mark.slow  # multi-minute suite (VERDICT r4 item 5)


def _opts():
    return PipelineOptions(
        min_reads=12, use_unpaired=True, dtype="float64",
        def_stutter_model=StutterModel(0.95, 0.05, 0.05, 0.95, 0.01,
                                       0.01, 2))


def test_device_posteriors_cli_identical(monkeypatch, tmp_path):
    tmp = str(tmp_path)
    locs = [simulate_locus(seed=1300 + i, n_samples=3, reads_per_sample=22,
                           period=1 + (i % 4), ref_units=8,
                           chrom=f"chrP{i}") for i in range(6)]
    _write_sim(tmp, locs)

    monkeypatch.setenv("HIPSTR_TPU_DEVICE_POST", "0")
    p = GenotyperPipeline([f"{tmp}/sim.bam"], f"{tmp}/sim.fa", _opts(),
                          Logger(quiet=True))
    run_batched(p, f"{tmp}/regions.bed", f"{tmp}/host.vcf", batch_size=4)

    monkeypatch.setenv("HIPSTR_TPU_DEVICE_POST", "1")
    p2 = GenotyperPipeline([f"{tmp}/sim.bam"], f"{tmp}/sim.fa", _opts(),
                           Logger(quiet=True))
    c2 = run_batched(p2, f"{tmp}/regions.bed", f"{tmp}/dev.vcf",
                     batch_size=4)

    a = [l for l in open(f"{tmp}/host.vcf") if not l.startswith("#")]
    b = [l for l in open(f"{tmp}/dev.vcf") if not l.startswith("#")]
    assert len(a) == 6 and a == b
    assert c2.genotype_success == 6


def test_device_posteriors_with_device_em(monkeypatch, tmp_path):
    """Both device stages on (EM + posteriors) still match the host path."""
    tmp = str(tmp_path)
    locs = [simulate_locus(seed=1400 + i, n_samples=3, reads_per_sample=25,
                           period=2, ref_units=9, chrom=f"chrQ{i}")
            for i in range(4)]
    _write_sim(tmp, locs)
    opts = PipelineOptions(min_reads=12, use_unpaired=True, dtype="float64")

    monkeypatch.setenv("HIPSTR_TPU_DEVICE_POST", "0")
    monkeypatch.setenv("HIPSTR_TPU_DEVICE_EM", "0")
    p = GenotyperPipeline([f"{tmp}/sim.bam"], f"{tmp}/sim.fa", opts,
                          Logger(quiet=True))
    run_batched(p, f"{tmp}/regions.bed", f"{tmp}/host.vcf", batch_size=4)

    monkeypatch.setenv("HIPSTR_TPU_DEVICE_POST", "1")
    monkeypatch.setenv("HIPSTR_TPU_DEVICE_EM", "1")
    p2 = GenotyperPipeline([f"{tmp}/sim.bam"], f"{tmp}/sim.fa", opts,
                           Logger(quiet=True))
    run_batched(p2, f"{tmp}/regions.bed", f"{tmp}/dev.vcf", batch_size=4)

    a = [l for l in open(f"{tmp}/host.vcf") if not l.startswith("#")]
    b = [l for l in open(f"{tmp}/dev.vcf") if not l.startswith("#")]
    assert len(a) == 4 and a == b
