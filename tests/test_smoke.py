"""Fast smoke tier: `pytest -m smoke` — <60s warm on a 4-core host.

One golden locus vs the reference binary, a mixed-period batch, a
speculation byte-identity case, and a locus-shard merge, all in one
process so XLA compiles (persistent-cached by conftest) are paid once.
"""

import dataclasses
import os
import subprocess
import tempfile

import pytest

from hipstr_tpu.models.stutter import StutterModel
from hipstr_tpu.parallel.executor import run_batched
from hipstr_tpu.pipeline.processor import (GenotyperPipeline, Logger,
                                           PipelineOptions)
from hipstr_tpu.utils.simulate import simulate_locus
from tests.test_workers import _write_sim

pytestmark = pytest.mark.smoke

REF_BINARY = "/tmp/refbuild/HipSTR"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _opts(**kw):
    base = dict(min_reads=12, use_unpaired=True, dtype="float64",
                def_stutter_model=StutterModel(0.95, 0.05, 0.05, 0.95,
                                               0.01, 0.01, 2))
    base.update(kw)
    return PipelineOptions(**base)


def _run(tmp, out, opts):
    p = GenotyperPipeline([f"{tmp}/sim.bam"], f"{tmp}/sim.fa", opts,
                          Logger(quiet=True))
    return run_batched(p, f"{tmp}/regions.bed", out, batch_size=4)


@pytest.mark.skipif(not os.path.exists(REF_BINARY),
                    reason="reference binary not built")
def test_smoke_golden_one_locus():
    """GT/GB/DP exact vs the reference binary on one simulated locus."""
    tmp = tempfile.mkdtemp()
    _write_sim(tmp, [simulate_locus(seed=7100, n_samples=3,
                                    reads_per_sample=24, period=2,
                                    ref_units=9, chrom="chrG0")])
    subprocess.run(
        [REF_BINARY, "--bams", f"{tmp}/sim.bam", "--fasta", f"{tmp}/sim.fa",
         "--regions", f"{tmp}/regions.bed", "--str-vcf", f"{tmp}/ref.vcf.gz",
         "--silent", "--use-unpaired", "--min-reads", "12",
         "--def-stutter-model"], check=True)
    _run(tmp, f"{tmp}/tpu.vcf", _opts())

    from hipstr_tpu.io.bgzf import BgzfReader
    ref = [l for l in BgzfReader(f"{tmp}/ref.vcf.gz").read_all().decode()
           .splitlines() if not l.startswith("#")]
    tpu = [l for l in open(f"{tmp}/tpu.vcf") if not l.startswith("#")]
    assert len(ref) == len(tpu) == 1
    rf, tf = ref[0].split("\t"), tpu[0].rstrip("\n").split("\t")
    assert rf[:5] == tf[:5]
    fmt = rf[8].split(":")
    for s in range(9, len(rf)):
        rd = dict(zip(fmt, rf[s].strip().split(":")))
        td = dict(zip(fmt, tf[s].strip().split(":")))
        for f in ("GT", "GB", "DP", "ALLREADS", "MALLREADS"):
            assert rd[f] == td[f], (f, rd[f], td[f])


@pytest.mark.slow
def test_smoke_mixed_period_batch():
    """One batched dispatch over loci of different periods."""
    tmp = tempfile.mkdtemp()
    locs = [simulate_locus(seed=7200 + i, n_samples=3, reads_per_sample=20,
                           period=1 + i, ref_units=8, chrom=f"chrM{i}")
            for i in range(4)]
    _write_sim(tmp, locs)
    counters = _run(tmp, f"{tmp}/out.vcf", _opts())
    recs = [l for l in open(f"{tmp}/out.vcf") if not l.startswith("#")]
    assert counters.genotype_success == len(recs) == 4


@pytest.mark.slow
def test_smoke_speculation_identical():
    tmp = tempfile.mkdtemp()
    locs = [simulate_locus(seed=7300 + i, n_samples=3, reads_per_sample=24,
                           period=2, ref_units=9, chrom=f"chrP{i}")
            for i in range(2)]
    _write_sim(tmp, locs)
    for flag, out in (("1", "on.vcf"), ("0", "off.vcf")):
        os.environ["HIPSTR_TPU_SPECULATE"] = flag
        try:
            _run(tmp, f"{tmp}/{out}", _opts())
        finally:
            os.environ.pop("HIPSTR_TPU_SPECULATE", None)
    assert open(f"{tmp}/on.vcf").read() == open(f"{tmp}/off.vcf").read()


@pytest.mark.slow
def test_smoke_shard_merge(request):
    """Two locus shards merged == one full run (byte-identical records).

    slow-only (three pipeline runs of jax tracing dominate): excluded from
    the <60s smoke tier; shard correctness is also covered by
    test_distributed / test_phasing."""
    if "smoke" in request.config.getoption("-m", default=""):
        pytest.skip("slow-only: excluded from the smoke tier")
    from hipstr_tpu.cli import merge_shard_outputs

    tmp = tempfile.mkdtemp()
    locs = [simulate_locus(seed=7400 + i, n_samples=3, reads_per_sample=20,
                           period=2, ref_units=8, chrom=f"chrH{i}")
            for i in range(4)]
    _write_sim(tmp, locs)
    _run(tmp, f"{tmp}/full.vcf", _opts())
    for i in range(2):
        _run(tmp, f"{tmp}/merged.vcf.dshard{i}",
             _opts(locus_shard=(i, 2)))
    merge_shard_outputs(f"{tmp}/merged.vcf", None, None,
                        [(f"{tmp}/merged.vcf.dshard{i}", None, None)
                         for i in range(2)])
    full = [l for l in open(f"{tmp}/full.vcf") if not l.startswith("#")]
    merged = [l for l in open(f"{tmp}/merged.vcf") if not l.startswith("#")]
    assert len(full) == 4 and full == merged
