"""Host worker-pool executor: byte-identical output vs in-process batched.

The pool splits the program along the host/device boundary (workers do all
per-locus host phases; the parent owns the device) — results must not
depend on which process prepared a locus (reference behavior: loci are
fully independent, src/bam_processor.cpp:523-618).
"""

import pytest
import tempfile

from hipstr_tpu.io.bam import BamRecord, BamWriter
from hipstr_tpu.io.fasta import write_fasta
from hipstr_tpu.models.stutter import StutterModel
from hipstr_tpu.parallel.executor import run_batched
from hipstr_tpu.parallel.workers import run_pooled
from hipstr_tpu.pipeline.processor import (GenotyperPipeline, Logger,
                                           PipelineOptions)
from hipstr_tpu.utils.simulate import simulate_locus

pytestmark = pytest.mark.slow  # multi-minute suite (VERDICT r4 item 5)


def _write_sim(tmp, locs):
    write_fasta(f"{tmp}/sim.fa", [(l.chrom, l.chrom_seq) for l in locs])
    with open(f"{tmp}/regions.bed", "w") as fh:
        for l in locs:
            r = l.region
            fh.write(f"{r.chrom}\t{r.start + 1}\t{r.stop}\t{r.period}"
                     "\t8.0\tX\n")
    hdr = ("@HD\tVN:1.6\tSO:coordinate\n"
           + "".join(f"@SQ\tSN:{l.chrom}\tLN:{len(l.chrom_seq)}\n"
                     for l in locs)
           + "".join(f"@RG\tID:rg{n}\tSM:{n}\tLB:lib{n}\n"
                     for n in locs[0].sample_names))
    w = BamWriter(f"{tmp}/sim.bam", [l.chrom for l in locs],
                  [len(l.chrom_seq) for l in locs], hdr)
    ref_ids = {l.chrom: i for i, l in enumerate(locs)}
    recs = []
    for l in locs:
        for rd in l.raw_reads:
            recs.append(BamRecord(
                name=f"{l.chrom}_{rd['name']}", flag=0x10 if rd["rev"] else 0,
                ref_id=ref_ids[l.chrom], pos=rd["start"], mapq=60,
                cigar=[(len(rd["seq"]), "M")], mate_ref_id=-1, mate_pos=-1,
                tlen=0, seq=rd["seq"], qual=rd["quals"],
                tags={"RG": ("Z", f"rg{rd['sample']}")}))
    recs.sort(key=lambda r: (r.ref_id, r.pos))
    for r in recs:
        w.write(r)
    w.close()


def _opts():
    return PipelineOptions(
        min_reads=12, use_unpaired=True, dtype="float64",
        def_stutter_model=StutterModel(0.95, 0.05, 0.05, 0.95, 0.01,
                                       0.01, 2))


def test_worker_pool_identical_to_batched():
    tmp = tempfile.mkdtemp()
    locs = [simulate_locus(seed=700 + i, n_samples=2, reads_per_sample=20,
                           period=3, ref_units=8, chrom=f"chrW{i}")
            for i in range(6)]
    _write_sim(tmp, locs)

    p = GenotyperPipeline([f"{tmp}/sim.bam"], f"{tmp}/sim.fa", _opts(),
                          Logger(quiet=True))
    run_batched(p, f"{tmp}/regions.bed", f"{tmp}/bat.vcf", batch_size=4)

    p2 = GenotyperPipeline([f"{tmp}/sim.bam"], f"{tmp}/sim.fa", _opts(),
                           Logger(quiet=True))
    spec = dict(bam_paths=[f"{tmp}/sim.bam"], fasta_path=f"{tmp}/sim.fa",
                opts=_opts(), bam_samps=None, bam_libs=None, lib_field="LB")
    counters = run_pooled(p2, f"{tmp}/regions.bed", f"{tmp}/pool.vcf", spec,
                          n_workers=2, batch_size=4)

    a = [l for l in open(f"{tmp}/bat.vcf") if not l.startswith("#")]
    b = [l for l in open(f"{tmp}/pool.vcf") if not l.startswith("#")]
    assert len(a) == 6 and a == b
    assert counters.genotype_success == 6


def test_worker_pool_device_posteriors_identical(monkeypatch):
    """On accelerator backends the executor fuses posteriors into the
    device dispatch; workers must install the SAME posteriors the batched
    path uses (not recompute on host) or near-tie adaptive decisions flip
    between modes.  Forces the fused path on CPU to exercise the full
    (LL, post, totals) worker protocol."""
    monkeypatch.setenv("HIPSTR_TPU_DEVICE_POST", "1")
    tmp = tempfile.mkdtemp()
    locs = [simulate_locus(seed=760 + i, n_samples=2, reads_per_sample=20,
                           period=2 + (i % 3), ref_units=8, chrom=f"chrWP{i}")
            for i in range(5)]
    _write_sim(tmp, locs)

    p = GenotyperPipeline([f"{tmp}/sim.bam"], f"{tmp}/sim.fa", _opts(),
                          Logger(quiet=True))
    run_batched(p, f"{tmp}/regions.bed", f"{tmp}/bat.vcf", batch_size=4)

    p2 = GenotyperPipeline([f"{tmp}/sim.bam"], f"{tmp}/sim.fa", _opts(),
                           Logger(quiet=True))
    spec = dict(bam_paths=[f"{tmp}/sim.bam"], fasta_path=f"{tmp}/sim.fa",
                opts=_opts(), bam_samps=None, bam_libs=None, lib_field="LB")
    counters = run_pooled(p2, f"{tmp}/regions.bed", f"{tmp}/pool.vcf", spec,
                          n_workers=2, batch_size=4)

    a = [l for l in open(f"{tmp}/bat.vcf") if not l.startswith("#")]
    b = [l for l in open(f"{tmp}/pool.vcf") if not l.startswith("#")]
    assert len(a) == 5 and a == b
    assert counters.genotype_success == 5


def test_worker_pool_device_em_identical(monkeypatch):
    """In EM mode on accelerator backends the in-process executor trains
    stutter models in batched device dispatches; pooled workers must get
    the SAME device-trained models (via the parent) or the two modes
    diverge.  Forces the device-EM path on CPU to exercise the full
    em -> emr worker protocol."""
    monkeypatch.setenv("HIPSTR_TPU_DEVICE_EM", "1")
    monkeypatch.setenv("HIPSTR_TPU_DEVICE_POST", "1")
    tmp = tempfile.mkdtemp()
    locs = [simulate_locus(seed=810 + i, n_samples=3, reads_per_sample=25,
                           period=2 + (i % 2), ref_units=8, chrom=f"chrWE{i}")
            for i in range(5)]
    _write_sim(tmp, locs)

    def em_opts():
        return PipelineOptions(min_reads=12, use_unpaired=True,
                               dtype="float64", stutter_out=f"{tmp}/so.txt")

    p = GenotyperPipeline([f"{tmp}/sim.bam"], f"{tmp}/sim.fa", em_opts(),
                          Logger(quiet=True))
    run_batched(p, f"{tmp}/regions.bed", f"{tmp}/bat.vcf", batch_size=4)

    p2 = GenotyperPipeline([f"{tmp}/sim.bam"], f"{tmp}/sim.fa", em_opts(),
                           Logger(quiet=True))
    spec = dict(bam_paths=[f"{tmp}/sim.bam"], fasta_path=f"{tmp}/sim.fa",
                opts=em_opts(), bam_samps=None, bam_libs=None,
                lib_field="LB")
    counters = run_pooled(p2, f"{tmp}/regions.bed", f"{tmp}/pool.vcf", spec,
                          n_workers=2, batch_size=4)

    a = [l for l in open(f"{tmp}/bat.vcf") if not l.startswith("#")]
    b = [l for l in open(f"{tmp}/pool.vcf") if not l.startswith("#")]
    assert len(a) == len(b) > 0 and a == b
    assert counters.genotype_success == len(a)
