"""End-to-end genotyping on simulated STR loci.

Simulate diploid samples with PCR stutter + sequencing errors, run the full
per-locus pipeline (haplotype generation -> batched HMM -> posteriors ->
stutter-candidate loop -> VCF record) and check the called genotypes against
the simulation truth.
"""

import numpy as np
import pytest

from hipstr_tpu.pipeline.genotyper import SeqStutterGenotyper
from hipstr_tpu.pipeline.vcf_record import OutputConfig, build_vcf_record
from hipstr_tpu.utils.simulate import simulate_locus


def run_locus(seed, n_samples=4, reads=22, period=3, ref_units=8,
              reassemble=False, haploid=False):
    locus = simulate_locus(seed=seed, n_samples=n_samples,
                           reads_per_sample=reads, period=period,
                           ref_units=ref_units)
    if haploid:
        locus.true_genotypes = [(a, a) for a, _ in locus.true_genotypes]
        # haploid: all reads from allele 1
    g = SeqStutterGenotyper(
        locus.region, haploid, reassemble, locus.alns, locus.log_p1,
        locus.log_p2, locus.sample_names, locus.chrom_seq,
        stutter_model=__import__("hipstr_tpu.models.stutter",
                                 fromlist=["StutterModel"]).StutterModel(
            0.9, 0.05, 0.08, 0.9, 0.01, 0.01, period),
        dtype="float64")
    assert g.initialized
    ok = g.genotype()
    return locus, g, ok


@pytest.mark.parametrize("seed,period,ref_units", [
    (11, 3, 8),
    (22, 2, 10),
    (33, 4, 6),
])
def test_diploid_genotyping_recovers_truth(seed, period, ref_units):
    locus, g, ok = run_locus(seed, period=period, ref_units=ref_units)
    assert ok

    chrom, pos, text, stats = build_vcf_record(
        g, locus.sample_names, OutputConfig())
    fields = text.split("\t")
    assert fields[0] == locus.chrom
    ref_allele = fields[3]
    fmt = fields[8].split(":")
    gb_idx = fmt.index("GB")

    n_correct = 0
    for s, name in enumerate(locus.sample_names):
        sample_field = fields[9 + s]
        if sample_field == ".":
            continue
        gb = sample_field.split(":")[gb_idx]
        called = sorted(int(x) for x in gb.split("|"))
        a1, a2 = locus.true_genotypes[s]
        truth = sorted(((a1 - locus.ref_units) * period,
                        (a2 - locus.ref_units) * period))
        if called == truth:
            n_correct += 1
    assert n_correct >= len(locus.sample_names) - 1, (
        text, locus.true_genotypes)


def test_record_structure():
    locus, g, ok = run_locus(44)
    assert ok
    cfg = OutputConfig(output_gls=True, output_pls=True, output_filters=True)
    chrom, pos, text, stats = build_vcf_record(g, locus.sample_names, cfg)
    fields = text.split("\t")
    assert len(fields) == 9 + len(locus.sample_names)
    info = dict(kv.split("=", 1) for kv in fields[7].split(";") if "=" in kv)
    assert info["PERIOD"] == str(locus.region.period)
    assert int(info["START"]) == locus.region.start + 1
    assert int(info["END"]) == locus.region.stop
    assert int(info["DP"]) > 0
    fmt = fields[8].split(":")
    assert fmt[:4] == ["GT", "GB", "Q", "PQ"]
    assert "GL" in fmt and "PL" in fmt and "FILTER" in fmt
    # every genotyped sample field has the right number of parts
    for s in range(len(locus.sample_names)):
        parts = fields[9 + s].split(":")
        if len(parts) > 1:
            assert len(parts) == len(fmt)


def test_flank_reassembly_path_runs():
    locus, g, ok = run_locus(55, reassemble=True)
    assert ok
    chrom, pos, text, stats = build_vcf_record(
        g, locus.sample_names, OutputConfig())
    fmt = text.split("\t")[8].split(":")
    assert "AB" in fmt and "FS" in fmt and "DAB" in fmt


def test_output_hap_fields():
    """--output-hap-fields: LFLANKS INFO + HQ/PHQ/LFGT FORMAT appear when a
    non-ref flank is assembled (reference: seq_stutter_genotyper.cpp:1008-1041,
    1269-1286, 1485-1499)."""
    from hipstr_tpu.utils.simulate import simulate_locus
    from hipstr_tpu.models.stutter import StutterModel
    from hipstr_tpu.pipeline.genotyper import SeqStutterGenotyper

    locus = simulate_locus(seed=41, n_samples=3, reads_per_sample=30,
                           period=3, ref_units=8, phased_snp_offset=12)
    g = SeqStutterGenotyper(
        locus.region, False, True, locus.alns, locus.log_p1, locus.log_p2,
        locus.sample_names, locus.chrom_seq,
        stutter_model=StutterModel(0.9, 0.05, 0.08, 0.9, 0.01, 0.01, 3),
        dtype="float64")
    assert g.initialized and g.genotype()
    assert g.haplotype.blocks[0].num_options() == 2  # alt left flank found

    cfg = OutputConfig(output_haplotype_data=True)
    chrom, pos, text, stats = build_vcf_record(g, g.sample_names, cfg)
    fields = text.split("\t")
    assert any("LFLANKS=" in f for f in fields)
    fmt_idx = next(i for i, f in enumerate(fields) if f.startswith("GT:"))
    fmt = fields[fmt_idx].split(":")
    for key in ("HQ", "PHQ", "LFGT"):
        assert key in fmt
    # per-sample columns carry matching field counts
    for col in fields[fmt_idx + 1:fmt_idx + 4]:
        if col.strip() != ".":
            assert len(col.strip().split(":")) == len(fmt)

    # without the flag the fields are absent
    chrom, pos, text2, _ = build_vcf_record(g, g.sample_names, OutputConfig())
    assert "LFLANKS" not in text2 and ":HQ" not in text2
