"""SNP phasing subsystem tests: SNP sets, read phasing factors, pedigree
checks, haplotype tracking, and the pipeline SNP-VCF path end-to-end."""

import os
import subprocess
import sys

import numpy as np
import pytest

from hipstr_tpu.io.vcf_read import VCFReader
from hipstr_tpu.models.base_quality import BaseQuality
from hipstr_tpu.phasing.pedigree import (NuclearFamily,
                                         extract_pedigree_nuclear_families)
from hipstr_tpu.phasing.snp_phasing import (SNP, SampleSNPs,
                                            extract_bases_and_qualities)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class FakeAln:
    def __init__(self, pos, cigar, bases, quals):
        self.pos = pos
        self.cigar = cigar
        self.bases = bases
        self.quals = quals
        self.end_pos = pos + sum(n for n, op in cigar if op in "M=XD")


def test_sample_snps_query():
    s = SampleSNPs([SNP(10, "A", "C"), SNP(20, "G", "T"), SNP(30, "A", "G")])
    assert [x.pos for x in s.find_contained(10, 20)] == [10, 20]
    assert [x.pos for x in s.find_contained(11, 19)] == []
    assert [x.pos for x in s.find_contained(0, 100)] == [10, 20, 30]


def test_extract_bases_with_indels():
    # read: 5M 2D 3M starting at pos 100; bases ABCDEFGH
    aln = FakeAln(100, [(5, "="), (2, "D"), (3, "=")], "ABCDEFGH", "12345678")
    snps = [SNP(102, "A", "C"), SNP(105, "G", "T"), SNP(108, "A", "G")]
    bases, quals = extract_bases_and_qualities(aln, snps)
    assert bases == ["C", "-", "G"]
    assert quals == ["3", "-", "7"]


def test_mendelian_checks(tmp_path):
    vcf = tmp_path / "snps.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.1\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tMOM\tDAD\tKID\n"
        "chr1\t100\t.\tA\tC\t.\t.\t.\tGT\t0|1\t0|0\t1|0\n"
        "chr1\t200\t.\tG\tT\t.\t.\t.\tGT\t0|0\t0|0\t1|1\n")
    rdr = VCFReader(str(vcf))
    fam = NuclearFamily("F1", "MOM", "DAD", ["KID"])
    variants = list(rdr)
    assert fam.is_mendelian(variants[0])
    assert not fam.is_mendelian(variants[1])


def test_pedigree_extraction(tmp_path):
    fam = tmp_path / "ped.fam"
    fam.write_text("F1\tKID1\tDAD\tMOM\t1\t0\n"
                   "F1\tKID2\tDAD\tMOM\t2\t0\n"
                   "F2\tLONER\t0\t0\t1\t0\n")
    fams = extract_pedigree_nuclear_families(
        str(fam), {"KID1", "KID2", "DAD", "MOM", "LONER"})
    assert len(fams) == 1
    assert fams[0].mother == "MOM" and fams[0].father == "DAD"
    assert fams[0].children == ["KID1", "KID2"]


def test_snp_vcf_pipeline_phases_reads(tmp_path):
    """End-to-end: reads carrying a het flank SNP get phased; PSNP/DSNP
    fields reflect it and genotypes remain correct."""
    from hipstr_tpu.io.bam import BamRecord, BamWriter
    from hipstr_tpu.io.fasta import write_fasta
    from hipstr_tpu.utils.simulate import simulate_locus, write_phased_snp_vcf

    locus = simulate_locus(seed=77, n_samples=3, reads_per_sample=30,
                           period=3, ref_units=8, phased_snp_offset=20)
    out = str(tmp_path)
    write_fasta(f"{out}/sim.fa", [(locus.chrom, locus.chrom_seq)])
    r = locus.region
    with open(f"{out}/regions.bed", "w") as fh:
        fh.write(f"{r.chrom}\t{r.start + 1}\t{r.stop}\t{r.period}\t8.0\tSIM1\n")
    write_phased_snp_vcf(locus, f"{out}/snps.vcf")
    rg = "".join(f"@RG\tID:rg{n}\tSM:{n}\tLB:lib{n}\n"
                 for n in locus.sample_names)
    header = ("@HD\tVN:1.6\tSO:coordinate\n"
              f"@SQ\tSN:{locus.chrom}\tLN:{len(locus.chrom_seq)}\n" + rg)
    writer = BamWriter(f"{out}/sim.bam", [locus.chrom],
                       [len(locus.chrom_seq)], header)
    for rd in sorted(locus.raw_reads, key=lambda d: d["start"]):
        writer.write(BamRecord(
            name=rd["name"], flag=0x10 if rd["rev"] else 0, ref_id=0,
            pos=rd["start"], mapq=60, cigar=[(len(rd["seq"]), "M")],
            mate_ref_id=-1, mate_pos=-1, tlen=0, seq=rd["seq"],
            qual=rd["quals"], tags={"RG": ("Z", f"rg{rd['sample']}")}))
    writer.close()

    env = dict(os.environ, PYTHONPATH=REPO)
    subprocess.run(
        [sys.executable, "-m", "hipstr_tpu.cli", "--bams", f"{out}/sim.bam",
         "--fasta", f"{out}/sim.fa", "--regions", f"{out}/regions.bed",
         "--str-vcf", f"{out}/out.vcf", "--snp-vcf", f"{out}/snps.vcf",
         "--use-unpaired", "--min-reads", "20", "--def-stutter-model",
         "--dtype", "float64", "--silent"], check=True, env=env, cwd=REPO)

    recs = [l for l in open(f"{out}/out.vcf") if not l.startswith("#")]
    assert len(recs) == 1
    fields = recs[0].split("\t")
    info = dict(kv.split("=", 1) for kv in fields[7].split(";") if "=" in kv)
    assert int(info["DSNP"]) > 0, recs[0]
    fmt = fields[8].split(":")
    psnp_idx = fmt.index("PSNP")
    dsnp_idx = fmt.index("DSNP")
    phased_any = False
    for s in range(3):
        parts = fields[9 + s].strip().split(":")
        if len(parts) > 1:
            assert int(parts[dsnp_idx]) > 0
            a, b = parts[psnp_idx].split("|")
            phased_any |= (int(a) > 0 and int(b) > 0)
    assert phased_any


def test_ref_vcf_mode_roundtrip(tmp_path):
    """Genotype de novo, then re-genotype with the emitted VCF as a
    reference panel; genotypes must agree."""
    from tests.test_genotyper_e2e import run_locus  # reuse simulator helpers
    from hipstr_tpu.io.bam import BamRecord, BamWriter
    from hipstr_tpu.io.fasta import write_fasta
    from hipstr_tpu.utils.simulate import simulate_locus

    locus = simulate_locus(seed=91, n_samples=3, reads_per_sample=30,
                           period=3, ref_units=8)
    out = str(tmp_path)
    write_fasta(f"{out}/sim.fa", [(locus.chrom, locus.chrom_seq)])
    r = locus.region
    with open(f"{out}/regions.bed", "w") as fh:
        fh.write(f"{r.chrom}\t{r.start + 1}\t{r.stop}\t{r.period}\t8.0\tSIM1\n")
    rg = "".join(f"@RG\tID:rg{n}\tSM:{n}\tLB:lib{n}\n"
                 for n in locus.sample_names)
    header = ("@HD\tVN:1.6\tSO:coordinate\n"
              f"@SQ\tSN:{locus.chrom}\tLN:{len(locus.chrom_seq)}\n" + rg)
    writer = BamWriter(f"{out}/sim.bam", [locus.chrom],
                       [len(locus.chrom_seq)], header)
    for rd in sorted(locus.raw_reads, key=lambda d: d["start"]):
        writer.write(BamRecord(
            name=rd["name"], flag=0x10 if rd["rev"] else 0, ref_id=0,
            pos=rd["start"], mapq=60, cigar=[(len(rd["seq"]), "M")],
            mate_ref_id=-1, mate_pos=-1, tlen=0, seq=rd["seq"],
            qual=rd["quals"], tags={"RG": ("Z", f"rg{rd['sample']}")}))
    writer.close()

    env = dict(os.environ, PYTHONPATH=REPO)
    base_cmd = [sys.executable, "-m", "hipstr_tpu.cli",
                "--bams", f"{out}/sim.bam", "--fasta", f"{out}/sim.fa",
                "--regions", f"{out}/regions.bed", "--use-unpaired",
                "--min-reads", "20", "--def-stutter-model",
                "--dtype", "float64", "--silent"]
    subprocess.run(base_cmd + ["--str-vcf", f"{out}/pass1.vcf"],
                   check=True, env=env, cwd=REPO)
    subprocess.run(base_cmd + ["--str-vcf", f"{out}/pass2.vcf",
                               "--ref-vcf", f"{out}/pass1.vcf"],
                   check=True, env=env, cwd=REPO)

    def gts(path):
        recs = [l for l in open(path) if not l.startswith("#")]
        assert len(recs) == 1
        fields = recs[0].split("\t")
        return [f.split(":")[0] for f in fields[9:]]

    assert gts(f"{out}/pass1.vcf") == gts(f"{out}/pass2.vcf")


def test_viz_out_and_vizaln(tmp_path):
    """--viz-out writes extractable per-locus HTML."""
    from hipstr_tpu.io.bam import BamRecord, BamWriter
    from hipstr_tpu.io.fasta import write_fasta
    from hipstr_tpu.utils.simulate import simulate_locus
    from hipstr_tpu.pipeline.viz import extract_locus_html

    locus = simulate_locus(seed=13, n_samples=2, reads_per_sample=25,
                           period=2, ref_units=9)
    out = str(tmp_path)
    write_fasta(f"{out}/sim.fa", [(locus.chrom, locus.chrom_seq)])
    r = locus.region
    with open(f"{out}/regions.bed", "w") as fh:
        fh.write(f"{r.chrom}\t{r.start + 1}\t{r.stop}\t{r.period}\t9.0\tSIM1\n")
    rg = "".join(f"@RG\tID:rg{n}\tSM:{n}\tLB:lib{n}\n"
                 for n in locus.sample_names)
    header = ("@HD\tVN:1.6\tSO:coordinate\n"
              f"@SQ\tSN:{locus.chrom}\tLN:{len(locus.chrom_seq)}\n" + rg)
    writer = BamWriter(f"{out}/sim.bam", [locus.chrom],
                       [len(locus.chrom_seq)], header)
    for rd in sorted(locus.raw_reads, key=lambda d: d["start"]):
        writer.write(BamRecord(
            name=rd["name"], flag=0, ref_id=0, pos=rd["start"], mapq=60,
            cigar=[(len(rd["seq"]), "M")], mate_ref_id=-1, mate_pos=-1,
            tlen=0, seq=rd["seq"], qual=rd["quals"],
            tags={"RG": ("Z", f"rg{rd['sample']}")}))
    writer.close()

    env = dict(os.environ, PYTHONPATH=REPO)
    subprocess.run(
        [sys.executable, "-m", "hipstr_tpu.cli", "--bams", f"{out}/sim.bam",
         "--fasta", f"{out}/sim.fa", "--regions", f"{out}/regions.bed",
         "--str-vcf", f"{out}/out.vcf", "--viz-out", f"{out}/viz.gz",
         "--use-unpaired", "--min-reads", "20", "--def-stutter-model",
         "--dtype", "float64", "--silent"], check=True, env=env, cwd=REPO)
    page = extract_locus_html(f"{out}/viz.gz", locus.chrom, r.start + 1)
    assert page is not None
    assert "SAMPLE000" in page and "class=\"str" in page


@pytest.mark.slow
def test_locus_sharding_partitions_work(tmp_path):
    """--locus-shard i/N produces disjoint per-shard VCFs whose union equals
    the unsharded run (the multi-host data-parallel contract)."""
    import subprocess
    out = str(tmp_path)
    subprocess.run([sys.executable, os.path.join(REPO, "tools/make_golden_data.py"),
                    out, "--loci", "4", "--samples", "2", "--reads", "30"],
                   check=True)
    env = dict(os.environ, PYTHONPATH=REPO)
    base = [sys.executable, "-m", "hipstr_tpu.cli", "--bams", f"{out}/sim.bam",
            "--fasta", f"{out}/sim.fa", "--regions", f"{out}/regions.bed",
            "--use-unpaired", "--min-reads", "10", "--def-stutter-model",
            "--dtype", "float64", "--silent"]
    subprocess.run(base + ["--str-vcf", f"{out}/all.vcf"], check=True,
                   env=env, cwd=REPO)
    for i in range(2):
        subprocess.run(base + ["--str-vcf", f"{out}/shard{i}.vcf",
                               "--locus-shard", f"{i}/2"],
                       check=True, env=env, cwd=REPO)

    def recs(p):
        return sorted(l for l in open(p) if not l.startswith("#"))

    merged = sorted(recs(f"{out}/shard0.vcf") + recs(f"{out}/shard1.vcf"))
    assert merged == recs(f"{out}/all.vcf")
    assert recs(f"{out}/shard0.vcf") and recs(f"{out}/shard1.vcf")


def test_phasing_checker_cli(tmp_path):
    """phasing_checker: per-region family SNP edit distances with verdicts
    (reference: src/check_phasing.cpp)."""
    import gzip
    import random

    out = str(tmp_path)
    samples = ["MOM", "DAD", "KID"]
    rng = random.Random(3)
    lines = ["##fileformat=VCFv4.1",
             "##contig=<ID=chr1,length=10000000>",
             '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">',
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
             + "\t".join(samples)]
    pos = 1000
    for _ in range(300):
        pos += rng.randint(100, 2000)
        mom = (rng.randint(0, 1), rng.randint(0, 1))
        dad = (rng.randint(0, 1), rng.randint(0, 1))
        kid = (mom[0], dad[0])   # child inherits mat hap 1 / pat hap 1
        gts = "\t".join(f"{a}|{b}" for a, b in (mom, dad, kid))
        lines.append(f"chr1\t{pos}\t.\tA\tC\t.\t.\t.\tGT\t{gts}")
    with open(f"{out}/snps.vcf", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    with open(f"{out}/trio.fam", "w") as fh:
        fh.write("FAM1\tKID\tDAD\tMOM\t0\t0\n")
    with open(f"{out}/regions.bed", "w") as fh:
        fh.write("chr1\t200000\t200020\t4\t5.0\tX\n")
        fh.write("chr1\t400000\t400020\t4\t5.0\tY\n")

    env = dict(os.environ, PYTHONPATH=REPO)
    subprocess.run([sys.executable, "-m", "hipstr_tpu.phasing_checker",
                    "--fam", f"{out}/trio.fam", "--snp-vcf", f"{out}/snps.vcf",
                    "--regions", f"{out}/regions.bed",
                    "--out", f"{out}/dists.gz"], check=True, env=env,
                   cwd=REPO)
    from hipstr_tpu.io.bgzf import BgzfReader
    text = BgzfReader(f"{out}/dists.gz").read_all().decode()
    rows = text.strip().splitlines()
    assert rows[0].startswith("#CHROM") and "KID" in rows[0]
    assert len(rows) == 3
    # the child follows (mat hap 1, pat hap 1) perfectly -> distance 0
    for row in rows[1:]:
        assert "\t0," in row or ":0" in row or "\t0" in row, row
