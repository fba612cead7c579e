"""Tabix index write/read + streaming VCF queries."""

import os
import random
import subprocess

import pytest


def _write_test_vcf(path):
    from hipstr_tpu.io.vcf_write import VCFWriter
    header = ("##fileformat=VCFv4.1\n"
              "##contig=<ID=chr1,length=100000000>\n"
              "##contig=<ID=chr2,length=100000000>\n"
              '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n'
              "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n")
    rng = random.Random(0)
    recs = []
    for chrom in ("chr1", "chr2"):
        pos = 0
        for _ in range(2000):
            pos += rng.randint(50, 60000)
            recs.append((chrom, pos,
                         f"{chrom}\t{pos}\t.\tA\tC\t.\t.\t.\tGT\t0|1"))
    w = VCFWriter(path, header)
    for chrom, pos, text in recs:
        w.add_vcf_record(chrom, pos, text)
    w.close()
    return recs


WINDOWS = ((0, 10**9), (1000000, 2000000), (55_000_000, 58_000_000),
           (110_000_000, 10**9))


def test_tabix_streaming_query_matches_memory(tmp_path):
    from hipstr_tpu.io.vcf_read import VCFReader

    path = str(tmp_path / "t.vcf.gz")
    _write_test_vcf(path)
    assert os.path.exists(path + ".tbi")

    streaming = VCFReader(path)
    assert streaming._tbi is not None
    os.rename(path + ".tbi", path + ".tbi.bak")
    memory = VCFReader(path)
    assert memory._tbi is None
    os.rename(path + ".tbi.bak", path + ".tbi")

    def q(rd, chrom, a, b):
        return [(v.chrom, v.pos, v.alleles[0]) for v in rd.query(chrom, a, b)]

    for chrom in ("chr1", "chr2"):
        for a, b in WINDOWS:
            assert q(streaming, chrom, a, b) == q(memory, chrom, a, b)
    assert sum(1 for _ in streaming) == sum(1 for _ in memory) == 4000
    assert streaming.samples == ["S1"]


def test_tabix_interop_with_htslib(tmp_path):
    """Cross-validation: htslib-written .tbi readable by us, and vice versa."""
    tbxgen = "/tmp/cramgen/tbxgen"
    tbxq = "/tmp/cramgen/tbxq"
    if not (os.path.exists(tbxgen) and os.path.exists(tbxq)):
        pytest.skip("htslib tabix tools not built")
    from hipstr_tpu.io.vcf_read import VCFReader

    path = str(tmp_path / "t.vcf.gz")
    _write_test_vcf(path)
    ours = VCFReader(path)
    n_ours = len(list(ours.query("chr1", 1000000, 2000000)))

    # htslib queries our index
    out = subprocess.run([tbxq, path, "chr1:1000001-2000000"],
                         capture_output=True, text=True, check=True)
    assert int(out.stdout.strip()) == n_ours

    # we query htslib's index
    os.remove(path + ".tbi")
    subprocess.run([tbxgen, path], check=True)
    theirs = VCFReader(path)
    assert theirs._tbi is not None
    assert len(list(theirs.query("chr1", 1000000, 2000000))) == n_ours


def test_snp_vcf_streaming_pipeline(tmp_path):
    """--snp-vcf given as bgzipped VCF + .tbi goes through the tabix
    streaming reader and still phases reads end to end."""
    import subprocess
    import sys
    from hipstr_tpu.utils.simulate import simulate_locus, write_phased_snp_vcf
    from hipstr_tpu.io.bgzf import BgzfWriter
    from hipstr_tpu.io.tabix import TabixBuilder
    from tests.test_cli_modes import _write_inputs, REPO

    locus = simulate_locus(seed=77, n_samples=3, reads_per_sample=30,
                           period=3, ref_units=8, phased_snp_offset=20)
    out = str(tmp_path)
    _write_inputs(locus, out)
    write_phased_snp_vcf(locus, f"{out}/snps.vcf")

    # bgzip + tabix the SNP VCF
    gz = f"{out}/snps.vcf.gz"
    w = BgzfWriter(gz)
    tbi = TabixBuilder()
    for line in open(f"{out}/snps.vcf"):
        if line.startswith("#"):
            w.write(line.encode())
            continue
        cols = line.split("\t", 4)
        beg = int(cols[1]) - 1
        v0 = w.virtual_offset
        w.write(line.encode())
        tbi.add(cols[0], beg, beg + len(cols[3]), v0, w.virtual_offset)
    w.close()
    tbi.write(gz + ".tbi")

    from hipstr_tpu.io.vcf_read import VCFReader
    assert VCFReader(gz)._tbi is not None   # streaming mode engages

    env = dict(os.environ, PYTHONPATH=REPO)
    subprocess.run(
        [sys.executable, "-m", "hipstr_tpu.cli", "--bams", f"{out}/sim.bam",
         "--fasta", f"{out}/sim.fa", "--regions", f"{out}/regions.bed",
         "--str-vcf", f"{out}/out.vcf", "--snp-vcf", gz,
         "--use-unpaired", "--min-reads", "20", "--def-stutter-model",
         "--dtype", "float64", "--silent"], check=True, env=env, cwd=REPO)
    recs = [l for l in open(f"{out}/out.vcf") if not l.startswith("#")]
    assert len(recs) == 1
    info = dict(kv.split("=", 1) for kv in recs[0].split("\t")[7].split(";")
                if "=" in kv)
    assert int(info["DSNP"]) > 0
