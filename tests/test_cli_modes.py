"""End-to-end CLI mode coverage: haploid chromosomes, stutter model
file roundtrip (--stutter-out / --stutter-in), and 10x HP-tag phasing.

Reference behaviors: haploid handling (reference: src/genotyper.cpp +
src/main.cpp --haploid-chrs), regional stutter files (reference:
src/stutter_model.cpp:81-110, main.cpp --stutter-in/--stutter-out),
10x HP tags (reference: src/snp_bam_processor.cpp:141-204).
"""

import os
import pytest
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_inputs(locus, out, hp_tags=False):
    from hipstr_tpu.io.bam import BamRecord, BamWriter
    from hipstr_tpu.io.fasta import write_fasta

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
        tags = {"RG": ("Z", f"rg{rd['sample']}")}
        if hp_tags:
            tags["HP"] = ("i", rd["hap"])
        writer.write(BamRecord(
            name=rd["name"], flag=0x10 if rd["rev"] else 0, ref_id=0,
            pos=rd["start"], mapq=60, cigar=[(len(rd["seq"]), "M")],
            mate_ref_id=-1, mate_pos=-1, tlen=0, seq=rd["seq"],
            qual=rd["quals"], tags=tags))
    writer.close()


def _run_cli(out, extra):
    env = dict(os.environ, PYTHONPATH=REPO)
    cmd = [sys.executable, "-m", "hipstr_tpu.cli",
           "--bams", f"{out}/sim.bam", "--fasta", f"{out}/sim.fa",
           "--regions", f"{out}/regions.bed", "--use-unpaired",
           "--min-reads", "20", "--dtype", "float64", "--silent"] + extra
    subprocess.run(cmd, check=True, env=env, cwd=REPO)


def _records(path):
    return [l for l in open(path) if not l.startswith("#")]


def test_haploid_chroms_e2e(tmp_path):
    """--haploid-chrs emits single-allele GT/GB and recovers the truth."""
    from hipstr_tpu.utils.simulate import simulate_locus

    locus = simulate_locus(seed=123, n_samples=3, reads_per_sample=30,
                           period=3, ref_units=8, haploid=True)
    out = str(tmp_path)
    _write_inputs(locus, out)
    _run_cli(out, ["--str-vcf", f"{out}/out.vcf", "--def-stutter-model",
                   "--haploid-chrs", locus.chrom])

    recs = _records(f"{out}/out.vcf")
    assert len(recs) == 1
    fields = recs[0].rstrip("\n").split("\t")
    fmt = fields[8].split(":")
    gt_idx, gb_idx = fmt.index("GT"), fmt.index("GB")
    for s in range(3):
        parts = fields[9 + s].split(":")
        if len(parts) == 1:   # uncalled sample
            continue
        assert "|" not in parts[gt_idx] and "/" not in parts[gt_idx]
        assert "|" not in parts[gb_idx]
        true_bp = (locus.true_genotypes[s][0] - locus.ref_units) * locus.region.period
        assert int(parts[gb_idx]) == true_bp, (s, parts[gb_idx], true_bp)


def test_stutter_out_in_roundtrip(tmp_path):
    """--stutter-out learns per-locus models; --stutter-in reuses them
    (skipping EM) and reproduces the same genotypes and INFO stutter
    parameters."""
    from hipstr_tpu.utils.simulate import simulate_locus

    locus = simulate_locus(seed=207, n_samples=4, reads_per_sample=30,
                           period=3, ref_units=8)
    out = str(tmp_path)
    _write_inputs(locus, out)
    _run_cli(out, ["--str-vcf", f"{out}/pass1.vcf",
                   "--stutter-out", f"{out}/models.txt"])

    # model file parses and matches this locus's coordinates
    from hipstr_tpu.models.stutter import read_stutter_models
    with open(f"{out}/models.txt") as fh:
        models = read_stutter_models(fh)
    assert len(models) == 1
    (chrom, start, end), model = next(iter(models.items()))
    assert chrom == locus.chrom
    assert model.period == locus.region.period

    _run_cli(out, ["--str-vcf", f"{out}/pass2.vcf",
                   "--stutter-in", f"{out}/models.txt"])

    def gts_and_stutter(path):
        recs = _records(path)
        assert len(recs) == 1
        fields = recs[0].rstrip("\n").split("\t")
        info = dict(kv.split("=", 1) for kv in fields[7].split(";") if "=" in kv)
        gts = [f.split(":")[0] for f in fields[9:]]
        return gts, (info["INFRAME_PGEOM"], info["INFRAME_UP"],
                     info["INFRAME_DOWN"], info["OUTFRAME_PGEOM"],
                     info["OUTFRAME_UP"], info["OUTFRAME_DOWN"])

    gts1, st1 = gts_and_stutter(f"{out}/pass1.vcf")
    gts2, st2 = gts_and_stutter(f"{out}/pass2.vcf")
    assert gts1 == gts2
    assert st1 == st2


def test_skip_genotyping_pass_filt_bams(tmp_path):
    """--skip-genotyping learns stutter models without a VCF; --pass-bam /
    --filt-bam capture used reads (PF tag) and filtered reads (FT tag)."""
    from hipstr_tpu.utils.simulate import simulate_locus
    from hipstr_tpu.io.bam import BamReader
    from hipstr_tpu.models.stutter import read_stutter_models

    locus = simulate_locus(seed=5, n_samples=3, reads_per_sample=30,
                           period=3, ref_units=8)
    out = str(tmp_path)
    _write_inputs(locus, out)
    _run_cli(out, ["--skip-genotyping", "--stutter-out", f"{out}/models.txt",
                   "--pass-bam", f"{out}/pass.bam",
                   "--filt-bam", f"{out}/filt.bam"])

    with open(f"{out}/models.txt") as fh:
        assert len(read_stutter_models(fh)) == 1
    n = pf = 0
    for rec in BamReader(f"{out}/pass.bam"):
        n += 1
        pf += "PF" in rec.tags
    assert n > 0 and pf == n


def test_sample_list_and_hide_allreads(tmp_path):
    """--sample-list restricts genotyped samples; --hide-allreads /
    --hide-mallreads drop those FORMAT fields."""
    from hipstr_tpu.utils.simulate import simulate_locus

    locus = simulate_locus(seed=19, n_samples=4, reads_per_sample=30,
                           period=3, ref_units=8)
    out = str(tmp_path)
    _write_inputs(locus, out)
    keep = locus.sample_names[:2]
    _run_cli(out, ["--str-vcf", f"{out}/out.vcf", "--def-stutter-model",
                   "--min-reads", "10",
                   "--sample-list", ",".join(keep),
                   "--hide-allreads", "--hide-mallreads"])

    recs = _records(f"{out}/out.vcf")
    assert len(recs) == 1
    fields = recs[0].rstrip("\n").split("\t")
    fmt = fields[8].split(":")
    assert "ALLREADS" not in fmt and "MALLREADS" not in fmt
    # samples outside the list have no reads -> uncalled ('.')
    for s, name in enumerate(locus.sample_names):
        call = fields[9 + s].split(":")[0]
        if name in keep:
            assert call != ".", (name, call)
        else:
            assert call == ".", (name, call)


@pytest.mark.slow
def test_batch_loci_identical_output(tmp_path):
    """--batch-loci (multi-locus batched executor with deferred device
    fetches) produces byte-identical records to the sequential path."""
    from hipstr_tpu.utils.simulate import simulate_locus
    from hipstr_tpu.io.bam import BamRecord, BamWriter
    from hipstr_tpu.io.fasta import write_fasta

    out = str(tmp_path)
    locs = [simulate_locus(seed=900 + i, n_samples=3, reads_per_sample=25,
                           period=3, ref_units=8, chrom=f"chrB{i}")
            for i in range(6)]
    write_fasta(f"{out}/sim.fa", [(l.chrom, l.chrom_seq) for l in locs])
    with open(f"{out}/regions.bed", "w") as fh:
        for l in locs:
            r = l.region
            fh.write(f"{r.chrom}\t{r.start + 1}\t{r.stop}\t{r.period}\t8.0\tX\n")
    rg = "".join(f"@RG\tID:rg{n}\tSM:{n}\tLB:lib{n}\n"
                 for n in locs[0].sample_names)
    hdr = ("@HD\tVN:1.6\tSO:coordinate\n"
           + "".join(f"@SQ\tSN:{l.chrom}\tLN:{len(l.chrom_seq)}\n"
                     for l in locs) + rg)
    w = BamWriter(f"{out}/sim.bam", [l.chrom for l in locs],
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

    _run_cli(out, ["--str-vcf", f"{out}/seq.vcf", "--def-stutter-model"])
    _run_cli(out, ["--str-vcf", f"{out}/bat.vcf", "--def-stutter-model",
                   "--batch-loci", "4"])
    a = _records(f"{out}/seq.vcf")
    b = _records(f"{out}/bat.vcf")
    assert len(a) == 6 and a == b


def test_10x_hp_tags_phase_reads(tmp_path):
    """--10x-bams uses HP tags for read phasing: genotypes remain correct
    and at least one het sample reports a phased-quality boost
    (PQ present, haplotype order fixed by the tags)."""
    from hipstr_tpu.utils.simulate import simulate_locus

    locus = simulate_locus(seed=311, n_samples=3, reads_per_sample=30,
                           period=3, ref_units=8)
    out = str(tmp_path)
    _write_inputs(locus, out, hp_tags=True)
    _run_cli(out, ["--str-vcf", f"{out}/out.vcf", "--def-stutter-model",
                   "--10x-bams"])

    recs = _records(f"{out}/out.vcf")
    assert len(recs) == 1
    fields = recs[0].rstrip("\n").split("\t")
    fmt = fields[8].split(":")
    gb_idx, pq_idx = fmt.index("GB"), fmt.index("PQ")
    period = locus.region.period
    phased_het = False
    for s in range(3):
        parts = fields[9 + s].split(":")
        if len(parts) == 1:
            continue
        a1, a2 = locus.true_genotypes[s]
        got = sorted(int(x) for x in parts[gb_idx].split("|"))
        want = sorted(((a1 - locus.ref_units) * period,
                       (a2 - locus.ref_units) * period))
        assert got == want, (s, got, want)
        if a1 != a2 and float(parts[pq_idx]) > 0.9:
            phased_het = True
    assert phased_het


@pytest.mark.slow
def test_batched_mesh_sharded_identical():
    """With multiple devices, the batched executor shards the locus axis
    over a GSPMD mesh; outputs must stay byte-identical to sequential.
    Runs in-process on the 8-device CPU mesh from conftest."""
    import tempfile
    import jax
    from hipstr_tpu.utils.simulate import simulate_locus
    from hipstr_tpu.io.bam import BamRecord, BamWriter
    from hipstr_tpu.io.fasta import write_fasta
    from hipstr_tpu.pipeline.processor import (GenotyperPipeline, Logger,
                                               PipelineOptions)
    from hipstr_tpu.models.stutter import StutterModel
    from hipstr_tpu.parallel.executor import run_batched

    assert len(jax.devices()) == 8
    tmp = tempfile.mkdtemp()
    locs = [simulate_locus(seed=900 + i, n_samples=3, reads_per_sample=25,
                           period=3, ref_units=8, chrom=f"chrB{i}")
            for i in range(8)]
    write_fasta(f"{tmp}/sim.fa", [(l.chrom, l.chrom_seq) for l in locs])
    with open(f"{tmp}/regions.bed", "w") as fh:
        for l in locs:
            r = l.region
            fh.write(f"{r.chrom}\t{r.start + 1}\t{r.stop}\t{r.period}\t8.0\tX\n")
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

    def mk():
        opts = PipelineOptions(
            min_reads=15, use_unpaired=True, dtype="float64",
            def_stutter_model=StutterModel(0.95, 0.05, 0.05, 0.95, 0.01,
                                           0.01, 2))
        return GenotyperPipeline([f"{tmp}/sim.bam"], f"{tmp}/sim.fa", opts,
                                 Logger(quiet=True))

    mk().run(f"{tmp}/regions.bed", f"{tmp}/seq.vcf")
    run_batched(mk(), f"{tmp}/regions.bed", f"{tmp}/bat.vcf", batch_size=8)
    a = [l for l in open(f"{tmp}/seq.vcf") if not l.startswith("#")]
    b = [l for l in open(f"{tmp}/bat.vcf") if not l.startswith("#")]
    assert len(a) == 8 and a == b


def test_batch_loci_viz_out(tmp_path):
    """--batch-loci honours --viz-out (extractable per-locus HTML)."""
    from hipstr_tpu.utils.simulate import simulate_locus
    from hipstr_tpu.pipeline.viz import extract_locus_html

    locus = simulate_locus(seed=311, n_samples=3, reads_per_sample=30,
                           period=3, ref_units=8)
    out = str(tmp_path)
    _write_inputs(locus, out)
    _run_cli(out, ["--str-vcf", f"{out}/out.vcf", "--def-stutter-model",
                   "--batch-loci", "4", "--viz-out", f"{out}/viz.gz"])
    html = extract_locus_html(f"{out}/viz.gz", locus.chrom,
                              locus.region.start + 1)
    assert html is not None and "SAMPLE000" in html


@pytest.mark.slow
def test_workers_merge_identical(tmp_path):
    """--workers N shards loci across processes and merges; output equals a
    single-process run."""
    from hipstr_tpu.utils.simulate import simulate_locus
    from hipstr_tpu.io.bam import BamRecord, BamWriter
    from hipstr_tpu.io.fasta import write_fasta

    out = str(tmp_path)
    locs = [simulate_locus(seed=900 + i, n_samples=3, reads_per_sample=25,
                           period=3, ref_units=8, chrom=f"chrB{i}")
            for i in range(6)]
    write_fasta(f"{out}/sim.fa", [(l.chrom, l.chrom_seq) for l in locs])
    with open(f"{out}/regions.bed", "w") as fh:
        for l in locs:
            r = l.region
            fh.write(f"{r.chrom}\t{r.start + 1}\t{r.stop}\t{r.period}\t8.0\tX\n")
    hdr = ("@HD\tVN:1.6\tSO:coordinate\n"
           + "".join(f"@SQ\tSN:{l.chrom}\tLN:{len(l.chrom_seq)}\n"
                     for l in locs)
           + "".join(f"@RG\tID:rg{n}\tSM:{n}\tLB:lib{n}\n"
                     for n in locs[0].sample_names))
    w = BamWriter(f"{out}/sim.bam", [l.chrom for l in locs],
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

    _run_cli(out, ["--str-vcf", f"{out}/one.vcf", "--def-stutter-model"])
    _run_cli(out, ["--str-vcf", f"{out}/two.vcf", "--def-stutter-model",
                   "--workers", "2"])
    a = _records(f"{out}/one.vcf")
    b = _records(f"{out}/two.vcf")
    assert len(a) == 6 and a == b


def test_unspannable_locus_skipped(tmp_path):
    """A repeat longer than the read length leaves no hap-gen-eligible
    spanning read; the locus must be skipped like the reference does
    (reference: HaplotypeGenerator.cpp:297-307 'No spanning alignments')."""
    from hipstr_tpu.utils.simulate import simulate_locus

    locus = simulate_locus(seed=5011, n_samples=3, reads_per_sample=25,
                           period=6, ref_units=12, read_len=70)
    out = str(tmp_path)
    _write_inputs(locus, out)
    _run_cli(out, ["--str-vcf", f"{out}/out.vcf", "--def-stutter-model",
                   "--min-reads", "15"])
    assert _records(f"{out}/out.vcf") == []


def test_bam_samps_without_read_groups(tmp_path):
    """--bam-samps/--bam-libs assign samples per BAM when RG tags are absent
    (reference: hipstr_main.cpp:418-445)."""
    from hipstr_tpu.utils.simulate import simulate_locus
    from hipstr_tpu.io.bam import BamRecord, BamWriter
    from hipstr_tpu.io.fasta import write_fasta

    locus = simulate_locus(seed=99, n_samples=1, reads_per_sample=30,
                           period=3, ref_units=8)
    out = str(tmp_path)
    write_fasta(f"{out}/sim.fa", [(locus.chrom, locus.chrom_seq)])
    r = locus.region
    with open(f"{out}/regions.bed", "w") as fh:
        fh.write(f"{r.chrom}\t{r.start + 1}\t{r.stop}\t{r.period}\t8.0\tX\n")
    hdr = ("@HD\tVN:1.6\tSO:coordinate\n"
           f"@SQ\tSN:{locus.chrom}\tLN:{len(locus.chrom_seq)}\n")
    w = BamWriter(f"{out}/norg.bam", [locus.chrom], [len(locus.chrom_seq)],
                  hdr)
    for rd in sorted(locus.raw_reads, key=lambda d: d["start"]):
        w.write(BamRecord(name=rd["name"], flag=0x10 if rd["rev"] else 0,
                          ref_id=0, pos=rd["start"], mapq=60,
                          cigar=[(len(rd["seq"]), "M")], mate_ref_id=-1,
                          mate_pos=-1, tlen=0, seq=rd["seq"],
                          qual=rd["quals"], tags={}))
    w.close()

    env = dict(os.environ, PYTHONPATH=REPO)
    subprocess.run([sys.executable, "-m", "hipstr_tpu.cli",
                    "--bams", f"{out}/norg.bam", "--fasta", f"{out}/sim.fa",
                    "--regions", f"{out}/regions.bed",
                    "--str-vcf", f"{out}/out.vcf",
                    "--bam-samps", "SAMPLEX", "--bam-libs", "LIBX",
                    "--use-unpaired", "--min-reads", "15",
                    "--def-stutter-model", "--dtype", "float64", "--silent"],
                   check=True, env=env, cwd=REPO)
    recs = _records(f"{out}/out.vcf")
    assert len(recs) == 1
    header = [l for l in open(f"{out}/out.vcf") if l.startswith("#CHROM")][0]
    assert header.rstrip().split("\t")[-1] == "SAMPLEX"


@pytest.mark.slow
def test_workers_merge_bgzip_with_tabix(tmp_path):
    """--workers merging into a .gz target produces bgzip + .tbi."""
    from hipstr_tpu.utils.simulate import simulate_locus
    from hipstr_tpu.io.bam import BamRecord, BamWriter
    from hipstr_tpu.io.fasta import write_fasta

    out = str(tmp_path)
    locs = [simulate_locus(seed=900 + i, n_samples=3, reads_per_sample=25,
                           period=3, ref_units=8, chrom=f"chrB{i}")
            for i in range(4)]
    write_fasta(f"{out}/sim.fa", [(l.chrom, l.chrom_seq) for l in locs])
    with open(f"{out}/regions.bed", "w") as fh:
        for l in locs:
            r = l.region
            fh.write(f"{r.chrom}\t{r.start + 1}\t{r.stop}\t{r.period}\t8.0\tX\n")
    hdr = ("@HD\tVN:1.6\tSO:coordinate\n"
           + "".join(f"@SQ\tSN:{l.chrom}\tLN:{len(l.chrom_seq)}\n"
                     for l in locs)
           + "".join(f"@RG\tID:rg{n}\tSM:{n}\tLB:lib{n}\n"
                     for n in locs[0].sample_names))
    w = BamWriter(f"{out}/sim.bam", [l.chrom for l in locs],
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

    _run_cli(out, ["--str-vcf", f"{out}/m.vcf.gz", "--def-stutter-model",
                   "--workers", "2"])
    from hipstr_tpu.io.bgzf import BgzfReader
    from hipstr_tpu.io.vcf_read import VCFReader
    text = BgzfReader(f"{out}/m.vcf.gz").read_all().decode()
    vrecs = [l for l in text.splitlines() if l and not l.startswith("#")]
    assert len(vrecs) == 4
    assert os.path.exists(f"{out}/m.vcf.gz.tbi")
    rd = VCFReader(f"{out}/m.vcf.gz")
    assert rd._tbi is not None
    l0 = locs[0]
    hits = list(rd.query(l0.chrom, l0.region.start - 5, l0.region.stop + 5))
    assert len(hits) == 1
    # no shard temporaries left behind
    assert not [f for f in os.listdir(out) if ".shard" in f]


def _write_paired_inputs(locus, out):
    from hipstr_tpu.io.bam import BamRecord, BamWriter
    from hipstr_tpu.io.fasta import write_fasta

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
            name=rd["name"],
            flag=rd.get("flag", 0x10 if rd["rev"] else 0), ref_id=0,
            pos=rd["start"], mapq=60, cigar=[(len(rd["seq"]), "M")],
            mate_ref_id=0 if "mate_pos" in rd else -1,
            mate_pos=rd.get("mate_pos", -1), tlen=rd.get("tlen", 0),
            seq=rd["seq"], qual=rd["quals"],
            tags={"RG": ("Z", f"rg{rd['sample']}")}))
    writer.close()


def test_paired_end_pipeline(tmp_path):
    """Proper mate pairs genotype WITHOUT --use-unpaired: the mate-pairing
    filter path (get_valid_pairings) accepts them and genotypes match the
    simulated truth (reference: bam_processor.cpp:97-152, 240-425)."""
    from hipstr_tpu.utils.simulate import simulate_locus

    locus = simulate_locus(seed=404, n_samples=3, reads_per_sample=30,
                           period=3, ref_units=8, paired=True)
    n_paired = sum(1 for rd in locus.raw_reads if "mate_pos" in rd)
    assert n_paired >= 100   # most fragments became proper pairs
    out = str(tmp_path)
    _write_paired_inputs(locus, out)

    env = dict(os.environ, PYTHONPATH=REPO)
    subprocess.run([sys.executable, "-m", "hipstr_tpu.cli",
                    "--bams", f"{out}/sim.bam", "--fasta", f"{out}/sim.fa",
                    "--regions", f"{out}/regions.bed",
                    "--str-vcf", f"{out}/out.vcf", "--min-reads", "15",
                    "--def-stutter-model", "--dtype", "float64", "--silent"],
                   check=True, env=env, cwd=REPO)
    recs = _records(f"{out}/out.vcf")
    assert len(recs) == 1
    fields = recs[0].rstrip("\n").split("\t")
    fmt = fields[8].split(":")
    gb_idx = fmt.index("GB")
    period = locus.region.period
    correct = called = 0
    for s in range(3):
        parts = fields[9 + s].split(":")
        if len(parts) == 1:
            continue
        called += 1
        a1, a2 = locus.true_genotypes[s]
        want = sorted(((a1 - locus.ref_units) * period,
                       (a2 - locus.ref_units) * period))
        got = sorted(int(x) for x in parts[gb_idx].split("|"))
        correct += (got == want)
    assert called == 3 and correct == 3


@pytest.mark.slow
def test_profile_flag_writes_trace(tmp_path):
    """--profile captures a jax.profiler trace directory and leaves the
    VCF identical (aux subsystem: tracing/profiling, SURVEY §5)."""
    from hipstr_tpu.utils.simulate import simulate_locus
    locus = simulate_locus(seed=321, n_samples=3, reads_per_sample=25,
                           period=3, ref_units=8)
    out = str(tmp_path)
    _write_inputs(locus, out)
    env = dict(os.environ, PYTHONPATH=REPO)
    common = ["--bams", f"{out}/sim.bam", "--fasta", f"{out}/sim.fa",
              "--regions", f"{out}/regions.bed", "--min-reads", "15",
              "--use-unpaired", "--def-stutter-model", "--dtype",
              "float64", "--silent"]
    subprocess.run([sys.executable, "-m", "hipstr_tpu.cli",
                    "--str-vcf", f"{out}/plain.vcf"] + common,
                   check=True, env=env, cwd=REPO)
    subprocess.run([sys.executable, "-m", "hipstr_tpu.cli",
                    "--str-vcf", f"{out}/prof.vcf",
                    "--profile", f"{out}/trace"] + common,
                   check=True, env=env, cwd=REPO)
    assert _records(f"{out}/plain.vcf") == _records(f"{out}/prof.vcf")
    found = []
    for root, _dirs, files in os.walk(f"{out}/trace"):
        found.extend(files)
    assert found, "profiler trace directory is empty"
