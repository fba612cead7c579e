"""Chromosome-scale soak: BASELINE config 4 (~10k loci, 20 samples, SNP
phasing on, one process).

Generates the dataset streamingly (constant memory: one locus of reads in
RAM at a time), runs the production batched pipeline in-process, samples
throughput in windows to expose any per-locus slowdown from locus 0 to
locus N, and reports max RSS.  Results go into the BASELINE.md scaling
table (reference scaling story: /root/reference/README.md:167-171 — run
per-chromosome / split BEDs across processes; this single process rides
one TPU chip).

Usage: python tools/soak.py [n_loci] [n_samples] [reads_per_sample] [outdir]
"""
import os
import resource
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_cache = os.path.expanduser("~/.cache/hipstr_tpu_xla")
try:
    os.makedirs(_cache, exist_ok=True)
    import jax as _jax
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

FLANK = 300


def generate(outdir: str, n_loci: int, n_samples: int, reads: int) -> None:
    from hipstr_tpu.io.bam import BamRecord, BamWriter
    from hipstr_tpu.io.fasta import write_fasta
    from hipstr_tpu.utils.simulate import simulate_locus

    def params(i):
        period = 1 + (i % 4)
        ref_units = 8 + (i % 3)
        return period, ref_units

    chroms = [f"chrS{i}" for i in range(n_loci)]
    lens = [2 * FLANK + p * u for p, u in (params(i) for i in range(n_loci))]
    sample_names = [f"S{k}" for k in range(n_samples)]

    hdr = ("@HD\tVN:1.6\tSO:coordinate\n"
           + "".join(f"@SQ\tSN:{c}\tLN:{l}\n" for c, l in zip(chroms, lens))
           + "".join(f"@RG\tID:rg{n}\tSM:{n}\tLB:lib{n}\n"
                     for n in sample_names))
    bam = BamWriter(f"{outdir}/sim.bam", chroms, lens, hdr)

    fasta_contigs = []
    bed = open(f"{outdir}/regions.bed", "w")
    snp_lines = ["##fileformat=VCFv4.1"]
    snp_recs = []

    t0 = time.perf_counter()
    for i in range(n_loci):
        period, ref_units = params(i)
        loc = simulate_locus(seed=70000 + i, n_samples=n_samples,
                             reads_per_sample=reads, period=period,
                             ref_units=ref_units, chrom=chroms[i],
                             phased_snp_offset=20,
                             sample_names=sample_names)
        assert len(loc.chrom_seq) == lens[i]
        fasta_contigs.append((loc.chrom, loc.chrom_seq))
        r = loc.region
        bed.write(f"{r.chrom}\t{r.start + 1}\t{r.stop}\t{r.period}\t8.0\tX\n")
        snp_lines.append(
            f"##contig=<ID={loc.chrom},length={len(loc.chrom_seq)}>")
        gt = "\t".join("0|1" for _ in sample_names)
        snp_recs.append(f"{loc.chrom}\t{loc.snp['pos'] + 1}\t.\t"
                        f"{loc.snp['ref']}\t{loc.snp['alt']}\t.\t.\t.\tGT\t"
                        f"{gt}")
        recs = sorted(loc.raw_reads, key=lambda rd: rd["start"])
        for rd in recs:
            bam.write(BamRecord(
                name=f"{loc.chrom}_{rd['name']}",
                flag=0x10 if rd["rev"] else 0, ref_id=i, pos=rd["start"],
                mapq=60, cigar=[(len(rd["seq"]), "M")], mate_ref_id=-1,
                mate_pos=-1, tlen=0, seq=rd["seq"], qual=rd["quals"],
                tags={"RG": ("Z", f"rg{rd['sample']}")}))
        if (i + 1) % 1000 == 0:
            print(f"  generated {i + 1}/{n_loci} loci "
                  f"({(i + 1) / (time.perf_counter() - t0):.1f} loci/s)",
                  flush=True)
    bam.close()
    bed.close()
    write_fasta(f"{outdir}/sim.fa", fasta_contigs)
    snp_lines.append(
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">')
    snp_lines.append("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                     + "\t".join(sample_names))
    with open(f"{outdir}/snps.vcf", "w") as fh:
        fh.write("\n".join(snp_lines + snp_recs) + "\n")
    print(f"dataset ready in {time.perf_counter() - t0:.0f}s", flush=True)


def run(outdir: str, n_loci: int) -> None:
    from hipstr_tpu.models.stutter import StutterModel
    from hipstr_tpu.parallel.executor import run_batched
    from hipstr_tpu.pipeline.processor import (GenotyperPipeline, Logger,
                                               PipelineOptions)
    opts = PipelineOptions(
        min_reads=15, use_unpaired=True, dtype="float32",
        snp_vcf=f"{outdir}/snps.vcf",
        def_stutter_model=StutterModel(0.95, 0.05, 0.05, 0.95, 0.01,
                                       0.01, 2))
    p = GenotyperPipeline([f"{outdir}/sim.bam"], f"{outdir}/sim.fa", opts,
                          Logger(quiet=True))

    windows = []
    stop = threading.Event()

    def sampler():
        last_n, last_t = 0, time.perf_counter()
        while not stop.wait(20.0):
            n = p.counters.genotype_success
            t = time.perf_counter()
            if n > last_n:
                windows.append((n, (n - last_n) / (t - last_t)))
                print(f"  [{t - t0:6.0f}s] {n:6d} loci done "
                      f"({windows[-1][1]:.2f} loci/s)", flush=True)
            last_n, last_t = n, t

    th = threading.Thread(target=sampler, daemon=True)
    t0 = time.perf_counter()
    th.start()
    counters = run_batched(p, f"{outdir}/regions.bed", f"{outdir}/out.vcf",
                           batch_size=32)
    stop.set()
    th.join()
    dt = time.perf_counter() - t0
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(f"\nsoak: {n_loci} loci in {dt:.0f}s = "
          f"{counters.genotype_success / dt:.2f} loci/s, "
          f"max RSS {rss_mb:.0f} MB", flush=True)
    print(f"success={counters.genotype_success} "
          f"fail={counters.genotype_fail}")
    print("throughput by window (loci done, loci/s):")
    for n, rate in windows:
        print(f"  {n:6d}  {rate:6.2f}")


def main():
    n_loci = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    n_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    reads = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    outdir = sys.argv[4] if len(sys.argv) > 4 else "/tmp/hipstr_soak"
    os.makedirs(outdir, exist_ok=True)
    if not os.path.exists(f"{outdir}/out_of_date") and \
            os.path.exists(f"{outdir}/sim.bam") and \
            os.path.exists(f"{outdir}/regions.bed"):
        print("reusing existing dataset", flush=True)
    else:
        generate(outdir, n_loci, n_samples, reads)
    run(outdir, n_loci)


if __name__ == "__main__":
    main()
