"""Generate simulated STR data files (FASTA + BAM + BED) for golden
comparisons against the reference binary and for baseline timing.

Usage: python tools/make_golden_data.py OUTDIR [--loci N] [--samples N]
       [--reads N] [--seed N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hipstr_tpu.io.bam import BamRecord, BamWriter
from hipstr_tpu.io.fasta import write_fasta
from hipstr_tpu.utils.simulate import simulate_locus


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--loci", type=int, default=4)
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--reads", type=int, default=40)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--period", type=int, default=3)
    ap.add_argument("--ref-units", type=int, default=8)
    ap.add_argument("--snp-offset", type=int, default=0,
                    help="also simulate a phased het flank SNP this many bp "
                         "left of each STR and write snps.vcf.gz(+.tbi)")
    ap.add_argument("--paired", action="store_true",
                    help="simulate proper mate pairs (mate upstream in the "
                         "left flank) instead of unpaired reads")
    ap.add_argument("--hp-tags", action="store_true",
                    help="tag every read with its haplotype of origin "
                         "(HP:i:1/2, the 10x Genomics convention)")
    ap.add_argument("--realistic", action="store_true",
                    help="real-data artifacts: decaying quality curves, "
                         "quality-driven errors, N bases, soft clips, "
                         "adapter read-through, MAPQ spread, XA "
                         "multimappers, PCR duplicates")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    contigs = []
    bed_lines = []
    all_reads = []  # (chrom_index, start, record-args)
    sample_names = None

    snp_lines = []
    for g in range(args.loci):
        locus = simulate_locus(seed=args.seed + g, n_samples=args.samples,
                               reads_per_sample=args.reads,
                               period=args.period, ref_units=args.ref_units,
                               chrom=f"chrS{g}", paired=args.paired,
                               phased_snp_offset=args.snp_offset or None,
                               realism=args.realistic)
        sample_names = locus.sample_names
        if args.snp_offset:
            snp = locus.snp
            gt = "\t".join("0|1" for _ in locus.sample_names)
            snp_lines.append(f"{locus.chrom}\t{snp['pos'] + 1}\t.\t"
                             f"{snp['ref']}\t{snp['alt']}\t.\t.\t.\tGT\t{gt}")
        contigs.append((locus.chrom, locus.chrom_seq))
        r = locus.region
        bed_lines.append(
            f"{r.chrom}\t{r.start + 1}\t{r.stop}\t{r.period}\t"
            f"{(r.stop - r.start) / r.period:.1f}\t{r.name}")
        for rd in locus.raw_reads:
            all_reads.append((g, locus.chrom, rd))

    fasta_path = os.path.join(args.outdir, "sim.fa")
    write_fasta(fasta_path, contigs)

    with open(os.path.join(args.outdir, "regions.bed"), "w") as fh:
        fh.write("\n".join(bed_lines) + "\n")

    rg_lines = "".join(
        f"@RG\tID:rg{name}\tSM:{name}\tLB:lib{name}\n" for name in sample_names)
    header = ("@HD\tVN:1.6\tSO:coordinate\n"
              + "".join(f"@SQ\tSN:{c}\tLN:{len(s)}\n" for c, s in contigs)
              + rg_lines)

    bam_path = os.path.join(args.outdir, "sim.bam")
    writer = BamWriter(bam_path, [c for c, _ in contigs],
                       [len(s) for _, s in contigs], header)
    all_reads.sort(key=lambda t: (t[0], t[2]["start"]))
    for g, chrom, rd in all_reads:
        flag = rd.get("flag", 0x10 if rd["rev"] else 0)
        tags = {"RG": ("Z", f"rg{rd['sample']}")}
        tags.update(rd.get("tags", {}))
        if args.hp_tags:
            tags["HP"] = ("i", rd["hap"])
        rec = BamRecord(
            name=rd["name"], flag=flag, ref_id=g, pos=rd["start"],
            mapq=rd.get("mapq", 60),
            cigar=rd.get("cigar", [(len(rd["seq"]), "M")]),
            mate_ref_id=g if "mate_pos" in rd else -1,
            mate_pos=rd.get("mate_pos", -1), tlen=rd.get("tlen", 0),
            seq=rd["seq"], qual=rd["quals"], tags=tags)
        writer.write(rec)
    writer.close()
    if args.snp_offset:
        from hipstr_tpu.io.bgzf import BgzfWriter
        from hipstr_tpu.io.tabix import TabixBuilder
        gz = os.path.join(args.outdir, "snps.vcf.gz")
        w = BgzfWriter(gz)
        tbi = TabixBuilder()
        header_lines = (["##fileformat=VCFv4.1"]
                        + [f"##contig=<ID={c},length={len(s)}>"
                           for c, s in contigs]
                        + ['##FORMAT=<ID=GT,Number=1,Type=String,'
                           'Description="Genotype">',
                           "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"
                           "\tFORMAT\t" + "\t".join(sample_names)])
        w.write(("\n".join(header_lines) + "\n").encode())
        for line in snp_lines:
            cols = line.split("\t", 4)
            beg = int(cols[1]) - 1
            v0 = w.virtual_offset
            w.write((line + "\n").encode())
            tbi.add(cols[0], beg, beg + len(cols[3]), v0, w.virtual_offset)
        w.close()
        tbi.write(gz + ".tbi")

    print(f"wrote {fasta_path}, {bam_path}(+.bai), regions.bed; "
          f"{len(all_reads)} reads, {args.loci} loci, {args.samples} samples")


if __name__ == "__main__":
    main()
