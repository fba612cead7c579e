"""hipstr-tpu command line interface.

Capability parity with the reference HipSTR CLI flag surface (reference:
src/hipstr_main.cpp:139-348): BAM/FASTA/BED inputs, stutter model modes,
output shaping, filters, and per-run summary counters.
"""

from __future__ import annotations

import argparse
import sys

from .models.stutter import StutterModel
from .pipeline.processor import GenotyperPipeline, Logger, PipelineOptions
from .pipeline.vcf_record import OutputConfig


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="hipstr-tpu",
        description="TPU-native STR genotyper (HipSTR-compatible)")
    ap.add_argument("--bams", help="Comma separated list of BAM files")
    ap.add_argument("--bam-files", help="File listing BAM files, one per line")
    ap.add_argument("--fasta", required=True)
    ap.add_argument("--regions", required=True, help="BED file of STR regions")
    ap.add_argument("--str-vcf", required=True,
                    help="Output VCF (bgzipped when path ends in .gz)")
    ap.add_argument("--bam-samps", help="Comma separated sample per BAM")
    ap.add_argument("--bam-libs", help="Comma separated library per BAM")
    ap.add_argument("--chrom", default="")
    ap.add_argument("--haploid-chrs", default="")
    ap.add_argument("--min-reads", type=int, default=100)
    ap.add_argument("--max-reads", type=int, default=1000000)
    ap.add_argument("--max-str-len", type=int, default=100)
    ap.add_argument("--max-haps", type=int, default=1000)
    ap.add_argument("--max-hap-flanks", type=int, default=4)
    ap.add_argument("--min-flank-freq", type=float, default=0.01)
    ap.add_argument("--use-unpaired", action="store_true")
    ap.add_argument("--no-rmdup", action="store_true")
    ap.add_argument("--def-stutter-model", action="store_true",
                    help="Use PGEOM=0.9, UP=DOWN=0.05 (in) / 0.01 (out)")
    ap.add_argument("--stutter-in")
    ap.add_argument("--stutter-out")
    ap.add_argument("--output-gls", action="store_true")
    ap.add_argument("--output-pls", action="store_true")
    ap.add_argument("--output-phased-gls", action="store_true")
    ap.add_argument("--output-filters", action="store_true")
    ap.add_argument("--max-flank-indel", type=float, default=0.15)
    ap.add_argument("--max-regions", type=int, default=1000000000)
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--silent", action="store_true")
    ap.add_argument("--log")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "float64"])
    ap.add_argument("--platform", default="",
                    help="Force a JAX platform (e.g. cpu); float64 requires cpu")
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    # Platform/dtype setup must precede any jax usage.  The environment may
    # pin a TPU platform via sitecustomize-level jax.config updates, so a
    # requested platform must also go through jax.config (env vars are
    # already overridden at interpreter start).
    import jax
    platform = args.platform or ("cpu" if args.dtype == "float64" else "")
    if platform:
        jax.config.update("jax_platforms", platform)
    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    if args.bams:
        bam_paths = args.bams.split(",")
    elif args.bam_files:
        with open(args.bam_files) as fh:
            bam_paths = [l.strip() for l in fh if l.strip()]
    else:
        print("ERROR: --bams or --bam-files is required", file=sys.stderr)
        return 1

    cfg = OutputConfig(
        output_gls=args.output_gls, output_pls=args.output_pls,
        output_phased_gls=args.output_phased_gls,
        output_filters=args.output_filters,
        max_flank_indel_frac=args.max_flank_indel)

    def_model = None
    if args.def_stutter_model:
        def_model = StutterModel(0.95, 0.05, 0.05, 0.95, 0.01, 0.01, 2)

    opts = PipelineOptions(
        min_reads=args.min_reads, max_reads=args.max_reads,
        max_str_len=args.max_str_len, use_unpaired=args.use_unpaired,
        remove_pcr_dups=not args.no_rmdup, def_stutter_model=def_model,
        stutter_in=args.stutter_in, stutter_out=args.stutter_out,
        haploid_chroms=tuple(c for c in args.haploid_chrs.split(",") if c),
        max_haps=args.max_haps, max_hap_flanks=args.max_hap_flanks,
        min_flank_freq=args.min_flank_freq, chrom=args.chrom,
        max_regions=args.max_regions, dtype=args.dtype, output=cfg)

    log_stream = open(args.log, "w") if args.log else sys.stderr
    logger = Logger(log_stream, quiet=args.quiet or args.silent)

    bam_samps = args.bam_samps.split(",") if args.bam_samps else None
    bam_libs = args.bam_libs.split(",") if args.bam_libs else None

    pipeline = GenotyperPipeline(bam_paths, args.fasta, opts, logger,
                                 bam_samps, bam_libs)
    counters = pipeline.run(args.regions, args.str_vcf,
                            full_command=" ".join(sys.argv))
    logger.quiet = args.silent
    logger.log(
        f"Summary: success={counters.genotype_success} "
        f"fail={counters.genotype_fail} too_few_reads={counters.too_few_reads} "
        f"too_many_reads={counters.too_many_reads} too_long={counters.too_long} "
        f"em_fail={counters.em_fail} missing_model={counters.missing_model}")
    if args.log:
        log_stream.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
