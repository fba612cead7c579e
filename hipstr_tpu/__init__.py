"""hipstr_tpu — a TPU-native STR genotyping engine.

A from-scratch re-design of the capabilities of HipSTR
(reference: tfwillems/HipSTR) for TPU hardware: the numeric cores
(stutter-aware read<->haplotype HMM, diploid genotype posteriors, stutter EM,
de novo likelihood scans) run as batched log-space JAX/XLA kernels over padded
read x haplotype tensors, while sequence/string handling, candidate-allele
discovery, assembly and VCF IO run on host.

Package layout:
  utils/     log-space math, timers, logging
  models/    stutter model, base-quality tables, alignment (indel) model
  ops/       JAX device kernels: HMM forward, posteriors, EM, de novo
  align/     host-side haplotype construction, NW alignment, traceback
  io/        FASTA / BED / BAM / VCF readers and writers
  pipeline/  per-locus genotyping orchestration, region pipeline
  parallel/  device meshes, locus sharding, batched executors
  denovo/    de novo mutation scanning
"""

__version__ = "0.1.0"
