from .pedigree import NuclearFamily, extract_pedigree_nuclear_families
from .snp_phasing import SNP, SampleSNPs, create_snp_sets, calc_het_snp_factors
from .haplotype_tracker import HaplotypeTracker
