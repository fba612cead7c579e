from .haplotype import HapBlock, RepeatInfo, Haplotype, gray_digits
