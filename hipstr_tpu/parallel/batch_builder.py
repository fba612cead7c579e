"""Build uniform multi-locus batches for the sharded executor.

Stacks bucket-padded per-locus tensors (pipeline/hap_aligner.prepare_locus)
on a leading locus axis; all loci in one batch share their bucketed statics.
Used by the production executor, the multi-chip dry run, and benchmarks.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import numpy as np

from ..models.base_quality import BaseQuality
from ..ops.posteriors import log_genotype_priors
from ..pipeline.genotyper import calc_seed_base
from ..pipeline.hap_aligner import prepare_locus
from ..utils.simulate import simulate_locus
from .sharding import LocusBatch


def build_batch_from_loci(loci_arrays: List[tuple], statics_list: List[tuple],
                          aux: List[dict]) -> Tuple[LocusBatch, tuple]:
    """Stack per-locus arrays (all with identical statics) into a LocusBatch.

    aux[i] supplies per-locus log_p1/log_p2/read_weights/sample_index/priors
    already padded to the pool bucket.
    """
    st0 = statics_list[0][:5]
    for st in statics_list:
        assert st[:5] == st0, "loci in one batch must share bucketed statics"

    def stack(getter):
        return np.stack([getter(a) for a in loci_arrays])

    l_segs = [a[0] for a in loci_arrays]
    r_segs = [a[1] for a in loci_arrays]
    fw = [a[2] for a in loci_arrays]
    rev = [a[3] for a in loci_arrays]
    seeds = [a[4] for a in loci_arrays]

    def stack_tree(trees):
        return jax.tree.map(lambda *xs: np.stack(xs), *trees)

    batch = LocusBatch(
        l_seg=stack_tree(l_segs),
        r_seg=stack_tree(r_segs),
        fw_meta=stack_tree(fw),
        rev_meta=stack_tree(rev),
        seed=stack_tree(seeds),
        seed_codes=np.stack([a[5] for a in loci_arrays]),
        seed_quals=np.stack([a[6] for a in loci_arrays]),
        log_p1=np.stack([x["log_p1"] for x in aux]),
        log_p2=np.stack([x["log_p2"] for x in aux]),
        read_weights=np.stack([x["read_weights"] for x in aux]),
        sample_index=np.stack([x["sample_index"] for x in aux]),
        priors=np.stack([x["priors"] for x in aux]),
    )
    return batch, st0


def build_demo_batch(n_loci: int, n_samples: int = 3,
                     reads_per_sample: int = 20, period: int = 3,
                     ref_units: int = 8, dtype: str = "float32",
                     base_seed: int = 100):
    """Simulate n_loci identically-shaped loci and build a LocusBatch.

    Treats each read as its own pool (simulated reads rarely collide); the
    genotype-posterior step therefore reduces over the pool axis directly.
    """
    bq = BaseQuality()
    arrays_list, statics_list, aux = [], [], []
    from ..align.hap_generator import HaplotypeGenerator
    from ..align.haplotype import Haplotype

    for g in range(n_loci):
        locus = simulate_locus(seed=base_seed + g, n_samples=n_samples,
                               reads_per_sample=reads_per_sample,
                               period=period, ref_units=ref_units,
                               allele_units=[ref_units, ref_units + 1])
        min_start = min(a.start for a in locus.alns)
        max_stop = max(a.stop for a in locus.alns)
        gen = HaplotypeGenerator(min_start, max_stop)
        by_sample = [[] for _ in range(n_samples)]
        labels = []
        for i, a in enumerate(locus.alns):
            s = locus.sample_names.index(a.name.split("_read")[0])
            labels.append(s)
            by_sample[s].append(a)
        from ..models.stutter import StutterModel
        sm = StutterModel.default(period)
        ok = gen.add_haplotype_block(locus.region, locus.chrom_seq,
                                     by_sample, [], sm)
        assert ok
        gen.fuse_haplotype_blocks(locus.chrom_seq)
        hap = Haplotype(gen.hap_blocks)

        seqs = [a.sequence for a in locus.alns]
        quals = [a.base_qualities for a in locus.alns]
        seeds = [calc_seed_base(a, hap) for a in locus.alns]
        arrays, statics = prepare_locus(hap, seqs, quals, seeds, dtype)
        P_pad = arrays[0].codes.shape[0]
        P_real = statics[5]
        H_real = statics[6]
        H_pad = arrays[2].row_char.shape[0]

        fdt = np.float64 if dtype == "float64" else np.float32
        lp = np.full(P_pad, np.log(0.5), dtype=fdt)
        weights = np.zeros(P_pad, dtype=fdt)
        weights[:P_real] = 1.0
        sample_index = np.zeros(P_pad, dtype=np.int32)
        sample_index[:P_real] = labels
        # bucket-padding haplotypes are duplicates of hap 0: kill them in the
        # prior so padded alleles never win a posterior
        priors = np.full((H_pad, H_pad), -1.0e30, dtype=fdt)
        priors[:H_real, :H_real] = np.asarray(
            log_genotype_priors(np, H_real, haploid=False), dtype=fdt)

        arrays_list.append(arrays)
        statics_list.append(statics)
        aux.append(dict(log_p1=lp, log_p2=lp, read_weights=weights,
                        sample_index=sample_index, priors=priors))

    # loci can land in different buckets; batch the majority shape group and
    # cycle its members to reach n_loci (the production executor groups by
    # shape signature instead)
    import jax as _jax

    def shape_key(i):
        leaves = _jax.tree.leaves(arrays_list[i]) + _jax.tree.leaves(aux[i])
        return (statics_list[i][:5],
                tuple(getattr(x, "shape", ()) for x in leaves))

    groups = {}
    for i in range(len(statics_list)):
        groups.setdefault(shape_key(i), []).append(i)
    best = max(groups.values(), key=len)
    idx = [best[i % len(best)] for i in range(n_loci)]
    arrays_list = [arrays_list[i] for i in idx]
    statics_list = [statics_list[i] for i in idx]
    aux = [aux[i] for i in idx]

    batch, st = build_batch_from_loci(arrays_list, statics_list, aux)
    return batch, st, n_samples
