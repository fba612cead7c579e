"""Multi-device locus-parallel execution.

The reference scales by running independent single-threaded processes over
BED shards (reference: README.md:167-171).  Here the same independence is
expressed as device parallelism: loci are batched into uniform bucketed
shapes and sharded over a (loci, pools) mesh; the genotype-posterior
segment-sum over each locus's reads and the final normalization run under
GSPMD, which inserts the necessary collectives when a locus's pools span
devices.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.hmm import HapMeta, SeedMeta, SegmentInputs, hmm_forward


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A (loci, pools) mesh: loci-data-parallel is the outer axis; the pool
    axis splits a single locus's reads across chips when loci are scarce."""
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devices)
    pools_axis = 2 if n % 2 == 0 and n > 1 else 1
    loci_axis = n // pools_axis
    arr = np.array(devices).reshape(loci_axis, pools_axis)
    return Mesh(arr, axis_names=("loci", "pools"))


class LocusBatch(NamedTuple):
    """G loci with identical bucketed shapes, stacked on a leading axis."""

    l_seg: SegmentInputs       # arrays [G, P, L] / [G, P]
    r_seg: SegmentInputs
    fw_meta: HapMeta           # arrays [G, ...]
    rev_meta: HapMeta
    seed: SeedMeta
    seed_codes: jax.Array      # [G, P] int8
    seed_quals: jax.Array      # [G, P] uint8
    log_p1: jax.Array          # [G, P]
    log_p2: jax.Array
    read_weights: jax.Array    # [G, P]
    sample_index: jax.Array    # [G, P]
    priors: jax.Array          # [G, A, A]


def batched_locus_fn(R_fw: int, R_rev: int, period: int, sr_fw: int,
                     sr_rev: int, num_samples: int, dtype=jnp.float32):
    """Returns fn(batch: LocusBatch) -> (LL [G,P,H], log_post [G,S,A,A]).

    vmaps the single-locus forward over the locus axis and computes genotype
    posteriors; under a sharded jit this is the full multi-chip step.
    """

    def one_locus(b: LocusBatch):
        LL = hmm_forward(b.l_seg, b.r_seg, b.fw_meta, b.rev_meta, b.seed,
                         b.seed_codes, b.seed_quals,
                         R_fw, R_rev, period, sr_fw, sr_rev, dtype)
        # per-pool genotype contributions -> segment-sum over samples
        t1 = jnp.log(0.5).astype(dtype) + b.log_p1[:, None] + LL
        t2 = jnp.log(0.5).astype(dtype) + b.log_p2[:, None] + LL
        a = t1[:, :, None]
        bb = t2[:, None, :]
        m = jnp.maximum(a, bb)
        contrib = b.read_weights[:, None, None] * (
            m + jnp.log1p(jnp.exp(jnp.minimum(a, bb) - m)))
        sums = jax.ops.segment_sum(contrib, b.sample_index,
                                   num_segments=num_samples)
        unnorm = b.priors + sums
        A = unnorm.shape[-1]
        flat = unnorm.reshape(num_samples, A * A)
        mx = jnp.max(flat, axis=1)
        totals = mx + jnp.log(jnp.sum(jnp.exp(flat - mx[:, None]), axis=1))
        return LL, unnorm - totals[:, None, None]

    return jax.vmap(one_locus)


def shard_batch(batch: LocusBatch, mesh: Mesh) -> LocusBatch:
    """Place a LocusBatch on the mesh: locus axis over 'loci', pool axis over
    'pools', haplotype metadata replicated across 'pools'."""

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    def seg(s: SegmentInputs) -> SegmentInputs:
        return SegmentInputs(put(s.codes, P("loci", "pools", None)),
                             put(s.quals, P("loci", "pools", None)),
                             put(s.last_col, P("loci", "pools")))

    def repl(tree):
        return jax.tree.map(lambda x: put(x, P("loci")), tree)

    return LocusBatch(
        l_seg=seg(batch.l_seg), r_seg=seg(batch.r_seg),
        fw_meta=repl(batch.fw_meta), rev_meta=repl(batch.rev_meta),
        seed=repl(batch.seed),
        seed_codes=put(batch.seed_codes, P("loci", "pools")),
        seed_quals=put(batch.seed_quals, P("loci", "pools")),
        log_p1=put(batch.log_p1, P("loci", "pools")),
        log_p2=put(batch.log_p2, P("loci", "pools")),
        read_weights=put(batch.read_weights, P("loci", "pools")),
        sample_index=put(batch.sample_index, P("loci", "pools")),
        priors=put(batch.priors, P("loci")),
    )
