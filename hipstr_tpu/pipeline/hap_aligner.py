"""Device-batched haplotype alignment driver.

Equivalent of the reference HapAligner::process_reads
(src/SeqAlignment/HapAligner.cpp:320-343) with TPU batching: packs one
locus's haplotypes + read pools into dense tensors and evaluates all
[pool x haplotype] log-likelihoods in a single jitted device call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..align.haplotype import Haplotype
from ..align.packing import PackedHaplotypes, pack_haplotypes, pack_reads
from ..ops.hmm import HapMeta, SeedMeta, SegmentInputs, hmm_forward


@functools.lru_cache(maxsize=64)
def _jitted(R: int, period: int, sr_fw: int, sr_rev: int, dtype_name: str):
    dtype = jnp.dtype(dtype_name)

    @jax.jit
    def run(l_seg, r_seg, fw_meta, rev_meta, seed, seed_codes, seed_blw, seed_blc):
        return hmm_forward(l_seg, r_seg, fw_meta, rev_meta, seed,
                           seed_codes, seed_blw, seed_blc, R, period,
                           sr_fw, sr_rev, dtype)

    return run


def _to_meta(d: dict) -> HapMeta:
    return HapMeta(
        row_char=jnp.asarray(d["row_char"]),
        row_m2m=jnp.asarray(d["row_m2m"]),
        row_m2i=jnp.asarray(d["row_m2i"]),
        row_m2d=jnp.asarray(d["row_m2d"]),
        rep_rev_codes=jnp.asarray(d["rep_rev_codes"]),
        rep_len=jnp.asarray(d["rep_len"]),
        lpmf=jnp.asarray(d["lpmf"]),
        hap_opt=jnp.asarray(d["hap_opt"]),
        entry_idx=jnp.asarray(d["entry_idx"]),
        entry_ok=jnp.asarray(d["entry_ok"]),
    )


def compute_hap_log_likelihoods(haplotype: Haplotype, seqs, quals, seeds,
                                L: int | None = None,
                                dtype: str = "float32") -> np.ndarray:
    """LL[pool, hap] for every read pool against every haplotype combination."""
    if L is None:
        L = max(2, max(len(s) for s in seqs) - 1)
    packed = pack_haplotypes(haplotype, L)
    reads = pack_reads(seqs, quals, seeds, L)

    l_seg = SegmentInputs(jnp.asarray(reads.l_codes), jnp.asarray(reads.l_blw),
                          jnp.asarray(reads.l_blc), jnp.asarray(reads.l_last))
    r_seg = SegmentInputs(jnp.asarray(reads.r_codes), jnp.asarray(reads.r_blw),
                          jnp.asarray(reads.r_blc), jnp.asarray(reads.r_last))
    fw_meta = _to_meta(packed.fw)
    rev_meta = _to_meta(packed.rev)
    sd = packed.seed
    seed_meta = SeedMeta(
        seed_fw_row=jnp.asarray(sd["seed_fw_row"]),
        seed_rev_row=jnp.asarray(sd["seed_rev_row"]),
        seed_char=jnp.asarray(sd["seed_char"]),
        seed_valid=jnp.asarray(sd["seed_valid"]),
        first_char=jnp.asarray(sd["first_char"]),
        last_char=jnp.asarray(sd["last_char"]),
        log_num_seeds=sd["log_num_seeds"],
    )

    run = _jitted(packed.R, packed.period, packed.fw["stutter_row"],
                  packed.rev["stutter_row"], dtype)
    out = run(l_seg, r_seg, fw_meta, rev_meta, seed_meta,
              jnp.asarray(reads.seed_codes), jnp.asarray(reads.seed_blw),
              jnp.asarray(reads.seed_blc))
    return np.asarray(out)
