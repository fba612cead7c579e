"""Benchmark: batched STR locus genotyping throughput on one chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measures the device compute path (batched stutter-aware HMM forward over all
[pool x haplotype] pairs + genotype posteriors) in loci/sec on realistic
trio-scale loci: 3 samples x 20 reads (70 bp) per locus, candidate haplotypes
mined from the reads.  The baseline is the single-core reference binary's
per-locus genotyping stage measured on the same simulated inputs
(BASELINE.md); until that number is measured on this machine the ratio is
reported against REF_LOCI_PER_SEC below.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# BENCH_PALLAS=1 opts into the Pallas flank-scan kernel; the default is the
# pure-XLA scan, which measures faster once results are actually fetched
# (on the axon remote TPU, block_until_ready does not wait for execution,
# so only host-fetch timings are trustworthy).
os.environ.setdefault("HIPSTR_TPU_PALLAS",
                      os.environ.get("BENCH_PALLAS", "0"))
_cache = os.path.expanduser("~/.cache/hipstr_tpu_xla")
try:
    os.makedirs(_cache, exist_ok=True)
    import jax as _jax
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

# Reference binary throughput (loci/sec, single core) on the same simulated
# trio-scale loci.  Measured via tools/measure_reference.py when available;
# 0 means "not yet measured" and vs_baseline falls back to 0.
REF_LOCI_PER_SEC = None
_ref_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tools", "reference_baseline.json")
if os.path.exists(_ref_file):
    try:
        with open(_ref_file) as fh:
            REF_LOCI_PER_SEC = json.load(fh).get("ref_loci_per_sec")
    except Exception:
        REF_LOCI_PER_SEC = None


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hipstr_tpu.parallel.batch_builder import build_demo_batch
    from hipstr_tpu.parallel.sharding import batched_locus_fn

    n_loci = int(os.environ.get("BENCH_LOCI", "32"))
    reads = int(os.environ.get("BENCH_READS", "20"))
    batch, statics, n_samples = build_demo_batch(
        n_loci, n_samples=3, reads_per_sample=reads)
    R_f, R_r, sr_f, sr_r, period = statics

    fn = jax.jit(batched_locus_fn(R_f, R_r, period, sr_f, sr_r, n_samples,
                                  jnp.float32))
    dev_batch = jax.tree.map(jnp.asarray, batch)

    # compile + warmup.  NOTE: on the axon remote TPU block_until_ready
    # returns before execution finishes, so every timed iteration must
    # fetch the result to host — np.asarray is the only honest barrier.
    out = fn(dev_batch)
    np.asarray(jax.tree.leaves(out)[0])

    iters = int(os.environ.get("BENCH_ITERS", "5"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(dev_batch)
        np.asarray(jax.tree.leaves(out)[0])
    dt = time.perf_counter() - t0

    loci_per_sec = n_loci * iters / dt
    vs_baseline = (loci_per_sec / REF_LOCI_PER_SEC
                   if REF_LOCI_PER_SEC else 0.0)
    print(json.dumps({
        "metric": "str_loci_genotyped_per_sec",
        "value": round(loci_per_sec, 3),
        "unit": "loci/s (3-sample x %d-read loci, device HMM+posteriors)" % reads,
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
