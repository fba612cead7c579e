"""Benchmark: end-to-end + kernel throughput on one chip.

Prints ONE JSON line whose headline metric is HONEST end-to-end pipeline
throughput (BAM decode -> filters -> device HMM/posteriors -> adaptive
rounds -> VCF write) measured through the production batched executor on
simulated trio-scale loci, matching the config used to time the reference
binary (tools/measure_reference.py -> tools/reference_baseline.json:
3 samples x 20 reads x 70bp, --def-stutter-model --use-unpaired).

Extra keys carry the supporting evidence:
  * kernel_ms_per_locus / kernel_deep_ms_per_locus — one production
    dispatch (Pallas HMM v2 + emission kernel + fused posteriors) at the
    standard and deep-coverage shapes, fetch-to-host barrier (on the axon
    remote TPU `block_until_ready` does not wait; only host fetches are
    honest).
  * device_wait_s / host_s — where the end-to-end time went.
  * achieved_gflops + mfu_vs_peak — analytic FLOP count of the HMM +
    emission math per locus vs the v5e MXU peak (197 TFLOP/s bf16); the
    kernels are VPU elementwise work, so this quantifies the headroom a
    matmul-shaped reformulation could still claim.
  * fetch_ms — tunnel round-trip latency (a local chip pays ~1 ms).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_cache = os.path.expanduser("~/.cache/hipstr_tpu_xla")
try:
    os.makedirs(_cache, exist_ok=True)
    import jax as _jax
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

REF_LOCI_PER_SEC = None
REF_DEEP_LOCI_PER_SEC = None
_ref_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tools", "reference_baseline.json")
if os.path.exists(_ref_file):
    try:
        with open(_ref_file) as fh:
            _ref = json.load(fh)
        REF_LOCI_PER_SEC = _ref.get("ref_loci_per_sec")
        REF_DEEP_LOCI_PER_SEC = _ref.get("ref_deep_loci_per_sec")
    except Exception:
        pass


def _write_dataset(tmp, n_loci, reads_per_sample):
    from hipstr_tpu.utils.simulate import simulate_locus
    from tests.test_workers import _write_sim
    locs = [simulate_locus(seed=31000 + i, n_samples=3,
                           reads_per_sample=reads_per_sample,
                           period=1 + (i % 4), ref_units=8 + (i % 3),
                           chrom=f"chrB{i}") for i in range(n_loci)]
    _write_sim(tmp, locs)


def _run_e2e(tmp, batch_size, workers=None):
    """One full pipeline run in the PRODUCT-DEFAULT configuration: the
    host worker pool on accelerator backends (cli.py --host-workers auto;
    outputs byte-identical to the in-process batched path), in-process
    batched on CPU.  Pass workers=1 to force in-process."""
    import jax
    from hipstr_tpu.models.stutter import StutterModel
    from hipstr_tpu.parallel.executor import run_batched
    from hipstr_tpu.pipeline.processor import (GenotyperPipeline, Logger,
                                               PipelineOptions)

    def mk_opts():
        return PipelineOptions(
            min_reads=15, use_unpaired=True, dtype="float32",
            def_stutter_model=StutterModel(0.95, 0.05, 0.05, 0.95, 0.01,
                                           0.01, 2))
    if workers is None:
        # mirror cli.py's auto heuristic: the pool only pays off on hosts
        # with enough cores to amortize its IPC/idle overhead
        n_cores = os.cpu_count() or 1
        workers = (min(4, n_cores - 2)
                   if jax.default_backend() != "cpu" and n_cores >= 6 else 1)
    p = GenotyperPipeline([f"{tmp}/sim.bam"], f"{tmp}/sim.fa", mk_opts(),
                          Logger(quiet=True))
    t0 = time.perf_counter()
    if workers > 1:
        from hipstr_tpu.parallel.workers import run_pooled
        spec = dict(bam_paths=[f"{tmp}/sim.bam"], fasta_path=f"{tmp}/sim.fa",
                    opts=mk_opts(), bam_samps=None, bam_libs=None,
                    lib_field="LB")
        counters = run_pooled(p, f"{tmp}/regions.bed", f"{tmp}/out.vcf",
                              spec, n_workers=workers,
                              batch_size=batch_size)
    else:
        counters = run_batched(p, f"{tmp}/regions.bed", f"{tmp}/out.vcf",
                               batch_size=batch_size)
    dt = time.perf_counter() - t0
    return dt, counters, dict(p.timer.totals, **{
        "_run_stats": getattr(p, "last_run_stats", None)})


def _bench_kernel(n_samples, reads_per_sample, batch):
    """One production dispatch (HMM + emission + fused posteriors)."""
    import numpy as np
    from hipstr_tpu.parallel.executor import _jitted_batch
    from hipstr_tpu.pipeline.hap_aligner import prepare_locus
    from hipstr_tpu.pipeline.processor import (GenotyperPipeline, Logger,
                                               PipelineOptions)
    from hipstr_tpu.models.stutter import StutterModel
    from hipstr_tpu.io.regions import read_regions
    import jax

    tmp = tempfile.mkdtemp(prefix="hipstr_kbench_")
    _write_dataset(tmp, 1, reads_per_sample)
    opts = PipelineOptions(
        min_reads=15, use_unpaired=True, dtype="float32",
        def_stutter_model=StutterModel(0.95, 0.05, 0.05, 0.95, 0.01,
                                       0.01, 2))
    p = GenotyperPipeline([f"{tmp}/sim.bam"], f"{tmp}/sim.fa", opts,
                          Logger(quiet=True))
    region = read_regions(f"{tmp}/regions.bed", 10, "", None)[0]
    chrom_seq = p.fasta.get_sequence(region.chrom)
    g = p.prepare_locus_genotyper(region, chrom_seq)
    seqs, quals, seeds = g.pool_inputs()
    arrays, statics = prepare_locus(g.haplotype, seqs, quals, seeds,
                                    "float32", post_meta=g.posterior_meta())
    from hipstr_tpu.parallel.executor import runtime_period
    stacked = jax.tree.map(lambda x: np.stack([x] * batch), arrays)
    period_arg = 0 if runtime_period() else statics[4]
    run = _jitted_batch(*statics[:4], period_arg, "float32", statics[7])
    h_real = np.full(batch, statics[6], np.int32)
    periods = np.full(batch, statics[4], np.int32)
    args = list(stacked[:7]) + [h_real, periods] + list(stacked[7:])
    res = run(*args)
    first = res[0] if isinstance(res, tuple) else res
    np.asarray(first)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = run(*args)
        np.asarray(res[0] if isinstance(res, tuple) else res)
        best = min(best, time.perf_counter() - t0)
    leaves = jax.tree.leaves(arrays)
    shapes = dict(P=leaves[0].shape[0], L=leaves[0].shape[1],
                  R=statics[0] + statics[1], H=arrays[2].row_char.shape[0],
                  O=arrays[2].rep_len.shape[0], B=arrays[2].rep_rev_codes.shape[1])
    return 1000 * best / batch, shapes


def _flops_per_locus(s):
    """Analytic FLOP estimate of one locus's forward math."""
    hmm = 30.0 * s["P"] * s["H"] * s["R"] * s["L"]
    emission = 60.0 * s["O"] * s["B"] * s["P"] * s["L"]
    return hmm + emission


def _spec_keys(stats):
    """Speculation + rounds telemetry keys for the JSON line (VERDICT r4
    item 7): hit rate of allele-addition rounds served by the speculative
    column gather, and the device-rounds-per-locus histogram."""
    if not stats:
        return {"spec_hit_rate": None, "rounds_hist": None}
    hits, misses = stats.get("spec_hits", 0), stats.get("spec_misses", 0)
    total = hits + misses
    return {
        "spec_hit_rate": round(hits / total, 3) if total else None,
        "rounds_hist": {str(k): v for k, v in
                        sorted(stats.get("round_hist", {}).items())},
    }


def _fetch_ms():
    import numpy as np
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: x * 1.000001)
    x = jnp.ones((8, 128))
    np.asarray(f(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(x))
        best = min(best, time.perf_counter() - t0)
    return 1000 * best


def main():
    n_loci = int(os.environ.get("BENCH_LOCI", "100"))
    reads = int(os.environ.get("BENCH_READS", "20"))
    batch = int(os.environ.get("BENCH_BATCH", "32"))

    # the tunneled accelerator service is not always reachable, and a
    # wedged tunnel can HANG in two distinct ways: jax.devices() itself,
    # or (observed 2026-08-20) enumeration succeeds but any EXECUTION
    # hangs.  Probe a real jit round trip in a subprocess with a deadline
    # so a bench run always emits its JSON line (CPU fallback, tagged).
    import subprocess
    import jax
    if os.environ.get("BENCH_PLATFORM"):
        platform = os.environ["BENCH_PLATFORM"]
    else:
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp, numpy as np;"
                 "np.asarray(jax.jit(lambda a: a * 2)(jnp.ones((8, 128))));"
                 "print(jax.devices()[0].platform)"],
                capture_output=True, text=True, timeout=240)
            platform = (probe.stdout.strip().splitlines()[-1]
                        if probe.returncode == 0 and probe.stdout.strip()
                        else "")
        except subprocess.TimeoutExpired:
            platform = ""
    if platform in ("", "cpu"):
        jax.config.update("jax_platforms", "cpu")
        platform = platform or "cpu-fallback"

    # shallow config (20 reads/sample): the round-1..3 comparability point
    tmp = tempfile.mkdtemp(prefix="hipstr_bench_")
    _write_dataset(tmp, n_loci, reads)
    _run_e2e(tmp, batch)                       # pass 1: warm compile cache
    dt, counters, times = _run_e2e(tmp, batch)  # pass 2: steady state
    e2e = n_loci / dt

    # deep config (170 reads/sample ~ 30x trio): the HEADLINE workload —
    # the reference's canonical use is a deeply-sequenced trio
    # (/root/reference/README.md:87), where its single core drops to
    # ~19 loci/s while the batched device kernel barely grows
    # CPU fallback: bound the runtime (the deep config exists to showcase
    # the chip; on a 4-core CPU it is only a liveness signal)
    deep_default = "60" if platform not in ("cpu", "cpu-fallback") else "12"
    deep_loci = int(os.environ.get("BENCH_DEEP_LOCI", deep_default))
    deep_reads = int(os.environ.get("BENCH_DEEP_READS", "170"))
    e2e_deep = None
    deep_counters = deep_times = None
    deep_dt = 0.0
    if os.environ.get("BENCH_DEEP", "1") == "1":
        tmp2 = tempfile.mkdtemp(prefix="hipstr_bench_deep_")
        _write_dataset(tmp2, deep_loci, deep_reads)
        _run_e2e(tmp2, batch)
        deep_dt, deep_counters, deep_times = _run_e2e(tmp2, batch)
        e2e_deep = deep_loci / deep_dt

    kernel_ms, shapes = _bench_kernel(3, reads, batch)
    deep_ms = None
    try:
        deep_ms, deep_shapes = _bench_kernel(3, deep_reads, batch)
    except Exception:
        deep_ms = None
    flops = _flops_per_locus(shapes)
    gflops = flops / (kernel_ms / 1000) / 1e9
    vs_shallow = e2e / REF_LOCI_PER_SEC if REF_LOCI_PER_SEC else 0.0
    vs_deep = (e2e_deep / REF_DEEP_LOCI_PER_SEC
               if e2e_deep and REF_DEEP_LOCI_PER_SEC else 0.0)

    # headline = the deep 30x config when measured; shallow rides along
    value = e2e_deep if e2e_deep is not None else e2e
    vs_baseline = vs_deep if e2e_deep is not None else vs_shallow
    hdl_reads = deep_reads if e2e_deep is not None else reads
    dw = (deep_times or times).get("Device fetch", 0.0)
    hdl_dt = deep_dt if e2e_deep is not None else dt

    print(json.dumps({
        "metric": "end_to_end_loci_per_sec",
        "value": round(value, 3),
        "unit": "loci/s (full pipeline: BAM->filters->device->VCF; "
                "3 samples x %d reads [30x-trio headline], def-stutter, "
                "1 chip)" % hdl_reads,
        "vs_baseline": round(vs_baseline, 3),
        "n_loci": deep_loci if e2e_deep is not None else n_loci,
        "success": (deep_counters or counters).genotype_success,
        # with concurrent fetcher threads the summed fetch time can exceed
        # wall time; host_s is clamped accordingly
        "device_wait_s": round(dw, 2),
        "host_s": round(max(0.0, hdl_dt - dw), 2),
        "shallow_loci_per_sec": round(e2e, 3),
        "vs_baseline_shallow": round(vs_shallow, 3),
        "shallow_host_s": round(
            max(0.0, dt - times.get("Device fetch", 0.0)), 2),
        "shallow_n_loci": n_loci,
        "kernel_ms_per_locus": round(kernel_ms, 2),
        "kernel_deep_ms_per_locus": (round(deep_ms, 2)
                                     if deep_ms is not None else None),
        "kernel_shapes": shapes,
        "achieved_gflops": round(gflops, 1),
        "mfu_vs_peak": round(gflops / 197000.0, 5),
        "fetch_ms": round(_fetch_ms(), 1),
        **_spec_keys((deep_times or times).get("_run_stats")),
        "platform": platform,
        "ref_loci_per_sec": REF_LOCI_PER_SEC,
        "ref_deep_loci_per_sec": REF_DEEP_LOCI_PER_SEC,
    }))


def guarded_main():
    """Watchdog wrapper: the tunneled TPU service can wedge MID-RUN (every
    execution hangs, no error — observed 2026-08-20), which would hang the
    whole bench.  Run the real bench in a subprocess with a deadline; on
    timeout, rerun it pinned to CPU so a JSON line is always emitted."""
    if os.environ.get("BENCH_INNER"):
        return main()
    import subprocess
    me = os.path.abspath(__file__)
    env = dict(os.environ, BENCH_INNER="1")
    deadline = int(os.environ.get("BENCH_TIMEOUT", "3000"))
    try:
        r = subprocess.run([sys.executable, me], env=env, timeout=deadline)
        if r.returncode == 0:
            return
    except subprocess.TimeoutExpired:
        print("bench: TPU run exceeded deadline (wedged service?); "
              "rerunning on CPU", file=sys.stderr, flush=True)
    env["BENCH_PLATFORM"] = "cpu-fallback"
    subprocess.run([sys.executable, me], env=env, timeout=2 * deadline)


if __name__ == "__main__":
    guarded_main()
