"""Multi-locus batched execution: many loci per device dispatch.

The reference processes loci strictly sequentially (reference:
src/bam_processor.cpp:523-618); its scaling story is one process per BED
shard.  Here the host prepares a *wave* of loci (filters, haplotype
generation, pooling, seeds), groups them by bucketed kernel shape, and
dispatches every group's read<->haplotype alignment before fetching any
result, so transfers and compute pipeline on the device.  The per-locus
adaptive stages (stutter-candidate mining, allele pruning, flank
reassembly) are themselves batched per round across the whole wave: loci
needing realignment regroup and dispatch together instead of one by one.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..pipeline.hap_aligner import _jitted, prepare_locus
from ..ops.hmm import hmm_forward


def device_em_enabled(opts) -> bool:
    """Batch EM across the wave on device (ops/em_batched.py) instead of
    per-locus host numpy.  Default: on for accelerator backends, off on CPU
    (where the host float64 EM is the golden-parity reference path);
    HIPSTR_TPU_DEVICE_EM=1/0 forces either way."""
    if opts.def_stutter_model is not None or opts.stutter_in:
        return False
    flag = os.environ.get("HIPSTR_TPU_DEVICE_EM", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return jax.default_backend() != "cpu"

# On TPU every distinct batch shape costs a fresh trace+lower+compile (tens
# of seconds on the remote-compile path), while padded loci cost linear
# device compute — with the emission kernel at tens of ms/locus that
# padding is no longer negligible, so TPU runs use a SMALL set of
# locus-axis buckets (quarter/full batch) instead of one.  On CPU compiles
# are cheap and padded loci cost real host FLOPs (and memory), so small
# groups stay small.
CPU_BATCH_BUCKETS = [1, 2, 4, 8, 16, 32, 64, 128]


def _g_bucket(n: int, batch_size: int) -> int:
    if jax.default_backend() == "cpu":
        for b in CPU_BATCH_BUCKETS:
            if n <= b:
                return min(b, batch_size)
        return batch_size
    quarter = max(1, batch_size // 4)
    return quarter if n <= quarter else batch_size


def device_post_enabled() -> bool:
    """Fuse the genotype-posterior kernel into the batched dispatch so each
    round returns (LL, log_post, totals) in one fetch.  Default: on for
    accelerator backends (the CPU host float64 path is the golden-parity
    reference); HIPSTR_TPU_DEVICE_POST=1/0 forces either way."""
    flag = os.environ.get("HIPSTR_TPU_DEVICE_POST", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return jax.default_backend() != "cpu"


def _kernel_choice() -> str:
    kernel = os.environ.get("HIPSTR_TPU_KERNEL", "auto")
    if kernel == "auto":
        # the Mosaic kernel needs a real TPU; CPU runs use the XLA scan
        kernel = "v2" if jax.default_backend() != "cpu" else "xla"
    return kernel


def runtime_period() -> bool:
    """The v2 Mosaic path takes the repeat period (and real haplotype
    count) as per-locus runtime data, so dispatch groups merge across
    periods; the XLA path compiles per period."""
    return _kernel_choice() == "v2"


@functools.lru_cache(maxsize=64)
def _jitted_batch(R_f: int, R_r: int, sr_f: int, sr_r: int, period: int,
                  dtype_name: str, Sm=None):
    """Compiled batched forward (+ fused posteriors).

    The returned callable takes (l_seg, r_seg, fw_meta, rev_meta, seed,
    sc, sq, h_real, periods[, pm]); on the v2 path `period` is a dummy 0
    (runtime `periods` array is used), on the XLA path it is static and
    the runtime arrays are ignored.
    """
    dtype = jnp.dtype(dtype_name)
    kernel = _kernel_choice()
    if kernel == "v2":
        from ..ops.pallas_hmm2 import batched_forward_v2

        def hmm(l_seg, r_seg, fw_meta, rev_meta, seed, sc, sq, h_real,
                periods):
            return batched_forward_v2(
                l_seg, r_seg, fw_meta, rev_meta, seed, sc, sq,
                R_f, R_r, period, sr_f, sr_r, dtype,
                h_real=h_real, periods=periods)
    else:
        def hmm(l_seg, r_seg, fw_meta, rev_meta, seed, sc, sq, h_real,
                periods):
            def one(*a):
                return hmm_forward(*a, R_f, R_r, period, sr_f, sr_r, dtype)
            return jax.vmap(one)(l_seg, r_seg, fw_meta, rev_meta, seed,
                                 sc, sq)

    if Sm is None:
        return jax.jit(hmm)

    from ..ops.posteriors import batched_pool_posteriors

    def run(l_seg, r_seg, fw_meta, rev_meta, seed, sc, sq, h_real, periods,
            pm):
        LL = hmm(l_seg, r_seg, fw_meta, rev_meta, seed, sc, sq, h_real,
                 periods)
        log_post, totals = batched_pool_posteriors(jnp, LL, pm, Sm, dtype)
        return LL, log_post, totals

    return jax.jit(run)


class LocusWorkItem:
    def __init__(self, region, genotyper, arrays, statics, chrom_seq,
                 order=0):
        self.region = region
        self.genotyper = genotyper
        self.arrays = arrays
        self.statics = statics
        self.chrom_seq = chrom_seq
        self.order = order
        self.gen = None   # resumable adaptive loop, created after initial LLs
        self.rounds = 0   # device dispatches this locus has ridden

    def shape_key(self):
        leaves = jax.tree.leaves(self.arrays)
        st = self.statics
        # the v2 kernel takes period as runtime data: groups merge across
        # periods (the single biggest dispatch consolidation)
        key_st = st[:4] + (0,) if runtime_period() else st[:5]
        return (key_st + (st[7],),
                tuple(getattr(x, "shape", ()) for x in leaves))


class BatchedAligner:
    """Groups per-locus prepared tensors by kernel shape; dispatches each
    group as one (or a few) vmapped device calls, all enqueued before any
    caller fetches — device transfers and compute overlap across groups."""

    def __init__(self, dtype: str = "float32", batch_size: int = 32,
                 logger=None):
        self.dtype = dtype
        self.batch_size = batch_size
        self.groups: Dict[tuple, List[LocusWorkItem]] = {}
        self.logger = logger
        self._logged_mesh = False
        # per-shape dispatch accounting: key -> [dispatches, real, padded]
        self.stats: Dict[tuple, list] = {}
        # per-run speculation + round accounting (VCF-invariant telemetry):
        # rounds/locus histogram and allele-addition events served by the
        # speculative column gather (hit) vs a realignment dispatch (miss)
        self.round_hist: Dict[int, int] = {}
        self.spec_hits = 0
        self.spec_misses = 0

    def finalize(self, item) -> None:
        """Record a settled locus's dispatch-round count and speculation
        hit/miss totals (called once per locus, success or fail)."""
        self.round_hist[item.rounds] = self.round_hist.get(item.rounds, 0) + 1
        g = item.genotyper
        self.spec_hits += getattr(g, "spec_hits", 0)
        self.spec_misses += getattr(g, "spec_misses", 0)

    def log_stats(self) -> None:
        if self.logger is None or not self.stats:
            return
        for key, (n, real, padded) in sorted(self.stats.items()):
            R_f, R_r, sr_f, sr_r, period = key[:5]
            self.logger.log(
                f"Dispatch shape period={period} R={R_f}+{R_r}: "
                f"{n} dispatches, {real} loci ({padded} padded)")
        if self.round_hist:
            hist = ", ".join(f"{r}: {c}" for r, c in
                             sorted(self.round_hist.items()))
            self.logger.log(f"Device rounds per locus: {{{hist}}}")
        if self.spec_hits or self.spec_misses:
            total = self.spec_hits + self.spec_misses
            self.logger.log(
                f"Speculation: {self.spec_hits}/{total} allele-addition "
                f"rounds served by column gather "
                f"({self.spec_misses} realignment dispatches)")

    def add(self, item: LocusWorkItem) -> None:
        self.groups.setdefault(item.shape_key(), []).append(item)

    def dispatch_all(self) -> List[Tuple[List[LocusWorkItem], object]]:
        """Dispatch every pending group (chunked to batch_size); returns
        [(chunk_items, LL_device_handle)] without fetching anything."""
        out = []
        for key in list(self.groups):
            group = self.groups.pop(key)
            for i in range(0, len(group), self.batch_size):
                chunk = group[i:i + self.batch_size]
                out.append((chunk, self._dispatch_chunk(chunk)))
        return out

    def _dispatch_chunk(self, chunk: List[LocusWorkItem]):
        G = len(chunk)
        Gp = _g_bucket(G, self.batch_size)
        # LOCAL devices only: in multi-process (--distributed) runs each
        # process owns its own loci; sharding over global devices would
        # entangle every process in every dispatch's collectives
        devs = jax.local_devices()
        n_dev = len(devs)
        if n_dev > 1:
            # pad the locus axis to a multiple of the device count so GSPMD
            # sharding always engages (never silently degrades to one device)
            Gp = max(Gp, ((Gp + n_dev - 1) // n_dev) * n_dev)
        st = self.stats.setdefault(tuple(chunk[0].statics[:5]), [0, 0, 0])
        st[0] += 1
        st[1] += G
        st[2] += Gp - G
        for it in chunk:
            it.rounds += 1
        padded = chunk + [chunk[-1]] * (Gp - G)
        stacked = jax.tree.map(lambda *xs: np.stack(xs),
                               *[it.arrays for it in padded])
        R_f, R_r, sr_f, sr_r, period = chunk[0].statics[:5]
        if runtime_period():
            period = 0   # dummy static; real periods ride the array below
        run = _jitted_batch(R_f, R_r, sr_f, sr_r, period, self.dtype,
                            chunk[0].statics[7])
        h_real = np.array([it.statics[6] for it in padded], np.int32)
        periods = np.array([it.statics[4] for it in padded], np.int32)
        args = list(stacked[:7]) + [h_real, periods] + list(stacked[7:])
        if n_dev > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec
            mesh = Mesh(np.array(devs), ("loci",))
            sharding = NamedSharding(mesh, PartitionSpec("loci"))
            args = jax.tree.map(
                lambda x: jax.device_put(x, sharding), args)
        if n_dev > 1 and not self._logged_mesh and self.logger is not None:
            self.logger.log(f"Sharding locus batches over {n_dev} devices")
            self._logged_mesh = True
        return run(*args)


def run_batched(pipeline, regions_bed: str, out_vcf: Optional[str],
                batch_size: int = 32, full_command: str = "hipstr-tpu",
                window: int = 0):
    """Batched analogue of GenotyperPipeline.run; identical outputs."""
    from ..io.regions import read_regions
    from ..io.vcf_write import VCFWriter, build_vcf_header
    from ..pipeline.vcf_record import build_vcf_record

    opts = pipeline.opts
    regions = read_regions(regions_bed, opts.max_regions, opts.chrom,
                           opts.locus_shard)
    # one dispatch batch per wave: launch_wave dispatches wave N and then
    # settles wave N-1, so wave N's device compute + async fetch overlap
    # wave N-1's adaptive host work and wave N+1's staging
    window = window or batch_size
    writer = None
    if out_vcf:
        header = build_vcf_header(pipeline.fasta_path, full_command,
                                  pipeline.fasta.contig_header_lines(),
                                  pipeline.samples, opts.output)
        writer = VCFWriter(out_vcf, header)

    aligner = BatchedAligner(opts.dtype, batch_size, pipeline.logger)
    # streaming sorted emission: loci settle out of order inside a wave, but
    # records enter the writer in BED order; the writer's bounded min-heap
    # absorbs the residual +-50bp POS jitter from allele trimming
    # (reference: src/vcf_writer.h:25-83).  Memory stays O(window).
    pending: Dict[int, Tuple] = {}
    next_emit = [0]

    def drain_pending():
        while next_emit[0] in pending:
            rec, viz = pending.pop(next_emit[0])
            if rec is not None and writer is not None:
                writer.add_vcf_record(*rec)
            if viz is not None and pipeline.viz_writer is not None:
                pipeline.viz_writer.add(*viz)
            next_emit[0] += 1

    def settle(order, rec=None, viz=None):
        pending[order] = (rec, viz)
        drain_pending()

    def emit_record(item):
        g = item.genotyper
        pipeline.counters.genotype_success += 1
        with pipeline.timer.time("VCF record construction"):
            chrom, pos, text, stats = build_vcf_record(
                g, pipeline.samples, opts.output)
        viz = None
        if pipeline.viz_writer is not None and stats.viz_data is not None:
            from ..pipeline.viz import visualize_alignments
            alns_by_sample = {}
            for s, entries in enumerate(stats.viz_data):
                if entries:
                    one = sorted((a for st, a in entries if st == 0),
                                 key=lambda a: a.start)
                    two = sorted((a for st, a in entries if st == 1),
                                 key=lambda a: a.start)
                    alns_by_sample[g.sample_names[s]] = one + two
            html = visualize_alignments(
                alns_by_sample, stats.sample_gb, item.chrom_seq,
                item.region.chrom, item.region.start, item.region.stop)
            viz = (item.region.chrom, item.region.start + 1,
                   item.region.stop, html)
        settle(item.order, (chrom, pos, text), viz)

    use_device_post = device_post_enabled()

    def maybe_post_meta(g):
        return g.posterior_meta() if use_device_post else None

    import concurrent.futures as _cf
    # native trace batches release the GIL; size the pool to the spare
    # cores (main thread keeps one)
    trace_pool = _cf.ThreadPoolExecutor(
        max_workers=max(2, min(3, (os.cpu_count() or 2) - 1)))

    def install(item, LL, post=None, totals=None) -> None:
        """Install fresh LLs (and fused device posteriors when available)
        for one locus, then prefetch its ML-trace batch on the thread pool
        so the native DP overlaps other loci's Python."""
        g = item.genotyper
        g.set_pool_lls(LL)
        with pipeline.timer.time("Genotyping (adaptive)"):
            if post is not None:
                g.install_posteriors(post, totals)
            else:
                g.calc_log_sample_posteriors()
        g.prefetch_traces(trace_pool)

    def advance(item) -> str:
        """Step one locus's adaptive loop: 'realign' when it needs another
        batched dispatch (item.arrays updated for the new haplotype),
        'emit' when genotyping succeeded (final-haplotype traces are
        prefetched so the native DP overlaps other loci before the
        deferred emit pass), 'done' otherwise."""
        g = item.genotyper
        with pipeline.timer.time("Genotyping (adaptive)"):
            if item.gen is None:
                item.gen = g.adaptive_steps(opts.max_haps,
                                            opts.max_hap_flanks,
                                            opts.min_flank_freq)
            try:
                next(item.gen)
            except StopIteration as stop:
                aligner.finalize(item)
                if stop.value:
                    g.prefetch_traces(trace_pool)
                    return "emit"
                pipeline.counters.genotype_fail += 1
                settle(item.order)
                return "done"
        with pipeline.timer.time("Locus packing"):
            seqs, quals, seeds = g.pool_inputs()
            item.arrays, item.statics = prepare_locus(
                g.align_haplotype(), seqs, quals, seeds, opts.dtype,
                post_meta=maybe_post_meta(g),
                read_cache=g.__dict__.setdefault("_read_pack_cache", {}))
        return "realign"

    def _fetch_one(res):
        if isinstance(res, tuple):
            return tuple(np.asarray(r) for r in res)
        return np.asarray(res)

    # fetches start the moment a wave is DISPATCHED: each np.asarray blocks
    # until the dispatch finishes and then rides the (slow) device->host
    # link with the GIL released, so the transfer overlaps the next wave's
    # host prep instead of being paid inside finish_handles
    fetch_pool = _cf.ThreadPoolExecutor(max_workers=4)

    def submit_fetch(handles):
        return [(chunk, fetch_pool.submit(_fetch_one, res))
                for chunk, res in handles]

    def finish_handles(handles) -> None:
        """Resolve in-flight fetches and drive every adaptive round of the
        wave to completion, regrouping realignments per round."""
        while handles:
            realign: List[LocusWorkItem] = []
            with pipeline.timer.time("Device fetch"):
                handles = [(chunk, fut.result()) for chunk, fut in handles]
            # phase 1: install every locus's LLs/posteriors and launch the
            # trace prefetches; phase 2 then steps the adaptive loops, so
            # each locus's native trace DP overlaps earlier loci's Python
            ready_items: List[LocusWorkItem] = []
            for chunk, res in handles:
                if isinstance(res, tuple):
                    LL_all, post_all, tot_all = res
                else:
                    LL_all = res
                    post_all = tot_all = None
                for gi, item in enumerate(chunk):
                    P_real, H_real = item.statics[5], item.statics[6]
                    LL = LL_all[gi, :P_real, :H_real]
                    post = tot = None
                    if post_all is not None:
                        S = item.genotyper.num_samples
                        # the fused posterior gathers the CURRENT alleles'
                        # columns out of a (possibly speculative) dispatch
                        A = item.genotyper.num_alleles
                        post = post_all[gi, :S, :A, :A]
                        tot = tot_all[gi, :S]
                    try:
                        install(item, LL, post, tot)
                        ready_items.append(item)
                    except Exception as exc:
                        aligner.finalize(item)
                        pipeline.counters.genotype_fail += 1
                        settle(item.order)
                        pipeline.logger.log(
                            f"ERROR at {item.region}: {exc!r}")
            emit_q: List[LocusWorkItem] = []
            for item in ready_items:
                try:
                    r = advance(item)
                    if r == "realign":
                        realign.append(item)
                    elif r == "emit":
                        emit_q.append(item)
                except Exception as exc:
                    aligner.finalize(item)
                    pipeline.counters.genotype_fail += 1
                    settle(item.order)
                    pipeline.logger.log(f"ERROR at {item.region}: {exc!r}")
            for item in emit_q:
                try:
                    emit_record(item)
                except Exception as exc:
                    pipeline.counters.genotype_fail += 1
                    settle(item.order)
                    pipeline.logger.log(f"ERROR at {item.region}: {exc!r}")
            for item in realign:
                aligner.add(item)
            handles = submit_fetch(aligner.dispatch_all())

    chrom = None
    chrom_seq = None
    prepared: List[LocusWorkItem] = []
    in_flight: List[Tuple[List[LocusWorkItem], object]] = []
    em_device = device_em_enabled(opts)
    em_staged: List[Tuple[int, object, object, object, str]] = []

    def stage_locus(g, region, local_chrom_seq, order) -> None:
        with pipeline.timer.time("Locus packing"):
            seqs, quals, seeds = g.pool_inputs()
            if not seqs:
                pipeline.counters.genotype_fail += 1
                settle(order)
                return
            arrays, statics = prepare_locus(
                g.align_haplotype(), seqs, quals, seeds, opts.dtype,
                post_meta=maybe_post_meta(g),
                read_cache=g.__dict__.setdefault("_read_pack_cache", {}))
        prepared.append(
            LocusWorkItem(region, g, arrays, statics, local_chrom_seq, order))

    def solve_staged_em() -> None:
        """One device dispatch trains every staged locus's stutter model
        (ops/em_batched.py; reference train loop
        src/em_stutter_genotyper.cpp:170-226), then stage-3 preparation
        continues on host."""
        nonlocal em_staged
        if not em_staged:
            return
        from ..ops.em_batched import em_train_batch, pack_problems
        staged, em_staged = em_staged, []
        with pipeline.timer.time("Stutter estimation (device)"):
            on_cpu = jax.default_backend() == "cpu"
            arrays, (_, _, Sm) = pack_problems(
                [s[3] for s in staged], pad_g=None if on_cpu else window)
            dtype_name = ("float64" if on_cpu and jax.config.jax_enable_x64
                          else "float32")
            out = em_train_batch(arrays, Sm, max_iter=opts.max_em_iter,
                                 min_LL_abs_change=opts.abs_ll_converge,
                                 min_LL_frac_change=opts.frac_ll_converge,
                                 dtype_name=dtype_name)
            params = np.asarray(out["params"], np.float64)
            conv = np.asarray(out["converged"])
        from ..models.stutter import StutterModel
        for i, (order, region, prep, _prob, local_seq) in enumerate(staged):
            try:
                if not conv[i]:
                    pipeline.counters.em_fail += 1
                    pipeline.logger.log(f"Stutter EM failed for {region}")
                    settle(order)
                    continue
                model = StutterModel(*params[i], region.period)
                pipeline.register_learned_model(region, model)
                if opts.skip_genotyping:
                    settle(order)
                    continue
                g = pipeline.finish_prepare(prep, region, local_seq, model)
                if g is None:
                    settle(order)
                    continue
                stage_locus(g, region, local_seq, order)
            except Exception as exc:
                pipeline.counters.genotype_fail += 1
                settle(order)
                pipeline.logger.log(f"ERROR at {region}: {exc!r}")

    def launch_wave():
        """Dispatch the prepared loci, then settle the PREVIOUS wave while
        this one computes — host work overlaps device work across waves."""
        nonlocal prepared, in_flight
        solve_staged_em()
        for item in prepared:
            aligner.add(item)
        prepared = []
        handles = submit_fetch(aligner.dispatch_all())
        done, in_flight = in_flight, handles
        finish_handles(done)

    for order, region in enumerate(regions):
        if region.stop - region.start > opts.max_str_len:
            pipeline.counters.too_long += 1
            settle(order)
            continue
        if region.chrom != chrom:
            chrom = region.chrom
            chrom_seq = pipeline.fasta.get_sequence(chrom)
        pipeline.logger.log(f"Preparing region {region} ...")
        try:
            if em_device:
                prep = pipeline.prepare_reads(region, chrom_seq)
                if prep is None:
                    settle(order)
                    continue
                with pipeline.timer.time("Stutter estimation"):
                    inputs = pipeline.stutter_em_inputs(
                        prep.alns_by_rg, prep.log_p1s, prep.log_p2s, region)
                if inputs is None:
                    settle(order)
                    continue
                from ..ops.em_batched import EMProblem
                prob = EMProblem.build(prep.haploid, region.period, *inputs)
                em_staged.append((order, region, prep, prob, chrom_seq))
                if len(prepared) + len(em_staged) >= window:
                    launch_wave()
                continue
            g = pipeline.prepare_locus_genotyper(region, chrom_seq)
            if g is None:
                settle(order)
                continue
            stage_locus(g, region, chrom_seq, order)
            if len(prepared) >= window:
                launch_wave()
        except Exception as exc:
            pipeline.counters.genotype_fail += 1
            settle(order)
            pipeline.logger.log(f"ERROR at {region}: {exc!r}")

    launch_wave()            # dispatch the tail, settle the previous wave
    finish_handles(in_flight)
    in_flight = []
    drain_pending()
    aligner.log_stats()
    # export the run's dispatch/speculation telemetry for callers (bench.py
    # surfaces spec_hit_rate + rounds_hist in its JSON line)
    pipeline.last_run_stats = dict(
        round_hist={int(k): int(v) for k, v in aligner.round_hist.items()},
        spec_hits=int(aligner.spec_hits),
        spec_misses=int(aligner.spec_misses))
    trace_pool.shutdown(wait=False)
    fetch_pool.shutdown(wait=False)

    if writer is not None:
        writer.close()
    if pipeline.viz_writer is not None:
        pipeline.viz_writer.close()
    if pipeline.pass_writer is not None:
        pipeline.pass_writer.close()
    if pipeline.filt_writer is not None:
        pipeline.filt_writer.close()
    if opts.stutter_out:
        from ..models.stutter import write_stutter_models
        with open(opts.stutter_out, "w") as fh:
            write_stutter_models(pipeline._stutter_out, fh)
    return pipeline.counters
