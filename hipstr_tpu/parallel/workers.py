"""Host worker pool: one device-owning parent, N host worker processes.

The reference is single-threaded and scales only by running independent
processes over BED shards (reference: README.md:167-171).  On a TPU host
that strategy wastes the accelerator: only one process may claim the chip,
so every extra process adds host CPUs but no device.  This executor splits
the program instead along the host/device boundary:

  * N *worker processes* run every per-locus host phase — BAM decode,
    read filtering, stutter EM, haplotype generation, pooling, the adaptive
    allele loop, ML-trace retracing and VCF record assembly (reference:
    src/bam_processor.cpp:173-474, src/genotyper_bam_processor.cpp:161-289,
    src/seq_stutter_genotyper.cpp:603-671) — each on its own core.
  * the *parent* owns the single TPU client and services every worker's
    alignment requests with the same shape-bucketed batched dispatches the
    in-process executor uses (parallel/executor.py), so the chip sees a few
    fat kernels rather than many small ones.

Messages carry the transfer-diet tensors (int8 codes + uint8 quals), so
IPC volume is a few KB per locus.  VCF records flow back tagged with their
BED index and stream through the bounded min-heap writer in region order —
memory stays O(window), never O(run) (reference: src/vcf_writer.h:25-83).
"""

from __future__ import annotations

import multiprocessing as mp
import time
from typing import Dict, List, Optional, Tuple

import numpy as np


# --------------------------------------------------------------- worker side


def _worker_main(conn, spec: dict) -> None:
    # Workers must never touch the TPU: a second claimant deadlocks the
    # axon runtime.  Pin the CPU backend before anything imports jax state.
    import jax
    jax.config.update("jax_platforms", "cpu")
    # one native-trace thread per worker: the pool already occupies the cores
    import os as _os
    _os.environ.setdefault("HIPSTR_TRACE_THREADS", "1")

    from ..pipeline.processor import (GenotyperPipeline, Logger,
                                      PipelineOptions)
    from ..pipeline.hap_aligner import prepare_locus
    from ..pipeline.vcf_record import build_vcf_record

    opts: PipelineOptions = spec["opts"]
    want_viz = bool(opts.viz_out)
    opts.viz_out = None              # parent owns the real viz stream
    if want_viz:
        opts.output.viz_out = True
    pipeline = GenotyperPipeline(spec["bam_paths"], spec["fasta_path"], opts,
                                 Logger(quiet=True),
                                 bam_samps=spec["bam_samps"],
                                 bam_libs=spec["bam_libs"],
                                 lib_field=spec["lib_field"])
    dtype = opts.dtype
    # When the parent fuses genotype posteriors into its device dispatches
    # (executor.device_post_enabled), workers must install those posteriors
    # instead of recomputing on host — otherwise the pooled and in-process
    # paths diverge numerically (f32 device vs f64 host) and near-tie
    # adaptive decisions flip between modes.
    device_post = bool(spec.get("device_post", False))
    # EM-learned stutter models train on the parent's device in batched
    # waves (ops/em_batched.py), exactly like the in-process executor —
    # workers ship the packed EM problem up and resume on the reply, so
    # pooled and in-process runs stay byte-identical in EM mode too.
    device_em = bool(spec.get("device_em", False))
    items: Dict[int, tuple] = {}     # idx -> (region, genotyper, gen)
    em_pending: Dict[int, tuple] = {}  # idx -> (region, prep, chrom_seq)
    chrom = None
    chrom_seq = None

    def build_record(idx, g, region):
        pipeline.counters.genotype_success += 1
        with pipeline.timer.time("VCF record construction"):
            chrom_, pos, text, stats = build_vcf_record(
                g, pipeline.samples, opts.output)
        viz = None
        if want_viz and stats.viz_data is not None:
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
                alns_by_sample, stats.sample_gb, chrom_seq,
                region.chrom, region.start, region.stop)
            viz = (region.chrom, region.start + 1, region.stop, html)
        return (chrom_, pos, text), viz

    def do_prep(idx, region):
        nonlocal chrom, chrom_seq
        if region.stop - region.start > opts.max_str_len:
            pipeline.counters.too_long += 1
            conn.send(("settled", idx, None, None))
            return
        if region.chrom != chrom:
            chrom = region.chrom
            chrom_seq = pipeline.fasta.get_sequence(chrom)
        try:
            if device_em:
                prep = pipeline.prepare_reads(region, chrom_seq)
                if prep is None:
                    conn.send(("settled", idx, None, None))
                    return
                with pipeline.timer.time("Stutter estimation"):
                    inputs = pipeline.stutter_em_inputs(
                        prep.alns_by_rg, prep.log_p1s, prep.log_p2s, region)
                if inputs is None:
                    conn.send(("settled", idx, None, None))
                    return
                from ..ops.em_batched import EMProblem
                prob = EMProblem.build(prep.haploid, region.period, *inputs)
                em_pending[idx] = (region, prep, chrom_seq)
                conn.send(("em", idx, prob))
                return
            g = pipeline.prepare_locus_genotyper(region, chrom_seq)
            if g is None:
                conn.send(("settled", idx, None, None))
                return
            _stage(idx, region, g)
        except Exception as exc:  # skip-and-continue, like the reference
            pipeline.counters.genotype_fail += 1
            conn.send(("log", f"ERROR at {region}: {exc!r}"))
            conn.send(("settled", idx, None, None))

    def _stage(idx, region, g):
        with pipeline.timer.time("Locus packing"):
            seqs, quals, seeds = g.pool_inputs()
            if not seqs:
                pipeline.counters.genotype_fail += 1
                conn.send(("settled", idx, None, None))
                return
            arrays, statics = prepare_locus(
                g.align_haplotype(), seqs, quals, seeds, dtype,
                post_meta=g.posterior_meta() if device_post else None,
                read_cache=g.__dict__.setdefault("_read_pack_cache", {}))
        items[idx] = (region, g, None)
        conn.send(("ready", idx, arrays, statics))

    def do_emr(idx, params, converged):
        """Resume a locus whose stutter model trained on the parent's
        device (run_batched.solve_staged_em parity)."""
        region, prep, local_seq = em_pending.pop(idx)
        try:
            if not converged:
                pipeline.counters.em_fail += 1
                conn.send(("log", f"Stutter EM failed for {region}"))
                conn.send(("settled", idx, None, None))
                return
            from ..models.stutter import StutterModel
            model = StutterModel(*params, region.period)
            pipeline.register_learned_model(region, model)
            if opts.skip_genotyping:
                conn.send(("settled", idx, None, None))
                return
            g = pipeline.finish_prepare(prep, region, local_seq, model)
            if g is None:
                conn.send(("settled", idx, None, None))
                return
            _stage(idx, region, g)
        except Exception as exc:
            pipeline.counters.genotype_fail += 1
            conn.send(("log", f"ERROR at {region}: {exc!r}"))
            conn.send(("settled", idx, None, None))

    def do_ll(idx, LL, post=None, totals=None):
        region, g, gen = items[idx]
        try:
            g.set_pool_lls(LL)
            with pipeline.timer.time("Genotyping (adaptive)"):
                if post is not None:
                    S, H = g.num_samples, g.num_alleles
                    g.install_posteriors(post[:S, :H, :H], totals[:S])
                else:
                    g.calc_log_sample_posteriors()
                if gen is None:
                    gen = g.adaptive_steps(opts.max_haps,
                                           opts.max_hap_flanks,
                                           opts.min_flank_freq)
                    items[idx] = (region, g, gen)
                try:
                    next(gen)
                except StopIteration as stop:
                    del items[idx]
                    if stop.value:
                        rec, viz = build_record(idx, g, region)
                        conn.send(("settled", idx, rec, viz))
                    else:
                        pipeline.counters.genotype_fail += 1
                        conn.send(("settled", idx, None, None))
                    return
            with pipeline.timer.time("Locus packing"):
                seqs, quals, seeds = g.pool_inputs()
                arrays, statics = prepare_locus(
                    g.align_haplotype(), seqs, quals, seeds, dtype,
                    post_meta=g.posterior_meta() if device_post else None,
                    read_cache=g.__dict__.setdefault("_read_pack_cache", {}))
            conn.send(("ready", idx, arrays, statics))
        except Exception as exc:
            items.pop(idx, None)
            pipeline.counters.genotype_fail += 1
            conn.send(("log", f"ERROR at {region}: {exc!r}"))
            conn.send(("settled", idx, None, None))

    idle_t = 0.0
    while True:
        t0 = time.perf_counter()
        msg = conn.recv()
        idle_t += time.perf_counter() - t0
        tag = msg[0]
        if tag == "prep":
            do_prep(msg[1], msg[2])
        elif tag == "ll":
            do_ll(msg[1], msg[2], *msg[3:])
        elif tag == "emr":
            do_emr(msg[1], msg[2], msg[3])
        elif tag == "fin":
            pipeline.timer.add_time("Worker idle", idle_t)
            conn.send(("fin", pipeline.counters, pipeline._stutter_out,
                       pipeline.timer.totals))
            conn.close()
            return


# --------------------------------------------------------------- parent side


class _ReadyItem:
    __slots__ = ("idx", "arrays", "statics", "worker")

    def __init__(self, idx, arrays, statics, worker):
        self.idx = idx
        self.arrays = arrays
        self.statics = statics
        self.worker = worker

    def shape_key(self):
        import jax
        from .executor import runtime_period
        leaves = jax.tree.leaves(self.arrays)
        st = self.statics
        key_st = st[:4] + (0,) if runtime_period() else st[:5]
        return (key_st,
                tuple(getattr(x, "shape", ()) for x in leaves))


def run_pooled(pipeline, regions_bed: str, out_vcf: Optional[str],
               worker_spec: dict, n_workers: int = 3,
               batch_size: int = 32, full_command: str = "hipstr-tpu",
               window: int = 0):
    """Worker-pool analogue of executor.run_batched; identical outputs.

    The parent never runs per-locus host phases — it routes messages,
    stacks ready tensors, and owns every device dispatch.
    """
    import jax
    from .executor import (BatchedAligner, LocusWorkItem,
                           device_post_enabled)
    from ..io.regions import read_regions
    from ..io.vcf_write import VCFWriter, build_vcf_header

    from .executor import device_em_enabled

    opts = pipeline.opts
    em_device = device_em_enabled(opts)
    worker_spec = dict(worker_spec, device_post=device_post_enabled(),
                       device_em=em_device)
    regions = list(read_regions(regions_bed, opts.max_regions, opts.chrom,
                                opts.locus_shard))
    window = window or batch_size * 4
    writer = None
    if out_vcf:
        header = build_vcf_header(pipeline.fasta_path, full_command,
                                  pipeline.fasta.contig_header_lines(),
                                  pipeline.samples, opts.output)
        writer = VCFWriter(out_vcf, header)

    ctx = mp.get_context("spawn")
    conns = []
    procs = []
    with pipeline.timer.time("Worker spawn"):
        for w in range(n_workers):
            parent_conn, child_conn = ctx.Pipe()
            proc = ctx.Process(target=_worker_main,
                               args=(child_conn, worker_spec), daemon=True)
            proc.start()
            child_conn.close()
            conns.append(parent_conn)
            procs.append(proc)

    aligner = BatchedAligner(opts.dtype, batch_size, pipeline.logger)
    ready: List[_ReadyItem] = []
    settled: Dict[int, tuple] = {}  # idx -> (rec, viz)
    next_emit = 0
    n_regions = len(regions)
    next_region = 0
    n_settled = 0
    outstanding = [0] * n_workers   # preps+lls awaiting a reply per worker
    PREFETCH = max(8, window // max(1, n_workers))

    viz_records: List[tuple] = []

    def drain_settled():
        nonlocal next_emit
        while next_emit in settled:
            rec, viz = settled.pop(next_emit)
            if rec is not None and writer is not None:
                writer.add_vcf_record(rec[0], rec[1], rec[2])
            if viz is not None:
                viz_records.append(viz)
            next_emit += 1

    def feed_preps():
        nonlocal next_region
        while next_region < n_regions:
            w = min(range(n_workers), key=lambda i: outstanding[i])
            if outstanding[w] >= PREFETCH:
                return
            idx = next_region
            pipeline.logger.log(f"Preparing region {regions[idx]} ...")
            conns[w].send(("prep", idx, regions[idx]))
            outstanding[w] += 1
            next_region += 1

    em_jobs: List[tuple] = []       # (idx, worker, EMProblem)

    def handle_msg(w, msg):
        nonlocal n_settled
        tag = msg[0]
        if tag == "ready":
            outstanding[w] -= 1
            ready.append(_ReadyItem(msg[1], msg[2], msg[3], w))
        elif tag == "settled":
            outstanding[w] -= 1
            settled[msg[1]] = (msg[2], msg[3])
            n_settled += 1
        elif tag == "em":
            outstanding[w] -= 1
            em_jobs.append((msg[1], w, msg[2]))
        elif tag == "log":
            pipeline.logger.log(msg[1])

    def solve_em_jobs():
        """One device dispatch trains every staged locus's stutter model
        (run_batched.solve_staged_em parity), then replies to owners."""
        nonlocal em_jobs
        if not em_jobs:
            return
        from ..ops.em_batched import em_train_batch, pack_problems
        import jax
        jobs, em_jobs = em_jobs, []
        with pipeline.timer.time("Stutter estimation (device)"):
            on_cpu = jax.default_backend() == "cpu"
            arrays, (_, _, Sm) = pack_problems(
                [j[2] for j in jobs], pad_g=None if on_cpu else window)
            dtype_name = ("float64" if on_cpu and jax.config.jax_enable_x64
                          else "float32")
            out = em_train_batch(arrays, Sm, max_iter=opts.max_em_iter,
                                 min_LL_abs_change=opts.abs_ll_converge,
                                 min_LL_frac_change=opts.frac_ll_converge,
                                 dtype_name=dtype_name)
            params = np.asarray(out["params"], np.float64)
            conv = np.asarray(out["converged"])
        for i, (idx, w, _prob) in enumerate(jobs):
            conns[w].send(("emr", idx, tuple(float(x) for x in params[i]),
                           bool(conv[i])))
            outstanding[w] += 1

    def poll_workers(timeout=0.0):
        got = False
        for w, c in enumerate(conns):
            while c.poll(timeout if not got else 0.0):
                m = c.recv()
                if m[0] == "log":
                    pipeline.logger.log(m[1])
                    continue
                handle_msg(w, m)
                got = True
        return got

    def dispatch_ready():
        nonlocal ready
        if not ready:
            return
        for item in ready:
            work = LocusWorkItem.__new__(LocusWorkItem)
            work.region = None
            work.genotyper = None
            work.arrays = item.arrays
            work.statics = item.statics
            work.chrom_seq = None
            work.gen = None
            work.rounds = 0
            work._pool_item = item
            aligner.add(work)
        ready = []
        for chunk, handle in aligner.dispatch_all():
            n_inflight[0] += 1
            inflight_q.put((chunk, handle))

    # background fetcher: device->host result transfers ride the tunnel
    # (~25-50 ms each); a dedicated thread overlaps them with message
    # routing and with the device computing the NEXT dispatch.  jax array
    # fetches release the GIL during the transfer.
    import queue as _queue
    import threading as _threading
    fetched: _queue.Queue = _queue.Queue()
    fetch_t = [0.0]
    fetch_lock = _threading.Lock()
    n_inflight = [0]

    def _fetch_loop():
        while True:
            item = inflight_q.get()
            if item is None:
                return
            chunk, handle = item
            t0 = time.perf_counter()
            try:
                if isinstance(handle, tuple):
                    res = tuple(np.asarray(h) for h in handle)
                else:
                    res = np.asarray(handle)
            except BaseException as exc:   # surface in the main loop
                fetched.put((None, exc))
                continue
            with fetch_lock:
                fetch_t[0] += time.perf_counter() - t0
            fetched.put((chunk, res))

    # several fetchers: concurrent device->host transfers overlap their
    # tunnel round trips (measured: 4 threads hide the fetch entirely,
    # leaving pure device compute)
    N_FETCHERS = 4
    inflight_q: _queue.Queue = _queue.Queue()
    fetchers = [_threading.Thread(target=_fetch_loop, daemon=True)
                for _ in range(N_FETCHERS)]
    for f in fetchers:
        f.start()

    def send_lls(chunk, res) -> None:
        if isinstance(res, tuple):
            LL_all, post_all, tot_all = res
        else:
            LL_all, post_all, tot_all = res, None, None
        for gi, work in enumerate(chunk):
            item = work._pool_item
            P_real, H_real = item.statics[5], item.statics[6]
            LL = LL_all[gi, :P_real, :H_real]
            if post_all is not None:
                conns[item.worker].send(("ll", item.idx, LL,
                                         post_all[gi], tot_all[gi]))
            else:
                conns[item.worker].send(("ll", item.idx, LL))
            outstanding[item.worker] += 1

    def drain_fetched(block: bool = False) -> bool:
        got = False
        while True:
            try:
                chunk, res = fetched.get(timeout=0.05 if block and not got
                                         else 0.0)
            except _queue.Empty:
                return got
            if chunk is None:
                raise res
            n_inflight[0] -= 1
            send_lls(chunk, res)
            got = True

    t_poll = t_idle = 0.0
    while n_settled < n_regions:
        feed_preps()
        t0 = time.perf_counter()
        poll_workers(timeout=0.001)
        t_poll += time.perf_counter() - t0
        drain_settled()
        drain_fetched()
        # dispatch once enough work is staged (or nothing else can make
        # progress)
        starved = (next_region >= n_regions
                   and not any(outstanding) and not n_inflight[0])
        if em_jobs and (len(em_jobs) >= window or starved
                        or (not ready and not n_inflight[0]
                            and not any(outstanding))):
            solve_em_jobs()
            continue
        # window-sized waves measured faster than eager per-chunk
        # dispatching on the tunneled chip (eager dispatch multiplies
        # fetch round trips, which contend on the tunnel and starve the
        # parent loop); see BASELINE.md round-3 worker-scaling table
        if ready and (len(ready) >= window or starved
                      or (not n_inflight[0] and not any(outstanding))):
            dispatch_ready()
        if not ready and not n_inflight[0] and n_settled < n_regions:
            t0 = time.perf_counter()
            if not poll_workers(timeout=0.05):
                time.sleep(0.005)
            t_idle += time.perf_counter() - t0
        elif n_inflight[0] and not poll_workers():
            t0 = time.perf_counter()
            drain_fetched(block=True)
            t_idle += time.perf_counter() - t0
    drain_settled()
    for _ in fetchers:
        inflight_q.put(None)
    pipeline.timer.add_time("Device fetch", fetch_t[0])
    pipeline.timer.add_time("Pool poll", t_poll)
    pipeline.timer.add_time("Pool idle", t_idle)

    # collect worker state
    for w, c in enumerate(conns):
        c.send(("fin",))
    for w, c in enumerate(conns):
        while True:
            msg = c.recv()
            if msg[0] == "fin":
                _, counters, stutter_out, timer_totals = msg
                for f in counters.__dataclass_fields__:
                    setattr(pipeline.counters, f,
                            getattr(pipeline.counters, f)
                            + getattr(counters, f))
                pipeline._stutter_out.update(stutter_out)
                for name, secs in timer_totals.items():
                    pipeline.timer.add_time(f"{name} (workers)", secs)
                break
            handle_msg(w, msg)
        c.close()
    for proc in procs:
        proc.join(timeout=10)
        if proc.is_alive():
            proc.terminate()

    if writer is not None:
        writer.close()
    if pipeline.viz_writer is not None:
        for chrom_, start, stop, html in sorted(viz_records,
                                                key=lambda r: (r[0], r[1])):
            pipeline.viz_writer.add(chrom_, start, stop, html)
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
