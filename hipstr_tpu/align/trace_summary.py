"""Columnar ML-trace summaries (the hot-path replacement for full traces).

The adaptive genotyping loop (stutter-candidate mining, unused-allele
pruning, flank reassembly, VCF per-sample stats) consumes only a small
fixed summary of each (read pool, haplotype) maximum-likelihood trace:
the traced reference span, per-block stutter size and STR sequence, the
flank sequences, and the flank indel totals (reference consumers:
src/seq_stutter_genotyper.cpp:229-315, :843-879, :40-217, :984-1540).
Building full AlignmentTrace objects per trace — walk-event decoding,
string assembly, CIGAR lists — was the single largest host cost per locus,
so the native layer computes everything (DP fill + seed combine + walks +
read->reference stitch) in ONE columnar call (native/hmm_kernel.cpp
hmm_trace_summary_batch) and this module wraps each row in a slot-only
TraceSummary.  The full traced alignment (CIGAR + aligned string) is still
carried in the columnar output and materialized lazily — only the
visualization path asks for it.

Fallback: without the native library, summaries are derived from the
existing object path (align/retrace.trace_optimal_aln), so consumers have
exactly one code path.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from .alignment_data import Alignment, CigarElement
from .haplotype import Haplotype
from .retrace import (MIN_SNP_LOG_PROB_CORRECT, TRACE_LL_TOL, HapAlignInfo,
                      _instances_for, trace_optimal_aln, trace_threads)
from .traceback import AlignmentTrace


class TraceSummary:
    """One (pool, haplotype) ML-trace summary.

    Attribute parity with the AlignmentTrace fields the pipeline consumes;
    `traced_aln()` materializes the full read->reference Alignment lazily
    (visualization only).
    """

    __slots__ = ("LL", "start", "stop", "flank_ins", "flank_del",
                 "stut_size", "stut_valid", "str_bytes", "flank_bytes",
                 "_cig_ops", "_cig_num", "_aln_bytes", "_quals", "_seq",
                 "_traced")

    def __init__(self, LL, start, stop, flank_ins, flank_del, stut_size,
                 stut_valid, str_bytes, flank_bytes, cig_ops, cig_num,
                 aln_bytes, seq, quals):
        self.LL = LL
        self.start = start
        self.stop = stop
        self.flank_ins = flank_ins
        self.flank_del = flank_del
        self.stut_size = stut_size      # tuple[int] per block
        self.stut_valid = stut_valid    # tuple[bool] per block
        self.str_bytes = str_bytes      # tuple[bytes] per block
        self.flank_bytes = flank_bytes  # tuple[bytes] per block
        self._cig_ops = cig_ops
        self._cig_num = cig_num
        self._aln_bytes = aln_bytes
        self._seq = seq
        self._quals = quals
        self._traced = None

    # -- AlignmentTrace-compatible accessors --------------------------------
    def has_stutter(self) -> bool:
        return any(v and s != 0 for v, s in zip(self.stut_valid,
                                                self.stut_size))

    def total_stutter_size(self) -> int:
        return sum(s for v, s in zip(self.stut_valid, self.stut_size) if v)

    def stutter_size(self, block_index: int) -> int:
        assert self.stut_valid[block_index]
        return self.stut_size[block_index]

    def str_seq_bytes(self, block_index: int) -> bytes:
        assert self.stut_valid[block_index]
        return self.str_bytes[block_index]

    def str_seq(self, block_index: int) -> str:
        return self.str_seq_bytes(block_index).decode("latin1")

    def flank_seq(self, block_index: int) -> str:
        return self.flank_bytes[block_index].decode("latin1")

    def flank_seq_bytes(self, block_index: int) -> bytes:
        return self.flank_bytes[block_index]

    def has_flank_indel(self) -> bool:
        return self.flank_ins != 0 or self.flank_del != 0

    @property
    def flank_ins_size(self) -> int:
        return self.flank_ins

    @property
    def flank_del_size(self) -> int:
        return self.flank_del

    @property
    def traced_aln(self) -> Alignment:
        """Materialize the read->reference Alignment (viz path only)."""
        t = self._traced
        if t is None:
            aligned = self._aln_bytes.decode("latin1")
            t = Alignment(self.start, self.stop, False, "TRACE",
                          self._quals, self._seq, aligned)
            t.cigar = [CigarElement(chr(op), int(n)) for op, n in
                       zip(self._cig_ops, self._cig_num)]
            self._traced = t
        return t


def summary_from_trace(LL: float, trace: AlignmentTrace,
                       num_blocks: int) -> TraceSummary:
    """Fallback: derive a TraceSummary from a full AlignmentTrace."""
    stut_size = []
    stut_valid = []
    str_bytes = []
    for b in range(num_blocks):
        d = trace._str_data[b]
        stut_valid.append(d is not None)
        stut_size.append(d[0] if d is not None else 0)
        str_bytes.append(d[1].encode("latin1") if d is not None else b"")
    flank_bytes = tuple(s.encode("latin1") for s in trace.flank_seqs)
    ta = trace.traced_aln
    s = TraceSummary(LL, ta.start, ta.stop, trace.flank_ins_size,
                     trace.flank_del_size, tuple(stut_size),
                     tuple(stut_valid), tuple(str_bytes), flank_bytes,
                     None, None, None, ta.sequence, ta.base_qualities)
    s._traced = ta
    return s


def compute_summaries(haplotype: Haplotype, jobs,
                      hap_info: HapAlignInfo,
                      n_threads: int = 0) -> Optional[List[TraceSummary]]:
    """Compute TraceSummaries for many (h, pooled_aln, seed_base, blw, blc)
    jobs of one locus in one native call; job order preserved.  Jobs the
    native side rejects fall back to the object path; returns None when the
    native entry is unavailable (caller uses the object path wholesale).
    """
    from .. import native as _native
    if not jobs:
        return []
    lib_ok = _native.available() and hasattr(_native._load(),
                                             "hmm_trace_summary_batch")
    if not lib_ok:
        return None
    from .hmm_reference import seed_meta as _seed_meta
    njobs = []
    hap_infos = []
    for h, aln, seed_base, blw, blc in jobs:
        fw, rev = _instances_for(haplotype, h)
        mid_rows, mid_chars, slp, first_code, last_code = _seed_meta(fw)
        codes = getattr(aln, "_codes_np", None)
        if codes is None:
            codes = np.frombuffer(aln.sequence.encode("latin1"),
                                  dtype=np.uint8)
            aln._codes_np = codes
        njobs.append((codes,
                      np.ascontiguousarray(blw, dtype=np.float64),
                      np.ascontiguousarray(blc, dtype=np.float64),
                      seed_base, fw, rev, mid_rows, mid_chars, slp,
                      first_code, last_code))
        hap_infos.append(hap_info.aln_info_bytes(h))
    out = _native.hmm_trace_summary_batch_native(
        njobs, hap_infos, haplotype.blocks[0].start,
        MIN_SNP_LOG_PROB_CORRECT, TRACE_LL_TOL,
        n_threads or trace_threads())
    if out is None:
        return None

    nb = haplotype.num_blocks()
    rcs = out["rc"]
    LLs = out["LL"]
    starts = out["start"]
    stops = out["stop"]
    fins = out["flank_ins"]
    fdels = out["flank_del"]
    ssz = out["stut_size"]
    sva = out["stut_valid"]
    spool = out["str_pool"]
    soff = out["str_off"]
    slen = out["str_len"]
    fpool = out["flank_pool"]
    foff = out["flank_off"]
    flen = out["flank_len"]
    cops = out["cigar_ops"]
    cnum = out["cigar_num"]
    ncig = out["n_cigar"]
    apool = out["aln_pool"]
    alen = out["aln_len"]
    ssz_l = ssz.tolist()
    sva_l = sva.tolist()
    soff_l = soff.tolist()
    slen_l = slen.tolist()
    foff_l = foff.tolist()
    flen_l = flen.tolist()
    rc_l = rcs.tolist()
    LL_l = LLs.tolist()
    start_l = starts.tolist()
    stop_l = stops.tolist()
    fin_l = fins.tolist()
    fdel_l = fdels.tolist()
    ncig_l = ncig.tolist()
    alen_l = alen.tolist()

    results: List[TraceSummary] = []
    for i, (h, aln, seed_base, blw, blc) in enumerate(jobs):
        if rc_l[i] != 0:
            LL, trace = trace_optimal_aln(haplotype, h, aln, seed_base,
                                          blw, blc, hap_info)
            results.append(summary_from_trace(LL, trace, nb))
            continue
        srow = spool[i]
        frow = fpool[i]
        so, sl = soff_l[i], slen_l[i]
        fo, fl = foff_l[i], flen_l[i]
        str_bytes = tuple(srow[so[b]:so[b] + sl[b]].tobytes()
                          for b in range(nb))
        flank_bytes = tuple(frow[fo[b]:fo[b] + fl[b]].tobytes()
                            for b in range(nb))
        nc = ncig_l[i]
        results.append(TraceSummary(
            LL_l[i], start_l[i], stop_l[i], fin_l[i], fdel_l[i],
            tuple(ssz_l[i][:nb]), tuple(bool(v) for v in sva_l[i][:nb]),
            str_bytes, flank_bytes,
            cops[i, :nc], cnum[i, :nc],
            apool[i, :alen_l[i]].tobytes(),
            aln.sequence, aln.base_qualities))
    return results


def summaries_via_objects(haplotype: Haplotype, jobs,
                          hap_info: HapAlignInfo,
                          n_threads: int = 0) -> List[TraceSummary]:
    """Object-path summaries (no native library): one trace at a time
    through trace_optimal_aln, converted to TraceSummaries."""
    from .retrace import trace_batch
    nb = haplotype.num_blocks()
    res = trace_batch(haplotype, jobs, hap_info, n_threads=n_threads)
    out: List[TraceSummary] = []
    if res is not None:
        for LL, trace in res:
            out.append(summary_from_trace(LL, trace, nb))
        return out
    for h, aln, seed_base, blw, blc in jobs:
        LL, trace = trace_optimal_aln(haplotype, h, aln, seed_base, blw,
                                      blc, hap_info)
        out.append(summary_from_trace(LL, trace, nb))
    return out


def trace_summaries(haplotype: Haplotype, jobs, hap_info: HapAlignInfo,
                    n_threads: int = 0) -> List[TraceSummary]:
    """Native columnar summaries with automatic object-path fallback."""
    res = compute_summaries(haplotype, jobs, hap_info, n_threads=n_threads)
    if res is None:
        res = summaries_via_objects(haplotype, jobs, hap_info,
                                    n_threads=n_threads)
    return res
