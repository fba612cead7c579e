"""ctypes bindings for the native host kernels (native/nw_kernel.cpp).

The library is built lazily with `make -C native` on first use; every entry
point has a pure-Python fallback so the framework stays fully functional
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhipstr_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("HIPSTR_TPU_NO_NATIVE"):
            return None
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR, "-s"],
                               check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.nw_align.restype = ctypes.c_float
        lib.nw_align.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32)]
        lib.bgzf_inflate_all.restype = ctypes.c_int64
        lib.bgzf_inflate_all.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64]
        vp = ctypes.c_void_p
        lib.hmm_fill_dp.restype = ctypes.c_int32
        # raw data pointers: cheaper per call than typed POINTER casts, and
        # the meta pointer block is cached per haplotype instance
        lib.hmm_fill_dp.argtypes = [
            vp, ctypes.c_int32, vp, vp,                            # seq,L,blw,blc
            ctypes.c_int32, ctypes.c_int32,                        # H, n_blocks
            vp, vp, vp,                                            # row meta
            ctypes.c_int32,                                        # n_st
            vp, vp, vp, vp, vp, vp, vp, vp, vp,                    # st tables
            vp, vp, vp, vp,                                        # nD/art_off/art/lpmf
            vp, vp, vp,                                            # m2m/m2i/m2d
            ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double,                      # i2i,i2m,d2d,d2m
            vp, vp, vp, vp, vp, vp]                                # outputs
        vp2 = ctypes.c_void_p
        lib.hmm_retrace_walk.restype = ctypes.c_int32
        lib.hmm_retrace_walk.argtypes = (
            [vp2, ctypes.c_int32, vp2,                       # seq, seg_len, blc
             ctypes.c_int32, vp2, vp2, vp2, vp2, vp2, vp2, vp2,  # blocks+homop
             ctypes.c_int32,                                 # reversed
             ctypes.c_int32, ctypes.c_int32,
             ctypes.c_int32, ctypes.c_int32,                 # start state
             vp2, vp2, vp2, ctypes.c_int32,                  # M I D Lcols
             vp2, vp2,                                       # bas bap
             vp2, vp2, vp2,                                  # m2m m2i m2d
             ctypes.c_double, ctypes.c_double,
             ctypes.c_double, ctypes.c_double,               # i2i i2m d2d d2m
             ctypes.c_double, ctypes.c_double]               # min_snp, tol
            + [vp2] * 16)
        lib.stitch_ops.restype = ctypes.c_int32
        lib.stitch_ops.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_char_p]
        for fn in (lib.prefix_match_counts, lib.suffix_match_counts):
            fn.restype = None
            fn.argtypes = [ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p,
                           ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                           ctypes.c_void_p]
        for fn in (lib.adapter_trim_3p, lib.adapter_trim_5p):
            fn.restype = ctypes.c_int32
            fn.argtypes = [ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p,
                           ctypes.POINTER(ctypes.c_int32),
                           ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
                           ctypes.c_int32, ctypes.c_double]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def nw_align_native(ref_seq: str, read_seq: str,
                    use_ref_end_penalty: bool
                    ) -> Optional[Tuple[str, str, float]]:
    """Returns (ref_al, read_al, score) or None when the library is absent."""
    lib = _load()
    if lib is None:
        return None
    cap = len(ref_seq) + len(read_seq) + 2
    ra = ctypes.create_string_buffer(cap)
    qa = ctypes.create_string_buffer(cap)
    out_len = ctypes.c_int32(0)
    score = lib.nw_align(ref_seq.encode("latin1"), len(ref_seq),
                         read_seq.encode("latin1"), len(read_seq),
                         1 if use_ref_end_penalty else 0, ra, qa,
                         ctypes.byref(out_len))
    n = out_len.value
    return (ra.raw[:n].decode("latin1"), qa.raw[:n].decode("latin1"),
            float(score))


def hmm_fill_dp_native(seq_codes, blw, blc, meta, match, insert, delete,
                       best_art_size, best_art_pos):
    """Fill the per-(read, haplotype) DP matrices in C++.

    `meta` is the flat row/stutter metadata tuple built by
    align.hmm_reference.HaplotypeInstance.native_meta().  Returns left_prob
    or None when the library is absent.
    """
    lib = _load()
    if lib is None:
        return None
    # meta[-1] is the precomputed pointer/scalar argument block; the arrays
    # it points into are owned by the same meta tuple, so the raw addresses
    # stay valid for its lifetime (built in HaplotypeInstance.native_meta)
    out_lp = ctypes.c_double(0.0)
    rc = lib.hmm_fill_dp(
        seq_codes.ctypes.data, len(seq_codes), blw.ctypes.data,
        blc.ctypes.data, *meta[-1],
        match.ctypes.data, insert.ctypes.data, delete.ctypes.data,
        best_art_size.ctypes.data, best_art_pos.ctypes.data,
        ctypes.byref(out_lp))
    if rc != 0:
        return None
    return out_lp.value


def hmm_retrace_walk_native(seq_codes, blc, walk_meta, reversed_flag,
                            block_index, base_index, row, col,
                            M, I, D, bas, bap, min_snp_lpc, tol):
    """C traceback walk; returns the raw event arrays or None.

    walk_meta is HaplotypeInstance.walk_meta(): (n_blocks, bseq_pool,
    blk_off, blk_len, blk_is_stutter, blk_src_start, homop_pool, homop_off,
    m2m, m2i, m2d, i2i, i2m, d2d, d2m, ptr_block).
    """
    lib = _load()
    if lib is None:
        return None
    import numpy as np
    seg_len = len(seq_codes)
    n_rows = M.shape[0]
    cap = n_rows + seg_len + 8
    aln = np.empty(cap, dtype=np.uint8)
    aln_len = ctypes.c_int32(0)
    nb = walk_meta[0]
    frag_block = np.empty(nb + 2, dtype=np.int32)
    frag_end = np.empty(nb + 2, dtype=np.int32)
    n_frags = ctypes.c_int32(0)
    frag_pool = np.empty(seg_len + 2, dtype=np.uint8)
    str_block = np.empty(nb + 1, dtype=np.int32)
    str_size = np.empty(nb + 1, dtype=np.int32)
    str_end = np.empty(nb + 1, dtype=np.int32)
    n_str = ctypes.c_int32(0)
    str_pool = np.empty(seg_len + 2, dtype=np.uint8)
    snp_pos = np.empty(seg_len + 2, dtype=np.int32)
    snp_base = np.empty(seg_len + 2, dtype=np.uint8)
    n_snps = ctypes.c_int32(0)
    indel_pos = np.empty(cap, dtype=np.int64)
    indel_size = np.empty(cap, dtype=np.int64)
    n_indels = ctypes.c_int32(0)
    flank_ins = ctypes.c_int32(0)
    flank_del = ctypes.c_int32(0)
    i2i, i2m, d2d, d2m = walk_meta[11:15]
    rc = lib.hmm_retrace_walk(
        seq_codes.ctypes.data, seg_len, blc.ctypes.data,
        *walk_meta[15],
        int(reversed_flag), block_index, base_index, row, col,
        M.ctypes.data, I.ctypes.data, D.ctypes.data, M.shape[1],
        bas.ctypes.data, bap.ctypes.data,
        walk_meta[8].ctypes.data, walk_meta[9].ctypes.data,
        walk_meta[10].ctypes.data, i2i, i2m, d2d, d2m,
        min_snp_lpc, tol,
        aln.ctypes.data, ctypes.byref(aln_len),
        frag_block.ctypes.data, frag_end.ctypes.data, ctypes.byref(n_frags),
        frag_pool.ctypes.data,
        str_block.ctypes.data, str_size.ctypes.data, str_end.ctypes.data,
        ctypes.byref(n_str), str_pool.ctypes.data,
        snp_pos.ctypes.data, snp_base.ctypes.data, ctypes.byref(n_snps),
        indel_pos.ctypes.data, indel_size.ctypes.data, ctypes.byref(n_indels),
        ctypes.byref(flank_ins), ctypes.byref(flank_del))
    if rc != 0:
        return None
    return (aln[:aln_len.value], frag_block[:n_frags.value],
            frag_end[:n_frags.value], frag_pool,
            str_block[:n_str.value], str_size[:n_str.value],
            str_end[:n_str.value], str_pool,
            snp_pos[:n_snps.value], snp_base[:n_snps.value],
            indel_pos[:n_indels.value], indel_size[:n_indels.value],
            int(flank_ins.value), int(flank_del.value))


def stitch_ops_native(hap_aln: str, read_aln: str, h_index: int,
                      r_index: int, increment: int):
    """Op-string merge in C; None when unavailable or on bad op pairs."""
    lib = _load()
    if lib is None:
        return None
    cap = len(hap_aln) + len(read_aln) + 2
    out = ctypes.create_string_buffer(cap)
    n = lib.stitch_ops(hap_aln.encode("latin1"), len(hap_aln),
                       read_aln.encode("latin1"), len(read_aln),
                       h_index, r_index, increment, out)
    if n < 0:
        return None
    return out.raw[:n].decode("latin1")


def end_match_counts_native(s1: str, s2: str, lo: int, hi: int,
                            suffix: bool):
    """prefix/suffix end-match window scan in C; None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    import numpy as np
    n = hi - lo + 1
    if n <= 0:
        return []
    out = np.empty(n, dtype=np.int32)
    fn = lib.suffix_match_counts if suffix else lib.prefix_match_counts
    fn(s1.encode("latin1"), len(s1), s2.encode("latin1"), len(s2),
       lo, hi, out.ctypes.data)
    return out.tolist()


def adapter_trim_native(bases: str, adapters, min_overlap: int,
                        max_err: float, five_prime: bool) -> Optional[int]:
    """Adapter-overlap search in C; None when the library is absent."""
    lib = _load()
    if lib is None:
        return None
    blob = "".join(adapters).encode("latin1")
    offs = (ctypes.c_int32 * len(adapters))()
    lens = (ctypes.c_int32 * len(adapters))()
    o = 0
    for i, a in enumerate(adapters):
        offs[i] = o
        lens[i] = len(a)
        o += len(a)
    fn = lib.adapter_trim_5p if five_prime else lib.adapter_trim_3p
    return int(fn(bases.encode("latin1"), len(bases), blob, offs, lens,
                  len(adapters), min_overlap, max_err))


def bgzf_inflate_native(data: bytes, expected_cap: int) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(expected_cap)
    n = lib.bgzf_inflate_all(data, len(data), out, expected_cap)
    if n < 0:
        return None
    return out.raw[:n]
