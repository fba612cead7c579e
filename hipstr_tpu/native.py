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


def bgzf_inflate_native(data: bytes, expected_cap: int) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(expected_cap)
    n = lib.bgzf_inflate_all(data, len(data), out, expected_cap)
    if n < 0:
        return None
    return out.raw[:n]
