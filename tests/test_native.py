"""Native C++ kernel tests: NW equivalence with the Python DP, BGZF inflate."""

import os

import numpy as np
import pytest

import hipstr_tpu.native as nat
from hipstr_tpu.align import nw


def _python_align(ref, read, pen):
    os.environ["HIPSTR_TPU_NO_NATIVE"] = "1"
    nat._tried = False
    nat._lib = None
    try:
        return nw.align(ref, read, pen)
    finally:
        os.environ.pop("HIPSTR_TPU_NO_NATIVE")
        nat._tried = False
        nat._lib = None


@pytest.mark.skipif(not nat.available(), reason="native library not built")
def test_native_nw_matches_python():
    rng = np.random.default_rng(0)
    for trial in range(30):
        ref = "".join(rng.choice(list("ACGT"), size=60))
        start = rng.integers(0, 20)
        read = list(ref[start:start + 30])
        for _ in range(rng.integers(0, 3)):
            p = int(rng.integers(1, len(read) - 1))
            op = rng.integers(0, 3)
            if op == 0:
                read[p] = rng.choice(list("ACGT"))
            elif op == 1 and len(read) > 10:
                del read[p]
            else:
                read.insert(p, rng.choice(list("ACGT")))
        read = "".join(read)
        for pen in (False, True):
            got = nat.nw_align_native(ref, read, pen)
            assert got is not None
            ok, ra, qa, score, cig = _python_align(ref, read, pen)
            nra, nqa, nscore = got
            assert abs(nscore - score) < 1e-3
            assert (nra, nqa) == (ra, qa), (trial, pen)


@pytest.mark.skipif(not nat.available(), reason="native library not built")
def test_native_bgzf_roundtrip(tmp_path):
    from hipstr_tpu.io.bgzf import BgzfReader, BgzfWriter
    rng = np.random.default_rng(1)
    data = bytes(rng.integers(0, 255, size=300000, dtype=np.uint8))
    path = str(tmp_path / "t.bgzf")
    w = BgzfWriter(path)
    w.write(data)
    w.close()
    assert BgzfReader(path).read_all() == data
