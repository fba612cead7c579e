"""Dense stutter-emission formulation vs the reference-semantics oracle.

The oracle (hipstr_tpu.align.hmm_reference.StutterAlignerOracle) is a literal
transcription of the reference's incremental position-marginalization
(src/SeqAlignment/StutterAlignerClass.cpp); the dense version
(hipstr_tpu.ops.stutter_emission) is the closed-form the TPU kernel uses.
They must agree to float64 rounding on randomized sequences.
"""

import numpy as np
import pytest

from hipstr_tpu.align.haplotype import RepeatInfo
from hipstr_tpu.align.hmm_reference import StutterAlignerOracle
from hipstr_tpu.models.stutter import StutterModel
from hipstr_tpu.ops.stutter_emission import stutter_emissions, NEG_INF

BASES = "ACGT"


def _random_case(rng, period, n_units, read_len, pure_repeat=True):
    motif = "".join(rng.choice(list(BASES), size=period))
    block = motif * n_units
    if not pure_repeat:
        # out-of-frame / impure blocks
        block = "".join(rng.choice(list(BASES), size=len(block) + rng.integers(-2, 3)))
    read = "".join(rng.choice(list(BASES), size=read_len))
    quals = rng.integers(10, 42, size=read_len)
    blc = np.log(1 - 10.0 ** (-quals / 10))
    blw = np.log(10.0 ** (-quals / 10) / 3)
    return block, read, blw, blc


def _codes(s):
    return np.array([BASES.index(c) if c in BASES else 4 for c in s], dtype=np.int32)


@pytest.mark.parametrize("period,n_units,read_len,pure", [
    (1, 8, 20, True),
    (2, 5, 30, True),
    (3, 4, 25, True),
    (4, 6, 60, True),
    (2, 5, 30, False),
    (3, 3, 12, False),
    (6, 3, 40, True),
    (2, 12, 18, True),   # read shorter than block
])
def test_dense_matches_oracle(period, n_units, read_len, pure):
    rng = np.random.default_rng(hash((period, n_units, read_len, pure)) % 2**32)
    for trial in range(8):
        block, read, blw, blc = _random_case(rng, period, n_units, read_len, pure)
        block_len = len(block)
        if block_len == 0:
            continue
        sm = StutterModel.default(period)
        rinfo = RepeatInfo(period, sm)
        rinfo.allele_sizes.append(block_len)
        oracle = StutterAlignerOracle(block, period, left_align=True,
                                      repeat_info=rinfo)
        oracle.load_read(read, blw, blc)

        Bmax = block_len + 4
        brev = _codes(block[::-1])
        brev = np.concatenate([brev, np.full(Bmax - block_len, 4, np.int32)])
        E = stutter_emissions(np, _codes(read), blw, blc, brev, block_len, period)

        L = read_len
        art_sizes = np.arange(-6 * period, 6 * period + 1, period)
        for j in range(L):
            offset = L - 1 - j
            for ai, D in enumerate(art_sizes):
                base_len = min(block_len + D, j + 1)
                if base_len < 0:
                    assert E[j, ai] <= NEG_INF / 2, (j, D)
                    continue
                want, _ = oracle.align_stutter_region_reverse(base_len, j, offset, int(D))
                got = E[j, ai]
                assert np.isfinite(want)
                assert np.isclose(got, want, rtol=1e-9, atol=1e-9), (
                    j, D, got, want, block, read)


@pytest.mark.parametrize("period,n_units,read_len,pure", [
    (1, 8, 20, True),
    (2, 5, 30, True),
    (3, 4, 25, True),
    (4, 6, 60, True),
    (2, 5, 30, False),
    (3, 3, 12, False),
    (6, 3, 40, True),
    (2, 12, 18, True),
])
def test_tpu_variant_matches_generic(period, n_units, read_len, pure):
    from hipstr_tpu.ops.stutter_emission import stutter_emissions_tpu
    rng = np.random.default_rng(hash(("tpu", period, n_units, read_len, pure)) % 2**32)
    for trial in range(4):
        block, read, blw, blc = _random_case(rng, period, n_units, read_len, pure)
        Bmax = len(block) + 6 * period + 3
        rev = np.full(Bmax, 4, dtype=np.int32)
        rev[:len(block)] = _codes(block[::-1])
        for blen in {len(block), max(1, len(block) - period)}:
            ref = stutter_emissions(np, _codes(read), blw, blc, rev, blen,
                                    period=period, max_units=6)
            got = stutter_emissions_tpu(np, _codes(read), blw, blc, rev, blen,
                                        period=period, max_units=6)
            np.testing.assert_allclose(got.T, ref, rtol=1e-12, atol=1e-12)
