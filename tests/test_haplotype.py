"""Haplotype enumeration and structure tests.

Mirrors the reference's haplotype property test (reference:
test/haplotype_test.cpp:12-67): forward/reverse iterators stay in sync over
the full Gray-code enumeration, plus closed-form digit checks against a
literal simulation of the reference's next() iterator.
"""

import numpy as np
import pytest

from hipstr_tpu.align.haplotype import (
    HapBlock, Haplotype, RepeatInfo, gray_digits,
)
from hipstr_tpu.models.stutter import StutterModel


def simulate_reference_next(nopts):
    """Literal simulation of Haplotype::init/next (Haplotype.cpp:123-196)."""
    n = len(nopts)
    factors, dirs, counts = [0] * n, [1] * n, [0] * n
    ncombs = 1
    for i in range(n):
        factors[i] = ncombs
        ncombs *= nopts[i]
    states = [tuple(counts)]
    for counter in range(ncombs - 1):
        t = counter + 1
        index = -1
        for j in range(n - 1, -1, -1):
            t %= factors[j]
            if t == 0:
                index = j
                break
        counts[index] += dirs[index]
        if counts[index] == 0 or counts[index] == nopts[index] - 1:
            dirs[index] *= -1
        states.append(tuple(counts))
    return states


@pytest.mark.parametrize("nopts", [[2, 3], [1, 4], [3, 1, 2], [2, 2, 2], [5], [4, 3, 2]])
def test_gray_digits_match_reference_iterator(nopts):
    states = simulate_reference_next(nopts)
    for h, expected in enumerate(states):
        assert tuple(gray_digits(h, nopts)) == expected


@pytest.mark.parametrize("nopts", [[2, 3, 4], [3, 3]])
def test_gray_inverse(nopts):
    blocks = []
    for n in nopts:
        b = HapBlock(0, 3, "ACT")
        for i in range(n - 1):
            b.add_alternate("ACT" + "G" * (i + 1))
        blocks.append(b)
    hap = Haplotype(blocks)
    for h in range(hap.num_combs):
        assert hap.hap_index_for_options(hap.digits(h)) == h


def _make_test_haplotype():
    sm = StutterModel.default(2)
    left = HapBlock(100, 110, "ACGTACGTAC")
    left.add_alternate("ACGTACATAC")
    rep = HapBlock(110, 118, "ACACACAC", RepeatInfo(2, sm))
    rep.add_alternate("ACACAC")
    rep.add_alternate("ACACACACAC")
    right = HapBlock(118, 126, "GGTTAACC")
    return Haplotype([left, rep, right])


def test_fw_rev_sequences_mirror():
    """reverse(rev_seq) == fw_seq across the full enumeration
    (reference property: test/haplotype_test.cpp)."""
    hap = _make_test_haplotype()
    rev = hap.reverse()
    for h in range(hap.num_combs):
        fw_seq = hap.seq(h)
        rev_digits = hap.reversed_digits(h)
        rev_seq = "".join(b.get_seq(d) for b, d in zip(rev.blocks, rev_digits))
        assert rev_seq[::-1] == fw_seq


def test_homopolymer_reference_carry_quirk():
    # "AAAA": reference rlens become [6,5,4,0] due to the counter carry
    # (HapBlock.cpp:7-30); llens are clean [0,1,2,3].
    b = HapBlock(0, 4, "AAAA")
    assert [b.left_homopolymer_len(0, i) for i in range(4)] == [0, 1, 2, 3]
    assert [b.right_homopolymer_len(0, i) for i in range(4)] == [6, 5, 4, 0]


def test_homopolymer_cross_block():
    hap = _make_test_haplotype()
    # first base of right block 'G'; left neighbor block ends with 'C' -> no
    # extension leftward; right run of G is 1 more
    assert hap.homopolymer_length(0, 2, 0) >= 2


def test_stutter_model_pmf_grid_matches_scalar():
    sm = StutterModel(0.9, 0.05, 0.08, 0.8, 0.01, 0.02, 3)
    sample = 30
    reads = np.arange(10, 55)
    grid = sm.log_pmf_grid(sample, reads)
    for r, g in zip(reads, grid):
        assert np.isclose(g, sm.log_pmf(sample, int(r)), rtol=0, atol=1e-12)
    # PMF sums to <= 1 over a wide support
    total = np.exp(sm.log_pmf_grid(sample, np.arange(-300, 400))).sum()
    assert total <= 1.0 + 1e-9


def test_stutter_model_roundtrip():
    sm = StutterModel(0.9, 0.05, 0.08, 0.8, 0.01, 0.02, 3)
    line = sm.to_line()
    sm2 = StutterModel.from_tokens(line.split())
    assert sm.parameters_within_threshold(sm2, 1e-9)
