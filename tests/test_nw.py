"""Needleman-Wunsch aligner tests: score consistency, indel recovery,
left-alignment of indels in repeats."""

import numpy as np
import pytest

from hipstr_tpu.align.nw import (
    GAPEXTEND, GAPOPEN, MATCH, MISMATCH, align, cigar_from_alignment,
    left_align, left_shift_indels,
)


def score_alignment(ref_al, read_al):
    """Rescoring helper mirroring NeedlemanWunsch::ScoreAlignment
    (NeedlemanWunsch.cpp:537-573): leading/trailing reference overhang free."""
    start = 0
    while start < len(read_al) and read_al[start] == "-":
        start += 1
    stop = len(read_al) - 1
    while stop >= 0 and read_al[stop] == "-":
        stop -= 1
    score, ref_gap, read_gap = 0.0, False, False
    for i in range(start, stop + 1):
        if ref_al[i] == "-":
            score -= GAPEXTEND if ref_gap else GAPOPEN
            ref_gap = True
        elif read_al[i] == "-":
            score -= GAPEXTEND if read_gap else GAPOPEN
            read_gap = True
        else:
            ref_gap = read_gap = False
            same = (ref_al[i].upper() == read_al[i].upper()
                    or "N" in (ref_al[i].upper(), read_al[i].upper()))
            score += MATCH if same else MISMATCH
    return score


def test_exact_match():
    ok, ra, qa, score, cigar = align("ACGTACGTACGT", "GTACGT")
    assert ok
    assert score == 12.0
    assert [c.type for c in cigar] == ["="]


def test_deletion_recovered():
    ref = "AAACCCGGGTTTACGTACGT"
    read = ref[:8] + ref[11:]
    ok, ra, qa, score, cigar = align(ref, read)
    assert ok
    types = "".join(c.type * c.num for c in cigar)
    assert "DDD" in types
    assert np.isclose(score_alignment(ra, qa), score)


def test_insertion_recovered():
    ref = "AAACCCGGGTTTACGTACGT"
    read = ref[:10] + "TAG" + ref[10:]
    ok, ra, qa, score, cigar = align(ref, read)
    assert ok
    types = "".join(c.type * c.num for c in cigar)
    assert "III" in types
    assert np.isclose(score_alignment(ra, qa), score)


@pytest.mark.parametrize("trial", range(20))
def test_score_consistency_random(trial):
    rng = np.random.default_rng(trial)
    ref = "".join(rng.choice(list("ACGT"), size=60))
    start = rng.integers(0, 20)
    read = list(ref[start:start + 30])
    for _ in range(rng.integers(0, 3)):
        op = rng.integers(0, 3)
        p = rng.integers(1, len(read) - 1)
        if op == 0:
            read[p] = rng.choice(list("ACGT"))
        elif op == 1 and len(read) > 10:
            del read[p]
        else:
            read.insert(p, rng.choice(list("ACGT")))
    read = "".join(read)
    ok, ra, qa, score, cigar = align(ref, read)
    assert ok
    # reported score equals re-scored alignment
    assert np.isclose(score_alignment(ra, qa), score, atol=1e-3)
    # alignment strings reproduce the inputs
    assert qa.replace("-", "") == read
    assert ra.replace("-", "") == ref


def test_left_alignment_in_repeat():
    # deletion of one CAG unit should left-align to the first repeat position
    ref = "TTTGA" + "CAG" * 6 + "GATTT"
    read = "TTTGA" + "CAG" * 5 + "GATTT"
    ok, ra, qa, score, cigar = left_align(ref, read)
    assert ok
    first_gap = qa.index("-")
    assert first_gap == 5, (ra, qa)
    ok2, ra2, qa2, score2, cigar2 = align(ref, read)
    assert np.isclose(score_alignment(ra, qa), score_alignment(ra2, qa2))


def test_left_alignment_insertion_in_repeat():
    ref = "TTTGA" + "CA" * 5 + "GGTTT"
    read = "TTTGA" + "CA" * 6 + "GGTTT"
    ok, ra, qa, score, cigar = left_align(ref, read)
    assert ok
    # leftmost valid placement inserts "AC" right after TTTG (index 4)
    first_gap = ra.index("-")
    assert first_gap == 4, (ra, qa)


def test_cigar_from_alignment_roundtrip():
    ok, ra, qa, score, cigar = align("ACGTACGTAA", "CGTACG")
    c2 = cigar_from_alignment(ra, qa)
    assert [c.type for c in c2] == [c.type for c in cigar]
    assert [c.num for c in c2] == [c.num for c in cigar]
