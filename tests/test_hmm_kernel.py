"""Batched device HMM vs the reference-semantics oracle.

Every [pool, haplotype] log-likelihood from the jitted kernel must match the
literal per-read transcription of the reference DP (float64, CPU).
"""

import numpy as np
import pytest

from hipstr_tpu.align.haplotype import HapBlock, Haplotype, RepeatInfo
from hipstr_tpu.align.hmm_reference import process_read
from hipstr_tpu.models.base_quality import BaseQuality
from hipstr_tpu.models.stutter import StutterModel
from hipstr_tpu.pipeline.hap_aligner import compute_hap_log_likelihoods

BASES = "ACGT"


def _random_seq(rng, n):
    return "".join(rng.choice(list(BASES), size=n))


def _mk_haplotype(rng, period, units, lflank=12, rflank=11, n_rep_alts=2,
                  n_flank_alts=0):
    sm = StutterModel.default(period)
    lseq = _random_seq(rng, lflank)
    left = HapBlock(1000, 1000 + lflank, lseq)
    for _ in range(n_flank_alts):
        alt = list(lseq)
        alt[rng.integers(0, lflank)] = rng.choice(list(BASES))
        left.add_alternate("".join(alt))
    motif = _random_seq(rng, period)
    rep_seq = motif * units
    rep = HapBlock(1000 + lflank, 1000 + lflank + len(rep_seq), rep_seq,
                   RepeatInfo(period, sm))
    added = set()
    for _ in range(n_rep_alts):
        d = int(rng.integers(-2, 3))
        alt = motif * max(1, units + d)
        if rng.random() < 0.3:
            alt = alt + motif[:max(1, period - 1)]  # out-of-frame alt
        if alt != rep_seq and alt not in added:
            rep.add_alternate(alt)
            added.add(alt)
    right = HapBlock(rep.end, rep.end + rflank, _random_seq(rng, rflank))
    return Haplotype([left, rep, right])


def _reads_from_hap(rng, hap, n_reads, read_len):
    bq = BaseQuality()
    seqs, quals, seeds = [], [], []
    for _ in range(n_reads):
        h = int(rng.integers(0, hap.num_combs))
        full = hap.seq(h)
        if len(full) >= read_len:
            start = int(rng.integers(0, len(full) - read_len + 1))
            s = full[start:start + read_len]
        else:
            s = full + _random_seq(rng, read_len - len(full))
        # add sequencing errors
        s = list(s)
        for i in range(len(s)):
            if rng.random() < 0.02:
                s[i] = rng.choice(list(BASES))
        seqs.append("".join(s))
        quals.append("".join(chr(int(q)) for q in rng.integers(53, 74, read_len)))
        seeds.append(int(rng.integers(1, read_len - 1)))
    return seqs, quals, seeds


@pytest.mark.parametrize("period,units,n_rep_alts,n_flank_alts,seed", [
    (2, 5, 2, 0, 1),
    (1, 7, 2, 0, 2),
    (3, 4, 2, 0, 3),
    (4, 4, 1, 1, 4),
    (2, 5, 0, 0, 5),
])
def test_kernel_matches_oracle(period, units, n_rep_alts, n_flank_alts, seed):
    rng = np.random.default_rng(seed)
    hap = _mk_haplotype(rng, period, units, n_rep_alts=n_rep_alts,
                        n_flank_alts=n_flank_alts)
    bq = BaseQuality()
    seqs, quals, seeds = _reads_from_hap(rng, hap, n_reads=3, read_len=30)

    LL = compute_hap_log_likelihoods(hap, seqs, quals, seeds, dtype="float64")
    assert LL.shape == (3, hap.num_combs)

    for p in range(len(seqs)):
        blw = bq.quals_to_log_error(quals[p])
        blc = bq.quals_to_log_correct(quals[p])
        for h in range(hap.num_combs):
            want = process_read(hap, h, seqs[p], seeds[p], blw, blc)
            got = LL[p, h]
            assert np.isclose(got, want, rtol=1e-8, atol=1e-8), (
                p, h, got, want)
    # all LLs are proper log-probabilities
    assert np.all(LL < 1e-8)
