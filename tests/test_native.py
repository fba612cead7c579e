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


def test_native_hmm_dp_matches_oracle():
    """native/hmm_kernel.cpp fills identical DP matrices + artifact summaries
    as the Python oracle on randomized loci (fw + rev segments)."""
    import numpy as np
    from tests.test_hmm_kernel import _mk_haplotype, _reads_from_hap
    from hipstr_tpu.align import hmm_reference as hr
    from hipstr_tpu.models.base_quality import BaseQuality
    from hipstr_tpu import native

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(12)
    bq = BaseQuality()
    for trial in range(4):
        period = int(rng.integers(1, 5))
        units = int(rng.integers(4, 10))
        hap = _mk_haplotype(rng, period, units, n_rep_alts=2,
                            n_flank_alts=trial % 2)
        seqs, quals, _ = _reads_from_hap(rng, hap, 4, 60)
        for h in range(min(hap.num_combs, 3)):
            for rev_flag in (False, True):
                hi = hr.HaplotypeInstance(hap, h, rev_flag)
                for seq, q in zip(seqs, quals):
                    s = seq[::-1] if rev_flag else seq
                    qq = q[::-1] if rev_flag else q
                    blw = np.array([bq.log_prob_error(c) - np.log(3.0)
                                    for c in qq])
                    blc = np.array([bq.log_prob_correct(c) for c in qq])
                    out_n = hr.align_seq_to_hap(hi, s, blw, blc)
                    real = native.available
                    native.available = lambda: False
                    try:
                        out_p = hr.align_seq_to_hap(hi, s, blw, blc)
                    finally:
                        native.available = real
                    for a, b in zip(out_n, out_p):
                        a = np.asarray(a, dtype=np.float64)
                        b = np.asarray(b, dtype=np.float64)
                        # the oracle NaN-fills rows it never writes (inner
                        # stutter rows); the native path leaves those
                        # uninitialized (nothing reads them) - compare only
                        # oracle-defined cells
                        defined = ~np.isnan(b)
                        diff = np.abs(np.where(defined, a - b, 0.0))
                        assert not np.isnan(diff).any()
                        assert diff.max() < 1e-9


def test_native_adapter_trim_matches_python():
    """C adapter-overlap search agrees with the Python implementation."""
    import numpy as np
    from hipstr_tpu.pipeline import adapter_trimmer as at
    from hipstr_tpu import native

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(9)
    adapters3 = [at.TRUSEQ_R1, at.NEXTERA_R1]
    adapters5 = [at.reverse_complement(a) for a in adapters3]
    for t in range(400):
        n = int(rng.integers(8, 90))
        read = "".join(rng.choice(list("ACGT"), n))
        if t % 3 == 0:
            ad = adapters3[t % 2]
            k = int(rng.integers(5, len(ad) + 1))
            ins = list(ad[:k])
            for _ in range(int(rng.integers(0, 3))):
                p = int(rng.integers(0, k))
                ins[p] = rng.choice(list("ACGT"))
            pos = int(rng.integers(0, max(1, n - k + 1)))
            read = read[:pos] + "".join(ins) + read[pos + k:]
        real = native.available
        try:
            i3n = native.adapter_trim_native(read, adapters3, at.MIN_OVERLAP,
                                             at.MAX_ERROR_RATE, False)
            i5n = native.adapter_trim_native(read, adapters5, at.MIN_OVERLAP,
                                             at.MAX_ERROR_RATE, True)
            native.available = lambda: False
            assert i3n == at._trim_three_prime_index(read, adapters3)
            assert i5n == at._trim_five_prime_index(read, adapters5)
        finally:
            native.available = real


def test_native_retrace_walk_matches_python():
    """C traceback walk produces identical AlignmentTrace contents."""
    import numpy as np
    from tests.test_hmm_kernel import _mk_haplotype, _reads_from_hap
    from hipstr_tpu.align.retrace import trace_optimal_aln, HapAlignInfo
    from hipstr_tpu.align.alignment_data import Alignment
    from hipstr_tpu.models.base_quality import BaseQuality
    from hipstr_tpu import native

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    bq = BaseQuality()
    checks = 0
    for trial in range(5):
        period = int(rng.integers(1, 5))
        units = int(rng.integers(4, 10))
        hap = _mk_haplotype(rng, period, units, n_rep_alts=2,
                            n_flank_alts=trial % 2)
        seqs, quals, seeds = _reads_from_hap(rng, hap, 4, 60)
        info = HapAlignInfo(hap)
        for h in range(min(hap.num_combs, 3)):
            for seq, q, seed in zip(seqs, quals, seeds):
                blw = np.array([bq.log_prob_error(c) - np.log(3.0)
                                for c in q])
                blc = np.array([bq.log_prob_correct(c) for c in q])
                aln = Alignment(1000, 1000 + len(seq), False, "r", q, seq, "")
                LL_n, tr_n = trace_optimal_aln(hap, h, aln, seed, blw, blc,
                                               info)
                real = native.available
                native.available = lambda: False
                try:
                    LL_p, tr_p = trace_optimal_aln(hap, h, aln, seed, blw,
                                                   blc, info)
                finally:
                    native.available = real
                checks += 1
                assert tr_n.hap_aln == tr_p.hap_aln
                assert tr_n.flank_seqs == tr_p.flank_seqs
                assert tr_n.flank_indels == tr_p.flank_indels
                assert tr_n.flank_snps == tr_p.flank_snps
                assert tr_n._str_data == tr_p._str_data
                assert (tr_n.flank_ins_size, tr_n.flank_del_size) == \
                    (tr_p.flank_ins_size, tr_p.flank_del_size)
                assert abs(LL_n - LL_p) < 1e-9
    assert checks > 30

def test_native_stitch_trace_matches_python():
    """The one-call C stitch (stitch_trace) yields the same traced Alignment
    (start/stop/CIGAR/aligned string) as the python stitch path."""
    import numpy as np
    from tests.test_hmm_kernel import _mk_haplotype, _reads_from_hap
    from hipstr_tpu.align.retrace import trace_optimal_aln, HapAlignInfo
    from hipstr_tpu.align.alignment_data import Alignment
    from hipstr_tpu.models.base_quality import BaseQuality
    from hipstr_tpu import native

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    bq = BaseQuality()
    checks = 0
    for trial in range(5):
        period = int(rng.integers(1, 5))
        units = int(rng.integers(4, 10))
        hap = _mk_haplotype(rng, period, units, n_rep_alts=2,
                            n_flank_alts=trial % 2)
        seqs, quals, seeds = _reads_from_hap(rng, hap, 4, 60)
        info = HapAlignInfo(hap)
        for h in range(min(hap.num_combs, 3)):
            for seq, q, seed in zip(seqs, quals, seeds):
                blw = np.array([bq.log_prob_error(c) - np.log(3.0)
                                for c in q])
                blc = np.array([bq.log_prob_correct(c) for c in q])
                aln = Alignment(1000, 1000 + len(seq), False, "r", q, seq, "")
                _, tr_n = trace_optimal_aln(hap, h, aln, seed, blw, blc, info)
                real = native.stitch_trace_native
                native.stitch_trace_native = lambda *a: None
                try:
                    _, tr_p = trace_optimal_aln(hap, h, aln, seed, blw, blc,
                                                info)
                finally:
                    native.stitch_trace_native = real
                a_n, a_p = tr_n.traced_aln, tr_p.traced_aln
                assert (a_n.start, a_n.stop) == (a_p.start, a_p.stop)
                assert a_n.alignment == a_p.alignment
                assert [(c.type, c.num) for c in a_n.cigar] == \
                    [(c.type, c.num) for c in a_p.cigar]
                checks += 1
    assert checks > 30

def test_native_trace_batch_matches_single():
    """hmm_trace_batch (one FFI call for N traces, threaded or not) yields
    traces identical to per-trace hmm_trace_full calls."""
    import numpy as np
    from tests.test_hmm_kernel import _mk_haplotype, _reads_from_hap
    from hipstr_tpu.align.retrace import (HapAlignInfo, trace_batch,
                                          trace_optimal_aln)
    from hipstr_tpu.align.alignment_data import Alignment
    from hipstr_tpu.models.base_quality import BaseQuality
    from hipstr_tpu import native

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(23)
    bq = BaseQuality()
    for trial, n_threads in ((0, 1), (1, 3)):
        period = int(rng.integers(1, 5))
        hap = _mk_haplotype(rng, period, 8, n_rep_alts=2,
                            n_flank_alts=trial % 2)
        seqs, quals, seeds = _reads_from_hap(rng, hap, 6, 60)
        info = HapAlignInfo(hap)
        jobs = []
        for j, (seq, q, seed) in enumerate(zip(seqs, quals, seeds)):
            blw = np.array([bq.log_prob_error(c) - np.log(3.0) for c in q])
            blc = np.array([bq.log_prob_correct(c) for c in q])
            aln = Alignment(1000, 1000 + len(seq), False, "r", q, seq, "")
            jobs.append((j % min(hap.num_combs, 3), aln, seed, blw, blc))
        batch = trace_batch(hap, jobs, info, n_threads=n_threads)
        assert batch is not None and len(batch) == len(jobs)
        for (h, aln, seed, blw, blc), (LL_b, tr_b) in zip(jobs, batch):
            LL_s, tr_s = trace_optimal_aln(hap, h, aln, seed, blw, blc, info)
            assert LL_b == LL_s
            assert tr_b.hap_aln == tr_s.hap_aln
            assert tr_b.flank_seqs == tr_s.flank_seqs
            assert tr_b.flank_indels == tr_s.flank_indels
            assert tr_b.flank_snps == tr_s.flank_snps
            assert tr_b._str_data == tr_s._str_data
            a_b, a_s = tr_b.traced_aln, tr_s.traced_aln
            assert (a_b.start, a_b.stop) == (a_s.start, a_s.stop)
            assert a_b.alignment == a_s.alignment


def test_flank_assembly_batch_parity():
    """native/debruijn.cpp vs the python DebruijnGraph: identical
    acyclicity verdicts and identical ordered (path, bottleneck-weight)
    lists across random mutated-fragment inputs."""
    import random

    from hipstr_tpu import native
    from hipstr_tpu.align.debruijn import DebruijnGraph, MIN_PATH_WEIGHT

    if not (native.available()
            and hasattr(native._load(), "flank_assembly_batch")):
        import pytest
        pytest.skip("native assembly entry unavailable")

    random.seed(11)
    BASES = "ACGT"
    for trial in range(60):
        ref = "".join(random.choice(BASES)
                      for _ in range(random.randint(18, 40)))
        max_k = min(15, len(ref) - 1)
        k0 = DebruijnGraph.calc_kmer_length(ref, 10, max_k)
        if k0 is None:
            continue
        S = random.randint(1, 4)
        strs_by_s = []
        for s in range(S):
            strs = []
            for _ in range(random.randint(0, 12)):
                a = random.randint(0, max(0, len(ref) - 12))
                b = random.randint(a + 11, len(ref))
                frag = list(ref[a:b])
                for _ in range(random.randint(0, 2)):
                    p = random.randrange(len(frag))
                    frag[p] = random.choice(BASES)
                strs.append("".join(frag))
            strs_by_s.append(strs)
        skip = [random.random() < 0.2 for _ in range(S)]
        res = native.flank_assembly_batch_native(
            ref, k0, max_k,
            [tuple(x.encode() for x in strs_by_s[s]) if not skip[s] else ()
             for s in range(S)], skip)
        assert res is not None
        for s in range(S):
            if skip[s]:
                continue
            acy = False
            data = []
            for k in range(k0, max_k + 1):
                g = DebruijnGraph(k, ref)
                for q in strs_by_s[s]:
                    g.add_string(q)
                g.prune_edges(0.02, 2)
                if (not g.has_cycles() and g.is_source_ok()
                        and g.is_sink_ok()):
                    acy = True
                    data = g.enumerate_paths(MIN_PATH_WEIGHT, 10)
                    break
            assert bool(res[0][s]) == acy
            assert res[1][s] == data
