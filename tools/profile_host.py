"""Host-side cProfile of the end-to-end pipeline (bench shallow config).

Runs the same dataset + in-process batched path as bench.py, under
cProfile, and prints the top cumulative/self-time entries.  Device waits
show up under jax/XLA frames; everything else is the host Python the
round-4 work is cutting (VERDICT round 3, item 1).

Usage:  python tools/profile_host.py [n_loci] [reads] [sortkey]
"""
import cProfile
import os
import pstats
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_loci = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    reads = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    sortkey = sys.argv[3] if len(sys.argv) > 3 else "tottime"

    import bench
    tmp = tempfile.mkdtemp(prefix="hipstr_prof_")
    try:
        bench._write_dataset(tmp, n_loci, reads)
        # warm-up pass: XLA compiles, caches fill
        bench._run_e2e(tmp, 32, workers=1)
        prof = cProfile.Profile()
        prof.enable()
        dt, counters, times = bench._run_e2e(tmp, 32, workers=1)
        prof.disable()
        print(f"e2e: {n_loci / dt:.2f} loci/s ({1000 * dt / n_loci:.2f} "
              f"ms/locus), phases: {times}")
        prof.dump_stats("/tmp/hipstr_host.prof")
        st = pstats.Stats(prof)
        st.sort_stats(sortkey).print_stats(35)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
