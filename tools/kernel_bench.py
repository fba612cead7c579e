"""Per-kernel TPU timing at production shapes.

Times (warm, fetch-to-host barrier — `jax.block_until_ready` does not wait
on the axon backend) each device piece of the batched forward pass:
the Pallas emission kernel, the Pallas HMM v2 segment kernels, and the
fused batched_forward_v2, at the shape buckets the executor actually
dispatches.  Prints one line per (shape, kernel).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def t_ms(fn, args, fetch, n=3):
    fetch(fn(*args))                 # warm (compile)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return 1000 * best


def bench_emission(G, O, P, L, Bmax, period):
    from hipstr_tpu.ops.pallas_emission import stutter_emissions_pallas
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, (G, P, L)), jnp.int32)
    blw = jnp.asarray(rng.uniform(-8, -4, (G, P, L)), jnp.float32)
    blc = jnp.asarray(rng.uniform(-0.01, -0.0001, (G, P, L)), jnp.float32)
    brev = jnp.asarray(rng.integers(0, 4, (G, O, Bmax)), jnp.int32)
    blen = jnp.asarray(rng.integers(Bmax // 2, Bmax, (G, O)), jnp.int32)
    f = jax.jit(lambda *a: stutter_emissions_pallas(*a, period))
    ms = t_ms(f, (codes, blw, blc, brev, blen), lambda r: np.asarray(r))
    print(f"emission G={G} O={O} P={P} L={L} B={Bmax} per={period}: "
          f"{ms:.1f} ms  ({ms/G:.2f} ms/locus)")
    return ms


def bench_hmm(G, P, L, H, R, sr, period, O=None):
    from hipstr_tpu.ops import pallas_hmm2 as k
    from hipstr_tpu.ops.hmm import HapMeta
    O = O or H
    nD = 13
    rng = np.random.default_rng(1)
    codes = jnp.asarray(rng.integers(0, 4, (G, P, L)), jnp.int8)
    quals = jnp.asarray(rng.integers(35, 70, (G, P, L)), jnp.uint8)
    last = jnp.asarray(rng.integers(L // 2, L, (G, P)), jnp.int32)
    meta = HapMeta(
        row_char=jnp.asarray(rng.integers(0, 4, (G, H, R)), jnp.int8),
        row_m2m=jnp.zeros((G, H, R), jnp.float32),
        row_m2i=jnp.zeros((G, H, R), jnp.float32),
        row_m2d=jnp.zeros((G, H, R), jnp.float32),
        rep_rev_codes=jnp.asarray(rng.integers(0, 4, (G, O, 64)), jnp.int32),
        rep_len=jnp.asarray(rng.integers(8, 40, (G, O)), jnp.int32),
        lpmf=jnp.asarray(rng.uniform(-12, -1, (G, O, nD)), jnp.float32),
        hap_opt=jnp.asarray(rng.integers(0, O, (G, H)), jnp.int32),
        row_active=jnp.ones((G, R), jnp.int8),
    )
    E = jnp.asarray(rng.uniform(-30, 0, (G, O, nD, P, L)), jnp.float32)
    f = jax.jit(lambda c, q, l, m, e: k.segment_forward_v2(
        c, q, l, m, e, R, sr, period))
    ms = t_ms(f, (codes, quals, last, meta, E), lambda r: np.asarray(r[0]))
    print(f"hmm_v2  G={G} P={P} L={L} H={H} R={R} sr={sr} per={period}: "
          f"{ms:.1f} ms  ({ms/G:.2f} ms/locus)")
    return ms


def main():
    print(f"backend: {jax.default_backend()}")
    # L=128 shapes (round-1 datasets) and this round's L=256 shapes
    for (P, L, Bmax, R) in ((128, 128, 64, 128), (128, 256, 128, 256)):
        for H in (4, 8):
            bench_emission(32, H, P, L, Bmax, period=3)
            bench_hmm(32, P, L, H, R, sr=40, period=3)


if __name__ == "__main__":
    main()
