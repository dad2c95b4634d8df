"""On-chip A/B: v1 (per-stage concat) vs v2 (relayout-minimal) NTT.

Methodology matches bench.py's kernel section: chained dispatches ending
in a device-dependent scalar fetch, per-op time = slope between two
chain lengths, interleaved median-of-3 so tunnel drift hits both
variants equally. Bit-parity is asserted on device before timing.

Usage: python tools/bench_ntt_v2.py [N] [n_sub] [batch]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    n_sub = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    import jax.numpy as jnp
    from eva_tpu.crypto.context import get_context
    from eva_tpu.backend.pallas_ntt import PallasNTT
    from eva_tpu.backend.pallas_ntt_v2 import PallasNTTv2

    # Same chain construction as bench.py's kernel section.
    ctx = get_context(tuple([60] * (n_sub // 2 + 1)), (1,), n)
    primes = list(ctx.primes_at_level(0))[:n_sub]
    assert len(primes) >= n_sub, f"only {len(primes)} primes"
    print(f"N={n} n_sub={n_sub} batch={batch} backend={jax.default_backend()}",
          flush=True)

    v1, v2 = PallasNTT(primes, n), PallasNTTv2(primes, n)
    rng = np.random.default_rng(7)
    x = np.stack([np.stack([rng.integers(0, q, n, dtype=np.uint64)
                            .astype(np.uint32) for q in primes])
                  for _ in range(batch)])
    xd = jnp.asarray(x)

    # Device bit-parity first.
    for name, f1, f2 in (("ntt", v1.ntt, v2.ntt), ("intt", v1.intt, v2.intt)):
        a, b = np.asarray(f1(xd)), np.asarray(f2(xd))
        ok = np.array_equal(a, b)
        print(f"parity {name}: {ok}", flush=True)
        assert ok

    red = jax.jit(lambda v: jnp.sum(v >> 31))

    def slope(fn, r1=16, r2=112):
        def chain_time(reps):
            best = 1e9
            for _ in range(3):
                cur = xd
                t0 = time.perf_counter()
                for _ in range(reps):
                    cur = fn(cur)
                _ = float(red(cur))
                best = min(best, time.perf_counter() - t0)
            return best

        chain_time(2)  # warm
        ta, tb = chain_time(r1), chain_time(r2)
        return (tb - ta) / (r2 - r1)

    # jit the wrappers so the twiddle tables are captured constants
    # (uploaded once at compile), exactly like the whole-graph executor;
    # un-jitted eager calls would re-upload ~2 MB of tables through the
    # tunnel per dispatch and measure link latency, not the kernel.
    fns = {"v1_ntt": jax.jit(v1.ntt), "v2_ntt": jax.jit(v2.ntt),
           "v1_intt": jax.jit(v1.intt), "v2_intt": jax.jit(v2.intt)}
    samples = {k: [] for k in fns}
    for p in range(3):
        for k, fn in fns.items():
            samples[k].append(slope(fn) * 1e6)
        print(f"pass {p}: " + "  ".join(
            f"{k}={samples[k][-1]:.1f}us" for k in fns), flush=True)
    for k in fns:
        med = statistics.median(samples[k])
        print(f"{k}: median {med:.1f} us  samples "
              f"{[round(s, 1) for s in samples[k]]}")
    for op in ("ntt", "intt"):
        r = (statistics.median(samples[f'v1_{op}'])
             / statistics.median(samples[f'v2_{op}']))
        print(f"{op}: v2 speedup {r:.2f}x")


if __name__ == "__main__":
    main()
