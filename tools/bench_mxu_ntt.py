"""Win-or-kill measurement for the MXU NTT prototype (VERDICT r3 #2).

Times the production VPU Pallas NTT (level_ops .ntt) against the
int8-digit-matmul MXU prototype (backend/mxu_ntt.MxuNTT) across
(N, n_sub, batch) on the real chip, with a bit-parity check per config.
Decision rule (VERDICT): mxu >= 1.2x faster on the real matrix ->
default-on; otherwise delete the prototype and record why.

Chained-dispatch slope methodology (see bench.py)."""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root

import numpy as np
import jax
import jax.numpy as jnp

from eva_tpu.backend.executor_jax import level_ops
from eva_tpu.backend.mxu_ntt import get_mxu_ntt
from eva_tpu.crypto.primes import build_chain


def planes(primes, n, batch, seed=0):
    r = np.random.default_rng(seed)
    out = np.empty((batch, len(primes), n), dtype=np.uint32)
    for i, q in enumerate(primes):
        out[:, i, :] = r.integers(0, q, (batch, n), dtype=np.uint64)
    return jnp.asarray(out)


def slope(fn, x0, red, r1=4, r2=24):
    def chain(reps):
        best = 1e9
        for _ in range(3):
            cur = x0
            t0 = time.perf_counter()
            for _ in range(reps):
                cur = fn(cur)
            _ = float(red(cur))
            best = min(best, time.perf_counter() - t0)
        return best
    chain(1)  # warm/compile
    return max((chain(r2) - chain(r1)) / (r2 - r1), 1e-9)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    red = jax.jit(lambda v: jnp.sum(v >> 31))
    results = []
    for n in (8192, 16384):
        for n_entries in (3, 6):
            chain_e = build_chain([60] * n_entries, n)
            primes = [q for e in chain_e for q in e.primes]
            dev = level_ops(primes, n)
            mx = get_mxu_ntt(tuple(primes), n)
            for batch in (1, 8):
                x = planes(primes, n, batch, seed=n + batch)
                f_vpu = jax.jit(dev.ntt)
                f_mxu = jax.jit(mx.ntt)
                # bit parity first
                a = np.asarray(f_vpu(x))
                b = np.asarray(f_mxu(x))
                ok = np.array_equal(a, b)
                t_vpu = slope(f_vpu, x, red)
                t_mxu = slope(f_mxu, x, red)
                row = (n, len(primes), batch, t_vpu * 1e6, t_mxu * 1e6,
                       t_vpu / t_mxu, ok)
                results.append(row)
                print(f"N={n} n_sub={len(primes)} batch={batch}: "
                      f"vpu {t_vpu*1e6:8.1f} us  mxu {t_mxu*1e6:8.1f} us  "
                      f"mxu_speedup {t_vpu/t_mxu:5.2f}x  parity={ok}",
                      flush=True)
    best = max(r[5] for r in results)
    print(f"best mxu speedup: {best:.2f}x -> "
          f"{'WIN (>=1.2x)' if best >= 1.2 else 'KILL (<1.2x)'}")


if __name__ == "__main__":
    main()
