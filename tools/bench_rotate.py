"""Time a full Galois rotation (key switch) on real TPU, fused Pallas
kernels vs the structured XLA path, in one process (shared keygen).

Reps are chained through lax.scan (compiles the body once; each
iteration consumes the previous result, forcing serialization) and the
per-op time is the slope between two chain lengths, so dispatch and
fetch overhead cancel."""
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root

import numpy as np
import jax
import jax.numpy as jnp

from eva_tpu.crypto.context import get_context
from eva_tpu.crypto import keys as K
from eva_tpu.backend.executor_jax import JaxProgram, device_keys, level_ops


def build_chain_fn(shim, dev, level, reps):
    def body(cur, _):
        out = shim._rotate([cur[0], cur[1]], 1, level, dev, None, None)
        return (out[0], dev.add(out[0], out[1])), None

    def f(p):
        (c0, _), _ = jax.lax.scan(body, (p, p), None, length=reps)
        return c0

    return jax.jit(f)


def run(fn, x0):
    def fetch(out):
        return float(jnp.sum(out >> 31))

    _ = fetch(fn(x0))  # compile
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        _ = fetch(fn(x0))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = 16384
    ctx = get_context(tuple([60] * 6 + [60]), (1,), n)
    keys = K.generate_keys(ctx)
    level = 0
    primes = ctx.primes_at_level(level)
    print(f"backend={jax.default_backend()} N={n} n_cur={len(primes)} "
          f"alpha={keys.ks_alpha}", flush=True)

    shim = JaxProgram.__new__(JaxProgram)
    shim.ctx, shim.keys, shim.k = ctx, keys, 1
    shim.dkeys = device_keys(ctx, keys)
    dev = level_ops(primes, n)

    r = np.random.default_rng(0)
    poly = np.empty((len(primes), n), dtype=np.uint32)
    for i, q in enumerate(primes):
        poly[i] = r.integers(0, q, n, dtype=np.uint64)
    poly = jnp.asarray(poly)

    r1, r2 = 16, 64
    for label, env in (("fused", ""), ("structured", "1")):
        if env:
            os.environ["EVA_TPU_NO_FUSED_KS"] = env
        else:
            os.environ.pop("EVA_TPU_NO_FUSED_KS", None)
        ta = run(build_chain_fn(shim, dev, level, r1), poly)
        tb = run(build_chain_fn(shim, dev, level, r2), poly)
        slope = (tb - ta) / (r2 - r1)
        print(f"{label:<12} {r1} reps: {ta*1e3:8.1f} ms   "
              f"{r2} reps: {tb*1e3:8.1f} ms   per-op: {slope*1e6:8.1f} us",
              flush=True)


if __name__ == "__main__":
    main()
