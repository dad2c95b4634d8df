"""Break down rotation key-switch cost on real TPU.

Methodology (same as bench.py): each stage is a jitted function over a
BATCH of polynomials, chained at the Python level (each dispatch
consumes the previous result), ending in a host fetch of a device-side
reduction; per-op time is the slope between two chain lengths, median
of 3 interleaved measurement rounds. The earlier inner-jit chain form
(reps unrolled inside one compiled function) was retired: XLA fuses
and reorders across the unrolled reps, which measured intt at 0 us and
ntt at 10x its dispatch cost."""
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root

import numpy as np
import jax
import jax.numpy as jnp

from eva_tpu.crypto.context import get_context
from eva_tpu.crypto import keys as K
from eva_tpu.backend.executor_jax import JaxProgram, device_keys, level_ops

BATCH = 8


def main():
    n = 16384
    prime_bits = tuple([60] * 6 + [60])
    ctx = get_context(prime_bits, (1,), n)
    keys = K.generate_keys(ctx)
    level = 0
    primes = ctx.primes_at_level(level)
    n_cur = len(primes)
    print(f"N={n} level={level} n_cur={n_cur} n_key={len(ctx.key_primes)} "
          f"alpha={keys.ks_alpha} batch={BATCH}", flush=True)

    shim = JaxProgram.__new__(JaxProgram)
    shim.ctx = ctx
    shim.keys = keys
    shim.dkeys = device_keys(ctx, keys)
    shim.k = 1

    r = np.random.default_rng(0)
    poly = np.empty((BATCH, n_cur, n), dtype=np.uint32)
    for i, q in enumerate(primes):
        poly[:, i] = r.integers(0, q, (BATCH, n), dtype=np.uint64)
    poly = jnp.asarray(poly)

    g = ctx.galois_elt(1)
    perm = jnp.asarray(ctx.perm_for_elt(g))
    layout = shim.dkeys.layout(keys.galois[g], level)
    layout_rot = shim.dkeys.layout_rot(keys.galois[g], level, g)
    dev = level_ops(primes, n)
    red = jax.jit(lambda v: jnp.sum(v >> 31))

    def fold_digits(d):
        # lane-0 scalar from every component: nothing DCE-able.
        extra = jnp.sum(d.b[..., 0].astype(jnp.uint32))
        if d.a is not None:
            extra = extra + jnp.sum(d.a[..., 0].astype(jnp.uint32))
        return d.own + extra

    def ntt_step(p):
        return dev.ntt(p)

    def intt_step(p):
        return dev.intt(p)

    def perm_step(p):
        return jnp.take(p, perm, axis=-1)

    def digits_step(p):
        return fold_digits(shim._ks_digits(p, level))

    def apply_step(p):
        d = shim._ks_digits(p, level)
        d0, d1 = shim._ks_apply(d, level, layout)
        return dev.add(d0, d1)

    def apply_rot_step(p):
        # The hoisted-rotation per-rotation cost: MAC the (shared)
        # digits against the inverse-permuted key + epilogue.
        d = shim._ks_digits(p, level)
        d0, d1 = shim._ks_apply(d, level, layout_rot)
        return dev.add(d0, d1)

    def rotate_step(p):
        out = shim._rotate([p, p], 1, level, dev, None, None)
        return dev.add(out[0], out[1])

    def rotate_hoist_step(p):
        h = {}
        out = shim._rotate([p, p], 1, level, dev, h, 0)
        return dev.add(out[0], out[1])

    def slope(f):
        def chain(reps):
            best = 1e9
            for _ in range(3):
                cur = poly
                t0 = time.perf_counter()
                for _ in range(reps):
                    cur = f(cur)
                _ = float(red(cur))
                best = min(best, time.perf_counter() - t0)
            return best

        return max((chain(24) - chain(4)) / 20, 1e-9)

    cases = [
        ("ntt (12 rows)", ntt_step),
        ("intt (12 rows)", intt_step),
        ("perm gather (12 rows)", perm_step),
        ("digits (intt+fbe+ntt, own-row skip)", digits_step),
        ("digits+mac+pdiv (structured)", apply_step),
        ("digits+mac+pdiv (rot layout)", apply_rot_step),
        ("full rotate (fused KS path)", rotate_step),
        ("full rotate hoisted", rotate_hoist_step),
    ]
    jitted = {}
    for name, step in cases:  # compile each stage once
        jitted[name] = jax.jit(step)
        _ = float(red(jitted[name](poly)))
        print(f"compiled: {name}", flush=True)
    samples = {name: [] for name, _ in cases}
    for _ in range(3):  # interleaved rounds
        for name, _step in cases:
            samples[name].append(slope(jitted[name]))
    print(f"{'stage':<38}{'us/ct-op':>10}{'spread':>9}")
    for name, _ in cases:
        s = samples[name]
        med = statistics.median(s)
        spread = (max(s) - min(s)) / med
        print(f"{name:<38}{med/BATCH*1e6:>10.1f}{100*spread:>8.1f}%",
              flush=True)


if __name__ == "__main__":
    main()
