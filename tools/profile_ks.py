"""Break down rotation key-switch cost on real TPU.

Repetitions are chained INSIDE one jit (the TPU is behind a remote
tunnel; per-dispatch latency would otherwise dominate). Per-op time is
the slope between a K-rep and a 2K-rep compiled chain."""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root

import numpy as np
import jax
import jax.numpy as jnp

from eva_tpu.crypto.context import get_context
from eva_tpu.crypto import keys as K
from eva_tpu.backend.executor_jax import JaxProgram, device_keys, level_ops


def timed(fn_reps, x0, inner=3):
    """fn_reps(x, reps) -> jitted chain; returns seconds per single rep."""
    f1 = jax.jit(lambda p: fn_reps(p, inner))
    f2 = jax.jit(lambda p: fn_reps(p, 2 * inner))

    def fetch(out):
        # block_until_ready can return early on the axon tunnel; a host
        # fetch of a device-side reduction forces the whole chain.
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.sum(leaf >> 31))

    def run(f):
        _ = fetch(f(x0))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = fetch(f(x0))
            best = min(best, time.perf_counter() - t0)
        return best

    d1 = run(f1)
    d2 = run(f2)
    return max((d2 - d1) / inner, 1e-9)


def main():
    n = 16384
    prime_bits = tuple([60] * 6 + [60])
    ctx = get_context(prime_bits, (1,), n)
    keys = K.generate_keys(ctx)
    level = 0
    primes = ctx.primes_at_level(level)
    n_cur = len(primes)
    print(f"N={n} level={level} n_cur={n_cur} n_key={len(ctx.key_primes)} "
          f"alpha={keys.ks_alpha}", flush=True)

    shim = JaxProgram.__new__(JaxProgram)
    shim.ctx = ctx
    shim.keys = keys
    shim.dkeys = device_keys(ctx, keys)
    shim.k = 1

    r = np.random.default_rng(0)
    poly = np.empty((n_cur, n), dtype=np.uint32)
    for i, q in enumerate(primes):
        poly[i] = r.integers(0, q, n, dtype=np.uint64)
    poly = jnp.asarray(poly)

    g = ctx.galois_elt(1)
    perm = jnp.asarray(ctx.perm_for_elt(g))
    layout = shim.dkeys.layout(keys.galois[g], level)
    dev = level_ops(primes, n)
    ext = level_ops(primes + list(ctx.key_primes), n)

    def chain(step):
        def f(p, reps):
            cur = p
            for i in range(reps):
                cur = step(cur)
                # rotate rows so consecutive reps aren't identical subtrees
                cur = jnp.roll(cur, 1, axis=0)
            return cur
        return f

    def ntt_step(p):
        return dev.ntt(p)

    def intt_step(p):
        return dev.intt(p)

    def perm_step(p):
        return jnp.take(p, perm, axis=-1)

    def digits_step(p):
        # Fold a lane-0 scalar from every digit component into the
        # chained output: lane 0 of an NTT output depends on all inputs,
        # so none of the digit NTTs can be dead-code-eliminated.
        d = shim._ks_digits(p, level)
        extra = jnp.sum(d.b[..., 0].astype(jnp.uint32))
        if d.a is not None:
            extra = extra + jnp.sum(d.a[..., 0].astype(jnp.uint32))
        return d.own + extra

    def apply_step(p):
        d = shim._ks_digits(p, level)
        d0, d1 = shim._ks_apply(d, level, layout)
        return dev.add(d0, d1)

    def rotate_step(p):
        out = shim._rotate([p, p], 1, level, dev, None, None)
        return dev.add(out[0], out[1])

    def rotate_hoist_step(p):
        h = {}
        out = shim._rotate([p, p], 1, level, dev, h, 0)
        return dev.add(out[0], out[1])

    def fbe_step(p):
        # digit decomposition WITHOUT the NTTs: coeffs -> fast base ext
        co = dev.intt(p)
        d = shim._ks_digits_from_coeffs(co, level)
        # cheap reduce back to [n_cur, N]
        return dev.add(d.own, d.own) if d.a is None else dev.add(
            d.own, d.a[0])

    ext_rows = None

    cases = [
        ("ntt (12 rows)", ntt_step),
        ("intt (12 rows)", intt_step),
        ("perm gather (12 rows)", perm_step),
        ("digits full (intt+fbe+ntt)", digits_step),
        ("digits+apply (no perm)", apply_step),
        ("full rotate", rotate_step),
        ("full rotate hoisted", rotate_hoist_step),
    ]
    print(f"{'stage':<30}{'us':>10}")
    for name, step in cases:
        per = timed(chain(step), poly)
        print(f"{name:<30}{per*1e6:>10.1f}", flush=True)


if __name__ == "__main__":
    main()
