"""Per-kernel profiling against the memory-bandwidth speed-of-light model.

Run:  python -m eva_tpu.profiling [N] [L]

Times each ciphertext primitive with the chained-dependency + host-fetch
slope method (robust against runtimes whose block_until_ready returns
early; see bench.py) and reports achieved bytes/s vs the device's HBM
roofline, estimated in-process from a large fused elementwise copy."""

from __future__ import annotations

import sys
import time
from typing import Callable, List, Tuple

import numpy as np


def _slope_time(fn: Callable, x0, red, reps_short=4, reps_long=24) -> float:
    """Seconds per execution: slope between two chained run lengths."""
    def chain(reps):
        cur = x0
        t0 = time.perf_counter()
        for _ in range(reps):
            cur = fn(cur)
        _ = float(red(cur))
        return time.perf_counter() - t0

    chain(1)  # warm
    d1 = chain(reps_short)
    d2 = chain(reps_long)
    return max((d2 - d1) / (reps_long - reps_short), 1e-9)


def measure_hbm_roofline(jax, jnp) -> float:
    """Achievable HBM bytes/s via a large fused elementwise op."""
    x = jnp.ones((64 * 1024 * 1024 // 4,), jnp.uint32)  # 64 MB
    f = jax.jit(lambda v: v * jnp.uint32(3) + jnp.uint32(1))
    red = jax.jit(lambda v: jnp.sum(v >> 31))
    per = _slope_time(f, x, red)
    return 2 * x.size * 4 / per  # read + write


def profile(n: int = 16384, n_entries: int = 6) -> List[Tuple[str, float, float, float]]:
    import jax
    import jax.numpy as jnp
    from .backend.executor_jax import level_ops
    from .crypto.primes import build_chain

    chain = build_chain([60] * n_entries + [60], n)
    primes = [q for e in chain[:-1] for q in e.primes]
    dev = level_ops(primes, n)
    n_sub = len(primes)
    batch = 16
    plane_bytes = batch * n_sub * n * 4

    def planes(seed):
        r = np.random.default_rng(seed)
        out = np.empty((batch, n_sub, n), dtype=np.uint32)
        for i, q in enumerate(primes):
            out[:, i, :] = r.integers(0, q, (batch, n), dtype=np.uint64)
        return jnp.asarray(out)

    x = planes(0)
    other = planes(1)
    red = jax.jit(lambda v: jnp.sum(v >> 31))

    def _rescale_last(dev, v, primes):
        # One divide-and-round step (the rescale/key-switch epilogue),
        # padded back to the input shape so executions can chain.
        from .backend.executor_jax import JaxProgram
        shim = JaxProgram.__new__(JaxProgram)
        from .crypto.context import get_context
        shim.ctx = get_context(tuple(primes) + (primes[-1],), (), n) if False else None
        # direct call: _divide_last only needs ctx.n
        class _C:  # minimal ctx shim
            pass
        shim.ctx = _C(); shim.ctx.n = n
        return JaxProgram._divide_last(shim, v, list(primes))

    results = []
    hbm = measure_hbm_roofline(jax, jnp)

    cases = [
        # (name, fn(cur)->cur, bytes accessed per exec)
        ("dyadic add", jax.jit(lambda v: dev.add(v, other)), 3 * plane_bytes),
        ("dyadic mul (2x mont)", jax.jit(lambda v: dev.mul(v, other)), 3 * plane_bytes),
        ("ntt fwd", jax.jit(dev.ntt), 2 * plane_bytes),
        ("intt", jax.jit(dev.intt), 2 * plane_bytes),
        ("automorphism gather", jax.jit(
            lambda v: jnp.take(v, jnp.arange(n - 1, -1, -1), axis=-1)),
         2 * plane_bytes),
        ("rescale (divide+round)", jax.jit(
            lambda v: jnp.pad(_rescale_last(dev, v, primes),
                              [(0, 0), (0, 1), (0, 0)])),
         2 * plane_bytes),
    ]
    for name, fn, nbytes in cases:
        per = _slope_time(fn, x, red)
        achieved = nbytes / per
        results.append((name, per / batch * 1e6, achieved, achieved / hbm))

    # The dominant op: a full Galois rotation (automorphism + hybrid
    # key switch + P-division). Bytes: 2 poly reads + 2 writes + the
    # key planes streamed once per digit group.
    from .backend.executor_jax import JaxProgram, device_keys
    from .crypto import keys as K
    from .crypto.context import get_context
    ctx = get_context(tuple([60] * n_entries + [60]), (1,), n)
    keys = K.generate_keys(ctx)
    shim = JaxProgram.__new__(JaxProgram)
    shim.ctx, shim.keys, shim.k = ctx, keys, 1
    shim.dkeys = device_keys(ctx, keys)
    rot_batch = 8
    xr = planes(2)[:rot_batch]
    n_ext = n_sub + len(ctx.key_primes)
    n_groups = (n_sub + keys.ks_alpha - 1) // keys.ks_alpha
    key_bytes = 2 * n_groups * n_ext * n * 4
    rot_bytes = rot_batch * 4 * n_sub * n * 4 + key_bytes

    @jax.jit
    def rot(p):
        out = shim._rotate([p, p], 1, 0, dev, None, None)
        return dev.add(out[0], out[1])

    per = _slope_time(rot, xr, red)
    achieved = rot_bytes / per
    results.append(("rotation (full KS)", per / rot_batch * 1e6,
                    achieved, achieved / hbm))
    return results, hbm


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    levels = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    import jax
    print(f"backend={jax.default_backend()}  N={n}  entries={levels}x60")
    results, hbm = profile(n, levels)
    print(f"measured HBM roofline: {hbm/1e9:.0f} GB/s")
    print(f"{'kernel':<24}{'us/ct-op':>10}{'GB/s':>10}{'% of SoL':>10}")
    for name, us, achieved, frac in results:
        print(f"{name:<24}{us:>10.1f}{achieved/1e9:>10.0f}{100*frac:>9.0f}%")


if __name__ == "__main__":
    main()
