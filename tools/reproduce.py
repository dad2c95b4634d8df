"""Reproduce the headline measurements from ARCHITECTURE.md on this
machine's devices.

Usage:
  python tools/reproduce.py quick      # bench + per-kernel profile (~5 min)
  python tools/reproduce.py rotation   # rotation/key-switch cost
  python tools/reproduce.py ks         # fused-KS parity + fused vs XLA slope
  python tools/reproduce.py e2e        # homomorphic polynomial end to end
  python tools/reproduce.py all

All timings use the chained-dependency + host-fetch slope method (see
bench.py) because remote device runtimes may return from
block_until_ready before queued work completes."""

from __future__ import annotations

import subprocess
import sys
import time

sys.path.insert(0, ".")


def bench():
    subprocess.run([sys.executable, "bench.py"], check=True)


def profile():
    from eva_tpu.profiling import main as profile_main
    sys.argv = ["profiling"]
    profile_main()


def rotation():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from eva_tpu.crypto.context import CKKSContext
    from eva_tpu.crypto import keys as K
    from eva_tpu.backend.executor_jax import JaxProgram, device_keys, level_ops

    ctx = CKKSContext([60] * 7, [1], 16384)
    ks = K.generate_keys(ctx)
    dk = device_keys(ctx, ks)
    primes = ctx.primes_at_level(0)
    dev = level_ops(primes, ctx.n)
    jp = JaxProgram.__new__(JaxProgram)
    jp.ctx, jp.dkeys, jp.keys = ctx, dk, ks

    batch = 8
    def planes(seed):
        r = np.random.default_rng(seed)
        out = np.empty((batch, len(primes), ctx.n), dtype=np.uint32)
        for i, q in enumerate(primes):
            out[:, i, :] = r.integers(0, q, (batch, ctx.n), dtype=np.uint64)
        return jnp.asarray(out)

    c0, c1 = planes(0), planes(1)

    @jax.jit
    def rot(c0, c1):
        out = JaxProgram._rotate(jp, [c0, c1], 1, 0, dev)
        return out[0], out[1]

    red = jax.jit(lambda a, b: jnp.sum((a ^ b) >> 31))
    o = rot(c0, c1)
    _ = int(red(*o))

    def chain(reps):
        a, b = c0, c1
        t0 = time.perf_counter()
        for _ in range(reps):
            a, b = rot(a, b)
        _ = int(red(a, b))
        return time.perf_counter() - t0

    d1, d2 = chain(3), chain(13)
    per = (d2 - d1) / 10 / batch
    print(f"rotation incl. full key-switch, N=16384 L=0: {per*1e3:.2f} ms")


def e2e():
    import random
    random.seed(9)
    from eva_tpu import EvaProgram, Input, Output, evaluate
    from eva_tpu.ckks import CKKSCompiler
    from eva_tpu.runtime import generate_keys
    from eva_tpu.metric import valuation_mse

    poly = EvaProgram("Polynomial", vec_size=4096)
    with poly:
        x = Input("x")
        Output("y", 3 * x ** 2 + 5 * x - 2)
    poly.set_output_ranges(20)
    poly.set_input_scales(30)
    inputs = {"x": [random.uniform(-2, 2) for _ in range(4096)]}
    ref = evaluate(poly, inputs)
    compiled, params, sig = CKKSCompiler({"warn_vec_size": "false"}).compile(poly)
    pub, sec = generate_keys(params, backend="jax")
    enc = pub.encrypt(inputs, sig)
    t0 = time.time()
    out_enc = pub.execute(compiled, enc)
    print(f"first exec (incl jit): {time.time()-t0:.1f}s")
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        out_enc = pub.execute(compiled, enc)
    out = sec.decrypt(out_enc, sig)
    print(f"steady-state: {(time.time()-t0)/reps*1e3:.1f} ms/eval, "
          f"MSE {valuation_mse(out, ref):.2e}")


def ks():
    """Fused Pallas key-switch: bit-parity matrix, then the fused vs
    structured rotation slope (ARCHITECTURE.md rotation row)."""
    import os
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.getcwd()] + env.get("PYTHONPATH", "").split(os.pathsep))
    subprocess.run([sys.executable, "tools/verify_ks_tpu.py"],
                   check=True, env=env)
    subprocess.run([sys.executable, "tools/bench_rotate.py"],
                   check=True, env=env)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "quick"
    if which in ("quick", "all"):
        bench()
        profile()
    if which in ("rotation", "all"):
        rotation()
    if which in ("ks", "all"):
        ks()
    if which in ("e2e", "all"):
        e2e()


if __name__ == "__main__":
    main()
