"""Hybrid key-switch decomposition (alpha) sweep — VERDICT r4 missing #3.

Measures, for alpha in {1,2,3,4}:
  - the digit GROUP SHAPES the packing actually produces per level
    (ks_groups is capped at group product <= 2P, so with the single
    60-bit special-modulus entry and ~30-bit sub-primes, alpha >= 3
    degenerates to the alpha=2 pairing — this tool prints the proof),
  - full-rotation latency on the device (chained-dispatch slope, the
    bench.py methodology) at several levels and ring sizes,
  - end-to-end noise of a rotation-bearing program (encrypt -> 8
    rotations + multiply -> decrypt MSE), per alpha.

Run on the TPU tunnel:
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/sweep_alpha.py
Writes tools/alpha_sweep.json and prints a table.

Why alpha > 2 needs a WIDER special modulus: the rounding term of the
hybrid key switch is bounded by max_j Q_j / P; groups are therefore
packed only while their product stays <= 2P (crypto/context.py
ks_groups). One 60-bit key entry = two ~30-bit sub-primes, so at most
two data sub-primes fit a group no matter what alpha requests. Packing
4 sub-primes per digit needs P ~ 2^120 (two 60-bit key entries) at 60
bits of the HE-standard modulus budget — SHIPPED round 5 as the
opt-in `two_entry_ks` compiler option, applied only when the budget at
the chosen N has the slack (tools/bench_two_entry.py measures it:
rotation 193.5 -> 176.0 us at L0, noise unchanged).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PASSES = 3


def _planes(primes, n, batch, seed):
    r = np.random.default_rng(seed)
    out = np.empty((batch, len(primes), n), dtype=np.uint32)
    for i, q in enumerate(primes):
        out[:, i, :] = r.integers(0, q, (batch, n), dtype=np.uint64)
    return out


def rotation_us(ctx, keys, level, on_tpu):
    """Full-rotation microbenchmark at `level` (bench.py methodology)."""
    import jax
    import jax.numpy as jnp
    from eva_tpu.backend.executor_jax import (JaxProgram, device_keys,
                                              level_ops)

    primes = ctx.primes_at_level(level)
    shim = JaxProgram.__new__(JaxProgram)
    shim.ctx, shim.keys, shim.k = ctx, keys, 1
    shim.dkeys = device_keys(ctx, keys)
    dev = level_ops(primes, ctx.n)
    batch = 8 if on_tpu else 2
    poly = jnp.asarray(_planes(primes, ctx.n, batch, 7))

    @jax.jit
    def rot(p):
        out = shim._rotate([p, p], 1, level, dev, None, None)
        return dev.add(out[0], out[1])

    red = jax.jit(lambda c: jnp.sum(c >> 31))
    _ = int(red(rot(poly)))

    def chain_time(reps):
        best = 1e9
        for _ in range(3 if on_tpu else 1):
            cur = poly
            t0 = time.perf_counter()
            for _ in range(reps):
                cur = rot(cur)
            _ = int(red(cur))
            best = min(best, time.perf_counter() - t0)
        return best

    r1, r2 = (5, 45) if on_tpu else (1, 3)
    import statistics
    samples = []
    for _ in range(PASSES):
        per = (chain_time(r2) - chain_time(r1)) / (r2 - r1)
        samples.append(per / batch * 1e6)
    return statistics.median(samples), samples


def noise_mse(params, sig, compiled, prog, alpha):
    """End-to-end MSE of the rotation-bearing program at `alpha`."""
    import random

    from eva_tpu import evaluate
    from eva_tpu.metric import valuation_mse
    from eva_tpu.runtime import generate_keys

    os.environ["EVA_TPU_KS_ALPHA"] = str(alpha)
    try:
        pub, sec = generate_keys(params, backend="jax")
    finally:
        os.environ.pop("EVA_TPU_KS_ALPHA", None)
    random.seed(17)
    inputs = {"x": [random.uniform(-1, 1) for _ in range(prog.vec_size)]}
    enc = pub.encrypt(inputs, sig)
    out = sec.decrypt(pub.execute(compiled, enc), sig)
    return valuation_mse(out, evaluate(prog, inputs))


def main():
    import jax
    from eva_tpu import EvaProgram, Input, Output
    from eva_tpu.ckks import CKKSCompiler
    from eva_tpu.crypto import keys as K
    from eva_tpu.crypto.context import get_context

    on_tpu = jax.default_backend() == "tpu"
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    out = {"backend": jax.default_backend(), "configs": []}

    # Rotation-bearing program for the noise leg (8 direct taps, one
    # multiply depth — the fusion-era conv shape).
    prog = EvaProgram("alpha_noise", vec_size=4096)
    with prog:
        x = Input("x")
        acc = None
        for i, t in enumerate((1, 2, 3, 9, 10, 11, 17, 18)):
            term = (x << t) * (0.2 * (i % 5) - 0.4)
            acc = term if acc is None else acc + term
        Output("y", acc * acc)
    prog.set_input_scales(40)
    prog.set_output_ranges(20)
    compiled, nparams, sig = CKKSCompiler(
        {"warn_vec_size": "false"}).compile(prog)

    for n, n_entries in ((16384, 6), (8192, 2)):
        ctx = get_context(tuple([60] * n_entries + [60]), (1,), n)
        levels = sorted({0, n_entries // 2, n_entries - 1})
        seen_groups = {}
        for alpha in (1, 2, 3, 4):
            groups = ctx.ks_groups(alpha)
            shape = tuple(len(g) for g in groups)
            entry = {"n": n, "entries": n_entries, "alpha": alpha,
                     "group_sizes": list(shape)}
            dup_of = seen_groups.get(shape)
            if dup_of is not None:
                # Identical packing => identical kernels; don't burn
                # tunnel compiles re-measuring the same configuration.
                entry["same_groups_as_alpha"] = dup_of
                print(f"N={n} alpha={alpha}: groups {shape} identical to "
                      f"alpha={dup_of} (P-cap: group product <= 2P)",
                      file=sys.stderr)
                out["configs"].append(entry)
                continue
            seen_groups[shape] = alpha
            keys = K.generate_keys(ctx, alpha=alpha)
            entry["levels"] = {}
            for lv in levels:
                med, samples = rotation_us(ctx, keys, lv, on_tpu)
                entry["levels"][str(lv)] = {
                    "rotation_us": round(med, 1),
                    "samples": [round(s, 1) for s in samples]}
                print(f"N={n} alpha={alpha} L={lv}: {med:.1f} us "
                      f"(groups {shape})", file=sys.stderr)
            out["configs"].append(entry)

    # Noise leg at the compiled program's own parameter set.
    out["noise"] = {}
    for alpha in (1, 2):
        mse = noise_mse(nparams, sig, compiled, prog, alpha)
        out["noise"][str(alpha)] = mse
        print(f"noise: alpha={alpha} mse={mse:.3e}", file=sys.stderr)

    path = os.path.join(os.path.dirname(__file__), "alpha_sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
