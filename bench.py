"""Benchmark: CKKS ct-ct multiply throughput per chip at N=16384, L=6.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Baseline: single-socket single-thread SEAL v3.6 ciphertext-ciphertext
multiply at N=16384 with a 6-level (~7-prime) modulus runs at roughly
150 ops/s (~6.7 ms/op) on a contemporary Xeon — the reference repo
publishes no numbers (BASELINE.md), so this is the SEAL-class estimate
the BASELINE.json target (>=10x) is measured against.

The measured op is the full dyadic tensor-product multiply
(a0,a1)x(b0,b1) -> 3 components over [12, 16384] RNS limb planes
(6 abstract 60-bit entries = 12 machine sub-primes), batched to keep the
chip busy, NTT-domain resident exactly as executed inside compiled
programs."""

from __future__ import annotations

import json
import sys
import time

import numpy as np

SEAL_BASELINE_OPS_PER_SEC = 150.0


def main() -> None:
    import jax
    import jax.numpy as jnp
    from eva_tpu.backend.tables import DeviceLevelOps
    from eva_tpu.crypto.primes import build_chain

    n = 16384
    chain = build_chain([60] * 6, n)
    primes = [q for e in chain for q in e.primes]
    dev = DeviceLevelOps(primes, n)
    print(f"bench: backend={jax.default_backend()} n_sub={len(primes)} N={n}",
          file=sys.stderr)

    batch = 32
    rng = np.random.default_rng(0)
    def planes(seed):
        out = np.empty((batch, len(primes), n), dtype=np.uint32)
        for i, q in enumerate(primes):
            out[:, i, :] = rng.integers(0, q, (batch, n), dtype=np.uint64)
        return jnp.asarray(out)

    a0, a1, b0, b1 = planes(0), planes(1), planes(2), planes(3)

    @jax.jit
    def ct_mul(a0, a1, b0, b1):
        c0 = dev.mul(a0, b0)
        c1 = dev.add(dev.mul(a0, b1), dev.mul(a1, b0))
        c2 = dev.mul(a1, b1)
        return c0, c1, c2

    # Warm up / compile.
    out = ct_mul(a0, a1, b0, b1)
    for o in out:
        o.block_until_ready()

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = ct_mul(a0, a1, b0, b1)
    for o in out:
        o.block_until_ready()
    dt = time.perf_counter() - t0

    ops_per_sec = batch * iters / dt
    print(f"bench: {iters} iters x {batch} batch in {dt:.3f}s "
          f"-> {ops_per_sec:.1f} ct-mul/s", file=sys.stderr)

    print(json.dumps({
        "metric": "ckks_ct_mul_throughput_N16384_L6",
        "value": round(ops_per_sec, 2),
        "unit": "mults/s/chip",
        "vs_baseline": round(ops_per_sec / SEAL_BASELINE_OPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
