"""Benchmark: CKKS ct-ct multiply throughput per chip at N=16384, L=6.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Baseline: single-socket single-thread SEAL v3.6 ciphertext-ciphertext
multiply at N=16384 with a 6-level (~7-prime) modulus runs at roughly
150 ops/s (~6.7 ms/op) on a contemporary Xeon — the reference repo
publishes no numbers (BASELINE.md), so this is the SEAL-class estimate
the BASELINE.json target (>=10x) is measured against.

Methodology: the device runtime dispatches asynchronously and
block_until_ready may return before queued work completes (observed on
the axon tunnel), so we time CHAINED executions (each iteration consumes
the previous result, forcing serialization) ending in a device-side
reduction fetched to host, and report the slope between two chain
lengths — subtracting fetch and dispatch overhead.

The measured op is the full dyadic tensor-product multiply
(a0,a1)x(b0,b1) -> 3 components over [12, 16384] RNS limb planes
(6 abstract 60-bit entries = 12 machine sub-primes), NTT-domain resident
exactly as executed inside compiled programs, batched 32-wide."""

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

    def planes(seed):
        r = np.random.default_rng(seed)
        out = np.empty((batch, len(primes), n), dtype=np.uint32)
        for i, q in enumerate(primes):
            out[:, i, :] = r.integers(0, q, (batch, n), dtype=np.uint64)
        return jnp.asarray(out)

    x, a1, b0, b1 = planes(0), planes(1), planes(2), planes(3)

    @jax.jit
    def ct_mul_chain(a0):
        # The production tensor-product path (fused single-pass Pallas
        # kernel on TPU). All three components are returned (jit outputs
        # are always materialized, so nothing is dead-code-eliminated);
        # iterations chain on the middle one.
        return tuple(dev.tensor_product(a0, a1, b0, b1))

    red = jax.jit(lambda c0, c1, c2: jnp.sum((c0 ^ c1 ^ c2) >> 31))
    out = ct_mul_chain(x)
    _ = int(red(*out))  # compile both

    def chain_time(reps: int) -> float:
        cur = x
        t0 = time.perf_counter()
        for _ in range(reps):
            out = ct_mul_chain(cur)
            cur = out[1]
        _ = int(red(*out))  # host fetch forces the whole chain
        return time.perf_counter() - t0

    d_short = chain_time(5)
    d_long = chain_time(45)
    per_exec = (d_long - d_short) / 40
    ops_per_sec = batch / per_exec
    print(f"bench: slope {per_exec*1e3:.3f} ms/exec (batch {batch}) "
          f"-> {ops_per_sec:.0f} ct-mul/s", file=sys.stderr)

    print(json.dumps({
        "metric": "ckks_ct_mul_throughput_N16384_L6",
        "value": round(ops_per_sec, 2),
        "unit": "mults/s/chip",
        "vs_baseline": round(ops_per_sec / SEAL_BASELINE_OPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # never exit without the JSON line
        print(f"bench: FAILED: {exc}", file=sys.stderr)
        print(json.dumps({
            "metric": "ckks_ct_mul_throughput_N16384_L6",
            "value": 0.0,
            "unit": "mults/s/chip",
            "vs_baseline": 0.0,
        }))
        raise SystemExit(1)
