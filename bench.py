"""Benchmark: the three dominant CKKS workloads on one chip, against a
MEASURED SEAL-class baseline (this repo's own single-thread numpy+C++
host backend — the same algorithms SEAL executes, on the host CPU).

Prints ONE JSON line. The headline metric stays ct-ct multiply
throughput at N=16384 L=6 (the BASELINE.json >=10x target); the
`extras` field carries the other driver-visible measurements:

  ct_mul_per_sec / ct_mul_host_per_sec      dyadic tensor-product multiply
  rotation_us / rotation_host_us            full Galois rotation (key switch)
  sobel_ms / sobel_host_ms                  Sobel 90x90 end-to-end execute
                                            (reference workload:
                                            examples/image_processing.py)
  harris_ms / harris_host_ms                Harris 90x90 corner response
                                            (reference workload, deeper
                                            depth + 5 convolutions:
                                            examples/image_processing.py:65-100)
  sobel90_batched / with_io / host          all median-of-PASSES with
                                            samples+spread (no single-shot
                                            numbers in the artifact)
  kernel_sol                                per-kernel us + % of measured
                                            HBM speed-of-light AND % of
                                            measured VPU modular-multiply
                                            speed-of-light (NTT, iNTT,
                                            key-switch stage split incl.
                                            MAC/epilogue, rotation) —
                                            BASELINE.md's per-kernel
                                            roofline requirement
  sobel_compile_cold_s / _warm_s            whole-graph XLA compile cost
                                            with the persistent cache off/on

Methodology: the device runtime dispatches asynchronously and
block_until_ready may return before queued work completes (observed on
the axon tunnel), so device ops are timed as CHAINED executions (each
iteration consumes the previous result) ending in a host fetch, and the
per-op time is the slope between two chain lengths — subtracting fetch
and dispatch overhead. Host baselines are plain wall-clock over the
synchronous numpy backend.

Variance: the tunnel drifts +-15% across sessions (ARCHITECTURE.md), so
every device metric is sampled in PASSES x interleaved rounds (compile
once, re-measure each round, metrics alternating so drift hits them
equally); the JSON carries the per-metric MEDIAN plus the raw samples."""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

import numpy as np

N = 16384
L = 6
PASSES = 3  # interleaved measurement rounds per device metric

# The tunnel to the real TPU can wedge (device calls hang forever at 0%
# CPU with SIGINT swallowed). The driver needs the JSON line no matter
# what, so: (a) before touching jax in-process, probe the device in a
# SUBPROCESS with a timeout and re-exec under a CPU-only environment if
# the probe dies; (b) a watchdog thread hard-exits with a JSON line
# built from partial results if any later device call hangs.
PROBE_TIMEOUT_S = 120
WATCHDOG_S = 3900  # harris + kernel + compile sections on a cold cache
_RESULTS: dict = {}


def _med(samples):
    return statistics.median(samples) if samples else 0.0


def _spread(samples):
    return (max(samples) - min(samples)) / _med(samples) if samples else 0.0


def _emit(note: str = "") -> None:
    """Print the one driver-visible JSON line from whatever completed.

    Device metrics live in _RESULTS as sample lists; the emitted value is
    the median across interleaved passes, with the raw samples preserved
    in extras for variance inspection."""
    ct_mul = _med(_RESULTS.get("ct_mul_samples", []))
    ct_mul_host = _RESULTS.get("ct_mul_host", 0.0)
    extras = dict(_RESULTS.get("extras", {}))
    extras["passes"] = PASSES
    extras["ct_mul_per_sec"] = round(ct_mul, 2)
    for key, scale, unit in (("ct_mul", 1.0, "per_sec"),
                             ("rotation", 1e6, "us"),
                             ("sobel90", 1e3, "ms"),
                             ("harris", 1e3, "ms"),
                             ("sobel90_batched", 1.0, "evals_per_sec"),
                             ("sobel90_with_io", 1e3, "ms"),
                             ("sobel90_host", 1e3, "ms")):
        samples = _RESULTS.get(f"{key}_samples", [])
        if samples:
            extras[f"{key}_{unit}"] = round(_med(samples) * scale, 2)
            extras[f"{key}_samples_{unit}"] = [round(s * scale, 2)
                                               for s in samples]
            extras[f"{key}_spread"] = round(_spread(samples), 3)
    if note:
        extras["note"] = note
    print(json.dumps({
        "metric": "ckks_ct_mul_throughput_N16384_L6",
        "value": round(ct_mul, 2),
        "unit": "mults/s/chip",
        "vs_baseline": round(ct_mul / ct_mul_host, 2) if ct_mul_host else 0.0,
        "extras": extras,
    }), flush=True)


def _device_probe_ok() -> bool:
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=PROBE_TIMEOUT_S, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _reexec_cpu() -> None:
    print("bench: device probe failed/hung — falling back to CPU",
          file=sys.stderr)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disables the axon site hook
    env["JAX_PLATFORMS"] = "cpu"
    env["EVA_BENCH_CPU_FALLBACK"] = "1"
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)],
              env)


def _arm_watchdog() -> None:
    import threading

    def fire():
        print(f"bench: WATCHDOG after {WATCHDOG_S}s — device hang; "
              "emitting partial results", file=sys.stderr)
        _emit(note=f"watchdog fired after {WATCHDOG_S}s (device hang); "
                   "partial results")
        os._exit(1)

    t = threading.Timer(WATCHDOG_S, fire)
    t.daemon = True
    t.start()


def _planes(primes, n, batch, seed):
    r = np.random.default_rng(seed)
    shape = (batch, len(primes), n) if batch else (len(primes), n)
    out = np.empty(shape, dtype=np.uint32)
    for i, q in enumerate(primes):
        out[..., i, :] = r.integers(0, q, shape[:-2] + (n,), dtype=np.uint64)
    return out


def setup_ct_mul(on_tpu: bool):
    """Compile the chained ct-ct multiply; returns measure() -> ops/sec."""
    import jax
    import jax.numpy as jnp
    from eva_tpu.backend.tables import DeviceLevelOps
    from eva_tpu.crypto.primes import build_chain

    chain = build_chain([60] * L, N)
    primes = [q for e in chain for q in e.primes]
    dev = DeviceLevelOps(primes, N)
    batch = 32 if on_tpu else 2

    x, a1, b0, b1 = (jnp.asarray(_planes(primes, N, batch, s))
                     for s in range(4))

    @jax.jit
    def ct_mul_chain(a0):
        # jit outputs are always materialized, so no component is DCE'd;
        # iterations chain on the middle one.
        return tuple(dev.tensor_product(a0, a1, b0, b1))

    red = jax.jit(lambda c0, c1, c2: jnp.sum((c0 ^ c1 ^ c2) >> 31))
    out = ct_mul_chain(x)
    _ = int(red(*out))  # compile both

    def chain_time(reps: int) -> float:
        best = 1e9
        for _ in range(3 if on_tpu else 1):
            cur = x
            t0 = time.perf_counter()
            for _ in range(reps):
                out = ct_mul_chain(cur)
                cur = out[1]
            _ = int(red(*out))  # host fetch forces the whole chain
            best = min(best, time.perf_counter() - t0)
        return best

    r1, r2 = (10, 90) if on_tpu else (1, 3)

    def measure() -> float:
        per_exec = (chain_time(r2) - chain_time(r1)) / (r2 - r1)
        return batch / per_exec

    return measure


def bench_ct_mul_host(ctx) -> float:
    """Single-thread numpy+C++ host backend ct-ct multiply; ops/sec.
    This is the measured SEAL-class denominator: the identical RNS/NTT
    algorithms SEAL runs, single-thread on this host's CPU."""
    from eva_tpu.crypto import ops as O
    from eva_tpu.crypto.ciphertext import Ciphertext

    primes = ctx.primes_at_level(0)
    a = Ciphertext([_planes(primes, N, 0, s).astype(np.uint64)
                    for s in (0, 1)], 0, 2.0 ** 40)
    b = Ciphertext([_planes(primes, N, 0, s).astype(np.uint64)
                    for s in (2, 3)], 0, 2.0 ** 40)
    O.multiply(ctx, a, b)  # warm caches
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        O.multiply(ctx, a, b)
    return reps / (time.perf_counter() - t0)


def setup_rotation(ctx, keys, on_tpu: bool):
    """Compile the batched rotation chain; returns measure() -> sec/op.

    Batched (8 rotations per dispatch) and chained at the Python level —
    the same methodology as the ct-mul bench. lax.scan chains measure
    ~70 us of per-iteration overhead on the tunnel device (verified with
    an identity scan body), so per-op cost comes from the slope of
    chained batched dispatches instead."""
    import jax
    import jax.numpy as jnp
    from eva_tpu.backend.executor_jax import (JaxProgram, device_keys,
                                              level_ops)

    level = 0
    primes = ctx.primes_at_level(level)
    shim = JaxProgram.__new__(JaxProgram)
    shim.ctx, shim.keys, shim.k = ctx, keys, 1
    shim.dkeys = device_keys(ctx, keys)
    dev = level_ops(primes, N)
    batch = 8 if on_tpu else 2
    poly = jnp.asarray(_planes(primes, N, batch, 7))

    @jax.jit
    def rot(p):
        out = shim._rotate([p, p], 1, level, dev, None, None)
        return dev.add(out[0], out[1])

    red = jax.jit(lambda c: jnp.sum(c >> 31))
    _ = int(red(rot(poly)))  # compile

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

    def measure() -> float:
        per_exec = (chain_time(r2) - chain_time(r1)) / (r2 - r1)
        return per_exec / batch

    return measure


def bench_rotation_host(ctx, keys) -> float:
    """Host-backend rotation per-op seconds."""
    from eva_tpu.crypto import ops as O
    from eva_tpu.crypto.ciphertext import Ciphertext

    primes = ctx.primes_at_level(0)
    a = Ciphertext([_planes(primes, N, 0, s).astype(np.uint64)
                    for s in (0, 1)], 0, 2.0 ** 40)
    O.rotate(ctx, keys, a, 1)  # warm
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        O.rotate(ctx, keys, a, 1)
    return (time.perf_counter() - t0) / reps


def build_sobel(h=90, w=90):
    """The reference benchmark workload (tests/large_programs.py:10-53,
    examples/image_processing.py:36-100): 2x 3x3 convolutions + cubic
    polynomial on the squared gradient magnitude."""
    from eva_tpu import EvaProgram, Input, Output

    prog = EvaProgram("sobel", vec_size=2 ** (math.ceil(math.log2(h * w))))
    with prog:
        image = Input("image")
        filt = [[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]]
        a1, a2, a3 = 2.2137874823876622, -1.0984324107372518, \
            0.17254603006834726
        Ix = Iy = None
        for i in range(3):
            for j in range(3):
                rotated = image << (i * w + j)
                horizontal = rotated * filt[i][j]
                vertical = rotated * filt[j][i]
                if Ix is None:
                    Ix, Iy = horizontal, vertical
                else:
                    Ix, Iy = Ix + horizontal, Iy + vertical
        x = Ix ** 2 + Iy ** 2
        Output("image", x * a1 + x ** 2 * a2 + x ** 3 * a3)
    prog.set_input_scales(45)
    prog.set_output_ranges(20)
    return prog


def build_harris(h=90, w=90):
    """The reference's second image workload
    (examples/image_processing.py:65-100): Sobel gradients, three 3x3
    box sums over their products, determinant/trace corner response.
    Deeper depth and 5 convolutions over 4 distinct sources — exercises
    multi-level key switches and the rotation-sum fusion the Sobel
    number cannot."""
    from eva_tpu import EvaProgram, Input, Output

    prog = EvaProgram("harris", vec_size=2 ** (math.ceil(math.log2(h * w))))
    with prog:
        image = Input("image")
        sobel_filter = [[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]]
        box = [[1, 1, 1], [1, 1, 1], [1, 1, 1]]
        k = 0.04

        def conv(img, filt, also_transposed=False):
            a = b = None
            for i in range(3):
                for j in range(3):
                    rot = img << (i * w + j)
                    hor = rot * filt[i][j]
                    a = hor if a is None else a + hor
                    if also_transposed:
                        ver = rot * filt[j][i]
                        b = ver if b is None else b + ver
            return (a, b) if also_transposed else a

        Ix, Iy = conv(image, sobel_filter, also_transposed=True)
        Sxx = conv(Ix * Ix, box)
        Syy = conv(Iy * Iy, box)
        Sxy = conv(Ix * Iy, box)
        det = Sxx * Syy - Sxy * Sxy
        trace = Sxx + Syy
        Output("image", det - k * trace * trace)
    prog.set_input_scales(30)
    prog.set_output_ranges(20)
    return prog


def _compute_slope(jp, cipher_in, plain_in, on_tpu: bool):
    """Chained dispatches of a compiled whole-graph executable with one
    tiny device-side reduction fetched at the end; slope between two
    chain lengths (the ct-mul methodology — tunnel fetch latency and
    dispatch overhead subtract out)."""
    import jax.numpy as jnp

    def fetch(o):
        return sum(float(jnp.sum(planes[0][..., 0, 0] >> 31))
                   for planes in o.values())

    _ = fetch(jp._jitted(cipher_in, plain_in))  # compile + warm

    def chain_time(k):
        best = 1e9
        for _ in range(3 if on_tpu else 1):
            t0 = time.perf_counter()
            for _ in range(k):
                o = jp._jitted(cipher_in, plain_in)
            _ = fetch(o)
            best = min(best, time.perf_counter() - t0)
        return best

    k1, k2 = (3, 9) if on_tpu else (1, 2)

    def measure() -> float:
        return (chain_time(k2) - chain_time(k1)) / (k2 - k1)

    return measure


def _device_inputs(jp, hv):
    """Split a host-phase valuation into the executor's device input
    trees (the same upload path run() takes, including extended-basis
    plaintext rows)."""
    import jax.numpy as jnp
    from eva_tpu.backend.executor_jax import _plain_np, _to_u32
    from eva_tpu.crypto.ciphertext import Ciphertext, Plaintext

    cipher_in, plain_in = {}, {}
    for idx, v in hv.items():
        if isinstance(v, Ciphertext):
            cipher_in[f"t{idx}"] = jp._upload(
                v, lambda ct: [jnp.asarray(_to_u32(c)) for c in ct.polys])
        elif isinstance(v, Plaintext):
            plain_in[f"t{idx}"] = jp._upload(
                v, lambda pt: jnp.asarray(_plain_np(pt)))
    return cipher_in, plain_in


def setup_sobel(on_tpu: bool):
    """Compile the Sobel pipeline; returns (measures, once_extras, env):
    measures maps metric name -> per-pass callable (every driver number
    gets the median-of-PASSES treatment — compute slope, batched compute
    throughput, with-IO latency, host baseline), once_extras carries the
    MSE and first-execute (trace+compile) seconds, env carries objects
    the compile-cost section reuses.

    Compute seconds time the jitted device graph with the chained-
    dispatch + single-fetch slope methodology: on the tunnel, fetching
    the output ciphertext to host costs ~50 ms of pure link latency,
    which is test-harness I/O, not framework time — output fetch is the
    client-role decrypt hand-off in the 4-role protocol and overlaps the
    next execution in deployment. with_io keeps the fetch-inclusive
    number honest; batched throughput is measured on the batched
    executable the same compute-slope way."""
    from eva_tpu import evaluate
    from eva_tpu.ckks import CKKSCompiler
    from eva_tpu.metric import valuation_mse
    from eva_tpu.runtime import generate_keys

    prog = build_sobel()
    compiled, params, sig = CKKSCompiler({"warn_vec_size": "false"}).compile(
        prog)
    rng = np.random.default_rng(11)
    inputs = {"image": rng.uniform(0, 1, prog.vec_size).tolist()}
    ref = evaluate(prog, inputs)

    pub, sec = generate_keys(params, backend="jax")
    enc = pub.encrypt(inputs, sig)
    t0 = time.perf_counter()
    out = pub.execute(compiled, enc)  # trace + compile (+cache) + warm
    first_exec_s = time.perf_counter() - t0
    mse = valuation_mse(sec.decrypt(out, sig), ref)
    reps = 3 if on_tpu else 1

    def with_io() -> float:
        t0 = time.perf_counter()
        for _ in range(reps):
            pub.execute(compiled, enc)
        return (time.perf_counter() - t0) / reps

    ex = pub._executors[id(compiled)]
    hv, _ = ex._host_phase(enc)
    jp = ex._jax_program
    cipher_in, plain_in = _device_inputs(jp, hv)
    compute = _compute_slope(jp, cipher_in, plain_in, on_tpu)

    # Batched compute throughput on the SAME whole-graph executable the
    # serving path runs (leading batch axis; unbatched cached encodes),
    # via the compute-slope methodology — round 4's single-shot
    # execute_batch wall-clock was tunnel-I/O dominated and disagreed 2x
    # between runs.
    import jax.numpy as jnp
    batch = 4
    bat_cipher = {k: [jnp.asarray(np.broadcast_to(np.asarray(c),
                                                  (batch,) + c.shape).copy())
                      for c in v] for k, v in cipher_in.items()}
    bat_compute = _compute_slope(jp, bat_cipher, plain_in, on_tpu)

    def batched_eps() -> float:
        return batch / bat_compute()

    from eva_tpu.runtime import EVAPublic
    pub_h = EVAPublic(pub.ctx, pub._keys, params, backend="numpy")

    def host() -> float:
        t0 = time.perf_counter()
        pub_h.execute(compiled, enc)
        return time.perf_counter() - t0

    measures = {
        "sobel90": compute,
        "sobel90_batched": batched_eps,
        "sobel90_with_io": with_io,
        "sobel90_host": host,
    }
    once = {
        "sobel90_mse": mse,
        "sobel90_first_execute_s": round(first_exec_s, 2),
    }
    env = {"compiled": compiled, "params": params, "pub": pub, "enc": enc,
           "ctx": pub.ctx, "keys": pub._keys}
    return measures, once, env


def setup_harris(on_tpu: bool):
    """Compile the Harris pipeline (its own parameter set: deeper chain
    than Sobel, so its own keys); returns (measures, once_extras)."""
    from eva_tpu import evaluate
    from eva_tpu.ckks import CKKSCompiler
    from eva_tpu.metric import valuation_mse
    from eva_tpu.runtime import generate_keys

    prog = build_harris()
    compiled, params, sig = CKKSCompiler({"warn_vec_size": "false"}).compile(
        prog)
    rng = np.random.default_rng(13)
    inputs = {"image": rng.uniform(0, 1, prog.vec_size).tolist()}
    ref = evaluate(prog, inputs)

    pub, sec = generate_keys(params, backend="jax")
    enc = pub.encrypt(inputs, sig)
    t0 = time.perf_counter()
    out = pub.execute(compiled, enc)
    first_exec_s = time.perf_counter() - t0
    mse = valuation_mse(sec.decrypt(out, sig), ref)

    ex = pub._executors[id(compiled)]
    hv, _ = ex._host_phase(enc)
    jp = ex._jax_program
    cipher_in, plain_in = _device_inputs(jp, hv)
    compute = _compute_slope(jp, cipher_in, plain_in, on_tpu)

    from eva_tpu.runtime import EVAPublic
    pub_h = EVAPublic(pub.ctx, pub._keys, params, backend="numpy")
    t0 = time.perf_counter()
    pub_h.execute(compiled, enc)
    host_s = time.perf_counter() - t0

    once = {
        "harris_mse": mse,
        "harris_first_execute_s": round(first_exec_s, 2),
        "harris_host_ms": round(host_s * 1e3, 1),
        "harris_N": params.poly_modulus_degree,
    }
    return {"harris": compute}, once


def measure_vpu_modmul(jax, jnp, dev, poly, on_tpu: bool) -> float:
    """Achievable VPU modular-multiply throughput (modmuls/sec): the
    compute-speed-of-light denominator. One dispatch runs a DEPENDENT
    chain of K Montgomery multiplies per element inside one jit
    (arithmetic intensity ~K muls per 8 bytes, so the VPU, not HBM,
    bounds it; the chain alternates two constants and each step feeds
    the next, so XLA can neither fold nor eliminate steps — modular
    integer ops admit no algebraic simplification). Dispatch overhead
    subtracts out via the usual two-length chain slope."""
    K = 16
    rows = poly.shape[-2]
    c1 = jnp.asarray(np.full((rows, 1), 3, np.uint32))
    c2 = jnp.asarray(np.full((rows, 1), 5, np.uint32))

    @jax.jit
    def burn(p):
        for _ in range(K // 2):
            p = dev.mul_mont(p, c1)
            p = dev.mul_mont(p, c2)
        return p

    red = jax.jit(lambda v: jnp.sum(v >> 31))
    _ = float(red(burn(poly)))

    def chain_time(reps):
        best = 1e9
        for _ in range(2 if on_tpu else 1):
            cur = poly
            t0 = time.perf_counter()
            for _ in range(reps):
                cur = burn(cur)
            _ = float(red(cur))
            best = min(best, time.perf_counter() - t0)
        return best

    r1, r2 = (4, 24) if on_tpu else (1, 3)
    # Ceiling probe: noise only inflates a slope, so keep the BEST of 2
    # positive slopes; a noise-negative pair falls back to the
    # (overhead-inclusive, so conservative) long-chain average.
    slopes = [(chain_time(r2) - chain_time(r1)) / (r2 - r1)
              for _ in range(2)]
    pos = [s for s in slopes if s > 0]
    per = min(pos) if pos else chain_time(r2) / r2
    n_elems = 1
    for d in poly.shape:
        n_elems *= d
    return n_elems * K / per


def setup_kernel_sol(ctx, keys, on_tpu: bool):
    """Per-kernel speed-of-light section (BASELINE.md requirement).

    Compiles the hot kernels (forward/inverse NTT; the key-switch stage
    split: digit decomposition = iNTT+FBE+digit-NTTs, the two-polynomial
    P-division epilogue, and the full switch) plus the HBM and VPU
    roofline probes; returns measure() -> dict of
      {kernel: {us, gbs, sol_pct, compute_pct}} + probe ceilings.
    Bytes models follow eva_tpu/profiling.py; modmul counts are the
    statically-known Shoup/Montgomery multiplies per element of each
    kernel (butterflies: log2(N)/2 per element per transform row; FBE:
    alpha*n_ext per digit group row; MACs: one per key row), so
    compute_pct = modmuls / elapsed / measured-VPU-modmul-rate. A
    kernel near 100% compute_pct is compute-bound: its low HBM sol_pct
    is not headroom."""
    import jax
    import jax.numpy as jnp
    from eva_tpu.backend.executor_jax import (JaxProgram, device_keys,
                                              level_ops)

    level = 0
    primes = ctx.primes_at_level(level)
    n_cur = len(primes)
    n_key = len(ctx.key_primes)
    dev = level_ops(primes, N)
    batch = 8 if on_tpu else 2
    poly = jnp.asarray(_planes(primes, N, batch, 3))
    plane_bytes = batch * n_cur * N * 4
    lg = int(math.log2(N))

    shim = JaxProgram.__new__(JaxProgram)
    shim.ctx, shim.keys, shim.k = ctx, keys, 1
    shim.dkeys = device_keys(ctx, keys)

    n_ext = n_cur + n_key
    alpha = keys.ks_alpha
    n_groups = -(-n_cur // alpha)
    key_bytes = 2 * n_groups * n_ext * N * 4
    # digit stage: read n_cur planes, write n_groups*n_ext digit planes
    digit_bytes = batch * (n_cur + n_groups * n_ext) * N * 4
    # MAC+epilogue: read digit planes + keys once, write 2 output polys
    mac_bytes = batch * (n_groups * n_ext + 2 * n_cur) * N * 4 + key_bytes
    rot_bytes = batch * 4 * n_cur * N * 4 + key_bytes
    epi_bytes = batch * 2 * (n_ext + n_cur) * N * 4

    # Statically-known modmuls per ring element (xN xbatch), per kernel.
    ntt_muls = n_cur * (lg / 2)
    intt_muls = n_cur * (lg / 2 + 1)  # + merged n^-1 twist row
    digit_muls = (intt_muls + n_cur  # input iNTT + y = d*inv
                  + n_groups * alpha * n_ext  # FBE products
                  + ((n_groups - 1) * n_cur + n_groups * n_key) * (lg / 2))
    mac_muls = 2 * (n_cur + (n_groups - 1) * n_cur + n_groups * n_key)
    epi_muls = 2 * (n_ext * (lg / 2 + 1)  # iNTT in the extended basis
                    + n_key * n_cur  # divide-and-round chain
                    + n_cur * (lg / 2))  # output NTT
    full_muls = digit_muls + mac_muls + epi_muls

    g = ctx.galois_elt(1)
    layout = shim.dkeys.layout(keys.galois[g], level)

    steps = {
        "ntt_fwd": (jax.jit(dev.ntt), 2 * plane_bytes, ntt_muls, None),
        "intt": (jax.jit(dev.intt), 2 * plane_bytes, intt_muls, None),
    }

    @jax.jit
    def digits_step(p):
        # Fold a lane-0 scalar from every digit component into the
        # chained output: lane 0 of an NTT output depends on all inputs,
        # so none of the digit NTTs can be dead-code-eliminated, while
        # only d.own pays an extra elementwise pass.
        d = shim._ks_digits(p, level)
        extra = jnp.sum(d.b[..., 0].astype(jnp.uint32))
        if d.a is not None:
            extra = extra + jnp.sum(d.a[..., 0].astype(jnp.uint32))
        return d.own + extra

    @jax.jit
    def apply_step(p):
        d = shim._ks_digits(p, level)
        d0, d1 = shim._ks_apply(d, level, layout)
        return dev.add(d0, d1)

    # Two-polynomial P-division epilogue, chained on an extended-basis
    # accumulator block (the first n_cur rows of the next input are the
    # epilogue outputs, keeping the chain dependent; key rows pass
    # through).
    ext_basis = primes + list(ctx.key_primes)
    acc0 = jnp.asarray(_planes(ext_basis, N, batch, 5))

    @jax.jit
    def epi_step(a):
        d0, d1 = shim._ks_div2(a, a, level)
        return jnp.concatenate([dev.add(d0, d1), a[..., n_cur:, :]],
                               axis=-2)

    steps["ks_digits(intt+fbe+ntt)"] = (digits_step, digit_bytes,
                                        digit_muls, None)
    steps["ks_epilogue(2xPdiv)"] = (epi_step, epi_bytes, epi_muls, acc0)
    steps["ks_full(digits+mac+pdiv)"] = (apply_step,
                                         digit_bytes + mac_bytes,
                                         full_muls, None)

    # MAC+epilogue measured DIRECTLY on precomputed digits: at v2 kernel
    # speeds the old full-dig-epi double subtraction mostly measured
    # dispatch-overhead deltas (ks_mac_only once read 109.5 us for an
    # untouched MAC kernel). Chain dependence: each iteration's own-rows
    # are perturbed by a bit derived from the previous MAC outputs, so
    # dispatches cannot overlap-collapse; the perturbation costs one
    # elementwise xor.
    from eva_tpu.backend.executor_jax import StructDigits
    dig0 = shim._ks_digits(poly, level)

    @jax.jit
    def mac_step(own):
        d = StructDigits(own, dig0.a, dig0.b, dig0.n_groups)
        d0, d1 = shim._ks_apply(d, level, layout)
        s = (d0[..., :1, :1] ^ d1[..., :1, :1]) & jnp.uint32(1)
        return own ^ jnp.broadcast_to(s, own.shape)

    steps["ks_mac+pdiv(direct)"] = (mac_step, mac_bytes + epi_bytes,
                                    mac_muls + epi_muls, dig0.own)

    from eva_tpu.profiling import measure_hbm_roofline

    red = jax.jit(lambda v: jnp.sum(v >> 31))

    def slope(fn, start) -> float:
        def chain_time(reps):
            best = 1e9
            for _ in range(2 if on_tpu else 1):
                cur = start
                t0 = time.perf_counter()
                for _ in range(reps):
                    cur = fn(cur)
                _ = float(red(cur))
                best = min(best, time.perf_counter() - t0)
            return best
        r1, r2 = (4, 24) if on_tpu else (1, 3)
        samples = []
        for _ in range(3 if on_tpu else 1):
            per = (chain_time(r2) - chain_time(r1)) / (r2 - r1)
            if per > 0:
                samples.append(per)
        if not samples:  # all noise-negative: long-chain average
            return chain_time(r2) / r2
        return statistics.median(samples)

    def measure(out: dict) -> dict:
        """Fills `out` INCREMENTALLY (one compile per kernel), so a
        watchdog still captures whatever kernels landed."""
        hbm = measure_hbm_roofline(jax, jnp)
        out["hbm_gbs"] = round(hbm / 1e9, 1)
        vpu = measure_vpu_modmul(jax, jnp, dev, poly, on_tpu)
        out["vpu_modmul_gops"] = round(vpu / 1e9, 1)
        for name, (fn, nbytes, muls, start) in steps.items():
            start = poly if start is None else start
            _ = float(red(fn(start)))  # compile
            per = slope(fn, start)
            out[name] = {"us": round(per / batch * 1e6, 1),
                         "gbs": round(nbytes / per / 1e9, 1),
                         "sol_pct": round(100 * nbytes / per / hbm, 1),
                         "compute_pct": round(
                             100 * muls * batch * N / per / vpu, 1)}
            print(f"bench: kernel {name}: {out[name]}", file=sys.stderr)
        # Stage split: decomposition and epilogue are direct; MAC comes
        # from the DIRECTLY measured mac+pdiv step minus the directly
        # measured epilogue (single subtraction of two same-methodology
        # numbers — the old full-dig-epi double subtraction broke down
        # at v2 kernel speeds).
        dig = out["ks_digits(intt+fbe+ntt)"]["us"]
        epi = out["ks_epilogue(2xPdiv)"]["us"]
        full = out["ks_full(digits+mac+pdiv)"]["us"]
        mac_pdiv = out["ks_mac+pdiv(direct)"]["us"]
        out["ks_mac_epilogue_us"] = round(max(full - dig, 0.0), 1)
        mac = max(mac_pdiv - epi, 0.0)
        out["ks_mac_only_us"] = round(mac, 1)
        # Publish the decomposition : MAC : epilogue ratios only when
        # the split is self-consistent (the MAC share of the directly
        # measured mac+pdiv step must be non-trivial; a drift-squeezed
        # subtraction can still produce a near-zero MAC on a bad pass).
        # The BSGSRotationFactorizer constants (passes.py DEC/MAC/EPI)
        # chain to these; validated 13.1 : 1 : 6.9 vs shipped
        # 12.3 : 1 : 7.0.
        if mac >= 0.05 * mac_pdiv:
            out["bsgs_cost_units"] = {
                "dec": round(dig / mac, 2), "mac": 1.0,
                "epi": round(epi / mac, 2)}
        else:
            out["bsgs_cost_units_unstable"] = {
                "dig_us": dig, "epi_us": epi, "mac_pdiv_us": mac_pdiv}
        # rotation SoL from the already-measured rotation median (same
        # jitted fn the rotation metric timed; no extra compile).
        rot_s = _med(_RESULTS.get("rotation_samples", []))
        if rot_s:
            per_op_bytes = rot_bytes / batch
            out["rotation"] = {
                "us": round(rot_s * 1e6, 1),
                "gbs": round(per_op_bytes / rot_s / 1e9, 1),
                "sol_pct": round(100 * per_op_bytes / rot_s / hbm, 1),
                "compute_pct": round(
                    100 * full_muls * N / rot_s / vpu, 1)}
        return out

    return measure


def measure_compile_cost(env) -> dict:
    """Cold/warm whole-graph compile seconds for the Sobel executable
    (VERDICT: compile time is a product metric for a compiler
    framework). Cold: persistent XLA cache disabled, fresh executor ->
    full retrace + XLA compile. Warm: cache re-enabled, fresh executor
    -> retrace + persistent-cache deserialize. Both include the host
    phase and one execution (~tens of ms, noise at this scale)."""
    import jax
    from eva_tpu.runtime import EVAPublic

    compiled, params, enc = env["compiled"], env["params"], env["enc"]
    ctx, keys = env["ctx"], env["keys"]
    out = {}
    orig = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        pub_cold = EVAPublic(ctx, keys, params, backend="jax")
        t0 = time.perf_counter()
        pub_cold.execute(compiled, enc)
        out["sobel_compile_cold_s"] = round(time.perf_counter() - t0, 1)
    finally:
        jax.config.update("jax_compilation_cache_dir", orig)
    pub_warm = EVAPublic(ctx, keys, params, backend="jax")
    t0 = time.perf_counter()
    pub_warm.execute(compiled, enc)
    out["sobel_compile_warm_s"] = round(time.perf_counter() - t0, 1)
    return out


def main() -> None:
    if (not os.environ.get("EVA_BENCH_CPU_FALLBACK")
            and os.environ.get("JAX_PLATFORMS", "") not in ("cpu", "")
            and not _device_probe_ok()):
        _reexec_cpu()
    _arm_watchdog()

    import jax
    from eva_tpu.crypto import keys as K
    from eva_tpu.crypto.context import get_context

    on_tpu = jax.default_backend() == "tpu"
    print(f"bench: backend={jax.default_backend()} N={N} L={L} "
          f"passes={PASSES}", file=sys.stderr)
    extras = _RESULTS.setdefault("extras", {})
    extras["baseline"] = ("measured single-thread numpy+C++ host backend "
                          "(SEAL-class CPU implementation) on this machine")
    extras["device_backend"] = jax.default_backend()

    ctx = get_context(tuple([60] * L + [60]), (1,), N)
    keys = K.generate_keys(ctx)

    # Pass 1: set up + first sample, in artifact-priority order so the
    # watchdog still leaves usable partials if the tunnel wedges late.
    measures = {}
    measures["ct_mul"] = setup_ct_mul(on_tpu)
    ct0 = measures["ct_mul"]()
    _RESULTS.setdefault("ct_mul_samples", []).append(ct0)
    print(f"bench: ct-mul {ct0:.0f}/s (pass 1)", file=sys.stderr)

    ct_mul_host = bench_ct_mul_host(ctx)
    print(f"bench: ct-mul host {ct_mul_host:.1f}/s", file=sys.stderr)
    _RESULTS["ct_mul_host"] = ct_mul_host
    extras["ct_mul_host_per_sec"] = round(ct_mul_host, 2)

    measures["rotation"] = setup_rotation(ctx, keys, on_tpu)
    r0 = measures["rotation"]()
    _RESULTS.setdefault("rotation_samples", []).append(r0)
    print(f"bench: rotation {r0*1e6:.0f} us (pass 1)", file=sys.stderr)

    rot_host = bench_rotation_host(ctx, keys)
    print(f"bench: rotation host {rot_host*1e3:.1f} ms", file=sys.stderr)
    extras["rotation_host_us"] = round(rot_host * 1e6, 1)

    sobel_measures, sobel_once, sobel_env = setup_sobel(on_tpu)
    extras.update(sobel_once)
    measures.update(sobel_measures)
    for name, fn in sobel_measures.items():
        v = fn()
        _RESULTS.setdefault(f"{name}_samples", []).append(v)
        print(f"bench: {name} pass 1: {v:.6g}", file=sys.stderr)
    print(f"bench: sobel mse {sobel_once['sobel90_mse']:.2e}, first "
          f"execute {sobel_once['sobel90_first_execute_s']} s",
          file=sys.stderr)

    harris_measures, harris_once = setup_harris(on_tpu)
    extras.update(harris_once)
    measures.update(harris_measures)
    h0 = harris_measures["harris"]()
    _RESULTS.setdefault("harris_samples", []).append(h0)
    print(f"bench: harris {h0*1e3:.1f} ms compute (pass 1; host "
          f"{harris_once['harris_host_ms']} ms, "
          f"mse {harris_once['harris_mse']:.2e})", file=sys.stderr)

    # Passes 2..PASSES: interleave the device metrics so tunnel drift
    # lands on all of them equally; medians emitted at the end. This runs
    # BEFORE the per-kernel section so the headline medians land even if
    # the watchdog cuts the kernel compiles short.
    for p in range(2, PASSES + 1):
        for name, fn in measures.items():
            val = fn()
            _RESULTS[f"{name}_samples"].append(val)
            print(f"bench: {name} pass {p}: {val:.6g}", file=sys.stderr)

    extras["rotation_vs_host"] = round(
        rot_host / _med(_RESULTS["rotation_samples"]), 2)
    extras["sobel90_vs_host"] = round(
        _med(_RESULTS["sobel90_host_samples"])
        / _med(_RESULTS["sobel90_samples"]), 2)
    extras["harris_vs_host"] = round(
        harris_once["harris_host_ms"] / 1e3
        / _med(_RESULTS["harris_samples"]), 2)

    # Per-kernel speed-of-light section, incremental (watchdog-safe).
    sol = extras.setdefault("kernel_sol", {})
    setup_kernel_sol(ctx, keys, on_tpu)(sol)
    print(f"bench: kernel SoL {json.dumps(sol)}", file=sys.stderr)

    # Whole-graph compile cost (cold vs persistent-cache warm).
    extras.update(measure_compile_cost(sobel_env))
    print(f"bench: compile cold {extras['sobel_compile_cold_s']} s, "
          f"warm {extras['sobel_compile_warm_s']} s", file=sys.stderr)

    _emit()


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # never exit without the JSON line
        print(f"bench: FAILED: {exc}", file=sys.stderr)
        _emit(note=f"FAILED: {exc}")
        raise SystemExit(1)
