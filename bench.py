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
  kernel_sol                                per-kernel us + % of measured
                                            HBM speed-of-light (NTT, iNTT,
                                            key-switch stage split, ct-mul,
                                            rotation) — BASELINE.md's
                                            per-kernel roofline requirement

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
WATCHDOG_S = 3300
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
                             ("sobel90", 1e3, "ms")):
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


def setup_sobel(on_tpu: bool):
    """Compile the Sobel pipeline; returns (measure() -> compute_seconds,
    once_extras) where once_extras carries the single-shot numbers
    (with-IO latency, batched throughput, host baseline, MSE).

    compute_seconds times the jitted device graph with the SAME
    chained-dispatch + single-fetch slope methodology as the other
    metrics: on the tunnel, fetching the output ciphertext to host costs
    ~50 ms of pure link latency (measured: the jitted graph runs in
    ~4 ms; np.asarray of the outputs takes 54 ms), which is test-harness
    I/O, not framework time — output fetch is the client-role decrypt
    hand-off in the 4-role protocol and overlaps the next execution in
    deployment. with_io keeps the fetch-inclusive number honest."""
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
    out = pub.execute(compiled, enc)  # compile + warm
    reps = 3 if on_tpu else 1
    t0 = time.perf_counter()
    for _ in range(reps):
        out = pub.execute(compiled, enc)
    io_s = (time.perf_counter() - t0) / reps
    mse = valuation_mse(sec.decrypt(out, sig), ref)

    # Compute-only: chained dispatches of the jitted graph, one tiny
    # device-side reduction fetched at the end, slope between two chain
    # lengths (identical methodology to the ct-mul bench).
    import jax.numpy as jnp
    ex = pub._executors[id(compiled)]
    hv, _ = ex._host_phase(enc)
    jp = ex._jax_program
    cipher_in, plain_in = {}, {}
    from eva_tpu.backend.executor_jax import _to_u32
    from eva_tpu.crypto.ciphertext import Ciphertext, Plaintext
    for idx, v in hv.items():
        if isinstance(v, Ciphertext):
            cipher_in[f"t{idx}"] = jp._upload(
                v, lambda ct: [jnp.asarray(_to_u32(c)) for c in ct.polys])
        elif isinstance(v, Plaintext):
            plain_in[f"t{idx}"] = jp._upload(
                v, lambda pt: jnp.asarray(_to_u32(pt.poly)))

    def fetch(o):
        return sum(float(jnp.sum(planes[0][0] >> 31))
                   for planes in o.values())

    _ = fetch(jp._jitted(cipher_in, plain_in))

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

    batch = 4
    encs = [enc] * batch
    pub.execute_batch(compiled, encs)  # compile + warm the batched form
    t0 = time.perf_counter()
    for _ in range(reps):
        pub.execute_batch(compiled, encs)
    batched_eps = batch * reps / (time.perf_counter() - t0)

    from eva_tpu.runtime import EVAPublic
    pub_h = EVAPublic(pub.ctx, pub._keys, params, backend="numpy")
    t0 = time.perf_counter()
    pub_h.execute(compiled, enc)
    host_s = time.perf_counter() - t0

    once = {
        "sobel90_with_io_ms": round(io_s * 1e3, 1),
        "sobel90_batched_evals_per_sec": round(batched_eps, 2),
        "sobel90_host_ms": round(host_s * 1e3, 1),
        "sobel90_mse": mse,
    }
    return measure, once


def setup_kernel_sol(ctx, keys, on_tpu: bool):
    """Per-kernel speed-of-light section (BASELINE.md requirement).

    Compiles the hot kernels (forward/inverse NTT; the key-switch stage
    split: digit decomposition = iNTT+FBE+digit-NTTs, then MAC+epilogue
    = KSK MACs + iNTT + P-division + output NTT) and the HBM roofline
    probe; returns measure() -> dict of
      {kernel: {us, gbs, sol_pct}} + {"hbm_gbs": ...}.
    Bytes models follow eva_tpu/profiling.py: an NTT reads+writes its
    planes once (Pallas, VMEM-resident); the key-switch additionally
    streams the key planes once per digit group."""
    import jax
    import jax.numpy as jnp
    from eva_tpu.backend.executor_jax import (JaxProgram, device_keys,
                                              level_ops)

    level = 0
    primes = ctx.primes_at_level(level)
    n_cur = len(primes)
    dev = level_ops(primes, N)
    batch = 8 if on_tpu else 2
    poly = jnp.asarray(_planes(primes, N, batch, 3))
    plane_bytes = batch * n_cur * N * 4

    shim = JaxProgram.__new__(JaxProgram)
    shim.ctx, shim.keys, shim.k = ctx, keys, 1
    shim.dkeys = device_keys(ctx, keys)

    n_ext = n_cur + len(ctx.key_primes)
    n_groups = -(-n_cur // keys.ks_alpha)
    key_bytes = 2 * n_groups * n_ext * N * 4
    # digit stage: read n_cur planes, write n_groups*n_ext digit planes
    digit_bytes = batch * (n_cur + n_groups * n_ext) * N * 4
    # MAC+epilogue: read digit planes + keys once, write 2 output polys
    mac_bytes = batch * (n_groups * n_ext + 2 * n_cur) * N * 4 + key_bytes
    rot_bytes = batch * 4 * n_cur * N * 4 + key_bytes

    g = ctx.galois_elt(1)
    layout = shim.dkeys.layout(keys.galois[g], level)

    steps = {
        "ntt_fwd": (jax.jit(dev.ntt), 2 * plane_bytes),
        "intt": (jax.jit(dev.intt), 2 * plane_bytes),
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

    steps["ks_digits(intt+fbe+ntt)"] = (digits_step, digit_bytes)
    steps["ks_full(digits+mac+pdiv)"] = (apply_step, digit_bytes + mac_bytes)

    from eva_tpu.profiling import measure_hbm_roofline

    red = jax.jit(lambda v: jnp.sum(v >> 31))

    def slope(fn) -> float:
        def chain_time(reps):
            best = 1e9
            for _ in range(2 if on_tpu else 1):
                cur = poly
                t0 = time.perf_counter()
                for _ in range(reps):
                    cur = fn(cur)
                _ = float(red(cur))
                best = min(best, time.perf_counter() - t0)
            return best
        r1, r2 = (4, 24) if on_tpu else (1, 3)
        return max((chain_time(r2) - chain_time(r1)) / (r2 - r1), 1e-9)

    def measure(out: dict) -> dict:
        """Fills `out` INCREMENTALLY (one compile per kernel), so a
        watchdog still captures whatever kernels landed."""
        hbm = measure_hbm_roofline(jax, jnp)
        out["hbm_gbs"] = round(hbm / 1e9, 1)
        for name, (fn, nbytes) in steps.items():
            _ = float(red(fn(poly)))  # compile
            per = slope(fn)
            out[name] = {"us": round(per / batch * 1e6, 1),
                         "gbs": round(nbytes / per / 1e9, 1),
                         "sol_pct": round(100 * nbytes / per / hbm, 1)}
            print(f"bench: kernel {name}: {out[name]}", file=sys.stderr)
        # stage split by subtraction: MAC+epilogue = full KS - digits
        dig = out["ks_digits(intt+fbe+ntt)"]["us"]
        full = out["ks_full(digits+mac+pdiv)"]["us"]
        out["ks_mac_epilogue_us"] = round(max(full - dig, 0.0), 1)
        # rotation SoL from the already-measured rotation median (same
        # jitted fn the rotation metric timed; no extra compile).
        rot_s = _med(_RESULTS.get("rotation_samples", []))
        if rot_s:
            per_op_bytes = rot_bytes / batch
            out["rotation"] = {
                "us": round(rot_s * 1e6, 1),
                "gbs": round(per_op_bytes / rot_s / 1e9, 1),
                "sol_pct": round(100 * per_op_bytes / rot_s / hbm, 1)}
        return out

    return measure


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

    measures["sobel90"], sobel_once = setup_sobel(on_tpu)
    extras.update(sobel_once)
    s0 = measures["sobel90"]()
    _RESULTS.setdefault("sobel90_samples", []).append(s0)
    print(f"bench: sobel {s0*1e3:.1f} ms compute (pass 1; "
          f"{sobel_once['sobel90_with_io_ms']} ms with tunnel IO, batched "
          f"{sobel_once['sobel90_batched_evals_per_sec']} evals/s, host "
          f"{sobel_once['sobel90_host_ms']} ms, "
          f"mse {sobel_once['sobel90_mse']:.2e})", file=sys.stderr)

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
        sobel_once["sobel90_host_ms"] / 1e3
        / _med(_RESULTS["sobel90_samples"]), 2)

    # Per-kernel speed-of-light section, incremental (watchdog-safe).
    sol = extras.setdefault("kernel_sol", {})
    setup_kernel_sol(ctx, keys, on_tpu)(sol)
    print(f"bench: kernel SoL {json.dumps(sol)}", file=sys.stderr)

    _emit()


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # never exit without the JSON line
        print(f"bench: FAILED: {exc}", file=sys.stderr)
        _emit(note=f"FAILED: {exc}")
        raise SystemExit(1)
