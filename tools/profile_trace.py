"""Profile the Python TRACE cost of the whole-graph jax executor.

Round-5 finding: Sobel's first execute is dominated by Python tracing
(~140 s) rather than XLA compilation (~64 s). This tool isolates the
trace with jax.eval_shape (abstract values — no compile, no device) and
cProfiles it so the hotspots can be attacked directly.

Usage:  JAX_PLATFORMS=cpu python tools/profile_trace.py [sobel|harris]
"""
from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402
import jax  # noqa: E402

# The environment may pin JAX_PLATFORMS to the axon TPU tunnel via site
# config that overrides the env var; force the flag so this tool never
# touches the real chip (and never contends with a running bench).
jax.config.update("jax_platforms", "cpu")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "sobel"
    import bench
    from eva_tpu.ckks import CKKSCompiler
    from eva_tpu.runtime import generate_keys

    prog = (bench.build_sobel if which == "sobel" else bench.build_harris)()
    compiled, params, sig = CKKSCompiler(
        {"warn_vec_size": "false"}).compile(prog)
    print(f"{which}: compiled", flush=True)

    t0 = time.perf_counter()
    pub, sec = generate_keys(params, backend="jax")
    print(f"keygen: {time.perf_counter() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(11)
    inputs = {"image": rng.uniform(0, 1, prog.vec_size).tolist()}
    enc = pub.encrypt(inputs, sig)

    ex = pub._executor_for(compiled)
    hv, _ = ex._host_phase(enc)
    jp = ex._get_jax_program()
    cipher_in, plain_in = bench._device_inputs(jp, hv)

    # Warm pass (fills per-level table caches etc.) then measured pass.
    t0 = time.perf_counter()
    jax.eval_shape(jp._traced, cipher_in, plain_in)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.eval_shape(jp._traced, cipher_in, plain_in)
    second = time.perf_counter() - t0
    print(f"trace: first {warm:.1f}s, second {second:.1f}s", flush=True)

    pr = cProfile.Profile()
    pr.enable()
    jax.eval_shape(jp._traced, cipher_in, plain_in)
    pr.disable()
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(40)
    print(s.getvalue())
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("tottime")
    ps.print_stats(40)
    print(s.getvalue())


if __name__ == "__main__":
    main()
