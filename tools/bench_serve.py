"""Serving-loop throughput: execute_pipelined vs sequential execute.

The server role of the 4-role protocol processes a stream of encrypted
requests. Per-request cost has three parts: host phase (encode/plan),
device compute, and device->host output fetch. Sequential `execute`
pays their SUM; `execute_pipelined` keeps `depth` executions in flight
so the parts overlap and steady-state cost approaches the MAX of the
parts. On the axon tunnel the fetch dominates (~54 ms for a Sobel
output at ~10 MB/s), so the expected win here is modest; on local
hardware (fetch ~1 ms) the same loop is compute-bound.

Usage: python tools/bench_serve.py [n_requests]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    n_req = int(sys.argv[1]) if len(sys.argv) > 1 else 12

    import jax
    from bench import build_sobel
    from eva_tpu.ckks import CKKSCompiler
    from eva_tpu.metric import valuation_mse
    from eva_tpu.runtime import generate_keys
    from eva_tpu import evaluate

    print(f"backend={jax.default_backend()} requests={n_req}", flush=True)
    prog = build_sobel()
    compiled, params, sig = CKKSCompiler(
        {"warn_vec_size": "false"}).compile(prog)
    pub, sec = generate_keys(params, backend="jax")
    rng = np.random.default_rng(23)
    ins = [{"image": rng.uniform(0, 1, prog.vec_size).tolist()}
           for _ in range(n_req)]
    encs = [pub.encrypt(i, sig) for i in ins]

    # warm (compile)
    _ = pub.execute(compiled, encs[0])

    t0 = time.perf_counter()
    seq_outs = [pub.execute(compiled, e) for e in encs]
    t_seq = time.perf_counter() - t0

    t0 = time.perf_counter()
    pipe_outs = list(pub.execute_pipelined(compiled, iter(encs), depth=3))
    t_pipe = time.perf_counter() - t0

    # parity: same ciphertexts
    for s, p in zip(seq_outs, pipe_outs):
        for name in s:
            assert s[name].scale == p[name].scale
            for a, b in zip(s[name].polys, p[name].polys):
                assert np.array_equal(a, b)
    ref = evaluate(prog, ins[0])
    mse = valuation_mse(sec.decrypt(pipe_outs[0], sig), ref)

    print(f"sequential: {t_seq/n_req*1e3:.1f} ms/req "
          f"({n_req/t_seq:.2f} req/s)", flush=True)
    print(f"pipelined:  {t_pipe/n_req*1e3:.1f} ms/req "
          f"({n_req/t_pipe:.2f} req/s)  speedup {t_seq/t_pipe:.2f}x",
          flush=True)
    print(f"parity OK, mse vs plaintext reference {mse:.2e}", flush=True)


if __name__ == "__main__":
    main()
