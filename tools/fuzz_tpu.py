"""On-device fuzz smoke: random programs through the jax backend on the
REAL TPU (Mosaic-compiled kernels, not interpret mode).

The CPU fuzz campaigns (tests/test_fuzz.py) run every Pallas kernel in
interpret mode, which cannot catch Mosaic LOWERING regressions — e.g.
the round-2 "Broadcast in both sublanes and lanes" compile failure
introduced by a compiler update on the tunnel. This script compiles and
executes a handful of random programs end-to-end on the device and
checks MSE against the plaintext reference. Run it (with
tools/verify_ks_tpu.py) after any kernel change or environment update;
tools/tpu_recheck.sh wires both together.

Usage: python tools/fuzz_tpu.py [n_programs] [seed]
Each program costs one device compile (~20-40 s cold), so the default
count is small; coverage breadth comes from the op mix, not volume.
"""
import random
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    n_prog = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0x7B0
    import jax
    sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/tests")
    from test_fuzz import random_program, random_config
    from eva_tpu import evaluate
    from eva_tpu.ckks import CKKSCompiler
    from eva_tpu.metric import valuation_mse
    from eva_tpu.runtime import generate_keys

    print(f"backend={jax.default_backend()} programs={n_prog} "
          f"seed={hex(seed)}", flush=True)
    rng = random.Random(seed)
    failures = 0
    for i in range(n_prog):
        prog = random_program(rng, i)
        inputs = {name: [rng.uniform(-2, 2) for _ in range(prog.vec_size)]
                  for name in prog.inputs}
        ref = evaluate(prog, inputs)
        compiled, params, sig = CKKSCompiler(random_config(rng)).compile(prog)
        t0 = time.perf_counter()
        pub, sec = generate_keys(params, backend="jax")
        enc = pub.encrypt(inputs, sig)
        out = sec.decrypt(pub.execute(compiled, enc), sig)
        mse = valuation_mse(out, ref)
        ok = mse < 0.01
        failures += not ok
        print(f"  prog {i}: vec={prog.vec_size} N={params.poly_modulus_degree}"
              f" mse={mse:.2e} {(time.perf_counter()-t0):.0f}s "
              f"{'OK' if ok else 'FAIL'}", flush=True)
    print("PASS" if failures == 0 else f"FAIL ({failures})", flush=True)
    raise SystemExit(1 if failures else 0)


if __name__ == "__main__":
    main()
