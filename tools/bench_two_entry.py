"""On-chip A/B: two-entry special modulus (P ~ 2^120, alpha=4 digits)
vs the standard single entry (alpha=2).

Measures full-rotation latency (bench.py chained-slope methodology,
median of 3) for the same data chain under both key layouts, plus the
end-to-end noise of a rotation-bearing program compiled with
two_entry_ks on/off. Writes tools/two_entry_sweep.json.

Usage: python tools/bench_two_entry.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sweep_alpha import rotation_us  # noqa: E402


def main():
    import jax
    from eva_tpu import EvaProgram, Input, Output, evaluate
    from eva_tpu.ckks import CKKSCompiler
    from eva_tpu.crypto import keys as K
    from eva_tpu.crypto.context import get_context
    from eva_tpu.metric import valuation_mse
    from eva_tpu.runtime import generate_keys

    on_tpu = jax.default_backend() == "tpu"
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    out = {"backend": jax.default_backend(), "configs": []}

    n, n_entries = 16384, 5  # leave budget room for the second entry
    for key_terms in (1, 2):
        ctx = get_context(tuple([60] * n_entries + [60] * key_terms),
                          (1,), n, key_terms)
        alpha = len(ctx.key_primes)
        keys = K.generate_keys(ctx, alpha=alpha)
        for level in (0, n_entries - 2):
            med, samples = rotation_us(ctx, keys, level, on_tpu)
            entry = {"key_terms": key_terms, "alpha": alpha,
                     "level": level,
                     "groups": [len(g) for g in
                                ctx.ks_tables(level, alpha)[0]],
                     "rotation_us": round(med, 1),
                     "samples": [round(s, 1) for s in samples]}
            out["configs"].append(entry)
            print(entry, flush=True)

    # Noise leg: the deep rotation-bearing program through the compiler
    # option (numpy-free full pipeline on the jax backend).
    prog = EvaProgram("two_entry_noise", vec_size=4096)
    with prog:
        x = Input("x")
        y = x
        for _ in range(3):
            y = y * y
        acc = None
        for i, t in enumerate((1, 2, 9, 10)):
            term = (x << t) * (0.2 * (i % 5) - 0.4)
            acc = term if acc is None else acc + term
        Output("y", y + acc)
    prog.set_input_scales(40)
    prog.set_output_ranges(20)
    import random
    for cfg in ("false", "true"):
        compiled, params, sig = CKKSCompiler(
            {"warn_vec_size": "false", "two_entry_ks": cfg}).compile(prog)
        pub, sec = generate_keys(params, backend="jax")
        random.seed(17)
        inputs = {"x": [random.uniform(-1, 1)
                        for _ in range(prog.vec_size)]}
        enc = pub.encrypt(inputs, sig)
        got = sec.decrypt(pub.execute(compiled, enc), sig)
        mse = valuation_mse(got, evaluate(prog, inputs))
        entry = {"two_entry_ks": cfg, "key_terms": params.key_terms,
                 "alpha": pub._keys.relin.alpha, "noise_mse": mse}
        out["configs"].append(entry)
        print(entry, flush=True)

    path = os.path.join(os.path.dirname(__file__), "two_entry_sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
