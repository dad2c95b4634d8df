"""Shared helpers: the double-oracle check used across the suite.

(1) compile must preserve plaintext semantics: MSE < 1e-10 between the
    reference execution of the source and compiled programs;
(2) the full HE round-trip (keygen -> encrypt -> execute -> decrypt) must
    match the plaintext reference within MSE < 0.01.
Mirrors the reference test strategy (tests/common.py:12-36)."""

from random import uniform

from eva_tpu import evaluate
from eva_tpu.ckks import CKKSCompiler
from eva_tpu.metric import valuation_mse


def compile_and_check(prog, inputs=None, config=None, he=True, backend=None):
    config = dict(config or {})
    config.setdefault("warn_vec_size", "false")
    if inputs is None:
        inputs = {name: [uniform(-2, 2) for _ in range(prog.vec_size)]
                  for name in prog.inputs}

    reference = evaluate(prog, inputs)

    compiler = CKKSCompiler(config=config)
    compiled, params, signature = compiler.compile(prog)

    reference_compiled = evaluate(compiled, inputs)
    ref_mse = valuation_mse(reference, reference_compiled)
    assert ref_mse < 1e-10, f"compile-time MSE too high: {ref_mse}"

    if he:
        from eva_tpu.runtime import generate_keys
        public_ctx, secret_ctx = generate_keys(params, backend=backend)
        enc_inputs = public_ctx.encrypt(inputs, signature)
        enc_outputs = public_ctx.execute(compiled, enc_inputs)
        outputs = secret_ctx.decrypt(enc_outputs, signature)
        he_mse = valuation_mse(outputs, reference)
        assert he_mse < 0.01, f"HE round-trip MSE too high: {he_mse}"

    return compiled, params, signature
