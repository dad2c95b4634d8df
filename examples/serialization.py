"""The 4-role protocol end to end through serialized files: compile-time
-> key-generation time -> client encrypt -> server execute -> client
decrypt, with every hand-off crossing a (simulated) machine boundary.

Port of the reference example (examples/serialization.py)."""

import os
import tempfile

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from eva import EvaProgram, Input, Output, evaluate, save, load
from eva.ckks import CKKSCompiler
from eva.seal import generate_keys
from eva.metric import valuation_mse


def main():
    # -- Compile time --------------------------------------------------------
    poly = EvaProgram("Polynomial", vec_size=4096)
    with poly:
        x = Input("x")
        Output("y", 3 * x ** 2 + 5 * x - 2)
    poly.set_output_ranges(20)
    poly.set_input_scales(30)

    compiler = CKKSCompiler(config={"warn_vec_size": "false"})
    compiled_poly, params, signature = compiler.compile(poly)

    tmp_dir = tempfile.mkdtemp()
    path = lambda name: os.path.join(tmp_dir, name)

    save(compiled_poly, path("poly.eva"))
    save(params, path("poly.evaparams"))
    save(signature, path("poly.evasignature"))

    # -- Key generation time -------------------------------------------------
    params = load(path("poly.evaparams"))
    public_ctx, secret_ctx = generate_keys(params)
    save(public_ctx, path("poly.evapublic"))
    save(secret_ctx, path("poly.evasecret"))

    # -- Runtime on client ---------------------------------------------------
    signature = load(path("poly.evasignature"))
    public_ctx = load(path("poly.evapublic"))
    inputs = {"x": [i / 4096 for i in range(signature.vec_size)]}
    enc_inputs = public_ctx.encrypt(inputs, signature)
    save(enc_inputs, path("poly_inputs.evavals"))

    # -- Runtime on server ---------------------------------------------------
    compiled_poly = load(path("poly.eva"))
    public_ctx = load(path("poly.evapublic"))
    enc_inputs = load(path("poly_inputs.evavals"))
    enc_outputs = public_ctx.execute(compiled_poly, enc_inputs)
    save(enc_outputs, path("poly_outputs.evavals"))

    # -- Back on client ------------------------------------------------------
    secret_ctx = load(path("poly.evasecret"))
    enc_outputs = load(path("poly_outputs.evavals"))
    outputs = secret_ctx.decrypt(enc_outputs, signature)

    reference = evaluate(compiled_poly, inputs)
    print("MSE", valuation_mse(outputs, reference))
    for f in os.listdir(tmp_dir):
        print(f"  {f}: {os.path.getsize(path(f))} bytes")


if __name__ == "__main__":
    main()
