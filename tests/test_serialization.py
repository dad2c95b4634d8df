"""Serialization tests: the 4-role protocol (compile -> keygen -> client
encrypt -> server execute -> client decrypt) across process boundaries via
files, plus wire-format details. Coverage model: reference
tests/features.py:154-217 and examples/serialization.py."""

import os
import tempfile

import numpy as np
import pytest

from eva_tpu import EvaProgram, Input, Output, evaluate, load, save
from eva_tpu.ckks import CKKSCompiler
from eva_tpu.ir import Op
from eva_tpu.metric import valuation_mse
from eva_tpu.runtime import generate_keys
from eva_tpu.serialization import (deserialize_program, save_to_string,
                                   load_from_string, serialize_program)


def _poly_program():
    poly = EvaProgram("Polynomial", vec_size=64)
    with poly:
        x = Input("x")
        Output("y", 3 * x ** 2 + 5 * x - 2)
    poly.set_output_ranges(20)
    poly.set_input_scales(30)
    return poly


class TestProgramRoundtrip:
    def test_program_structure_preserved(self):
        poly = _poly_program()
        compiled, _, _ = CKKSCompiler({"warn_vec_size": "false"}).compile(poly)
        clone = deserialize_program(serialize_program(compiled))
        assert clone.name == compiled.name
        assert clone.vec_size == compiled.vec_size
        assert set(clone.inputs) == set(compiled.inputs)
        assert set(clone.outputs) == set(compiled.outputs)
        ops = lambda p: sorted(t.op for t in p.topological_order())
        assert ops(clone) == ops(compiled)

    def test_program_semantics_preserved(self):
        poly = _poly_program()
        compiled, _, _ = CKKSCompiler({"warn_vec_size": "false"}).compile(poly)
        inputs = {"x": [i * 0.01 for i in range(64)]}
        clone = deserialize_program(serialize_program(compiled))
        assert valuation_mse(evaluate(compiled, inputs),
                             evaluate(clone, inputs)) < 1e-20

    def test_bytes_roundtrip(self):
        poly = _poly_program()
        data = save_to_string(poly)
        clone = load_from_string(data)
        assert clone.vec_size == poly.vec_size

    def test_format_version_rejected(self):
        from eva_tpu.serialization import eva_pb2
        msg = serialize_program(_poly_program())
        msg.ir_version = 99
        with pytest.raises(RuntimeError, match="format version"):
            deserialize_program(msg)


class TestFourRoleProtocol:
    def test_full_protocol_via_files(self):
        poly = _poly_program()
        inputs = {"x": [i * 0.01 for i in range(poly.vec_size)]}
        reference = evaluate(poly, inputs)

        compiled, params, signature = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(poly)

        with tempfile.TemporaryDirectory() as tmp:
            path = lambda f: os.path.join(tmp, f)
            # Compile time
            save(compiled, path("p.eva"))
            save(params, path("p.evaparams"))
            save(signature, path("p.evasignature"))
            # Key generation time
            params2 = load(path("p.evaparams"))
            public_ctx, secret_ctx = generate_keys(params2)
            save(public_ctx, path("p.pub"))
            save(secret_ctx, path("p.sec"))
            # Client: encrypt
            signature2 = load(path("p.evasignature"))
            public_ctx2 = load(path("p.pub"))
            enc_inputs = public_ctx2.encrypt(inputs, signature2)
            save(enc_inputs, path("in.vals"))
            # Server: execute
            prog2 = load(path("p.eva"))
            enc_in = load(path("in.vals"))
            enc_out = public_ctx2.execute(prog2, enc_in)
            save(enc_out, path("out.vals"))
            # Client: decrypt
            secret_ctx2 = load(path("p.sec"))
            enc_out2 = load(path("out.vals"))
            outputs = secret_ctx2.decrypt(enc_out2, signature2)

        assert valuation_mse(outputs, reference) < 0.01

    def test_params_and_signature_roundtrip(self):
        poly = _poly_program()
        _, params, signature = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(poly)
        with tempfile.TemporaryDirectory() as tmp:
            p = os.path.join(tmp, "x")
            save(params, p)
            params2 = load(p)
            assert params2 == params
            save(signature, p)
            sig2 = load(p)
            assert sig2.vec_size == signature.vec_size
            assert sig2.inputs["x"].scale == signature.inputs["x"].scale
            assert sig2.inputs["x"].level == signature.inputs["x"].level


class TestSeedXOF:
    """The wire-format XOF id travels with every serialized seed
    (docs/WIRE_FORMAT.md): SHAKE-128 by default, PCG64 as the legacy
    mode for pre-round-4 files."""

    def test_shake_expansion_deterministic_and_uniform(self):
        from eva_tpu.crypto import keys as K
        from eva_tpu.crypto.context import get_context
        ctx = get_context((30, 30, 30), (), 2048)
        seed = bytes(range(32))
        a = K.expand_uniform(ctx, ctx.data_primes, seed, K.XOF_SHAKE128)
        b = K.expand_uniform(ctx, ctx.data_primes, seed, K.XOF_SHAKE128)
        assert np.array_equal(a, b)
        for i, q in enumerate(ctx.data_primes):
            assert a[i].max() < q
            # crude uniformity: mean within 2% of q/2 over 2048 draws
            assert abs(a[i].mean() / (q / 2) - 1.0) < 0.06
        # differs from the legacy stream and across seeds/rows
        c = K.expand_uniform(ctx, ctx.data_primes, seed, K.XOF_PCG64)
        assert not np.array_equal(a, c)
        d = K.expand_uniform(ctx, ctx.data_primes, b"\x01" * 32,
                             K.XOF_SHAKE128)
        assert not np.array_equal(a, d)

    def test_shake_known_answer(self):
        """Golden values pin the SHAKE row construction itself: a format
        change (domain string, word order, rejection rule) breaks this."""
        from eva_tpu.crypto.keys import _shake_row
        row = _shake_row(b"\x00" * 32, 0, (1 << 31) - 2**24 + 1, 8)
        assert row.tolist() == [1772328851, 1802198551, 147367195,
                                965509098, 1469331277, 2101111915,
                                1800294704, 1255036654]

    def test_legacy_pcg64_files_still_load(self, monkeypatch):
        """Keys generated and serialized under the legacy XOF load and
        decrypt correctly in a default (SHAKE) process — the per-object
        tag, not the process environment, selects the expansion."""
        poly = _poly_program()
        inputs = {"x": [i * 0.01 for i in range(poly.vec_size)]}
        reference = evaluate(poly, inputs)
        compiled, params, sig = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(poly)
        monkeypatch.setenv("EVA_TPU_XOF", "pcg64")
        pub, sec = generate_keys(params)
        legacy_pub = save_to_string(pub)
        legacy_in = save_to_string(sec.encrypt(inputs, sig))
        monkeypatch.delenv("EVA_TPU_XOF")
        pub2 = load_from_string(legacy_pub)
        enc2 = load_from_string(legacy_in)
        out = sec.decrypt(pub2.execute(compiled, enc2), sig)
        assert valuation_mse(out, reference) < 0.01

    def test_default_seeds_tagged_shake(self):
        from eva_tpu.crypto import keys as K
        from eva_tpu.serialization import serialize_public, \
            serialize_valuation
        poly = _poly_program()
        inputs = {"x": [i * 0.01 for i in range(poly.vec_size)]}
        _, params, sig = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(poly)
        pub, sec = generate_keys(params)
        msg = serialize_public(pub)
        assert msg.pk_xof == K.XOF_SHAKE128
        assert msg.relin.xof == K.XOF_SHAKE128
        vmsg = serialize_valuation(sec.encrypt(inputs, sig))
        assert all(c.xof == K.XOF_SHAKE128
                   for c in vmsg.ciphers.values())


class TestSeededEncryption:
    def test_seeded_ciphertexts_halve_upload_and_roundtrip(self):
        """EVASecret.encrypt produces seeded (c0, seed) ciphertexts that
        serialize at half the size and execute identically after reload."""
        import random
        random.seed(31)
        poly = _poly_program()
        inputs = {"x": [random.uniform(-2, 2) for _ in range(poly.vec_size)]}
        reference = evaluate(poly, inputs)
        compiled, params, sig = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(poly)
        pub, sec = generate_keys(params)
        with tempfile.TemporaryDirectory() as tmp:
            p_pk = os.path.join(tmp, "pk")
            p_sk = os.path.join(tmp, "sk")
            save(pub.encrypt(inputs, sig), p_pk)
            save(sec.encrypt(inputs, sig), p_sk)
            assert os.path.getsize(p_sk) < 0.6 * os.path.getsize(p_pk)
            loaded = load(p_sk)
            out = sec.decrypt(pub.execute(compiled, loaded), sig)
        assert valuation_mse(out, reference) < 0.01
