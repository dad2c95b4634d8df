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


class TestGoldenFixtures:
    """Frozen wire-format bytes (tests/fixtures/, regenerated only
    intentionally via tools/make_golden_fixtures.py). Guards the concrete
    serializer behaviors the reference's C++ encoder pins — topological
    term order, op/attribute codes, version gate, envelope packing
    (eva_serialization.cpp:146-289) — so a silent format drift breaks a
    test instead of passing against itself."""

    FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")

    @staticmethod
    def _generator():
        import importlib.util
        path = os.path.join(os.path.dirname(__file__), "..", "tools",
                            "make_golden_fixtures.py")
        spec = importlib.util.spec_from_file_location("mkfix", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def _payload(self, blob: bytes):
        """(type_url, value) of the envelope — creator tag excluded so a
        version bump alone doesn't trip the byte comparison."""
        from eva_tpu.serialization import known_type_pb2
        env = known_type_pb2.KnownType()
        env.ParseFromString(blob)
        return env.contents.type_url, env.contents.value

    def test_frozen_bytes_load_and_reproduce_semantics(self):
        gen = self._generator()
        for build in (gen.readme_poly, gen.rotating):
            prog = build()
            compiled, params, sig = CKKSCompiler(
                {"warn_vec_size": "false"}).compile(prog)
            stem = prog.name.lower()
            loaded_prog = load(os.path.join(self.FIXDIR, f"{stem}.eva"))
            loaded_params = load(
                os.path.join(self.FIXDIR, f"{stem}.evaparams"))
            loaded_sig = load(
                os.path.join(self.FIXDIR, f"{stem}.evasignature"))
            inputs = {"x": [i * 0.001 for i in range(prog.vec_size)]}
            assert valuation_mse(evaluate(loaded_prog, inputs),
                                 evaluate(compiled, inputs)) < 1e-20
            assert loaded_params == params
            assert loaded_sig.vec_size == sig.vec_size
            for name in sig.inputs:
                assert loaded_sig.inputs[name].scale == sig.inputs[name].scale
                assert loaded_sig.inputs[name].level == sig.inputs[name].level

    def test_save_remains_byte_stable(self):
        gen = self._generator()
        for build in (gen.readme_poly, gen.rotating):
            prog = build()
            compiled, params, sig = CKKSCompiler(
                {"warn_vec_size": "false"}).compile(prog)
            stem = prog.name.lower()
            for obj, ext in ((compiled, "eva"), (params, "evaparams"),
                             (sig, "evasignature")):
                with open(os.path.join(self.FIXDIR, f"{stem}.{ext}"),
                          "rb") as f:
                    frozen = f.read()
                assert self._payload(save_to_string(obj)) == \
                    self._payload(frozen), \
                    f"{stem}.{ext}: serialized bytes drifted from the " \
                    f"frozen fixture — if intentional, regenerate via " \
                    f"tools/make_golden_fixtures.py and document the " \
                    f"change in docs/WIRE_FORMAT.md"


class TestContextChecks:
    """Valuations produced under different parameters are rejected with a
    clean error at use time — the analog of the reference's
    context-checked loads (seal_serialization.cpp:86-103)."""

    def _two_contexts(self):
        poly = _poly_program()
        compiled, params, sig = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(poly)
        other = EvaProgram("Other", vec_size=64)
        with other:
            x = Input("x")
            Output("y", ((x * x) * x) * x + x)
        other.set_output_ranges(24)
        other.set_input_scales(54)
        compiled2, params2, sig2 = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(other)
        assert params != params2  # different levels/primes
        return compiled, params, sig, params2, sig2

    def test_execute_rejects_foreign_valuation(self):
        compiled, params, sig, params2, sig2 = self._two_contexts()
        pub, sec = generate_keys(params)
        pub2, _ = generate_keys(params2)
        inputs = {"x": [0.1] * 64}
        enc = pub2.encrypt(inputs, sig2)
        with pytest.raises(RuntimeError, match="Parameter mismatch"):
            pub.execute(compiled, enc)
        with pytest.raises(RuntimeError, match="Parameter mismatch"):
            pub.execute_batch(compiled, [enc])

    def test_decrypt_rejects_foreign_valuation(self):
        compiled, params, sig, params2, sig2 = self._two_contexts()
        pub, sec = generate_keys(params)
        pub2, _ = generate_keys(params2)
        enc = pub2.encrypt({"x": [0.1] * 64}, sig2)
        with pytest.raises(RuntimeError, match="Parameter mismatch"):
            sec.decrypt(enc, sig)

    def test_matching_params_pass_after_reload(self):
        poly = _poly_program()
        compiled, params, sig = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(poly)
        pub, sec = generate_keys(params)
        inputs = {"x": [0.1] * 64}
        enc = load_from_string(save_to_string(pub.encrypt(inputs, sig)))
        out = sec.decrypt(pub.execute(compiled, enc), sig)
        assert valuation_mse(out, evaluate(poly, inputs)) < 0.01


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

    def test_shake_growth_path_prefix_stable(self):
        """Forcing the rejection-shortfall growth loop (tiny initial
        buffer) must produce the SAME row as the single-shot sizing:
        SHAKE digests are prefix-consistent across lengths, so the wire
        format does not depend on the buffer schedule."""
        from eva_tpu.crypto.keys import _shake_row
        q = (1 << 31) - 2 ** 24 + 1
        a = _shake_row(b"\x07" * 32, 3, q, 2048)
        b = _shake_row(b"\x07" * 32, 3, q, 2048, _nbytes0=64)
        assert np.array_equal(a, b)

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
