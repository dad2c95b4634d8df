"""End-to-end homomorphic tests: compile -> keygen -> encrypt -> execute ->
decrypt, gated at MSE < 0.01 vs the plaintext reference (coverage model:
reference tests/features.py, tests/bug_fixes.py, tests/std.py)."""

import operator

import pytest

from eva_tpu import EvaProgram, Input, Output
from eva_tpu.std.numeric import horizontal_sum
from helpers import compile_and_check


class TestBinOpsHE:
    @pytest.mark.parametrize("name,bin_op", [
        ("add", operator.add), ("sub", operator.sub), ("mul", operator.mul)])
    @pytest.mark.parametrize("enc1", [False, True])
    @pytest.mark.parametrize("enc2", [False, True])
    def test_bin_op(self, name, bin_op, enc1, enc2):
        prog = EvaProgram("BinOp", vec_size=64)
        with prog:
            a = Input("a", enc1)
            b = Input("b", enc2)
            Output("y", bin_op(a, b))
        prog.set_output_ranges(20)
        prog.set_input_scales(30)
        compile_and_check(prog)


class TestUnaryOpsHE:
    @pytest.mark.parametrize("enc", [False, True])
    def test_unary(self, enc):
        for un_op in (lambda x: x, lambda x: -x, lambda x: x ** 3, lambda x: 42):
            prog = EvaProgram("UnOp", vec_size=64)
            with prog:
                x = Input("x", enc)
                Output("y", un_op(x))
            prog.set_output_ranges(20)
            prog.set_input_scales(30)
            compile_and_check(prog)


class TestRotationsHE:
    @pytest.mark.parametrize("rot", range(-2, 2))
    def test_rotations(self, rot):
        for rot_op in (lambda x, r: x << r, lambda x, r: x >> r):
            prog = EvaProgram("RotOp", vec_size=8)
            with prog:
                x = Input("x")
                Output("y", rot_op(x, rot))
            prog.set_output_ranges(20)
            prog.set_input_scales(30)
            compile_and_check(prog)


class TestMixedHE:
    @pytest.mark.parametrize("enc1", [False, True])
    @pytest.mark.parametrize("enc2", [False, True])
    def test_unencrypted_computation(self, enc1, enc2):
        prog = EvaProgram("Mixed", vec_size=128)
        with prog:
            x1 = Input("x1", enc1)
            x2 = Input("x2", enc2)
            Output("y", pow(x2, 3) + x1 * x2)
        prog.set_output_ranges(20)
        prog.set_input_scales(30)
        compile_and_check(prog)


class TestRegressionsHE:
    def test_high_inner_term_scale(self):
        prog = EvaProgram("HighInnerTermScale", vec_size=4)
        with prog:
            x1 = Input("x1")
            x2 = Input("x2")
            Output("y", x1 * x1 * x2)
        prog.set_output_ranges(20)
        prog.set_input_scales(60)
        compile_and_check(prog, config={"rescaler": "lazy_waterline"})

    def test_transparent_ciphertext(self):
        prog = EvaProgram("Transparent", vec_size=64)
        with prog:
            x = Input("x")
            Output("y", x - x + x * 0)
        prog.set_output_ranges(20)
        prog.set_input_scales(30)
        compile_and_check(prog)

    def test_multiple_outputs(self):
        prog = EvaProgram("Multi", vec_size=32)
        with prog:
            x = Input("x")
            y = Input("y")
            Output("a", x * y)
            Output("b", x + y)
            Output("c", x * x * y + y)
        prog.set_output_ranges(20)
        prog.set_input_scales(30)
        compile_and_check(prog)


class TestStdHE:
    @pytest.mark.parametrize("enc", [True, False])
    def test_horizontal_sum(self, enc):
        prog = EvaProgram("HorizontalSum", vec_size=256)
        with prog:
            x = Input("x", is_encrypted=enc)
            Output("y", horizontal_sum(x))
        prog.set_output_ranges(25)
        prog.set_input_scales(33)
        compile_and_check(prog)

    def test_horizontal_sum_constant(self):
        prog = EvaProgram("HorizontalSumConstant", vec_size=256)
        with prog:
            Output("y", horizontal_sum([1 for _ in range(prog.vec_size)]))
        prog.set_output_ranges(25)
        prog.set_input_scales(33)
        compile_and_check(prog)


class TestSecurityLevelsHE:
    @pytest.mark.parametrize("sec,quantum", [
        ("128", "false"), ("192", "true"), ("256", "false")])
    def test_security_levels(self, sec, quantum):
        prog = EvaProgram("SecurityLevel", vec_size=512)
        with prog:
            x = Input("x")
            Output("y", 5 * x * x + 3 * x + x << 12 + 10)
        prog.set_output_ranges(20)
        prog.set_input_scales(30)
        compile_and_check(
            prog, config={"security_level": sec, "quantum_safe": quantum})


class TestMinimumRescalerHE:
    def test_minimum_rescaler_roundtrip(self):
        """The minimum rescaling policy on a program it supports: x^4 via
        squarings with uniform scales (rescales both operands before the
        multiply when 2*rescaleBy >= 60)."""
        prog = EvaProgram("minr", vec_size=16)
        with prog:
            x = Input("x")
            Output("y", (x * x) * (x * x))
        prog.set_output_ranges(20)
        prog.set_input_scales(30)
        _, params, _ = compile_and_check(prog, config={"rescaler": "minimum"})
        assert 30 in params.prime_bits  # the pre-multiply operand rescale


class TestNoiseEstimator:
    def test_predictions_match_measurements(self):
        """estimate_noise must predict the decrypted slot-error std within
        ~4x of measurement, with no keys or encryption involved, and flag
        under-scaled programs."""
        import random
        import numpy as np
        from eva_tpu import evaluate
        from eva_tpu.ckks import CKKSCompiler
        from eva_tpu.runtime import generate_keys
        from eva_tpu.runtime.noise import estimate_noise

        random.seed(99)

        prog = EvaProgram("np30", vec_size=64)
        with prog:
            x = Input("x")
            Output("y", 3 * x ** 2 + 5 * x - 2)
        prog.set_output_ranges(20)
        prog.set_input_scales(30)
        inputs = {"x": [random.uniform(-2, 2) for _ in range(64)]}
        compiled, params, sig = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(prog)
        est = estimate_noise(compiled, params, sig, inputs)
        assert est["y"]["verdict"] == "ok"
        pub, sec = generate_keys(params)
        out = sec.decrypt(pub.execute(compiled, pub.encrypt(inputs, sig)), sig)
        ref = evaluate(prog, inputs)
        measured = float(np.std(np.array(out["y"]) - np.array(ref["y"])))
        ratio = est["y"]["slot_error_std"] / max(measured, 1e-30)
        assert 0.2 < ratio < 5.0, f"estimator off by {ratio}x"

    def test_noise_vs_ks_alpha(self, monkeypatch):
        """The hybrid-decomposition group size must not breach the 0.01
        decrypt gate on a rotation-heavy program at any selectable
        alpha. alpha>=3 degenerates to the alpha=2 pairing under the
        single 60-bit special modulus (ks_groups caps group products at
        2P — tools/sweep_alpha.py documents the packing), so {1,2}
        covers every distinct kernel configuration; the group-shape
        assertion below fails loudly if a wider P ever makes alpha=4
        distinct, at which point this test must measure it too."""
        import random
        from eva_tpu import evaluate
        from eva_tpu.ckks import CKKSCompiler
        from eva_tpu.metric import valuation_mse
        from eva_tpu.runtime import generate_keys
        from eva_tpu.crypto.context import get_context

        random.seed(23)
        prog = EvaProgram("alphan", vec_size=64)
        with prog:
            x = Input("x")
            acc = None
            for i, t in enumerate((1, 2, 3, 9, 10)):
                term = (x << t) * (0.3 * (i % 3) - 0.3)
                acc = term if acc is None else acc + term
            Output("y", acc * acc)
        prog.set_output_ranges(20)
        prog.set_input_scales(40)
        compiled, params, sig = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(prog)
        inputs = {"x": [random.uniform(-1, 1) for _ in range(64)]}
        ref = evaluate(prog, inputs)
        ctx = get_context(tuple(params.prime_bits), tuple(params.rotations),
                          params.poly_modulus_degree)
        assert ctx.ks_groups(4) == ctx.ks_groups(2), (
            "wider special modulus made alpha=4 distinct: extend this "
            "sweep to cover it")
        for alpha in (1, 2):
            monkeypatch.setenv("EVA_TPU_KS_ALPHA", str(alpha))
            pub, sec = generate_keys(params)
            out = sec.decrypt(
                pub.execute(compiled, pub.encrypt(inputs, sig)), sig)
            mse = valuation_mse(out, ref)
            assert mse < 0.01, (alpha, mse)

    def test_flags_insufficient_scale(self):
        from eva_tpu.ckks import CKKSCompiler
        from eva_tpu.runtime.noise import estimate_noise

        prog = EvaProgram("low", vec_size=64)
        with prog:
            x = Input("x")
            Output("y", x * x)
        prog.set_output_ranges(20)
        prog.set_input_scales(20)
        compiled, params, sig = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(prog)
        inputs = {"x": [2.0] * 64}
        est = estimate_noise(compiled, params, sig, inputs)
        assert est["y"]["verdict"] in ("marginal", "insufficient")
