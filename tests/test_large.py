"""Large-program end-to-end tests (coverage model: reference
tests/large_programs.py): Sobel filtering and regression models."""

import math

import pytest

from eva_tpu import EvaProgram, Input, Output, evaluate
from eva_tpu.ckks import CKKSCompiler
from eva_tpu.metric import valuation_mse
from eva_tpu.runtime import generate_keys
from helpers import compile_and_check


def build_sobel(h=90, w=90):
    prog = EvaProgram("sobel", vec_size=2 ** (math.ceil(math.log2(h * w))))
    with prog:
        image = Input("image")
        filt = [[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]]
        a1 = 2.2137874823876622
        a2 = -1.0984324107372518
        a3 = 0.17254603006834726
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


class TestSobel:
    @pytest.mark.parametrize("rescaler,balance", [
        ("lazy_waterline", "true"),
        ("always", "false"),
    ])
    def test_sobel_default_configs(self, rescaler, balance):
        compile_and_check(build_sobel(), config={
            "rescaler": rescaler, "balance_reductions": balance})

    @pytest.mark.slow
    @pytest.mark.parametrize("rescaler", ["lazy_waterline", "eager_waterline", "always"])
    @pytest.mark.parametrize("balance", ["true", "false"])
    def test_sobel_all_configs(self, rescaler, balance):
        compile_and_check(build_sobel(), config={
            "rescaler": rescaler, "balance_reductions": balance})


class TestRegression:
    def test_batched_regressions(self):
        """Three regression models compiled and executed with one compiler
        instance (mirrors reference tests/large_programs.py:55-146, with
        sizes trimmed for suite runtime)."""
        p = 15

        linreg = EvaProgram("linear_regression", vec_size=512)
        with linreg:
            x = [Input(f"x{i}") for i in range(p)]
            e = Input("e")
            b = [i * 0.732 for i in range(p)]
            y = e + 6.56
            for i in range(p):
                y += x[i] * b[i]
            Output("y", y)
        linreg.set_input_scales(40)
        linreg.set_output_ranges(30)
        linreg_inputs = {"e": [(linreg.vec_size - i) * 0.001
                               for i in range(linreg.vec_size)]}
        for i in range(p):
            linreg_inputs[f"x{i}"] = [i * j * 0.0001 for j in range(linreg.vec_size)]

        polyreg = EvaProgram("polynomial_regression", vec_size=512)
        with polyreg:
            x = Input("x")
            e = Input("e")
            b = [i * 0.732 for i in range(4)]
            y = e + 6.56
            for i in range(4):
                x_i = x
                for _ in range(i):
                    x_i = x_i * x
                y += x_i * b[i]
            Output("y", y)
        polyreg.set_input_scales(40)
        polyreg.set_output_ranges(30)
        polyreg_inputs = {
            "x": [i * 0.001 for i in range(polyreg.vec_size)],
            "e": [(polyreg.vec_size - i) * 0.001 for i in range(polyreg.vec_size)],
        }

        multireg = EvaProgram("multivariate_regression", vec_size=512)
        with multireg:
            k = 2
            x = [Input(f"x{i}") for i in range(p)]
            e = [Input(f"e{j}") for j in range(k)]
            b0 = [j * 0.56 for j in range(k)]
            b = [[k * i * 0.732 for i in range(p)] for j in range(k)]
            for j in range(k):
                y = e[j] + b0[j]
                for i in range(p):
                    y += x[i] * b[j][i]
                Output(f"y{j}", y)
        multireg.set_input_scales(40)
        multireg.set_output_ranges(30)
        multireg_inputs = {}
        for i in range(p):
            multireg_inputs[f"x{i}"] = [i * j * 0.0001
                                        for j in range(multireg.vec_size)]
        for j in range(2):
            multireg_inputs[f"e{j}"] = [(multireg.vec_size - i) * j * 0.001
                                        for i in range(multireg.vec_size)]

        compiler = CKKSCompiler(config={"warn_vec_size": "false"})
        for prog, inputs in ((linreg, linreg_inputs), (polyreg, polyreg_inputs),
                             (multireg, multireg_inputs)):
            compiled, params, signature = compiler.compile(prog)
            public_ctx, secret_ctx = generate_keys(params)
            enc_inputs = public_ctx.encrypt(inputs, signature)
            enc_outputs = public_ctx.execute(compiled, enc_inputs)
            outputs = secret_ctx.decrypt(enc_outputs, signature)
            reference = evaluate(compiled, inputs)
            assert valuation_mse(outputs, reference) < 0.01

    @pytest.mark.slow
    def test_regression_full_size(self):
        """Reference-sized linear regression (p=63, vec 2048)."""
        p = 63
        linreg = EvaProgram("linear_regression", vec_size=2048)
        with linreg:
            x = [Input(f"x{i}") for i in range(p)]
            e = Input("e")
            y = e + 6.56
            for i in range(p):
                y += x[i] * (i * 0.732)
            Output("y", y)
        linreg.set_input_scales(40)
        linreg.set_output_ranges(30)
        inputs = {"e": [(2048 - i) * 0.001 for i in range(2048)]}
        for i in range(p):
            inputs[f"x{i}"] = [i * j * 0.0001 for j in range(2048)]
        compile_and_check(linreg, inputs=inputs)


def build_harris(h=64, w=64):
    prog = EvaProgram("harris", vec_size=h * w)
    with prog:
        image = Input("image")
        sobel_filter = [[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]]
        box = [[1, 1, 1], [1, 1, 1], [1, 1, 1]]
        Ix = Iy = None
        for i in range(3):
            for j in range(3):
                rotated = image << (i * w + j)
                horizontal = rotated * sobel_filter[i][j]
                vertical = rotated * sobel_filter[j][i]
                if Ix is None:
                    Ix, Iy = horizontal, vertical
                else:
                    Ix, Iy = Ix + horizontal, Iy + vertical

        def convolution(x, filt):
            out = None
            for i in range(3):
                for j in range(3):
                    part = (x << (i * w + j)) * filt[i][j]
                    out = part if out is None else out + part
            return out

        Sxx = convolution(Ix * Ix, box)
        Syy = convolution(Iy * Iy, box)
        Sxy = convolution(Ix * Iy, box)
        det = Sxx * Syy - Sxy * Sxy
        trace = Sxx + Syy
        Output("image", det - 0.04 * trace * trace)
    prog.set_input_scales(30)
    prog.set_output_ranges(20)
    return prog


class TestHarris:
    @pytest.mark.slow
    def test_harris_he_roundtrip(self):
        """Harris corner detection: deeper multiplicative depth and
        rotation-heavy. Inputs are [0,1] pixel values as in the reference
        example (examples/image_processing.py); at scale 30 the det/trace
        value dynamics of wider input ranges exceed CKKS noise precision
        for any implementation."""
        import random
        prog = build_harris()
        inputs = {"image": [random.uniform(0, 1)
                            for _ in range(prog.vec_size)]}
        compile_and_check(prog, inputs=inputs)
