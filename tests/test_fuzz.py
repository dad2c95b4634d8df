"""Property-based fuzzing: random program DAGs through the double oracle.

Generates random expression DAGs (mixed encrypted/raw inputs, constants,
all DSL ops, shared subexpressions) and random compiler configs, then
checks that compilation preserves plaintext semantics (MSE < 1e-10) for
every program, and runs the full HE round-trip on a sample."""

import random

import pytest

from eva_tpu import EvaProgram, Input, Output, evaluate
from eva_tpu.ckks import CKKSCompiler
from eva_tpu.metric import valuation_mse
from helpers import compile_and_check


def random_program(rng: random.Random, index: int) -> EvaProgram:
    vec_size = rng.choice([4, 8, 16, 32])
    prog = EvaProgram(f"fuzz{index}", vec_size=vec_size)
    with prog:
        pool = []
        n_inputs = rng.randint(1, 3)
        for i in range(n_inputs):
            pool.append(Input(f"x{i}", rng.random() < 0.8))
        for _ in range(rng.randint(3, 12)):
            kind = rng.random()
            a = rng.choice(pool)
            if kind < 0.25:
                b = rng.choice(pool)
                pool.append(a + b if rng.random() < 0.5 else a - b)
            elif kind < 0.5:
                # multiply by term, constant, or scalar
                pick = rng.random()
                if pick < 0.5:
                    pool.append(a * rng.choice(pool))
                elif pick < 0.75:
                    pool.append(a * round(rng.uniform(-3, 3), 3))
                else:
                    pool.append(a * [round(rng.uniform(-2, 2), 3)
                                     for _ in range(vec_size)])
            elif kind < 0.65:
                pool.append(-a)
            elif kind < 0.85:
                steps = rng.randint(-vec_size, vec_size)
                pool.append(a << steps if rng.random() < 0.5 else a >> steps)
            else:
                pool.append(a ** rng.randint(1, 3))
        n_outputs = rng.randint(1, 2)
        for j in range(n_outputs):
            Output(f"y{j}", rng.choice(pool[-5:]))
    prog.set_output_ranges(30)
    prog.set_input_scales(rng.choice([25, 30, 40]))
    return prog


def random_config(rng: random.Random) -> dict:
    return {
        "rescaler": rng.choice(["lazy_waterline", "eager_waterline"]),
        "balance_reductions": rng.choice(["true", "false"]),
        "lazy_relinearize": rng.choice(["true", "false"]),
        "warn_vec_size": "false",
    }


class TestFuzz:
    def test_compile_preserves_semantics(self):
        """60 random programs x random configs: compiled graph must match
        the source on the plaintext reference."""
        rng = random.Random(0xE7A)
        for i in range(60):
            prog = random_program(rng, i)
            inputs = {name: [rng.uniform(-2, 2) for _ in range(prog.vec_size)]
                      for name in prog.inputs}
            reference = evaluate(prog, inputs)
            compiled, params, sig = CKKSCompiler(random_config(rng)).compile(prog)
            mse = valuation_mse(reference, evaluate(compiled, inputs))
            assert mse < 1e-10, (
                f"fuzz program {i} compile-stage MSE {mse} "
                f"(vec={prog.vec_size})")

    def test_lowered_sub_reaches_validation_typed(self):
        """Regression (deep-fuzz case 1058): BackendLowering rewrites
        `plain - cipher` into Add(plain, Negate(cipher)) as the LAST pass,
        after the final TypeDeducer. The created terms reached the
        validation checkers untyped (Type.Undef), so LevelsChecker treated
        the cipher chain as non-cipher and spuriously asserted a level
        mismatch whenever the lowered branch joined a rescaled branch.
        Lowering must stamp types on the terms it creates."""
        for rescaler in ("always", "lazy_waterline", "eager_waterline"):
            for lazy_relin in ("true", "false"):
                prog = EvaProgram("lowered_sub", vec_size=8)
                with prog:
                    p = Input("p", False)   # plain input
                    x = Input("x")          # cipher input
                    d = -(p - x)            # Sub(plain, cipher): gets lowered
                    m = (x + p) * [0.5] * 8         # 1 rescale ('always')
                    Output("y0", d + m)     # joins level-0 and level-1 paths
                    Output("y1", m * ([0.25] * 8))  # forces modswitching
                prog.set_output_ranges(25)
                prog.set_input_scales(60)
                inputs = {"p": [i * 0.1 for i in range(8)],
                          "x": [0.3 - i * 0.05 for i in range(8)]}
                reference = evaluate(prog, inputs)
                compiled, params, sig = CKKSCompiler(
                    {"rescaler": rescaler, "lazy_relinearize": lazy_relin,
                     "warn_vec_size": "false"}).compile(prog)
                mse = valuation_mse(reference, evaluate(compiled, inputs))
                assert mse < 1e-10, (rescaler, lazy_relin, mse)

    def test_he_roundtrip_sample(self):
        """Full HE round-trip on a sample of random programs."""
        rng = random.Random(0xBEEF)
        for i in range(6):
            prog = random_program(rng, 100 + i)
            inputs = {name: [rng.uniform(-1, 1) for _ in range(prog.vec_size)]
                      for name in prog.inputs}
            compile_and_check(prog, inputs=inputs, config=random_config(rng))
