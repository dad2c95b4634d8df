"""Compiler-only tests: IR behavior, pass pipeline, golden parameters.

These run without any crypto (oracle: plaintext reference execution).
Coverage model: reference tests/features.py + tests/bug_fixes.py."""

import pytest

from eva_tpu import EvaProgram, Input, Output, evaluate
from eva_tpu.ckks import CKKSCompiler
from eva_tpu.ir import Op, Program, Type
from eva_tpu.metric import valuation_mse
from helpers import compile_and_check


def _random_inputs(prog, gen):
    return {name: [gen() for _ in range(prog.vec_size)] for name in prog.inputs}


class TestIR:
    def test_vec_size_must_be_power_of_two(self):
        with pytest.raises(RuntimeError):
            Program("bad", 7)
        with pytest.raises(RuntimeError):
            Program("bad", 0)

    def test_sources_sinks_maintained(self):
        p = Program("g", 8)
        a = p.make_input("a")
        b = p.make_input("b")
        s = p.make_term(Op.Add, [a, b])
        out = p.make_output("y", s)
        assert set(p.get_sources()) == {a, b}
        assert set(p.get_sinks()) == {out}

    def test_deep_copy_preserves_structure(self):
        p = Program("g", 8)
        a = p.make_input("a")
        c = p.make_uniform_constant(2.0)
        m = p.make_term(Op.Mul, [a, c])
        p.make_output("y", m)
        clone = p.deep_copy()
        assert set(clone.inputs) == {"a"}
        assert set(clone.outputs) == {"y"}
        y = clone.outputs["y"]
        assert y.op == Op.Output
        assert y.operand_at(0).op == Op.Mul

    def test_orphan_removal_on_replace(self):
        p = Program("g", 8)
        a = p.make_input("a")
        c1 = p.make_uniform_constant(1.0)
        c2 = p.make_uniform_constant(2.0)
        m = p.make_term(Op.Mul, [c1, c2])
        p.make_output("y", p.make_term(Op.Add, [a, m]))
        folded = p.make_uniform_constant(2.0)
        m.replace_all_uses_with(folded)
        p.flush_orphans()
        sources = set(p.get_sources())
        assert c1 not in sources and c2 not in sources
        assert folded in sources


class TestEvaluate:
    def test_polynomial(self):
        prog = EvaProgram("poly", vec_size=8)
        with prog:
            x = Input("x")
            Output("y", 3 * x**2 + 5 * x - 2)
        inputs = {"x": [float(i) for i in range(8)]}
        out = evaluate(prog, inputs)
        expect = [3 * v * v + 5 * v - 2 for v in inputs["x"]]
        assert max(abs(a - b) for a, b in zip(out["y"], expect)) < 1e-9

    def test_rotations(self):
        prog = EvaProgram("rot", vec_size=8)
        with prog:
            x = Input("x")
            Output("l", x << 2)
            Output("r", x >> 3)
        inputs = {"x": [float(i) for i in range(8)]}
        out = evaluate(prog, inputs)
        assert out["l"] == [2, 3, 4, 5, 6, 7, 0, 1]
        assert out["r"] == [5, 6, 7, 0, 1, 2, 3, 4]

    def test_negative_rotation(self):
        prog = EvaProgram("rot", vec_size=8)
        with prog:
            x = Input("x")
            Output("y", x << -2)
        inputs = {"x": [float(i) for i in range(8)]}
        out = evaluate(prog, inputs)
        assert out["y"] == [6, 7, 0, 1, 2, 3, 4, 5]


class TestGoldenParameters:
    def test_output_rescaled(self):
        """Lazy waterline rescales outputs (reference tests/bug_fixes.py:51-68)."""
        prog = EvaProgram("OutputRescaled", vec_size=4)
        with prog:
            x = Input("x")
            Output("y", x * x)
        prog.set_output_ranges(20)
        prog.set_input_scales(60)
        compiler = CKKSCompiler(
            config={"rescaler": "lazy_waterline", "warn_vec_size": "false"})
        _, params, _ = compiler.compile(prog)
        assert params.prime_bits == [60, 20, 60, 60]

    def test_reduction_balancer(self):
        """Balancing reduces depth (reference tests/features.py:113-133)."""
        prog = EvaProgram("ReductionTree", vec_size=16384)
        with prog:
            x1, x2, x3, x4 = (Input(f"x{i}") for i in range(1, 5))
            Output("y", (x1 * (x2 * (x3 * x4))) + (x1 + (x2 + (x3 + x4))))
        prog.set_output_ranges(20)
        prog.set_input_scales(60)

        _, params, _ = compile_and_check(
            prog, he=False,
            config={"rescaler": "always", "balance_reductions": "false"})
        assert params.prime_bits == [60, 20, 60, 60, 60, 60]

        _, params, _ = compile_and_check(
            prog, he=False,
            config={"rescaler": "always", "balance_reductions": "true"})
        assert params.prime_bits == [60, 20, 60, 60, 60]

    def test_high_inner_term_scale(self):
        """Lazy waterline with high inner scale (reference tests/bug_fixes.py:10-26)."""
        prog = EvaProgram("HighInnerTermScale", vec_size=4)
        with prog:
            x1 = Input("x1")
            x2 = Input("x2")
            Output("y", x1 * x1 * x2)
        prog.set_output_ranges(20)
        prog.set_input_scales(60)
        compile_and_check(prog, he=False, config={"rescaler": "lazy_waterline"})


class TestCompileSemantics:
    """All rescalers/relinearizers preserve plaintext semantics."""

    @pytest.mark.parametrize("rescaler", ["lazy_waterline", "eager_waterline", "always"])
    @pytest.mark.parametrize("balance", ["true", "false"])
    def test_rescalers_on_poly(self, rescaler, balance):
        prog = EvaProgram("poly", vec_size=64)
        with prog:
            x = Input("x")
            Output("y", 3 * x**2 + 5 * x - 2)
        prog.set_output_ranges(20)
        prog.set_input_scales(30)
        compile_and_check(prog, he=False,
                          config={"rescaler": rescaler, "balance_reductions": balance})

    @pytest.mark.parametrize("lazy", ["true", "false"])
    def test_relinearizers(self, lazy):
        prog = EvaProgram("relin", vec_size=64)
        with prog:
            x = Input("x")
            y = Input("y")
            Output("z", (x * y) * (x * y) + x)
        prog.set_output_ranges(20)
        prog.set_input_scales(30)
        compile_and_check(prog, he=False, config={"lazy_relinearize": lazy})

    def test_bin_ops_all_encryption_combos(self):
        import operator
        for bin_op in (operator.add, operator.sub, operator.mul):
            for enc1 in (False, True):
                for enc2 in (False, True):
                    prog = EvaProgram("BinOp", vec_size=64)
                    with prog:
                        a = Input("a", enc1)
                        b = Input("b", enc2)
                        Output("y", bin_op(a, b))
                    prog.set_output_ranges(20)
                    prog.set_input_scales(30)
                    compile_and_check(prog, he=False)

    def test_unary_ops(self):
        for un_op in (lambda x: x, lambda x: -x, lambda x: x**3, lambda x: 42):
            for enc in (False, True):
                prog = EvaProgram("UnOp", vec_size=64)
                with prog:
                    x = Input("x", enc)
                    Output("y", un_op(x))
                prog.set_output_ranges(20)
                prog.set_input_scales(30)
                compile_and_check(prog, he=False)

    def test_rotations_compile(self):
        for rot_op in (lambda x, r: x << r, lambda x, r: x >> r):
            for rot in range(-2, 2):
                prog = EvaProgram("RotOp", vec_size=8)
                with prog:
                    x = Input("x")
                    Output("y", rot_op(x, rot))
                prog.set_output_ranges(20)
                prog.set_input_scales(30)
                compile_and_check(prog, he=False)

    def test_mixed_unencrypted_computation(self):
        for enc1 in (False, True):
            for enc2 in (False, True):
                prog = EvaProgram("Mixed", vec_size=128)
                with prog:
                    x1 = Input("x1", enc1)
                    x2 = Input("x2", enc2)
                    Output("y", pow(x2, 3) + x1 * x2)
                prog.set_output_ranges(20)
                prog.set_input_scales(30)
                compile_and_check(prog, he=False)

    def test_transparent_result(self):
        prog = EvaProgram("Transparent", vec_size=64)
        with prog:
            x = Input("x")
            Output("y", x - x + x * 0)
        prog.set_output_ranges(20)
        prog.set_input_scales(30)
        compile_and_check(prog, he=False)

    def test_constant_only_output(self):
        prog = EvaProgram("Const", vec_size=16)
        with prog:
            x = Input("x")
            Output("y", x * 0 + 7)
        prog.set_output_ranges(20)
        prog.set_input_scales(30)
        compile_and_check(prog, he=False)


class TestSecurityLevels:
    def test_degree_selection(self):
        from eva_tpu.ckks.params import min_degree_for_bit_count
        assert min_degree_for_bit_count(128, False, 100) == 4096
        assert min_degree_for_bit_count(128, False, 218) == 8192
        assert min_degree_for_bit_count(128, False, 219) == 16384
        assert min_degree_for_bit_count(192, False, 100) == 8192
        assert min_degree_for_bit_count(128, True, 219) == 16384

    def test_all_levels_compile(self):
        for sec in ("128", "192", "256"):
            for quantum in ("false", "true"):
                prog = EvaProgram("Sec", vec_size=512)
                with prog:
                    x = Input("x")
                    Output("y", 5 * x * x + 3 * x + x << 12 + 10)
                prog.set_output_ranges(20)
                prog.set_input_scales(30)
                compile_and_check(
                    prog, he=False,
                    config={"security_level": sec, "quantum_safe": quantum})

    def test_unsupported_security_level(self):
        prog = EvaProgram("Sec", vec_size=512)
        with prog:
            x = Input("x")
            Output("y", x * x)
        prog.set_output_ranges(20)
        prog.set_input_scales(30)
        with pytest.raises(RuntimeError):
            CKKSCompiler(config={"security_level": "1024",
                                 "warn_vec_size": "false"}).compile(prog)

    def test_missing_input_scale_errors(self):
        prog = EvaProgram("NoScale", vec_size=8)
        with prog:
            x = Input("x")
            Output("y", x * x)
        prog.set_output_ranges(20)
        with pytest.raises(RuntimeError, match="scale for input"):
            CKKSCompiler(config={"warn_vec_size": "false"}).compile(prog)


class TestStd:
    def test_horizontal_sum_compiles(self):
        from eva_tpu.std.numeric import horizontal_sum
        for enc in (True, False):
            prog = EvaProgram("HSum", vec_size=64)
            with prog:
                x = Input("x", is_encrypted=enc)
                Output("y", horizontal_sum(x))
            prog.set_output_ranges(25)
            prog.set_input_scales(33)
            compile_and_check(prog, he=False)

        prog = EvaProgram("HSumConst", vec_size=64)
        with prog:
            from eva_tpu.std.numeric import horizontal_sum as hs
            Output("y", hs([1 for _ in range(prog.vec_size)]))
        prog.set_output_ranges(25)
        prog.set_input_scales(33)
        compile_and_check(prog, he=False)


class TestTwoEntryKS:
    """two_entry_ks: a second key-switch special-modulus entry
    (P ~ 2^120), applied only within the HE-standard budget slack —
    never changes N, levels, or scales (TPU-native extension; ckks/
    __init__.py two_entry_ks; reference convention is a single key
    prime, eva/ckks/encryption_parameter_selector.h:15-208)."""

    def _deep(self, depth=4):
        prog = EvaProgram("deep2p", vec_size=1024)
        with prog:
            x = Input("x")
            y = x
            for _ in range(depth):
                y = y * y
            Output("y", y + (x << 1))
        prog.set_output_ranges(20)
        prog.set_input_scales(40)
        return prog

    def test_applied_when_slack_allows(self):
        base = CKKSCompiler({"warn_vec_size": "false"}).compile(
            self._deep())[1]
        _, params, _ = compile_and_check(
            self._deep(), he=True, config={"two_entry_ks": "true"})
        assert params.key_terms == 2
        assert params.prime_bits == base.prime_bits + [base.prime_bits[-1]]
        assert params.poly_modulus_degree == base.poly_modulus_degree

    def test_digit_count_halves(self):
        from eva_tpu.crypto.context import get_context
        from eva_tpu.crypto.keys import default_ks_alpha
        _, params, _ = CKKSCompiler(
            {"warn_vec_size": "false", "two_entry_ks": "true"}).compile(
            self._deep())
        ctx = get_context(tuple(params.prime_bits), tuple(params.rotations),
                          params.poly_modulus_degree, params.key_terms)
        assert len(ctx.key_primes) == 4
        assert default_ks_alpha(ctx) == 4
        g2 = ctx.ks_groups(4)
        g1 = ctx.ks_groups(2)
        assert max(len(g) for g in g2) == 4
        assert len(g2) < len(g1)

    def test_not_applied_shallow_or_over_budget(self):
        # Shallow: x*x leaves only 3 entries -> no profit, golden
        # reference output preserved even with the option on.
        prog = EvaProgram("shallow", vec_size=4)
        with prog:
            x = Input("x")
            Output("y", x * x)
        prog.set_output_ranges(20)
        prog.set_input_scales(60)
        _, params, _ = CKKSCompiler(
            {"warn_vec_size": "false", "two_entry_ks": "true",
             "rescaler": "lazy_waterline"}).compile(prog)
        assert params.prime_bits == [60, 20, 60, 60]
        assert params.key_terms == 1
        # Over budget: a deep chain already near the N=16384 cap (438
        # bits) has no slack for another 60-bit entry.
        deep = self._deep(depth=5)  # 60+5*40+... pushes past 438-60
        _, params, _ = CKKSCompiler(
            {"warn_vec_size": "false", "two_entry_ks": "true"}).compile(deep)
        total = sum(params.prime_bits)
        from eva_tpu.ckks.params import max_bits_for_degree
        budget = max_bits_for_degree(128, False,
                                     params.poly_modulus_degree)
        if params.key_terms == 1:
            assert total + params.prime_bits[-1] > budget
        else:  # slack existed after all: applied within budget
            assert total <= budget

    def test_wire_roundtrip_and_param_check(self):
        from eva_tpu.serialization import load_from_string, save_to_string
        _, params, _ = CKKSCompiler(
            {"warn_vec_size": "false", "two_entry_ks": "true"}).compile(
            self._deep())
        clone = load_from_string(save_to_string(params))
        assert clone == params and clone.key_terms == 2


class TestBSGSRotations:
    """BSGSRotationFactorizer (eva_tpu/passes.py): a TPU-build extension
    factoring rotation-heavy sums baby-step/giant-step. Motivating
    workload: the convolutions in reference examples/image_processing.py."""

    def _conv_program(self, taps, weights=None, vec_size=64):
        from eva_tpu import EvaProgram, Input, Output
        prog = EvaProgram("conv", vec_size=vec_size)
        with prog:
            x = Input("x")
            acc = None
            for i, t in enumerate(taps):
                term = x << t
                if weights is not None:
                    term = term * weights[i]
                acc = term if acc is None else acc + term
            Output("y", acc)
        prog.set_input_scales(30)
        prog.set_output_ranges(20)
        return prog

    def test_small_grid_stays_direct(self):
        """3x3 convolutions stay DIRECT under the execution-cost model:
        one hoisted decomposition + 8 MACs + a fused epilogue beats the
        4 extra decompositions and per-giant epilogues BSGS would pay
        (passes.py BSGSRotationFactorizer cost constants)."""
        import random
        from eva_tpu import evaluate
        from eva_tpu.ckks import CKKSCompiler
        from eva_tpu.metric import valuation_mse
        random.seed(5)
        taps = [g + b for g in (0, 8, 16) for b in (0, 1, 2)]
        weights = [0.25 * i - 1.0 for i in range(9)]
        prog = self._conv_program(taps, weights)
        inputs = {"x": [random.uniform(-1, 1) for _ in range(64)]}
        ref = evaluate(prog, inputs)
        compiled, params, _ = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(prog)
        assert sorted(params.rotations) == [1, 2, 8, 9, 10, 16, 17, 18]
        assert valuation_mse(ref, evaluate(compiled, inputs)) < 1e-10

    def test_wide_grid_rotations_factor(self):
        """A DENSE 128-tap rotation set still factors. Under the
        measured cost units (dec 12.3 : mac 1 : epi 7 — every giant
        buys a fresh decomposition AND an inner-sum epilogue, babies
        share one decomposition) the model prefers one wide baby stride:
        a wide stride keeps 1-2 giants over ~40-60 shared-decomposition
        babies (~95 units) vs 127 direct MACs (139.3); an 8x8 grid, by
        contrast, stays direct now."""
        import random
        from eva_tpu import evaluate
        from eva_tpu.ckks import CKKSCompiler
        from eva_tpu.metric import valuation_mse
        random.seed(12)
        taps = list(range(128))
        weights = [0.05 * (i % 7) - 0.15 for i in range(128)]
        prog = self._conv_program(taps, weights, vec_size=128)
        inputs = {"x": [random.uniform(-1, 1) for _ in range(128)]}
        ref = evaluate(prog, inputs)
        compiled, params, _ = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(prog)
        # factored: far fewer keys than the 127 direct rotations, with
        # at most a couple of giant steps
        assert len(params.rotations) <= 64
        assert valuation_mse(ref, evaluate(compiled, inputs)) < 1e-10

    def test_sparse_grid_folds_once(self):
        """A sparse 8x8 grid (64 taps over a 512-slot vector): the
        measured-unit model rejects the classic 7-baby/7-giant split
        (161.4 units — every giant buys a decomposition + epilogue) in
        favor of ONE fold: stride 256 maps half the taps onto the other
        half's babies, 31 babies + 1 giant = 63.6 units vs 75.3
        direct."""
        import random
        from eva_tpu import evaluate
        from eva_tpu.ckks import CKKSCompiler
        from eva_tpu.metric import valuation_mse
        random.seed(13)
        taps = [g + b for g in range(0, 512, 64) for b in range(8)]
        prog = self._conv_program(taps, [1.0] * 64, vec_size=512)
        inputs = {"x": [random.uniform(-1, 1) for _ in range(512)]}
        ref = evaluate(prog, inputs)
        compiled, params, _ = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(prog)
        assert len(params.rotations) == 32  # 31 babies + giant 256
        assert 256 in params.rotations
        assert valuation_mse(ref, evaluate(compiled, inputs)) < 1e-10

    def test_opt_out_keeps_all_rotations(self):
        from eva_tpu.ckks import CKKSCompiler
        taps = [g + b for g in (0, 8, 16) for b in (0, 1, 2)]
        prog = self._conv_program(taps, [1.0] * 9)
        _, params, _ = CKKSCompiler(
            {"warn_vec_size": "false",
             "bsgs_rotations": "false"}).compile(prog)
        # RotationNormalizer still drops the zero-step rotation's key.
        assert sorted(params.rotations) == [1, 2, 8, 9, 10, 16, 17, 18]

    def test_unweighted_and_negative_rotations(self):
        import random
        from eva_tpu import evaluate
        from eva_tpu.ckks import CKKSCompiler
        from eva_tpu.metric import valuation_mse
        random.seed(6)
        # bare rotations (no weights), including a negative step
        taps = [0, 1, 2, -8, -7, -6]
        prog = self._conv_program(taps)
        inputs = {"x": [random.uniform(-1, 1) for _ in range(64)]}
        ref = evaluate(prog, inputs)
        compiled, params, _ = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(prog)
        # 5 distinct normalized rotations; the execution-cost model keeps
        # this small set direct (one shared decomposition).
        assert len(params.rotations) <= 5
        assert valuation_mse(ref, evaluate(compiled, inputs)) < 1e-10

    def test_he_roundtrip_with_bsgs(self):
        # Dense 128-tap set: wide enough that the measured-unit cost
        # model still factors (63 babies + 1 giant beat 127 direct
        # MACs), so the HE round-trip exercises BSGS end to end.
        import random
        from helpers import compile_and_check
        from eva_tpu.ckks import CKKSCompiler
        random.seed(7)
        taps = list(range(128))
        weights = [0.1 * (i % 5) - 0.2 for i in range(128)]
        prog = self._conv_program(taps, weights, vec_size=128)
        _, params, _ = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(prog)
        assert len(params.rotations) <= 64  # babies + a couple of giants
        compile_and_check(self._conv_program(taps, weights, vec_size=128))


class TestRotationNormalizer:
    def test_equivalent_rotations_share_one_key(self):
        """r>>1 and r<<(vec-1) are the same cyclic rotation; zero-step
        rotations need no key at all (RotationNormalizer)."""
        import random
        from eva_tpu import EvaProgram, Input, Output, evaluate
        from eva_tpu.ckks import CKKSCompiler
        from eva_tpu.metric import valuation_mse
        random.seed(8)
        prog = EvaProgram("norm", vec_size=16)
        with prog:
            x = Input("x")
            Output("y", (x >> 1) + (x << 15) + (x << 0) + (x << 16) + x * 2)
        prog.set_input_scales(30)
        prog.set_output_ranges(20)
        inputs = {"x": [random.uniform(-1, 1) for _ in range(16)]}
        ref = evaluate(prog, inputs)
        compiled, params, _ = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(prog)
        assert sorted(params.rotations) == [15]
        assert valuation_mse(ref, evaluate(compiled, inputs)) < 1e-10
