"""JAX/XLA backend tests: bit-exactness of device kernels vs the numpy
reference, and end-to-end HE round-trips through the whole-graph executor.

Runs on the CPU backend (conftest forces a virtual CPU platform); the
identical 32-bit kernels run on TPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eva_tpu.backend.tables import DeviceLevelOps
from eva_tpu.crypto.ntt import get_table
from helpers import compile_and_check


PRIMES = [1073668097, 1073815553, 40961]
N = 64


@pytest.fixture(scope="module")
def dev():
    return DeviceLevelOps(PRIMES, N)


def _rand_planes(seed):
    rng = np.random.default_rng(seed)
    return np.stack([rng.integers(0, q, N, dtype=np.uint64)
                     for q in PRIMES]).astype(np.uint32)


class TestDeviceKernels:
    def test_mont_mul_bit_exact(self, dev):
        a, b = _rand_planes(0), _rand_planes(1)
        ref = np.stack([(a[i].astype(np.uint64) * b[i]) % np.uint64(q)
                        for i, q in enumerate(PRIMES)])
        got = np.asarray(jax.jit(dev.mul)(jnp.asarray(a), jnp.asarray(b)))
        assert np.array_equal(got.astype(np.uint64), ref)

    def test_ntt_bit_exact(self, dev):
        a = _rand_planes(2)
        ref = np.stack([get_table(q, N).ntt(a[i].astype(np.uint64))
                        for i, q in enumerate(PRIMES)])
        got = np.asarray(jax.jit(dev.ntt)(jnp.asarray(a)))
        assert np.array_equal(got.astype(np.uint64), ref)
        ref_i = np.stack([get_table(q, N).intt(ref[i])
                          for i, q in enumerate(PRIMES)])
        got_i = np.asarray(jax.jit(dev.intt)(jnp.asarray(got)))
        assert np.array_equal(got_i.astype(np.uint64), ref_i)

    def test_reduce_then_ntt_handles_unreduced_input(self, dev):
        """The merged-twist NTT requires reduced planes; reduce() (a
        Shoup multiply by 1) is the explicit contract for raw uint32
        input, exact for any a < 2^32."""
        a = _rand_planes(3)
        big = (a.astype(np.uint64) + np.uint64(2 ** 31)).astype(np.uint32)
        ref = np.stack([
            get_table(q, N).ntt(big[i].astype(np.uint64) % np.uint64(q))
            for i, q in enumerate(PRIMES)])
        got = np.asarray(jax.jit(lambda x: dev.ntt(dev.reduce(x)))(
            jnp.asarray(big)))
        assert np.array_equal(got.astype(np.uint64), ref)


class TestJaxEndToEnd:
    def test_poly_he_roundtrip(self):
        from eva_tpu import EvaProgram, Input, Output
        prog = EvaProgram("jaxpoly", vec_size=8)
        with prog:
            x = Input("x")
            Output("y", 3 * x ** 2 + 5 * x - 2)
        prog.set_output_ranges(20)
        prog.set_input_scales(30)
        compile_and_check(prog, backend="jax")

    def test_rotation_and_mixed_he_roundtrip(self):
        from eva_tpu import EvaProgram, Input, Output
        prog = EvaProgram("jaxrot", vec_size=8)
        with prog:
            x = Input("x")
            w = Input("w", False)
            Output("y", (x << 1) * w + (x >> 2) - 1)
        prog.set_output_ranges(20)
        prog.set_input_scales(30)
        compile_and_check(prog, backend="jax")

    def test_execute_pipelined_matches_sequential(self):
        """execute_pipelined must yield, in order, ciphertexts
        bit-identical to per-call execute for the same inputs."""
        from eva_tpu import EvaProgram, Input, Output
        from eva_tpu.ckks import CKKSCompiler
        from eva_tpu.runtime import generate_keys

        prog = EvaProgram("jaxpipe", vec_size=8)
        with prog:
            x = Input("x")
            Output("y", (x << 1) * x + 2)
        prog.set_output_ranges(20)
        prog.set_input_scales(30)
        compiled, params, sig = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(prog)
        pub, sec = generate_keys(params, backend="jax")
        rng = np.random.default_rng(3)
        encs = [pub.encrypt({"x": rng.uniform(-1, 1, 8).tolist()}, sig)
                for _ in range(5)]
        seq = [pub.execute(compiled, e) for e in encs]
        piped = list(pub.execute_pipelined(compiled, iter(encs), depth=2))
        assert len(piped) == len(seq)
        for s, p in zip(seq, piped):
            for name in s:
                cs, cp = s[name], p[name]
                assert cs.scale == cp.scale and cs.level == cp.level
                for a, b in zip(cs.polys, cp.polys):
                    assert np.array_equal(a, b)


class TestPallasNTT:
    """Four-step Pallas kernel vs host tables (interpret mode on CPU;
    the same kernel compiles via Mosaic on TPU)."""

    def test_bit_exact_and_roundtrip(self):
        from eva_tpu.crypto.primes import build_chain
        from eva_tpu.backend.pallas_ntt import get_pallas_ntt
        n = 2048
        chain = build_chain([60, 40], n)
        primes = tuple(q for e in chain for q in e.primes)
        pn = get_pallas_ntt(primes, n)
        rng = np.random.default_rng(7)
        x = np.stack([rng.integers(0, q, n, dtype=np.uint64).astype(np.uint32)
                      for q in primes])
        ref = np.stack([get_table(q, n).ntt(x[i].astype(np.uint64))
                        for i, q in enumerate(primes)])
        got = np.asarray(pn.ntt(x)).astype(np.uint64)
        assert np.array_equal(got, ref)
        back = np.asarray(pn.intt(got.astype(np.uint32))).astype(np.uint64)
        assert np.array_equal(back, x.astype(np.uint64))

    def test_batched_chunking(self):
        from eva_tpu.crypto.primes import build_chain
        from eva_tpu.backend.pallas_ntt import get_pallas_ntt
        n = 1024
        chain = build_chain([40, 40], n)
        primes = tuple(q for e in chain for q in e.primes)
        pn = get_pallas_ntt(primes, n)
        rng = np.random.default_rng(8)
        xb = np.stack([
            np.stack([rng.integers(0, q, n, dtype=np.uint64).astype(np.uint32)
                      for q in primes]) for _ in range(8)])
        got = np.asarray(pn.ntt(xb)).astype(np.uint64)
        for b in range(8):
            ref = np.stack([get_table(q, n).ntt(xb[b, i].astype(np.uint64))
                            for i, q in enumerate(primes)])
            assert np.array_equal(got[b], ref)


class TestPallasNTTv2:
    """The v2 (relayout-minimal) stage schedule must be bit-identical
    to v1 — it is the DEFAULT on real TPU hardware (measured 2.0x fwd /
    1.5x inv at N=16384, tools/bench_ntt_v2.py), so interpret-mode CI
    must keep covering it even though CPU runs default to v1."""

    def test_bit_identical_to_v1_and_roundtrip(self):
        from eva_tpu.crypto.primes import build_chain
        from eva_tpu.backend.pallas_ntt import PallasNTT
        from eva_tpu.backend.pallas_ntt_v2 import PallasNTTv2
        n = 1024
        chain = build_chain([40, 40], n)
        primes = [q for e in chain for q in e.primes]
        v1, v2 = PallasNTT(primes, n), PallasNTTv2(primes, n)
        rng = np.random.default_rng(9)
        x = np.stack([rng.integers(0, q, n, dtype=np.uint64)
                      .astype(np.uint32) for q in primes])
        a, b = np.asarray(v1.ntt(x)), np.asarray(v2.ntt(x))
        assert np.array_equal(a, b)
        ai, bi = np.asarray(v1.intt(a)), np.asarray(v2.intt(a))
        assert np.array_equal(ai, bi)
        assert np.array_equal(bi, x)

    def test_v2_fused_ks_end_to_end(self, monkeypatch):
        """HE round-trip of a rotation-bearing program with the v2
        kernels forced on (exercises the v2 rows inside the fused MAC
        and epilogue kernels in interpret mode)."""
        monkeypatch.setenv("EVA_TPU_NTT_V2", "1")
        from eva_tpu import EvaProgram, Input, Output, evaluate
        from eva_tpu.ckks import CKKSCompiler
        from eva_tpu.metric import valuation_mse
        from eva_tpu.runtime import generate_keys
        prog = EvaProgram("rot_v2", vec_size=1024)
        with prog:
            x = Input("x")
            Output("y", (x << 1) * 2 + (x << 3) * x)
        prog.set_output_ranges(20)
        prog.set_input_scales(40)
        inputs = {"x": [i * 0.001 for i in range(1024)]}
        ref = evaluate(prog, inputs)
        compiled, params, sig = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(prog)
        pub, sec = generate_keys(params, backend="jax")
        enc = pub.encrypt(inputs, sig)
        out = sec.decrypt(pub.execute(compiled, enc), sig)
        assert valuation_mse(out, ref) < 0.01


class TestTwoEntryKSJax:
    def test_two_entry_ks_round_trip(self):
        """Two-entry special modulus (P ~ 2^120, alpha=4 digits) through
        the jax backend's fused key-switch kernels: n_key=4 P-divisions
        in the epilogue, 4-sub-prime FBE in the MAC."""
        from eva_tpu import EvaProgram, Input, Output, evaluate
        from eva_tpu.ckks import CKKSCompiler
        from eva_tpu.metric import valuation_mse
        from eva_tpu.runtime import generate_keys
        prog = EvaProgram("deep2p_jax", vec_size=1024)
        with prog:
            x = Input("x")
            y = x
            for _ in range(3):
                y = y * y
            Output("y", y + (x << 1) * 2)
        prog.set_output_ranges(20)
        prog.set_input_scales(40)
        inputs = {"x": [i * 0.0005 for i in range(1024)]}
        ref = evaluate(prog, inputs)
        compiled, params, sig = CKKSCompiler(
            {"warn_vec_size": "false", "two_entry_ks": "true"}).compile(prog)
        assert params.key_terms == 2
        pub, sec = generate_keys(params, backend="jax")
        assert pub._keys.relin.alpha == 4
        enc = pub.encrypt(inputs, sig)
        out = sec.decrypt(pub.execute(compiled, enc), sig)
        assert valuation_mse(out, ref) < 0.01


class TestCrossBackendEquivalence:
    """The numpy and JAX executors must produce IDENTICAL ciphertexts for
    the same encrypted valuation (all kernels are bit-exact counterparts,
    including hoisted rotations vs direct decomposition)."""

    def test_identical_ciphertexts(self):
        import random
        random.seed(55)
        from eva_tpu import EvaProgram, Input, Output
        from eva_tpu.ckks import CKKSCompiler
        from eva_tpu.runtime import generate_keys, Executor

        prog = EvaProgram("xbe", vec_size=16)
        with prog:
            x = Input("x")
            w = Input("w", False)
            Output("y", (x << 1) * 3 + (x >> 2) * w + x * x - 1)
        prog.set_output_ranges(20)
        prog.set_input_scales(30)
        compiled, params, sig = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(prog)
        pub, sec = generate_keys(params, backend="numpy")
        inputs = {"x": [random.uniform(-2, 2) for _ in range(16)],
                  "w": [random.uniform(-2, 2) for _ in range(16)]}
        enc = pub.encrypt(inputs, sig)

        out_np = Executor(compiled, pub.ctx, pub._keys,
                          backend="numpy").run(enc)
        out_jx = Executor(compiled, pub.ctx, pub._keys,
                          backend="jax").run(enc)
        ct_np = out_np["y"]
        ct_jx = out_jx["y"]
        assert ct_np.level == ct_jx.level
        assert ct_np.scale == ct_jx.scale
        for a, b in zip(ct_np.polys, ct_jx.polys):
            assert np.array_equal(a, b), "backend ciphertexts diverge"


def test_profiling_smoke():
    """The roofline profiler runs end to end (tiny sizes, CPU backend)."""
    from eva_tpu.profiling import profile
    results, hbm = profile(n=256, n_entries=1)
    assert hbm > 0
    assert len(results) >= 5
    for name, us, achieved, frac in results:
        assert us > 0 and achieved > 0


class TestFusedRescaleRelin:
    def test_fused_pair_bit_exact_across_backends(self):
        """A program compiling to Relinearize(Rescale(Mul)) must take the
        fused path and still produce ciphertexts bit-identical to the
        numpy backend (which fuses the same way)."""
        import random
        random.seed(66)
        from eva_tpu import EvaProgram, Input, Output
        from eva_tpu.ckks import CKKSCompiler
        from eva_tpu.ir import Op
        from eva_tpu.runtime import generate_keys, Executor

        prog = EvaProgram("fused", vec_size=16)
        with prog:
            x = Input("x")
            y = Input("y")
            Output("z", (x * y) * (x * y) + x)
        prog.set_output_ranges(20)
        prog.set_input_scales(60)
        compiled, params, sig = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(prog)
        # The pattern must exist in this graph.
        assert any(t.op == Op.Relinearize and t.operands[0].op == Op.Rescale
                   and len(t.operands[0].uses) == 1
                   for t in compiled.topological_order())
        pub, sec = generate_keys(params)
        inputs = {"x": [random.uniform(-1, 1) for _ in range(16)],
                  "y": [random.uniform(-1, 1) for _ in range(16)]}
        enc = pub.encrypt(inputs, sig)
        out_np = Executor(compiled, pub.ctx, pub._keys, backend="numpy").run(enc)
        out_jx = Executor(compiled, pub.ctx, pub._keys, backend="jax").run(enc)
        for a, b in zip(out_np["z"].polys, out_jx["z"].polys):
            assert np.array_equal(a, b)

    def test_eager_adjacency_fused_bit_exact(self):
        """With eager relinearization the graph emits Rescale(Relinearize);
        both backends must fuse it identically."""
        import random
        random.seed(67)
        from eva_tpu import EvaProgram, Input, Output
        from eva_tpu.ckks import CKKSCompiler
        from eva_tpu.ir import Op
        from eva_tpu.runtime import generate_keys, Executor

        prog = EvaProgram("fusedE", vec_size=16)
        with prog:
            x = Input("x")
            Output("z", (x * x) * (x * x))
        prog.set_output_ranges(20)
        prog.set_input_scales(60)
        compiled, params, sig = CKKSCompiler(
            {"warn_vec_size": "false", "lazy_relinearize": "false"}).compile(prog)
        assert any(t.op == Op.Rescale and t.operands[0].op == Op.Relinearize
                   and len(t.operands[0].uses) == 1
                   for t in compiled.topological_order())
        pub, sec = generate_keys(params)
        inputs = {"x": [random.uniform(-1, 1) for _ in range(16)]}
        enc = pub.encrypt(inputs, sig)
        out_np = Executor(compiled, pub.ctx, pub._keys, backend="numpy").run(enc)
        out_jx = Executor(compiled, pub.ctx, pub._keys, backend="jax").run(enc)
        for a, b in zip(out_np["z"].polys, out_jx["z"].polys):
            assert np.array_equal(a, b)


class TestDevPermMXU:
    """The MXU one-hot int8-matmul automorphism path only activates on
    real TPU; force its construction here so the byte-split/recombination
    and row-constancy logic is covered by the CPU suite (DevPerm.__call__
    is plain jnp and runs anywhere)."""

    def test_mxu_matches_gather(self, monkeypatch):
        from eva_tpu.backend.executor_jax import DevPerm
        from eva_tpu.crypto.context import CKKSContext

        n = 1024
        ctx = CKKSContext([40], [1], n)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        rng = np.random.default_rng(9)
        # Full-range uint32 values exercise all four byte planes
        # (including the int8 sign-extension recombination).
        arr = rng.integers(0, 2 ** 32, (3, n), dtype=np.uint64)
        arr = jnp.asarray(arr.astype(np.uint32))
        elts = [ctx.galois_elt(1), ctx.galois_elt(-5), ctx.galois_elt(37),
                2 * n - 1]  # rotations both ways + conjugation
        for g in elts:
            perm = ctx.perm_for_elt(g)
            dp = DevPerm(perm)
            assert dp.mxu, f"MXU construction must succeed for g={g}"
            want = np.asarray(jnp.take(arr, jnp.asarray(perm), axis=-1))
            got = np.asarray(dp(arr))
            np.testing.assert_array_equal(got, want)

    def test_small_ring_falls_back(self, monkeypatch):
        from eva_tpu.backend.executor_jax import DevPerm
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        dp = DevPerm(np.arange(256)[::-1].copy())
        assert not dp.mxu  # n < 1024: gather fallback
        arr = jnp.arange(256, dtype=jnp.uint32)[None]
        np.testing.assert_array_equal(
            np.asarray(dp(arr))[0], np.arange(256, dtype=np.uint32)[::-1])


class TestHoistedPermuteAfter:
    """The hoisted rotation path MACs the shared digit stack against an
    INVERSE-permuted key layout and automorphs only the two outputs
    (executor_jax.DeviceKeys.layout_rot). Lock the inversion identity and
    the device-upload cache semantics."""

    def test_layout_rot_is_inverse_permuted(self):
        from eva_tpu import EvaProgram, Input, Output
        from eva_tpu.ckks import CKKSCompiler
        from eva_tpu.runtime import generate_keys, Executor

        prog = EvaProgram("rotk", vec_size=16)
        with prog:
            x = Input("x")
            Output("y", (x << 1) + (x << 1) * (x << 1))
        prog.set_output_ranges(20)
        prog.set_input_scales(30)
        compiled, params, sig = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(prog)
        pub, _ = generate_keys(params, backend="jax")
        ex = Executor(compiled, pub.ctx, pub._keys, backend="jax")
        jp = ex._get_jax_program()
        ctx = pub.ctx
        g = ctx.galois_elt(1)
        ksk = jp.keys.galois[g]
        plain = jp.dkeys.layout(ksk, 0)
        rot = jp.dkeys.layout_rot(ksk, 0, g)
        perm = ctx.perm_for_elt(g)
        # forward-permuting the inverse-permuted planes restores them
        for comp_p, comp_r in zip(plain, rot):
            for a, b in zip(comp_p, comp_r):
                if a is None:
                    assert b is None
                    continue
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(jnp.take(b, perm, axis=-1)))

    def test_upload_cache_reuses_device_planes(self):
        import random
        random.seed(7)
        from eva_tpu import EvaProgram, Input, Output
        from eva_tpu.ckks import CKKSCompiler
        from eva_tpu.runtime import generate_keys, Executor

        prog = EvaProgram("upc", vec_size=16)
        with prog:
            x = Input("x")
            Output("y", x * [0.5] * 16 + 1)
        prog.set_output_ranges(20)
        prog.set_input_scales(30)
        compiled, params, sig = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(prog)
        pub, sec = generate_keys(params, backend="jax")
        inputs = {"x": [random.uniform(-2, 2) for _ in range(16)]}
        enc = pub.encrypt(inputs, sig)
        ex = Executor(compiled, pub.ctx, pub._keys, backend="jax")
        out1 = ex.run(enc)
        jp = ex._get_jax_program()
        n_cached = len(jp._upload_cache)
        assert n_cached >= 1  # cipher input + cached encodes
        out2 = ex.run(enc)
        assert len(jp._upload_cache) == n_cached  # hits, no growth
        for a, b in zip(out1["y"].polys, out2["y"].polys):
            np.testing.assert_array_equal(a, b)


def test_level_ops_cache_keyed_by_ring_size():
    """The same prime can serve two ring sizes (q = 1 mod 2*16384 implies
    q = 1 mod 2*8192); level_ops must not return an NTT table built for
    the other N (found by the offline fuzz campaign)."""
    from eva_tpu.backend.executor_jax import level_ops
    from eva_tpu.crypto.primes import build_chain

    q = build_chain([60], 16384)[0].primes[0]
    a = level_ops([q], 8192)
    b = level_ops([q], 16384)
    assert a.n == 8192 and b.n == 16384
    x = np.random.default_rng(3).integers(0, q, (1, 8192), dtype=np.uint64)
    y = a.intt(a.ntt(jnp.asarray(x.astype(np.uint32))))
    np.testing.assert_array_equal(np.asarray(y), x.astype(np.uint32))


def test_program_cost_estimate_smoke():
    """estimate_program returns a positive budget and covers every HE op
    class in a rotation+relin+rescale program."""
    from eva_tpu import EvaProgram, Input, Output
    from eva_tpu.ckks import CKKSCompiler
    from eva_tpu.profiling import estimate_program

    prog = EvaProgram("est", vec_size=1024)
    with prog:
        x = Input("x")
        Output("y", (x << 1) * x + (x << 2) * 0.5 - 1)
    prog.set_input_scales(30)
    prog.set_output_ranges(20)
    compiled, params, _ = CKKSCompiler({"warn_vec_size": "false"}).compile(prog)
    totals, total = estimate_program(compiled, params)
    assert total > 0
    assert "rotate" in totals and "relinearize" in totals
    assert sum(s for _, s in totals.values()) == total


def test_recommend_mesh():
    """recommend_mesh picks valid shapes: all-batch for throughput
    (collectives only subtract), collective axes (limb/seq) for
    single-execution latency; every candidate shape fits the device
    count and seq compatibility."""
    from eva_tpu import EvaProgram, Input, Output
    from eva_tpu.ckks import CKKSCompiler
    from eva_tpu.profiling import recommend_mesh
    from eva_tpu.parallel.seq_exec import seq_compatible

    prog = EvaProgram("rec", vec_size=1024)
    with prog:
        x = Input("x")
        Output("y", (x << 1) * x + (x << 2) * 0.5 - 1)
    prog.set_input_scales(30)
    prog.set_output_ranges(20)
    compiled, params, _ = CKKSCompiler(
        {"warn_vec_size": "false"}).compile(prog)

    best_t, table_t = recommend_mesh(compiled, params, 8, throughput=True)
    assert best_t == {"batch": 8, "limb": 1, "seq": 1}

    best_l, table_l = recommend_mesh(compiled, params, 8)
    assert best_l["limb"] * best_l["seq"] > 1  # sharding wins latency
    n = params.poly_modulus_degree
    for shape, t, thr in table_l:
        assert shape["batch"] * shape["limb"] * shape["seq"] <= 8
        assert t > 0 and thr > 0
        if shape["seq"] > 1:
            assert seq_compatible(n, shape["seq"])
    # latency ordering holds for the winner
    assert table_l[0][1] <= table_l[-1][1]


class TestRotationSumFusion:
    """Rotation-sum epilogue fusion: rotations stay in deferred
    (pre-division accumulator) form until a non-Add consumer; directly
    summed rotations share ONE P-division. Lone rotations must be
    bit-identical to the eager form (same MAC, same single epilogue);
    sums differ only by the division rounding (strictly fewer roundings)
    and must stay bit-identical ACROSS backends."""

    def _compile(self, name, f, vec=16):
        from eva_tpu import EvaProgram, Input, Output
        from eva_tpu.ckks import CKKSCompiler
        prog = EvaProgram(name, vec_size=vec)
        with prog:
            x = Input("x")
            Output("y", f(x))
        prog.set_output_ranges(20)
        prog.set_input_scales(30)
        return prog, *CKKSCompiler({"warn_vec_size": "false"}).compile(prog)

    def test_cross_backend_bit_identical_fused_shapes(self):
        import random
        from eva_tpu import evaluate
        from eva_tpu.metric import valuation_mse
        from eva_tpu.runtime import generate_keys, EVAPublic
        random.seed(5)
        cases = {
            "hoisted_sum": lambda x: (x << 1) + (x << 2) + (x << 3) - 2,
            "giants": lambda x: ((x * x + (x << 1))
                                 + ((x * 1.5 + 1) << 2)) + ((x * 0.5) << 3),
            "rot_of_sum": lambda x: ((x << 1) + (x << 2)) << 3,
            "mixed_sub": lambda x: ((x << 1) + (x << 2)) - (x << 3),
            # Baby-step (rot*const) fusion shapes: the multiplies stay in
            # deferred pre-division form (extended-basis plaintexts).
            "babystep": lambda x: ((x << 1) * 2.0 + (x << 2) * (-0.5)
                                   + (x << 3) * 1.25),
            "conv_square": lambda x: ((x << 1) * 2.0 + (x << 2) * 3.0)
                                     * ((x << 1) * 0.5 + (x << 3) * 1.5),
            "babystep_sub": lambda x: (x << 1) * 2.0 - (x << 2) * 0.5 - x,
            "neg_defer": lambda x: -((x << 1) * 2.0) + (x << 2),
        }
        for name, f in cases.items():
            prog, compiled, params, sig = self._compile(name, f)
            inputs = {"x": [random.uniform(-1, 1) for _ in range(16)]}
            pub_j, sec = generate_keys(params, backend="jax")
            enc = pub_j.encrypt(inputs, sig)
            out_j = pub_j.execute(compiled, enc)
            pub_n = EVAPublic(pub_j.ctx, pub_j._keys, params,
                              backend="numpy")
            out_n = pub_n.execute(compiled, enc)
            for k in out_j:
                for a, b in zip(out_j[k].polys, out_n[k].polys):
                    assert np.array_equal(
                        np.asarray(a).astype(np.uint64),
                        np.asarray(b).astype(np.uint64)), (name, k)
            mse = valuation_mse(sec.decrypt(out_j, sig),
                                evaluate(prog, inputs))
            assert mse < 0.01, (name, mse)

    def test_lone_rotation_bit_matches_eager(self, monkeypatch):
        """Deferral is cost- and bit-neutral for a single un-multiplied
        rotation: the fused and EVA_TPU_NO_ROTSUM_FUSION forms agree
        exactly. (A multiplied rotation is covered separately — the
        baby-step deferred multiply legitimately differs from eager by
        one division rounding.)"""
        import random
        from eva_tpu.runtime import generate_keys, EVAPublic
        random.seed(7)
        prog, compiled, params, sig = self._compile(
            "lone", lambda x: (x << 1) + x * 2.0 + 1)
        inputs = {"x": [random.uniform(-1, 1) for _ in range(16)]}
        pub, sec = generate_keys(params, backend="jax")
        enc = pub.encrypt(inputs, sig)
        out_f = pub.execute(compiled, enc)
        monkeypatch.setenv("EVA_TPU_NO_ROTSUM_FUSION", "1")
        pub2 = EVAPublic(pub.ctx, pub._keys, params, backend="jax")
        out_e = pub2.execute(compiled, enc)
        for k in out_f:
            for a, b in zip(out_f[k].polys, out_e[k].polys):
                assert np.array_equal(np.asarray(a).astype(np.uint64),
                                      np.asarray(b).astype(np.uint64))

    def test_babystep_optout_matches_eager_multiply(self, monkeypatch):
        """EVA_TPU_NO_ROTMUL_FUSION restores the round-4 behavior
        (finalize at every rot*const multiply) while keeping Add-merge
        fusion; the two forms must agree to within division-rounding
        noise, and the opt-out jax/numpy pair must stay bit-identical."""
        import random
        from eva_tpu.runtime import generate_keys, EVAPublic
        random.seed(9)
        prog, compiled, params, sig = self._compile(
            "bs_opt", lambda x: ((x << 1) * 2.0 + (x << 2) * (-1.5)
                                 + (x << 3) * 0.5 + 1))
        inputs = {"x": [random.uniform(-1, 1) for _ in range(16)]}
        pub, sec = generate_keys(params, backend="jax")
        enc = pub.encrypt(inputs, sig)
        out_f = sec.decrypt(pub.execute(compiled, enc), sig)
        monkeypatch.setenv("EVA_TPU_NO_ROTMUL_FUSION", "1")
        pub_j = EVAPublic(pub.ctx, pub._keys, params, backend="jax")
        out_j = pub_j.execute(compiled, enc)
        pub_n = EVAPublic(pub.ctx, pub._keys, params, backend="numpy")
        out_n = pub_n.execute(compiled, enc)
        for k in out_j:
            for a, b in zip(out_j[k].polys, out_n[k].polys):
                assert np.array_equal(np.asarray(a).astype(np.uint64),
                                      np.asarray(b).astype(np.uint64))
        from eva_tpu.metric import valuation_mse
        assert valuation_mse(out_f, sec.decrypt(out_j, sig)) < 1e-6

    def test_babystep_marks_only_rotsum_encodes(self):
        """The static marker attaches extended-basis planes exactly to
        the encodes a deferred rotation sum is multiplied by."""
        from eva_tpu.ir import Op
        from eva_tpu.runtime import generate_keys, EVAPublic
        prog, compiled, params, sig = self._compile(
            "mark", lambda x: ((x << 1) * 2.0 + (x << 2) * 0.5
                               + x * 3.0))
        pub, sec = generate_keys(params, backend="numpy")
        from eva_tpu.runtime.executor import Executor
        ex = Executor(compiled, pub.ctx, pub._keys, backend="numpy")
        marked = {t for t in compiled.topological_order()
                  if t.index in ex._ext_encodes}
        assert all(t.op == Op.Encode for t in marked)
        # the tap encodes (multiplied into rotation sums) are marked; the
        # 3.0 encode multiplies the un-rotated ciphertext and is not
        assert len(marked) >= 2
        n_enc = sum(1 for t in compiled.topological_order()
                    if t.op == Op.Encode)
        assert len(marked) < n_enc
        # profitability: deferral must strictly reduce epilogue count
        _, fa = ex._simulate_rotsum(defer_mul=True)
        _, fb = ex._simulate_rotsum(defer_mul=False)
        assert fa < fb
