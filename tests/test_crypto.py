"""Unit tests for the CKKS crypto runtime (the SEAL replacement)."""

import numpy as np
import pytest

from eva_tpu.crypto.context import CKKSContext
from eva_tpu.crypto.ntt import get_table
from eva_tpu.crypto.primes import build_chain, is_prime
from eva_tpu.crypto import keys as K, ops as O


@pytest.fixture(scope="module")
def ctx():
    return CKKSContext([60, 30, 60, 60], [1, -2, 4], 2048)


@pytest.fixture(scope="module")
def keyset(ctx):
    return K.generate_keys(ctx)


class TestPrimes:
    def test_chain_structure(self):
        chain = build_chain([60, 20, 60, 60], 8192)
        assert len(chain) == 4
        flat = [q for e in chain for q in e.primes]
        assert len(flat) == len(set(flat)), "sub-primes must be distinct"
        for e in chain:
            for q in e.primes:
                assert is_prime(q)
                assert q % (2 * 8192) == 1, "NTT-friendliness"
                assert q < 2 ** 31

    def test_pair_accuracy(self):
        chain = build_chain([60], 8192)
        e = chain[0]
        rel = abs(e.product - 2 ** 60) / 2 ** 60
        assert rel < 2 ** -18, f"pair product too far from 2^60: {rel}"


class TestNTT:
    def test_roundtrip_and_negacyclic(self):
        q, n = 1073668097, 32
        t = get_table(q, n)
        rng = np.random.default_rng(0)
        a = rng.integers(0, q, n, dtype=np.uint64)
        b = rng.integers(0, q, n, dtype=np.uint64)
        assert np.array_equal(t.intt(t.ntt(a)), a)
        # negacyclic product against schoolbook
        c = [0] * n
        for i in range(n):
            for j in range(n):
                k = i + j
                sgn = 1 if k < n else -1
                c[k % n] = (c[k % n] + sgn * int(a[i]) * int(b[j])) % q
        got = t.intt((t.ntt(a) * t.ntt(b)) % np.uint64(q))
        assert np.array_equal(got, np.array(c, dtype=np.uint64))

    def test_evaluation_ordering(self):
        """X[j] must equal m(psi^(2*rev(j)+1)) — the bit-reversed Harvey
        ordering the automorphism permutations are conjugated against."""
        from eva_tpu.crypto.ntt import _bit_reverse_perm
        q, n = 1073668097, 16
        t = get_table(q, n)
        rev = _bit_reverse_perm(n)
        a = np.arange(1, n + 1, dtype=np.uint64)
        X = t.ntt(a)
        for j in range(n):
            val = sum(int(a[k]) * pow(t.psi, (2 * int(rev[j]) + 1) * k, q)
                      for k in range(n)) % q
            assert val == int(X[j])


class TestEncoder:
    def test_roundtrip(self, ctx):
        rng = np.random.default_rng(3)
        v = rng.uniform(-2, 2, ctx.n // 2)
        primes = ctx.primes_at_level(0)
        coeffs = ctx.encoder.values_to_coeffs(v, 2.0 ** 40)
        res = ctx.encoder.coeffs_to_residues(coeffs, primes)
        back = ctx.encoder.coeffs_to_values(
            ctx.encoder.residues_to_coeffs(res, primes), 2.0 ** 40)
        assert np.max(np.abs(back - v)) < 1e-9

    def test_crt_reconstruction_exact(self, ctx):
        """The Garner mixed-radix CRT must match big-int CRT bit-exactly
        for small centered values and to float64 precision for values
        near +-Q/2 (including the exact centering boundary)."""
        primes = ctx.primes_at_level(0)
        Q = 1
        for q in primes:
            Q *= q
        vals = [0, 1, 2, Q - 1, Q - 2, 7, Q - 12345, 12345,
                Q // 2, Q // 2 - 1, Q // 2 + 1, Q // 3]
        res = np.zeros((len(primes), ctx.n), dtype=np.uint64)
        for j, v in enumerate(vals):
            for i, q in enumerate(primes):
                res[i, j] = v % q
        got = ctx.encoder.residues_to_coeffs(res, primes)
        for j, v in enumerate(vals):
            want = v - Q if v >= Q // 2 else v
            if abs(want) < 2 ** 52:
                assert got[j] == float(want), (j, v)
            else:
                assert abs(got[j] - float(want)) <= 1e-14 * abs(float(want))

    def test_automorphism_is_slot_rotation(self, ctx):
        rng = np.random.default_rng(4)
        v = rng.uniform(-2, 2, ctx.n // 2)
        primes = ctx.primes_at_level(0)
        pt = K.encode(ctx, v, 2.0 ** 40, 0)
        for r in (1, 3, 100):
            g = ctx.galois_elt(r)
            rot = ctx.apply_automorphism(pt.poly, g)
            dec = ctx.encoder.coeffs_to_values(
                ctx.encoder.residues_to_coeffs(ctx.intt(rot, primes), primes),
                pt.scale)
            assert np.max(np.abs(dec - np.roll(v, -r))) < 1e-8


class TestHomomorphicOps:
    def _vals(self, ctx, seed):
        return np.random.default_rng(seed).uniform(-2, 2, ctx.n // 2)

    def test_enc_dec(self, ctx, keyset):
        v = self._vals(ctx, 0)
        ct = K.encrypt(ctx, keyset, v, 2.0 ** 45, 0)
        assert np.max(np.abs(K.decrypt(ctx, keyset, ct) - v)) < 1e-6

    def test_addsubneg(self, ctx, keyset):
        v1, v2 = self._vals(ctx, 1), self._vals(ctx, 2)
        c1 = K.encrypt(ctx, keyset, v1, 2.0 ** 45, 0)
        c2 = K.encrypt(ctx, keyset, v2, 2.0 ** 45, 0)
        assert np.max(np.abs(K.decrypt(ctx, keyset, O.add(ctx, c1, c2)) - (v1 + v2))) < 1e-5
        assert np.max(np.abs(K.decrypt(ctx, keyset, O.sub(ctx, c1, c2)) - (v1 - v2))) < 1e-5
        assert np.max(np.abs(K.decrypt(ctx, keyset, O.negate(ctx, c1)) + v1)) < 1e-5

    def test_mul_relin_rescale(self, ctx, keyset):
        v1, v2 = self._vals(ctx, 5), self._vals(ctx, 6)
        c1 = K.encrypt(ctx, keyset, v1, 2.0 ** 45, 0)
        c2 = K.encrypt(ctx, keyset, v2, 2.0 ** 45, 0)
        prod = O.rescale(ctx, O.relinearize(ctx, keyset, O.multiply(ctx, c1, c2)))
        assert prod.level == 1
        assert np.max(np.abs(K.decrypt(ctx, keyset, prod) - v1 * v2)) < 1e-4
        # true-scale tracking: scale is 2^90 / actual dropped product
        expected = (2.0 ** 90) / ctx.entries_at_level(0)[-1].product
        assert prod.scale == pytest.approx(expected)

    def test_rotate(self, ctx, keyset):
        v = self._vals(ctx, 7)
        ct = K.encrypt(ctx, keyset, v, 2.0 ** 45, 0)
        for step in (1, -2, 4):
            got = K.decrypt(ctx, keyset, O.rotate(ctx, keyset, ct, step))
            assert np.max(np.abs(got - np.roll(v, -step))) < 1e-4

    def test_square_path(self, ctx, keyset):
        v = self._vals(ctx, 8)
        ct = K.encrypt(ctx, keyset, v, 2.0 ** 45, 0)
        sq = O.relinearize(ctx, keyset, O.square(ctx, ct))
        assert np.max(np.abs(K.decrypt(ctx, keyset, sq) - v * v)) < 1e-4

    def test_modswitch_preserves_value(self, ctx, keyset):
        v = self._vals(ctx, 9)
        ct = K.encrypt(ctx, keyset, v, 2.0 ** 45, 0)
        ms = O.mod_switch(ctx, ct)
        assert ms.level == 1 and ms.scale == ct.scale
        assert np.max(np.abs(K.decrypt(ctx, keyset, ms) - v)) < 1e-5

    def test_plain_ops(self, ctx, keyset):
        v1, v2 = self._vals(ctx, 10), self._vals(ctx, 11)
        ct = K.encrypt(ctx, keyset, v1, 2.0 ** 45, 0)
        pt = K.encode(ctx, v2, 2.0 ** 45, 0)
        assert np.max(np.abs(K.decrypt(ctx, keyset, O.add_plain(ctx, ct, pt)) - (v1 + v2))) < 1e-5
        assert np.max(np.abs(K.decrypt(ctx, keyset, O.sub_plain(ctx, ct, pt)) - (v1 - v2))) < 1e-5
        assert np.max(np.abs(K.decrypt(ctx, keyset, O.multiply_plain(ctx, ct, pt)) - v1 * v2)) < 1e-4


class TestHybridKeySwitch:
    """Grouped (hybrid/dnum) key-switch decomposition: alpha sub-primes
    per gadget digit, groups packed while the product stays <= 2P
    (CKKSContext.ks_groups). Counterpart of the reference's SEAL
    switch-key path (seal_executor.h:114-215) generalized per the
    standard hybrid design."""

    def test_groups_respect_special_modulus(self, ctx):
        P = ctx.key_product
        for alpha in (2, 3, 4):
            groups = ctx.ks_groups(alpha)
            flat = [t for g in groups for t in g]
            assert flat == list(range(len(ctx.data_primes)))
            for g in groups:
                assert len(g) <= alpha
                prod = 1
                for t in g:
                    prod *= ctx.data_primes[t]
                assert prod <= 2 * P

    @pytest.mark.parametrize("alpha", [2, 3])
    def test_rotation_and_relin_all_levels(self, ctx, alpha):
        ks = K.generate_keys(ctx, alpha=alpha)
        assert ks.ks_alpha == alpha
        vals = np.cos(np.arange(ctx.n // 2) * 0.05)
        ct = K.encrypt(ctx, ks, vals, 2.0 ** 60, 0)
        expect = vals.copy()
        # walk down the chain: square+relin+rescale, rotating at each level
        for level in range(len(ctx.data_entries) - 1):
            rot = O.rotate(ctx, ks, ct, 1)
            dec = K.decrypt(ctx, ks, rot)
            assert np.max(np.abs(dec - np.roll(expect, -1))) < 1e-3, level
            ct = O.rescale(ctx, O.relinearize(ctx, ks, O.multiply(ctx, ct, ct)))
            expect = expect * expect

    def test_digits_match_numpy_jax(self, ctx):
        """Decomposition is bit-identical between backends (covered more
        broadly in test_jax_backend; this pins the digit tensors)."""
        from eva_tpu.backend.executor_jax import (JaxProgram, device_keys,
                                                  _ks_maps)
        import jax.numpy as jnp
        ks = K.generate_keys(ctx, alpha=2)
        rng = np.random.default_rng(7)
        primes = ctx.primes_at_level(0)
        poly = np.stack([rng.integers(0, q, ctx.n, dtype=np.uint64)
                         for q in primes])
        np_digits = O._ks_digits(ctx, poly, 0, 2)
        jp = JaxProgram.__new__(JaxProgram)
        jp.ctx, jp.keys = ctx, ks
        jp.dkeys = device_keys(ctx, ks)
        struct = jp._ks_digits(jnp.asarray(poly[None].astype(np.uint32)), 0)
        _, owner, sel = _ks_maps(ctx, 0, 2)
        jax_digits = struct.dense(owner, sel)
        assert len(jax_digits) == len(np_digits)
        for a, b in zip(np_digits, jax_digits):
            np.testing.assert_array_equal(
                a.astype(np.uint64), np.asarray(b)[0].astype(np.uint64))

    def test_ks_alpha_serialization_roundtrip(self, ctx):
        from eva_tpu.serialization import (_ksk_to_msg, _ksk_from_msg,
                                           evatpu_pb2)
        ks = K.generate_keys(ctx, alpha=2)
        msg = evatpu_pb2.KSwitchKeyMsg()
        _ksk_to_msg(ks.relin, msg)
        clone = _ksk_from_msg(msg, ctx)
        assert clone.alpha == 2
        assert len(clone.k0) == len(ks.relin.k0)
        # absent field (pre-hybrid file) loads as alpha=1
        msg2 = evatpu_pb2.KSwitchKeyMsg()
        _ksk_to_msg(K.generate_keys(ctx, alpha=1).relin, msg2)
        msg2.ks_alpha = 0
        assert _ksk_from_msg(msg2, ctx).alpha == 1


@pytest.mark.slow
class TestFusedPallasKeySwitch:
    """The fused Pallas key-switch kernels (backend/pallas_ks.py) must be
    bit-identical to the structured XLA path for every (alpha, level,
    out_ntt) combination — including a partial last digit group (this
    ctx has 5 data sub-primes, so alpha=2 pads one FBE row).

    Marked slow: Pallas interpret mode takes ~2 min per case on CPU.
    tools/verify_ks_tpu.py runs the same matrix on real TPU in seconds."""

    @pytest.mark.parametrize("alpha", [1, 2])
    @pytest.mark.parametrize("level", [0, 1])
    @pytest.mark.parametrize("out_ntt", [True, False])
    def test_fused_matches_structured(self, ctx, alpha, level, out_ntt):
        from eva_tpu.backend.executor_jax import (JaxProgram, device_keys,
                                                  level_ops)
        import jax.numpy as jnp
        ks = K.generate_keys(ctx, alpha=alpha)
        jp = JaxProgram.__new__(JaxProgram)
        jp.ctx, jp.keys = ctx, ks
        jp.dkeys = device_keys(ctx, ks)
        rng = np.random.default_rng(11)
        primes = ctx.primes_at_level(level)
        poly = np.stack([rng.integers(0, q, ctx.n, dtype=np.uint64)
                         for q in primes]).astype(np.uint32)
        poly_j = jnp.asarray(poly[None])  # leading batch dim
        dev = level_ops(primes, ctx.n)
        coeffs = dev.intt(poly_j)

        ref0, ref1 = jp._ks_apply(
            jp._ks_digits(poly_j, level), level,
            jp.dkeys.layout(ks.relin, level), coeff_out=not out_ntt)
        got0, got1 = jp._ks_fused_coeffs(coeffs, level, ks.relin,
                                         out_ntt=out_ntt)
        np.testing.assert_array_equal(np.asarray(ref0), np.asarray(got0))
        np.testing.assert_array_equal(np.asarray(ref1), np.asarray(got1))
        # Own-row NTT skip (poly_ntt provided) must not change a bit.
        own0, own1 = jp._ks_fused_coeffs(coeffs, level, ks.relin,
                                         out_ntt=out_ntt, poly_ntt=poly_j)
        np.testing.assert_array_equal(np.asarray(ref0), np.asarray(own0))
        np.testing.assert_array_equal(np.asarray(ref1), np.asarray(own1))


class TestDeviceKeygen:
    def test_ksk_compute_byte_identical(self, ctx):
        """The device-batched KSK arithmetic (backend/keygen.DeviceKeygen)
        must produce byte-identical key material to the host loop given
        the same pre-sampled randomness (VERDICT: keygen on device)."""
        import secrets
        from eva_tpu.backend.keygen import DeviceKeygen

        rng = np.random.default_rng(77)
        s = K.SecretKey(ctx, rng.integers(-1, 2, ctx.n, dtype=np.int64))
        basis = ctx.all_primes
        target = (s.s * s.s) % ctx.qvec(basis)
        alpha = 2
        groups = ctx.ks_groups(alpha)
        As = [K.expand_uniform(ctx, basis, secrets.token_bytes(32))
              for _ in groups]
        Es = [np.rint(rng.normal(0.0, 3.2, ctx.n)).astype(np.int64)
              for _ in groups]
        facs = rng.integers(
            0, np.array(basis, dtype=np.uint64),
            (len(groups), len(basis)), dtype=np.uint64)

        h0, h1 = K._ksk_compute(ctx, s.s, target, As, Es, facs, None)
        d0, d1 = K._ksk_compute(ctx, s.s, target, As, Es, facs,
                                DeviceKeygen(ctx))
        for a, b in zip(h0, d0):
            np.testing.assert_array_equal(a, b)
        for a, b in zip(h1, d1):
            np.testing.assert_array_equal(a, b)

    def test_runtime_jax_backend_uses_engine_end_to_end(self):
        """generate_keys(backend='jax') must produce keys that decrypt a
        full HE round-trip (engine-generated KSKs are real keys)."""
        from eva_tpu import EvaProgram, Input, Output, evaluate
        from eva_tpu.ckks import CKKSCompiler
        from eva_tpu.metric import valuation_mse
        from eva_tpu.runtime import generate_keys

        prog = EvaProgram("kg", vec_size=8)
        with prog:
            x = Input("x")
            Output("y", x * x + (x << 1))
        prog.set_output_ranges(20)
        prog.set_input_scales(30)
        compiled, params, sig = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(prog)
        pub, sec = generate_keys(params, backend="jax")
        inputs = {"x": [0.1 * i for i in range(8)]}
        enc = pub.encrypt(inputs, sig)
        out = sec.decrypt(pub.execute(compiled, enc), sig)
        assert valuation_mse(out, evaluate(prog, inputs)) < 0.01


@pytest.mark.slow
class TestPallasEpilogueInStructuredPath:
    def test_ks_apply_epilogue_bit_identical(self, ctx):
        """_ks_apply with the fused Pallas epilogue forced on (interpret
        mode) must match the pure-XLA P-division — the path hoisted
        rotations take per rotation on TPU."""
        import jax.numpy as jnp
        from eva_tpu.backend.executor_jax import (JaxProgram, device_keys,
                                                  level_ops)
        ks = K.generate_keys(ctx, alpha=2)
        jp = JaxProgram.__new__(JaxProgram)
        jp.ctx, jp.keys = ctx, ks
        jp.dkeys = device_keys(ctx, ks)
        rng = np.random.default_rng(5)
        level = 0
        primes = ctx.primes_at_level(level)
        poly = np.stack([rng.integers(0, q, ctx.n, dtype=np.uint64)
                         for q in primes]).astype(np.uint32)
        poly_j = jnp.asarray(poly[None])

        for out_ntt in (True, False):
            jp._fused_ks_ok = lambda level=0: False
            ref = jp._ks_apply(jp._ks_digits(poly_j, level), level,
                               jp.dkeys.layout(ks.relin, level),
                               coeff_out=not out_ntt)
            jp._fused_ks_ok = lambda level=0: True
            got = jp._ks_apply(jp._ks_digits(poly_j, level), level,
                               jp.dkeys.layout(ks.relin, level),
                               coeff_out=not out_ntt)
            for a, b in zip(ref, got):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestEncoderPrecision:
    """Encoder precision envelope (SURVEY §7 hard part 3; VERDICT r3
    weak #6): the encode->decode round trip alone must match the
    two-term model in runtime/noise.encode_sigma — quantization rounding
    0.289*sqrt(N)/scale plus a RELATIVE float64-FFT/Garner floor of
    ~EPS_FFT*sqrt(log2 N). In particular high scales (60-90 bits, where
    f64 mantissa headroom is thin) must degrade gracefully to the
    relative floor, never catastrophically."""

    def test_roundtrip_matches_model_across_scales(self):
        from eva_tpu.crypto.encoder import get_encoder
        from eva_tpu.crypto.primes import build_chain
        from eva_tpu.runtime.noise import encode_sigma
        import math

        for n in (2048, 16384):
            enc = get_encoder(n)
            chain = build_chain([60] * 4, n)
            primes = [q for e in chain for q in e.primes]
            rng = np.random.default_rng(3)
            v = rng.uniform(-1, 1, n // 2)
            rms = float(np.sqrt(np.mean(v ** 2)))
            for sbits in (40, 60, 80):
                scale = 2.0 ** sbits
                c = enc.values_to_coeffs(v, scale)
                r = enc.coeffs_to_residues(c, primes)
                v2 = enc.coeffs_to_values(
                    enc.residues_to_coeffs(r, primes), scale)
                measured = float((v2 - v).std())
                predicted = (encode_sigma(n, scale, rms)
                             * math.sqrt(n) / scale)
                assert predicted / 3 < measured < 3 * predicted, (
                    f"N={n} scale=2^{sbits}: measured {measured:.3e} vs "
                    f"model {predicted:.3e}")

    def test_high_scale_error_is_relative_not_catastrophic(self):
        """At 90-bit scales the absolute slot error must stay at the
        ~3e-16 relative floor (the Garner decode carries the top 53 bits
        of the CENTERED coefficient, so there is no cancellation of
        ~Q-sized floats)."""
        from eva_tpu.crypto.encoder import get_encoder
        from eva_tpu.crypto.primes import build_chain

        n = 4096
        enc = get_encoder(n)
        chain = build_chain([60] * 4, n)
        primes = [q for e in chain for q in e.primes]
        rng = np.random.default_rng(7)
        v = rng.uniform(-1, 1, n // 2)
        scale = 2.0 ** 90
        c = enc.values_to_coeffs(v, scale)
        r = enc.coeffs_to_residues(c, primes)
        v2 = enc.coeffs_to_values(enc.residues_to_coeffs(r, primes), scale)
        assert float((v2 - v).std()) < 1e-14
