"""Big-vector extension: logical vectors larger than N/2 slots, sharded
across a ciphertext batch with the strided layout (eva_tpu/crypto/bigvec;
SURVEY.md §5 extension point — no reference counterpart, the reference
grows the ring instead)."""

import numpy as np
import pytest

from eva import EvaProgram, Input, Output
from eva_tpu.crypto.bigvec import (rotation_plan, shard_count,
                                   translate_rotation_steps)

from helpers import compile_and_check


class TestRotationPlan:
    def test_bruteforce_all_rotations(self):
        """The (roll, lo, hi) lowering must equal a logical cyclic
        rotation for every amount, including negatives and wraps."""
        for k in (2, 4, 8):
            for slots in (4, 8):
                S = k * slots
                vec = np.arange(S)
                # strided layout: shard j holds slots j::k
                shards = np.stack([vec[j::k] for j in range(k)])
                for r in list(range(-S, 2 * S, 3)) + [0, 1, S - 1, S, -1]:
                    c, lo, hi = rotation_plan(r, k, slots)
                    out = np.empty_like(shards)
                    for j in range(k):
                        src = (j + c) % k
                        amt = hi if j >= k - c else lo
                        out[j] = np.roll(shards[src], -amt)
                    logical = np.empty(S, dtype=vec.dtype)
                    for j in range(k):
                        logical[j::k] = out[j]
                    expect = np.roll(vec, -r)
                    assert np.array_equal(logical, expect), (k, slots, r)

    def test_shard_count(self):
        assert shard_count(64, 512) == 1
        assert shard_count(512, 512) == 1
        assert shard_count(2048, 512) == 4

    def test_translate_steps(self):
        # k == 1 keeps the reference list untouched (negatives included).
        assert translate_rotation_steps([3, -2], 512, 512) == [-2, 3]
        # k > 1: each step contributes at most two intra steps.
        out = translate_rotation_steps([1], 2048, 512)
        assert out == [1]  # r=1, k=4: a=0 (passthrough) and a+1=1
        out = translate_rotation_steps([4], 2048, 512)
        assert out == [1]  # divisible by k: single amount a=1
        out = translate_rotation_steps([7], 2048, 512)
        assert out == [1, 2]


class TestBigVecEndToEnd:
    def _program(self, vec_size):
        prog = EvaProgram("bigvec", vec_size=vec_size)
        with prog:
            x = Input("x")
            y = Input("y")
            # rotations in both directions, incl. steps not divisible by
            # the shard count and larger than the slot count
            expr = x * y + (x << 3) - (y >> 1) + (x << (vec_size // 2 + 5))
            Output("z", expr)
        # small scales keep the ring at N=4096 (2048 slots), so vec_size
        # 4096/8192 shards across 2/4 ciphertexts
        prog.set_output_ranges(10)
        prog.set_input_scales(20)
        return prog

    def test_numpy_backend(self):
        # Tiny depth => the security tables pick a small ring; a vector
        # of 4x the slot count shards across 4 ciphertexts.
        prog = self._program(8192)
        compiled, params, signature = compile_and_check(prog)
        slots = params.poly_modulus_degree // 2
        assert signature.vec_size == 8192
        assert slots < 8192, "ring should stay at its security minimum"
        # every rotation key step fits inside one ciphertext
        assert all(0 < s < slots for s in params.rotations)

    def test_jax_backend_matches_numpy(self):
        from eva_tpu import evaluate
        from eva_tpu.ckks import CKKSCompiler
        from eva_tpu.metric import valuation_mse
        from eva_tpu.runtime import generate_keys
        from random import uniform

        prog = self._program(4096)
        inputs = {name: [uniform(-2, 2) for _ in range(prog.vec_size)]
                  for name in prog.inputs}
        compiled, params, signature = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(prog)
        assert params.poly_modulus_degree // 2 < 4096
        reference = evaluate(prog, inputs)

        public_np, secret = generate_keys(params, backend="numpy")
        enc = public_np.encrypt(inputs, signature)
        out_np = public_np.execute(compiled, enc)

        public_jax = type(public_np)(public_np.ctx, public_np._keys,
                                     params, backend="jax")
        out_jax = public_jax.execute(compiled, enc)

        # bit-identical residue planes between backends
        for name in out_np:
            a, b = out_np[name], out_jax[name]
            for pa, pb in zip(a.polys, b.polys):
                assert np.array_equal(pa, pb), f"backend divergence on {name}"

        dec = secret.decrypt(out_np, signature)
        assert valuation_mse(dec, reference) < 0.01

    def test_plain_and_raw_inputs(self):
        prog = EvaProgram("bigvec_mixed", vec_size=4096)
        with prog:
            x = Input("x")
            p = Input("p", is_encrypted=False)
            Output("z", x * p + (x << 7) + 0.5)
        prog.set_output_ranges(10)
        prog.set_input_scales(20)
        compile_and_check(prog)

    def test_serialization_roundtrip(self):
        from random import uniform
        from eva_tpu.ckks import CKKSCompiler
        from eva_tpu.runtime import generate_keys
        from eva_tpu.serialization import (deserialize_valuation,
                                           serialize_valuation)

        prog = self._program(4096)
        compiled, params, signature = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(prog)
        public_ctx, secret_ctx = generate_keys(params)
        inputs = {name: [uniform(-2, 2) for _ in range(prog.vec_size)]
                  for name in prog.inputs}
        enc = public_ctx.encrypt(inputs, signature)
        msg = serialize_valuation(enc)
        enc2 = deserialize_valuation(msg)
        for name in enc:
            a, b = enc[name], enc2[name]
            for pa, pb in zip(a.polys, b.polys):
                assert pa.shape == pb.shape and np.array_equal(pa, pb)

    def test_seeded_symmetric_encrypt(self):
        from random import uniform
        from eva_tpu import evaluate
        from eva_tpu.ckks import CKKSCompiler
        from eva_tpu.metric import valuation_mse
        from eva_tpu.runtime import generate_keys
        from eva_tpu.serialization import (deserialize_valuation,
                                           serialize_valuation)

        prog = self._program(4096)
        compiled, params, signature = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(prog)
        public_ctx, secret_ctx = generate_keys(params)
        inputs = {name: [uniform(-2, 2) for _ in range(prog.vec_size)]
                  for name in prog.inputs}
        enc = secret_ctx.encrypt(inputs, signature)
        # seeded ciphertexts round-trip through the wire as (c0, seed)
        enc2 = deserialize_valuation(serialize_valuation(enc))
        out = public_ctx.execute(compiled, enc2)
        dec = secret_ctx.decrypt(out, signature)
        assert valuation_mse(dec, evaluate(prog, inputs)) < 0.01

    def test_shard_vectors_off_grows_ring(self):
        prog = self._program(4096)
        _, params, _ = compile_and_check(
            prog, he=False, config={"shard_vectors": "false"})
        assert params.poly_modulus_degree == 2 * 4096
