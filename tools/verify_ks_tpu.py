"""Verify the fused Pallas key-switch kernels on real TPU.

Checks bit-parity of backend/pallas_ks.py against the structured XLA
path for every (alpha, level, out_ntt) combination at production size
(N=16384), then at a small ring (N=2048, partial last digit group).
The interpret-mode CPU tests (tests/test_crypto.py, --runslow) cover
the same matrix without hardware; this script is the fast on-device
check. Exits nonzero on any mismatch."""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root

import numpy as np
import jax
import jax.numpy as jnp

from eva_tpu.crypto.context import CKKSContext, get_context
from eva_tpu.crypto import keys as K
from eva_tpu.backend.executor_jax import JaxProgram, device_keys, level_ops


def check(ctx, alpha, level, out_ntt, seed=11):
    ks = K.generate_keys(ctx, alpha=alpha)
    jp = JaxProgram.__new__(JaxProgram)
    jp.ctx, jp.keys = ctx, ks
    jp.dkeys = device_keys(ctx, ks)
    rng = np.random.default_rng(seed)
    primes = ctx.primes_at_level(level)
    poly = np.stack([rng.integers(0, q, ctx.n, dtype=np.uint64)
                     for q in primes]).astype(np.uint32)
    poly_j = jnp.asarray(poly[None])
    dev = level_ops(primes, ctx.n)
    coeffs = dev.intt(poly_j)

    # Reference: the pure-XLA structured path (the epilogue inside
    # _ks_apply also takes the fused Pallas kernel when _fused_ks_ok,
    # so force it off for an independent oracle).
    import os
    os.environ["EVA_TPU_NO_FUSED_KS"] = "1"
    try:
        ref0, ref1 = jp._ks_apply(
            jp._ks_digits(poly_j, level), level,
            jp.dkeys.layout(ks.relin, level), coeff_out=not out_ntt)
    finally:
        os.environ.pop("EVA_TPU_NO_FUSED_KS", None)
    got0, got1 = jp._ks_fused_coeffs(coeffs, level, ks.relin,
                                     out_ntt=out_ntt)
    # The structured path WITH the fused epilogue (hoisted-rotation form).
    mid0, mid1 = jp._ks_apply(
        jp._ks_digits(poly_j, level), level,
        jp.dkeys.layout(ks.relin, level), coeff_out=not out_ntt)
    ok_mid = (np.array_equal(np.asarray(ref0), np.asarray(mid0))
              and np.array_equal(np.asarray(ref1), np.asarray(mid1)))
    if not ok_mid:
        print(f"  n={ctx.n} alpha={alpha} level={level} out_ntt={out_ntt}: "
              f"EPILOGUE MISMATCH", flush=True)
        return False
    ok = (np.array_equal(np.asarray(ref0), np.asarray(got0))
          and np.array_equal(np.asarray(ref1), np.asarray(got1)))
    print(f"  n={ctx.n} alpha={alpha} level={level} out_ntt={out_ntt}: "
          f"{'OK' if ok else 'MISMATCH'}", flush=True)
    return ok


def check_hoisted_rotation(ctx, seed=17):
    """Hoisted permute-after rotation (layout_rot: MAC unpermuted digits
    against the inverse-permuted key, automorph the outputs) vs the
    permute-first form (permute digit planes, MAC plain key) — must be
    bit-identical on device for every Galois key."""
    from eva_tpu.backend.executor_jax import dev_perm
    ks = K.generate_keys(ctx)
    jp = JaxProgram.__new__(JaxProgram)
    jp.ctx, jp.keys, jp.k = ctx, ks, 1
    jp.dkeys = device_keys(ctx, ks)
    rng = np.random.default_rng(seed)
    level = 0
    primes = ctx.primes_at_level(level)
    dev = level_ops(primes, ctx.n)
    poly = np.stack([rng.integers(0, q, ctx.n, dtype=np.uint64)
                     for q in primes]).astype(np.uint32)
    poly_j = jnp.asarray(poly[None])
    digits = jp._ks_digits(poly_j, level)
    ok = True
    for steps in ctx.rotations:
        g = ctx.galois_elt(steps)
        aperm = dev_perm(ctx, g)
        # permute-first oracle: permute every digit row, plain key
        perm_digits = type(digits)(
            aperm(digits.own),
            None if digits.a is None else aperm(digits.a),
            aperm(digits.b), digits.n_groups)
        ref0, ref1 = jp._ks_apply(perm_digits, level,
                                  jp.dkeys.layout(ks.galois[g], level))
        # permute-after (production path)
        d0, d1 = jp._ks_apply(digits, level,
                              jp.dkeys.layout_rot(ks.galois[g], level, g))
        got0, got1 = aperm(d0), aperm(d1)
        good = (np.array_equal(np.asarray(ref0), np.asarray(got0))
                and np.array_equal(np.asarray(ref1), np.asarray(got1)))
        print(f"  n={ctx.n} hoisted steps={steps}: "
              f"{'OK' if good else 'MISMATCH'}", flush=True)
        ok &= good
    return ok


def check_dev_perm(ctx, seed=13):
    """DevPerm (MXU one-hot int8-matmul automorphism) vs the plain
    jnp.take gather, on device, for rotation elements in both directions
    and the conjugation element 2N-1."""
    from eva_tpu.backend.executor_jax import DevPerm
    rng = np.random.default_rng(seed)
    arr = jnp.asarray(rng.integers(0, 2 ** 32, (6, ctx.n),
                                   dtype=np.uint64).astype(np.uint32))
    ok = True
    for g in (ctx.galois_elt(1), ctx.galois_elt(-1), ctx.galois_elt(64),
              ctx.galois_elt(-417), 2 * ctx.n - 1):
        perm = ctx.perm_for_elt(g)
        dp = DevPerm(perm)
        want = np.asarray(jnp.take(arr, jnp.asarray(perm), axis=-1))
        got = np.asarray(dp(arr))
        good = dp.mxu and np.array_equal(got, want)
        print(f"  n={ctx.n} devperm g={g} mxu={dp.mxu}: "
              f"{'OK' if good else 'MISMATCH'}", flush=True)
        ok &= good
    return ok


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    ok = True
    big = get_context(tuple([60] * 6 + [60]), (1,), 16384)
    small = CKKSContext([60, 30, 60, 60], [1, -2, 4], 2048)
    for ctx in (big, small):
        ok &= check_dev_perm(ctx)
        ok &= check_hoisted_rotation(ctx)
        for alpha in (1, 2):
            for level in (0, 1):
                for out_ntt in (True, False):
                    ok &= check(ctx, alpha, level, out_ntt)
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
