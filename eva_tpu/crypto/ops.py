"""Homomorphic evaluator operations on ciphertexts (numpy backend).

The op set mirrors what the reference's executor invokes on
seal::Evaluator (reference eva/seal/seal_executor.h:114-215): add,
add_plain, sub, sub_plain, multiply, square, multiply_plain,
rotate_vector, negate, relinearize, mod_switch_to_next, rescale_to_next.

Scale semantics: TRUE scales are tracked (floats) — rescale divides the
scale by the actual prime product dropped, not by 2^bits. This removes
the systematic drift SEAL's forced-scale bookkeeping leaves in
(seal_executor.h:209-215) while keeping the compiler's integer model."""

from __future__ import annotations

from typing import List

import numpy as np

from .ciphertext import Ciphertext, Plaintext
from .context import CKKSContext
from .keys import KeySet, KSwitchKey


def _check_align(a: Ciphertext, b) -> None:
    assert a.level == b.level, f"level mismatch {a.level} vs {b.level}"


def add(ctx: CKKSContext, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    _check_align(a, b)
    primes = ctx.primes_at_level(a.level)
    n = max(a.size, b.size)
    polys = []
    for i in range(n):
        if i < a.size and i < b.size:
            polys.append(ctx.add(a.polys[i], b.polys[i], primes))
        else:
            polys.append((a.polys[i] if i < a.size else b.polys[i]).copy())
    return Ciphertext(polys, a.level, a.scale)


def sub(ctx: CKKSContext, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    _check_align(a, b)
    primes = ctx.primes_at_level(a.level)
    n = max(a.size, b.size)
    polys = []
    for i in range(n):
        if i < a.size and i < b.size:
            polys.append(ctx.sub(a.polys[i], b.polys[i], primes))
        elif i < a.size:
            polys.append(a.polys[i].copy())
        else:
            polys.append(ctx.neg(b.polys[i], primes))
    return Ciphertext(polys, a.level, a.scale)


def add_plain(ctx: CKKSContext, a: Ciphertext, p: Plaintext) -> Ciphertext:
    _check_align(a, p)
    primes = ctx.primes_at_level(a.level)
    polys = [ctx.add(a.polys[0], p.poly, primes)] + [c.copy() for c in a.polys[1:]]
    return Ciphertext(polys, a.level, a.scale)


def sub_plain(ctx: CKKSContext, a: Ciphertext, p: Plaintext) -> Ciphertext:
    _check_align(a, p)
    primes = ctx.primes_at_level(a.level)
    polys = [ctx.sub(a.polys[0], p.poly, primes)] + [c.copy() for c in a.polys[1:]]
    return Ciphertext(polys, a.level, a.scale)


def negate(ctx: CKKSContext, a: Ciphertext) -> Ciphertext:
    primes = ctx.primes_at_level(a.level)
    return Ciphertext([ctx.neg(c, primes) for c in a.polys], a.level, a.scale)


def multiply(ctx: CKKSContext, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    """Tensor product: (a0,a1) x (b0,b1) -> (a0b0, a0b1+a1b0, a1b1)."""
    _check_align(a, b)
    assert a.size == 2 and b.size == 2, "relinearize before further multiplies"
    primes = ctx.primes_at_level(a.level)
    c0 = ctx.mul(a.polys[0], b.polys[0], primes)
    mid = ctx.add(ctx.mul(a.polys[0], b.polys[1], primes),
                  ctx.mul(a.polys[1], b.polys[0], primes), primes)
    c2 = ctx.mul(a.polys[1], b.polys[1], primes)
    return Ciphertext([c0, mid, c2], a.level, a.scale * b.scale)


def square(ctx: CKKSContext, a: Ciphertext) -> Ciphertext:
    return multiply(ctx, a, a)


def multiply_plain(ctx: CKKSContext, a: Ciphertext, p: Plaintext) -> Ciphertext:
    _check_align(a, p)
    primes = ctx.primes_at_level(a.level)
    polys = [ctx.mul(c, p.poly, primes) for c in a.polys]
    return Ciphertext(polys, a.level, a.scale * p.scale)


# -- key switching -----------------------------------------------------------


def _ks_digits_from_coeffs(ctx: CKKSContext, coeffs: np.ndarray, level: int,
                           alpha: int = 1):
    """Digits from a COEFFICIENT-domain polynomial (fusion entry point).

    Hybrid decomposition: digit j is CRT-composed from its group's alive
    sub-primes via fast base extension,
      D_j mod q_i = sum_{t in group_j} (d_t * inv_t mod q_t) * conv[t][i],
    with constants from ctx.ks_tables. alpha=1 degenerates to the raw
    row re-broadcast (inv = conv = 1)."""
    primes = ctx.primes_at_level(level)
    basis = primes + ctx.key_primes
    groups, inv, conv = ctx.ks_tables(level, alpha)
    digits = []
    for group in groups:
        # y_t < q_t; products y_t * conv < 2^62, sums of <=alpha terms
        # stay below 2^64 for alpha <= 4.
        ys = [(coeffs[..., t, :] * inv[t]) % np.uint64(primes[t])
              for t in group]
        d = np.empty(coeffs.shape[:-2] + (len(basis), ctx.n),
                     dtype=np.uint64)
        for i, q in enumerate(basis):
            acc = ys[0] * conv[group[0], i]
            for k in range(1, len(group)):
                acc = acc + ys[k] * conv[group[k], i]
            d[..., i, :] = acc % np.uint64(q)
        digits.append(ctx.ntt(d, basis))
    return digits


def _ks_digits(ctx: CKKSContext, poly_ntt: np.ndarray, level: int,
               alpha: int = 1):
    """Grouped gadget digits, NTT'd in the extended basis — the dominant
    key-switch cost. Hoisted rotations share this across all rotations of
    one source ciphertext."""
    return _ks_digits_from_coeffs(
        ctx, ctx.intt(poly_ntt, ctx.primes_at_level(level)), level, alpha)


def _ks_mac(ctx: CKKSContext, digits, level: int, ksk: KSwitchKey,
            perm=None):
    """Inner product of (optionally automorphism-permuted) digits with a
    key-switch key: the pre-division extended-basis accumulators."""
    primes = ctx.primes_at_level(level)
    n_cur = len(primes)
    basis = primes + ctx.key_primes
    acc0 = np.zeros(digits[0].shape, dtype=np.uint64)
    acc1 = np.zeros(digits[0].shape, dtype=np.uint64)
    key_rows = [len(ctx.data_primes) + i for i in range(len(ctx.key_primes))]
    row_idx = list(range(n_cur)) + key_rows
    for j, d_ntt in enumerate(digits):
        if perm is not None:
            d_ntt = d_ntt[..., perm]
        k0 = ksk.k0[j][row_idx]
        k1 = ksk.k1[j][row_idx]
        acc0 = ctx.add(acc0, ctx.mul(d_ntt, k0, basis), basis)
        acc1 = ctx.add(acc1, ctx.mul(d_ntt, k1, basis), basis)
    return acc0, acc1


def ks_div(ctx: CKKSContext, acc: np.ndarray, level: int,
           coeff_out=False) -> np.ndarray:
    """Division of an extended-basis key-switch accumulator by the
    special modulus P (key sub-primes dropped one at a time with
    divide-and-round)."""
    primes = ctx.primes_at_level(level)
    basis = primes + ctx.key_primes
    coeffs_ext = ctx.intt(acc, basis)
    prim = list(basis)
    for _ in ctx.key_primes:
        coeffs_ext = ctx.divide_by_subprime(coeffs_ext, prim)
        prim = prim[:-1]
    return coeffs_ext if coeff_out else ctx.ntt(coeffs_ext, primes)


def _ks_apply(ctx: CKKSContext, digits, level: int, ksk: KSwitchKey,
              perm=None, coeff_out=False):
    """MAC + P-division (see _ks_mac / ks_div)."""
    acc0, acc1 = _ks_mac(ctx, digits, level, ksk, perm=perm)
    return (ks_div(ctx, acc0, level, coeff_out),
            ks_div(ctx, acc1, level, coeff_out))


def _key_switch(ctx: CKKSContext, poly_ntt: np.ndarray, level: int,
                ksk: KSwitchKey):
    """Switch one NTT-domain polynomial to the secret key the ksk targets.
    Returns (d0, d1): NTT-domain [n_cur, N] planes to add to the ciphertext."""
    return _ks_apply(ctx, _ks_digits(ctx, poly_ntt, level, ksk.alpha),
                     level, ksk)


def relinearize(ctx: CKKSContext, keys: KeySet, a: Ciphertext) -> Ciphertext:
    if a.size == 2:
        return a.copy()
    assert a.size == 3
    primes = ctx.primes_at_level(a.level)
    d0, d1 = _key_switch(ctx, a.polys[2], a.level, keys.relin)
    return Ciphertext([
        ctx.add(a.polys[0], d0, primes),
        ctx.add(a.polys[1], d1, primes),
    ], a.level, a.scale)


def rotate(ctx: CKKSContext, keys: KeySet, a: Ciphertext, steps: int,
           hoisted_digits=None) -> Ciphertext:
    """Rotate slots left by `steps` (negative: right).

    Decompose-then-permute (hoisting order): the digit decomposition of c1
    commutes with the automorphism up to multiples of q_j that annihilate
    against the gadget factors mod Q, so permuting shared digit NTTs is
    semantically exact and lets n rotations of one ciphertext reuse one
    decomposition (pass `hoisted_digits` from hoist_digits())."""
    assert a.size == 2, "relinearize before rotating"
    if a.polys[0].ndim == 3:
        return _rotate_sharded(ctx, keys, a, steps, hoisted_digits)
    if steps % (ctx.n // 2) == 0:
        return a.copy()
    g = ctx.galois_elt(steps)
    assert g in keys.galois, f"no galois key for step {steps} (elt {g})"
    primes = ctx.primes_at_level(a.level)
    c0 = ctx.apply_automorphism(a.polys[0], g)
    if hoisted_digits is not None:
        perm = ctx.perm_for_elt(g)
        d0, d1 = _ks_apply(ctx, hoisted_digits, a.level, keys.galois[g],
                           perm=perm)
    else:
        # Permute-first: applying the automorphism to the 1 input row
        # costs ~n_digits*n_ext/n_cur times less than permuting the digit
        # stack (gathers dominate on TPU; mirrored in the jax backend).
        c1 = ctx.apply_automorphism(a.polys[1], g)
        digits = _ks_digits(ctx, c1, a.level, keys.ks_alpha)
        d0, d1 = _ks_apply(ctx, digits, a.level, keys.galois[g])
    return Ciphertext([ctx.add(c0, d0, primes), d1], a.level, a.scale)


def rotate_acc(ctx: CKKSContext, keys: KeySet, a: Ciphertext, steps: int,
               hoisted_digits=None):
    """Rotation in DEFERRED-division form: (c0_part, acc0, acc1) where
    c0_part = sigma(c0) (data basis) and acc0/acc1 are the pre-division
    extended-basis key-switch accumulators of sigma applied to c1.

    Enables rotation-sum epilogue fusion: accumulators of several
    rotations that are directly summed are added exactly (modular adds
    commute bitwise) and pay ONE P-division. ks_div(acc) then yields
    d0/d1 such that [c0_part + d0, d1] equals the eager rotate() UP TO
    the division rounding, which is strictly smaller for a fused sum
    (one rounding instead of k). Caller gates: size-2, single-shard,
    non-identity steps."""
    assert a.size == 2 and a.polys[0].ndim == 2
    g = ctx.galois_elt(steps)
    assert g in keys.galois, f"no galois key for step {steps} (elt {g})"
    c0 = ctx.apply_automorphism(a.polys[0], g)
    if hoisted_digits is not None:
        # Permute the shared digit stack (hoisting order); equal to the
        # jax backend's inverse-permuted-key + permuted-output form.
        perm = ctx.perm_for_elt(g)
        acc0, acc1 = _ks_mac(ctx, hoisted_digits, a.level, keys.galois[g],
                             perm=perm)
    else:
        c1 = ctx.apply_automorphism(a.polys[1], g)
        digits = _ks_digits(ctx, c1, a.level, keys.ks_alpha)
        acc0, acc1 = _ks_mac(ctx, digits, a.level, keys.galois[g])
    return c0, acc0, acc1


def _rotate_sharded(ctx: CKKSContext, keys: KeySet, a: Ciphertext,
                    steps: int, hoisted_digits=None) -> Ciphertext:
    """Rotate a sharded big-vector ciphertext (strided layout; see
    crypto/bigvec): roll the shard axis by c, then intra-rotate the first
    k-c shards by `lo` and the rest by `hi` — exact, mask-free, at most
    two Galois keys per logical rotation. Per-shard values are computed
    with the same single-shard kernels the jax backend vectorizes, so
    backends stay bit-identical."""
    from .bigvec import rotation_plan

    k = a.polys[0].shape[0]
    slots = ctx.n // 2
    if steps % (k * slots) == 0:
        return a.copy()
    c, lo, hi = rotation_plan(steps, k, slots)
    out0 = np.empty_like(a.polys[0])
    out1 = np.empty_like(a.polys[1])
    for j in range(k):
        src = (j + c) % k
        amt = hi if j >= k - c else lo
        if amt == 0:
            out0[j] = a.polys[0][src]
            out1[j] = a.polys[1][src]
            continue
        shard = Ciphertext([a.polys[0][src], a.polys[1][src]],
                           a.level, a.scale)
        hd = (None if hoisted_digits is None
              else [d[src] for d in hoisted_digits])
        r = rotate(ctx, keys, shard, amt, hoisted_digits=hd)
        out0[j], out1[j] = r.polys
    return Ciphertext([out0, out1], a.level, a.scale)


def rescale_relinearize(ctx: CKKSContext, keys: KeySet,
                        a: Ciphertext) -> Ciphertext:
    """Fused Rescale -> Relinearize (the adjacency lazy policies emit:
    relinearization deferred past the cheaper lower level).

    Keeps everything in the coefficient domain between the two steps:
    the rescaled c2 feeds digit decomposition directly and the
    key-switch correction is added before the single final NTT - exactly
    equal to the unfused sequence (NTT is linear and exact) while
    skipping ~4 * n_new limb transforms."""
    primes = ctx.primes_at_level(a.level)
    entry = ctx.entries_at_level(a.level)[-1]
    new_level = a.level + 1
    new_primes = primes[:len(primes) - len(entry.primes)]
    # Rescale all components in the coefficient domain.
    coeffs = []
    for c in a.polys:
        x = ctx.intt(c, primes)
        x = ctx.rescale_entry(x, a.level)
        coeffs.append(x)
    new_scale = a.scale / entry.product
    if a.size == 2:
        return Ciphertext([ctx.ntt(c, new_primes) for c in coeffs],
                          new_level, new_scale)
    digits = _ks_digits_from_coeffs(ctx, coeffs[2], new_level,
                                    keys.ks_alpha)
    d0, d1 = _ks_apply(ctx, digits, new_level, keys.relin, coeff_out=True)
    qv = ctx.qvec(new_primes)
    c0 = ctx.ntt(ctx.add(coeffs[0], d0, new_primes), new_primes)
    c1 = ctx.ntt(ctx.add(coeffs[1], d1, new_primes), new_primes)
    return Ciphertext([c0, c1], new_level, new_scale)


def relinearize_rescale(ctx: CKKSContext, keys: KeySet,
                        a: Ciphertext) -> Ciphertext:
    """Fused Relinearize -> Rescale (the adjacency eager relinearization
    emits). Key-switch output stays in the coefficient domain, is added
    to the iNTT'd c0/c1, and one rescale division + NTT lands at the new
    level - bit-identical to the unfused pair."""
    primes = ctx.primes_at_level(a.level)
    entry = ctx.entries_at_level(a.level)[-1]
    new_primes = primes[:len(primes) - len(entry.primes)]
    new_scale = a.scale / entry.product
    coeffs0 = ctx.intt(a.polys[0], primes)
    coeffs1 = ctx.intt(a.polys[1], primes)
    if a.size == 3:
        digits = _ks_digits(ctx, a.polys[2], a.level, keys.ks_alpha)
        d0, d1 = _ks_apply(ctx, digits, a.level, keys.relin, coeff_out=True)
        coeffs0 = ctx.add(coeffs0, d0, primes)
        coeffs1 = ctx.add(coeffs1, d1, primes)
    c0 = ctx.ntt(ctx.rescale_entry(coeffs0, a.level), new_primes)
    c1 = ctx.ntt(ctx.rescale_entry(coeffs1, a.level), new_primes)
    return Ciphertext([c0, c1], a.level + 1, new_scale)


def hoist_digits(ctx: CKKSContext, a: Ciphertext, alpha: int = 1):
    """Precompute the rotation digit decomposition of a ciphertext for
    reuse across multiple rotate() calls. `alpha` must match the key
    set's decomposition group size (KeySet.ks_alpha)."""
    return _ks_digits(ctx, a.polys[1], a.level, alpha)


# -- level changes ------------------------------------------------------------


def rescale(ctx: CKKSContext, a: Ciphertext) -> Ciphertext:
    """Drop the last abstract entry, dividing values by its prime product."""
    primes = ctx.primes_at_level(a.level)
    entry = ctx.entries_at_level(a.level)[-1]
    new_primes = primes[:len(primes) - len(entry.primes)]
    polys = []
    for c in a.polys:
        coeffs = ctx.intt(c, primes)
        coeffs = ctx.rescale_entry(coeffs, a.level)
        polys.append(ctx.ntt(coeffs, new_primes))
    return Ciphertext(polys, a.level + 1, a.scale / entry.product)


def mod_switch(ctx: CKKSContext, a: Ciphertext) -> Ciphertext:
    """Drop the last abstract entry without scaling (valid because the
    decryption relation reduces modulo any divisor of Q)."""
    primes = ctx.primes_at_level(a.level)
    entry = ctx.entries_at_level(a.level)[-1]
    keep = len(primes) - len(entry.primes)
    return Ciphertext([c[..., :keep, :].copy() for c in a.polys],
                      a.level + 1, a.scale)


def mod_switch_plain(ctx: CKKSContext, p: Plaintext) -> Plaintext:
    primes = ctx.primes_at_level(p.level)
    entry = ctx.entries_at_level(p.level)[-1]
    keep = len(primes) - len(entry.primes)
    return Plaintext(p.poly[..., :keep, :].copy(), p.level + 1, p.scale)
