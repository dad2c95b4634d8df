"""32-bit modular arithmetic on JAX arrays.

Primes are < 2^31. Values are uint32. mont_mul(a, b_mont) computes
a * b mod q for any a < 2^32 and b_mont = b * 2^32 mod q < q; the
Montgomery reduction absorbs the reduction of unreduced `a`, which the
NTT twist and key-switch digit broadcasts rely on.

All helpers broadcast per-row constants: q/nqinv/etc. are passed as
[n_sub, 1] uint32 arrays against [n_sub, N] data planes."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

MASK16 = np.uint32(0xFFFF)
R_BITS = 32


def mont_constants(q: int):
    """(nqinv, r1, r2): -q^-1 mod 2^32, R mod q, R^2 mod q."""
    r = 1 << R_BITS
    qinv = pow(q, -1, r)
    nqinv = (r - qinv) % r
    return np.uint32(nqinv), np.uint32(r % q), np.uint32(r * r % q)


def to_mont(x: np.ndarray, q: int) -> np.ndarray:
    """Host-side conversion into Montgomery form (numpy, exact)."""
    return ((x.astype(np.uint64) << np.uint64(32))
            % np.uint64(q)).astype(np.uint32)


def to_mont_rows(arr: np.ndarray, primes) -> np.ndarray:
    """Per-row Montgomery conversion for [n_sub, ...] residue planes."""
    out = np.empty(arr.shape, dtype=np.uint32)
    for i, q in enumerate(primes):
        out[i] = to_mont(arr[i], q)
    return out


def _mul32(a, b):
    """Full 32x32 -> 64-bit product as (hi, lo) uint32 via 16-bit splits."""
    al = a & MASK16
    ah = a >> 16
    bl = b & MASK16
    bh = b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = (ll >> 16) + (lh & MASK16) + (hl & MASK16)
    lo = (mid << 16) | (ll & MASK16)
    hi = hh + (lh >> 16) + (hl >> 16) + (mid >> 16)
    return hi, lo


def mont_mul(a, b_mont, q, nqinv):
    """a * b mod q, with b in Montgomery form. Valid for any a < 2^32."""
    hi, lo = _mul32(a, b_mont)
    m = lo * nqinv  # wrapping
    mq_hi, _ = _mul32(m, q)
    carry = (lo != 0).astype(jnp.uint32)
    u = hi + mq_hi + carry
    return jnp.where(u >= q, u - q, u)


def shoup_pair(w, q: int):
    """Host precompute: (w mod q, floor(w * 2^32 / q)) for shoup_mul."""
    w = np.asarray(w, dtype=np.uint64) % np.uint64(q)
    wp = (w << np.uint64(32)) // np.uint64(q)
    return w.astype(np.uint32), wp.astype(np.uint32)


def shoup_stack(w, q: int) -> np.ndarray:
    """[2, ...] stacked (w, w') Shoup pair table for the constant(s) w."""
    return np.stack(shoup_pair(w, q))


def shoup_mul(a, w, wp, q):
    """a * w mod q for a KNOWN constant w < q, wp = floor(w*2^32/q).
    Valid for any a < 2^32 (the reduction absorbs unreduced inputs).

    Shoup/Harvey precomputed-quotient multiply: qhat = hi32(a*wp)
    underestimates floor(a*w/q) by less than 1 + a/2^32 < 2, so
    r = a*w - qhat*q lies in [0, 2q) and — since 2q < 2^32 — is exact
    in wrapping 32-bit arithmetic; one conditional subtract finishes.
    ~40% fewer VPU ops than mont_mul: one hi-32 product plus two native
    low-32 multiplies replace two full 32x32 split products and their
    carry chains. Used for every multiply-by-table in the NTT kernels;
    data x data multiplies (dyadic ops, key MACs) stay Montgomery."""
    al = a & MASK16
    ah = a >> 16
    wl = wp & MASK16
    wh = wp >> 16
    lh = al * wh
    hl = ah * wl
    mid = ((al * wl) >> 16) + (lh & MASK16) + (hl & MASK16)
    qhat = ah * wh + (lh >> 16) + (hl >> 16) + (mid >> 16)
    r = a * w - qhat * q
    return jnp.where(r >= q, r - q, r)


def add_mod(a, b, q):
    s = a + b
    return jnp.where(s >= q, s - q, s)


def sub_mod(a, b, q):
    return jnp.where(a >= b, a - b, a + q - b)


def neg_mod(a, q):
    return jnp.where(a == 0, a, q - a)
