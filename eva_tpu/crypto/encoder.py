"""Canonical-embedding CKKS encoder/decoder (host-side, float64 FFT).

Replaces seal::CKKSEncoder (reference call sites eva/seal/seal.cpp:26,68-81
and seal_executor.h:229-242). Encode/decode are client-role operations in
the EVA protocol, so they run on host; only ciphertext ops run on device.

Slot j corresponds to evaluation of the message polynomial at
zeta^(5^j mod 2N), zeta = exp(i*pi/N), which maps to NTT evaluation index
t_j = ((5^j mod 2N)-1)/2 (ntt.py uses the same exponent ordering).
Rotation by r slots is the Galois automorphism X -> X^(5^r)."""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence

import numpy as np


class Encoder:
    def __init__(self, n: int):
        self.n = n
        self.slots = n // 2
        two_n = 2 * n
        # t_idx[j]: NTT evaluation index of slot j; conjugate at n-1-t.
        pow5 = 1
        t_idx = np.empty(self.slots, dtype=np.int64)
        for j in range(self.slots):
            t_idx[j] = (pow5 - 1) // 2
            pow5 = pow5 * 5 % two_n
        self.t_idx = t_idx
        k = np.arange(n)
        self.twist = np.exp(1j * np.pi * k / n)  # zeta^k

    # -- float <-> coefficient vector ---------------------------------------

    def values_to_coeffs(self, values: Sequence[float], scale: float) -> np.ndarray:
        """Real slot values -> real polynomial coefficients (unrounded)."""
        z = np.asarray(values, dtype=np.float64)
        assert len(z) == self.slots
        F = np.zeros(self.n, dtype=np.complex128)
        F[self.t_idx] = z * scale
        F[self.n - 1 - self.t_idx] = np.conj(F[self.t_idx])
        m_twisted = np.fft.fft(F) / self.n
        return np.real(m_twisted * np.conj(self.twist))

    def coeffs_to_values(self, coeffs: np.ndarray, scale: float) -> np.ndarray:
        """Real polynomial coefficients -> real slot values."""
        X = self.n * np.fft.ifft(coeffs * self.twist)
        return np.real(X[self.t_idx]) / scale

    # -- exact residue conversion -------------------------------------------

    def coeffs_to_residues(self, coeffs: np.ndarray, primes: List[int]) -> np.ndarray:
        """Round real coefficients and reduce exactly into each RNS prime.

        Coefficients can exceed 2^63, so we go through frexp: the float
        m = mant*2^e is held exactly as (mant*2^53) * 2^(e-53), both parts
        reduced with modular pow-of-two multipliers."""
        m = np.rint(coeffs)
        mant, exp = np.frexp(m)
        mant_i = np.rint(mant * (1 << 53)).astype(np.int64)
        shift = (exp - 53).astype(np.int64)  # value = mant_i * 2^shift
        smin, smax = int(shift.min()), int(shift.max())
        sidx = (shift - smin).astype(np.int64)
        out = np.empty((len(primes), self.n), dtype=np.uint64)
        for qi, q in enumerate(primes):
            # 2^s mod q for every occurring shift, one table lookup per
            # coefficient; products fit uint64 (both factors < 2^31).
            inv2 = (q + 1) // 2  # 2^-1 mod q (q odd)
            base = pow(2, smin, q) if smin >= 0 else pow(inv2, -smin, q)
            tab = np.empty(smax - smin + 1, dtype=np.uint64)
            acc = base
            for s in range(smax - smin + 1):
                tab[s] = acc
                acc = acc * 2 % q
            res = (mant_i % q).astype(np.uint64)
            out[qi] = res * tab[sidx] % np.uint64(q)
        return out

    def residues_to_coeffs(self, residues: np.ndarray, primes: List[int]) -> np.ndarray:
        """Exact CRT reconstruction to centered floats via Garner's
        mixed-radix conversion — pure uint64 vector ops (sub-primes are
        < 2^31, so every product fits a word), no big-int arithmetic.

        Accuracy: the mixed-radix digits are exact; centering is decided
        by an exact lexicographic compare against Q/2's digits, and for
        high values the digits of Q - x are computed exactly before the
        float64 Horner fold, so the float result carries the TOP 53 bits
        of the (small) centered value — never a catastrophic cancellation
        of two ~Q-sized floats."""
        n_sub = len(primes)
        lib = _garner_lib() if n_sub <= 64 else None
        if lib is not None:
            from ..native import as_u64p
            import ctypes
            prim_arr, inv_arr, invs_arr, half_arr = _garner_tables(
                tuple(primes))
            res = np.ascontiguousarray(residues, dtype=np.uint64)
            out = np.empty(self.n, dtype=np.float64)
            lib.garner_decode(
                as_u64p(res), n_sub, self.n, as_u64p(prim_arr),
                as_u64p(inv_arr), as_u64p(invs_arr), as_u64p(half_arr),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
            return out
        qs = [np.uint64(q) for q in primes]
        # Garner digits: v_i = (...((r_i - v_0) q_0^-1 - v_1) q_1^-1 ...)
        # mod q_i; x = v_0 + v_1 q_0 + v_2 q_0 q_1 + ...
        inv = [[None] * n_sub for _ in range(n_sub)]
        for i in range(1, n_sub):
            for j in range(i):
                inv[i][j] = np.uint64(pow(primes[j] % primes[i], -1, primes[i]))
        v = [residues[0] % qs[0]]
        for i in range(1, n_sub):
            q = qs[i]
            t = residues[i] % q
            for j in range(i):
                t = ((t + q - v[j] % q) * inv[i][j]) % q
            v.append(t)
        digits = np.stack(v)  # [n_sub, N], digit i < q_i

        # Exact centering (x negative iff x >= floor(Q/2), matching the
        # previous big-int implementation): lexicographic compare, most-
        # significant digit first, against the mixed-radix digits of
        # floor(Q/2) (digit i of h is (h // prod_{j<i} q_j) % q_i).
        Q = 1
        for q in primes:
            Q *= q
        t_half = Q // 2
        half_digits = []
        for q in primes:
            half_digits.append(t_half % q)
            t_half //= q
        high = np.zeros(self.n, dtype=bool)
        decided = np.zeros(self.n, dtype=bool)
        for i in range(n_sub - 1, -1, -1):
            d = digits[i]
            hd = np.uint64(half_digits[i])
            high |= (~decided) & (d > hd)
            decided |= d != hd
        high |= ~decided  # x == floor(Q/2) exactly -> high

        # For high coefficients, replace digits with those of Q - x
        # (positive, small): w_i = (q_i - 1) - v_i, then +1 with carry.
        w = np.empty_like(digits)
        for i in range(n_sub):
            w[i] = (qs[i] - np.uint64(1)) - digits[i]
        carry = np.ones(self.n, dtype=np.uint64)
        for i in range(n_sub):
            s = w[i] + carry
            carry = (s == qs[i]).astype(np.uint64)
            w[i] = np.where(carry.astype(bool), np.uint64(0), s)

        # Horner fold to float64 on the SMALL representation.
        mag_low = np.zeros(self.n, dtype=np.float64)
        mag_high = np.zeros(self.n, dtype=np.float64)
        for i in range(n_sub - 1, -1, -1):
            qf = float(primes[i])
            mag_low = mag_low * qf + digits[i].astype(np.float64)
            mag_high = mag_high * qf + w[i].astype(np.float64)
        return np.where(high, -mag_high, mag_low)


def _garner_lib():
    """The native library when it exposes garner_decode, else None."""
    try:
        from ..native import get_lib
        lib = get_lib()
        return lib if lib is not None and hasattr(lib, "garner_decode") \
            else None
    except Exception:
        return None


@lru_cache(maxsize=None)
def _garner_tables(primes):
    """(primes, inv, inv_shoup, half_digits) uint64 arrays for
    garner_decode. inv[i*n+j] = (q_j mod q_i)^-1 mod q_i (with 64-bit
    Shoup constants); half_digits = mixed-radix digits of floor(Q/2)."""
    n_sub = len(primes)
    prim = np.array(primes, dtype=np.uint64)
    inv = np.zeros((n_sub, n_sub), dtype=np.uint64)
    inv_shoup = np.zeros((n_sub, n_sub), dtype=np.uint64)
    for i in range(1, n_sub):
        for j in range(i):
            w = pow(primes[j] % primes[i], -1, primes[i])
            inv[i, j] = w
            inv_shoup[i, j] = (w << 64) // primes[i]
    Q = 1
    for q in primes:
        Q *= q
    t_half = Q // 2
    half = np.empty(n_sub, dtype=np.uint64)
    for i, q in enumerate(primes):
        half[i] = t_half % q
        t_half //= q
    return (prim, np.ascontiguousarray(inv),
            np.ascontiguousarray(inv_shoup), half)


@lru_cache(maxsize=None)
def get_encoder(n: int) -> Encoder:
    return Encoder(n)
