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
        out = np.empty((len(primes), self.n), dtype=np.uint64)
        uniq = np.unique(shift)
        for qi, q in enumerate(primes):
            res = (mant_i % q).astype(np.uint64)
            for s in uniq:
                s = int(s)
                mult = pow(2, s, q) if s >= 0 else pow(pow(2, -s, q), q - 2, q)
                mask = shift == s
                res[mask] = (res[mask] * np.uint64(mult)) % np.uint64(q)
            out[qi] = res
        return out

    def residues_to_coeffs(self, residues: np.ndarray, primes: List[int]) -> np.ndarray:
        """Exact CRT reconstruction to centered floats.

        Output-level moduli are small (few limbs), so a Python-int CRT per
        coefficient is affordable; this is the accuracy-critical step."""
        n_sub = len(primes)
        Q = 1
        for q in primes:
            Q *= q
        # Garner/CRT multipliers: Q/q_i * (Q/q_i)^-1 mod q_i
        mults = []
        for q in primes:
            Qi = Q // q
            mults.append(Qi * pow(Qi % q, q - 2, q))
        half = Q // 2
        # Vectorized big-int accumulation via object arrays (several times
        # faster than a per-coefficient Python loop at large N).
        acc = np.zeros(self.n, dtype=object)
        for i in range(n_sub):
            acc += residues[i].astype(object) * mults[i]
        acc %= Q
        acc = np.where(acc >= half, acc - Q, acc)
        return acc.astype(np.float64)


@lru_cache(maxsize=None)
def get_encoder(n: int) -> Encoder:
    return Encoder(n)
