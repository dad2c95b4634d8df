"""Negacyclic number-theoretic transforms mod machine-word primes.

All ciphertext polynomials live in the evaluation (NTT) domain between
ops, like SEAL keeps them. Layout: the transform of m yields
X[t] = m(psi^(2t+1)) in natural t order, where psi is a fixed primitive
2N-th root mod q. This exponent indexing is shared with the float
canonical-embedding encoder (encoder.py) and the Galois automorphism
permutations (context.py), so slot semantics stay consistent end to end.

numpy backend: q < 2^31 so uint64 products never overflow; mulmod is a
single (a*b) % q. (The JAX/Pallas backend re-implements these kernels
with 32-bit Montgomery lanes; see eva_tpu/backend.)"""

from __future__ import annotations

from functools import lru_cache
from typing import List

import numpy as np


def _find_primitive_2n_root(q: int, n: int) -> int:
    """Primitive 2n-th root of unity mod q (requires 2n | q-1)."""
    order = 2 * n
    assert (q - 1) % order == 0
    cofactor = (q - 1) // order
    for g in range(2, 10000):
        root = pow(g, cofactor, q)
        if pow(root, n, q) == q - 1:  # order exactly 2n
            return root
    raise RuntimeError(f"No primitive 2n-th root mod {q}")


def _bit_reverse_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    perm = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((perm >> b) & 1) << (bits - 1 - b)
    return rev


class NTTTable:
    """Precomputed tables for size-n negacyclic NTT mod q."""

    def __init__(self, q: int, n: int):
        self.q = q
        self.n = n
        self.logn = n.bit_length() - 1
        psi = _find_primitive_2n_root(q, n)
        self.psi = psi
        omega = psi * psi % q

        k = np.arange(n, dtype=object)
        # Twist factors psi^k and inverse (merged scaling by n^-1).
        psi_pows = [1] * n
        for i in range(1, n):
            psi_pows[i] = psi_pows[i - 1] * psi % q
        self.twist = np.array(psi_pows, dtype=np.uint64)
        psi_inv = pow(psi, q - 2, q)
        n_inv = pow(n, q - 2, q)
        inv_pows = [n_inv] * n
        for i in range(1, n):
            inv_pows[i] = inv_pows[i - 1] * psi_inv % q
        self.untwist = np.array(inv_pows, dtype=np.uint64)

        self.bitrev = _bit_reverse_perm(n)

        # Per-stage twiddles for iterative DIT (natural-order output).
        self.stage_w: List[np.ndarray] = []
        self.stage_w_inv: List[np.ndarray] = []
        omega_inv = pow(omega, q - 2, q)
        for s in range(1, self.logn + 1):
            m = 1 << s
            wm = pow(omega, n // m, q)
            wmi = pow(omega_inv, n // m, q)
            w = [1] * (m // 2)
            wi = [1] * (m // 2)
            for i in range(1, m // 2):
                w[i] = w[i - 1] * wm % q
                wi[i] = wi[i - 1] * wmi % q
            self.stage_w.append(np.array(w, dtype=np.uint64))
            self.stage_w_inv.append(np.array(wi, dtype=np.uint64))

    # -- cyclic DFT core ----------------------------------------------------

    def _dft(self, a: np.ndarray, inverse: bool) -> np.ndarray:
        q = np.uint64(self.q)
        lead = a.shape[:-1]
        x = a[..., self.bitrev].astype(np.uint64)
        for s in range(1, self.logn + 1):
            m = 1 << s
            half = m >> 1
            w = (self.stage_w_inv if inverse else self.stage_w)[s - 1]
            x = x.reshape(*lead, self.n >> s, m)
            lo = x[..., :half]
            hi = (x[..., half:] * w) % q
            x = np.concatenate(((lo + hi) % q, (lo + q - hi) % q),
                               axis=-1).reshape(*lead, self.n)
        return x

    # -- public negacyclic transforms ---------------------------------------

    def ntt(self, a: np.ndarray) -> np.ndarray:
        """Coefficient -> evaluation domain. a: [..., n] uint64 residues."""
        q = np.uint64(self.q)
        return self._dft((a.astype(np.uint64) * self.twist) % q, inverse=False)

    def intt(self, x: np.ndarray) -> np.ndarray:
        """Evaluation -> coefficient domain."""
        q = np.uint64(self.q)
        return (self._dft(x, inverse=True) * self.untwist) % q


@lru_cache(maxsize=None)
def get_table(q: int, n: int) -> NTTTable:
    return NTTTable(q, n)
