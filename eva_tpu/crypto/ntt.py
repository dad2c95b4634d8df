"""Negacyclic number-theoretic transforms mod machine-word primes.

All ciphertext polynomials live in the evaluation (NTT) domain between
ops, like SEAL keeps them, and — also like SEAL's Harvey butterflies —
the evaluation domain is stored in BIT-REVERSED order: the forward
transform is Gentleman-Sande decimation-in-frequency (natural
coefficients in, bit-reversed evaluations out) and the inverse is
Cooley-Tukey decimation-in-time (bit-reversed in, natural out). No data
permutation is ever applied, which keeps the hot path free of gathers on
TPU. Semantics: ntt(m)[j] = m(psi^(2*rev(j)+1)) where rev is the
log2(n)-bit reversal and psi a fixed primitive 2n-th root mod q.

Pointwise ciphertext ops are ordering-agnostic; the Galois automorphism
permutations are conjugated by rev (context.py) and the float encoder
works in the coefficient domain, so slot semantics stay consistent.

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

        # Per-stage twiddles, indexed by stage size m = 2^s: for the block
        # starting at b*m, butterfly i uses omega^(i * n/m). The same table
        # serves GS-DIF (forward, stages from m=n down to 2) and CT-DIT
        # (inverse, stages from m=2 up to n) with inverted roots.
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

        # Packed tables + Shoup constants for the native (C++) kernels:
        # stage with block size m sits at offset m/2 - 1, length m/2.
        def pack(stages):
            return np.concatenate(stages)

        def shoup(arr):
            return np.array([(int(w) << 64) // q for w in arr],
                            dtype=np.uint64)

        self.packed_w = pack(self.stage_w)
        self.packed_w_inv = pack(self.stage_w_inv)
        self.packed_w_shoup = shoup(self.packed_w)
        self.packed_w_inv_shoup = shoup(self.packed_w_inv)
        self.twist_shoup = shoup(self.twist)
        self.untwist_shoup = shoup(self.untwist)

    # -- cyclic DFT core (no data permutations) ------------------------------

    def _dif_forward(self, a: np.ndarray) -> np.ndarray:
        """Gentleman-Sande: natural in, bit-reversed out."""
        q = np.uint64(self.q)
        lead = a.shape[:-1]
        x = a.astype(np.uint64)
        for s in range(self.logn, 0, -1):
            m = 1 << s
            half = m >> 1
            w = self.stage_w[s - 1]
            x = x.reshape(*lead, self.n >> s, m)
            lo = x[..., :half]
            hi = x[..., half:]
            x = np.concatenate(
                ((lo + hi) % q, ((lo + q - hi) * w) % q),
                axis=-1).reshape(*lead, self.n)
        return x

    def _dit_inverse(self, a: np.ndarray) -> np.ndarray:
        """Cooley-Tukey: bit-reversed in, natural out."""
        q = np.uint64(self.q)
        lead = a.shape[:-1]
        x = a.astype(np.uint64)
        for s in range(1, self.logn + 1):
            m = 1 << s
            half = m >> 1
            w = self.stage_w_inv[s - 1]
            x = x.reshape(*lead, self.n >> s, m)
            lo = x[..., :half]
            hi = (x[..., half:] * w) % q
            x = np.concatenate(((lo + hi) % q, (lo + q - hi) % q),
                               axis=-1).reshape(*lead, self.n)
        return x

    # -- public negacyclic transforms ---------------------------------------

    def _native(self):
        from ..native import get_lib
        return get_lib()

    def ntt(self, a: np.ndarray) -> np.ndarray:
        """Coefficient -> evaluation domain (bit-reversed evaluation order).
        a: [..., n] uint64 residues."""
        lib = self._native()
        if lib is not None:
            from ..native import as_u64p
            out = np.array(a, dtype=np.uint64, order="C")
            flat = out.reshape(-1, self.n)
            lib.ntt_forward(as_u64p(flat), flat.shape[0], self.n, self.q,
                            as_u64p(self.twist), as_u64p(self.twist_shoup),
                            as_u64p(self.packed_w), as_u64p(self.packed_w_shoup))
            return out
        q = np.uint64(self.q)
        return self._dif_forward((a.astype(np.uint64) * self.twist) % q)

    def intt(self, x: np.ndarray) -> np.ndarray:
        """Evaluation (bit-reversed order) -> coefficient domain."""
        lib = self._native()
        if lib is not None:
            from ..native import as_u64p
            out = np.array(x, dtype=np.uint64, order="C")
            flat = out.reshape(-1, self.n)
            lib.ntt_inverse(as_u64p(flat), flat.shape[0], self.n, self.q,
                            as_u64p(self.untwist), as_u64p(self.untwist_shoup),
                            as_u64p(self.packed_w_inv),
                            as_u64p(self.packed_w_inv_shoup))
            return out
        q = np.uint64(self.q)
        return (self._dit_inverse(x) * self.untwist) % q


@lru_cache(maxsize=None)
def get_table(q: int, n: int) -> NTTTable:
    return NTTTable(q, n)
