"""CKKS context: RNS chain, NTT tables, automorphism permutations, and the
polynomial-level primitive operations shared by keygen and the evaluator.

Replaces seal::SEALContext + the RNS tool parts of seal::Evaluator
(reference surface: SURVEY.md §2.8). Per-level parameters are views over
the flat sub-prime list; levels drop whole abstract entries from the end
of the data chain, exactly like SEAL's context chain walks
first_context_data -> next_context_data (eva/seal/seal.cpp:59-62)."""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Sequence

import numpy as np

from .encoder import get_encoder
from .ntt import get_table
from .primes import ChainEntry, build_chain


class CKKSContext:
    def __init__(self, prime_bits: Sequence[int], rotations: Sequence[int],
                 poly_modulus_degree: int, key_terms: int = 1):
        """key_terms: how many trailing chain entries form the
        key-switch special modulus P (product of their primes). The
        reference/SEAL convention is 1; the compiler's two_entry_ks
        option selects 2 (P ~ 2^120) so hybrid digits can pack twice
        the sub-primes — half the digit count on deep chains."""
        self.n = int(poly_modulus_degree)
        self.prime_bits = list(prime_bits)
        self.rotations = sorted(rotations)
        self.key_terms = int(key_terms)
        assert 1 <= self.key_terms <= len(self.prime_bits)
        self.chain: List[ChainEntry] = build_chain(self.prime_bits, self.n)
        self.key_entries = self.chain[-self.key_terms:]
        self.data_entries = self.chain[:-self.key_terms]
        self.data_primes: List[int] = [q for e in self.data_entries for q in e.primes]
        self.key_primes: List[int] = [q for e in self.key_entries
                                      for q in e.primes]
        self.key_product: int = 1
        for q in self.key_primes:
            self.key_product *= q
        self.all_primes: List[int] = self.data_primes + self.key_primes
        self.encoder = get_encoder(self.n)
        self._perm_cache: Dict[int, np.ndarray] = {}

    # -- level bookkeeping ---------------------------------------------------

    def entries_at_level(self, level: int) -> List[ChainEntry]:
        assert 0 <= level < len(self.data_entries) + 1
        return self.data_entries[:len(self.data_entries) - level]

    def primes_at_level(self, level: int) -> List[int]:
        return [q for e in self.entries_at_level(level) for q in e.primes]

    # -- hybrid key-switch decomposition (grouped RNS digits) ----------------
    # Digit j covers `alpha` consecutive data sub-primes; the key embeds the
    # level-independent full-basis gadget P * Qhat_j * [Qhat_j^-1 mod Q_j].
    # At a given level only the alive prefix of each group participates:
    # D_j is CRT-composed from the alive sub-group, which still satisfies
    # D_j == x (mod q_i) for every alive q_i in the group — the only
    # congruences the gadget identity needs. alpha=1 degenerates to the
    # per-sub-prime scheme (inv = conv = 1). Reference counterpart: SEAL
    # switch-key decomposition (seal_executor.h:114-215 call sites); the
    # grouping generalization follows the standard "hybrid/dnum" design.

    def ks_groups(self, alpha: int) -> List[List[int]]:
        """Full-basis group index lists, packed greedily up to `alpha`
        consecutive sub-primes per group WHILE the group product stays at
        or below the special modulus P: the key-switch rounding term
        scales with Q_j/P, so a group exceeding P would blow up noise
        (the P-division only suppresses digits up to ~P). With P one
        60-bit entry and 31-bit sub-primes this packs 60-bit rescale
        entries pairwise and leaves small singles alone."""
        # One bit of slack: P and a same-bit-width group product differ by
        # the prime-pair lattice error (~2^-9..2^-19 relative), so a strict
        # <= P test would reject the standard 60-bit-entry pairing. A group
        # up to 2P keeps the rounding term within ~2x of the P-sized ideal.
        P2 = 2 * self.key_product
        groups: List[List[int]] = []
        cur: List[int] = []
        prod = 1
        for t, q in enumerate(self.data_primes):
            if cur and (len(cur) >= alpha or prod * q > P2):
                groups.append(cur)
                cur, prod = [], 1
            cur.append(t)
            prod *= q
        if cur:
            groups.append(cur)
        return groups

    @lru_cache(maxsize=None)
    def ks_tables(self, level: int, alpha: int):
        """Per-level fast-base-extension constants.

        Returns (groups, inv, conv):
          groups: list of alive-index lists (prefix of ks_groups, clipped)
          inv[t]  = [(Qg_t / q_t)^-1 mod q_t]          (uint64, [n_cur])
          conv[t][i] = (Qg_t / q_t) mod basis[i]       (uint64, [n_cur, n_ext])
        where Qg_t is the product of ALIVE primes in t's group and basis is
        data-primes-at-level + key primes. Digit j, coefficient-wise:
          D_j mod basis[i] = sum_{t in group_j} (d_t * inv[t] mod q_t) * conv[t][i]
        """
        primes = self.primes_at_level(level)
        basis = primes + self.key_primes
        n_cur = len(primes)
        groups = [[t for t in g if t < n_cur]
                  for g in self.ks_groups(alpha)]
        groups = [g for g in groups if g]
        inv = np.ones(n_cur, dtype=np.uint64)
        conv = np.ones((n_cur, len(basis)), dtype=np.uint64)
        for g in groups:
            qg = 1
            for t in g:
                qg *= primes[t]
            for t in g:
                qhat = qg // primes[t]
                inv[t] = pow(qhat % primes[t], -1, primes[t])
                for i, q in enumerate(basis):
                    conv[t, i] = qhat % q
        return groups, inv, conv

    # -- NTT over stacked limbs ----------------------------------------------

    def ntt(self, arr: np.ndarray, primes: Sequence[int]) -> np.ndarray:
        """arr: [..., n_sub, N]; leading dims (shards/batch) broadcast."""
        out = np.empty_like(arr)
        for i, q in enumerate(primes):
            out[..., i, :] = get_table(q, self.n).ntt(arr[..., i, :])
        return out

    def intt(self, arr: np.ndarray, primes: Sequence[int]) -> np.ndarray:
        out = np.empty_like(arr)
        for i, q in enumerate(primes):
            out[..., i, :] = get_table(q, self.n).intt(arr[..., i, :])
        return out

    # -- dyadic modular arithmetic over stacked limbs ------------------------
    # numpy uint64 `%` lowers to hardware division (slow); the native C++
    # kernels use __int128 Barrett-free mulmod and branchless add/sub.

    @staticmethod
    def qvec(primes: Sequence[int]) -> np.ndarray:
        return np.array(primes, dtype=np.uint64)[:, None]

    @staticmethod
    def _native():
        from ..native import get_lib
        return get_lib()

    def _native_dyadic(self, fn_name, a, b, primes):
        if a.shape[-1] < 2048:
            return None  # ctypes round-trips beat numpy only on large rows
        lib = self._native()
        if lib is None or a.shape != b.shape:
            return None
        from ..native import as_u64p
        # Put the prime axis (-2) in front so each prime's rows are one
        # contiguous block (leading shard/batch dims are preserved).
        a = np.ascontiguousarray(np.moveaxis(a, -2, 0), dtype=np.uint64)
        b = np.ascontiguousarray(np.moveaxis(b, -2, 0), dtype=np.uint64)
        out = np.empty_like(a)
        fn = getattr(lib, fn_name)
        af = a.reshape(len(primes), -1)
        bf = b.reshape(len(primes), -1)
        of = out.reshape(len(primes), -1)
        for i, q in enumerate(primes):
            fn(as_u64p(af[i]), as_u64p(bf[i]), as_u64p(of[i]),
               af.shape[1], q)
        return np.ascontiguousarray(np.moveaxis(out, 0, -2))

    def add(self, a, b, primes):
        out = self._native_dyadic("dyadic_add", a, b, primes)
        if out is not None:
            return out
        return (a + b) % self.qvec(primes)

    def sub(self, a, b, primes):
        out = self._native_dyadic("dyadic_sub", a, b, primes)
        if out is not None:
            return out
        q = self.qvec(primes)
        return (a + q - b) % q

    def mul(self, a, b, primes):
        out = self._native_dyadic("dyadic_mul", a, b, primes)
        if out is not None:
            return out
        return (a * b) % self.qvec(primes)

    def neg(self, a, primes):
        q = self.qvec(primes)
        return (q - a) % q

    # -- Galois automorphisms ------------------------------------------------

    def galois_elt(self, step: int) -> int:
        """Galois element for a left-rotation by `step` slots: 5^step mod 2N."""
        order = self.n // 2
        return pow(5, step % order, 2 * self.n)

    def perm_for_elt(self, g: int) -> np.ndarray:
        """NTT-domain permutation: out[j] = in[perm[j]] applies X -> X^g.

        In natural evaluation order the automorphism maps index t to
        pi(t) = ((2t+1)g mod 2N - 1)/2; the stored domain is bit-reversed
        (ntt.py), so the permutation is conjugated by the bit reversal."""
        if g not in self._perm_cache:
            from .ntt import _bit_reverse_perm
            two_n = 2 * self.n
            rev = _bit_reverse_perm(self.n)
            t = np.arange(self.n, dtype=np.int64)
            pi = (((2 * t + 1) * g) % two_n - 1) // 2
            self._perm_cache[g] = rev[pi[rev]]
        return self._perm_cache[g]

    def apply_automorphism(self, arr: np.ndarray, g: int) -> np.ndarray:
        """Permute NTT-domain limb planes [..., n_sub, N]."""
        return arr[..., self.perm_for_elt(g)]

    # -- RNS rescale (exact divide-and-round by one sub-prime) ---------------

    def divide_by_subprime(self, coeffs: np.ndarray, primes: List[int]) -> np.ndarray:
        """Drop the last limb and divide by its prime with rounding.

        coeffs: [..., n_sub, N] COEFFICIENT domain. Returns [..., n_sub-1, N].
        y_i = (x_i - centered([x]_p)) * p^-1 mod q_i."""
        p = primes[-1]
        rest = primes[:-1]
        last = coeffs[..., -1, :].astype(np.int64)
        centered = np.where(last > p // 2, last - p, last)  # int64, |.| <= p/2
        out = np.empty(coeffs.shape[:-2] + (len(rest), self.n),
                       dtype=np.uint64)
        for i, q in enumerate(rest):
            p_inv = pow(p % q, q - 2, q)
            diff = (coeffs[..., i, :].astype(np.int64) - centered) % q
            out[..., i, :] = (diff.astype(np.uint64)
                              * np.uint64(p_inv)) % np.uint64(q)
        return out

    def rescale_entry(self, coeffs: np.ndarray, level: int) -> np.ndarray:
        """Divide coefficient-domain residues by the last entry at `level`."""
        primes = self.primes_at_level(level)
        entry = self.entries_at_level(level)[-1]
        for _ in entry.primes:
            coeffs = self.divide_by_subprime(coeffs, primes)
            primes = primes[:-1]
        return coeffs


@lru_cache(maxsize=8)
def get_context(prime_bits: tuple, rotations: tuple, degree: int,
                key_terms: int = 1) -> CKKSContext:
    return CKKSContext(list(prime_bits), list(rotations), degree, key_terms)
