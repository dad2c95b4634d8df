"""Ciphertext / plaintext value objects for the CKKS runtime.

A ciphertext holds 2 (or 3, pre-relinearization) polynomials as stacked
RNS residue planes of shape [n_subprimes, N] in uint64 (numpy backend) or
uint32 pairs (device backend). Polynomials are NTT(evaluation)-domain
resident between ops. `scale` is the TRUE scale (float), not the
compiler's nominal 2^bits bookkeeping (see crypto/__init__ docstring);
`level` counts dropped abstract chain entries, matching the compiler's
level semantics (reference: eva/seal/seal.cpp:59-62 walks the context
chain the same way)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import numpy as np


@dataclass
class Ciphertext:
    polys: List[np.ndarray]  # each [n_sub, N] uint64, NTT domain
    level: int
    scale: float
    # For seeded (symmetric) ciphertexts: c1 was expanded from this seed,
    # so serialization can ship (c0, seed) at half the size. seed_xof
    # records the wire-format XOF id the seed expands under
    # (crypto/keys.XOF_*).
    seed: bytes = None
    seed_xof: int = None

    @property
    def size(self) -> int:
        return len(self.polys)

    def copy(self) -> "Ciphertext":
        return Ciphertext([p.copy() for p in self.polys], self.level,
                          self.scale, self.seed, self.seed_xof)


@dataclass
class Plaintext:
    poly: np.ndarray  # [n_sub, N] uint64, NTT domain
    level: int
    scale: float
    # Optional key-prime (special-modulus) NTT planes [n_key, N] of the
    # SAME integer coefficient polynomial, used by the rotation-sum
    # baby-step fusion: multiplying a deferred (pre-P-division)
    # key-switch accumulator by this plaintext needs its residues in the
    # extended basis Q_l + P. Transient — never serialized (the wire
    # format carries only `poly`; ext regenerates from the raw values).
    ext: np.ndarray = None
