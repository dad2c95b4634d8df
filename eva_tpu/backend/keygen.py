"""Device-batched key-switching-key generation.

The host keygen loop (crypto/keys.py:_make_kswitch_key) pays per-digit
NTTs of the error polynomials and three dyadic passes over [n_all, N]
uint64 planes — seconds of host time for rotation-heavy key sets at
N=16384 (reference analog: seal::KeyGenerator::create_galois_keys, one
key-switch key per rotation step; reference eva/seal/seal.cpp:186-196).
This engine keeps ALL randomness host-sampled (CSPRNG seeds and the
numpy error stream, drawn in exactly the host order) and batches only
the deterministic arithmetic

    b_j = fac_j * target - a_j * s + NTT(e_j)   over the full basis

across digits in one jitted device call, so key material is
byte-identical to the host path given the same randomness. Works on the
CPU XLA backend too (same exact modular kernels)."""

from __future__ import annotations

from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from .executor_jax import level_ops


class DeviceKeygen:
    """`ksk_compute` engine consumed by crypto/keys._make_kswitch_key."""

    def __init__(self, ctx):
        self.ctx = ctx
        dev = level_ops(ctx.all_primes, ctx.n)
        self.dev = dev
        q = dev.q  # [n_all, 1] uint32

        def _compute(A, E, fac, target, s_rows):
            # E: [G, 1, N] signed errors; residue per basis prime row.
            e_res = jnp.where(E < 0, q.astype(jnp.int64) + E,
                              E).astype(jnp.uint32)
            e_ntt = dev.ntt(e_res)                  # [G, n_all, N]
            ft = dev.mul(fac, target)               # fac_j * target
            As = dev.mul(A, s_rows)                 # a_j * s
            return dev.add(dev.sub(ft, As), e_ntt)

        self._compute = jax.jit(_compute)

    def ksk_compute(self, s_rows: np.ndarray, target_ntt: np.ndarray,
                    As: List[np.ndarray], Es: List[np.ndarray],
                    facs: np.ndarray):
        """Batched b_j for all digits; returns (k0, k1) lists of
        [n_all, N] uint64 planes matching the host layout."""
        G = len(As)
        A = np.stack(As).astype(np.uint32)
        E = np.stack(Es).astype(np.int64)[:, None, :]  # [G, 1, N]
        fac = facs.astype(np.uint32)[:, :, None]       # [G, n_all, 1]
        b = self._compute(jnp.asarray(A), jnp.asarray(E), jnp.asarray(fac),
                          jnp.asarray(target_ntt.astype(np.uint32)),
                          jnp.asarray(s_rows.astype(np.uint32)))
        b_host = np.asarray(b).astype(np.uint64)
        return ([b_host[j] for j in range(G)],
                [As[j].astype(np.uint64) for j in range(G)])
