"""MXU-based NTT: the four-step transform with sub-DFTs as int8-digit
matrix multiplies on the systolic array.

The VPU butterfly NTT (pallas_ntt.py) is compute-bound at ~30 uint32 ops
per modmul. Here each size-128 sub-DFT is a literal matmul by the DFT
matrix V[r,k] = omega^(rev(r)*k): operands decompose into signed-safe
7-bit digits, the MXU computes all digit cross-products with exact int32
accumulation (127*127*128 = 2.1M per term << 2^31), and digit groups
recombine with Montgomery multiplies by 2^(7s) mod q. Bit-exact with the
host/Pallas transforms and emits the same global bit-reversed ordering
(matmul by the rev-ordered DFT matrix IS the DIF output order).

Enable with EVA_TPU_MXU_NTT=1 (experimental; measured numbers in
ARCHITECTURE.md)."""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..crypto.ntt import _bit_reverse_perm, get_table
from .modmath import add_mod, mont_constants, mont_mul

DIGIT_BITS = 7
N_DIGITS = 5  # 5 * 7 = 35 >= 31 bits
MASK = (1 << DIGIT_BITS) - 1


def _digits_of(arr: np.ndarray) -> np.ndarray:
    """[..., m, k] uint -> [N_DIGITS, ..., m, k] int8 (digits 0..127)."""
    return np.stack([((arr >> (DIGIT_BITS * d)) & MASK).astype(np.int8)
                     for d in range(N_DIGITS)])


class MxuNTTTables:
    def __init__(self, primes: List[int], n: int):
        self.primes = list(primes)
        self.n = n
        self.n1 = n // 128
        self.n2 = 128
        n1, n2 = self.n1, self.n2
        n_sub = len(primes)
        rev1 = _bit_reverse_perm(n1)
        rev2 = _bit_reverse_perm(n2)

        q32 = np.array(primes, dtype=np.uint32)[:, None, None]
        self.q = q32
        nqinv = np.empty((n_sub, 1, 1), dtype=np.uint32)
        for i, q in enumerate(primes):
            nqinv[i, 0, 0], _, _ = mont_constants(q)
        self.nqinv = nqinv

        # Montgomery-form powers 2^(7s) for digit recombination.
        n_groups = 2 * N_DIGITS - 1
        pw = np.empty((n_groups, n_sub, 1, 1), dtype=np.uint32)
        for s in range(n_groups):
            for i, q in enumerate(primes):
                pw[s, i, 0, 0] = (pow(2, DIGIT_BITS * s, q) << 32) % q
        self.pow_mont = pw

        def dft_matrix(sub_n, rev):
            out = np.empty((n_sub, sub_n, sub_n), dtype=np.uint64)
            for li, q in enumerate(primes):
                t = get_table(q, n)
                omega = pow(t.psi, 2, q)
                w = pow(omega, n // sub_n, q)
                for r in range(sub_n):
                    base = pow(w, int(rev[r]), q)
                    acc = 1
                    for k in range(sub_n):
                        out[li, r, k] = acc
                        acc = acc * base % q
            return out

        # Digit-decomposed DFT matrices: [N_DIGITS, n_sub, m, m] int8.
        self.V1d = _digits_of(dft_matrix(n1, rev1))
        self.V2d = _digits_of(dft_matrix(n2, rev2))

        def mont_plane(vals_fn):
            out = np.empty((n_sub, n1, n2), dtype=np.uint32)
            for li, q in enumerate(primes):
                v = vals_fn(li, q)
                out[li] = ((v.astype(np.uint64) << np.uint64(32))
                           % np.uint64(q)).astype(np.uint32)
            return out

        # Negacyclic twist psi^k reshaped [n1, n2]; correction twiddle
        # omega^(c * rev1(r)).
        self.twist = mont_plane(
            lambda li, q: get_table(q, n).twist.reshape(n1, n2))

        def corr(li, q):
            t = get_table(q, n)
            omega = pow(t.psi, 2, q)
            out = np.empty((n1, n2), dtype=np.uint64)
            for r in range(n1):
                base = pow(omega, int(rev1[r]), q)
                acc = 1
                for c in range(n2):
                    out[r, c] = acc
                    acc = acc * base % q
            return out

        self.corr = mont_plane(corr)


def _digit_matmul_mod(Vd: np.ndarray, x, q, nqinv, pow_mont):
    """Exact (V @ x) mod q per limb via MXU digit cross-products.

    Vd: [N_DIGITS, n_sub, m, m] int8 (static). x: [..., n_sub, m, c]
    uint32 (< q). Returns [..., n_sub, m, c] uint32.

    Leading (batch) dims are flattened into the matmul free dimension so
    each limb runs ONE [m, m] @ [m, batch*c] multiply per digit pair —
    128-wide contractions with a large free dim keep the systolic array
    fed instead of issuing thousands of 128^3 matmuls."""
    lead = x.shape[:-3]
    n_sub, m, c = x.shape[-3:]
    if lead:
        # [..., n_sub, m, c] -> [n_sub, m, prod(lead)*c]
        n_lead = len(lead)
        xt = jnp.moveaxis(x, (-3, -2), (0, 1))  # [n_sub, m, lead..., c]
        xt = xt.reshape(n_sub, m, -1)
    else:
        xt = x
    xd = [((xt >> (DIGIT_BITS * d)) & MASK).astype(jnp.int8)
          for d in range(N_DIGITS)]
    n_groups = 2 * N_DIGITS - 1
    groups = [None] * n_groups
    for d1 in range(N_DIGITS):
        V = Vd[d1]
        for d2 in range(N_DIGITS):
            # Per-limb int8 matmul with exact int32 accumulation (MXU).
            P = jax.lax.dot_general(
                V, xd[d2],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)  # [n_sub, m, X]
            s = d1 + d2
            groups[s] = P if groups[s] is None else groups[s] + P
        # group sums stay < N_DIGITS * 127*127*m <= 2^26 for m<=256
    acc = None
    for s in range(n_groups):
        # q/nqinv/pow_mont are [n_sub, 1, 1]: broadcast over [n_sub, m, X].
        term = mont_mul(groups[s].astype(jnp.uint32), pow_mont[s], q, nqinv)
        acc = term if acc is None else add_mod(acc, term, q)
    if lead:
        acc = acc.reshape(n_sub, m, *lead, c)
        acc = jnp.moveaxis(acc, (0, 1), (-3, -2))
    return acc


class MxuNTT:
    """Forward negacyclic NTT over [..., n_sub, N] planes via MXU."""

    def __init__(self, primes: List[int], n: int):
        self.t = MxuNTTTables(primes, n)

    def ntt(self, x):
        t = self.t
        n1, n2 = t.n1, t.n2
        lead = x.shape[:-2]
        n_sub = x.shape[-2]
        xr = x.reshape(*lead, n_sub, n1, n2)
        # Reduce unreduced input + negacyclic twist (Montgomery).
        xr = mont_mul(xr, t.twist, t.q, t.nqinv)
        # Column sub-DFT over n1 (bit-reversed order by construction).
        xr = _digit_matmul_mod(t.V1d, xr, t.q, t.nqinv, t.pow_mont)
        # Correction twiddle.
        xr = mont_mul(xr, t.corr, t.q, t.nqinv)
        # Second sub-DFT over n2: transpose, matmul, transpose back.
        xr = jnp.swapaxes(xr, -1, -2)
        xr = _digit_matmul_mod(t.V2d, xr, t.q, t.nqinv, t.pow_mont)
        xr = jnp.swapaxes(xr, -1, -2)
        return xr.reshape(*lead, n_sub, t.n)


@lru_cache(maxsize=None)
def get_mxu_ntt(primes: Tuple[int, ...], n: int) -> MxuNTT:
    return MxuNTT(list(primes), n)
