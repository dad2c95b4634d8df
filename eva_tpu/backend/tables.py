"""Precomputed device tables for one RNS prime set (one chain level).

Holds per-row modulus constants and Shoup-pair NTT twiddle tables, plus
the vectorized transforms over [n_sub, N] uint32 limb planes. The
butterfly schedule is identical to the host tables (crypto/ntt.py), so
device results are bit-identical to the numpy backend. Twiddle
multiplies use shoup_mul (known-constant operand); data x data
multiplies (dyadic ops) stay Montgomery."""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

import jax.numpy as jnp

from ..crypto.ntt import get_table
from .modmath import add_mod, mont_constants, mont_mul, shoup_mul, sub_mod


class DeviceLevelOps:
    """Vectorized modular/NTT ops for a fixed prime list."""

    def __init__(self, primes: Sequence[int], n: int):
        self.primes = list(primes)
        self.n = n
        n_sub = len(primes)
        self.q = np.array(primes, dtype=np.uint32)[:, None]
        nqinv = np.empty((n_sub, 1), dtype=np.uint32)
        r1 = np.empty((n_sub, 1), dtype=np.uint32)
        r2 = np.empty((n_sub, 1), dtype=np.uint32)
        for i, q in enumerate(primes):
            nqinv[i, 0], r1[i, 0], r2[i, 0] = mont_constants(q)
        self.nqinv = nqinv
        self.r1 = r1  # Montgomery form of 1
        self.r2 = r2  # Montgomery form of R

        tables = [get_table(q, n) for q in primes]
        self.logn = tables[0].logn

        from .modmath import shoup_pair

        def stack_pairs(rows: List[np.ndarray]):
            """Per-row Shoup (w, w') pair for [n_sub, ...] constant planes."""
            w = np.stack(rows)
            ws = np.empty(w.shape, dtype=np.uint32)
            wp = np.empty(w.shape, dtype=np.uint32)
            for i, q in enumerate(primes):
                ws[i], wp[i] = shoup_pair(w[i], q)
            return ws, wp

        # Shoup pair of 1 (per row): reduce(a) = a mod q for any a<2^32.
        self.one = stack_pairs([np.ones(1, dtype=np.uint64)
                                for _ in primes])

        # Harvey merged-psi tables: the negacyclic twist folds into the
        # stage twiddles (mst_f[i] = psi^rev(i)); the inverse merges the
        # untwist, with N^-1 folded into the LAST stage (lo branch gets
        # a dedicated ninv multiply, hi branch's final twiddle is
        # pre-scaled). Eliminates the separate twist/untwist passes.
        from ..crypto.ntt import _bit_reverse_perm
        rev = _bit_reverse_perm(n)
        mf = np.empty((n_sub, n), dtype=np.uint64)
        mi = np.empty((n_sub, n), dtype=np.uint64)
        ninv_v = np.empty((n_sub, 1), dtype=np.uint64)
        for i, q in enumerate(primes):
            t = tables[i]
            psi = t.psi
            psi_inv = pow(psi, q - 2, q)
            n_inv = pow(n, q - 2, q)
            pw = np.ones(n, dtype=np.uint64)
            for k in range(1, n):
                pw[k] = pw[k - 1] * psi % q
            mf[i] = pw[rev]
            ipw = np.ones(n, dtype=np.uint64)
            for k in range(1, n):
                ipw[k] = ipw[k - 1] * psi_inv % q
            mi[i] = ipw[rev]
            mi[i, 1] = mi[i, 1] * n_inv % q  # last-stage hi twiddle
            ninv_v[i, 0] = n_inv
        self.mst_f = stack_pairs(list(mf))
        self.mst_i = stack_pairs(list(mi))
        self.ninv = stack_pairs(list(ninv_v))

    # -- elementwise --------------------------------------------------------

    def add(self, a, b):
        return add_mod(a, b, self.q)

    def sub(self, a, b):
        return sub_mod(a, b, self.q)

    def neg(self, a):
        return jnp.where(a == 0, a, self.q - a)

    def mul_mont(self, a, b_mont):
        """a (standard, may be unreduced) * b (Montgomery form)."""
        return mont_mul(a, b_mont, self.q, self.nqinv)

    def reduce(self, a):
        """a mod q (per row) for any a < 2^32: a Shoup multiply by 1."""
        return shoup_mul(a, self.one[0], self.one[1], self.q)

    def mul(self, a, b):
        """Both operands standard-domain (ct-ct dyadic multiply)."""
        return self.mul_mont(self.mul_mont(a, b), self.r2)

    # -- NTT ----------------------------------------------------------------

    def _fwd_merged(self, x):
        """Harvey merged-psi forward (natural in, bit-reversed out): the
        negacyclic twist lives in the stage twiddles, one constant per
        butterfly block. Requires reduced input. No gathers."""
        lead = x.shape[:-1]
        n = self.n
        q3 = self.q[:, None, :]
        wsf, wpf = self.mst_f
        m, t = 1, n
        while m < n:
            t >>= 1
            ww = wsf[:, m:2 * m][:, :, None]
            wp = wpf[:, m:2 * m][:, :, None]
            xr = x.reshape(*lead, m, 2 * t)
            lo = xr[..., :t]
            hi = shoup_mul(xr[..., t:], ww, wp, q3)
            x = jnp.concatenate(
                (add_mod(lo, hi, q3), sub_mod(lo, hi, q3)),
                axis=-1).reshape(*lead, n)
            m <<= 1
        return x

    def _inv_merged(self, x):
        """Harvey merged-psi^-1 inverse (bit-reversed in, natural out)
        with N^-1 folded into the last stage."""
        lead = x.shape[:-1]
        n = self.n
        q3 = self.q[:, None, :]
        wsi, wpi = self.mst_i
        m, t = n >> 1, 1
        while m >= 1:
            ww = wsi[:, m:2 * m][:, :, None]
            wp = wpi[:, m:2 * m][:, :, None]
            xr = x.reshape(*lead, m, 2 * t)
            lo = xr[..., :t]
            hi = xr[..., t:]
            s = add_mod(lo, hi, q3)
            if m == 1:  # fold N^-1 into the final stage's lo branch
                s = shoup_mul(s, self.ninv[0][:, :, None],
                              self.ninv[1][:, :, None], q3)
            x = jnp.concatenate(
                (s, shoup_mul(sub_mod(lo, hi, q3), ww, wp, q3)),
                axis=-1).reshape(*lead, n)
            m >>= 1
            t <<= 1
        return x

    def _pallas(self):
        """The VMEM-resident four-step Pallas kernel, when eligible (real
        TPU backend, N large enough to tile as [N/128, 128])."""
        import os
        if os.environ.get("EVA_TPU_NO_PALLAS"):
            return None
        import jax
        if jax.default_backend() != "tpu" or self.n < 1024:
            return None
        if not hasattr(self, "_pallas_ntt"):
            from .pallas_ntt import get_pallas_ntt
            self._pallas_ntt = get_pallas_ntt(tuple(self.primes), self.n)
        return self._pallas_ntt

    def tensor_product(self, a0, a1, b0, b1):
        """Ciphertext tensor product (a0,a1)x(b0,b1) -> 3 components.

        Karatsuba over the 2x2 product with a one-time Montgomery
        conversion of the a-side: 5 mont_muls instead of the naive 8
        (each standard-domain product costs 2). The op is
        multiply-limited on TPU (measured 33% of the HBM roofline with
        the naive form), so the mult count is the lever.

        Uses composed XLA ops: a fused Pallas variant was measured
        SLOWER (42k vs 79k ct-mul/s) because XLA's elementwise fusion
        pipelines large fused loops better than a (batch x limb) grid of
        64KB Pallas blocks; the kernel was removed rather than tuned —
        the op is already within ~2x of the HBM roofline and the NTT /
        key-switch dominate real programs."""
        a0m = self.mul_mont(a0, self.r2)  # a0*R mod q (Montgomery form)
        a1m = self.mul_mont(a1, self.r2)
        am_sum = self.add(a0m, a1m)
        b_sum = self.add(b0, b1)
        p0 = self.mul_mont(b0, a0m)       # a0*b0 mod q
        p2 = self.mul_mont(b1, a1m)       # a1*b1 mod q
        pm = self.mul_mont(b_sum, am_sum)  # (a0+a1)(b0+b1) mod q
        return [p0, self.sub(self.sub(pm, p0), p2), p2]

    def ntt(self, a):
        """Coefficient -> evaluation (bit-reversed order). REQUIRES
        reduced planes (a < q per row) — the merged-twist butterflies
        have no reducing first pass; call `reduce()` first for raw
        uint32 planes."""
        p = self._pallas()
        if p is not None:
            return p.ntt(a)
        return self._fwd_merged(a)

    def intt(self, x):
        p = self._pallas()
        if p is not None:
            return p.intt(x)
        return self._inv_merged(x)
