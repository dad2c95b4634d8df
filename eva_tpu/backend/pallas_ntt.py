"""Pallas TPU kernel for the negacyclic NTT: four-step decomposition,
fully VMEM-resident.

The XLA stage-by-stage NTT materializes every butterfly stage to HBM
(~30x off the bandwidth roofline). This kernel views each polynomial as
an [N1, N2] matrix (N2 = lanes = 128), runs the column sub-DFT with
row-sliced butterflies, applies the correction twiddle, transposes in
VMEM, runs the second column sub-DFT, and transposes back — one HBM read
and one write per polynomial.

Ordering identity: with both sub-DFTs in decimation-in-frequency form
(no reordering), transpose-DFT-transpose produces exactly the GLOBAL
bit-reversed evaluation order j = rev(k) that the host tables
(crypto/ntt.py) and the XLA path emit, because
rev(k1 + N1*k2) = rev_N1(k1)*N2 + rev_N2(k2). Keys, ciphertexts, and
automorphism permutations therefore interoperate unchanged, and results
are bit-identical across all three implementations.

Every multiply in the transform is data x known-constant, so all tables
are Shoup (w, w') pairs and butterflies use shoup_mul — ~40% fewer VPU
ops per multiply than the Montgomery form (backend/modmath.py), with
identical (exact) results."""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..crypto.ntt import NTTTable, _bit_reverse_perm, get_table
from .modmath import add_mod, shoup_mul, shoup_stack, sub_mod

LANES = 128


class PallasNTTTables:
    """Precomputed per-limb Shoup-pair tables for the four-step kernel.

    Each table carries a leading pair axis after the limb axis:
    tab[limb, 0] = w (plain constants), tab[limb, 1] = floor(w*2^32/q)."""

    def __init__(self, primes: List[int], n: int):
        assert n % LANES == 0 and n // LANES >= 2
        self.primes = list(primes)
        self.n = n
        self.n1 = n // LANES
        self.n2 = LANES
        n1, n2 = self.n1, self.n2
        n_sub = len(primes)

        q_arr = np.array(primes, dtype=np.uint32)
        self.q = q_arr
        nqinv = np.empty(n_sub, dtype=np.uint32)
        for i, q in enumerate(primes):
            r = 1 << 32
            nqinv[i] = (r - pow(q, -1, r)) % r
        self.nqinv = nqinv

        rev1 = _bit_reverse_perm(n1)

        # Per-limb Shoup pair tables: [n_sub, 2, ...].
        tw_fwd = np.empty((n_sub, 2, n1, n2), dtype=np.uint32)   # twist
        tw_inv = np.empty((n_sub, 2, n1, n2), dtype=np.uint32)   # untwist
        corr_fwd = np.empty((n_sub, 2, n1, n2), dtype=np.uint32)  # w^(n2*rev1(r))
        corr_inv = np.empty((n_sub, 2, n2, n1), dtype=np.uint32)  # w^(-n2*rev1(c))
        # Packed DIF/DIT stage twiddles for sub-DFT sizes n1 and n2:
        # stage with half-block h occupies [h-1, 2h-1).
        st1_f = np.empty((n_sub, 2, n1), dtype=np.uint32)
        st1_i = np.empty((n_sub, 2, n1), dtype=np.uint32)
        st2_f = np.empty((n_sub, 2, n2), dtype=np.uint32)
        st2_i = np.empty((n_sub, 2, n2), dtype=np.uint32)
        # Harvey merged-psi tables for the n1 sub-transform: the
        # negacyclic twist psi^(n2*r) folds into the stage twiddles
        # (root_powers[i] = psi1^rev(i)), eliminating the separate twist
        # multiply pass; the psi^c lane factor folds into corr (see
        # mcorr_*). mst1_f drives _sub_ct_merged (natural in, bit-rev
        # out); mst1_i drives _sub_gs_merged (bit-rev in, natural out,
        # unscaled — N^-1 lives in mcorr_inv).
        mst1_f = np.empty((n_sub, 2, n1), dtype=np.uint32)
        mst1_i = np.empty((n_sub, 2, n1), dtype=np.uint32)
        rp_all, ip_all = [], []
        pk2f_all, pk2i_all = [], []
        mcorr_f = np.empty((n_sub, 2, n1, n2), dtype=np.uint32)
        mcorr_i = np.empty((n_sub, 2, n2, n1), dtype=np.uint32)

        for li, q in enumerate(primes):
            t = get_table(q, n)
            psi = t.psi
            omega = psi * psi % q
            omega_inv = pow(omega, q - 2, q)

            # Reuse the host tables' twist/untwist (untwist has n^-1 merged).
            tw_fwd[li] = shoup_stack(t.twist.reshape(n1, n2), q)
            tw_inv[li] = shoup_stack(t.untwist.reshape(n1, n2), q)

            # Correction twiddles.
            w_n2k1 = np.empty((n1, n2), dtype=np.uint64)
            for r in range(n1):
                k1 = int(rev1[r])
                base = pow(omega, k1, q)
                row = np.empty(n2, dtype=np.uint64)
                acc = 1
                for c in range(n2):
                    row[c] = acc
                    acc = acc * base % q
                w_n2k1[r] = row
            corr_fwd[li] = shoup_stack(w_n2k1, q)

            w_inv_n2k1 = np.empty((n2, n1), dtype=np.uint64)
            base_inv_tab = [pow(omega_inv, int(rev1[c]), q) for c in range(n1)]
            for c in range(n1):
                acc = 1
                col = np.empty(n2, dtype=np.uint64)
                for r in range(n2):
                    col[r] = acc
                    acc = acc * base_inv_tab[c] % q
                w_inv_n2k1[:, c] = col
            corr_inv[li] = shoup_stack(w_inv_n2k1, q)

            # Stage twiddles for cyclic sub-DFTs of size sub_n with root
            # omega^(n/sub_n): the stage with half-block h uses powers of
            # omega^(n/(2h)), packed at offset h-1.
            def packed(sub_n, root):
                out = np.zeros(sub_n, dtype=np.uint64)
                root_sub = pow(root, n // sub_n, q)
                h = 1
                while h < sub_n:
                    wm = pow(root_sub, sub_n // (2 * h), q)
                    acc = 1
                    for i in range(h):
                        out[h - 1 + i] = acc
                        acc = acc * wm % q
                    h <<= 1
                return out

            st1_f[li] = shoup_stack(packed(n1, omega), q)
            st1_i[li] = shoup_stack(packed(n1, omega_inv), q)
            pk2_f = packed(n2, omega)
            pk2_i = packed(n2, omega_inv)
            st2_f[li] = shoup_stack(pk2_f, q)
            st2_i[li] = shoup_stack(pk2_i, q)
            pk2f_all.append(pk2_f)
            pk2i_all.append(pk2_i)

            # Merged-psi tables. psi1 = psi^n2 is a primitive 2*n1-th
            # root of -1 for the size-n1 negacyclic sub-transform.
            psi1 = pow(psi, n2, q)
            psi1_inv = pow(psi1, q - 2, q)
            rp = np.array([pow(psi1, int(rev1[i]), q) for i in range(n1)],
                          dtype=np.uint64)
            ip = np.array([pow(psi1_inv, int(rev1[i]), q)
                           for i in range(n1)], dtype=np.uint64)
            mst1_f[li] = shoup_stack(rp, q)
            mst1_i[li] = shoup_stack(ip, q)
            rp_all.append(rp)
            ip_all.append(ip)
            # corr' = corr * psi^c (forward); corr_inv' = corr_inv *
            # psi^-c * N^-1 (inverse; c is the lane index = axis 0 of
            # the [n2, n1] layout corr_inv applies in).
            psi_c = np.array([pow(psi, c, q) for c in range(n2)],
                             dtype=np.uint64)
            mcorr_f[li] = shoup_stack(w_n2k1 * psi_c[None, :] % q, q)
            psi_inv = pow(psi, q - 2, q)
            n_inv = pow(n, q - 2, q)
            psi_ci = np.array([pow(psi_inv, c, q) * n_inv % q
                               for c in range(n2)], dtype=np.uint64)
            mcorr_i[li] = shoup_stack(w_inv_n2k1 * psi_ci[:, None] % q, q)

        self.tw_fwd = tw_fwd
        self.tw_inv = tw_inv
        self.corr_fwd = corr_fwd
        self.corr_inv = corr_inv
        self.st1_f, self.st1_i = st1_f, st1_i
        self.st2_f, self.st2_i = st2_f, st2_i
        self.mst1_f, self.mst1_i = mst1_f, mst1_i
        self.mcorr_f, self.mcorr_i = mcorr_f, mcorr_i

        # Per-STAGE merged twiddles, pre-expanded to [n_sub, 2, m, t, 1]
        # so the in-kernel multiply broadcasts along LANES ONLY. Mosaic
        # cannot lower a (1,1)->(t,lanes) broadcast (both sublanes and
        # lanes), which the packed [size]-vector form required at every
        # stage with t > 1.
        def stage_expand(vals_all, shapes):
            out = []
            for (m, t) in shapes:
                arr = np.empty((n_sub, 2, m, t, 1), dtype=np.uint32)
                for li, q in enumerate(primes):
                    pair = shoup_stack(vals_all[li][m:2 * m], q)  # [2, m]
                    arr[li] = np.broadcast_to(pair[:, :, None, None],
                                              (2, m, t, 1))
                out.append(arr)
            return out

        fwd_shapes = []
        m, t = 1, n1
        while m < n1:
            t >>= 1
            fwd_shapes.append((m, t))
            m <<= 1
        inv_shapes = []
        m, t = n1 >> 1, 1
        while m >= 1:
            inv_shapes.append((m, t))
            m >>= 1
            t <<= 1
        self.mstf_stages = stage_expand(rp_all, fwd_shapes)
        self.msti_stages = stage_expand(ip_all, inv_shapes)

        # Raw per-limb twiddle vectors for the v2 (relayout-minimal)
        # kernel's table packer (pallas_ntt_v2.py): merged-psi root
        # powers for the n1 sub-transform, packed cyclic stage twiddles
        # for the n2 sub-transform.
        self.rp_raw = np.stack(rp_all)      # [n_sub, n1] uint64
        self.ip_raw = np.stack(ip_all)
        self.pk2f_raw = np.stack(pk2f_all)  # [n_sub, n2] uint64
        self.pk2i_raw = np.stack(pk2i_all)


def _sub_dif(x, st, q, size):
    """DIF sub-DFT along axis 0 (natural in, bit-reversed out).
    x: [size, lanes]; st: [2, size, 1] packed Shoup column twiddles."""
    m = size
    while m >= 2:
        half = m >> 1
        w = st[0, half - 1:2 * half - 1]   # [half, 1]
        wp = st[1, half - 1:2 * half - 1]
        parts = []
        for blk in range(0, size, m):
            lo = x[..., blk:blk + half, :]
            hi = x[..., blk + half:blk + m, :]
            parts.append(add_mod(lo, hi, q))
            parts.append(shoup_mul(sub_mod(lo, hi, q), w, wp, q))
        x = jnp.concatenate(parts, axis=-2)
        m >>= 1
    return x


def _sub_ct_merged(x, st_stages, q, size):
    """Merged-psi negacyclic sub-NTT along axis -2 (natural in,
    bit-reversed out): Harvey/SEAL schedule with the twist folded into
    the stage twiddles. st_stages[s] = [2, m, t, 1] pre-expanded Shoup
    pairs (psi1^rev(m+i) repeated across t) so the multiply broadcasts
    along lanes only. Requires reduced input (u < q): the u+v butterfly
    has no reducing multiply on u."""
    lead = x.shape[:-2]
    lanes = x.shape[-1]
    m, t = 1, size
    for st in st_stages:
        t >>= 1
        w = st[0]                        # [m, t, 1]
        wp = st[1]
        xr = x.reshape(lead + (m, 2 * t, lanes))
        lo = xr[..., :t, :]
        hi = shoup_mul(xr[..., t:, :], w, wp, q)
        x = jnp.concatenate(
            (add_mod(lo, hi, q), sub_mod(lo, hi, q)),
            axis=-2).reshape(lead + (size, lanes))
        m <<= 1
    assert m == size
    return x


def _sub_gs_merged(x, st_stages, q, size):
    """Merged-psi^-1 negacyclic inverse along axis -2 (bit-rev in,
    natural out), UNSCALED — the size^-1 factor lives in the caller's
    correction table. st_stages[s] = [2, m, t, 1] pre-expanded
    psi1^-rev(m+i) Shoup pairs."""
    lead = x.shape[:-2]
    lanes = x.shape[-1]
    m, t = size >> 1, 1
    for st in st_stages:
        w = st[0]
        wp = st[1]
        xr = x.reshape(lead + (m, 2 * t, lanes))
        lo = xr[..., :t, :]
        hi = xr[..., t:, :]
        x = jnp.concatenate(
            (add_mod(lo, hi, q), shoup_mul(sub_mod(lo, hi, q), w, wp, q)),
            axis=-2).reshape(lead + (size, lanes))
        m >>= 1
        t <<= 1
    assert m == 0
    return x


def _sub_dit(x, st, q, size):
    """DIT sub-DFT along axis 0 (bit-reversed in, natural out)."""
    m = 2
    while m <= size:
        half = m >> 1
        w = st[0, half - 1:2 * half - 1]   # [half, 1]
        wp = st[1, half - 1:2 * half - 1]
        parts = []
        for blk in range(0, size, m):
            lo = x[..., blk:blk + half, :]
            hi = shoup_mul(x[..., blk + half:blk + m, :], w, wp, q)
            parts.append(add_mod(lo, hi, q))
            parts.append(sub_mod(lo, hi, q))
        x = jnp.concatenate(parts, axis=-2)
        m <<= 1
    return x


def _fwd_kernel(n1, n2, n_st):
    def kernel(x_ref, corr_ref, *rest):
        st1_refs = rest[:n_st]
        st2_ref, qs_ref, out_ref = rest[n_st:]
        limb = pl.program_id(0)
        q = qs_ref[limb, 0]
        sts = tuple(r[0] for r in st1_refs)            # [2, m, t, 1] each
        x = x_ref[:, 0]                                # [C, n1, n2]
        x = _sub_ct_merged(x, sts, q, n1)              # twist-merged k1 DFT
        x = shoup_mul(x, corr_ref[0, 0], corr_ref[0, 1], q)  # corr * psi^c
        x = x.swapaxes(-1, -2)                         # [C, n2, n1]
        x = _sub_dif(x, st2_ref[0], q, n2)             # column DFT (k2)
        out_ref[:, 0] = x.swapaxes(-1, -2)             # bit-rev order
    return kernel


def _inv_kernel(n1, n2, n_st):
    def kernel(x_ref, corr_ref, *rest):
        st1_refs = rest[:n_st]
        st2_ref, qs_ref, out_ref = rest[n_st:]
        limb = pl.program_id(0)
        q = qs_ref[limb, 0]
        sts = tuple(r[0] for r in st1_refs)
        x = x_ref[:, 0]                                # [C, n1, n2] bit-rev
        x = x.swapaxes(-1, -2)                         # [C, n2, n1]
        x = _sub_dit(x, st2_ref[0], q, n2)             # inverse over k2
        # corr_inv * psi^-c * N^-1
        x = shoup_mul(x, corr_ref[0, 0], corr_ref[0, 1], q)
        x = x.swapaxes(-1, -2)                         # [C, n1, n2]
        out_ref[:, 0] = _sub_gs_merged(x, sts, q, n1)  # untwist-merged
    return kernel


class PallasNTT:
    """Batched NTT/iNTT over [..., n_sub, N] uint32 planes."""

    def __init__(self, primes: List[int], n: int):
        self.t = PallasNTTTables(primes, n)
        self.n = n
        n_sub = len(primes)
        # Scalar params per limb: (q, nqinv).
        self.qs = np.stack([self.t.q, self.t.nqinv], axis=1)  # [n_sub, 2]
        # Traced-kernel cache: tracing the unrolled butterfly body costs
        # ~3 s of Python per pallas_call (measured, tools/profile_trace),
        # and a whole-graph trace re-traces the same kernel dozens of
        # times. jit-wrapping the pallas_call caches the kernel jaxpr
        # per input-shape signature, so each kernel traces ONCE per
        # process (the outer trace then just inserts a call).
        self._fns = {}

    def _call(self, x, kernel_factory, corr, st1_stages, st2):
        t = self.t
        n1, n2 = t.n1, t.n2
        lead = x.shape[:-1]
        n_sub = lead[-1]
        xr = x.reshape(-1, n_sub, n1, n2)
        batch = xr.shape[0]
        chunk = 1
        for c in (8, 4, 2):
            if batch % c == 0:
                chunk = c
                break
        grid = (n_sub, batch // chunk)
        interpret = jax.default_backend() != "tpu"
        key = (kernel_factory, batch, interpret)
        fn = self._fns.get(key)
        if fn is None:
            kernel = kernel_factory(n1, n2, len(st1_stages))

            def limb_first(shape):
                nd = len(shape)
                return pl.BlockSpec((1,) + shape[1:],
                                    lambda l, b: (l,) + (0,) * (nd - 1),
                                    memory_space=pltpu.VMEM)

            fn = jax.jit(pl.pallas_call(
                kernel,
                grid=grid,
                interpret=interpret,
                in_specs=[
                    pl.BlockSpec((chunk, 1, n1, n2),
                                 lambda l, b: (b, l, 0, 0),
                                 memory_space=pltpu.VMEM),
                    limb_first(corr.shape),
                    *[limb_first(s.shape) for s in st1_stages],
                    limb_first(st2.shape + (1,)),
                    pl.BlockSpec((n_sub, 2), lambda l, b: (0, 0),
                                 memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec((chunk, 1, n1, n2),
                                       lambda l, b: (b, l, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((batch, n_sub, n1, n2),
                                               jnp.uint32),
            ))
            self._fns[key] = fn
        out = fn(xr, corr, *st1_stages, st2[..., None], self.qs)
        return out.reshape(*lead, self.n)

    def ntt(self, x):
        """Requires REDUCED input planes (x < q per row)."""
        t = self.t
        return self._call(x, _fwd_kernel, t.mcorr_f, t.mstf_stages, t.st2_f)

    def intt(self, x):
        t = self.t
        return self._call(x, _inv_kernel, t.mcorr_i, t.msti_stages, t.st2_i)


@lru_cache(maxsize=None)
def _get_pallas_ntt_cached(primes: Tuple[int, ...], n: int, variant: int):
    if variant == 2:
        from .pallas_ntt_v2 import PallasNTTv2
        return PallasNTTv2(list(primes), n)
    return PallasNTT(list(primes), n)


def ntt_v2_selected(n: int) -> bool:
    """True when the relayout-minimal v2 stage schedule should be used
    (pallas_ntt_v2.py; bit-identical outputs). Default ON for real TPU
    execution — measured 2.0x forward / 1.5x inverse over the v1
    per-stage concat schedule at N=16384x12 (tools/bench_ntt_v2.py,
    interleaved median-of-3) — and OFF in interpret mode, where its
    unrolled slice lists only cost trace time. EVA_TPU_NTT_V2=1 forces
    it on (tests), EVA_TPU_NTT_V2=0 forces v1. Requires n1 = n/128 >= 8,
    i.e. n >= 1024."""
    import os
    if n // LANES < 8:
        return False
    flag = os.environ.get("EVA_TPU_NTT_V2")
    if flag is not None and flag != "":
        return flag != "0"
    import jax
    return jax.default_backend() == "tpu"


def get_pallas_ntt(primes: Tuple[int, ...], n: int):
    """NTT kernel engine for (primes, n); see ntt_v2_selected."""
    return _get_pallas_ntt_cached(primes, n, 2 if ntt_v2_selected(n) else 1)
