"""Fused Pallas TPU kernels for hybrid key switching — the dominant HE op.

The unfused path (executor_jax._ks_digits/_ks_apply) round-trips HBM
between digit decomposition, the digit NTTs, the key inner product, and
the P-division epilogue. These two kernels keep everything VMEM-resident:

  ks_mac:      grid (batch, n_ext, n_groups). Per step: fast-base-extend
               one digit row from the (tiny) y block, run the four-step
               negacyclic NTT on it in VMEM, multiply with the two key
               rows streaming in from HBM, and accumulate into the
               [n_ext, N] accumulators (output blocks revisited across
               the inner digit axis, so they never leave VMEM).
  ks_epilogue: grid (batch, 2). Per step: iNTT the accumulated extended-
               basis rows, divide-and-round by each key prime, and
               (optionally) NTT the surviving rows at the output level.

Bit-parity with the XLA/numpy backends holds because every operation is
exact modular arithmetic: accumulation order does not change values, and
fast-base-extending the digit's OWN rows (instead of reusing the input
NTT planes) yields D_j + e*Qg with e*Qg = 0 mod the own primes — the
same residues the structured path reads directly (executor_jax.py:301).

Reference counterpart: SEAL's switch_key_inplace (SURVEY.md §2.8); the
fusion itself has no reference equivalent — it is the TPU redesign."""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modmath import add_mod, mont_mul, shoup_mul, sub_mod, to_mont
from .pallas_ntt import (PallasNTTTables, _sub_ct_merged, _sub_dif,
                         _sub_dit, _sub_gs_merged)

LANES = 128


def _ntt_row(x, corr, st1_stages, st2, q, n1, n2):
    """Forward negacyclic NTT of one [n1, n2] row (four-step, in VMEM).
    The twist is merged into st1 (Harvey form) and psi^c into corr;
    requires reduced input. corr: [2, n1, n2] Shoup pairs; st1_stages:
    per-stage merged-psi [2, m, t, 1] pairs; st2 cyclic packed
    [2, n2, 1]."""
    x = _sub_ct_merged(x, st1_stages, q, n1)
    x = shoup_mul(x, corr[0], corr[1], q)
    x = x.swapaxes(-1, -2)
    x = _sub_dif(x, st2, q, n2)
    return x.swapaxes(-1, -2)


def _intt_row(x, corr, st1_stages, st2, q, n1, n2):
    """Inverse negacyclic NTT of one [n1, n2] row (untwist merged into
    st1_stages; psi^-c and N^-1 merged into corr)."""
    x = x.swapaxes(-1, -2)
    x = _sub_dit(x, st2, q, n2)
    x = shoup_mul(x, corr[0], corr[1], q)
    x = x.swapaxes(-1, -2)
    return _sub_gs_merged(x, st1_stages, q, n1)


def _mac_kernel(alpha, n1, n2, n_st, have_own=False, v2=None,
                interpret=False):
    """MAC grid step (batch, basis row i, digit group j).

    With have_own, the digit's OWN data rows skip the FBE + NTT entirely:
    NTT(D_j mod q_i) for q_i in group j is bit-identical to the input's
    NTT plane for row i (the FBE representative differs from D_j only by
    multiples of Qg_j, which vanish mod the own primes), so the kernel
    reads the provided x_ntt row instead of recomputing — n_cur of the
    n_groups*n_ext row-NTTs, the kernel's dominant cost.

    v2 (a pallas_ntt_v2.V2Plans): route the row NTT through the
    relayout-minimal stage schedule; the two plan-table refs replace the
    n_st+1 per-stage refs. Bit-identical either way."""

    def kernel(*refs):
        if have_own:
            (y_ref, xntt_ref, k0_ref, k1_ref, conv_ref, owner_ref, qs_ref,
             corr_ref) = refs[:8]
            rest = refs[8:]
        else:
            (y_ref, k0_ref, k1_ref, conv_ref, qs_ref, corr_ref) = refs[:6]
            rest = refs[6:]
        if v2 is not None:
            ct_ref, dif_ref, acc0_ref, acc1_ref = rest
        else:
            st1_refs = rest[:n_st]
            st2_ref, acc0_ref, acc1_ref = rest[n_st:]
        i = pl.program_id(1)
        j = pl.program_id(2)
        q = qs_ref[i, 0]
        nqinv = qs_ref[i, 1]

        def mac_acc(x):
            m0 = mont_mul(x, k0_ref[0, 0], q, nqinv)
            m1 = mont_mul(x, k1_ref[0, 0], q, nqinv)

            @pl.when(j == 0)
            def _():
                acc0_ref[0, 0] = m0
                acc1_ref[0, 0] = m1

            @pl.when(j != 0)
            def _():
                acc0_ref[0, 0] = add_mod(acc0_ref[0, 0], m0, q)
                acc1_ref[0, 0] = add_mod(acc1_ref[0, 0], m1, q)

        def fbe_ntt():
            # Fast base extension: digit j's residue mod basis prime i.
            d = mont_mul(y_ref[0, 0, 0], conv_ref[j * alpha, i], q, nqinv)
            for k in range(1, alpha):
                d = add_mod(
                    d, mont_mul(y_ref[0, 0, k], conv_ref[j * alpha + k, i],
                                q, nqinv), q)
            if v2 is not None:
                from .pallas_ntt_v2 import ntt_row_v2
                return ntt_row_v2(d, corr_ref[0], ct_ref[0], dif_ref[0],
                                  q, v2, interpret)
            return _ntt_row(d, corr_ref[0], tuple(r[0] for r in st1_refs),
                            st2_ref[0], q, n1, n2)

        if have_own:
            is_own = owner_ref[i, 0] == j

            @pl.when(is_own)
            def _():
                mac_acc(xntt_ref[0, 0])

            @pl.when(jnp.logical_not(is_own))
            def _():
                mac_acc(fbe_ntt())
        else:
            mac_acc(fbe_ntt())

    return kernel


def _epilogue_kernel(n_ext, n_key, n1, n2, n_st, out_ntt, v2=None,
                     interpret=False):
    n_out = n_ext - n_key

    def kernel(*refs):
        if v2 is not None:
            from .pallas_ntt_v2 import intt_row_v2, ntt_row_v2
            (acc_ref, qs_ref, pdiv_ref, cori_ref, gs_ref, dit_ref,
             corf_ref, ctf_ref, diff_ref, out_ref) = refs
        else:
            acc_ref, qs_ref, pdiv_ref, cori_ref = refs[:4]
            sti_refs = refs[4:4 + n_st]
            corf_ref = refs[4 + n_st]
            stf_refs = refs[5 + n_st:5 + 2 * n_st]
            st2i_ref, st2f_ref, out_ref = refs[5 + 2 * n_st:]
        rows = []
        for r in range(n_ext):
            q = qs_ref[r, 0]
            if v2 is not None:
                rows.append(intt_row_v2(acc_ref[0, 0, r], cori_ref[r],
                                        gs_ref[r], dit_ref[r], q, v2,
                                        interpret))
            else:
                rows.append(_intt_row(acc_ref[0, 0, r], cori_ref[r],
                                      tuple(s[r] for s in sti_refs),
                                      st2i_ref[r], q, n1, n2))

        # Divide-and-round by each key prime (executor_jax._divide_last).
        n_rem = n_ext
        for dstep in range(n_key):
            p_val = pdiv_ref[dstep, 0, n_ext]      # the dropped prime
            p_half = pdiv_ref[dstep, 0, n_ext + 1]  # p // 2
            lift = rows[n_rem - 1]
            shift = p_val - lift                 # <= p < 2^31
            corr = jnp.where(lift > p_half, jnp.uint32(0), jnp.uint32(1))
            for r in range(n_rem - 1):
                q = qs_ref[r, 0]
                v = rows[r] + shift              # < 2^32, no wrap
                rr = shoup_mul(v, pdiv_ref[dstep, 0, r],
                               pdiv_ref[dstep, 1, r], q)
                rows[r] = sub_mod(rr, corr, q)
            n_rem -= 1

        for r in range(n_out):
            if out_ntt:
                q = qs_ref[r, 0]
                if v2 is not None:
                    out_ref[0, 0, r] = ntt_row_v2(
                        rows[r], corf_ref[r], ctf_ref[r], diff_ref[r],
                        q, v2, interpret)
                else:
                    out_ref[0, 0, r] = _ntt_row(
                        rows[r], corf_ref[r],
                        tuple(s[r] for s in stf_refs),
                        st2f_ref[r], q, n1, n2)
            else:
                out_ref[0, 0, r] = rows[r]

    return kernel


class PallasEpilogue:
    """Fused key-switch epilogue for one (ext-basis prime list, n, n_key):
    iNTT of the extended-basis accumulators, divide-and-round by each key
    prime, optional output NTT — one VMEM-resident kernel instead of
    three HBM round-trips. Shared by the fused key switch AND the
    structured/hoisted path (executor_jax._ks_apply)."""

    def __init__(self, ext_primes: List[int], n: int, n_key: int):
        self.n = n
        self.n1 = n // LANES
        self.n2 = LANES
        self.ext_primes = list(ext_primes)
        self.n_ext = len(ext_primes)
        self.n_key = n_key
        self.n_out = self.n_ext - n_key
        t = PallasNTTTables(self.ext_primes, n)
        self.t = t
        self.qs = np.stack([t.q, t.nqinv], axis=1).astype(np.uint32)

        # Division constants: step d, row r holds the Shoup pair of
        # (p_d^-1 mod q_r); columns n_ext / n_ext+1 of the w plane carry
        # p_d and p_d//2 as plain scalars.
        pdiv = np.zeros((n_key, 2, self.n_ext + 2), dtype=np.uint32)
        rem = list(ext_primes)
        for d in range(n_key):
            p = rem[-1]
            rem = rem[:-1]
            for r, q in enumerate(rem):
                inv = pow(p % q, q - 2, q)
                pdiv[d, 0, r] = inv
                pdiv[d, 1, r] = (inv << 32) // q
            pdiv[d, 0, self.n_ext] = p
            pdiv[d, 0, self.n_ext + 1] = p // 2
        self.pdiv = pdiv
        # Traced-kernel cache: jit-wrapping each pallas_call caches the
        # (expensive, ~40 s for the epilogue body) kernel trace per
        # shape signature — see pallas_ntt.PallasNTT._fns.
        self._fns = {}
        self._v2 = None

    def _v2_plans(self):
        """V2Plans when the v2 relayout-minimal row transforms are
        selected (pallas_ntt.ntt_v2_selected), else None (v1 loops)."""
        from .pallas_ntt import ntt_v2_selected
        if not ntt_v2_selected(self.n):
            return None
        if self._v2 is None:
            from .pallas_ntt_v2 import V2Plans
            self._v2 = V2Plans(self.ext_primes, self.n, self.t)
        return self._v2

    def _interpret(self):
        return jax.default_backend() != "tpu"

    def epilogue(self, acc0, acc1, out_ntt: bool):
        """acc0/acc1: [B, n_ext, N] -> d0, d1: [B, n_out, N]."""
        t = self.t
        n1, n2 = self.n1, self.n2
        B = acc0.shape[0]
        acc = jnp.stack([acc0, acc1], axis=1).reshape(
            B, 2, self.n_ext, n1, n2)
        grid = (B, 2)
        out_shape = jax.ShapeDtypeStruct((B, 2, self.n_out, n1, n2),
                                         jnp.uint32)

        def accidx(b, p):
            return (b, p, 0, 0, 0)

        def full(shape):
            nd = len(shape)
            return pl.BlockSpec(shape, lambda b, p: (0,) * nd,
                                memory_space=pltpu.VMEM)

        n_st = len(t.msti_stages)
        v2 = self._v2_plans()
        if v2 is not None:
            tab_args = [t.mcorr_i, v2.gs_tab, v2.dit_tab,
                        t.mcorr_f[:self.n_out], v2.ct_tab[:self.n_out],
                        v2.dif_tab[:self.n_out]]
        else:
            tab_args = [t.mcorr_i, *t.msti_stages,
                        t.mcorr_f[:self.n_out],
                        *[s[:self.n_out] for s in t.mstf_stages],
                        t.st2_i[..., None],
                        t.st2_f[:self.n_out, ..., None]]
        key = ("epi", out_ntt, B, v2 is not None, self._interpret())
        fn = self._fns.get(key)
        if fn is None:
            fn = jax.jit(pl.pallas_call(
                _epilogue_kernel(self.n_ext, self.n_key, n1, n2, n_st,
                                 out_ntt, v2=v2,
                                 interpret=self._interpret()),
                grid=grid,
                interpret=self._interpret(),
                # The per-step working set (n_ext acc planes + both corr
                # tables + n_ext live rows) sits near Mosaic's default
                # 16 MB scoped-vmem cap at n_ext=14; raise the cap so
                # surrounding-program buffer pressure cannot tip the
                # compile over (v5e VMEM is 128 MiB).
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
                in_specs=[
                    pl.BlockSpec((1, 1, self.n_ext, n1, n2), accidx,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(self.qs.shape, lambda b, p: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec(self.pdiv.shape, lambda b, p: (0, 0, 0),
                                 memory_space=pltpu.SMEM),
                    *[full(a.shape) for a in tab_args],
                ],
                out_specs=pl.BlockSpec((1, 1, self.n_out, n1, n2), accidx,
                                       memory_space=pltpu.VMEM),
                out_shape=out_shape,
            ))
            self._fns[key] = fn
        out = fn(acc, self.qs, self.pdiv, *tab_args)
        return (out[:, 0].reshape(B, self.n_out, self.n),
                out[:, 1].reshape(B, self.n_out, self.n))



class PallasKeySwitch(PallasEpilogue):
    """Fused key switch for one (ext-basis prime list, n, alpha) triple.

    ext_primes = data primes at the level + key primes. `apply` takes the
    pre-FBE y rows and a dense [n_groups, n_ext, N] key layout and
    returns the two switched polynomials after P-division."""

    def __init__(self, ext_primes: List[int], n: int, n_key: int,
                 alpha: int, n_groups: int, conv_mont: np.ndarray,
                 owner: np.ndarray = None):
        super().__init__(ext_primes, n, n_key)
        self.alpha = alpha
        self.n_groups = n_groups
        # conv_mont arrives [n_groups*alpha, n_ext] (pad rows zero);
        # kept 2D for SMEM (row j*alpha+k, column i).
        self.conv = conv_mont.reshape(n_groups * alpha, self.n_ext)
        # owner[i] = digit group owning data row i; key rows get -1 so
        # they never match a group index (own-row NTT skip, _mac_kernel).
        self.owner = None
        if owner is not None:
            own = np.full((self.n_ext, 1), -1, dtype=np.int32)
            own[:len(owner), 0] = owner
            self.owner = own

    def mac(self, y, k0, k1, x_ntt=None):
        """y: [B, n_groups, alpha, N]; k0/k1: [n_groups, n_ext, N] mont;
        x_ntt: optional [B, n_cur, N] NTT planes of the switched
        polynomial (own-row NTT skip). Returns acc0, acc1: [B, n_ext, N]."""
        t = self.t
        n1, n2 = self.n1, self.n2
        B = y.shape[0]
        yr = y.reshape(B, self.n_groups, self.alpha, n1, n2)
        k0r = k0.reshape(self.n_groups, self.n_ext, n1, n2)
        k1r = k1.reshape(self.n_groups, self.n_ext, n1, n2)
        grid = (B, self.n_ext, self.n_groups)
        have_own = x_ntt is not None and self.owner is not None

        def yidx(b, i, j):
            return (b, j, 0, 0, 0)

        def kidx(b, i, j):
            return (j, i, 0, 0)

        def tabidx(b, i, j):
            return (i, 0, 0, 0)

        def accidx(b, i, j):
            return (b, i, 0, 0)

        out_shape = jax.ShapeDtypeStruct((B, self.n_ext, n1, n2), jnp.uint32)
        acc_spec = pl.BlockSpec((1, 1, n1, n2), accidx,
                                memory_space=pltpu.VMEM)
        in_specs = [pl.BlockSpec((1, 1, self.alpha, n1, n2), yidx,
                                 memory_space=pltpu.VMEM)]
        args = [yr]
        if have_own:
            n_cur = self.n_ext - self.n_key
            xr = x_ntt.reshape(B, n_cur, n1, n2)
            in_specs.append(pl.BlockSpec(
                (1, 1, n1, n2),
                lambda b, i, j: (b, jnp.minimum(i, n_cur - 1), 0, 0),
                memory_space=pltpu.VMEM))
            args.append(xr)
        in_specs += [
            pl.BlockSpec((1, 1, n1, n2), kidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n1, n2), kidx, memory_space=pltpu.VMEM),
            pl.BlockSpec(self.conv.shape, lambda b, i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        args += [k0r, k1r, self.conv]
        if have_own:
            in_specs.append(pl.BlockSpec(self.owner.shape,
                                         lambda b, i, j: (0, 0),
                                         memory_space=pltpu.SMEM))
            args.append(self.owner)
        def tabidx5(b, i, j):
            return (i, 0, 0, 0, 0)

        v2 = self._v2_plans()
        in_specs += [
            pl.BlockSpec(self.qs.shape, lambda b, i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, n1, n2), tabidx, memory_space=pltpu.VMEM),
        ]
        args += [self.qs, t.mcorr_f]
        if v2 is not None:
            in_specs += [pl.BlockSpec((1,) + s.shape[1:], tabidx5,
                                      memory_space=pltpu.VMEM)
                         for s in (v2.ct_tab, v2.dif_tab)]
            args += [v2.ct_tab, v2.dif_tab]
        else:
            in_specs += [
                *[pl.BlockSpec((1,) + s.shape[1:], tabidx5,
                               memory_space=pltpu.VMEM)
                  for s in t.mstf_stages],
                pl.BlockSpec((1, 2, n2, 1), tabidx,
                             memory_space=pltpu.VMEM),
            ]
            args += [*t.mstf_stages, t.st2_f[..., None]]
        key = ("mac", have_own, B, v2 is not None, self._interpret())
        fn = self._fns.get(key)
        if fn is None:
            fn = jax.jit(pl.pallas_call(
                _mac_kernel(self.alpha, n1, n2, len(t.mstf_stages),
                            have_own, v2=v2, interpret=self._interpret()),
                grid=grid,
                interpret=self._interpret(),
                in_specs=in_specs,
                out_specs=(acc_spec, acc_spec),
                out_shape=(out_shape, out_shape),
            ))
            self._fns[key] = fn
        acc0, acc1 = fn(*args)
        return (acc0.reshape(B, self.n_ext, self.n),
                acc1.reshape(B, self.n_ext, self.n))

    def apply(self, y, k0, k1, out_ntt: bool = True, x_ntt=None):
        acc0, acc1 = self.mac(y, k0, k1, x_ntt=x_ntt)
        return self.epilogue(acc0, acc1, out_ntt)


@lru_cache(maxsize=None)
def get_pallas_epilogue(ext_primes: Tuple[int, ...], n: int,
                        n_key: int) -> PallasEpilogue:
    return PallasEpilogue(list(ext_primes), n, n_key)


@lru_cache(maxsize=None)
def _get(ext_primes: Tuple[int, ...], n: int, n_key: int, alpha: int,
         n_groups: int, conv_bytes: bytes, conv_shape: Tuple[int, int],
         owner: Tuple[int, ...]):
    conv = np.frombuffer(conv_bytes, dtype=np.uint32).reshape(conv_shape)
    return PallasKeySwitch(
        list(ext_primes), n, n_key, alpha, n_groups, conv.copy(),
        None if owner is None else np.asarray(owner, dtype=np.int32))


def get_pallas_ks(ext_primes: Tuple[int, ...], n: int, n_key: int,
                  alpha: int, n_groups: int, conv_mont: np.ndarray,
                  owner=None) -> PallasKeySwitch:
    return _get(ext_primes, n, n_key, alpha, n_groups,
                conv_mont.astype(np.uint32).tobytes(),
                tuple(conv_mont.shape),
                None if owner is None else tuple(int(t) for t in owner))
