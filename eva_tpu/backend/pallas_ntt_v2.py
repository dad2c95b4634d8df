"""v2 four-step NTT kernel: relayout-minimal butterfly scheduling.

The v1 kernel (pallas_ntt.py) materializes a concatenate + reshape of
the whole [n1, lanes] block after EVERY butterfly stage — 14 relayout
passes per transform that Mosaic schedules as sublane shuffles/copies.
The round-5 compute roofline measured those kernels at ~30% of the VPU
modular-multiply ceiling with <8% of HBM bandwidth: the missing ~70% is
exactly this between-stage data movement (ROADMAP round-6 queue #1).

v2 removes it structurally:

 * rows are carved ONCE into 8-sublane tile slices ([C, 8, lanes] — a
   native VMEM tile per chunk element); butterfly stages with pair
   distance >= 8 rows combine whole slices as separate SSA values, so
   there is NO data movement at all — only which-value bookkeeping in
   the unrolled kernel body;
 * the three within-tile stages (distance 4/2/1 rows) use sublane
   pltpu.roll + iota-mask select butterflies: the partner operand is
   aligned by a cyclic sublane rotate instead of slice+concat, trading
   a second (cheap, under-utilized) multiply lane for zero relayouts;
 * ONE tile-aligned concatenate at sub-transform exit.

Twiddle values, add/sub pairing, and Shoup reductions are IDENTICAL to
v1 per output element, so results are bit-identical to v1, the XLA
stage path, and the host tables (crypto/ntt.py).

All four sub-transforms (merged-psi CT forward / GS inverse over n1,
cyclic DIF forward / DIT inverse over n2 — see pallas_ntt.py for the
four-step ordering identity) run through one plan interpreter; the
per-form twiddle indexing is precomputed host-side into a single packed
[n_sub, 2, K, 8, 1] Shoup table per sub-transform.

Selected by EVA_TPU_NTT_V2 (see get_pallas_ntt in pallas_ntt.py).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modmath import add_mod, shoup_mul, shoup_pair, sub_mod
from .pallas_ntt import LANES, PallasNTTTables

ROWS = 8  # sublane tile height for 32-bit data


def _build_plan(size: int, positional: bool):
    """Static stage plan + twiddle-index matrix for one sub-transform.

    Returns (plan, idx) where idx is [K, ROWS] int indices into the
    per-limb raw twiddle vector (rp/ip for block-indexed merged-psi
    forms, packed cyclic tables for positional DIF/DIT forms), and plan
    is a list of stage ops:

      ("slice", H, idx2)   pair distance H slices; idx2[g][i] = table
                           row for group g, pair position i
      ("roll", t, rows)    within-tile distance t; rows[si] = table row
                           for slice si

    The plan is direction-agnostic: callers run it forward (distances
    descending) for CT/DIF and reversed (ascending) for GS/DIT, and
    choose multiply-before (CT/DIT) vs multiply-after (GS/DIF)."""
    assert size % ROWS == 0
    nsl = size // ROWS
    tables: List[np.ndarray] = []
    plan = []
    t = size // 2
    while t >= 1:
        if t >= ROWS:
            H = t // ROWS
            G = 2 * H
            idx2 = []
            for base in range(0, nsl, G):
                row = []
                for i in range(H):
                    if positional:
                        # DIF/DIT: w = pk[h-1 + pos], pos = i*ROWS + r.
                        vec = [t - 1 + i * ROWS + r for r in range(ROWS)]
                    else:
                        # CT/GS: w = tw[m + b], b = block of the group.
                        m = size // (2 * t)
                        vec = [m + base // G] * ROWS
                    row.append(_intern(tables, vec))
                idx2.append(row)
            plan.append(("slice", H, idx2))
        else:
            rows = []
            for si in range(nsl):
                if positional:
                    vec = [t - 1 + (r % t) for r in range(ROWS)]
                else:
                    m = size // (2 * t)
                    vec = [m + (si * ROWS + r) // (2 * t)
                           for r in range(ROWS)]
                rows.append(_intern(tables, vec))
            plan.append(("roll", t, rows))
        t >>= 1
    idx = np.array(tables, dtype=np.int64)  # [K, ROWS]
    return plan, idx


def _intern(tables: List[np.ndarray], vec) -> int:
    arr = np.asarray(vec, dtype=np.int64)
    for k, have in enumerate(tables):
        if np.array_equal(have, arr):
            return k
    tables.append(arr)
    return len(tables) - 1


def _pack_tables(src_raw: np.ndarray, idx: np.ndarray,
                 primes: List[int]) -> np.ndarray:
    """[n_sub, 2, K, ROWS, 1] Shoup pairs for the plan's table rows."""
    n_sub = len(primes)
    k, rows = idx.shape
    out = np.empty((n_sub, 2, k, rows, 1), dtype=np.uint32)
    for li, q in enumerate(primes):
        w, wp = shoup_pair(src_raw[li][idx], q)
        out[li, 0, ..., 0] = w
        out[li, 1, ..., 0] = wp
    return out


def _run_plan(x, plan, tab, q, mul_before: bool, reverse: bool,
              interpret: bool):
    """Execute a sub-transform plan over axis -2 of x [..., size, lanes].

    tab: [2, K, ROWS, 1] in-kernel Shoup table. In-place positional
    semantics match the v1 stage loops exactly (concat order preserved
    by construction), so outputs are bit-identical."""
    size = x.shape[-2]
    nsl = size // ROWS
    sl = [x[..., i * ROWS:(i + 1) * ROWS, :] for i in range(nsl)]
    ax = x.ndim - 2

    def roll(v, shift):
        shift %= ROWS  # pltpu.roll requires a non-negative shift
        if interpret:
            return jnp.roll(v, shift, axis=ax)
        return pltpu.roll(v, shift, ax)

    steps = reversed(plan) if reverse else plan
    for kind, dist, idxs in steps:
        if kind == "slice":
            H = dist
            G = 2 * H
            out = list(sl)
            for base in range(0, nsl, G):
                for i in range(H):
                    k = idxs[base // G][i]
                    w, wp = tab[0, k], tab[1, k]
                    a, b = sl[base + i], sl[base + H + i]
                    if mul_before:
                        bh = shoup_mul(b, w, wp, q)
                        out[base + i] = add_mod(a, bh, q)
                        out[base + H + i] = sub_mod(a, bh, q)
                    else:
                        out[base + i] = add_mod(a, b, q)
                        out[base + H + i] = shoup_mul(
                            sub_mod(a, b, q), w, wp, q)
            sl = out
        else:
            t = dist
            lo_mask = (lax.broadcasted_iota(jnp.uint32, (ROWS, 1), 0)
                       & np.uint32(t)) == 0
            for si in range(nsl):
                k = idxs[si]
                w, wp = tab[0, k], tab[1, k]
                v = sl[si]
                if mul_before:
                    # lo: x[r] + w*x[r+t]; hi: x[r-t] - w*x[r]
                    p = shoup_mul(v, w, wp, q)
                    lo = add_mod(v, roll(p, -t), q)
                    hi = sub_mod(roll(v, t), p, q)
                else:
                    # lo: x[r] + x[r+t]; hi: w*(x[r-t] - x[r])
                    lo = add_mod(v, roll(v, -t), q)
                    hi = shoup_mul(sub_mod(roll(v, t), v, q), w, wp, q)
                sl[si] = jnp.where(lo_mask, lo, hi)
    return jnp.concatenate(sl, axis=-2)


def _fwd_kernel_v2(ct_plan, dif_plan, interpret):
    def kernel(x_ref, corr_ref, ct_tab_ref, dif_tab_ref, qs_ref, out_ref):
        limb = pl.program_id(0)
        q = qs_ref[limb, 0]
        x = x_ref[:, 0]                                 # [C, n1, n2]
        x = _run_plan(x, ct_plan, ct_tab_ref[0], q,
                      mul_before=True, reverse=False, interpret=interpret)
        x = shoup_mul(x, corr_ref[0, 0], corr_ref[0, 1], q)
        x = x.swapaxes(-1, -2)                          # [C, n2, n1]
        x = _run_plan(x, dif_plan, dif_tab_ref[0], q,
                      mul_before=False, reverse=False, interpret=interpret)
        out_ref[:, 0] = x.swapaxes(-1, -2)
    return kernel


def _inv_kernel_v2(gs_plan, dit_plan, interpret):
    def kernel(x_ref, corr_ref, gs_tab_ref, dit_tab_ref, qs_ref, out_ref):
        limb = pl.program_id(0)
        q = qs_ref[limb, 0]
        x = x_ref[:, 0].swapaxes(-1, -2)                # [C, n2, n1]
        x = _run_plan(x, dit_plan, dit_tab_ref[0], q,
                      mul_before=True, reverse=True, interpret=interpret)
        x = shoup_mul(x, corr_ref[0, 0], corr_ref[0, 1], q)
        x = x.swapaxes(-1, -2)                          # [C, n1, n2]
        x = _run_plan(x, gs_plan, gs_tab_ref[0], q,
                      mul_before=False, reverse=True, interpret=interpret)
        out_ref[:, 0] = x
    return kernel


class V2Plans:
    """Stage plans + packed twiddle tables for one (primes, n) — shared
    by PallasNTTv2 and the v2 row transforms inside the fused
    key-switch kernels (pallas_ks)."""

    def __init__(self, primes: List[int], n: int,
                 t: PallasNTTTables = None):
        self.t = t = t if t is not None else PallasNTTTables(primes, n)
        assert t.n1 >= ROWS and t.n2 >= ROWS
        # Forward-order plans; inverse kernels run them reversed with
        # the inverse twiddle vectors (stage sets are mirror images).
        self.ct_plan, ct_idx = _build_plan(t.n1, positional=False)
        self.dif_plan, dif_idx = _build_plan(t.n2, positional=True)
        self.ct_tab = _pack_tables(t.rp_raw, ct_idx, primes)
        self.gs_tab = _pack_tables(t.ip_raw, ct_idx, primes)
        self.dif_tab = _pack_tables(t.pk2f_raw, dif_idx, primes)
        self.dit_tab = _pack_tables(t.pk2i_raw, dif_idx, primes)


def ntt_row_v2(x, corr, ct_tab, dif_tab, q, plans: V2Plans,
               interpret: bool):
    """v2 forward negacyclic NTT of one [..., n1, n2] row block; the
    in-kernel analogue of pallas_ks._ntt_row. corr: [2, n1, n2] pairs;
    ct_tab/dif_tab: this limb's [2, K, ROWS, 1] plan tables."""
    x = _run_plan(x, plans.ct_plan, ct_tab, q,
                  mul_before=True, reverse=False, interpret=interpret)
    x = shoup_mul(x, corr[0], corr[1], q)
    x = x.swapaxes(-1, -2)
    x = _run_plan(x, plans.dif_plan, dif_tab, q,
                  mul_before=False, reverse=False, interpret=interpret)
    return x.swapaxes(-1, -2)


def intt_row_v2(x, corr, gs_tab, dit_tab, q, plans: V2Plans,
                interpret: bool):
    """v2 inverse negacyclic NTT of one [..., n1, n2] row block."""
    x = x.swapaxes(-1, -2)
    x = _run_plan(x, plans.dif_plan, dit_tab, q,
                  mul_before=True, reverse=True, interpret=interpret)
    x = shoup_mul(x, corr[0], corr[1], q)
    x = x.swapaxes(-1, -2)
    return _run_plan(x, plans.ct_plan, gs_tab, q,
                     mul_before=False, reverse=True, interpret=interpret)


class PallasNTTv2:
    """Drop-in replacement for pallas_ntt.PallasNTT (bit-identical).

    A lane-axis form of the n2 sub-transform (v3: roll+select along
    lanes, no mid-kernel transposes) was prototyped and MEASURED at
    parity with this form across two on-chip sessions (ntt 208 vs 215 /
    170 vs 181 us, intt 195 vs 166 / 190 vs 214 us) — Mosaic's
    transposes are cheap enough that doubling the stage multiplies
    buys nothing; deleted per the <1.2x win-or-kill rule."""

    def __init__(self, primes: List[int], n: int):
        self.t = PallasNTTTables(primes, n)
        self.n = n
        t = self.t
        self.qs = np.stack([t.q, t.nqinv], axis=1)      # [n_sub, 2]
        p = V2Plans(primes, n, t)
        self.plans = p
        self.ct_plan, self.dif_plan = p.ct_plan, p.dif_plan
        self.ct_tab, self.gs_tab = p.ct_tab, p.gs_tab
        self.dif_tab, self.dit_tab = p.dif_tab, p.dit_tab
        self._fns = {}  # traced-kernel cache (see PallasNTT._fns)

    def _call(self, x, fwd: bool):
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
        if fwd:
            corr, tab1, tab2 = t.mcorr_f, self.ct_tab, self.dif_tab
        else:
            corr, tab1, tab2 = t.mcorr_i, self.gs_tab, self.dit_tab
        key = (fwd, batch, interpret)
        fn = self._fns.get(key)
        if fn is None:
            if fwd:
                kernel = _fwd_kernel_v2(self.ct_plan, self.dif_plan,
                                        interpret)
            else:
                kernel = _inv_kernel_v2(self.ct_plan, self.dif_plan,
                                        interpret)

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
                    limb_first(tab1.shape),
                    limb_first(tab2.shape),
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
        out = fn(xr, corr, tab1, tab2, self.qs)
        return out.reshape(*lead, self.n)

    def ntt(self, x):
        """Requires REDUCED input planes (x < q per row), like v1."""
        return self._call(x, fwd=True)

    def intt(self, x):
        return self._call(x, fwd=False)
