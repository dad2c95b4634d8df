"""Single-polynomial NTT with the ring dimension N sharded over a mesh
axis — the last SURVEY §2.9 component ("all-to-all for NTT stage
exchanges when a single polynomial is sharded").

The four-step decomposition views a polynomial as an [N1, N2] matrix
(N2 = 128 lanes). Each of the two sub-DFT phases only needs one matrix
axis locally, so a single polynomial can be sharded over D devices with
exactly ONE all-to-all between the phases:

  forward:  input sharded on the LANE axis [N1, N2/D]
            -> twist + N1-sub-DIF + correction twiddle (all local)
            -> all-to-all (split rows, concat lanes) -> [N1/D, N2]
            -> N2-sub-DIF (local)
            output sharded on the ROW axis
  inverse:  mirrors the forward (rows-sharded in, lanes-sharded out),
            so intt . ntt round-trips compose without extra reshards.

Butterfly schedule and twiddle tables are identical to the single-device
kernels (backend/pallas_ntt.PallasNTTTables), so results are bit-exact:
the same modular sums and products are computed, only their placement
moves. Useful when one ciphertext no longer amortizes across the batch
or limb axes (e.g. giant-ring bootstrapping-class parameters); for
batched workloads batch/limb sharding remains cheaper (no collective on
the hot path) — see ARCHITECTURE.md for the measured crossover."""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..backend.modmath import shoup_mul
from ..backend.pallas_ntt import PallasNTTTables, _sub_dif, _sub_dit


class ShardedNTT:
    """NTT/iNTT over [..., n_sub, N1, N2] planes with one matrix axis
    sharded over `axis` (a shard_map mesh axis name) across n_dev
    devices. Methods must be called INSIDE shard_map; arrays are the
    device-local shards.

    ntt:  local [..., n_sub, N1, N2/D] (lane-sharded)
          -> local [..., n_sub, N1/D, N2] (row-sharded), bit-rev order
    intt: the exact inverse (row-sharded in, lane-sharded out)."""

    def __init__(self, primes: List[int], n: int, axis: str, n_dev: int):
        t = PallasNTTTables(primes, n)
        self.t = t
        self.primes = list(primes)
        self.n = n
        self.n1, self.n2 = t.n1, t.n2
        self.axis = axis
        self.n_dev = n_dev
        assert self.n2 % n_dev == 0 and self.n1 % n_dev == 0
        # Tables stay NUMPY so they embed as constants of whichever
        # trace uses them: instances are lru-cached, and a jnp.asarray
        # executed while some enclosing jit/make_jaxpr trace is active
        # would cache that trace's TRACER — poisoning every later trace
        # that hits the same cache key (the same reason _ks_dev_tables
        # returns numpy). Local lane/row slices are taken with a dynamic
        # slice at the device's axis index (tables are tiny vs planes).
        self.q = t.q[:, None, None]              # [n_sub, 1, 1]
        self.tw_fwd = t.tw_fwd                   # [n_sub, 2, n1, n2]
        self.tw_inv = t.tw_inv
        self.corr_fwd = t.corr_fwd
        self.corr_inv = t.corr_inv               # [n_sub, 2, n2, n1]
        self.st1_f = t.st1_f[..., None]
        self.st1_i = t.st1_i[..., None]
        self.st2_f = t.st2_f[..., None]
        self.st2_i = t.st2_i[..., None]

    # -- table slicing ---------------------------------------------------

    def _lane_slice(self, tab):
        """tab[..., n2] -> local [..., n2/D] at this device's lane block."""
        nl = self.n2 // self.n_dev
        i = jax.lax.axis_index(self.axis)
        return jax.lax.dynamic_slice_in_dim(tab, i * nl, nl, axis=-1)

    def _row_slice(self, tab, axis_offset: int = -2):
        """tab[..., n1, ...] -> local rows block at this device."""
        nr = self.n1 // self.n_dev
        i = jax.lax.axis_index(self.axis)
        ax = tab.ndim + axis_offset if axis_offset < 0 else axis_offset
        return jax.lax.dynamic_slice_in_dim(tab, i * nr, nr, axis=ax)

    def _mul_pair(self, x, pair):
        """shoup multiply by a [n_sub, 2, ...] pair table slice."""
        return shoup_mul(x, pair[:, 0], pair[:, 1], self.q)

    @staticmethod
    def _dif(x, st, q, size):
        """Column sub-DIF along axis -2 of [..., size, lanes] planes."""
        return _sub_dif(x, st, q, size)

    # -- transforms (call inside shard_map) -------------------------------

    def ntt(self, x):
        """x: local [..., n_sub, n1, n2/D] coefficient planes (natural
        order, lane-sharded). Returns row-sharded NTT planes."""
        x = self._mul_pair(x, self._lane_slice(self.tw_fwd))
        x = _sub_dif_rows(x, self.st1_f, self.q, self.n1)
        x = self._mul_pair(x, self._lane_slice(self.corr_fwd))
        # all-to-all: split rows, concatenate lanes -> [n1/D, n2]
        x = jax.lax.all_to_all(x, self.axis, split_axis=x.ndim - 2,
                               concat_axis=x.ndim - 1, tiled=True)
        x = x.swapaxes(-1, -2)
        x = _sub_dif_rows(x, self.st2_f, self.q, self.n2)
        return x.swapaxes(-1, -2)

    def intt(self, x):
        """x: local [..., n_sub, n1/D, n2] NTT planes (bit-rev order,
        row-sharded). Returns lane-sharded coefficient planes."""
        x = x.swapaxes(-1, -2)                  # [.., n2, n1/D]
        x = _sub_dit_rows(x, self.st2_i, self.q, self.n2)
        # corr_inv is stored [n_sub, 2, n2, n1] — already this layout;
        # slice its n1 (last) axis to this device's row block.
        x = self._mul_pair(x, self._row_slice(self.corr_inv,
                                              axis_offset=-1))
        # all-to-all: split n2, concatenate n1 -> [.., n2/D, n1]
        x = jax.lax.all_to_all(x, self.axis, split_axis=x.ndim - 2,
                               concat_axis=x.ndim - 1, tiled=True)
        x = x.swapaxes(-1, -2)                  # [.., n1, n2/D]
        x = _sub_dit_rows(x, self.st1_i, self.q, self.n1)
        return self._mul_pair(x, self._lane_slice(self.tw_inv))


def _sub_dif_rows(x, st, q, size):
    """Per-limb DIF over axis -2. x: [..., n_sub, size, lanes];
    st: [n_sub, 2, size, 1]; q: [n_sub, 1, 1]."""
    m = size
    while m >= 2:
        half = m >> 1
        w = st[:, 0, half - 1:2 * half - 1]   # [n_sub, half, 1]
        wp = st[:, 1, half - 1:2 * half - 1]
        parts = []
        for blk in range(0, size, m):
            lo = x[..., blk:blk + half, :]
            hi = x[..., blk + half:blk + m, :]
            s = lo + hi
            parts.append(jnp.where(s >= q, s - q, s))
            d = jnp.where(lo >= hi, lo - hi, lo + q - hi)
            parts.append(shoup_mul(d, w, wp, q))
        x = jnp.concatenate(parts, axis=-2)
        m >>= 1
    return x


def _sub_dit_rows(x, st, q, size):
    """Per-limb DIT over axis -2 (inverse of _sub_dif_rows)."""
    m = 2
    while m <= size:
        half = m >> 1
        w = st[:, 0, half - 1:2 * half - 1]
        wp = st[:, 1, half - 1:2 * half - 1]
        parts = []
        for blk in range(0, size, m):
            lo = x[..., blk:blk + half, :]
            hi = shoup_mul(x[..., blk + half:blk + m, :], w, wp, q)
            s = lo + hi
            parts.append(jnp.where(s >= q, s - q, s))
            parts.append(jnp.where(lo >= hi, lo - hi, lo + q - hi))
        x = jnp.concatenate(parts, axis=-2)
        m <<= 1
    return x


@lru_cache(maxsize=None)
def get_sharded_ntt(primes: Tuple[int, ...], n: int, axis: str,
                    n_dev: int) -> ShardedNTT:
    return ShardedNTT(list(primes), n, axis, n_dev)
