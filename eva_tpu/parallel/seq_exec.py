"""Sequence-parallel program execution: the ring axis N of every
polynomial sharded over a mesh axis, integrated into the jitted
whole-graph executor (the execution-path form of parallel/ntt_shard —
SURVEY §2.9 "all-to-all for NTT stage exchanges").

Sharding layout contract (shard_map device-local views):

  evaluation (NTT) domain   [..., n_sub, N/D] — row-sharded: the local
      flat slice IS a contiguous slice of the global bit-reversed flat
      layout, so ciphertext planes cross the shard_map boundary (upload,
      output fetch, key material) unchanged under `P(..., "seq")`.
  coefficient domain        lane-sharded [n1, n2/D] kept FLAT as
      [..., n_sub, N/D] — an executor-internal layout produced by intt
      and consumed by ntt/divide; it never crosses the boundary.

Every elementwise op (dyadic arithmetic, FBE, key MACs, rescale
divide-and-round) is pointwise over N and works on either local layout
unchanged; only three things need communication:

  * NTT/iNTT — ONE all-to-all between the two four-step phases
    (ntt_shard.ShardedNTT, bit-exact vs the single-device tables),
  * the Galois automorphism — an N-permutation crossing shards
    (seq_perm: all_gather + the single-device permutation + own-slice),
  * nothing else: key-switch FBE, MACs, and P-division are pointwise.

This is the latency-scaling axis: batch sharding keeps one execution on
one chip; the seq axis splits the VPU-bound NTT work of a SINGLE
execution across chips. Use when one ciphertext no longer amortizes over
batch/limb axes (giant rings, single-request latency floors)."""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..backend.tables import DeviceLevelOps
from .ntt_shard import ShardedNTT, get_sharded_ntt


def seq_slice(arr, axis: str, n_dev: int):
    """This device's contiguous shard of a replicated last-axis-N array
    (evaluation-domain key planes are row-sharded = flat slices)."""
    nloc = arr.shape[-1] // n_dev
    i = jax.lax.axis_index(axis)
    return jax.lax.dynamic_slice_in_dim(arr, i * nloc, nloc, axis=-1)


def seq_perm(perm_fn, axis: str, n_dev: int):
    """Lift a full-plane N-permutation to seq-sharded evaluation planes
    the GENERIC way: all_gather the N axis, permute on the full plane,
    keep the own slice. Fallback for permutations without the
    affine-automorphism shard structure (see seq_perm_galois)."""

    def f(x):
        full = jax.lax.all_gather(x, axis, axis=x.ndim - 1, tiled=True)
        y = perm_fn(full)
        nloc = x.shape[-1]
        i = jax.lax.axis_index(axis)
        return jax.lax.dynamic_slice_in_dim(y, i * nloc, nloc, axis=-1)

    return f


@lru_cache(maxsize=None)
def _seq_perm_tables(ctx, g: int, n_dev: int):
    """(src, local) shard-exchange tables for the Galois automorphism g
    on a D-way seq sharding, or None if the structure doesn't hold.

    Why one source shard per destination shard: the automorphism is
    affine in natural index order, t' = g*t + (g-1)/2 mod N, and storage
    is bit-reversed, so a flat position's shard (top log2 D bits of the
    bit-reversed index) is determined by the natural index mod D. With
    D | 128 | N and g odd, t' mod D is constant across one destination
    shard and t = g^-1 (t' - c) mod D is then a single value — every
    output position of shard d reads from the SAME source shard
    src[d] = rev_D(g^-1 (t'_d - c) mod D), and d -> src[d] is an affine
    bijection of shards. Verified empirically from the permutation
    table rather than trusted.

    src[d]      source shard whose slice destination shard d needs
    local[d,:]  source-local flat indices within that received slice

    Tables are numpy (cache-safety: never capture tracers; see
    ARCHITECTURE.md orderings/caching notes)."""
    perm = np.asarray(ctx.perm_for_elt(g))
    n = perm.shape[0]
    if n % n_dev:
        return None
    nloc = n // n_dev
    src_flat = perm.reshape(n_dev, nloc)
    src_dev = src_flat // nloc
    if not (src_dev == src_dev[:, :1]).all():
        return None
    src = src_dev[:, 0].astype(np.int32)
    local = (src_flat - src[:, None] * nloc).astype(np.int32)
    return src, local


def seq_perm_galois(ctx, g: int, axis: str, n_dev: int, fallback_fn):
    """Galois automorphism on seq-sharded evaluation planes WITHOUT the
    all_gather: one ppermute of whole row-block shards (collective bytes
    1/D of the gather) followed by a device-local lane gather. Falls
    back to the generic gather lift if the shard-exchange structure
    doesn't factor (it always does for Galois elements under the
    seq_compatible conditions). Bit-identical either way."""
    tabs = _seq_perm_tables(ctx, g, n_dev)
    if tabs is None:  # pragma: no cover - defensive
        return seq_perm(fallback_fn, axis, n_dev)
    src, local = tabs
    # ppermute pairs are (source, destination); d receives src[d]'s slice.
    pairs = [(int(src[d]), d) for d in range(n_dev)]

    def f(x):
        recv = jax.lax.ppermute(x, axis, pairs)
        i = jax.lax.axis_index(axis)
        idx = jnp.take(jnp.asarray(local), i, axis=0)
        return jnp.take(recv, idx, axis=-1)

    return f


class SeqLevelOps:
    """DeviceLevelOps facade for seq-sharded local planes.

    Elementwise ops delegate to the single-device ops (per-row modulus
    constants broadcast over any trailing length, so a shorter local N
    needs no new tables); transforms route through the all-to-all
    ShardedNTT. Must be used INSIDE shard_map."""

    def __init__(self, base: DeviceLevelOps, sntt: ShardedNTT,
                 axis: str, n_dev: int):
        self.base = base
        self.sntt = sntt
        self.axis = axis
        self.n_dev = n_dev
        self.primes = base.primes
        self.n = base.n
        self.q = base.q
        self.nqinv = base.nqinv
        self.r1 = base.r1
        self.r2 = base.r2

    # -- elementwise (local-layout agnostic) ----------------------------

    def add(self, a, b):
        return self.base.add(a, b)

    def sub(self, a, b):
        return self.base.sub(a, b)

    def neg(self, a):
        return self.base.neg(a)

    def mul_mont(self, a, b_mont):
        return self.base.mul_mont(a, b_mont)

    def reduce(self, a):
        return self.base.reduce(a)

    def mul(self, a, b):
        return self.base.mul(a, b)

    def tensor_product(self, a0, a1, b0, b1):
        return self.base.tensor_product(a0, a1, b0, b1)

    # -- transforms (one all-to-all each) -------------------------------

    def ntt(self, a):
        """Local lane-sharded coefficient planes [..., n_sub, N/D] ->
        local row-sharded evaluation planes (contiguous flat slices)."""
        lead = a.shape[:-1]
        x = a.reshape(lead + (self.sntt.n1, self.sntt.n2 // self.n_dev))
        y = self.sntt.ntt(x)
        return y.reshape(lead + (a.shape[-1],))

    def intt(self, x):
        lead = x.shape[:-1]
        a = x.reshape(lead + (self.sntt.n1 // self.n_dev, self.sntt.n2))
        y = self.sntt.intt(a)
        return y.reshape(lead + (x.shape[-1],))


@lru_cache(maxsize=None)
def get_seq_ops(primes: Tuple[int, ...], n: int, axis: str,
                n_dev: int) -> SeqLevelOps:
    from ..backend.executor_jax import level_ops
    sntt = get_sharded_ntt(primes, n, axis, n_dev)
    return SeqLevelOps(level_ops(list(primes), n), sntt, axis, n_dev)


def seq_compatible(n: int, n_dev: int) -> bool:
    """Whether ring size n can shard over n_dev devices: both four-step
    factors must split evenly (n2 = 128 lanes, n1 = n/128 rows)."""
    if n < 1024:
        return False
    n2 = 128
    n1 = n // n2
    return n1 % n_dev == 0 and n2 % n_dev == 0
