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

import jax

from ..backend.tables import DeviceLevelOps
from .ntt_shard import ShardedNTT, get_sharded_ntt


def seq_slice(arr, axis: str, n_dev: int):
    """This device's contiguous shard of a replicated last-axis-N array
    (evaluation-domain key planes are row-sharded = flat slices)."""
    nloc = arr.shape[-1] // n_dev
    i = jax.lax.axis_index(axis)
    return jax.lax.dynamic_slice_in_dim(arr, i * nloc, nloc, axis=-1)


def seq_perm(perm_fn, axis: str, n_dev: int):
    """Lift a full-plane N-permutation (DevPerm / jnp.take automorphism)
    to seq-sharded evaluation planes: all_gather the N axis, permute on
    the full plane, keep the own slice. One poly is small relative to
    the digit stacks the key switch moves, so the gather rides ICI
    cheaply; a future refinement can exploit the automorphism's affine
    row structure to replace the gather with a ppermute."""

    def f(x):
        full = jax.lax.all_gather(x, axis, axis=x.ndim - 1, tiled=True)
        y = perm_fn(full)
        nloc = x.shape[-1]
        i = jax.lax.axis_index(axis)
        return jax.lax.dynamic_slice_in_dim(y, i * nloc, nloc, axis=-1)

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
