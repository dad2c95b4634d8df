"""Mesh sharding for ciphertext batches and RNS limb planes.

Batched ciphertext planes have shape [batch, n_sub, N]:
  * `batch` shards over the mesh "batch" axis (independent ciphertexts;
    zero communication),
  * `n_sub` (RNS limbs) shards over the mesh "limb" axis — dyadic ops and
    NTTs are limb-local; rescale needs the dropped limb's row on every
    limb shard, which XLA lowers to a small all-gather/collective-permute
    over ICI,
  * `N` stays unsharded (the NTT butterfly would need stage-wise
    all-to-alls; batch/limb parallelism is cheaper until a single
    ciphertext no longer fits one chip)."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..backend.tables import DeviceLevelOps


def make_device_mesh(n_devices: Optional[int] = None, limb_axis: int = 1,
                     devices=None, hosts: int = 1) -> Mesh:
    """Mesh over the available devices: ("batch", "limb"), or with
    hosts > 1 a leading "host" axis ("host", "batch", "limb").

    The host axis is the DCN dimension: under jax.distributed each
    process contributes its local devices, jax.devices() returns the
    global list ordered by process, and reshaping (hosts, ...) first
    puts each host's devices in one "host" row — so "batch"/"limb"
    collectives ride ICI within a host while only the batch sharding
    (zero communication) crosses DCN. Executors treat ("host", "batch")
    together as the batch sharding axes."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.array(devices[:n_devices])
    assert n_devices % (limb_axis * hosts) == 0
    if hosts > 1:
        return Mesh(
            devices.reshape(hosts, n_devices // (hosts * limb_axis),
                            limb_axis),
            ("host", "batch", "limb"))
    return Mesh(devices.reshape(n_devices // limb_axis, limb_axis),
                ("batch", "limb"))


def batch_axes(mesh: Mesh):
    """The mesh axis (or axes) the ciphertext-batch dimension shards
    over: ("host", "batch") on a DCN mesh, "batch" otherwise."""
    return ("host", "batch") if "host" in mesh.axis_names else "batch"


def shard_batch(planes: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Place [batch, n_sub, N] planes: batch over "batch" (and "host" on
    a DCN mesh), limbs over "limb" when divisible."""
    bax = batch_axes(mesh)
    limb_parts = mesh.shape["limb"]
    if planes.shape[1] % limb_parts == 0 and limb_parts > 1:
        spec = P(bax, "limb", None)
    else:
        spec = P(bax, None, None)
    return jax.device_put(planes, NamedSharding(mesh, spec))


def replicated(arr, mesh: Mesh):
    return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, P()))


def batch_pipeline_step(dev: DeviceLevelOps):
    """A representative homomorphic step over a sharded ciphertext batch:
    dyadic multiply of two batched size-2 ciphertexts (tensor product),
    an NTT round-trip (as rescale/key-switch do), and the batch-sum of
    results (a cross-ciphertext reduction that exercises the batch-axis
    collective). Returns a function ready for jax.jit."""

    def step(a0, a1, b0, b1):
        c0 = dev.mul(a0, b0)
        c1 = dev.add(dev.mul(a0, b1), dev.mul(a1, b0))
        c2 = dev.mul(a1, b1)
        # NTT round-trip on the middle component (stand-in for the
        # coefficient-domain work rescale/key-switch perform).
        c1 = dev.ntt(dev.intt(c1))
        # Cross-batch reduction (e.g. aggregating encrypted partials).
        total = c0
        for c in (c1, c2):
            total = dev.add(total, c)
        batch_sum = total[0]
        for i in range(1, total.shape[0]):
            batch_sum = dev.add(batch_sum, total[i])
        return c0, c1, c2, batch_sum

    return step
