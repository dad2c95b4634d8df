"""Mesh sharding for ciphertext batches and RNS limb planes.

Batched ciphertext planes have shape [batch, n_sub, N]:
  * `batch` shards over the mesh "batch" axis (independent ciphertexts;
    zero communication),
  * `n_sub` (RNS limbs) shards over the mesh "limb" axis — dyadic ops and
    NTTs are limb-local; rescale needs the dropped limb's row on every
    limb shard, which XLA lowers to a small all-gather/collective-permute
    over ICI,
  * `N` shards over the mesh "seq" axis when requested
    (make_device_mesh seq_axis=D): the whole-graph executor runs every
    NTT as the two four-step phases with ONE all-to-all between them
    (seq_exec/ntt_shard) and lifts automorphisms over the shard
    boundary. Batch/limb parallelism stays cheaper for throughput (no
    collective on the hot path); the seq axis is the latency lever when
    a single execution must go faster than one chip."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..backend.tables import DeviceLevelOps


def shard_map_compat(f, mesh, in_specs, out_specs):
    """jax.shard_map across JAX versions: the experimental API's
    check_rep flag became check_vma when shard_map moved to jax core;
    replication checking stays OFF (program bodies mix per-shard Pallas
    calls and explicit collectives the checker cannot type)."""
    try:
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except (AttributeError, TypeError):
        from jax.experimental.shard_map import shard_map
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def eval_jaxpr_compat(jaxpr, consts, *args):
    """jax.core.eval_jaxpr across JAX versions: the jax.core re-export
    is deprecation-prone (same churn class as shard_map above); the
    fallback goes through the public jax.extend.core surface. `consts`
    may be tracers (the caller passes hoisted constants as jit
    arguments), which both paths accept."""
    try:
        return jax.core.eval_jaxpr(jaxpr, consts, *args)
    except AttributeError:
        from jax.extend.core import ClosedJaxpr, jaxpr_as_fun
        return jaxpr_as_fun(ClosedJaxpr(jaxpr, consts))(*args)


def check_ici_axes(dev_array: np.ndarray, names) -> None:
    """Refuse collective-bearing mesh axes ("limb", "seq") that span
    host (process) boundaries. Their collectives are per-key-switch /
    per-NTT and DCN latency-bound: the 2-host rehearsal measured 0.34
    scaling efficiency with a per-execution cross-host all-reduce
    (tools/bench_scaling.py, SCALING.json) vs ~1.0 for batch-parallel —
    far below the >=0.8 target, so the mesh constructor fences it. Only
    the zero-communication batch axis (and the explicit "host" axis)
    may cross DCN. EVA_TPU_ALLOW_DCN_LIMB=1 overrides for
    experimentation."""
    import os
    if os.environ.get("EVA_TPU_ALLOW_DCN_LIMB"):
        return
    proc = np.vectorize(lambda d: getattr(d, "process_index", 0))(dev_array)
    for ax_name in ("limb", "seq"):
        if ax_name not in names:
            continue
        ax = names.index(ax_name)
        if dev_array.shape[ax] == 1:
            continue
        first = np.take(proc, [0], axis=ax)
        if not (proc == first).all():
            raise ValueError(
                f'mesh axis "{ax_name}" spans multiple hosts (processes '
                f"{sorted(set(proc.ravel().tolist()))}): its per-op "
                f"collectives would ride DCN at ~0.34 scaling efficiency "
                f"(SCALING.json; target >=0.8). Shard digits across hosts "
                f'with the "hlimb" axis instead (make_device_mesh '
                f"dcn_limb=H): its accumulation is the hierarchical "
                f"modular all-reduce, whose DCN hop carries 1/limb of the "
                f"plane bytes (parallel/ks_shard). Or set "
                f"EVA_TPU_ALLOW_DCN_LIMB=1 to override.")


def make_device_mesh(n_devices: Optional[int] = None, limb_axis: int = 1,
                     devices=None, hosts: int = 1,
                     seq_axis: int = 1, dcn_limb: int = 1) -> Mesh:
    """Mesh over the available devices: ("batch", "limb"), with
    hosts > 1 a leading "host" axis, with seq_axis > 1 a trailing
    "seq" axis (the ring dimension N of every polynomial sharded — the
    sequence-parallel / latency axis; parallel/seq_exec), and with
    dcn_limb > 1 a leading "hlimb" axis — a SECOND digit axis that MAY
    span host processes.

    The host axis is the DCN dimension: under jax.distributed each
    process contributes its local devices, jax.devices() returns the
    global list ordered by process, and reshaping (hosts, ...) first
    puts each host's devices in one "host" row — so "batch"/"limb"/
    "seq" collectives ride ICI within a host while only the batch
    sharding (zero communication) crosses DCN. Executors treat
    ("host", "batch") together as the batch sharding axes.

    "hlimb" shards key-switch digits ACROSS hosts: its accumulation is
    the hierarchical modular all-reduce (ICI reduce-scatter over
    "limb", one 1/limb-sized DCN butterfly over "hlimb", ICI gather —
    parallel/ks_shard.hierarchical_modular_all_reduce), so the DCN hop
    carries 1/limb of the plane bytes the flat butterfly would. hosts
    and dcn_limb are mutually exclusive (both claim the process
    dimension)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.array(devices[:n_devices])
    assert not (hosts > 1 and dcn_limb > 1), \
        "hosts and dcn_limb both claim the process dimension"
    assert dcn_limb == 1 or limb_axis > 1, (
        "dcn_limb needs an intra-host limb axis > 1: the hierarchical "
        "all-reduce's DCN saving is 1/limb_axis of the plane bytes")
    assert n_devices % (limb_axis * hosts * seq_axis * dcn_limb) == 0
    batch = n_devices // (hosts * limb_axis * seq_axis * dcn_limb)
    shape, names = [batch, limb_axis], ["batch", "limb"]
    if seq_axis > 1:
        shape.append(seq_axis)
        names.append("seq")
    if hosts > 1:
        shape.insert(0, hosts)
        names.insert(0, "host")
    if dcn_limb > 1:
        shape.insert(0, dcn_limb)
        names.insert(0, "hlimb")
    arr = devices.reshape(shape)
    check_ici_axes(arr, names)
    return Mesh(arr, tuple(names))


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
