"""Multi-host (DCN) scaling-efficiency rehearsal harness.

BASELINE.json's north star asks for >=80% scaling efficiency at 2+
hosts. Real multi-host TPU hardware is not available in this
environment, so this harness rehearses the full DCN code path with
jax.distributed over H separate PROCESSES (each owning its local CPU
devices, exactly the multi-controller topology a TPU pod presents) and
measures the scaling efficiency of the representative homomorphic step
(ciphertext tensor product + NTT round-trip + batch reduction,
parallel/sharding.batch_pipeline_step) over a ("host", "batch") mesh.

    python tools/bench_scaling.py [--hosts 2] [--local-devices 1]
                                  [--n 4096] [--limbs 6] [--batch 16]

Every process (the single-device baseline AND each host) is pinned to
its own physical core with taskset, so the devices don't share compute
and the efficiency number reflects the collective/dispatch overhead the
way real per-chip scaling would. With fewer cores than devices the
rehearsal still validates the code path but undercounts efficiency (a
warning is printed).

Prints ONE JSON line from process 0:
    {"metric": "scaling_efficiency", "hosts": H, "devices": D,
     "t1_ct_per_s": ..., "tH_ct_per_s": ..., "efficiency": ...}

Efficiency = (throughput on H hosts) / (H * single-device throughput
measured in-process with the identical step). The ciphertext batch
shards over ("host", "batch") — the zero-communication axis — so on
real DCN hardware the efficiency loss is dispatch + DCN latency only;
this rehearsal validates the topology, the array construction
(jax.make_array_from_process_local_data), and the harness itself."""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def measure(step, args_list, reps: int) -> float:
    """Median wall time of `reps` chained executions."""
    import jax
    out = step(*args_list)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = step(*args_list)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / reps


def make_planes(primes, n, batch, seed):
    import numpy as np
    r = np.random.default_rng(seed)
    out = np.empty((batch, len(primes), n), dtype=np.uint32)
    for i, q in enumerate(primes):
        out[:, i, :] = r.integers(0, q, (batch, n), dtype=np.uint64)
    return out


def child(opts) -> None:
    """One 'host' process: local CPU devices, global mesh over DCN."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={opts.local_devices}")
    # Drop the site hook that force-registers a hardware plugin.
    os.environ["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    import jax
    jax.distributed.initialize(f"127.0.0.1:{opts.port}",
                               num_processes=opts.hosts,
                               process_id=opts.proc)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.environ["PYTHONPATH"])
    from eva_tpu.crypto.primes import build_chain
    from eva_tpu.backend.tables import DeviceLevelOps
    from eva_tpu.parallel import make_device_mesh, batch_pipeline_step

    chain = build_chain([50] * opts.limbs, opts.n)
    primes = [q for e in chain for q in e.primes]
    dev = DeviceLevelOps(primes, opts.n)
    n_dev = opts.hosts * opts.local_devices
    mesh = make_device_mesh(n_dev, limb_axis=1, hosts=opts.hosts)
    sharding = NamedSharding(mesh, P(("host", "batch"), None, None))

    local_b = opts.batch // opts.hosts
    args_list = []
    for s in range(4):
        local = make_planes(primes, opts.n, local_b, 100 * opts.proc + s)
        args_list.append(jax.make_array_from_process_local_data(
            sharding, local, (opts.batch,) + local.shape[1:]))

    # Four workloads: the deployment shape (independent ciphertext
    # batch, zero cross-host communication), the GSPMD reduce shape
    # (XLA-chosen cross-batch all-reduce), and the explicit modular
    # all-reduce in its FLAT (full planes over DCN every butterfly
    # round) vs HIERARCHICAL (ICI reduce-scatter, 1/L-sized DCN
    # exchange, ICI gather) forms — the comparison VERDICT r4 asked the
    # rehearsal to measure.
    step_par = jax.jit(
        lambda a0, a1, b0, b1: batch_pipeline_step(dev)(a0, a1, b0, b1)[:3],
        in_shardings=(sharding,) * 4)
    step_red = jax.jit(batch_pipeline_step(dev),
                       in_shardings=(sharding,) * 4)
    per_par = measure(step_par, args_list, reps=opts.reps)
    per_red = measure(step_red, args_list, reps=opts.reps)

    from eva_tpu.parallel.ks_shard import (_modular_all_reduce,
                                           hierarchical_modular_all_reduce)
    from eva_tpu.parallel.sharding import shard_map_compat
    L = opts.local_devices
    H = opts.hosts

    def local_compute(a0, a1, b0, b1):
        c0 = dev.mul(a0, b0)
        c1 = dev.add(dev.mul(a0, b1), dev.mul(a1, b0))
        c2 = dev.mul(a1, b1)
        c1 = dev.ntt(dev.intt(c1))
        total = dev.add(dev.add(c0, c1), c2)
        part = total[0]
        for i in range(1, total.shape[0]):
            part = dev.add(part, total[i])
        return part  # [rows, N] local modular partial sum

    def body_flat(a0, a1, b0, b1):
        part = local_compute(a0, a1, b0, b1)
        part = _modular_all_reduce(part, dev.q, "batch", L)
        return _modular_all_reduce(part, dev.q, "host", H)

    def body_hier(a0, a1, b0, b1):
        part = local_compute(a0, a1, b0, b1)
        return hierarchical_modular_all_reduce(
            part, dev.q, "batch", L, "host", H)

    in_specs = (P(("host", "batch")),) * 4
    step_flat = jax.jit(shard_map_compat(
        body_flat, mesh=mesh, in_specs=in_specs, out_specs=P()))
    step_hier = jax.jit(shard_map_compat(
        body_hier, mesh=mesh, in_specs=in_specs, out_specs=P()))
    per_flat = measure(step_flat, args_list, reps=opts.reps)
    per_hier = measure(step_hier, args_list, reps=opts.reps)
    if opts.proc == 0:
        print(f"CHILD_RESULT {opts.batch / per_par} {opts.batch / per_red} "
              f"{opts.batch / per_flat} {opts.batch / per_hier}",
              flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=1)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--limbs", type=int, default=6)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--port", type=int, default=9733)
    ap.add_argument("--proc", type=int, default=None)  # internal
    opts = ap.parse_args()
    if opts.proc is not None:
        child(opts)
        return

    # Single-device baseline (one process, one device, same step).
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    base_code = (
        "import sys, time, jax;"
        "sys.path.insert(0, %r);"
        "from eva_tpu.crypto.primes import build_chain;"
        "from eva_tpu.backend.tables import DeviceLevelOps;"
        "from eva_tpu.parallel import batch_pipeline_step;"
        "from tools.bench_scaling import make_planes, measure;"
        "import jax.numpy as jnp;"
        "chain = build_chain([50]*%d, %d);"
        "primes = [q for e in chain for q in e.primes];"
        "dev = DeviceLevelOps(primes, %d);"
        "B = %d;"
        "args = [jnp.asarray(make_planes(primes, %d, B, s)) for s in range(4)];"
        "step_par = jax.jit(lambda a0,a1,b0,b1:"
        " batch_pipeline_step(dev)(a0,a1,b0,b1)[:3]);"
        "step_red = jax.jit(batch_pipeline_step(dev));"
        "step_sum = jax.jit(lambda a0,a1,b0,b1:"
        " batch_pipeline_step(dev)(a0,a1,b0,b1)[3]);"
        "pp = measure(step_par, args, %d);"
        "pr = measure(step_red, args, %d);"
        "ps = measure(step_sum, args, %d);"
        "print('BASE_RESULT', B / pp, B / pr, B / ps, flush=True)"
    ) % (env["PYTHONPATH"], opts.limbs, opts.n, opts.n,
         opts.batch // (opts.hosts * opts.local_devices), opts.n,
         opts.reps, opts.reps, opts.reps)

    import shutil
    ncores = os.cpu_count() or 1
    n_dev_total = opts.hosts * opts.local_devices
    pin = shutil.which("taskset") is not None
    if n_dev_total > ncores:
        sys.stderr.write(
            f"warning: {n_dev_total} devices on {ncores} cores — devices "
            "share compute, efficiency will undercount\n")

    def pinned(cmd, core):
        if pin:
            return ["taskset", "-c", str(core % ncores)] + cmd
        return cmd

    base = subprocess.run(pinned([sys.executable, "-c", base_code], 0),
                          env=env, capture_output=True, text=True,
                          timeout=1200)
    t1 = t1r = t1s = None
    for line in base.stdout.splitlines():
        if line.startswith("BASE_RESULT"):
            parts = line.split()
            t1, t1r, t1s = (float(parts[1]), float(parts[2]),
                            float(parts[3]))
    if t1 is None:
        sys.stderr.write(base.stdout + base.stderr)
        raise SystemExit("single-device baseline failed")

    # H-process DCN rehearsal.
    procs = []
    for i in range(opts.hosts):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--proc", str(i)]
        for k in ("hosts", "local_devices", "n", "limbs", "batch", "reps",
                  "port"):
            cmd += [f"--{k.replace('_', '-')}", str(getattr(opts, k))]
        if pin:
            lo = (i * opts.local_devices) % ncores
            hi = (lo + opts.local_devices - 1) % ncores
            cmd = ["taskset", "-c", f"{lo}-{hi}" if hi >= lo else str(lo)] \
                + cmd
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    tH = tHr = tHf = tHh = None
    outs = [p.communicate(timeout=1200) for p in procs]
    for out, err in outs:
        for line in out.splitlines():
            if line.startswith("CHILD_RESULT"):
                parts = line.split()
                tH, tHr, tHf, tHh = (float(parts[1]), float(parts[2]),
                                     float(parts[3]), float(parts[4]))
    if tH is None:
        for out, err in outs:
            sys.stderr.write(err[-2000:])
        raise SystemExit("multi-host rehearsal failed")

    n_dev = opts.hosts * opts.local_devices
    print(json.dumps({
        "metric": "scaling_efficiency",
        "hosts": opts.hosts,
        "devices": n_dev,
        "local_devices": opts.local_devices,
        "backend": "cpu-rehearsal (multi-process jax.distributed)",
        "t1_ct_per_s": round(t1, 2),
        "tH_ct_per_s": round(tH, 2),
        "efficiency": round(tH / (n_dev * t1), 3),
        "t1_reduce_ct_per_s": round(t1r, 2),
        "tH_reduce_ct_per_s": round(tHr, 2),
        "efficiency_with_reduce": round(tHr / (n_dev * t1r), 3),
        "t1_sum_ct_per_s": round(t1s, 2),
        "tH_flat_modreduce_ct_per_s": round(tHf, 2),
        "efficiency_with_flat_modreduce": round(tHf / (n_dev * t1s), 3),
        "tH_hier_modreduce_ct_per_s": round(tHh, 2),
        "efficiency_with_hierarchical_reduce":
            round(tHh / (n_dev * t1s), 3),
        "hier_vs_flat": round(tHh / tHf, 3) if tHf else None,
    }))


if __name__ == "__main__":
    main()
