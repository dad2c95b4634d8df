"""Whole-graph XLA executor: compiles an entire EVA program into ONE jitted
function over uint32 limb-plane tensors.

This is the TPU-idiomatic replacement for the reference's per-term
interpreter (seal_executor.h dispatches op-by-op through seal::Evaluator;
we instead trace the whole DAG so XLA fuses dyadic chains, batches NTT
stages, and schedules key-switches without host round-trips).

Host/device split follows the protocol roles: encode/encrypt/decrypt are
host-side (client role, float64 FFT); `execute` (server role) is this
module. Raw (never-encrypted) subgraphs stay host-side numpy, exactly as
the reference computes them on plain doubles (seal_executor.h:63-112).

Levels and true scales are static (from the executor plan), so every
tensor shape is static and one jit compilation covers the program."""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..crypto import keys as K
from ..crypto.ciphertext import Ciphertext, Plaintext
from ..crypto.context import CKKSContext
from ..ir import ROTATION, Op, Program, Term, Type
from ..passes import rotation_hoist_sources
from .tables import DeviceLevelOps

_LEVEL_OPS_CACHE: Dict[Tuple[int, ...], DeviceLevelOps] = {}


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across processes. Whole-program HE graphs
    take minutes to compile over remote TPU runtimes; the cache makes
    that a once-per-program cost. Opt out with EVA_TPU_NO_COMPILE_CACHE."""
    import os
    if os.environ.get("EVA_TPU_NO_COMPILE_CACHE"):
        return
    if jax.config.jax_compilation_cache_dir:
        return
    cache_dir = os.environ.get(
        "EVA_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "eva_tpu", "xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail execution over it


_enable_compilation_cache()


def level_ops(primes: List[int], n: int) -> DeviceLevelOps:
    key = tuple(primes)
    if key not in _LEVEL_OPS_CACHE:
        _LEVEL_OPS_CACHE[key] = DeviceLevelOps(primes, n)
    return _LEVEL_OPS_CACHE[key]


def _to_u32(arr: np.ndarray) -> np.ndarray:
    return arr.astype(np.uint32)


from .modmath import to_mont, to_mont_rows as _to_mont_rows  # shared converters


@lru_cache(maxsize=None)
def _ks_dev_tables(ctx, level: int, alpha: int):
    """Montgomery-form fast-base-extension constants for hybrid key-switch
    decomposition (see CKKSContext.ks_tables). Returned as numpy so they
    embed as trace constants.

    inv_mont: [n_cur, 1] — [(Qg_t/q_t)^-1]_{q_t} in Montgomery form of q_t
    conv_mont: [n_groups*alpha, n_ext, 1] — (Qg_t/q_t) mod basis[i] in
      Montgomery form of basis[i]; padding rows (beyond n_cur) are zero."""
    primes = ctx.primes_at_level(level)
    basis = primes + ctx.key_primes
    groups, inv, conv = ctx.ks_tables(level, alpha)
    n_groups = len(groups)
    n_cur = len(primes)
    inv_mont = np.empty((n_cur, 1), dtype=np.uint32)
    for t, q in enumerate(primes):
        inv_mont[t, 0] = to_mont(np.array([inv[t]], dtype=np.uint64), q)[0]
    conv_mont = np.zeros((n_groups * alpha, len(basis), 1), dtype=np.uint32)
    for i, q in enumerate(basis):
        conv_mont[:n_cur, i, 0] = to_mont(conv[:, i], q)
    return n_groups, inv_mont, conv_mont


class DeviceKeys:
    """Key material converted to device form (Montgomery uint32)."""

    def __init__(self, ctx: CKKSContext, keys: K.KeySet):
        basis = ctx.all_primes
        self.relin = self._convert_ksk(keys.relin, basis)
        self.galois = {g: self._convert_ksk(k, basis)
                       for g, k in keys.galois.items()}

    @staticmethod
    def _convert_ksk(ksk: K.KSwitchKey, primes: List[int]):
        k0 = np.stack([_to_mont_rows(d, primes) for d in ksk.k0])
        k1 = np.stack([_to_mont_rows(d, primes) for d in ksk.k1])
        return jnp.asarray(k0), jnp.asarray(k1)  # [n_digits, n_all, N]


_DEVICE_KEYS_CACHE: Dict[int, DeviceKeys] = {}


def device_keys(ctx: CKKSContext, keys: K.KeySet) -> DeviceKeys:
    key = id(keys)
    if key not in _DEVICE_KEYS_CACHE:
        _DEVICE_KEYS_CACHE[key] = DeviceKeys(ctx, keys)
    return _DEVICE_KEYS_CACHE[key]


class JaxProgram:
    """Traces a compiled EVA program into a single jitted function."""

    def __init__(self, program: Program, ctx: CKKSContext, keys: K.KeySet,
                 plan, types, order: List[Term]):
        self.program = program
        self.ctx = ctx
        self.keys = keys
        self.plan = plan
        self.types = types
        self.order = order
        self.dkeys = device_keys(ctx, keys)
        # Nodes consumed by fused pairs, in both adjacency orders.
        self._fused_rescales = {
            t.operands[0].index for t in order
            if t.op == Op.Relinearize
            and t.operands[0].op == Op.Rescale
            and len(t.operands[0].uses) == 1}
        self._fused_relins = {
            t.operands[0].index for t in order
            if t.op == Op.Rescale
            and t.operands[0].op == Op.Relinearize
            and len(t.operands[0].uses) == 1}
        self._hoisted_sources = rotation_hoist_sources(order)
        self._jitted = jax.jit(self._traced)
        self._sharded_cache: Dict[int, object] = {}

    def _sharded_jit(self, mesh, cipher_in, plain_in):
        """jit(shard_map(traced)) for a mesh, cached per mesh (Pallas
        kernels cannot be auto-partitioned; shard_map runs the program
        per-shard on each device's local batch slice)."""
        key = id(mesh)
        if key not in self._sharded_cache:
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P
            specs = jax.tree.map(lambda _: P("batch"), (cipher_in, plain_in))
            out_specs = jax.tree.map(
                lambda _: P("batch"),
                jax.eval_shape(self._traced, cipher_in, plain_in))
            self._sharded_cache[key] = jax.jit(shard_map(
                lambda c, p: self._traced(c, p),
                mesh=mesh, in_specs=specs, out_specs=out_specs,
                check_rep=False))
        return self._sharded_cache[key]

    # -- device op helpers ---------------------------------------------------

    def _ops_at(self, level: int) -> DeviceLevelOps:
        return level_ops(self.ctx.primes_at_level(level), self.ctx.n)

    def _ext_ops_at(self, level: int) -> DeviceLevelOps:
        return level_ops(self.ctx.primes_at_level(level) + self.ctx.key_primes,
                         self.ctx.n)

    def _ks_digits(self, poly, level: int):
        """Gadget decomposition digits, NTT'd in the extended basis — the
        dominant key-switch cost (n_cur * n_ext limb NTTs). Separated so
        hoisted rotations can compute it ONCE per source ciphertext."""
        dev = self._ops_at(level)
        return self._ks_digits_from_coeffs(dev.intt(poly), level)

    def _ks_digits_from_coeffs(self, coeffs, level: int):
        """Digits from COEFFICIENT-domain input (fusion entry point).

        alpha=1: the raw residue rows broadcast into every basis row are
        valid unreduced inputs (the NTT twist performs per-prime
        reduction), so decomposition is free. alpha>1 (hybrid digits):
        fast base extension D_j mod q_i = sum_t (d_t*inv_t mod q_t) *
        conv[t][i] — a couple of elementwise Montgomery multiplies — then
        alpha-times FEWER rows go through the NTT, the dominant cost.
        Bit-identical to crypto/ops._ks_digits_from_coeffs."""
        ctx = self.ctx
        primes = ctx.primes_at_level(level)
        ext = self._ext_ops_at(level)
        n_cur = len(primes)
        n_ext = n_cur + len(ctx.key_primes)
        alpha = self.keys.ks_alpha
        if alpha == 1:
            stacked = jnp.broadcast_to(
                coeffs[..., :, None, :],
                coeffs.shape[:-2] + (n_cur, n_ext, ctx.n))
            d_ntt = ext.ntt(stacked)
            return [d_ntt[..., j, :, :] for j in range(n_cur)]
        dev = self._ops_at(level)
        n_groups, inv_mont, conv_mont = _ks_dev_tables(ctx, level, alpha)
        y = dev.mul_mont(coeffs, inv_mont)  # [..., n_cur, N], y_t < q_t
        pad = n_groups * alpha - n_cur
        if pad:
            y = jnp.concatenate(
                [y, jnp.zeros(y.shape[:-2] + (pad, ctx.n), y.dtype)], axis=-2)
        yb = jnp.broadcast_to(
            y[..., :, None, :],
            y.shape[:-2] + (n_groups * alpha, n_ext, ctx.n))
        prod = ext.mul_mont(yb, conv_mont)  # reduces mod basis[i]
        g = prod.reshape(prod.shape[:-3] + (n_groups, alpha, n_ext, ctx.n))
        acc = g[..., 0, :, :]
        for k in range(1, alpha):
            acc = ext.add(acc, g[..., k, :, :])
        d_ntt = ext.ntt(acc)  # [..., n_groups, n_ext, N]
        return [d_ntt[..., j, :, :] for j in range(n_groups)]

    def _ks_apply(self, digits, level: int, ksk0, ksk1, perm=None,
                  coeff_out=False):
        """Inner product of (optionally permuted) digits with a key-switch
        key, followed by division by the special modulus P.

        `perm` applies a Galois automorphism in the NTT domain. Digit
        decomposition commutes with automorphisms coefficient-wise
        (D_j(sigma(x)) = sigma(D_j(x)), residues mod q_j are permuted with
        sign exactly like coefficients), so hoisted rotations permute the
        shared digit NTTs instead of re-decomposing."""
        ctx = self.ctx
        primes = ctx.primes_at_level(level)
        n_cur = len(primes)
        ext = self._ext_ops_at(level)
        n_all_data = len(ctx.data_primes)
        row_idx = np.array(
            list(range(n_cur)) + [n_all_data + i
                                  for i in range(len(ctx.key_primes))])
        # Stack digits on a leading axis, apply one permutation/multiply,
        # and tree-reduce the modular sums (fewer, larger fused ops).
        d_stack = jnp.stack(digits, axis=-3)  # [..., n_dig, n_ext, N]
        if perm is not None:
            d_stack = jnp.take(d_stack, perm, axis=-1)
        k0 = ksk0[:len(digits), row_idx]  # [n_dig, n_ext, N]
        k1 = ksk1[:len(digits), row_idx]
        t0 = ext.mul_mont(d_stack, k0)
        t1 = ext.mul_mont(d_stack, k1)

        def tree_sum(t):
            while t.shape[-3] > 1:
                m = t.shape[-3]
                half = m // 2
                lo = t[..., :half, :, :]
                hi = t[..., half:2 * half, :, :]
                rest = t[..., 2 * half:, :, :]
                t = jnp.concatenate([ext.add(lo, hi), rest], axis=-3)
            return t[..., 0, :, :]

        acc0 = tree_sum(t0)
        acc1 = tree_sum(t1)

        def div_p(acc):
            coeffs_ext = ext.intt(acc)
            prim = primes + list(self.ctx.key_primes)
            x = coeffs_ext
            for _ in self.ctx.key_primes:
                x = self._divide_last(x, prim)
                prim = prim[:-1]
            return x if coeff_out else level_ops(prim, ctx.n).ntt(x)

        return div_p(acc0), div_p(acc1)

    def _key_switch(self, poly, level: int, ksk0, ksk1):
        return self._ks_apply(self._ks_digits(poly, level), level, ksk0, ksk1)

    def _divide_last(self, coeffs, primes: List[int]):
        """Divide-and-round coefficient planes by the last prime.

        r_i = (x_i - centered([x]_p)) / p  mod q_i, computed as
        mont_mul(x_i + p - lift, p^-1) minus 1 when lift was not centered
        up (see backend notes: x_i + p - lift < 2^32 always)."""
        p = primes[-1]
        rest = primes[:-1]
        dev = level_ops(rest, self.ctx.n)
        lift = coeffs[..., -1, :]  # [..., N] standard residues < p
        flag_high = lift > (p // 2)  # centered lift is negative
        pinv_mont = np.empty((len(rest), 1), dtype=np.uint32)
        for i, q in enumerate(rest):
            inv = pow(p % q, q - 2, q)
            pinv_mont[i, 0] = (inv << 32) % q
        # < 2^32, no wrap
        v = coeffs[..., :-1, :] + (np.uint32(p) - lift)[..., None, :]
        r = dev.mul_mont(v, pinv_mont)
        # When lift <= p/2 we computed (x - lift + p)/p = want + 1.
        corr = jnp.where(flag_high[..., None, :], jnp.uint32(0), jnp.uint32(1))
        return dev.sub(r, corr)

    def _rescale(self, polys, level: int):
        ctx = self.ctx
        primes = ctx.primes_at_level(level)
        entry = ctx.entries_at_level(level)[-1]
        dev = self._ops_at(level)
        out = []
        for c in polys:
            x = dev.intt(c)
            prim = list(primes)
            for _ in entry.primes:
                x = self._divide_last(x, prim)
                prim = prim[:-1]
            out.append(level_ops(prim, ctx.n).ntt(x))
        return out

    # -- trace ---------------------------------------------------------------

    def _traced(self, cipher_in: Dict[str, List[jnp.ndarray]],
                plain_in: Dict[str, jnp.ndarray]):
        ctx = self.ctx
        vals: Dict[int, object] = {}
        hoist: Dict[int, list] = {}  # per-source rotation digit cache

        for name, term in self.program.inputs.items():
            key = f"t{term.index}"
            if key in cipher_in:
                vals[term.index] = list(cipher_in[key])
            elif key in plain_in:
                vals[term.index] = ("plain", plain_in[key])

        for term in self.order:
            op = term.op
            idx = term.index
            if self.types[term] == Type.Raw or op in (Op.Input, Op.Constant):
                continue
            if op == Op.Encode:
                vals[idx] = ("plain", plain_in[f"t{idx}"])
                continue
            p = self.plan[idx]
            dev = self._ops_at(p.level)
            args = term.operands
            if op in (Op.Add, Op.Sub, Op.Mul):
                vals[idx] = self._binop(term, vals, dev)
            elif op == Op.Negate:
                vals[idx] = [dev.neg(c) for c in vals[args[0].index]]
            elif op in (Op.RotateLeftConst, Op.RotateRightConst):
                steps = term.get_attr(ROTATION)
                if op == Op.RotateRightConst:
                    steps = -steps
                if args[0].index in self._hoisted_sources:
                    vals[idx] = self._rotate(vals[args[0].index], steps,
                                             p.level, dev, hoist,
                                             args[0].index)
                else:
                    vals[idx] = self._rotate(vals[args[0].index], steps,
                                             p.level, dev)
            elif op == Op.Relinearize:
                if idx in self._fused_relins:
                    vals[idx] = vals[args[0].index]  # deferred into Rescale
                elif args[0].index in self._fused_rescales:
                    prev = self.plan[args[0].operands[0].index]
                    vals[idx] = self._rescale_relin(
                        vals[args[0].index], prev.level)
                else:
                    vals[idx] = self._relin(vals[args[0].index], p.level, dev)
            elif op == Op.ModSwitch:
                v = vals[args[0].index]
                keep = len(ctx.primes_at_level(p.level))
                if isinstance(v, tuple):
                    vals[idx] = ("plain", v[1][..., :keep, :])
                else:
                    vals[idx] = [c[..., :keep, :] for c in v]
            elif op == Op.Rescale:
                if idx in self._fused_rescales:
                    vals[idx] = vals[args[0].index]  # deferred into relin
                elif args[0].index in self._fused_relins:
                    prev = self.plan[args[0].operands[0].index]
                    vals[idx] = self._relin_rescale(
                        vals[args[0].index], prev.level)
                else:
                    prev = self.plan[args[0].index]
                    vals[idx] = self._rescale(vals[args[0].index], prev.level)
            elif op == Op.Output:
                vals[idx] = vals[args[0].index]
            else:
                raise RuntimeError(f"unsupported op in jax backend: {op.name}")

        out = {}
        for name, t in self.program.outputs.items():
            if self.types[t] == Type.Raw:
                continue  # raw outputs are computed host-side
            v = vals[t.index]
            out[name] = (v[1],) if isinstance(v, tuple) else tuple(v)
        return out

    def _binop(self, term: Term, vals, dev: DeviceLevelOps):
        a = vals[term.operands[0].index]
        b = vals[term.operands[1].index]
        op = term.op
        a_plain = isinstance(a, tuple)
        b_plain = isinstance(b, tuple)
        if not a_plain and not b_plain:
            if op == Op.Mul:
                a0, a1 = a
                b0, b1 = b
                return dev.tensor_product(a0, a1, b0, b1)
            f = dev.add if op == Op.Add else dev.sub
            n = max(len(a), len(b))
            out = []
            for i in range(n):
                if i < len(a) and i < len(b):
                    out.append(f(a[i], b[i]))
                elif i < len(a):
                    out.append(a[i])
                else:
                    out.append(b[i] if op == Op.Add else dev.neg(b[i]))
            return out
        if a_plain and not b_plain:
            if op == Op.Sub:
                raise RuntimeError("plain - cipher should have been lowered")
            a, b = b, a
        pt = b[1]
        if op == Op.Add:
            return [dev.add(a[0], pt)] + list(a[1:])
        if op == Op.Sub:
            return [dev.sub(a[0], pt)] + list(a[1:])
        return [dev.mul(c, pt) for c in a]

    def _relin(self, polys, level: int, dev: DeviceLevelOps):
        if len(polys) == 2:
            return list(polys)
        k0, k1 = self.dkeys.relin
        d0, d1 = self._key_switch(polys[2], level, k0, k1)
        return [dev.add(polys[0], d0), dev.add(polys[1], d1)]

    def _relin_rescale(self, polys, level: int):
        """Fused Relinearize -> Rescale (eager-relin adjacency): key-switch
        output stays in the coefficient domain, added to the iNTT'd
        c0/c1, then one rescale division + NTT at the new level."""
        ctx = self.ctx
        primes = ctx.primes_at_level(level)
        entry = ctx.entries_at_level(level)[-1]
        new_primes = primes[:len(primes) - len(entry.primes)]
        dev = self._ops_at(level)
        dev_new = level_ops(new_primes, ctx.n)
        coeffs0 = dev.intt(polys[0])
        coeffs1 = dev.intt(polys[1])
        if len(polys) == 3:
            digits = self._ks_digits(polys[2], level)
            k0, k1 = self.dkeys.relin
            d0, d1 = self._ks_apply(digits, level, k0, k1, coeff_out=True)
            dev_cur = level_ops(primes, ctx.n)
            coeffs0 = dev_cur.add(coeffs0, d0)
            coeffs1 = dev_cur.add(coeffs1, d1)

        def div(x):
            prim = list(primes)
            for _ in entry.primes:
                x = self._divide_last(x, prim)
                prim = prim[:-1]
            return dev_new.ntt(x)

        return [div(coeffs0), div(coeffs1)]

    def _rescale_relin(self, polys, level: int):
        """Fused Rescale -> Relinearize: coefficient-domain between steps,
        rescaled c2 feeds digit decomposition directly, correction added
        before the single final NTT (bit-identical to the unfused pair)."""
        ctx = self.ctx
        primes = ctx.primes_at_level(level)
        entry = ctx.entries_at_level(level)[-1]
        new_level = level + 1
        new_primes = primes[:len(primes) - len(entry.primes)]
        dev_new = level_ops(new_primes, ctx.n)
        dev = self._ops_at(level)
        coeffs = []
        for c in polys:
            x = dev.intt(c)
            prim = list(primes)
            for _ in entry.primes:
                x = self._divide_last(x, prim)
                prim = prim[:-1]
            coeffs.append(x)
        if len(polys) == 2:
            return [dev_new.ntt(c) for c in coeffs]
        digits = self._ks_digits_from_coeffs(coeffs[2], new_level)
        k0, k1 = self.dkeys.relin
        d0, d1 = self._ks_apply(digits, new_level, k0, k1, coeff_out=True)
        return [dev_new.ntt(dev_new.add(coeffs[0], d0)),
                dev_new.ntt(dev_new.add(coeffs[1], d1))]

    def _rotate(self, polys, steps: int, level: int, dev: DeviceLevelOps,
                hoist=None, src_key=None):
        """Galois rotation.

        Sources rotated >=2 times use hoisting: the digit decomposition of
        c1 is computed once and PERMUTED per rotation. Single rotations
        permute c1 FIRST and decompose the permuted polynomial: gathers
        are among the most expensive TPU ops, and permuting the 2 input
        rows costs ~(n_digits*n_ext)/n_cur times less than permuting the
        digit stack. The hoist/permute-first decision depends only on the
        program (rotation counts per source), so the numpy backend makes
        the identical choice and results stay bit-identical."""
        ctx = self.ctx
        if steps % (ctx.n // 2) == 0:
            return list(polys)
        g = ctx.galois_elt(steps)
        perm = ctx.perm_for_elt(g)
        c0 = jnp.take(polys[0], perm, axis=-1)
        k0, k1 = self.dkeys.galois[g]
        if hoist is not None and src_key is not None:
            digits = hoist.get(src_key)
            if digits is None:
                digits = self._ks_digits(polys[1], level)
                hoist[src_key] = digits
            d0, d1 = self._ks_apply(digits, level, k0, k1, perm=perm)
        else:
            c1 = jnp.take(polys[1], perm, axis=-1)
            digits = self._ks_digits(c1, level)
            d0, d1 = self._ks_apply(digits, level, k0, k1)
        return [dev.add(c0, d0), d1]

    # -- run -----------------------------------------------------------------

    def run_batched(self, host_values_list, mesh=None):
        """Execute one compiled program over a BATCH of input valuations.

        Stacks each cipher/plain input along a leading batch axis
        ([B, n_sub, N] planes); every device op broadcasts over leading
        dims, so the same traced program executes the whole batch in one
        XLA invocation. With a mesh, the batch axis is sharded across
        devices via shard_map — Pallas (Mosaic) kernels cannot be
        auto-partitioned by jit, so the program runs per-shard on each
        device's local batch slice (embarrassingly parallel; the
        reference's multicore task-parallelism mapped to chips;
        SURVEY.md §2.9). Batches not divisible by the mesh's batch axis
        are padded with copies of the last element and trimmed after."""
        import jax as _jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch = len(host_values_list)
        if batch == 0:
            return []
        pad = 0
        if mesh is not None:
            n_batch_devices = mesh.shape["batch"]
            rem = batch % n_batch_devices
            if rem:
                pad = n_batch_devices - rem
                host_values_list = (list(host_values_list)
                                    + [host_values_list[-1]] * pad)

        def place(arr):
            if mesh is None:
                return arr
            return _jax.device_put(arr, NamedSharding(mesh, P("batch")))

        cipher_in = {}
        plain_in = {}
        first = host_values_list[0]
        for idx, v in first.items():
            key = f"t{idx}"
            if isinstance(v, Ciphertext):
                cipher_in[key] = [
                    place(jnp.asarray(np.stack(
                        [_to_u32(hv[idx].polys[k]) for hv in host_values_list])))
                    for k in range(v.size)]
            elif isinstance(v, Plaintext):
                plain_in[key] = place(jnp.asarray(np.stack(
                    [_to_u32(hv[idx].poly) for hv in host_values_list])))

        if mesh is None:
            out = self._jitted(cipher_in, plain_in)
        else:
            out = self._sharded_jit(mesh, cipher_in, plain_in)(
                cipher_in, plain_in)
        results = [dict() for _ in range(batch)]
        for name, t in self.program.outputs.items():
            if self.types[t] == Type.Raw:
                continue
            planes = [np.asarray(c).astype(np.uint64) for c in out[name]]
            p = self.plan[t.index]
            for b in range(batch):
                if self.types[t] == Type.Plain:
                    results[b][name] = Plaintext(planes[0][b], p.level, p.scale)
                else:
                    results[b][name] = Ciphertext(
                        [pl[b] for pl in planes], p.level, p.scale)
        return results

    def run(self, host_values: Dict[int, object]) -> Dict[str, Ciphertext]:
        """host_values: term index -> Ciphertext (inputs) or Plaintext
        (inputs + encodes, already host-encoded). Returns output name ->
        Ciphertext (numpy, uint64)."""
        cipher_in = {}
        plain_in = {}
        for idx, v in host_values.items():
            if isinstance(v, Ciphertext):
                cipher_in[f"t{idx}"] = [jnp.asarray(_to_u32(c)) for c in v.polys]
            elif isinstance(v, Plaintext):
                plain_in[f"t{idx}"] = jnp.asarray(_to_u32(v.poly))
        out = self._jitted(cipher_in, plain_in)
        result = {}
        for name, t in self.program.outputs.items():
            if self.types[t] == Type.Raw:
                continue
            planes = [np.asarray(c).astype(np.uint64) for c in out[name]]
            p = self.plan[t.index]
            if self.types[t] == Type.Plain:
                result[name] = Plaintext(planes[0], p.level, p.scale)
            else:
                result[name] = Ciphertext(planes, p.level, p.scale)
        return result
