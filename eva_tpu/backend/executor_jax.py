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

from collections import OrderedDict
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
    # n MUST be part of the key: the same prime can serve two ring sizes
    # (q = 1 mod 2*16384 implies q = 1 mod 2*8192), and a fuzz campaign
    # hit exactly that collision across two programs in one process.
    key = (tuple(primes), n)
    if key not in _LEVEL_OPS_CACHE:
        _LEVEL_OPS_CACHE[key] = DeviceLevelOps(primes, n)
    return _LEVEL_OPS_CACHE[key]


def _to_u32(arr: np.ndarray) -> np.ndarray:
    return arr.astype(np.uint32)


def divide_last_planes(coeffs, primes: List[int], dev: "DeviceLevelOps"):
    """Divide-and-round coefficient planes by the last prime.

    r_i = (x_i - centered([x]_p)) / p  mod q_i, computed as
    mont_mul(x_i + p - lift, p^-1) minus 1 when lift was not centered
    up (see backend notes: x_i + p - lift < 2^32 always). `dev` is the
    level-ops instance for primes[:-1] — module-level so tools
    (profiling) can call it without a JaxProgram shim."""
    import jax.numpy as jnp

    p = primes[-1]
    rest = primes[:-1]
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


def _plain_np(pt) -> np.ndarray:
    """Host plaintext planes for upload: the data-prime rows, with the
    extended-basis (key-prime) rows appended when the encode carries them
    (Plaintext.ext; rotation-sum baby-step fusion). The trace detects the
    extra rows by shape — rows :n_cur are exactly the normal encoding."""
    arr = _to_u32(pt.poly)
    if getattr(pt, "ext", None) is not None:
        arr = np.concatenate([arr, _to_u32(pt.ext)], axis=-2)
    return arr


def _hoist_consts_jit(fn, example_args, const_sharding=None):
    """jit(fn) with every captured array hoisted into an argument.

    Plain jit bakes closed-over arrays (key layouts, NTT/FBE tables,
    automorphism one-hots) into the HLO as literal constants — the Sobel
    module lowered to ~380 MB of text with ~2700 large dense constants
    and compiled in 96 s cold, and the executable hash depended on the
    key material (every new key set was a compile-cache miss).
    make_jaxpr surfaces the captures as jaxpr consts; they are
    device_put once (deduped by host-array identity, optionally with a
    replicated mesh sharding) and passed as arguments per call, so the
    lowered module carries no key/table bytes. (jax.closure_convert is
    unsuitable: it hoists only AD-perturbable consts, and every plane
    here is uint32/int8.) Consts captured inside shard_map bodies are
    surfaced at the outer level with replication preserved."""
    from jax import tree_util

    flat_in, in_tree = tree_util.tree_flatten(example_args)
    out_tree_box = []

    def flat_fn(*flat):
        args = tree_util.tree_unflatten(in_tree, flat)
        out_flat, out_tree = tree_util.tree_flatten(fn(*args))
        out_tree_box.append(out_tree)
        return out_flat

    closed = jax.make_jaxpr(flat_fn)(*flat_in)
    bufs: Dict[int, object] = {}

    def put(c):
        if const_sharding is not None and getattr(c, "ndim", 1) > 0:
            return jax.device_put(c, const_sharding)
        return jax.device_put(c)

    consts = [bufs.setdefault(id(c), put(c)) for c in closed.consts]
    jaxpr, out_tree = closed.jaxpr, out_tree_box[0]
    from ..parallel.sharding import eval_jaxpr_compat
    jitted = jax.jit(lambda cs, flat: eval_jaxpr_compat(jaxpr, cs, *flat))

    def call(*args):
        flat, _ = tree_util.tree_flatten(args)
        return tree_util.tree_unflatten(out_tree, jitted(consts, flat))

    return call


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


@lru_cache(maxsize=None)
def _ks_dp_tables(ctx, level: int, alpha: int, n_dev: int):
    """Digit-parallel decomposition tables for one (level, alpha),
    padded so the digit axis splits evenly over n_dev mesh devices.

    member[j, k] = data-prime index of the k-th member of digit group j
                   (0 for padding slots — their conv rows are zero, so
                   they contribute exact zeros to the psum)
    conv_m[j, k, i, 0] = (Qg_j/q_member) mod basis[i], Montgomery form"""
    primes = ctx.primes_at_level(level)
    basis = primes + ctx.key_primes
    groups, _, conv = ctx.ks_tables(level, alpha)
    n_groups = len(groups)
    n_dig = n_groups + (-n_groups % n_dev)
    member = np.zeros((n_dig, alpha), dtype=np.int32)
    conv_m = np.zeros((n_dig, alpha, len(basis), 1), dtype=np.uint32)
    for j, g in enumerate(groups):
        for k, t in enumerate(g):
            member[j, k] = t
            for i, q in enumerate(basis):
                conv_m[j, k, i, 0] = to_mont(
                    np.array([conv[t, i]], dtype=np.uint64), q)[0]
    return member, conv_m


@lru_cache(maxsize=None)
def _ks_maps(ctx, level: int, alpha: int):
    """Static digit-layout maps for one (level, alpha).

    owner[t]  = digit index whose group contains data prime t
    sel[k, t] = the k-th digit != owner[t] (foreign-digit enumeration)"""
    groups, _, _ = ctx.ks_tables(level, alpha)
    n_cur = len(ctx.primes_at_level(level))
    n_groups = len(groups)
    owner = np.empty(n_cur, dtype=np.int32)
    for j, g_j in enumerate(groups):
        for t in g_j:
            owner[t] = j
    sel = np.empty((n_groups - 1, n_cur), dtype=np.int32)
    for t in range(n_cur):
        sel[:, t] = [k if k < owner[t] else k + 1
                     for k in range(n_groups - 1)]
    return n_groups, owner, sel


class DevPerm:
    """NTT-domain Galois automorphism applicator for device planes.

    On TPU the flat N-lane gather (jnp.take) is replaced by a fixed
    sublane row permutation plus per-row 128-lane permutations executed
    as one-hot int8 matmuls on the MXU. The automorphism is affine in
    natural index order (t -> g*t + (g-1)/2 mod N), so conjugated by the
    bit-reversed storage order every output row reads exactly one input
    row (asserted at build). Bit-exact: each output byte is an int8
    matmul sum with exactly one nonzero term; measured 2.3x faster than
    the gather at N=16384x12 (11.3 vs 26.3 us). Falls back to jnp.take
    off-TPU, for small rings, or if EVA_TPU_NO_MXU_PERM is set.

    Reference counterpart: the slot permutation inside SEAL's
    apply_galois (SURVEY.md §2.8); the MXU formulation is TPU-native."""

    LANE = 128

    def __init__(self, perm: np.ndarray):
        import os
        perm = np.asarray(perm)
        self.perm = jnp.asarray(perm)
        n = perm.shape[0]
        self.n = n
        self.mxu = (jax.default_backend() == "tpu" and n % self.LANE == 0
                    and n >= 1024
                    and not os.environ.get("EVA_TPU_NO_MXU_PERM"))
        if not self.mxu:
            return
        n2 = self.LANE
        n1 = n // n2
        p2d = perm.reshape(n1, n2)
        row, col = p2d // n2, p2d % n2
        if not (row == row[:, :1]).all():  # pragma: no cover - defensive
            self.mxu = False
            return
        self.n1, self.n2 = n1, n2
        self.rrow = jnp.asarray(row[:, 0])
        onehot = np.zeros((n1, n2, n2), dtype=np.int8)
        onehot[np.arange(n1)[:, None], col, np.arange(n2)[None, :]] = 1
        self.onehot = jnp.asarray(onehot)

    def __call__(self, arr):
        if not self.mxu:
            return jnp.take(arr, self.perm, axis=-1)
        lead = arr.shape[:-1]
        y = arr.reshape((-1, self.n1, self.n2))
        y = jnp.take(y, self.rrow, axis=-2)

        def mm(b):
            # batch over rows j1: out[j1, l, c] = sum_k b[l, j1, k] oh[j1, k, c]
            r = jax.lax.dot_general(
                b, self.onehot, (((2,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.int32)
            # int8 sign-extension is undone by the & 0xFF after uint cast
            return r.transpose(1, 0, 2).astype(jnp.uint32) & 0xFF

        out = (mm((y & 0xFF).astype(jnp.int8))
               | (mm(((y >> 8) & 0xFF).astype(jnp.int8)) << 8)
               | (mm(((y >> 16) & 0xFF).astype(jnp.int8)) << 16)
               | (mm(((y >> 24) & 0xFF).astype(jnp.int8)) << 24))
        return out.reshape(lead + (self.n,))


# Values pin the ctx so its id cannot be reused by a new context while
# the cached DevPerm is alive (contexts are few and process-cached).
_DEV_PERM_CACHE: Dict[Tuple[int, int, str], Tuple[CKKSContext, DevPerm]] = {}


def dev_perm(ctx: CKKSContext, g: int) -> DevPerm:
    key = (id(ctx), g, jax.default_backend())
    if key not in _DEV_PERM_CACHE:
        with jax.ensure_compile_time_eval():
            _DEV_PERM_CACHE[key] = (ctx, DevPerm(ctx.perm_for_elt(g)))
    return _DEV_PERM_CACHE[key][1]


class StructDigits:
    """Gadget digits in the structured (own/foreign/key) row layout.

    own: [..., n_cur, N]            row t = digit owner[t] at prime t
    a:   [..., n_groups-1, n_cur, N] foreign data rows (None if 1 digit)
    b:   [..., n_groups, n_key, N]   key-prime rows

    The inner product with a key in the matching layout needs no
    digit-stack gathers or concatenations — the row (j, i) terms are
    simply regrouped; sums are unchanged."""

    def __init__(self, own, a, b, n_groups: int):
        self.own = own
        self.a = a
        self.b = b
        self.n_groups = n_groups

    def shard_window(self, shift: int, lo: int, hi: int):
        """Roll the SHARD axis (big-vector ciphertexts; crypto/bigvec) by
        -shift and keep shards [lo, hi): selects the digit stacks of the
        source shards feeding one intra-rotation group. own/b carry the
        shard axis 3/4 dims from the end; a has an extra digit axis."""
        def f(arr, off):
            ax = arr.ndim - off
            if shift:
                arr = jnp.roll(arr, -shift, axis=ax)
            idx = [slice(None)] * arr.ndim
            idx[ax] = slice(lo, hi)
            return arr[tuple(idx)]
        return StructDigits(
            f(self.own, 3),
            None if self.a is None else f(self.a, 4),
            f(self.b, 4),
            self.n_groups)

    def dense(self, owner, sel):
        """Reassemble the [..., n_groups, n_ext, N] digit stack (tests)."""
        parts = []
        for j in range(self.n_groups):
            rows = []
            for t in range(owner.shape[0]):
                if owner[t] == j:
                    rows.append(self.own[..., t, :])
                else:
                    k = j if j < owner[t] else j - 1
                    rows.append(self.a[..., k, t, :])
            data = jnp.stack(rows, axis=-2)
            parts.append(jnp.concatenate(
                [data, self.b[..., j, :, :]], axis=-2))
        return parts


class DeviceKeys:
    """Key material lazily converted to device form (Montgomery uint32)
    in the per-level structured layout matching StructDigits. Only the
    (key, level) pairs a traced program actually uses are uploaded."""

    def __init__(self, ctx: CKKSContext, keys: K.KeySet):
        self.ctx = ctx
        self.keys = keys
        self._cache: Dict[Tuple[int, int], tuple] = {}

    def layout(self, ksk: K.KSwitchKey, level: int):
        """((k0_own, k0_a, k0_b), (k1_own, k1_a, k1_b)) for one level."""
        # Cache values pin the ksk so its id cannot be reused by a new
        # key while the entry is alive (same hazard as _DEV_PERM_CACHE).
        key = (id(ksk), level)
        if key not in self._cache:
            # Layouts are built lazily, possibly while a program is being
            # traced; escape the trace so the cached arrays are concrete
            # device buffers, not leaked tracers.
            with jax.ensure_compile_time_eval():
                self._cache[key] = (ksk, self._build_layout(ksk, level))
        return self._cache[key][1]

    def layout_rot(self, ksk: K.KSwitchKey, level: int, g: int):
        """Structured layout with every row INVERSE-permuted by the
        Galois element g's NTT-domain permutation.

        Hoisted rotations MAC the shared (unpermuted) digit stack against
        this layout and apply the automorphism once to the two OUTPUT
        polynomials instead of to every digit row:
        sum_j sigma(D_j)*k_j = sigma(sum_j D_j * sigma^-1(k_j)), and the
        P-division epilogue commutes with sigma exactly (the centered
        divide-and-round is an odd function per coefficient — key primes
        are odd so ties cannot occur — and sigma is a signed coefficient
        permutation). Permute work per hoisted rotation drops from
        ~n_groups*n_ext digit rows to 2*n_cur output rows; values are
        bit-identical."""
        key = ("rot", id(ksk), level, g)
        if key not in self._cache:
            p = self.ctx.perm_for_elt(g)
            inv = np.empty_like(p)
            inv[p] = np.arange(p.shape[0], dtype=p.dtype)
            with jax.ensure_compile_time_eval():
                self._cache[key] = (
                    ksk, self._build_layout(ksk, level, col_perm=inv))
        return self._cache[key][1]

    def dense_layout(self, ksk: K.KSwitchKey, level: int):
        """((k0, k1)) as dense [n_groups, n_ext, N] Montgomery planes in
        digit order — the layout the fused Pallas key-switch streams."""
        key = ("dense", id(ksk), level)
        if key not in self._cache:
            with jax.ensure_compile_time_eval():
                self._cache[key] = (ksk, self._build_dense(ksk, level))
        return self._cache[key][1]

    def dp_layout(self, ksk: K.KSwitchKey, level: int, n_dev: int):
        """(k0, k1) as [n_dig, n_ext, N] Montgomery planes with the digit
        axis zero-padded to a multiple of n_dev — the layout the
        digit-parallel (mesh-sharded) key switch shards over the "limb"
        mesh axis. Padding digits are zero key rows: they contribute
        exact zeros to the modular psum.

        NOT inverse-permuted (unlike layout_rot): the dp non-hoisted
        rotation decomposes the PERMUTED polynomial, and decomposing
        sigma(c1) is not value-identical to permuting the digits of c1 —
        the fast-base-extension representative's e*Qg term is built from
        standard (non-centered) residues, which do not negate
        symmetrically — so permuted keys would break bit-parity with the
        single-device path."""
        key = ("dp", id(ksk), level, n_dev)
        if key not in self._cache:
            with jax.ensure_compile_time_eval():
                self._cache[key] = (ksk, self._build_dp(ksk, level, n_dev))
        return self._cache[key][1]

    def _build_dp(self, ksk: K.KSwitchKey, level: int, n_dev: int):
        ctx = self.ctx
        primes = ctx.primes_at_level(level)
        basis = primes + list(ctx.key_primes)
        n_groups, _, _ = _ks_maps(ctx, level, ksk.alpha)
        n_dig = n_groups + (-n_groups % n_dev)
        n_data_all = len(ctx.data_primes)
        row_idx = list(range(len(primes))) + [
            n_data_all + i for i in range(len(ctx.key_primes))]

        def pack(klist):
            k = np.zeros((n_dig, len(basis), ctx.n), dtype=np.uint64)
            for j in range(n_groups):
                k[j] = klist[j][row_idx]
            return jnp.asarray(np.stack(
                [_to_mont_rows(k[j], basis) for j in range(n_dig)]))

        return (pack(ksk.k0), pack(ksk.k1))

    def _build_dense(self, ksk: K.KSwitchKey, level: int):
        ctx = self.ctx
        primes = ctx.primes_at_level(level)
        n_cur = len(primes)
        n_key = len(ctx.key_primes)
        n_ext = n_cur + n_key
        n_data_all = len(ctx.data_primes)
        n_groups, _, _ = _ks_maps(ctx, level, ksk.alpha)
        basis = primes + list(ctx.key_primes)

        def build(klist):
            dense = np.empty((n_groups, n_ext, ctx.n), dtype=np.uint64)
            for j in range(n_groups):
                for t in range(n_cur):
                    dense[j, t] = klist[j][t]
                for kk in range(n_key):
                    dense[j, n_cur + kk] = klist[j][n_data_all + kk]
            return jnp.asarray(np.stack(
                [_to_mont_rows(dense[j], basis) for j in range(n_groups)]))

        return (build(ksk.k0), build(ksk.k1))

    def _build_layout(self, ksk: K.KSwitchKey, level: int, col_perm=None):
        ctx = self.ctx
        primes = ctx.primes_at_level(level)
        n_cur = len(primes)
        n_key = len(ctx.key_primes)
        n_data_all = len(ctx.data_primes)
        n_groups, owner, sel = _ks_maps(ctx, level, ksk.alpha)

        def build(klist):
            own = np.empty((n_cur, ctx.n), dtype=np.uint64)
            a = np.empty((max(n_groups - 1, 0), n_cur, ctx.n),
                         dtype=np.uint64)
            b = np.empty((n_groups, n_key, ctx.n), dtype=np.uint64)
            for t in range(n_cur):
                own[t] = klist[owner[t]][t]
                for k in range(n_groups - 1):
                    a[k, t] = klist[sel[k, t]][t]
            for j in range(n_groups):
                for kk in range(n_key):
                    b[j, kk] = klist[j][n_data_all + kk]
            if col_perm is not None:
                own = own[..., col_perm]
                a = a[..., col_perm]
                b = b[..., col_perm]
            own_m = jnp.asarray(_to_mont_rows(own, primes))
            a_m = (jnp.asarray(np.stack(
                [_to_mont_rows(a[k], primes)
                 for k in range(n_groups - 1)]))
                if n_groups > 1 else None)
            b_m = jnp.asarray(np.stack(
                [_to_mont_rows(b[j], ctx.key_primes)
                 for j in range(n_groups)]))
            return own_m, a_m, b_m

        return (build(ksk.k0), build(ksk.k1))


_DEVICE_KEYS_CACHE: Dict[int, DeviceKeys] = {}


def device_keys(ctx: CKKSContext, keys: K.KeySet) -> DeviceKeys:
    key = id(keys)
    if key not in _DEVICE_KEYS_CACHE:
        _DEVICE_KEYS_CACHE[key] = DeviceKeys(ctx, keys)
    return _DEVICE_KEYS_CACHE[key]


class JaxProgram:
    """Traces a compiled EVA program into a single jitted function."""

    # Digit-parallel / sequence-parallel contexts; class defaults so
    # tool shims built via __new__ (bench/verify scripts) take the
    # single-device path.
    _dp = None
    _seq = None

    def __init__(self, program: Program, ctx: CKKSContext, keys: K.KeySet,
                 plan, types, order: List[Term]):
        self.program = program
        self.ctx = ctx
        self.keys = keys
        self.plan = plan
        self.types = types
        self.order = order
        self.dkeys = device_keys(ctx, keys)
        # Shards per logical vector (big-vector extension, crypto/bigvec):
        # ciphertext planes carry a leading shard axis when k > 1.
        self.k = max(1, program.vec_size // (ctx.n // 2))
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
        # Rotation-sum epilogue fusion: rotations stay in deferred
        # (pre-division accumulator) form until a non-Add consumer, so
        # directly-summed rotations share one P-division. Cost-neutral
        # for lone rotations; EVA_TPU_NO_ROTSUM_FUSION restores the
        # eager per-rotation form (both backends obey it identically).
        import os as _os
        self._rotsum_on = (self.k == 1 and
                           not _os.environ.get("EVA_TPU_NO_ROTSUM_FUSION"))
        self._dp = None  # digit-parallel context (set during dp traces)
        self._seq = None  # sequence-parallel context (seq-mesh traces)
        self._jit_cache: Dict[Tuple, object] = {}
        self._sharded_cache: Dict[int, object] = {}
        # Device-upload cache: program constants (encode-cache Plaintexts)
        # and re-executed input Ciphertexts are uploaded once, not per
        # run() — on the TPU tunnel each host->device transfer is a real
        # per-execute cost. Keyed by object id; values pin the host
        # object so ids cannot be reused while an entry is alive.
        # Bounded FIFO so arbitrary fresh ciphertexts cannot grow it.
        self._upload_cache: "OrderedDict[int, tuple]" = OrderedDict()
        self._upload_cache_cap = 256

    def _jitted(self, cipher_in, plain_in):
        """Compile (or fetch) the whole-graph executable for this input
        tree, with every captured array HOISTED into an argument.

        See _hoist_consts_jit: captured tables and key layouts are passed
        as device-resident arguments, not baked into the module."""
        key = (
            tuple(sorted((k, len(v), v[0].shape) for k, v in
                         cipher_in.items())),
            tuple(sorted((k, v.shape) for k, v in plain_in.items())))
        hit = self._jit_cache.get(key)
        if hit is None:
            hit = self._jit_cache[key] = _hoist_consts_jit(
                lambda c, p: self._traced(c, p), (cipher_in, plain_in))
        return hit(cipher_in, plain_in)

    def _upload(self, host_obj, planes_fn):
        """Cache jnp device copies of a host Plaintext/Ciphertext."""
        key = id(host_obj)
        hit = self._upload_cache.get(key)
        if hit is not None and hit[0] is host_obj:
            self._upload_cache.move_to_end(key)
            return hit[1]
        dev = planes_fn(host_obj)
        self._upload_cache[key] = (host_obj, dev)
        while len(self._upload_cache) > self._upload_cache_cap:
            self._upload_cache.popitem(last=False)
        return dev

    # -- digit-parallel (mesh) execution --------------------------------------

    def _ks_sites(self):
        """(name, level, alpha) for every key switch the traced program
        performs; mirrors the _traced dispatch exactly so the sharded key
        material can be passed as shard_map arguments."""
        ctx = self.ctx
        sites = set()
        for term in self.order:
            op = term.op
            if self.types[term] == Type.Raw:
                continue
            idx = term.index
            args = term.operands
            if op in (Op.RotateLeftConst, Op.RotateRightConst):
                steps = term.get_attr(ROTATION)
                if op == Op.RotateRightConst:
                    steps = -steps
                if steps % (self.k * (ctx.n // 2)) == 0:
                    continue
                g = ctx.galois_elt(steps)
                sites.add((f"galois_{g}", self.plan[idx].level,
                           self.keys.galois[g].alpha))
            elif op == Op.Relinearize:
                if idx in self._fused_relins:
                    continue  # key switch happens at the Rescale site
                if args[0].index in self._fused_rescales:
                    # _rescale_relin: KS at the post-rescale level
                    lvl = self.plan[args[0].operands[0].index].level + 1
                else:
                    lvl = self.plan[idx].level
                sites.add(("relin", lvl, self.keys.relin.alpha))
            elif op == Op.Rescale and args[0].index in self._fused_relins:
                # _relin_rescale: KS at the pre-rescale level
                lvl = self.plan[args[0].operands[0].index].level
                sites.add(("relin", lvl, self.keys.relin.alpha))
        return sorted(sites)

    def _ks_dp_digits(self, coeffs, level: int, alpha: int):
        """This device's local gadget digits (FBE + extended-basis NTT)
        for the digit shard it owns. coeffs: [..., n_cur, N] coefficient
        domain, replicated across the digit axis. Returns
        [..., loc, n_ext, N] NTT-domain digit planes."""
        ctx = self.ctx
        dev = self._ops_at(level)
        ext = self._ext_ops_at(level)
        n_ext = len(ctx.primes_at_level(level)) + len(ctx.key_primes)
        member, conv = self._dp["tables"][(level, alpha)]
        _, inv_mont, _ = _ks_dev_tables(ctx, level, alpha)
        y = dev.mul_mont(coeffs, inv_mont)          # [..., n_cur, nloc]
        loc = member.shape[0]
        nloc = y.shape[-1]  # = ctx.n, or the local shard on a seq mesh
        ym = jnp.take(y, member.reshape(-1), axis=-2)
        ym = ym.reshape(y.shape[:-2] + (loc, alpha, 1, nloc))
        prod = ext.mul_mont(jnp.broadcast_to(
            ym, y.shape[:-2] + (loc, alpha, n_ext, nloc)), conv)
        acc = prod[..., 0, :, :]
        for k in range(1, alpha):
            acc = ext.add(acc, prod[..., k, :, :])
        return ext.ntt(acc)

    def _ks_dp(self, coeffs, level: int, site: str, alpha: int,
               perm=None, out_ntt: bool = True, digits=None,
               defer: bool = False):
        """Digit-parallel key switch (SURVEY §2.9 "psum for key-switch
        digit accumulation"): each device runs the FBE + NTT + key-MAC
        pipeline for ITS digit shard, partial inner products are combined
        by a modular butterfly all-reduce over the mesh axis (ppermute +
        add_mod — a raw integer psum would wrap mod 2^32, not mod q), and
        the ~20x-cheaper P-division tail runs replicated. Bit-identical
        to the single-device path: modular sums are exact and
        order-independent. `perm` permutes the local digit shard (hoisted
        rotations; the shard axis is the digit axis, so the N-axis
        permutation is device-local)."""
        from ..parallel.ks_shard import _modular_all_reduce
        ctx = self.ctx
        dp = self._dp
        ext = self._ext_ops_at(level)
        if digits is None:
            digits = self._ks_dp_digits(coeffs, level, alpha)
        if perm is not None:
            digits = perm(digits)
        k0, k1 = dp["keys"][f"{site}@L{level}"]     # local [loc, n_ext, N]
        t0 = ext.mul_mont(digits, k0)
        t1 = ext.mul_mont(digits, k1)

        def dig_sum(t):
            s = t[..., 0, :, :]
            for j in range(1, t.shape[-3]):
                s = ext.add(s, t[..., j, :, :])
            return s

        acc0, acc1 = dig_sum(t0), dig_sum(t1)
        if dp["axis"] is not None:
            if dp.get("dcn_axis"):
                # Digits sharded over ("hlimb" x "limb"): hierarchical
                # accumulation — ICI reduce-scatter, 1/limb-sized DCN
                # butterfly, ICI gather (parallel/ks_shard; bit-identical
                # to the flat butterfly: modular adds are associative).
                from ..parallel.ks_shard import \
                    hierarchical_modular_all_reduce
                acc0 = hierarchical_modular_all_reduce(
                    acc0, ext.q, dp["axis"], dp["n_dev"],
                    dp["dcn_axis"], dp["n_dcn"])
                acc1 = hierarchical_modular_all_reduce(
                    acc1, ext.q, dp["axis"], dp["n_dev"],
                    dp["dcn_axis"], dp["n_dcn"])
            else:
                acc0 = _modular_all_reduce(acc0, ext.q, dp["axis"],
                                           dp["n_dev"])
                acc1 = _modular_all_reduce(acc1, ext.q, dp["axis"],
                                           dp["n_dev"])
        if defer:
            # Rotation-sum fusion: the all-reduced accumulators are
            # replicated across the limb axis, exactly like the tail's
            # inputs; _ks_div2 later applies the identical division.
            return acc0, acc1

        def tail(acc):
            x = ext.intt(acc)
            prim = ctx.primes_at_level(level) + list(ctx.key_primes)
            for _ in ctx.key_primes:
                x = self._divide_last(x, prim)
                prim = prim[:-1]
            # _lops, not level_ops: on a limb x seq mesh the output NTT
            # must route through the seq-sharded transform.
            return self._lops(prim).ntt(x) if out_ntt else x

        return tail(acc0), tail(acc1)

    def _body_dp(self, cipher_in, plain_in, dp_tabs, dp_keys,
                 axis, n_dev: int, seq=None, dcn=None):
        """Trace the program with the digit-parallel key-switch context
        installed; dp_tabs/dp_keys are the (possibly shard-local) tables
        and key planes. axis=None traces the layout without collectives
        (used for shape evaluation only). `seq=(axis, n_dev)` installs
        the sequence-parallel context as well — the two compose because
        their collectives ride orthogonal mesh axes: the digit partial
        sums all-reduce over "limb" while each digit's NTTs all-to-all
        over "seq". `dcn=(axis, n_dev)` adds a host-spanning second
        digit axis whose accumulation runs hierarchically."""
        self._dp = {"axis": axis, "n_dev": n_dev,
                    "tables": dp_tabs, "keys": dp_keys}
        if dcn is not None:
            self._dp["dcn_axis"], self._dp["n_dcn"] = dcn
        if seq is not None:
            self._seq = {"axis": seq[0], "n_dev": seq[1]}
        try:
            return self._traced(cipher_in, plain_in)
        finally:
            self._dp = None
            self._seq = None

    def _body_seq(self, cipher_in, plain_in, axis, n_dev: int):
        """Trace the program with the sequence-parallel (sharded ring
        axis) context installed; inputs are shard-local evaluation-domain
        planes [..., n_sub, N/n_dev]."""
        self._seq = {"axis": axis, "n_dev": n_dev}
        try:
            return self._traced(cipher_in, plain_in)
        finally:
            self._seq = None

    def _sharded_jit(self, mesh, cipher_in, plain_in,
                     plain_unbatched=frozenset()):
        """jit(shard_map(traced)) for a mesh, cached per mesh (Pallas
        kernels cannot be auto-partitioned; shard_map runs the program
        per-shard on each device's local batch slice).

        With a "limb" mesh axis of size > 1 the gadget digits of every
        key switch — the dominant execution cost — are sharded over that
        axis and accumulated with a modular butterfly all-reduce, the
        integrated form of parallel/ks_shard.ShardedKeySwitch. Dyadic
        ops run replicated across the axis (they are ~50x cheaper than
        key switching; sharding them would force per-op collectives)."""
        # Keyed by mesh AND input shapes: the hoisted-consts jaxpr is
        # traced at concrete shapes, so a different batch size must get
        # its own entry (values pin the mesh against id reuse).
        key = (id(mesh),
               tuple(sorted((k, len(v), v[0].shape)
                            for k, v in cipher_in.items())),
               tuple(sorted((k, v.shape) for k, v in plain_in.items())))
        if key not in self._sharded_cache:
            from ..parallel.sharding import shard_map_compat as shard_map
            from jax.sharding import PartitionSpec as P
            from ..parallel.sharding import batch_axes, check_ici_axes
            # Also guard hand-built meshes that bypassed make_device_mesh:
            # collective-bearing axes must not span host processes.
            check_ici_axes(np.asarray(mesh.devices),
                           list(mesh.axis_names))
            bax = batch_axes(mesh)  # ("host", "batch") on a DCN mesh
            # Unbatched plain constants are replicated, not batch-sharded.
            specs = (jax.tree.map(lambda _: P(bax), cipher_in),
                     {k: (P() if k in plain_unbatched else P(bax))
                      for k in plain_in})
            n_dp = mesh.shape.get("limb", 1)
            n_seq = mesh.shape.get("seq", 1)
            n_hl = mesh.shape.get("hlimb", 1)  # host-spanning digit axis
            n_dig_shards = n_dp * n_hl
            use_dp = (n_dig_shards > 1 and self.k == 1
                      and (n_dp & (n_dp - 1)) == 0
                      and (n_hl & (n_hl - 1)) == 0
                      and self._ks_sites())
            if n_hl > 1:
                if n_seq > 1:
                    raise ValueError(
                        'mesh axes "hlimb" and "seq" do not compose')
                if not use_dp:
                    raise ValueError(
                        'mesh axis "hlimb" > 1 needs power-of-two sizes '
                        "and a program with key switches")
            from jax.sharding import NamedSharding
            repl = NamedSharding(mesh, P())

            def dp_materialize():
                dp_tabs = {}
                dp_keys = {}
                for name, level, alpha in self._ks_sites():
                    if (level, alpha) not in dp_tabs:
                        member, conv = _ks_dp_tables(
                            self.ctx, level, alpha, n_dig_shards)
                        with jax.ensure_compile_time_eval():
                            dp_tabs[(level, alpha)] = (
                                jnp.asarray(member), jnp.asarray(conv))
                    ksk = (self.keys.relin if name == "relin"
                           else self.keys.galois[int(name.split("_")[1])])
                    dp_keys[f"{name}@L{level}"] = self.dkeys.dp_layout(
                        ksk, level, n_dig_shards)
                return dp_tabs, dp_keys

            if n_seq > 1:
                from ..parallel.seq_exec import seq_compatible
                if self.k != 1:
                    raise ValueError(
                        "seq mesh axis: sharded big-vector programs "
                        "(vec_size > N/2) are not supported")
                if n_dp > 1 and not use_dp:
                    raise ValueError(
                        "limb mesh axis > 1 needs a power-of-two size "
                        "and a program with key switches")
                if not seq_compatible(self.ctx.n, n_seq):
                    raise ValueError(
                        f"ring size {self.ctx.n} cannot shard over "
                        f"{n_seq} devices (seq must divide both 128 and "
                        f"N/128 = {self.ctx.n // 128})")
                seq_specs = (
                    jax.tree.map(lambda _: P(bax, None, "seq"), cipher_in),
                    {k: (P(None, "seq") if k in plain_unbatched
                         else P(bax, None, "seq"))
                     for k in plain_in})
                out_specs = jax.tree.map(
                    lambda _: P(bax, None, "seq"),
                    jax.eval_shape(self._traced, cipher_in, plain_in))
                if use_dp:
                    # limb x seq composition: digit partial sums
                    # all-reduce over "limb" while every NTT's stage
                    # exchange rides "seq" — orthogonal axes, so the
                    # collectives compose without interference. Key
                    # planes shard digit axis over limb AND ring axis
                    # over seq (evaluation-domain planes are contiguous
                    # flat slices, see seq_exec layout contract).
                    dp_tabs, dp_keys = dp_materialize()
                    tab_specs = jax.tree.map(lambda _: P("limb"), dp_tabs)
                    key_specs = jax.tree.map(
                        lambda _: P("limb", None, "seq"), dp_keys)
                    body = shard_map(
                        lambda c, p, t, k: self._body_dp(
                            c, p, t, k, "limb", n_dp,
                            seq=("seq", n_seq)),
                        mesh=mesh,
                        in_specs=seq_specs + (tab_specs, key_specs),
                        out_specs=out_specs)
                    jitted = _hoist_consts_jit(
                        body, (cipher_in, plain_in, dp_tabs, dp_keys),
                        const_sharding=repl)
                    self._sharded_cache[key] = (
                        lambda c, p: jitted(c, p, dp_tabs, dp_keys))
                else:
                    self._sharded_cache[key] = _hoist_consts_jit(
                        shard_map(lambda c, p: self._body_seq(c, p, "seq",
                                                              n_seq),
                                  mesh=mesh, in_specs=seq_specs,
                                  out_specs=out_specs),
                        (cipher_in, plain_in), const_sharding=repl)
            elif not use_dp:
                out_specs = jax.tree.map(
                    lambda _: P(bax),
                    jax.eval_shape(self._traced, cipher_in, plain_in))
                self._sharded_cache[key] = _hoist_consts_jit(
                    shard_map(lambda c, p: self._traced(c, p),
                              mesh=mesh, in_specs=specs,
                              out_specs=out_specs),
                    (cipher_in, plain_in), const_sharding=repl)
            else:
                dp_tabs, dp_keys = dp_materialize()
                out_specs = jax.tree.map(
                    lambda _: P(bax),
                    jax.eval_shape(
                        lambda c, p: self._body_dp(
                            c, p, dp_tabs, dp_keys, None, n_dig_shards),
                        cipher_in, plain_in))
                dig_ax = ("hlimb", "limb") if n_hl > 1 else "limb"
                dcn = ("hlimb", n_hl) if n_hl > 1 else None
                dp_specs = jax.tree.map(lambda _: P(dig_ax),
                                        (dp_tabs, dp_keys))
                body = shard_map(
                    lambda c, p, t, k: self._body_dp(
                        c, p, t, k, "limb", n_dp, dcn=dcn),
                    mesh=mesh, in_specs=(specs[0], specs[1]) + dp_specs,
                    out_specs=out_specs)
                # dp tables/keys stay explicit shard_map args (sharded
                # P("limb")); only body-level captures are hoisted.
                jitted = _hoist_consts_jit(
                    body, (cipher_in, plain_in, dp_tabs, dp_keys),
                    const_sharding=repl)
                self._sharded_cache[key] = (
                    lambda c, p: jitted(c, p, dp_tabs, dp_keys))
        return self._sharded_cache[key]

    # -- device op helpers ---------------------------------------------------

    def _lops(self, primes) -> DeviceLevelOps:
        """level_ops, sequence-parallel aware: with the seq context
        installed (ring axis N sharded over a mesh axis), transforms
        route through the all-to-all ShardedNTT; elementwise ops are
        unchanged (per-row constants broadcast over the local N/D)."""
        if self._seq is not None:
            from ..parallel.seq_exec import get_seq_ops
            return get_seq_ops(tuple(primes), self.ctx.n,
                               self._seq["axis"], self._seq["n_dev"])
        return level_ops(list(primes), self.ctx.n)

    def _aperm(self, g: int):
        """Galois automorphism applicator; in seq mode the N-permutation
        is lifted over the sharded ring axis as one shard ppermute plus
        a local lane gather (seq_perm_galois; generic gather fallback)."""
        base = dev_perm(self.ctx, g)
        if self._seq is None:
            return base
        from ..parallel.seq_exec import seq_perm_galois
        return seq_perm_galois(self.ctx, g, self._seq["axis"],
                               self._seq["n_dev"], base)

    def _ops_at(self, level: int) -> DeviceLevelOps:
        return self._lops(self.ctx.primes_at_level(level))

    def _ext_ops_at(self, level: int) -> DeviceLevelOps:
        return self._lops(self.ctx.primes_at_level(level)
                          + self.ctx.key_primes)

    def _ks_fbe_y(self, coeffs, level: int, alpha: int):
        """Shared key-switch prologue: y_t = [d_t * (Qg_t/q_t)^-1]_{q_t},
        zero-padded to n_groups*alpha rows (used by the structured digit
        decomposition and the fused Pallas entry point alike)."""
        ctx = self.ctx
        n_groups, inv_mont, _ = _ks_dev_tables(ctx, level, alpha)
        n_cur = len(ctx.primes_at_level(level))
        dev = self._ops_at(level)
        y = dev.mul_mont(coeffs, inv_mont)
        pad = n_groups * alpha - n_cur
        if pad:
            y = jnp.concatenate(
                [y, jnp.zeros(y.shape[:-2] + (pad, y.shape[-1]), y.dtype)],
                axis=-2)
        return y, n_groups

    def _ks_digits(self, poly, level: int,
                   alpha: int = None) -> "StructDigits":
        """Gadget decomposition digits, NTT'd in the extended basis — the
        dominant key-switch cost. Separated so hoisted rotations can
        compute it ONCE per source ciphertext. With the NTT-domain input
        available, each digit's own-group rows are the input planes
        themselves (D_j == x mod q_t for q_t in group j, and the NTT
        output depends only on the residue class), so only foreign rows
        go through the NTT: (n_groups-1)*n_cur + n_groups*n_key rows
        instead of n_groups*n_ext."""
        dev = self._ops_at(level)
        return self._ks_digits_from_coeffs(dev.intt(poly), level,
                                           alpha=alpha, poly_ntt=poly)

    def _ks_digits_from_coeffs(self, coeffs, level: int, alpha: int = None,
                               poly_ntt=None) -> "StructDigits":
        """Digits from COEFFICIENT-domain input (fusion entry point),
        returned in the structured own/foreign/key row layout.

        alpha=1: the raw residue rows broadcast into every basis row are
        valid unreduced inputs (the NTT twist performs per-prime
        reduction), so decomposition is free. alpha>1 (hybrid digits):
        fast base extension D_j mod q_i = sum_t (d_t*inv_t mod q_t) *
        conv[t][i] — a couple of elementwise Montgomery multiplies — then
        alpha-times FEWER rows go through the NTT, the dominant cost.
        Value-identical to crypto/ops._ks_digits_from_coeffs (the numpy
        backend keeps the dense stack; pre-NTT rows differ only by
        multiples of the row prime, which the NTT reduction absorbs)."""
        ctx = self.ctx
        primes = ctx.primes_at_level(level)
        n_cur = len(primes)
        n_key = len(ctx.key_primes)
        n_ext = n_cur + n_key
        if alpha is None:
            alpha = self.keys.ks_alpha
        n_groups, owner, sel = _ks_maps(ctx, level, alpha)
        if alpha == 1:
            # Each residue row broadcasts into every basis row; values
            # are < q_t but possibly >= basis[i], and the merged-twist
            # NTT requires reduced input — one Shoup-by-1 pass reduces.
            ext = self._ext_ops_at(level)
            acc = ext.reduce(jnp.broadcast_to(
                coeffs[..., :, None, :],
                coeffs.shape[:-2] + (n_cur, n_ext, coeffs.shape[-1])))
        else:
            ext = self._ext_ops_at(level)
            _, _, conv_mont = _ks_dev_tables(ctx, level, alpha)
            y, _ = self._ks_fbe_y(coeffs, level, alpha)
            yb = jnp.broadcast_to(
                y[..., :, None, :],
                y.shape[:-2] + (n_groups * alpha, n_ext, y.shape[-1]))
            prod = ext.mul_mont(yb, conv_mont)  # reduces mod basis[i]
            g = prod.reshape(
                prod.shape[:-3] + (n_groups, alpha, n_ext, prod.shape[-1]))
            acc = g[..., 0, :, :]
            for k in range(1, alpha):
                acc = ext.add(acc, g[..., k, :, :])

        def take_digit_axis(arr, idx):
            # take_along_axis needs indices.ndim == arr.ndim: expand the
            # static [n_dig, n_cur] index table over leading batch dims.
            full_idx = jnp.asarray(idx)[..., None]
            full_idx = full_idx.reshape(
                (1,) * (arr.ndim - 3) + full_idx.shape)
            return jnp.take_along_axis(arr, full_idx, axis=-3)

        dev = self._ops_at(level)
        if poly_ntt is not None:
            own = poly_ntt
        else:
            own_in = take_digit_axis(acc[..., :, :n_cur, :], owner[None, :])
            own = dev.ntt(own_in[..., 0, :, :])
        if n_groups > 1:
            a_in = take_digit_axis(acc[..., :, :n_cur, :], sel)
            a_ntt = dev.ntt(a_in)  # [..., n_groups-1, n_cur, N]
        else:
            a_ntt = None
        b_ntt = self._lops(list(ctx.key_primes)).ntt(
            acc[..., :, n_cur:, :])  # [..., n_groups, n_key, N]
        return StructDigits(own, a_ntt, b_ntt, n_groups)

    def _ks_mac(self, digits: "StructDigits", level: int, layout):
        """Inner product of structured digits with a key-switch key in
        the matching layout: the pre-division extended-basis
        accumulators. No digit-stack gathers or concatenations: the sum
        over digits j of d[j,i]*k[j,i] is regrouped into own + foreign +
        key row products against pre-rearranged key planes.

        Hoisted rotations pass an INVERSE-permuted key layout
        (DeviceKeys.layout_rot) and apply the automorphism to the two
        accumulators (or outputs) — see layout_rot for the commutation
        argument."""
        ctx = self.ctx
        dev = self._ops_at(level)
        key_ops = self._lops(list(ctx.key_primes))
        if self._seq is not None:
            # Key planes arrive replicated (full N, evaluation domain =
            # contiguous flat layout); each device MACs its own slice.
            from ..parallel.seq_exec import seq_slice
            ax, nd = self._seq["axis"], self._seq["n_dev"]
            layout = tuple(
                tuple(None if k is None else seq_slice(k, ax, nd)
                      for k in half)
                for half in layout)

        def tree_sum(ops, t):
            while t.shape[-3] > 1:
                m = t.shape[-3]
                half = m // 2
                lo = t[..., :half, :, :]
                hi = t[..., half:2 * half, :, :]
                rest = t[..., 2 * half:, :, :]
                t = jnp.concatenate([ops.add(lo, hi), rest], axis=-3)
            return t[..., 0, :, :]

        def ip(k_own, k_a, k_b):
            acc_data = dev.mul_mont(digits.own, k_own)
            if digits.a is not None:
                ta = tree_sum(dev, dev.mul_mont(digits.a, k_a))
                acc_data = dev.add(acc_data, ta)
            acc_key = tree_sum(key_ops, key_ops.mul_mont(digits.b, k_b))
            return jnp.concatenate([acc_data, acc_key], axis=-2)

        return ip(*layout[0]), ip(*layout[1])

    def _ks_apply(self, digits: "StructDigits", level: int, layout,
                  coeff_out=False):
        """MAC + P-division (see _ks_mac / _ks_div2)."""
        acc0, acc1 = self._ks_mac(digits, level, layout)
        return self._ks_div2(acc0, acc1, level, coeff_out=coeff_out)

    def _ks_div2(self, acc0, acc1, level: int, coeff_out=False):
        """Division of the two extended-basis key-switch accumulators by
        the special modulus P — the rotation-sum fusion point: summed
        accumulators pay this ONCE (see _rotate_acc)."""
        ctx = self.ctx
        primes = ctx.primes_at_level(level)
        ext = self._ext_ops_at(level)

        if self._fused_ks_ok(level) and self._dp is None:
            # Same fused iNTT + P-division (+ output NTT) epilogue kernel
            # the fully-fused path uses — one VMEM-resident pass instead
            # of three HBM round-trips per switched polynomial. This is
            # what hoisted (multi-rotation) sources pay per rotation, so
            # it carries the fused-kernel win to Sobel-class workloads.
            from .pallas_ks import get_pallas_epilogue
            epi = get_pallas_epilogue(
                tuple(primes) + tuple(ctx.key_primes), ctx.n,
                len(ctx.key_primes))
            lead = acc0.shape[:-2]
            n_ext = acc0.shape[-2]
            a0 = acc0.reshape((-1, n_ext, ctx.n))
            a1 = acc1.reshape((-1, n_ext, ctx.n))
            d0, d1 = epi.epilogue(a0, a1, out_ntt=not coeff_out)
            out_shape = lead + (len(primes), ctx.n)
            return d0.reshape(out_shape), d1.reshape(out_shape)

        def div_p(acc):
            coeffs_ext = ext.intt(acc)
            prim = primes + list(self.ctx.key_primes)
            x = coeffs_ext
            for _ in self.ctx.key_primes:
                x = self._divide_last(x, prim)
                prim = prim[:-1]
            return x if coeff_out else self._lops(prim).ntt(x)

        return div_p(acc0), div_p(acc1)

    # Conservative VMEM budget for one fused-KS grid step: real VMEM is
    # ~16 MB/core, Mosaic needs headroom for double buffering.
    _KS_VMEM_BUDGET = 12 << 20

    def _fused_ks_ok(self, level: int = 0) -> bool:
        """Use the fused Pallas key-switch kernels (real TPU only, and
        only when one epilogue grid step fits the VMEM budget: the
        epilogue holds the [n_ext, N] accumulator block plus all inverse
        and forward NTT table rows resident at once)."""
        import os
        if os.environ.get("EVA_TPU_NO_FUSED_KS"):
            return False
        if self._seq is not None:
            return False  # Pallas kernels see only the local N shard
        if jax.default_backend() != "tpu" or self.ctx.n < 1024:
            return False
        n_ext = (len(self.ctx.primes_at_level(level))
                 + len(self.ctx.key_primes))
        # acc block + rows working set + the merged corr_inv Shoup pair
        # (2 planes) at n_ext rows, merged corr_fwd pair at n_out rows;
        # stage tables are negligible (twist tables are merged away).
        footprint = (4 * n_ext + 2 * (n_ext - len(self.ctx.key_primes))) \
            * self.ctx.n * 4
        return footprint <= self._KS_VMEM_BUDGET

    def _pallas_ks(self, level: int, alpha: int):
        from .pallas_ks import get_pallas_ks
        ctx = self.ctx
        n_groups, _, conv_mont = _ks_dev_tables(ctx, level, alpha)
        _, owner, _ = _ks_maps(ctx, level, alpha)
        ext_primes = tuple(ctx.primes_at_level(level)) + tuple(ctx.key_primes)
        return get_pallas_ks(ext_primes, ctx.n, len(ctx.key_primes),
                             alpha, n_groups, np.asarray(conv_mont)[..., 0],
                             owner=owner)

    def _ks_fused_coeffs(self, coeffs, level: int, ksk, out_ntt: bool,
                         poly_ntt=None):
        """Fused key switch from coefficient-domain input: FBE + digit
        NTTs + key MACs in one VMEM-resident kernel, iNTT + P-division
        (+ output NTT) in a second. Bit-identical to the structured XLA
        path (exact modular arithmetic; see pallas_ks.py). When the
        caller already holds the polynomial's NTT planes (rotations and
        relinearizations do), pass poly_ntt: the kernel reuses them for
        each digit's own rows — n_cur of the n_groups*n_ext row-NTTs."""
        ctx = self.ctx
        alpha = ksk.alpha  # per-key digit grouping (matches dense_layout)
        n_cur = len(ctx.primes_at_level(level))
        y, n_groups = self._ks_fbe_y(coeffs, level, alpha)
        lead = y.shape[:-2]
        y = y.reshape((-1, n_groups, alpha, ctx.n))
        x_ntt = (None if poly_ntt is None
                 else poly_ntt.reshape((-1, n_cur, ctx.n)))
        k0, k1 = self.dkeys.dense_layout(ksk, level)
        d0, d1 = self._pallas_ks(level, alpha).apply(y, k0, k1, out_ntt,
                                                     x_ntt=x_ntt)
        out_shape = lead + (n_cur, ctx.n)
        return d0.reshape(out_shape), d1.reshape(out_shape)

    def _ks_fused_mac(self, coeffs, level: int, ksk, poly_ntt=None):
        """MAC-only entry of the fused Pallas key switch: FBE + digit
        NTTs + key MACs in one VMEM-resident kernel, returning the
        pre-division extended-basis accumulators (the epilogue runs
        separately via _ks_div2 — once per rotation SUM)."""
        ctx = self.ctx
        alpha = ksk.alpha
        n_cur = len(ctx.primes_at_level(level))
        y, n_groups = self._ks_fbe_y(coeffs, level, alpha)
        lead = y.shape[:-2]
        y = y.reshape((-1, n_groups, alpha, ctx.n))
        x_ntt = (None if poly_ntt is None
                 else poly_ntt.reshape((-1, n_cur, ctx.n)))
        k0, k1 = self.dkeys.dense_layout(ksk, level)
        acc0, acc1 = self._pallas_ks(level, alpha).mac(y, k0, k1,
                                                       x_ntt=x_ntt)
        shape = lead + (n_cur + len(ctx.key_primes), ctx.n)
        return acc0.reshape(shape), acc1.reshape(shape)

    def _fin(self, v):
        """Finalize a deferred rotation-sum value ("rotsum", level, c0,
        c1, acc0, acc1) to [c0+d0, (c1+)d1] planes; pass anything else
        through. The single P-division here is the whole point of the
        deferral: N summed rotations paid N MACs but share this one
        epilogue."""
        if not (isinstance(v, tuple) and v and v[0] == "rotsum"):
            return v
        _, level, c0, c1, acc0, acc1 = v
        d0, d1 = self._ks_div2(acc0, acc1, level)
        dev = self._ops_at(level)
        return [dev.add(c0, d0), d1 if c1 is None else dev.add(c1, d1)]

    def _fin_at(self, vals, idx: int):
        """Finalize vals[idx] IN PLACE: a multi-use rotsum must pay its
        epilogue once, and later consumers (including Adds, which then
        fold planes instead of merging accumulators) must observe the
        same finalized value in BOTH backends — write-back keeps the
        decision points deterministic and identical."""
        v = vals[idx]
        f = self._fin(v)
        if f is not v:
            vals[idx] = f
        return f

    def _rotate_acc(self, polys, steps: int, level: int,
                    dev: DeviceLevelOps, hoist=None, src_key=None):
        """Galois rotation in DEFERRED-division form: the rotation-sum
        value ("rotsum", level, sigma(c0), None, acc0, acc1) with
        acc0/acc1 the pre-division extended-basis accumulators of the
        key switch of sigma(c1). Adds merge these exactly (modular adds
        are order-independent bitwise); any other consumer finalizes
        (_fin) with one shared P-division. For a LONE rotation this
        costs exactly the eager path (same MAC kernel, one epilogue) —
        hoisted rotations permute the accumulators instead of the
        divided outputs, equal bits by the layout_rot commutation."""
        ctx = self.ctx
        g = ctx.galois_elt(steps)
        aperm = self._aperm(g)
        alpha = self.keys.galois[g].alpha
        c0 = aperm(polys[0])
        if self._dp is not None:
            site = f"galois_{g}"
            if hoist is not None and src_key is not None:
                digits = hoist.get(src_key)
                if digits is None:
                    digits = self._ks_dp_digits(dev.intt(polys[1]), level,
                                                alpha)
                    hoist[src_key] = digits
                acc0, acc1 = self._ks_dp(None, level, site, alpha,
                                         perm=aperm, digits=digits,
                                         defer=True)
            else:
                c1 = aperm(polys[1])
                acc0, acc1 = self._ks_dp(dev.intt(c1), level, site, alpha,
                                         defer=True)
            return ("rotsum", level, c0, None, acc0, acc1)
        if hoist is not None and src_key is not None:
            digits = hoist.get(src_key)
            if digits is None:
                digits = self._ks_digits(polys[1], level)
                hoist[src_key] = digits
            layout = self.dkeys.layout_rot(self.keys.galois[g], level, g)
            acc0, acc1 = self._ks_mac(digits, level, layout)
            return ("rotsum", level, c0, None, aperm(acc0), aperm(acc1))
        c1 = aperm(polys[1])
        if self._fused_ks_ok(level):
            acc0, acc1 = self._ks_fused_mac(dev.intt(c1), level,
                                            self.keys.galois[g],
                                            poly_ntt=c1)
        else:
            digits = self._ks_digits(c1, level, alpha)
            acc0, acc1 = self._ks_mac(
                digits, level, self.dkeys.layout(self.keys.galois[g], level))
        return ("rotsum", level, c0, None, acc0, acc1)

    def _key_switch(self, poly, level: int, ksk, site: str = "relin"):
        if self._dp is not None:
            dev = self._ops_at(level)
            return self._ks_dp(dev.intt(poly), level, site, ksk.alpha)
        if self._fused_ks_ok(level):
            dev = self._ops_at(level)
            return self._ks_fused_coeffs(dev.intt(poly), level, ksk,
                                         out_ntt=True, poly_ntt=poly)
        return self._ks_apply(self._ks_digits(poly, level, ksk.alpha), level,
                              self.dkeys.layout(ksk, level))

    def _divide_last(self, coeffs, primes: List[int]):
        """Divide-and-round coefficient planes by the last prime (see
        divide_last_planes; routed through self._lops so a seq-sharded
        trace uses the sharded elementwise ops)."""
        return divide_last_planes(coeffs, primes, self._lops(primes[:-1]))

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
            out.append(self._lops(prim).ntt(x))
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
                v = vals[args[0].index]
                if self._is_rotsum(v):
                    vals[idx] = self._rotsum_neg(v, dev)
                else:
                    vals[idx] = [dev.neg(c)
                                 for c in self._fin_at(vals, args[0].index)]
            elif op in (Op.RotateLeftConst, Op.RotateRightConst):
                steps = term.get_attr(ROTATION)
                if op == Op.RotateRightConst:
                    steps = -steps
                src = self._fin_at(vals, args[0].index)
                hk = (args[0].index
                      if args[0].index in self._hoisted_sources else None)
                if (self._rotsum_on and self.k == 1
                        and steps % (ctx.n // 2) != 0):
                    vals[idx] = self._rotate_acc(
                        src, steps, p.level, dev,
                        hoist if hk is not None else None, hk)
                elif hk is not None:
                    vals[idx] = self._rotate(src, steps, p.level, dev,
                                             hoist, hk)
                else:
                    vals[idx] = self._rotate(src, steps, p.level, dev)
            elif op == Op.Relinearize:
                if idx in self._fused_relins:
                    vals[idx] = self._fin_at(vals, args[0].index)
                elif args[0].index in self._fused_rescales:
                    prev = self.plan[args[0].operands[0].index]
                    vals[idx] = self._rescale_relin(
                        self._fin_at(vals, args[0].index), prev.level)
                else:
                    vals[idx] = self._relin(self._fin_at(vals, args[0].index),
                                            p.level, dev)
            elif op == Op.ModSwitch:
                v = self._fin_at(vals, args[0].index)
                keep = len(ctx.primes_at_level(p.level))
                if isinstance(v, tuple):
                    vals[idx] = ("plain", v[1][..., :keep, :])
                else:
                    vals[idx] = [c[..., :keep, :] for c in v]
            elif op == Op.Rescale:
                if idx in self._fused_rescales:
                    vals[idx] = self._fin_at(vals, args[0].index)
                elif args[0].index in self._fused_relins:
                    prev = self.plan[args[0].operands[0].index]
                    vals[idx] = self._relin_rescale(
                        self._fin_at(vals, args[0].index), prev.level)
                else:
                    prev = self.plan[args[0].index]
                    vals[idx] = self._rescale(
                        self._fin_at(vals, args[0].index), prev.level)
            elif op == Op.Output:
                vals[idx] = self._fin_at(vals, args[0].index)
            else:
                raise RuntimeError(f"unsupported op in jax backend: {op.name}")

        out = {}
        for name, t in self.program.outputs.items():
            if self.types[t] == Type.Raw:
                continue  # raw outputs are computed host-side
            v = self._fin_at(vals, t.index)
            if isinstance(v, tuple):  # plain output: drop any ext rows
                n_cur = len(ctx.primes_at_level(self.plan[t.index].level))
                out[name] = (v[1][..., :n_cur, :],)
            else:
                out[name] = tuple(v)
        return out

    @staticmethod
    def _is_rotsum(v) -> bool:
        return isinstance(v, tuple) and len(v) == 6 and v[0] == "rotsum"

    def _rotsum_add(self, a, b, dev: DeviceLevelOps, sub: bool = False):
        """Merge/fold for Add/Sub when at least one operand is a deferred
        rotation sum. Returns the merged rotsum, or None when the
        combination can't stay deferred (caller finalizes). Modular adds
        are exact and order-independent, so merged results are
        bit-independent of association order; sub merging is sound the
        same way (round(-x/P) = -round(x/P): odd centered rounding)."""
        if self._is_rotsum(a) and self._is_rotsum(b):
            _, level, c0a, c1a, acc0a, acc1a = a
            _, level_b, c0b, c1b, acc0b, acc1b = b
            if level != level_b:  # pragma: no cover - checker prevents
                return None
            ext = self._ext_ops_at(level)
            f, fe = (dev.sub, ext.sub) if sub else (dev.add, ext.add)
            if c1b is None:
                c1 = c1a
            elif c1a is None:
                c1 = dev.neg(c1b) if sub else c1b
            else:
                c1 = f(c1a, c1b)
            return ("rotsum", level, f(c0a, c0b), c1,
                    fe(acc0a, acc0b), fe(acc1a, acc1b))
        if self._is_rotsum(b):
            if sub:  # a - rs: negate every rs component, then add
                b = self._rotsum_neg(b, dev)
                sub = False
            a, b = b, a
        _, level, c0, c1, acc0, acc1 = a
        f = dev.sub if sub else dev.add
        if isinstance(b, tuple):  # ("plain", pt): folds into c0 only
            pt = b[1]
            if pt.shape[-2] != c0.shape[-2]:  # extended-basis rows present
                pt = pt[..., :c0.shape[-2], :]
            return ("rotsum", level, f(c0, pt), c1, acc0, acc1)
        if isinstance(b, list) and len(b) == 2:
            if c1 is None:
                c1 = dev.neg(b[1]) if sub else b[1]
            else:
                c1 = f(c1, b[1])
            return ("rotsum", level, f(c0, b[0]), c1, acc0, acc1)
        return None  # size-3 ciphertext: finalize and add normally

    def _rotsum_mul(self, rs, pt):
        """Baby-step fusion: multiply a deferred rotation sum by a
        plaintext whose upload carries extended-basis rows (shape
        n_cur + n_key; see _plain_np / crypto.keys.encode ext_primes).
        The multiply distributes over the pre-division accumulators, so
        rot(x,s)*w products keep merging through Adds and the whole BSGS
        inner sum pays ONE P-division — with strictly less noise than
        the eager form (the per-rotation division roundings are no
        longer scaled by w). Anchor: reference
        examples/image_processing.py:36-58 conv taps."""
        _, level, c0, c1, acc0, acc1 = rs
        n_cur = len(self.ctx.primes_at_level(level))
        dev = self._ops_at(level)
        ext = self._ext_ops_at(level)
        ptq = pt[..., :n_cur, :]
        return ("rotsum", level, dev.mul(c0, ptq),
                None if c1 is None else dev.mul(c1, ptq),
                ext.mul(acc0, pt), ext.mul(acc1, pt))

    def _rotsum_neg(self, rs, dev: DeviceLevelOps):
        """Negate a deferred rotation sum without finalizing — EXACTLY
        equal to negate-after-finalize (odd centered rounding)."""
        _, level, c0, c1, acc0, acc1 = rs
        ext = self._ext_ops_at(level)
        return ("rotsum", level, dev.neg(c0),
                None if c1 is None else dev.neg(c1),
                ext.neg(acc0), ext.neg(acc1))

    def _binop(self, term: Term, vals, dev: DeviceLevelOps):
        a = vals[term.operands[0].index]
        b = vals[term.operands[1].index]
        op = term.op
        if self._is_rotsum(a) or self._is_rotsum(b):
            if op in (Op.Add, Op.Sub):
                merged = self._rotsum_add(a, b, dev, sub=(op == Op.Sub))
                if merged is not None:
                    return merged
            elif op == Op.Mul:
                rs, other = (a, b) if self._is_rotsum(a) else (b, a)
                if (not self._is_rotsum(other) and isinstance(other, tuple)
                        and other[0] == "plain"
                        and other[1].shape[-2] > len(
                            self.ctx.primes_at_level(rs[1]))):
                    return self._rotsum_mul(rs, other[1])
            a = self._fin_at(vals, term.operands[0].index)
            b = self._fin_at(vals, term.operands[1].index)
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
        if pt.shape[-2] != a[0].shape[-2]:  # extended-basis rows present
            pt = pt[..., :a[0].shape[-2], :]
        if op == Op.Add:
            return [dev.add(a[0], pt)] + list(a[1:])
        if op == Op.Sub:
            return [dev.sub(a[0], pt)] + list(a[1:])
        return [dev.mul(c, pt) for c in a]

    def _relin(self, polys, level: int, dev: DeviceLevelOps):
        if len(polys) == 2:
            return list(polys)
        d0, d1 = self._key_switch(polys[2], level, self.keys.relin)
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
        dev_new = self._lops(new_primes)
        coeffs0 = dev.intt(polys[0])
        coeffs1 = dev.intt(polys[1])
        if len(polys) == 3:
            if self._dp is not None:
                d0, d1 = self._ks_dp(dev.intt(polys[2]), level, "relin",
                                     self.keys.relin.alpha, out_ntt=False)
            elif self._fused_ks_ok(level):
                d0, d1 = self._ks_fused_coeffs(
                    dev.intt(polys[2]), level, self.keys.relin,
                    out_ntt=False, poly_ntt=polys[2])
            else:
                digits = self._ks_digits(polys[2], level,
                                         self.keys.relin.alpha)
                d0, d1 = self._ks_apply(
                    digits, level, self.dkeys.layout(self.keys.relin, level),
                    coeff_out=True)
            dev_cur = self._lops(primes)
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
        dev_new = self._lops(new_primes)
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
        if self._dp is not None:
            d0, d1 = self._ks_dp(coeffs[2], new_level, "relin",
                                 self.keys.relin.alpha, out_ntt=False)
        elif self._fused_ks_ok(new_level):
            d0, d1 = self._ks_fused_coeffs(coeffs[2], new_level,
                                           self.keys.relin, out_ntt=False)
        else:
            digits = self._ks_digits_from_coeffs(coeffs[2], new_level,
                                                 self.keys.relin.alpha)
            d0, d1 = self._ks_apply(
                digits, new_level,
                self.dkeys.layout(self.keys.relin, new_level),
                coeff_out=True)
        return [dev_new.ntt(dev_new.add(coeffs[0], d0)),
                dev_new.ntt(dev_new.add(coeffs[1], d1))]

    def _rotate(self, polys, steps: int, level: int, dev: DeviceLevelOps,
                hoist=None, src_key=None):
        """Galois rotation.

        Sources rotated >=2 times use hoisting: the digit decomposition of
        c1 is computed once and shared across rotations; each rotation
        MACs it against the INVERSE-permuted key (DeviceKeys.layout_rot)
        and permutes only the two output polynomials — 2*n_cur rows
        instead of the ~n_groups*n_ext-row digit stack (the automorphism
        commutes with the MAC and the P-division epilogue exactly).
        Single rotations permute c1 FIRST and decompose the permuted
        polynomial: gathers are among the most expensive TPU ops, and
        permuting the 2 input rows costs ~(n_digits*n_ext)/n_cur times
        less than permuting the digit stack. The hoist/permute-first
        decision depends only on the program (rotation counts per
        source), so the numpy backend makes the identical choice and
        results stay bit-identical."""
        ctx = self.ctx
        if steps % (self.k * (ctx.n // 2)) == 0:
            return list(polys)
        if self.k > 1:
            return self._rotate_sharded(polys, steps, level, dev, hoist,
                                        src_key)
        g = ctx.galois_elt(steps)
        aperm = self._aperm(g)
        if self._dp is not None:
            c0 = aperm(polys[0])
            site = f"galois_{g}"
            alpha = self.keys.galois[g].alpha
            if hoist is not None and src_key is not None:
                digits = hoist.get(src_key)
                if digits is None:
                    digits = self._ks_dp_digits(dev.intt(polys[1]), level,
                                                alpha)
                    hoist[src_key] = digits
                d0, d1 = self._ks_dp(None, level, site, alpha, perm=aperm,
                                     digits=digits)
            else:
                c1 = aperm(polys[1])
                d0, d1 = self._ks_dp(dev.intt(c1), level, site, alpha)
            return [dev.add(c0, d0), d1]
        if hoist is not None and src_key is not None:
            digits = hoist.get(src_key)
            if digits is None:
                digits = self._ks_digits(polys[1], level)
                hoist[src_key] = digits
            layout = self.dkeys.layout_rot(self.keys.galois[g], level, g)
            d0, d1 = self._ks_apply(digits, level, layout)
            return [aperm(dev.add(polys[0], d0)), aperm(d1)]
        c0 = aperm(polys[0])
        if self._fused_ks_ok(level):
            c1 = aperm(polys[1])
            d0, d1 = self._ks_fused_coeffs(dev.intt(c1), level,
                                           self.keys.galois[g], out_ntt=True,
                                           poly_ntt=c1)
        else:
            c1 = aperm(polys[1])
            digits = self._ks_digits(c1, level, self.keys.galois[g].alpha)
            d0, d1 = self._ks_apply(
                digits, level, self.dkeys.layout(self.keys.galois[g], level))
        return [dev.add(c0, d0), d1]

    def _rotate_sharded(self, polys, steps: int, level: int,
                        dev: DeviceLevelOps, hoist=None, src_key=None):
        """Rotation of a sharded big-vector ciphertext (strided layout,
        crypto/bigvec): roll the shard axis by c (two slices on TPU),
        then key-switch the first k-c shards with Galois step `lo` and
        the rest with `hi` — mask-free and exact, at most two keys per
        logical rotation. Hoisted sources share one digit decomposition
        of the full shard stack; the rolled digit windows feed both
        groups."""
        from ..crypto.bigvec import rotation_plan
        ctx = self.ctx
        k = self.k
        c, lo, hi = rotation_plan(steps, k, ctx.n // 2)
        ax = polys[0].ndim - 3  # shard axis of [..., k, n_sub, N] planes
        p0 = jnp.roll(polys[0], -c, axis=ax) if c else polys[0]
        p1 = jnp.roll(polys[1], -c, axis=ax) if c else polys[1]
        groups = []
        if c < k:
            groups.append((0, k - c, lo))
        if c:
            groups.append((k - c, k, hi))

        digits_full = None
        if hoist is not None and src_key is not None:
            digits_full = hoist.get(src_key)
            if digits_full is None:
                digits_full = self._ks_digits(polys[1], level)
                hoist[src_key] = digits_full

        def shard_slice(arr, g_lo, g_hi):
            idx = [slice(None)] * arr.ndim
            idx[arr.ndim - 3] = slice(g_lo, g_hi)
            return arr[tuple(idx)]

        out0, out1 = [], []
        for g_lo, g_hi, amt in groups:
            s0 = shard_slice(p0, g_lo, g_hi)
            s1 = shard_slice(p1, g_lo, g_hi)
            if amt == 0:
                out0.append(s0)
                out1.append(s1)
                continue
            g = ctx.galois_elt(amt)
            aperm = dev_perm(ctx, g)
            if digits_full is not None:
                # Permute-after: MAC the shared digits against the
                # inverse-permuted key, automorph only the two outputs.
                dg = digits_full.shard_window(c, g_lo, g_hi)
                layout = self.dkeys.layout_rot(self.keys.galois[g], level, g)
                d0, d1 = self._ks_apply(dg, level, layout)
                out0.append(aperm(dev.add(s0, d0)))
                out1.append(aperm(d1))
                continue
            layout = self.dkeys.layout(self.keys.galois[g], level)
            c0 = aperm(s0)
            c1p = aperm(s1)
            d0, d1 = self._ks_apply(
                self._ks_digits(c1p, level, self.keys.galois[g].alpha),
                level, layout)
            out0.append(dev.add(c0, d0))
            out1.append(d1)
        if len(out0) == 1:
            return [out0[0], out1[0]]
        return [jnp.concatenate(out0, axis=ax),
                jnp.concatenate(out1, axis=ax)]

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
            n_batch_devices = mesh.shape["batch"] * mesh.shape.get("host", 1)
            rem = batch % n_batch_devices
            if rem:
                pad = n_batch_devices - rem
                host_values_list = (list(host_values_list)
                                    + [host_values_list[-1]] * pad)

        def place(arr):
            if mesh is None:
                return arr
            from ..parallel.sharding import batch_axes
            if mesh.shape.get("seq", 1) > 1 and arr.ndim == 3:
                spec = P(batch_axes(mesh), None, "seq")
            else:
                spec = P(batch_axes(mesh))
            return _jax.device_put(arr, NamedSharding(mesh, spec))

        cipher_in = {}
        plain_in = {}
        plain_unbatched = set()
        first = host_values_list[0]
        for idx, v in first.items():
            key = f"t{idx}"
            if isinstance(v, Ciphertext):
                cipher_in[key] = [
                    place(jnp.asarray(np.stack(
                        [_to_u32(hv[idx].polys[k]) for hv in host_values_list])))
                    for k in range(v.size)]
            elif isinstance(v, Plaintext):
                # Program constants (cached encodes) are the same host
                # object for every batch element: upload ONE unbatched
                # copy (replicated on a mesh) and let broadcasting apply
                # it — not B stacked copies per call.
                if all(hv[idx] is v for hv in host_values_list):
                    plain_unbatched.add(key)
                    dev_arr = self._upload(
                        v, lambda pt: jnp.asarray(_plain_np(pt)))
                    if mesh is not None:
                        # Match the shard_map in_spec for unbatched
                        # plains: P(None, "seq") on a seq mesh (avoids a
                        # reshard transfer every execute_batch call),
                        # replicated otherwise.
                        if mesh.shape.get("seq", 1) > 1:
                            uspec = P(None, "seq")
                        else:
                            uspec = P()
                        dev_arr = _jax.device_put(
                            dev_arr, NamedSharding(mesh, uspec))
                    plain_in[key] = dev_arr
                else:
                    plain_in[key] = place(jnp.asarray(np.stack(
                        [_plain_np(hv[idx]) for hv in host_values_list])))

        if mesh is None:
            out = self._jitted(cipher_in, plain_in)
        else:
            out = self._sharded_jit(mesh, cipher_in, plain_in,
                                    plain_unbatched)(cipher_in, plain_in)
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

    def run_pipelined(self, host_values_iter, depth: int = 2):
        """Generator over per-execution outputs, overlapping upload,
        device compute, and device->host fetch across consecutive
        executions.

        JAX dispatch is asynchronous: each execution is enqueued
        immediately and its output transfers are started with
        copy_to_host_async, so while the host blocks fetching execution
        k's outputs the device is already computing executions
        k+1..k+depth. This is the serving loop's shape — the reference's
        pipeline-across-trust-domains (SURVEY.md §2.9 item 3) runs the
        server role at full device utilization even when the host link
        is slow (on the tunnel, output fetch costs ~15x the compute).

        `depth` bounds in-flight executions (device memory: one set of
        output ciphertexts each)."""
        import collections

        pending = collections.deque()

        def dispatch(host_values):
            cipher_in, plain_in = {}, {}
            for idx, v in host_values.items():
                if isinstance(v, Ciphertext):
                    cipher_in[f"t{idx}"] = self._upload(
                        v, lambda ct: [jnp.asarray(_to_u32(c))
                                       for c in ct.polys])
                elif isinstance(v, Plaintext):
                    plain_in[f"t{idx}"] = self._upload(
                        v, lambda pt: jnp.asarray(_plain_np(pt)))
            out = self._jitted(cipher_in, plain_in)
            for planes in out.values():
                for c in planes:
                    try:
                        c.copy_to_host_async()
                    except (AttributeError, RuntimeError):
                        pass  # fetched synchronously in collect
            return out

        def collect(out):
            result = {}
            for name, t in self.program.outputs.items():
                if self.types[t] == Type.Raw:
                    continue
                planes = [np.asarray(c).astype(np.uint64)
                          for c in out[name]]
                p = self.plan[t.index]
                if self.types[t] == Type.Plain:
                    result[name] = Plaintext(planes[0], p.level, p.scale)
                else:
                    result[name] = Ciphertext(planes, p.level, p.scale)
            return result

        for hv in host_values_iter:
            pending.append(dispatch(hv))
            if len(pending) > depth:
                yield collect(pending.popleft())
        while pending:
            yield collect(pending.popleft())

    def run(self, host_values: Dict[int, object]) -> Dict[str, Ciphertext]:
        """host_values: term index -> Ciphertext (inputs) or Plaintext
        (inputs + encodes, already host-encoded). Returns output name ->
        Ciphertext (numpy, uint64)."""
        cipher_in = {}
        plain_in = {}
        for idx, v in host_values.items():
            if isinstance(v, Ciphertext):
                cipher_in[f"t{idx}"] = self._upload(
                    v, lambda ct: [jnp.asarray(_to_u32(c)) for c in ct.polys])
            elif isinstance(v, Plaintext):
                plain_in[f"t{idx}"] = self._upload(
                    v, lambda pt: jnp.asarray(_plain_np(pt)))
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
