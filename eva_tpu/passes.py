"""Scheme-agnostic compiler passes.

References: eva/common/type_deducer.h, eva/common/constant_folder.h,
eva/common/reduction_balancer.h, eva/common/rotation_keys_selector.h."""

from __future__ import annotations

from typing import Dict, List

from .ir import (CONSTANT_VALUE, ENCODE_AT_SCALE, ROTATION, Op, Program, Term,
                 TermMap, Type)


class TypeDeducer:
    """Forward pass: Cipher if any operand is Cipher, else Raw; Encode is
    Plain; Constants are Raw; Inputs read their TypeAttribute.
    Reference: eva/common/type_deducer.h:11-38."""

    def __init__(self, program: Program, types: TermMap):
        self.program = program
        self.types = types

    def __call__(self, term: Term) -> None:
        if term.operands:
            inferred = Type.Raw
            for operand in term.operands:
                if self.types[operand] == Type.Cipher:
                    inferred = Type.Cipher
            self.types[term] = Type.Plain if term.op == Op.Encode else inferred
        elif term.op == Op.Constant:
            self.types[term] = Type.Raw
        else:
            self.types[term] = term.get_attr(4)  # TypeAttribute


def rotation_hoist_sources(order) -> set:
    """Indices of terms rotated at least twice: only those benefit from
    hoisting (decompose once, permute digits per rotation); single
    rotations permute c1 first, which is much cheaper on TPU where the
    permutation is a gather. Shared by both executor backends so their
    rotation paths stay bit-identical."""
    counts: Dict[int, int] = {}
    for t in order:
        if t.op in (Op.RotateLeftConst, Op.RotateRightConst):
            src = t.operands[0].index
            counts[src] = counts.get(src, 0) + 1
    return {src for src, n in counts.items() if n >= 2}


def _cyclic_shift(values: List[float], shift: int) -> List[float]:
    n = len(values)
    shift %= n
    return values[shift:] + values[:shift]


class ConstantFolder:
    """Forward pass folding terms whose operands are all constants into a
    new dense constant (scale = max of operand scales).
    Reference: eva/common/constant_folder.h:11-190."""

    def __init__(self, program: Program, scales: TermMap):
        self.program = program
        self.scales = scales

    def _replace(self, term: Term, values: List[float], scale) -> None:
        constant = self.program.make_dense_constant(values)
        self.scales[constant] = scale
        constant.set_attr(ENCODE_AT_SCALE, scale)
        term.replace_all_uses_with(constant)

    def __call__(self, term: Term) -> None:
        args = term.operands
        if not args:
            return
        for arg in args:
            if arg.op != Op.Constant:
                return
        vec_size = self.program.vec_size
        expand = lambda a: a.get_attr(CONSTANT_VALUE).expand(vec_size)
        op = term.op
        if op in (Op.Add, Op.Sub, Op.Mul):
            v1, v2 = expand(args[0]), expand(args[1])
            if op == Op.Add:
                out = [a + b for a, b in zip(v1, v2)]
            elif op == Op.Sub:
                out = [a - b for a, b in zip(v1, v2)]
            else:
                out = [a * b for a, b in zip(v1, v2)]
            self._replace(term, out, max(self.scales.at(args[0]), self.scales.at(args[1])))
        elif op == Op.RotateLeftConst:
            self._replace(term, _cyclic_shift(expand(args[0]), term.get_attr(ROTATION)),
                          self.scales.at(args[0]))
        elif op == Op.RotateRightConst:
            self._replace(term, _cyclic_shift(expand(args[0]), -term.get_attr(ROTATION)),
                          self.scales.at(args[0]))
        elif op == Op.Negate:
            self._replace(term, [-v for v in expand(args[0])], self.scales.at(args[0]))
        elif op in (Op.Output, Op.Encode):
            pass
        elif op in (Op.Relinearize, Op.ModSwitch, Op.Rescale):
            raise RuntimeError(
                f"Encountered HE specific operation {op.name} in unencrypted computation")
        else:
            raise RuntimeError(f"Unhandled op {op.name}")


class ReductionCombiner:
    """Flatten chains: a single-use Add/Mul whose unique use has the same op
    is merged into that use, producing n-ary reduction nodes.
    Reference: eva/common/reduction_balancer.h:30-58."""

    def __init__(self, program: Program):
        self.program = program

    def __call__(self, term: Term) -> None:
        if not term.is_internal() or term.op not in (Op.Add, Op.Mul):
            return
        uses = term.uses
        if len(uses) == 1:
            use = uses[0]
            if use.op == term.op:
                while use.erase_operand(term):
                    for operand in list(term.operands):
                        use.add_operand(operand)


class ReductionLogExpander:
    """Re-expand n-ary Add/Mul into balanced binary trees; operands sorted
    constants first, then plain/raw, then ciphers by accumulated
    pre-rescaling scale (a proxy for level).
    Reference: eva/common/reduction_balancer.h:60-146."""

    def __init__(self, program: Program, types: TermMap):
        self.program = program
        self.types = types
        self.scale = TermMap()

    def __call__(self, term: Term) -> None:
        if term.op in (Op.Rescale, Op.ModSwitch):
            raise RuntimeError(
                "Rescale or ModSwitch encountered, but ReductionLogExpander uses "
                "scale as a proxy for level and assumes rescaling has not been "
                "performed yet.")

        if not term.operands:
            self.scale[term] = term.get_attr(ENCODE_AT_SCALE)
        elif term.op == Op.Mul:
            self.scale[term] = sum(self.scale.at(o) for o in term.operands)
        else:
            self.scale[term] = max(self.scale.at(o) for o in term.operands)

        if term.op in (Op.Add, Op.Mul) and len(term.operands) > 2:
            buckets: Dict[int, List[Term]] = {}
            for operand in term.operands:
                if self.types[operand] in (Type.Plain, Type.Raw):
                    order = 1
                elif self.types[operand] == Type.Cipher:
                    order = 2 + self.scale.at(operand)
                else:
                    order = 0
                buckets.setdefault(order, []).append(operand)
            operands: List[Term] = []
            for order in sorted(buckets):
                operands.extend(buckets[order])

            # Pair adjacent operands until two remain.
            while len(operands) > 2:
                nxt: List[Term] = []
                i = 0
                while i + 1 < len(operands):
                    pair = self.program.make_term(
                        term.op, [operands[i], operands[i + 1]])
                    # No TypeDeducer runs between this pass and the rescaler,
                    # so created pairs must be typed here: sorting constants
                    # first routinely pairs two Raw operands, and an untyped
                    # (Undef) pair would be rescaled as if it were a cipher.
                    if any(self.types[o] == Type.Cipher for o in pair.operands):
                        self.types[pair] = Type.Cipher
                    else:
                        self.types[pair] = Type.Raw
                    self.scale[pair] = (
                        sum(self.scale.at(o) for o in pair.operands)
                        if term.op == Op.Mul
                        else max(self.scale.at(o) for o in pair.operands))
                    nxt.append(pair)
                    i += 2
                if i < len(operands):
                    nxt.append(operands[i])
                operands = nxt
            term.set_operands(operands)


class RotationNormalizer:
    """Canonicalize rotations: every RotateLeft/RightConst becomes a
    RotateLeftConst with steps in [0, vec_size), and zero-step rotations
    collapse to their operand. Rotations are cyclic on vec_size (the
    reference replicates vectors to the slot count, so ring rotations by
    r and r mod vec_size act identically on every backend —
    reference seal.cpp:71-79 replication + reference_executor.cpp cyclic
    semantics), hence r>>1 and r<<(vec-1) need ONE Galois key, not two,
    and identity rotations need none. TPU-build extension (the
    reference's RotationKeysSelector collects raw steps)."""

    def __init__(self, program: Program, types: TermMap):
        self.program = program
        self.types = types

    def __call__(self, term: Term) -> None:
        if term.op not in (Op.RotateLeftConst, Op.RotateRightConst):
            return
        r = term.get_attr(ROTATION)
        if term.op == Op.RotateRightConst:
            r = -r
        r %= self.program.vec_size
        if r == 0:
            term.replace_all_uses_with(term.operands[0])
        elif term.op == Op.RotateRightConst or r != term.get_attr(ROTATION):
            rot = self.program.make_left_rotation(term.operands[0], r)
            self.types[rot] = self.types[term]
            term.replace_all_uses_with(rot)


class BSGSRotationFactorizer:
    """Baby-step/giant-step factorization of rotation-heavy sums — a
    TPU-build extension with no reference counterpart (the reference
    executes every rotation of a convolution separately;
    examples/image_processing.py:36-100 is the motivating workload).

    An n-ary Add of the form  sum_i rot(x, r_i) * w_i  (w_i compile-time
    constants, or absent) with r_i = g + b factorable over a stride s is
    rewritten as

        sum_g rot( sum_b rot(x, b) * rot(w_{g,b}, -g), g )

    using sigma_g(u * v) = sigma_g(u) * sigma_g(v): the baby rotations
    rot(x, b) are shared across ALL sums over the same source (cached
    per pass), so a KxK convolution needs K-1 baby + K-1 giant key
    switches instead of K^2-1, and the rotation-key set shrinks the same
    way. Runs between ReductionCombiner (which forms the n-ary sums) and
    ReductionLogExpander (which re-balances the rewritten sums).
    Plaintext semantics are preserved exactly (cyclic rotations commute
    with elementwise products); the compile-vs-source MSE oracle and the
    HE round-trip tests cover it. Gated by config bsgs_rotations."""

    MIN_ROTATIONS = 4  # below this the rewrite cannot win

    # Execution-cost model (units of one key-MAC) for the factorization
    # decision, reflecting how the executors actually run rotations:
    # every rotation of one source shares ONE hoisted digit decomposition
    # (the dominant cost: the extended-basis NTTs), each rotation pays a
    # key-MAC, and rotation-sum fusion defers the P-division epilogue to
    # the consuming sum — EXCEPT that each giant-step rotation must
    # finalize its inner sum first (a full two-polynomial epilogue) and
    # decompose it afresh. Direct form: DEC + R*MAC. BSGS(s): baby DEC +
    # B*MAC + G*(DEC + MAC + EPI). Ratios from the measured kernel
    # speed-of-light section (BENCH_r04 kernel_sol: ks_digits 288 us,
    # mac+epilogue 210 us at N=16384 L=6): decomposition ~3 MACs, the
    # two-poly division epilogue ~1.5 MACs. Round-5 MEASURED units
    # (BENCH r5 kernel_sol at N=16384 L=0: ks_digits 302 us, mac-only
    # 24.5 us, epilogue 170 us) put the MAC far cheaper still —
    # dec : mac : epi = 12.3 : 1 : 7.0 — so factoring only pays for
    # very wide rotation sets (every giant buys a fresh decomposition
    # AND an inner-sum epilogue; with G giants the break-even is
    # roughly R > G*(DEC+EPI) + B ≈ 80+ rotations at G=2). Convolution
    # grids through ~8x8 stay DIRECT: one hoisted decomposition + R
    # MACs + one fused epilogue. Override: config bsgs_rotations=false
    # disables factoring entirely.
    DEC_COST = 12.3
    MAC_COST = 1.0
    EPI_COST = 7.0

    def __init__(self, program: Program, types: TermMap, scales: TermMap):
        self.program = program
        self.types = types
        self.scales = scales
        self._baby_cache: Dict[tuple, Term] = {}
        self._const_cache: Dict[tuple, Term] = {}

    # -- pattern matching -----------------------------------------------

    def _parse(self, opd: Term):
        """(source, r, w_term|None) when opd is rot(x,r)*w, w*rot(x,r),
        or a bare rot(x,r) with x Cipher; else None."""
        vec = self.program.vec_size

        def rot_of(t):
            if t.op not in (Op.RotateLeftConst, Op.RotateRightConst):
                return None
            if self.types[t] != Type.Cipher:
                return None
            r = t.get_attr(ROTATION)
            if t.op == Op.RotateRightConst:
                r = -r
            return (t.operands[0], r % vec)

        if opd.op in (Op.RotateLeftConst, Op.RotateRightConst):
            hit = rot_of(opd)
            return None if hit is None else (hit[0], hit[1], None)
        if opd.op == Op.Mul and len(opd.operands) == 2:
            a, b = opd.operands
            for rot_side, w_side in ((a, b), (b, a)):
                if w_side.op != Op.Constant:
                    continue
                hit = rot_of(rot_side)
                if hit is not None:
                    return (hit[0], hit[1], w_side)
        return None

    @classmethod
    def _plan(cls, rotations):
        """Best (stride, cost) over candidate strides under the
        execution-cost model (see class constants); stride None means
        the direct (unfactored) form wins."""
        rs = sorted(set(rotations))
        n_rot = len([r for r in rs if r != 0])
        base_cost = cls.DEC_COST + n_rot * cls.MAC_COST
        cands = set(r for r in rs if r > 1)
        cands.update(b - a for a, b in zip(rs, rs[1:]) if b - a > 1)
        best = (None, base_cost)
        for s in cands:
            n_baby = len({r % s for r in rs} - {0})
            n_giant = len({r - r % s for r in rs} - {0})
            cost = ((cls.DEC_COST if n_baby else 0.0)
                    + n_baby * cls.MAC_COST
                    + n_giant * (cls.DEC_COST + cls.MAC_COST
                                 + cls.EPI_COST))
            if cost < best[1]:
                best = (s, cost)
        return best

    # -- rewrite helpers --------------------------------------------------

    def _baby(self, src: Term, b: int) -> Term:
        if b == 0:
            return src
        key = (src.index, b)
        if key not in self._baby_cache:
            rot = self.program.make_left_rotation(src, b)
            self.types[rot] = self.types[src]
            self._baby_cache[key] = rot
        return self._baby_cache[key]

    def _rotated_constant(self, w: Term, g: int) -> Term:
        if g == 0:
            return w
        key = (w.index, g)
        if key not in self._const_cache:
            vals = w.get_attr(CONSTANT_VALUE).expand(self.program.vec_size)
            # sigma_g(sigma_-g(w)) = w: w'[j] = w[(j - g) mod vec].
            c = self.program.make_dense_constant(_cyclic_shift(vals, -g))
            scale = w.get_attr(ENCODE_AT_SCALE)
            if scale is not None:
                c.set_attr(ENCODE_AT_SCALE, scale)
                self.scales[c] = scale
            self.types[c] = Type.Raw
            self._const_cache[key] = c
        return self._const_cache[key]

    def __call__(self, term: Term) -> None:
        if term.op != Op.Add or len(term.operands) <= self.MIN_ROTATIONS:
            return
        entries = []  # (position, source, r, w)
        by_src: Dict[int, int] = {}
        for pos, opd in enumerate(term.operands):
            hit = self._parse(opd)
            if hit is not None:
                entries.append((pos,) + hit)
                by_src[hit[0].index] = by_src.get(hit[0].index, 0) + 1
        if not entries:
            return
        src_idx = max(by_src, key=by_src.get)
        chosen = [e for e in entries if e[1].index == src_idx]
        rotations = [r for _, _, r, _ in chosen]
        if len(set(rotations)) < self.MIN_ROTATIONS:
            return
        s, cost = self._plan(rotations)
        if s is None:
            return

        src = chosen[0][1]
        taken = {pos for pos, _, _, _ in chosen}
        by_g: Dict[int, list] = {}
        for _, _, r, w in chosen:
            b = r % s
            by_g.setdefault(r - b, []).append((b, w))

        new_operands = [o for pos, o in enumerate(term.operands)
                        if pos not in taken]
        for g in sorted(by_g):
            parts = []
            for b, w in by_g[g]:
                base = self._baby(src, b)
                if w is None:
                    parts.append(base)
                else:
                    m = self.program.make_term(
                        Op.Mul, [base, self._rotated_constant(w, g)])
                    self.types[m] = Type.Cipher
                    parts.append(m)
            if len(parts) == 1:
                inner = parts[0]
            else:
                inner = self.program.make_term(Op.Add, parts)
                self.types[inner] = Type.Cipher
            if g:
                outer = self.program.make_left_rotation(inner, g)
                self.types[outer] = Type.Cipher
            else:
                outer = inner
            new_operands.append(outer)
        term.set_operands(new_operands)


class RotationKeysSelector:
    """Forward pass collecting the distinct rotation steps used by
    Cipher-typed rotations (right rotations negated).
    Reference: eva/common/rotation_keys_selector.h:15-55."""

    def __init__(self, program: Program, types: TermMap):
        self.program = program
        self.types = types
        self._keys = set()

    def __call__(self, term: Term) -> None:
        op = term.op
        if op not in (Op.RotateLeftConst, Op.RotateRightConst):
            return
        if self.types[term] == Type.Raw:
            return
        rotation = term.get_attr(ROTATION)
        self._keys.add(-rotation if op == Op.RotateRightConst else rotation)

    def rotation_keys(self):
        return sorted(self._keys)
