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
