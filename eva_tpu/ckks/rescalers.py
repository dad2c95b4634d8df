"""Rescaling policies.

References: eva/ckks/rescaler.h, lazy_waterline_rescaler.h,
eager_waterline_rescaler.h, always_rescaler.h, minimum_rescaler.h.

All are forward-pass functors. Scale accounting is in integer bits
(scale s means the value is multiplied by 2^s before encoding)."""

from __future__ import annotations

from ..ir import ENCODE_AT_SCALE, Op, Program, Term, TermMap, Type

FIXED_RESCALE = 60  # bits removed per Rescale, reference lazy_waterline_rescaler.h:13


class RescalerBase:
    def __init__(self, program: Program, types: TermMap, scales: TermMap):
        self.program = program
        self.types = types
        self.scales = scales
        # waterline = max scale among all sources (reference asserts non-zero)
        self.min_scale = 0
        for source in program.get_sources():
            s = scales[source]
            if s is not None and s > self.min_scale:
                self.min_scale = s
        assert self.min_scale != 0, "input scales must be set before compiling"

    # -- helpers (reference: eva/ckks/rescaler.h:29-57) ---------------------

    def insert_rescale(self, term: Term, rescale_by: int) -> Term:
        node = self.program.make_rescale(term, rescale_by)
        self.types[node] = self.types[term]
        self.scales[node] = self.scales.at(term) - rescale_by
        term.replace_other_uses_with(node)
        return node

    def insert_rescale_between(self, term1: Term, term2: Term, rescale_by: int) -> None:
        node = self.program.make_rescale(term1, rescale_by)
        self.types[node] = self.types[term1]
        self.scales[node] = self.scales.at(term1) - rescale_by
        term2.replace_operand(term1, node)

    def handle_raw_scale(self, term: Term) -> None:
        if term.operands:
            self.scales[term] = max(self.scales.at(o) for o in term.operands)

    def match_addition_scales(self, term: Term) -> int:
        """Scale up lower-scale operands of Add/Sub by multiplying with a
        constant 1 encoded at the scale difference. Returns the max scale."""
        max_scale = max(self.scales.at(o) for o in term.operands)
        for operand in list(term.operands):
            if self.scales.at(operand) < max_scale and self.types[operand] != Type.Raw:
                one = self.program.make_uniform_constant(1)
                diff = max_scale - self.scales.at(operand)
                self.scales[one] = diff
                one.set_attr(ENCODE_AT_SCALE, diff)
                mul = self.program.make_term(Op.Mul, [operand, one])
                self.scales[mul] = max_scale
                term.replace_operand(operand, mul)
        return max_scale


class LazyWaterlineRescaler(RescalerBase):
    """Default policy: defer rescaling after Mul until the value reaches a
    Mul/Output/multi-use point, then rescale down to the waterline.
    Reference: eva/ckks/lazy_waterline_rescaler.h:11-153."""

    def __init__(self, program, types, scales):
        super().__init__(program, types, scales)
        self.pending = TermMap(False)

    def _insert_rescale_recursive(self, term: Term) -> None:
        temp = term
        term_scale = self.scales.at(temp)
        while term_scale >= FIXED_RESCALE + self.min_scale:
            temp = self.insert_rescale(temp, FIXED_RESCALE)
            term_scale -= FIXED_RESCALE
            assert term_scale == self.scales.at(temp)

    def __call__(self, term: Term) -> None:
        if not term.operands:
            return
        if self.types[term] == Type.Raw:
            self.handle_raw_scale(term)
            return
        op = term.op
        if op == Op.Rescale:
            return
        if op == Op.Mul:
            assert not self.pending[term]
            mult_scale = sum(self.scales.at(o) for o in term.operands)
            assert mult_scale != 0
            self.scales[term] = mult_scale
            if mult_scale >= FIXED_RESCALE + self.min_scale:
                self.pending[term] = True
            else:
                return
        else:
            # Add/Sub/Negate/rotations copy the first operand's scale.
            self.scales[term] = self.scales.at(term.operand_at(0))
            if op in (Op.Add, Op.Sub):
                self.scales[term] = self.match_addition_scales(term)
            if not self.pending[term]:
                return

        assert self.pending[term]
        assert term.uses
        first_use = term.uses[0]
        must_insert = any(
            use.op == Op.Mul or use.op == Op.Output or use is not first_use
            for use in term.uses)
        if must_insert:
            self.pending[term] = False
            self._insert_rescale_recursive(term)
        else:
            for use in term.uses:
                self.pending[use] = True


class EagerWaterlineRescaler(RescalerBase):
    """Rescale by 60 bits immediately after each Mul while above the
    waterline. Reference: eva/ckks/eager_waterline_rescaler.h:11-93."""

    def __call__(self, term: Term) -> None:
        if not term.operands:
            return
        if self.types[term] == Type.Raw:
            self.handle_raw_scale(term)
            return
        if term.op == Op.Rescale:
            return
        if term.op != Op.Mul:
            self.scales[term] = self.scales.at(term.operand_at(0))
            if term.op in (Op.Add, Op.Sub):
                self.scales[term] = self.match_addition_scales(term)
            return
        mult_scale = sum(self.scales.at(o) for o in term.operands)
        assert mult_scale != 0
        self.scales[term] = mult_scale
        temp = term
        while mult_scale >= FIXED_RESCALE + self.min_scale:
            temp = self.insert_rescale(temp, FIXED_RESCALE)
            mult_scale -= FIXED_RESCALE
            assert mult_scale == self.scales.at(temp)


class AlwaysRescaler(RescalerBase):
    """Rescale after every Mul down to the waterline. Only valid when all
    inputs share one scale. Reference: eva/ckks/always_rescaler.h:10-63."""

    def __call__(self, term: Term) -> None:
        if not term.operands:
            return
        if self.types[term] == Type.Raw:
            self.handle_raw_scale(term)
            return
        if term.op == Op.Rescale:
            return
        if term.op != Op.Mul:
            self.scales[term] = self.scales.at(term.operand_at(0))
            return
        mult_scale = sum(self.scales.at(o) for o in term.operands)
        assert mult_scale != 0
        self.scales[term] = mult_scale
        self.insert_rescale(term, mult_scale - self.min_scale)


class MinimumRescaler(RescalerBase):
    """Minimize rescale count: when 2*rescaleBy >= 60, rescale both operands
    before the Mul; otherwise waterline-rescale after. Not general.
    Reference: eva/ckks/minimum_rescaler.h:11-122."""

    MAX_RESCALE = 60

    def __call__(self, term: Term) -> None:
        if not term.operands:
            return
        if self.types[term] == Type.Raw:
            self.handle_raw_scale(term)
            return
        if term.op == Op.Rescale:
            return
        if term.op != Op.Mul:
            self.scales[term] = self.scales.at(term.operand_at(0))
            if term.op in (Op.Add, Op.Sub):
                self.scales[term] = self.match_addition_scales(term)
            return
        ops = list(term.operands)
        assert len(ops) == 2
        mult_scale = self.scales.at(ops[0]) + self.scales.at(ops[1])
        assert mult_scale != 0
        self.scales[term] = mult_scale
        rescale_by = min(self.scales.at(ops[0]), self.scales.at(ops[1])) - self.min_scale
        rescale_by = min(rescale_by, self.MAX_RESCALE)
        if 2 * rescale_by >= self.MAX_RESCALE:
            self.insert_rescale_between(ops[0], term, rescale_by)
            if ops[0] is not ops[1]:
                self.insert_rescale_between(ops[1], term, rescale_by)
            self.scales[term] = mult_scale - 2 * rescale_by
        else:
            temp = term
            while mult_scale >= self.MAX_RESCALE + self.min_scale:
                temp = self.insert_rescale(temp, self.MAX_RESCALE)
                mult_scale -= self.MAX_RESCALE
                assert mult_scale == self.scales.at(temp)


RESCALER_CLASSES = {
    "lazy_waterline": LazyWaterlineRescaler,
    "eager_waterline": EagerWaterlineRescaler,
    "always": AlwaysRescaler,
    "minimum": MinimumRescaler,
}
