"""Encode insertion: wrap Raw operands of Cipher-mixed binary ops in Encode
nodes (type Plain). For Add/Sub the encode scale matches the cipher
operand's scale; for Mul it keeps its own. Reference: eva/ckks/encode_inserter.h."""

from __future__ import annotations

from ..ir import ENCODE_AT_SCALE, Op, Program, Term, TermMap, Type


class EncodeInserter:
    def __init__(self, program: Program, types: TermMap, scales: TermMap):
        self.program = program
        self.types = types
        self.scales = scales

    def _insert_encode(self, op: Op, cipher_side: Term, raw_side: Term) -> Term:
        node = self.program.make_term(Op.Encode, [raw_side])
        self.types[node] = Type.Plain
        if op in (Op.Add, Op.Sub):
            self.scales[node] = self.scales.at(cipher_side)
        else:
            self.scales[node] = self.scales.at(raw_side)
        node.set_attr(ENCODE_AT_SCALE, self.scales.at(node))
        return node

    def __call__(self, term: Term) -> None:
        operands = term.operands
        if not operands:
            return
        assert len(operands) <= 2
        if len(operands) == 2:
            left, right = operands[0], operands[1]
            if self.types[left] == Type.Cipher and self.types[right] == Type.Raw:
                term.replace_operand(right, self._insert_encode(term.op, left, right))
            if self.types[right] == Type.Cipher and self.types[left] == Type.Raw:
                term.replace_operand(left, self._insert_encode(term.op, right, left))
