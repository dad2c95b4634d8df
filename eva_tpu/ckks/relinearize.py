"""Relinearization insertion policies.

References: eva/ckks/eager_relinearizer.h, eva/ckks/lazy_relinearizer.h."""

from __future__ import annotations

from ..ir import Op, Program, Term, TermMap, Type


def _all_operands_encrypted(term: Term, types: TermMap) -> bool:
    return all(types[o] == Type.Cipher for o in term.operands)


def _is_encrypted_mult(term: Term, types: TermMap) -> bool:
    return term.op == Op.Mul and _all_operands_encrypted(term, types)


class EagerRelinearizer:
    """Insert Relinearize immediately after every cipher*cipher Mul."""

    def __init__(self, program: Program, types: TermMap, scales: TermMap):
        self.program = program
        self.types = types
        self.scales = scales

    def __call__(self, term: Term) -> None:
        if not term.operands or term.op != Op.Mul:
            return
        if not _all_operands_encrypted(term, self.types):
            return
        relin = self.program.make_term(Op.Relinearize, [term])
        self.types[relin] = self.types[term]
        self.scales[relin] = self.scales.at(term)
        term.replace_other_uses_with(relin)


class LazyRelinearizer:
    """Defer relinearization until the size-3 ciphertext reaches a
    cipher-Mul, a rotation, an Output, or diverging uses — saving relins
    across adds/rescales. Reference: eva/ckks/lazy_relinearizer.h:11-96."""

    def __init__(self, program: Program, types: TermMap, scales: TermMap):
        self.program = program
        self.types = types
        self.scales = scales
        self.pending = TermMap(False)

    def __call__(self, term: Term) -> None:
        if not term.operands:
            return
        if _is_encrypted_mult(term, self.types):
            assert not self.pending[term]
            self.pending[term] = True
        elif not self.pending[term]:
            return

        assert term.uses
        first_use = term.uses[0]
        must_insert = any(
            _is_encrypted_mult(use, self.types)
            or use.op in (Op.RotateLeftConst, Op.RotateRightConst, Op.Output)
            or use is not first_use
            for use in term.uses)

        if must_insert:
            relin = self.program.make_term(Op.Relinearize, [term])
            self.types[relin] = self.types[term]
            self.scales[relin] = self.scales.at(term)
            term.replace_other_uses_with(relin)
        else:
            for use in term.uses:
                self.pending[use] = True
