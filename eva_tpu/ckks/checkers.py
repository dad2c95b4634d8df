"""Validation passes run after the transform pipeline.

References: eva/ckks/levels_checker.h, eva/ckks/parameter_checker.h,
eva/ckks/scales_checker.h."""

from __future__ import annotations

from ..ir import (ENCODE_AT_LEVEL, ENCODE_AT_SCALE, RESCALE_DIVISOR, Op,
                  Program, Term, TermMap, Type)


class InconsistentParameters(RuntimeError):
    pass


class LevelsChecker:
    """All Cipher operands of a term must sit at the same level; Rescale and
    ModSwitch increment level."""

    def __init__(self, program: Program, types: TermMap):
        self.program = program
        self.types = types
        self.levels = TermMap(0)

    def __call__(self, term: Term) -> None:
        if not term.operands:
            self.levels[term] = term.get_attr(ENCODE_AT_LEVEL)
            return
        operand_level = None
        for operand in term.operands:
            assert self.types[operand] != Type.Undef, (
                f"t{operand.index} ({operand.op.name}) reached validation "
                f"untyped — a transform pass created it after the last "
                f"TypeDeducer run without stamping its type")
            if self.types[operand] == Type.Cipher:
                if operand_level is None:
                    operand_level = self.levels[operand]
                else:
                    assert operand_level == self.levels[operand], (
                        f"Level mismatch at t{term.index} ({term.op.name}): "
                        f"{operand_level} vs {self.levels[operand]}")
        level = operand_level if operand_level is not None else 0
        if term.op in (Op.Rescale, Op.ModSwitch):
            level += 1
        self.levels[term] = level


class ParameterChecker:
    """Recompute per-term prime requirements; ModSwitch contributes a 0
    placeholder that unifies with concrete primes; conflicting requirements
    raise InconsistentParameters."""

    def __init__(self, program: Program, types: TermMap):
        self.program = program
        self.types = types
        self.parms = TermMap()

    def __call__(self, term: Term) -> None:
        if self.types[term] == Type.Raw or term.op == Op.Encode:
            return
        operands = term.operands
        if operands:
            parms = []
            have = False
            for operand in operands:
                operand_parms = self.parms[operand]
                if not operand_parms:
                    continue
                if have:
                    if len(operand_parms) != len(parms):
                        raise InconsistentParameters(
                            "Two operands require different number of primes")
                    for i in range(len(parms)):
                        if parms[i] == 0:
                            parms[i] = operand_parms[i]
                        elif operand_parms[i] != 0 and parms[i] != operand_parms[i]:
                            raise InconsistentParameters(
                                "Primes required by two operands do not match")
                else:
                    parms = list(operand_parms)
                    have = True
            if term.op == Op.ModSwitch:
                parms = parms + [0]
            elif term.op == Op.Rescale:
                divisor = term.get_attr(RESCALE_DIVISOR)
                assert divisor != 0
                parms = parms + [divisor]
            self.parms[term] = parms
        else:
            level = term.get_attr(ENCODE_AT_LEVEL) if term.has_attr(ENCODE_AT_LEVEL) else 0
            self.parms[term] = [0] * level


class ScalesChecker:
    """Independently recompute scales and reject 0-scale terms or
    mismatched-scale additions."""

    def __init__(self, program: Program, scales_unused: TermMap, types: TermMap):
        self.program = program
        self.scales = TermMap()
        self.types = types

    def __call__(self, term: Term) -> None:
        if self.types[term] == Type.Raw:
            return
        operands = term.operands
        if term.op in (Op.Input, Op.Encode):
            scale = term.get_attr(ENCODE_AT_SCALE)
            if scale == 0:
                if term.op == Op.Input:
                    raise RuntimeError("Program has an input with 0 scale")
                raise RuntimeError("Compiled program results in a 0 scale term")
            self.scales[term] = scale
        elif term.op == Op.Mul:
            assert len(operands) == 2
            scale = sum(self.scales.at(o) for o in operands)
            if scale == 0:
                raise RuntimeError("Compiled program results in a 0 scale term")
            self.scales[term] = scale
        elif term.op == Op.Rescale:
            assert len(operands) == 1
            scale = self.scales.at(operands[0]) - term.get_attr(RESCALE_DIVISOR)
            if scale == 0:
                raise RuntimeError("Compiled program results in a 0 scale term")
            self.scales[term] = scale
        elif term.op in (Op.Add, Op.Sub):
            scale = 0
            for operand in operands:
                if scale == 0:
                    scale = self.scales.at(operand)
                elif scale != self.scales.at(operand):
                    raise RuntimeError(
                        "Addition or subtraction in program has operands of "
                        "non-equal scale")
            if scale == 0:
                raise RuntimeError("Compiled program results in a 0 scale term")
            self.scales[term] = scale
        else:
            scale = self.scales.at(operands[0])
            if scale == 0:
                raise RuntimeError("Compiled program results in a 0 scale term")
            self.scales[term] = scale
