"""Plaintext reference executor — the semantics oracle.

Evaluates a program on vectors of doubles; HE-specific ops are identity.
Reference: eva/common/reference_executor.h/.cpp, eva/eva.cpp:11-21."""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from .ir import CONSTANT_VALUE, ROTATION, Op, Program, Term, TermMap
from .traversal import ProgramTraversal


class ReferenceExecutor:
    def __init__(self, program: Program):
        self.program = program
        self.terms = TermMap()

    def set_inputs(self, inputs: Dict[str, Sequence[float]]) -> None:
        for name, values in inputs.items():
            if len(values) != self.program.vec_size:
                raise RuntimeError(
                    f"Input {name} has size {len(values)}; "
                    f"program expects {self.program.vec_size}")
            self.terms[self.program.get_input(name)] = np.asarray(values, dtype=np.float64)

    def __call__(self, term: Term) -> None:
        op = term.op
        args = term.operands
        t = self.terms
        if op == Op.Input:
            return
        if op == Op.Constant:
            vals = term.get_attr(CONSTANT_VALUE).expand(self.program.vec_size)
            t[term] = np.asarray(vals, dtype=np.float64)
        elif op == Op.Add:
            t[term] = t.at(args[0]) + t.at(args[1])
        elif op == Op.Sub:
            t[term] = t.at(args[0]) - t.at(args[1])
        elif op == Op.Mul:
            t[term] = t.at(args[0]) * t.at(args[1])
        elif op == Op.RotateLeftConst:
            t[term] = np.roll(t.at(args[0]), -term.get_attr(ROTATION))
        elif op == Op.RotateRightConst:
            t[term] = np.roll(t.at(args[0]), term.get_attr(ROTATION))
        elif op == Op.Negate:
            t[term] = -t.at(args[0])
        elif op in (Op.Encode, Op.Output, Op.Relinearize, Op.ModSwitch, Op.Rescale):
            t[term] = t.at(args[0])
        else:
            raise RuntimeError(f"Unhandled op {op.name}")

    def get_outputs(self) -> Dict[str, List[float]]:
        return {name: list(map(float, self.terms.at(term)))
                for name, term in self.program.outputs.items()}


def evaluate(program: Program, inputs: Dict[str, Sequence[float]]) -> Dict[str, List[float]]:
    """Evaluate the program without homomorphic encryption."""
    executor = ReferenceExecutor(program)
    executor.set_inputs(inputs)
    ProgramTraversal(program).forward_pass(executor)
    return executor.get_outputs()
