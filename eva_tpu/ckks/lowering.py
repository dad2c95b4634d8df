"""Backend legalization: `plain - cipher` becomes `plain + (-cipher)`.

The runtime (like SEAL) has no plain-lhs subtraction kernel; keeping the
kernel set lean keeps the JAX backend's dispatch table small.
Reference: eva/ckks/seal_lowering.h:11-32."""

from __future__ import annotations

from ..ir import Op, Program, Term, TermMap, Type


class BackendLowering:
    def __init__(self, program: Program, types: TermMap):
        self.program = program
        self.types = types

    def __call__(self, term: Term) -> None:
        if (term.op == Op.Sub
                and self.types[term.operand_at(0)] != Type.Cipher
                and self.types[term.operand_at(1)] == Type.Cipher):
            negation = self.program.make_term(Op.Negate, [term.operand_at(1)])
            addition = self.program.make_term(Op.Add, [term.operand_at(0), negation])
            # This is the last transform pass — no TypeDeducer runs after it,
            # so the created terms must be typed here or the validation
            # checkers would see Undef and silently treat them as non-cipher.
            self.types[negation] = Type.Cipher
            self.types[addition] = Type.Cipher
            term.replace_all_uses_with(addition)
