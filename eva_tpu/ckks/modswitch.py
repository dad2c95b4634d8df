"""ModSwitch insertion — the pipeline's only backward pass.

Computes a reverse level per term (outputs at 0; Rescale increments); when
a term's uses sit at multiple levels, inserts chains of ModSwitch nodes so
every use receives its operand at the matching level. On finalize, stamps
EncodeAtLevelAttribute = maxLevel - level onto all sources and Encode
nodes. Reference: eva/ckks/mod_switcher.h:11-96."""

from __future__ import annotations

from typing import List

from ..ir import ENCODE_AT_LEVEL, Op, Program, Term, TermMap, Type


class ModSwitcher:
    def __init__(self, program: Program, types: TermMap, scales: TermMap):
        self.program = program
        self.types = types
        self.scales = scales
        self.level = TermMap(0)  # reverse level: leaves(outputs) 0, roots max
        self.encode_nodes: List[Term] = []

    def __call__(self, term: Term) -> None:
        if not term.uses:
            return
        if self.types[term] == Type.Raw:
            return
        if term.op == Op.Encode:
            self.encode_nodes.append(term)

        use_levels = {}
        for use in term.uses:
            use_levels.setdefault(self.level[use], []).append(use)

        if len(use_levels) > 1:
            levels_desc = sorted(use_levels, reverse=True)
            term_level = levels_desc[0]
            temp = term
            temp_level = term_level
            for expected in levels_desc[1:]:
                while temp_level > expected:
                    node = self.program.make_term(Op.ModSwitch, [temp])
                    self.scales[node] = self.scales.at(temp)
                    self.level[node] = temp_level
                    temp = node
                    temp_level -= 1
                for use in use_levels[expected]:
                    use.replace_operand(term, temp)
        else:
            term_level = next(iter(use_levels))

        if term.op == Op.Rescale:
            term_level += 1
        self.level[term] = term_level

    def finalize(self) -> None:
        sources = self.program.get_sources()
        max_level = 0
        for source in sources:
            if self.level[source] > max_level:
                max_level = self.level[source]
        for source in sources:
            source.set_attr(ENCODE_AT_LEVEL, max_level - self.level[source])
        for encode in self.encode_nodes:
            encode.set_attr(ENCODE_AT_LEVEL, max_level - self.level[encode])
