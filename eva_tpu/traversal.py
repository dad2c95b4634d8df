"""Topological forward/backward traversal safe under graph mutation.

Mirrors the reference worklist engine (eva/common/program_traversal.h:23-100):
each term is visited exactly once; after each rewrite the engine re-checks
for new sources/sinks and re-checks remembered uses/operands, so passes may
create and rewire nodes mid-traversal.

Deviation from the reference: after each rewrite we drain the program's
orphan queue (the reference relies on C++ shared_ptr refcounting to delete
use-less terms; see eva_tpu.ir.Program.flush_orphans)."""

from __future__ import annotations

from .ir import Program, Term, TermMap


class ProgramTraversal:
    def __init__(self, program: Program):
        self.program = program

    def _traverse(self, rewrite, forward: bool) -> None:
        program = self.program
        ready = TermMap(False)
        processed = TermMap(False)

        def predecessors(term: Term):
            return term.operands if forward else term.uses

        def successors(term: Term):
            return term.uses if forward else term.operands

        def leaves():
            return program.get_sources() if forward else program.get_sinks()

        def preds_done(term: Term) -> bool:
            return all(processed[p] for p in predecessors(term))

        ready_nodes = list(leaves())
        for t in ready_nodes:
            ready[t] = True

        while ready_nodes:
            term = ready_nodes.pop()
            # Remember successors in case the rewrite detaches this term.
            check_list = list(successors(term))

            rewrite(term)
            processed[term] = True
            program.flush_orphans(keep=term)

            # New sources/sinks created by the rewrite become ready.
            for leaf in leaves():
                if not ready[leaf]:
                    ready_nodes.append(leaf)
                    ready[leaf] = True

            check_list.extend(successors(term))

            for succ in check_list:
                if not ready[succ] and preds_done(succ):
                    ready_nodes.append(succ)
                    ready[succ] = True

        program.flush_orphans()
        finalize = getattr(rewrite, "finalize", None)
        if finalize is not None:
            finalize()

    def forward_pass(self, rewrite) -> None:
        self._traverse(rewrite, forward=True)

    def backward_pass(self, rewrite) -> None:
        self._traverse(rewrite, forward=False)
