"""Core IR for the EVA-TPU homomorphic-encryption compiler.

A `Program` is a DAG of `Term`s, mirroring the semantics of the reference
EVA IR (reference: eva/ir/term.h, eva/ir/program.h, eva/ir/ops.h,
eva/ir/types.h, eva/ir/attributes.h, eva/ir/term_map.h,
eva/ir/constant_value.h) but designed Python-first: compile time is dwarfed
by kernel time on TPU, so graph surgery lives in Python while all hot
ciphertext math runs in JAX/Pallas (see eva_tpu.crypto / eva_tpu.backend).

Key semantic invariants kept from the reference:
  * operand lists are ordered and may contain duplicates; the use list
    mirrors operand edges one entry per edge (reference: eva/ir/term.cpp).
  * a term that loses its last use and is not a registered input/output is
    removed from the graph recursively (the reference gets this behavior
    from shared_ptr refcounting; we do it explicitly via an orphan queue
    drained by the traversal engine / compiler).
  * sources (no operands) and sinks (no uses) sets are maintained on every
    edge mutation (reference: eva/ir/term.cpp:13-136).
"""

from __future__ import annotations

import enum
from typing import Dict, Iterable, List, Optional, Sequence


class Op(enum.IntEnum):
    """Operation codes. Values are stable for serialization.

    Reference: eva/ir/ops.h:11-31."""

    Undef = 0
    Input = 1
    Output = 2
    Constant = 3
    Negate = 10
    Add = 11
    Sub = 12
    Mul = 13
    RotateLeftConst = 14
    RotateRightConst = 15
    Relinearize = 20
    ModSwitch = 21
    Rescale = 22
    Encode = 23


VALID_OPS = frozenset(int(op) for op in Op)


class Type(enum.IntEnum):
    """Value types. Reference: eva/ir/types.h:11-21."""

    Undef = 0
    Cipher = 1  # encrypted
    Raw = 2     # plain doubles, never encoded
    Plain = 3   # CKKS-encoded plaintext


# Attribute keys; the numeric codes are stable for serialization.
# Reference: eva/ir/attributes.h:12-28 (enum AttributeIndex with 0 reserved).
RESCALE_DIVISOR = 1    # uint32
ROTATION = 2           # int32
CONSTANT_VALUE = 3     # ConstantValue
TYPE_ATTR = 4          # Type
RANGE = 5              # uint32
ENCODE_AT_SCALE = 6    # uint32
ENCODE_AT_LEVEL = 7    # uint32

ATTRIBUTE_NAMES = {
    RESCALE_DIVISOR: "RescaleDivisorAttribute",
    ROTATION: "RotationAttribute",
    CONSTANT_VALUE: "ConstantValueAttribute",
    TYPE_ATTR: "TypeAttribute",
    RANGE: "RangeAttribute",
    ENCODE_AT_SCALE: "EncodeAtScaleAttribute",
    ENCODE_AT_LEVEL: "EncodeAtLevelAttribute",
}


class ConstantValue:
    """Constant vector with broadcast semantics.

    Reference: eva/ir/constant_value.h:16-141."""

    __slots__ = ("size",)

    def __init__(self, size: int):
        self.size = size

    def _validate_slots(self, slots: int) -> None:
        if slots < self.size:
            raise RuntimeError("Slots must be at least size of constant")
        if slots % self.size != 0:
            raise RuntimeError("Size must exactly divide slots")

    def expand(self, slots: int) -> List[float]:
        raise NotImplementedError

    def is_zero(self) -> bool:
        raise NotImplementedError


class DenseConstantValue(ConstantValue):
    """Dense values of a size dividing vec_size, replicated to fill slots."""

    __slots__ = ("values",)

    def __init__(self, size: int, values: Sequence[float]):
        super().__init__(size)
        if len(values) == 0 or size % len(values) != 0:
            raise RuntimeError("DenseConstantValue values size must exactly divide size")
        self.values = [float(v) for v in values]

    def expand(self, slots: int) -> List[float]:
        self._validate_slots(slots)
        reps = slots // len(self.values)
        return self.values * reps

    def is_zero(self) -> bool:
        return all(v == 0 for v in self.values)


class SparseConstantValue(ConstantValue):
    """Sparse (index, value) pairs, tiled to fill slots."""

    __slots__ = ("values",)

    def __init__(self, size: int, values: Sequence[tuple]):
        super().__init__(size)
        self.values = [(int(i), float(v)) for (i, v) in values]

    def expand(self, slots: int) -> List[float]:
        self._validate_slots(slots)
        out = [0.0] * slots
        period = self.size
        for idx, val in self.values:
            for base in range(0, slots, period):
                out[base + idx] = val
        return out

    def is_zero(self) -> bool:
        return all(v == 0 for (_, v) in self.values)


class Term:
    """A node in the program DAG.

    Reference: eva/ir/term.h:21-60. `operands` are ordered def references
    (use -> def); `uses` mirror them (def -> use), one entry per edge."""

    __slots__ = ("op", "program", "index", "operands", "uses", "attributes")

    def __init__(self, op: Op, program: "Program"):
        self.op = op
        self.program = program
        self.index = program._allocate_index()
        self.operands: List[Term] = []
        self.uses: List[Term] = []
        self.attributes: Dict[int, object] = {}
        program._term_created(self)

    # -- attributes ---------------------------------------------------------

    def set_attr(self, key: int, value) -> None:
        self.attributes[key] = value

    def get_attr(self, key: int):
        try:
            return self.attributes[key]
        except KeyError:
            raise KeyError(
                f"Term t{self.index} ({self.op.name}) is missing attribute "
                f"{ATTRIBUTE_NAMES.get(key, key)}")

    def has_attr(self, key: int) -> bool:
        return key in self.attributes

    # -- edge mutation (maintains program source/sink sets) ----------------

    def num_operands(self) -> int:
        return len(self.operands)

    def num_uses(self) -> int:
        return len(self.uses)

    def operand_at(self, i: int) -> "Term":
        return self.operands[i]

    def add_operand(self, operand: "Term") -> None:
        if not self.operands:
            self.program._sources.discard(self)
        self.operands.append(operand)
        if not operand.uses:
            self.program._sinks.discard(operand)
        operand.uses.append(self)

    def erase_operand(self, operand: "Term") -> bool:
        """Remove the first matching operand edge. Returns True if found."""
        for i, o in enumerate(self.operands):
            if o is operand:
                del self.operands[i]
                operand._remove_use(self)
                if not self.operands:
                    self.program._sources.add(self)
                return True
        return False

    def replace_operand(self, old: "Term", new: "Term") -> bool:
        """Replace all operand edges pointing at `old` with `new`."""
        found = False
        for i, o in enumerate(self.operands):
            if o is old:
                self.operands[i] = new
                old._remove_use(self)
                if not new.uses:
                    self.program._sinks.discard(new)
                new.uses.append(self)
                found = True
        return found

    def set_operands(self, operands: Iterable["Term"]) -> None:
        for o in list(self.operands):
            self.erase_operand(o)
        for o in operands:
            self.add_operand(o)

    def _remove_use(self, user: "Term") -> None:
        for i, u in enumerate(self.uses):
            if u is user:
                del self.uses[i]
                break
        if not self.uses:
            self.program._sinks.add(self)
            self.program._orphans.add(self)

    # -- use rewiring -------------------------------------------------------

    def replace_uses_with_if(self, replacement: "Term", predicate) -> None:
        # Snapshot because replace_operand mutates self.uses.
        for use in list(self.uses):
            if predicate(use):
                use.replace_operand(self, replacement)

    def replace_all_uses_with(self, replacement: "Term") -> None:
        self.replace_uses_with_if(replacement, lambda u: True)

    def replace_other_uses_with(self, replacement: "Term") -> None:
        """Replace every use except `replacement` itself."""
        self.replace_uses_with_if(replacement, lambda u: u is not replacement)

    def is_internal(self) -> bool:
        return bool(self.uses) and bool(self.operands)

    def __repr__(self) -> str:
        return f"t{self.index}:{self.op.name}"


class OrderedTermSet:
    """Set of terms with deterministic (insertion-ordered) iteration.

    Built-in sets hash terms by id(), so iteration order varies between
    otherwise-identical processes; traversal order feeds pass decisions
    (e.g. where ModSwitcher places switches), which made compilation
    output nondeterministic. A dict keyed by term restores determinism."""

    __slots__ = ("_data",)

    def __init__(self):
        self._data: Dict[Term, None] = {}

    def add(self, term: "Term") -> None:
        self._data[term] = None

    def discard(self, term: "Term") -> None:
        self._data.pop(term, None)

    def pop(self) -> "Term":
        return self._data.popitem()[0]

    def __iter__(self):
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def __contains__(self, term: "Term") -> bool:
        return term in self._data


class Program:
    """Graph container. Reference: eva/ir/program.h:24-152."""

    def __init__(self, name: str, vec_size: int):
        if vec_size == 0:
            raise RuntimeError("Vector size must be non-zero")
        if vec_size & (vec_size - 1) != 0:
            raise RuntimeError("Vector size must be a power-of-two")
        self._name = name
        self._vec_size = int(vec_size)
        self._next_index = 0
        self._sources = OrderedTermSet()
        self._sinks = OrderedTermSet()
        self._orphans = OrderedTermSet()
        self._inputs: Dict[str, Term] = {}
        self._outputs: Dict[str, Term] = {}
        self._creation_log: List[Term] = []

    # -- bookkeeping --------------------------------------------------------

    def _allocate_index(self) -> int:
        idx = self._next_index
        self._next_index += 1
        return idx

    def _term_created(self, term: Term) -> None:
        self._sources.add(term)
        self._sinks.add(term)
        self._creation_log.append(term)

    def flush_orphans(self, keep: Optional[Term] = None) -> None:
        """Remove terms with no uses that are not outputs/inputs.

        Matches the reference's shared_ptr refcount deletion semantics
        (a term dies when its last use disappears unless the program's
        input/output maps hold it; deletion cascades to operands)."""
        deferred = OrderedTermSet()
        while self._orphans:
            term = self._orphans.pop()
            if term.uses:
                continue
            if term.op == Op.Output or term.op == Op.Input:
                continue
            if term is keep:
                # The caller still holds this term; retry on the next flush
                # (mirrors the traversal loop's live shared_ptr upstream).
                deferred.add(term)
                continue
            # Detach: this may push operands onto the orphan queue.
            for o in list(term.operands):
                while term.erase_operand(o):
                    pass
            self._sources.discard(term)
            self._sinks.discard(term)
        self._orphans = deferred

    # -- factories ----------------------------------------------------------

    def make_term(self, op: Op, operands: Sequence[Term] = ()) -> Term:
        term = Term(Op(op), self)
        for o in operands:
            term.add_operand(o)
        return term

    def make_constant(self, value: ConstantValue) -> Term:
        term = self.make_term(Op.Constant)
        term.set_attr(CONSTANT_VALUE, value)
        return term

    def make_dense_constant(self, values: Sequence[float]) -> Term:
        return self.make_constant(DenseConstantValue(self._vec_size, values))

    def make_uniform_constant(self, value: float) -> Term:
        return self.make_dense_constant([value])

    def make_input(self, name: str, type: Type = Type.Cipher) -> Term:
        term = self.make_term(Op.Input)
        term.set_attr(TYPE_ATTR, Type(type))
        self._inputs[name] = term
        return term

    def make_output(self, name: str, term: Term) -> Term:
        output = self.make_term(Op.Output, [term])
        self._outputs[name] = output
        return output

    def make_left_rotation(self, term: Term, slots: int) -> Term:
        rot = self.make_term(Op.RotateLeftConst, [term])
        rot.set_attr(ROTATION, int(slots))
        return rot

    def make_right_rotation(self, term: Term, slots: int) -> Term:
        rot = self.make_term(Op.RotateRightConst, [term])
        rot.set_attr(ROTATION, int(slots))
        return rot

    def make_rescale(self, term: Term, rescale_by: int) -> Term:
        rescale = self.make_term(Op.Rescale, [term])
        rescale.set_attr(RESCALE_DIVISOR, int(rescale_by))
        return rescale

    # -- accessors -----------------------------------------------------------

    def get_input(self, name: str) -> Term:
        if name not in self._inputs:
            raise KeyError(f"No input named {name}")
        return self._inputs[name]

    @property
    def inputs(self) -> Dict[str, Term]:
        return self._inputs

    @property
    def outputs(self) -> Dict[str, Term]:
        return self._outputs

    @property
    def name(self) -> str:
        return self._name

    @name.setter
    def name(self, value: str) -> None:
        self._name = value

    @property
    def vec_size(self) -> int:
        return self._vec_size

    def get_sources(self) -> List[Term]:
        return list(self._sources)

    def get_sinks(self) -> List[Term]:
        return list(self._sinks)

    # -- program-level attribute setters (reference: wrapper.cpp:48-76) -----

    def set_output_ranges(self, range_bits: int) -> None:
        for term in self._outputs.values():
            term.set_attr(RANGE, int(range_bits))

    def set_input_scales(self, scale_bits: int) -> None:
        for source in self._sources:
            source.set_attr(ENCODE_AT_SCALE, int(scale_bits))

    # -- structural utilities -----------------------------------------------

    def topological_order(self) -> List[Term]:
        """All live terms, operands before uses (Kahn from sources).

        Duplicate operand edges are mirrored as duplicate use entries, so
        per-edge decrements line up with len(operands)."""
        order: List[Term] = []
        remaining: Dict[int, int] = {}
        ready = [t for t in self._sources]
        while ready:
            term = ready.pop()
            order.append(term)
            for use in term.uses:
                key = use.index
                if key not in remaining:
                    remaining[key] = len(use.operands)
                remaining[key] -= 1
                if remaining[key] == 0:
                    ready.append(use)
        return order

    def deep_copy(self) -> "Program":
        """Clone the program graph. Reference: eva/ir/program.cpp:30-49.

        Only terms reachable from outputs (plus registered inputs) are
        cloned: dangling expressions the user built but never consumed
        are dropped, matching the reference's shared_ptr semantics once
        user-held Expr wrappers go out of scope."""
        live = set()
        stack = [t for t in self._outputs.values()]
        stack.extend(self._inputs.values())
        while stack:
            t = stack.pop()
            if t.index in live:
                continue
            live.add(t.index)
            stack.extend(t.operands)
        clone = Program(self._name, self._vec_size)
        mapping: Dict[int, Term] = {}
        for term in self.topological_order():
            if term.index not in live:
                continue
            new = clone.make_term(term.op, [mapping[o.index] for o in term.operands])
            new.attributes = dict(term.attributes)
            mapping[term.index] = new
        for name, term in self._inputs.items():
            clone._inputs[name] = mapping[term.index]
        for name, term in self._outputs.items():
            clone._outputs[name] = mapping[term.index]
        return clone

    def dump(self, scales=None, types=None, levels=None) -> str:
        """Human-readable text dump, one term per line, with optional
        side-table annotations (reference: eva/ir/program.cpp:96-160)."""
        lines = [f"Program {self._name} (vec_size={self._vec_size})"]
        for term in self.topological_order():
            parts = [f"t{term.index} = {term.op.name}("
                     + ",".join(f"t{o.index}" for o in term.operands) + ")"]
            for key, value in sorted(term.attributes.items()):
                name = ATTRIBUTE_NAMES.get(key, str(key))
                if key == CONSTANT_VALUE:
                    value = type(value).__name__
                parts.append(f"{name}={value}")
            for label, table in (("scale", scales), ("type", types),
                                 ("level", levels)):
                if table is not None and term in table:
                    parts.append(f"{label}={table[term]}")
            lines.append("  " + " ".join(str(p) for p in parts))
        return "\n".join(lines)

    def to_DOT(self) -> str:
        lines = ["digraph \"%s\" {" % self._name]
        for term in self.topological_order():
            label = term.op.name
            if term.op == Op.RotateLeftConst or term.op == Op.RotateRightConst:
                label += f"({term.get_attr(ROTATION)})"
            if term.op == Op.Rescale:
                label += f"({term.get_attr(RESCALE_DIVISOR)})"
            lines.append(f"  t{term.index} [label=\"{label}\"];")
            for o in term.operands:
                lines.append(f"  t{o.index} -> t{term.index};")
        lines.append("}")
        return "\n".join(lines)


class TermMap:
    """Side-table keyed by term index with a default value.

    Replaces the reference's TermMap<T> (eva/ir/term_map.h:17-123);
    a dict is the idiomatic Python analog of the auto-resizing deque."""

    __slots__ = ("_data", "_default")

    def __init__(self, default=None):
        self._data: Dict[int, object] = {}
        self._default = default

    def __getitem__(self, term: Term):
        return self._data.get(term.index, self._default)

    def __setitem__(self, term: Term, value) -> None:
        self._data[term.index] = value

    def at(self, term: Term):
        """Like C++ .at(): raises if unset."""
        return self._data[term.index]

    def __contains__(self, term: Term) -> bool:
        return term.index in self._data

    def clear(self) -> None:
        self._data.clear()
