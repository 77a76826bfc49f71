"""JEXL AST node types.

This is the engine's whole-query IR — the analogue of DataWave's
``ASTJexlScript`` (org.apache.commons.jexl3 parse tree) that its ~35
rewrite visitors operate on (reference: warehouse/query-core/.../query/
planner/DefaultQueryPlanner.java:701).  We keep it deliberately small:
boolean structure + comparisons + function calls.  Rewrite passes in
``datawave_spark.compiler.rewrite`` are pure functions AST→AST.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


class JexlNode:
    """Base class for all AST nodes."""

    def children(self) -> tuple["JexlNode", ...]:
        return ()


@dataclass(frozen=True)
class Literal(JexlNode):
    """A literal value: string, int, float, bool or None."""
    value: Any

    def __str__(self) -> str:
        if self.value is None:
            return "null"
        if isinstance(self.value, bool):
            return "true" if self.value else "false"
        if isinstance(self.value, str):
            return "'" + self.value.replace("'", "\\'") + "'"
        return repr(self.value)


@dataclass(frozen=True)
class Identifier(JexlNode):
    """A field reference.  DataWave canonicalises identifiers to upper
    case (DefaultQueryPlanner CaseSensitivityVisitor); we preserve the
    raw name and resolve case-insensitively at compile time."""
    name: str

    def __str__(self) -> str:
        return self.name


# Comparison ops and their negations (for RewriteNegations parity).
NEGATED_OP = {"==": "!=", "!=": "==", "<": ">=", ">": "<=",
              "<=": ">", ">=": "<", "=~": "!~", "!~": "=~"}


@dataclass(frozen=True)
class CmpNode(JexlNode):
    """``FIELD op literal``.  With multi-value set semantics: true iff
    ANY value of FIELD satisfies the comparison (DatawaveArithmetic
    fieldsMatch, reference jexl/DatawaveArithmetic.java:50-120).
    ``!=`` / ``!~`` mean NO value matches (DataWave rewrites ``A != b``
    to ``!(A == b)``, RewriteNegationsVisitor)."""
    op: str          # == != < > <= >= =~ !~
    field: Identifier
    value: Literal

    def children(self):
        return (self.field, self.value)

    def __str__(self) -> str:
        return f"{self.field} {self.op} {self.value}"


@dataclass(frozen=True)
class RangeNode(JexlNode):
    """A BOUNDED range — the reference's ``((_Bounded_ = true) &&
    (F >= lo && F <= hi))`` QueryPropertyMarker form
    (QueryPropertyMarker.MarkerType.BOUNDED_RANGE;
    LuceneToJexlQueryParser emits it for every LUCENE range,
    TestLuceneToJexlQueryParser.java:305, and the planner marks bare
    same-field conjunctions).  Semantics differ from the raw AND on a
    MULTI-VALUED field: a bounded range is true iff SOME ONE value
    satisfies BOTH bounds, where the unmarked conjunction's any-value
    semantics lets different values satisfy each bound."""
    field: Identifier
    lo_op: str       # > or >=
    lo: Literal
    hi_op: str       # < or <=
    hi: Literal

    def children(self):
        return (self.field, self.lo, self.hi)

    def __str__(self) -> str:
        return (f"((_Bounded_ = true) && ({self.field} {self.lo_op} "
                f"{self.lo} && {self.field} {self.hi_op} {self.hi}))")


@dataclass(frozen=True)
class MarkerNode(JexlNode):
    """A QueryPropertyMarker assignment (``_Bounded_ = true`` /
    ``_Delayed_`` / ``_Eval_`` / ...) kept as a node so the parser's
    marker-resolution step can see WHICH marker wrapped a subtree
    (``_Bounded_`` fuses its sibling conjunction into a RangeNode).
    Unresolved markers evaluate true, like the assignment in JEXL."""
    name: str

    def __str__(self) -> str:
        return f"({self.name} = true)"


@dataclass(frozen=True)
class FieldCmpNode(JexlNode):
    """Field-to-field comparison ``F1 op F2`` — evaluation-only in the
    reference (FieldToFieldComparisonVisitor); any-pair semantics over
    multi-valued fields."""
    op: str
    left: Identifier
    right: Identifier

    def children(self):
        return (self.left, self.right)

    def __str__(self) -> str:
        return f"{self.left} {self.op} {self.right}"


@dataclass(frozen=True)
class ArithNode(JexlNode):
    """Arithmetic expression ``left op right`` (op: + - * / %) over
    identifiers, numeric literals and nested arithmetic — the
    commons-jexl3 arithmetic surface (JexlArithmetic) DataWave
    evaluates inside comparisons.  Literal-only subtrees are
    constant-folded at parse time; field-bearing trees compile to
    native Column arithmetic (floating semantics — the reference's
    NumberType normalizes numerics to decimal anyway)."""
    op: str          # + - * / %
    left: JexlNode   # Identifier | Literal | ArithNode
    right: JexlNode

    def children(self):
        return (self.left, self.right)

    def __str__(self) -> str:
        return f"({self.left} {self.op} {self.right})"


@dataclass(frozen=True)
class ArithCmpNode(JexlNode):
    """Comparison where at least one side is an arithmetic expression:
    ``(VALUE * 2 + USER_ID) > 950``.  Scalar-column semantics —
    arithmetic over multi-valued (array) fields is rejected at compile
    time (the reference's any-value arithmetic over multi-value
    operands is out of surface)."""
    op: str          # == != < > <= >= (no regex ops)
    left: JexlNode
    right: JexlNode

    def children(self):
        return (self.left, self.right)

    def __str__(self) -> str:
        return f"{self.left} {self.op} {self.right}"


@dataclass(frozen=True)
class AndNode(JexlNode):
    terms: tuple[JexlNode, ...]

    def children(self):
        return self.terms

    def __str__(self) -> str:
        return "(" + " && ".join(str(t) for t in self.terms) + ")"


@dataclass(frozen=True)
class OrNode(JexlNode):
    terms: tuple[JexlNode, ...]

    def children(self):
        return self.terms

    def __str__(self) -> str:
        return "(" + " || ".join(str(t) for t in self.terms) + ")"


@dataclass(frozen=True)
class NotNode(JexlNode):
    term: JexlNode

    def children(self):
        return (self.term,)

    def __str__(self) -> str:
        return f"!({self.term})"


@dataclass(frozen=True)
class FuncNode(JexlNode):
    """Namespaced function call ``ns:name(arg, ...)``.  Args are
    Identifiers or Literals (nested expressions are not used by the
    reference function surface)."""
    namespace: str
    name: str
    args: tuple[JexlNode, ...] = field(default_factory=tuple)

    def children(self):
        return self.args

    def __str__(self) -> str:
        return f"{self.namespace}:{self.name}({', '.join(str(a) for a in self.args)})"


@dataclass(frozen=True)
class MethodNode(JexlNode):
    """FunctionalSet method call ``TARGET.name(args)`` —
    collections/FunctionalSet.java (size:61, isEmpty:66, max:232,
    min:246, compareWith:362, lessThan:382, greaterThan:386).  The
    target is a field Identifier (its value set), a value-set-returning
    FuncNode (filter:getAllMatches), or another MethodNode
    (``AG.greaterThan(39).size()``)."""
    target: JexlNode
    name: str
    args: tuple[JexlNode, ...] = field(default_factory=tuple)

    def children(self):
        return (self.target, *self.args)

    def __str__(self) -> str:
        return f"{self.target}.{self.name}({', '.join(str(a) for a in self.args)})"
