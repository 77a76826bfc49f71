"""Recursive-descent parser for the DataWave JEXL subset.

Grammar (precedence low→high), matching commons-jexl3 as used by
DataWave queries (reference grammar: org.apache.commons.jexl3 Parser;
DataWave's usage surface is visible throughout
warehouse/query-core/src/test/java/datawave/query/):

    expr     := or
    or       := and ( '||' and )*
    and      := not ( '&&' not )*
    not      := '!' not | primary
    primary  := '(' expr ')' | funcall | comparison
    funcall  := IDENT ':' IDENT '(' args? ')'
    comparison := additive OP additive  (OP: == != < > <= >= =~ !~)
    additive := mult ( ('+'|'-') mult )*
    mult     := unary ( ('*'|'/'|'%') unary )*
    unary    := '-' unary | operand
    operand  := IDENT | literal | '(' additive ')'
    literal  := STRING | NUMBER | 'null' | 'true' | 'false'

Literal-on-the-left comparisons (``'x' == F``) are inverted at parse
time (InvertNodeVisitor parity, DefaultQueryPlanner.java:1264).
Arithmetic (commons-jexl3 JexlArithmetic surface) is constant-folded
when literal-only; ``(`` ambiguity between boolean grouping and
parenthesized arithmetic resolves by backtracking.
"""

from __future__ import annotations

import re
from typing import Any

from datawave_spark.jexl.ast import (
    AndNode, ArithCmpNode, ArithNode, CmpNode, FieldCmpNode, FuncNode,
    Identifier, JexlNode, Literal, MarkerNode, MethodNode, NotNode, OrNode,
    RangeNode,
)


class JexlParseError(ValueError):
    pass


_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+)
  | (?P<number>\d+\.\d+|\d+[lL]?)
  | (?P<op>==|!=|<=|>=|=~|!~|&&|\|\||[<>!()\,+\-*/%=.])
  | (?P<string>'(?:\\.|[^'\\])*'|"(?:\\.|[^"\\])*")
  | (?P<ident>[A-Za-z_$][A-Za-z0-9_.$]*)
  | (?P<colon>:)
""", re.VERBOSE)

_KEYWORDS = {"null": None, "true": True, "false": False,
              "NULL": None, "TRUE": True, "FALSE": False}

_CMP_OPS = {"==", "!=", "<", ">", "<=", ">=", "=~", "!~"}


def _tokenize(text: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise JexlParseError(f"unexpected character {text[pos]!r} at {pos}: {text[max(0,pos-20):pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        tokens.append((kind, m.group()))
    tokens.append(("eof", ""))
    return tokens


class _EscStr(str):
    """An unescaped string literal that REMEMBERS its raw quoted body.
    Equality/hash are plain-str (the unescaped value), so the AST
    compares as before; ``raw`` carries the source spelling for the
    one consumer with different semantics — regex comparisons, whose
    pattern is the RAW body (RegexQueryTest: the SAME literal
    spelling ``'\\\\Edge-City-1'`` is the unescaped VALUE for ``==``
    and the regex-escaped PATTERN for ``=~``; unescaping the pattern
    would collapse ``\\\\d`` (literal backslash + d) onto ``\\d``
    (digit class) and throw on ``\\E``)."""
    raw: str = ""

    def __new__(cls, unescaped: str, raw: str):
        self = super().__new__(cls, unescaped)
        self.raw = raw
        return self


def _unquote(s: str) -> str:
    """commons-jexl3 StringParser semantics: only the DELIMITER quote
    and '\\\\' unescape (plus \\uXXXX); any other escape keeps its
    backslash — 'C\\d+' stays a regex, it does not collapse to 'Cd+'
    (advice r10: the reference relies on this for =~ literals)."""
    delim, body = s[0], s[1:-1]
    out: list[str] = []
    i = 0
    while i < len(body):
        ch = body[i]
        if ch == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt == "u" and i + 5 < len(body):
                try:
                    out.append(chr(int(body[i + 2:i + 6], 16)))
                    i += 6
                    continue
                except ValueError:
                    pass
            if nxt in (delim, "\\"):
                out.append(nxt)
            else:
                out.append("\\")
                out.append(nxt)
            i += 2
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _regex_raw(op: str, lit: "Literal") -> "Literal":
    """For ``=~``/``!~``, the pattern is the literal's RAW quoted body
    (see _EscStr); every other operator keeps the unescaped value."""
    if op in ("=~", "!~") and isinstance(lit.value, _EscStr):
        return Literal(str(lit.value.raw))
    return lit


def _fold_cmp(op: str, a, b) -> bool:
    """Constant comparison folding (JexlArithmetic over two literals —
    the reference evaluates '1 + 1 + 1 == 3' per row to a constant)."""
    if op in ("=~", "!~"):
        raise JexlParseError(f"regex over literal operands: {a!r} {op} {b!r}")
    if a is None or b is None:
        eq = a is None and b is None
        if op == "==":
            return eq
        if op == "!=":
            return not eq
        raise JexlParseError(f"ordered comparison with null literal")
    same_kind = (isinstance(a, bool) == isinstance(b, bool)) and (
        isinstance(a, str) == isinstance(b, str))
    if not same_kind:
        # JexlArithmetic coerces mixed string/number numerically
        try:
            a, b = float(a), float(b)
        except (TypeError, ValueError):
            if op == "==":
                return False
            if op == "!=":
                return True
            raise JexlParseError(
                f"incomparable literals: {a!r} {op} {b!r}") from None
    return {"==": a == b, "!=": a != b, "<": a < b, ">": a > b,
            "<=": a <= b, ">=": a >= b}[op]


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.tokens = tokens
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.tokens[self.i]

    def next(self) -> tuple[str, str]:
        tok = self.tokens[self.i]
        self.i += 1
        return tok

    def expect(self, value: str) -> None:
        kind, tok = self.next()
        if tok != value:
            raise JexlParseError(f"expected {value!r}, got {tok!r}")

    def parse_expr(self) -> JexlNode:
        return self.parse_or()

    def _is_word_op(self, word: str) -> bool:
        # commons-jexl3 accepts 'and'/'or'/'not' word operators; the
        # reference's #JEXL bodies write them uppercase
        # (CompositeFunctionsTest.testWithLucene) — in operator
        # position the word is unambiguous (juxtaposition is illegal)
        kind, tok = self.peek()
        return kind == "ident" and tok.lower() == word

    def parse_or(self) -> JexlNode:
        terms = [self.parse_and()]
        while self.peek()[1] == "||" or self._is_word_op("or"):
            self.next()
            terms.append(self.parse_and())
        return terms[0] if len(terms) == 1 else OrNode(tuple(terms))

    def parse_and(self) -> JexlNode:
        terms = [self.parse_not()]
        while self.peek()[1] == "&&" or self._is_word_op("and"):
            self.next()
            terms.append(self.parse_not())
        return terms[0] if len(terms) == 1 else AndNode(tuple(terms))

    def parse_not(self) -> JexlNode:
        if self.peek()[1] == "!" or self._is_word_op("not"):
            self.next()
            return NotNode(self.parse_not())
        return self.parse_primary()

    def parse_primary(self) -> JexlNode:
        kind, tok = self.peek()
        if tok == "(":
            # '(' is ambiguous: boolean grouping or a parenthesized
            # arithmetic operand ('(VALUE + 1) > 3').  Try the boolean
            # reading; on failure backtrack and let parse_comparison's
            # additive grammar consume the parenthesis.
            mark = self.i
            try:
                self.next()
                inner = self.parse_expr()
                self.expect(")")
                return inner
            except JexlParseError:
                self.i = mark
                return self.parse_comparison()
        if kind == "ident" and self.tokens[self.i + 1][0] == "colon":
            if tok == "normalize":
                # normalize:* folds to a literal at parse time; it can
                # open a comparison ('x' == F inverted form).
                lit = self._fold_normalize(self.parse_funcall())
                return self.parse_comparison(lit)
            fn = self._method_chain(self.parse_funcall())
            # value-returning functions open comparisons — the JEXL the
            # reference evaluates writes e.g.
            # ``filter:getTime(FIELD) > 1700000000000`` (getTime /
            # getNextTime / getMaxValue / getMatchTo*OfPeriod all return
            # values, EvaluationPhaseFilterFunctions) — and arithmetic
            # ('filter:getMaxTime(D) - filter:getMinTime(B) > goal',
            # CompositeFunctionsTest.testDateDelta); a bare funcall
            # stays a boolean predicate term
            nxt = self.peek()[1]
            if nxt in self._ADD_OPS or nxt in self._MUL_OPS:
                return self.parse_comparison(self.parse_additive(fn))
            if nxt in _CMP_OPS:
                return self.parse_comparison(fn)
            return fn
        return self.parse_comparison()

    def parse_funcall(self) -> FuncNode:
        _, ns = self.next()
        self.next()  # colon
        kind, name = self.next()
        if kind != "ident":
            raise JexlParseError(f"expected function name after {ns}:, got {name!r}")
        self.expect("(")
        args: list[JexlNode] = []
        if self.peek()[1] != ")":
            args.append(self.parse_arg())
            while self.peek()[1] == ",":
                self.next()
                args.append(self.parse_arg())
        self.expect(")")
        return FuncNode(ns, name, tuple(args))

    def parse_arg(self) -> JexlNode:
        kind, tok = self.peek()
        if tok == "-":
            self.next()
            v = self._literal_value()
            if not isinstance(v, (int, float)) or isinstance(v, bool):
                raise JexlParseError(f"cannot negate literal {v!r}")
            return Literal(-v)
        if kind == "ident" and tok not in _KEYWORDS:
            if self.tokens[self.i + 1][0] == "colon":
                # nested funcall argument (FunctionalSetTest's
                # method-as-argument shape) — possibly continued by
                # arithmetic ("occurrence(AG, '==',
                # getAllMatches(AG,'16').size() + ….size())")
                node = self._method_chain(self.parse_funcall())
                if self.peek()[1] in self._ADD_OPS \
                        or self.peek()[1] in self._MUL_OPS:
                    node = self.parse_additive(node)
                return node
            self.next()
            if "." in tok and self.peek()[1] == "(":
                # method call as an argument (FunctionalSetTest's
                # "….containsAll(AG.getValuesForGroups(…))")
                base, method = tok.rsplit(".", 1)
                return self._method_chain(
                    self._finish_method(Identifier(base), method))
            name = tok
            # field-UNION argument: filter:isNull(NULL1||NULL2) — the
            # reference's multi-field form (CompositeFunctionsTest
            # testNulls); kept as one Identifier whose name carries the
            # '||' — field_values/field_pred split and union it
            while self.peek()[1] == "||":
                self.next()
                k2, t2 = self.next()
                if k2 != "ident" or t2 in _KEYWORDS:
                    raise JexlParseError(
                        f"expected field name after '||', got {t2!r}")
                name += "||" + t2
            return Identifier(name)
        return Literal(self._literal_value())

    def _finish_method(self, target: JexlNode, name: str) -> MethodNode:
        self.expect("(")
        args: list[JexlNode] = []
        if self.peek()[1] != ")":
            args.append(self.parse_arg())
            while self.peek()[1] == ",":
                self.next()
                args.append(self.parse_arg())
        self.expect(")")
        return MethodNode(target, name, tuple(args))

    def _method_chain(self, node: JexlNode) -> JexlNode:
        # chained FunctionalSet methods after a funcall/method result:
        # filter:getAllMatches(NAM,'x').size(), AG.greaterThan(39).size()
        while self.peek()[1] == ".":
            self.next()
            kind, name = self.next()
            if kind != "ident" or "." in name:
                raise JexlParseError(f"expected method name, got {name!r}")
            node = self._finish_method(node, name)
        return node

    _MARKER_RE = re.compile(r"_[A-Za-z]+_$")

    def parse_comparison(self, left: JexlNode | None = None) -> JexlNode:
        if left is None:
            left = self.parse_additive()
        kind, tok = self.peek()
        if tok == "=":
            # QueryPropertyMarker assignment (QueryPropertyMarker.java;
            # the reference's planner wraps subtrees in
            # ``((_Bounded_ = true) && (...))`` / _Delayed_ / _Eval_ /
            # _List_ / _Term_ / _Hole_ hints).  Kept as a MarkerNode so
            # ``parse`` can resolve ``_Bounded_`` into a RangeNode
            # (same-value semantics); any other marker evaluates true
            # and the surrounding AND keeps the wrapped expression, so
            # re-running a reference-planned query string just works.
            # Only ``_X_``-shaped identifiers are accepted; anything
            # else is a user error (assignment is not part of the
            # query surface).
            if isinstance(left, Identifier) \
                    and self._MARKER_RE.match(left.name):
                self.next()
                self._literal_value()          # the asserted value
                return MarkerNode(left.name)
            raise JexlParseError(
                f"assignment to non-marker {left}: did you mean '=='?")
        if tok in _CMP_OPS:
            self.next()
            right = self.parse_additive()
            return self._make_cmp(tok, left, right)
        # Bare identifier/literal as boolean expression: JEXL would coerce;
        # DataWave queries never do this except literal true/false.
        if isinstance(left, Literal) and isinstance(left.value, bool):
            return left
        raise JexlParseError(f"expected comparison operator, got {tok!r}")

    @staticmethod
    def _make_cmp(op: str, left: JexlNode, right: JexlNode) -> JexlNode:
        # (the module-level _regex_raw swaps a regex literal to its raw
        # quoted body — see _EscStr)
        inverse = {"<": ">", ">": "<", "<=": ">=", ">=": "<=",
                   "==": "==", "!=": "!=", "=~": "=~", "!~": "!~"}
        if isinstance(left, Literal) and isinstance(right, Literal):
            # constant comparison ('1 + 1 + 1 == 3',
            # CompositeFunctionsTest.testArithmetic) — JexlArithmetic
            # evaluates it per row to the same constant; fold now
            return Literal(_fold_cmp(op, left.value, right.value))
        if isinstance(left, (ArithNode, FuncNode, MethodNode)) \
                or isinstance(right, (ArithNode, FuncNode, MethodNode)):
            # function results compare through the arithmetic path: the
            # compiler resolves FuncNode operands via FUNCTION_COMPILERS
            if op in ("=~", "!~"):
                raise JexlParseError(
                    f"regex comparison over arithmetic: {left} {op} {right}")
            return ArithCmpNode(op, left, right)
        if isinstance(left, Identifier) and isinstance(right, Identifier):
            return FieldCmpNode(op, left, right)
        if isinstance(left, Literal) and isinstance(right, Identifier):
            # InvertNodeVisitor parity: 'x' == F  →  F == 'x'
            return CmpNode(inverse[op], right, _regex_raw(op, left))
        if isinstance(left, Identifier) and isinstance(right, Literal):
            return CmpNode(op, left, _regex_raw(op, right))
        raise JexlParseError(f"literal-to-literal comparison: {left} {op} {right}")

    _ADD_OPS = ("+", "-")
    _MUL_OPS = ("*", "/", "%")

    @staticmethod
    def _fold(op: str, left: JexlNode, right: JexlNode) -> JexlNode:
        """Constant-fold literal-only arithmetic at parse time
        (the reference folds via its rewrite visitors)."""
        if isinstance(left, Literal) and isinstance(right, Literal) \
                and isinstance(left.value, (int, float)) \
                and isinstance(right.value, (int, float)):
            a, b = left.value, right.value
            try:
                v = {"+": lambda: a + b, "-": lambda: a - b,
                     "*": lambda: a * b, "%": lambda: a % b,
                     "/": lambda: a / b}[op]()
            except ZeroDivisionError:
                raise JexlParseError(f"division by zero: {a} {op} {b}")
            return Literal(v)
        return ArithNode(op, left, right)

    def parse_additive(self, seed: JexlNode | None = None) -> JexlNode:
        node = self.parse_mult(seed)
        while self.peek()[1] in self._ADD_OPS:
            _, op = self.next()
            node = self._fold(op, node, self.parse_mult())
        return node

    def parse_mult(self, seed: JexlNode | None = None) -> JexlNode:
        node = seed if seed is not None else self.parse_unary()
        while self.peek()[1] in self._MUL_OPS:
            _, op = self.next()
            node = self._fold(op, node, self.parse_unary())
        return node

    def parse_unary(self) -> JexlNode:
        if self.peek()[1] == "-":
            self.next()
            inner = self.parse_unary()
            if isinstance(inner, Literal) and \
                    isinstance(inner.value, (int, float)):
                return Literal(-inner.value)
            return ArithNode("-", Literal(0), inner)
        return self.parse_operand()

    def parse_operand(self) -> JexlNode:
        kind, tok = self.peek()
        if tok == "(":
            self.next()
            inner = self.parse_additive()
            self.expect(")")
            return inner
        if kind == "ident" and tok not in _KEYWORDS:
            if self.tokens[self.i + 1][0] == "colon":
                if tok == "normalize":
                    # value position: IP == normalize:ipv4('010.000.001.002')
                    return self._fold_normalize(self.parse_funcall())
                # value position funcall: '5 < filter:getTime(TS)',
                # '(filter:getTime(TS) + 5) > x'
                return self._method_chain(self.parse_funcall())
            self.next()
            if "." in tok and self.peek()[1] == "(":
                # FunctionalSet method on a field's value set:
                # 'AG.min() > 10' tokenizes as ONE ident ('AG.min') —
                # split the method name off the last dot component
                base, method = tok.rsplit(".", 1)
                return self._method_chain(
                    self._finish_method(Identifier(base), method))
            return Identifier(tok)
        return Literal(self._literal_value())

    @staticmethod
    def _fold_normalize(fn: FuncNode) -> Literal:
        """Fold a ``normalize:*`` call over literal args into its
        canonical literal (NormalizationFunctions.java parity — the
        reference resolves these during query normalization)."""
        from datawave_spark.normalizers import normalize_function
        vals = []
        for a in fn.args:
            if not isinstance(a, Literal):
                raise JexlParseError(
                    f"normalize:{fn.name} requires literal args, got {a!r}")
            vals.append(a.value)
        try:
            return Literal(normalize_function(fn.name, *vals))
        except (KeyError, ValueError) as e:
            raise JexlParseError(str(e)) from None

    # retained name: operand parsing for comparisons pre-arithmetic
    parse_atom = parse_operand

    def _literal_value(self) -> Any:
        kind, tok = self.next()
        if kind == "number":
            # Java long suffix ('2522880000000L') — commons-jexl accepts
            # it; reference test queries use it (CompositeFunctionsTest)
            if tok[-1] in "lL":
                return int(tok[:-1])
            return float(tok) if "." in tok else int(tok)
        if kind == "string":
            return _EscStr(_unquote(tok), tok[1:-1])
        if kind == "ident" and tok in _KEYWORDS:
            return _KEYWORDS[tok]
        raise JexlParseError(f"expected literal, got {tok!r}")


def _fuse_bounded(terms: tuple[JexlNode, ...]) -> JexlNode | None:
    """The non-marker siblings of a ``_Bounded_`` marker → RangeNode,
    or None when the shape is not the reference's marked-range form
    (one lower-bound and one upper-bound comparison on ONE field)."""
    cmps: list[JexlNode] = []
    for t in terms:
        cmps.extend(t.terms if isinstance(t, AndNode) else (t,))
    if len(cmps) != 2 or not all(isinstance(c, CmpNode) for c in cmps):
        return None
    a, b = cmps
    if a.field.name.upper() != b.field.name.upper():
        return None
    lo = next((c for c in (a, b) if c.op in (">", ">=")), None)
    hi = next((c for c in (a, b) if c.op in ("<", "<=")), None)
    if lo is None or hi is None:
        return None
    return RangeNode(lo.field, lo.op, lo.value, hi.op, hi.value)


def _resolve_markers(node: JexlNode) -> JexlNode:
    """Resolve QueryPropertyMarker wrappers: ``((_Bounded_ = true) &&
    (F >= lo && F <= hi))`` fuses into a RangeNode (BOUNDED_RANGE
    evaluates SAME-VALUE on multi-valued fields — r8); other markers
    stay as MarkerNodes (compile: true) so their wrapped expression
    keeps its plain meaning."""
    if isinstance(node, AndNode):
        # inspect DIRECT children for the marker before recursing —
        # recursion resolves stray markers to Literal(True)
        marked = any(isinstance(t, MarkerNode) and t.name == "_Bounded_"
                     for t in node.terms)
        if marked:
            raw = tuple(t for t in node.terms
                        if not (isinstance(t, MarkerNode)
                                and t.name == "_Bounded_"))
            fused = _fuse_bounded(raw)
            if fused is not None:
                return fused
            rest = tuple(_resolve_markers(t) for t in raw)
            if not rest:
                return Literal(True)
            return rest[0] if len(rest) == 1 else AndNode(rest)
        return AndNode(tuple(_resolve_markers(t) for t in node.terms))
    if isinstance(node, OrNode):
        return OrNode(tuple(_resolve_markers(t) for t in node.terms))
    if isinstance(node, NotNode):
        return NotNode(_resolve_markers(node.term))
    if isinstance(node, MarkerNode):
        # a non-bounded (or structurally stray) marker evaluates true;
        # prune() then drops it from the AND, like the old unwrapping
        return Literal(True)
    return node


def parse(text: str) -> JexlNode:
    """Parse a JEXL query string into an AST."""
    p = _Parser(_tokenize(text))
    node = p.parse_expr()
    if p.peek()[0] != "eof":
        raise JexlParseError(f"trailing input at token {p.peek()[1]!r}")
    return _resolve_markers(node)
