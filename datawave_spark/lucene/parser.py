"""LUCENE syntax → the engine's JEXL AST.

Reference: warehouse/query-core/src/main/java/datawave/query/language/
parser/jexl/LuceneToJexlQueryParser.java:26 (javacc grammar
AccumuloSyntaxParser.java:45).  The LUCENE dialect DataWave accepts:

- ``FIELD:value`` (equality), ``FIELD:val*``/``va?ue`` (wildcards →
  regex), bare ``value`` (unfielded → _ANYFIELD_);
- ``FIELD:[a TO b]`` inclusive / ``{a TO b}`` exclusive ranges;
- ``FIELD:"a b c"`` quoted phrase → content:phrase(FIELD, ...);
- ``AND`` / ``OR`` / ``NOT`` (and symbolic &&/||/!), implicit AND for
  adjacent terms (DataWave configures implicit-AND), parentheses;
- ``#FUNC(args)`` post-filters/options — the full `language/functions/
  jexl/` class list: #INCLUDE, #EXCLUDE, #ISNULL, #ISNOTNULL, #TEXT,
  #GROUPBY, #UNIQUE, #UNIQUE_BY_DAY (etc., incl. TENTH_OF_HOUR),
  #SUM/#MIN/#MAX/#AVERAGE/#COUNT, #EXCERPT_FIELDS, #LIMIT_FIELDS,
  #NOEXPANSION, #LENIENT, #STRICT, #RENAME, #MATCHES_IN_GROUP[_LEFT],
  #OCCURRENCE, #JEXL, #COMPARE, #MATCHES, #GET_ALL_MATCHES, #DATE,
  #LOADED, #TIME_FUNCTION, #ATOM_VALUES_MATCH, #EVALUATION_ONLY,
  #OPTIONS, #GEO, and the geowave predicates #CONTAINS/#COVERED_BY/
  #COVERS/#CROSSES/#INTERSECTS/#OVERLAPS/#WITHIN.

Everything compiles onto the same JEXL AST the JEXL parser produces, so
downstream (rewrites, options extraction, Column compiler) is shared.
"""

from __future__ import annotations

import re

from datawave_spark.jexl.ast import (
    AndNode, CmpNode, FieldCmpNode, FuncNode, Identifier, JexlNode, RangeNode,
    Literal, NotNode, OrNode,
)


class LuceneParseError(ValueError):
    pass


def _discard_escape(s: str, escaped: str) -> str:
    """Port of EscapeQuerySyntaxImpl.discardEscapeChar(input, chars,
    false) (reference warehouse/query-core .../lucene/
    EscapeQuerySyntaxImpl.java:212): the backslash is dropped ONLY when
    the escaped character is in ``escaped``; any other ``\\x`` keeps the
    backslash, and ``\\\\`` emits one backslash and re-arms the escape
    on the following character."""
    out: list[str] = []
    armed = False
    for ch in s:
        if armed:
            armed = False
            if ch in escaped:
                out.append(ch)
            else:
                out.append("\\")
                if ch == "\\":
                    armed = True
                else:
                    out.append(ch)
        elif ch == "\\":
            armed = True
        else:
            out.append(ch)
    if armed:
        out.append("\\")
    return "".join(out)


# the escape set AccumuloSyntaxParser:399 hands discardEscapeChar for
# function-argument terms, and :464 for /regex/ terms
_FUNC_ARG_ESCAPES = "(),\"'\\"
_REGEX_ESCAPES = "/"


_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+)
  | (?P<lparen>\() | (?P<rparen>\))
  | (?P<lbracket>\[) | (?P<rbracket>\]) | (?P<lbrace>\{) | (?P<rbrace>\})
  # boolean/range keywords are CASE-INSENSITIVE
  # (AccumuloSyntaxParser.jj:9 IGNORE_CASE=true — GroupingTest's
  # '(UUID:C* or UUID:S*) and #GROUPBY(...)' spelling)
  | (?P<and>(?i:AND)\b|&&) | (?P<or>(?i:OR)\b|\|\|)
  | (?P<not>(?i:NOT)\b|!)
  | (?P<to>(?i:TO)\b)
  | (?P<hashfunc>\#[A-Za-z_][A-Za-z0-9_]*)
  | (?P<regex>/(?:\\.|[^/\\])*/)
  | (?P<phrase>"(?:\\.|[^"\\])*")
  | (?P<squote>'(?:\\.|[^'\\])*')
  | (?P<fielded>[A-Za-z_$][A-Za-z0-9_.$]*:)
  | (?P<comma>,)
  | (?P<term>[^\s()\[\]{}",]+)
""", re.VERBOSE)


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise LuceneParseError(f"bad character at {pos}: {text[pos:pos+20]!r}")
        pos = m.end()
        if m.lastgroup != "ws":
            out.append((m.lastgroup, m.group()))
    out.append(("eof", ""))
    return out


# LUCENE wildcard → Java regex (full-match semantics downstream)
def _wildcard_to_regex(term: str) -> str:
    out = []
    for ch in term:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "".join(out)


# #FUNC name → (namespace, jexl name) for evaluation-phase functions
# (language/functions/jexl/*.java class list).
_HASH_EVAL = {
    "INCLUDE": ("filter", "includeRegex"),
    "EXCLUDE": ("filter", "excludeRegex"),
    "ISNULL": ("filter", "isNull"),
    "ISNOTNULL": ("filter", "isNotNull"),
    "OCCURRENCE": ("filter", "occurrence"),
    "MATCHES_AT_LEAST_COUNT_OF": ("filter", "matchesAtLeastCountOf"),
    "TEXT": ("f", "includeText"),
    "MATCHES_IN_GROUP": ("grouping", "matchesInGroup"),
    "MATCHES_IN_GROUP_LEFT": ("grouping", "matchesInGroupLeft"),
    # TimeFunction.java:20 ("time_function") → filter:timeFunction
    "TIME_FUNCTION": ("filter", "timeFunction"),
    # Matches.java:14 emits "f:matchesRegex" — the QueryFunctions method
    # is matchRegex (QueryFunctions.java:33 MATCH_REGEX); same function.
    "MATCHES": ("f", "matchRegex"),
    # AtomValuesMatchFunction.java:17 → grouping:atomValuesMatch
    "ATOM_VALUES_MATCH": ("grouping", "atomValuesMatch"),
}

# Geowave.java:60-96 subclasses: #CONTAINS(FIELD, wkt) etc. →
# geowave:<name>(FIELD, 'wkt')
_GEOWAVE_OPS = {
    "CONTAINS": "contains", "COVERED_BY": "covered_by",
    "COVERS": "covers", "CROSSES": "crosses",
    "INTERSECTS": "intersects", "OVERLAPS": "overlaps",
    "WITHIN": "within",
}

# DateFunction.java:15 / Loaded.java COMMANDS
_DATE_COMMANDS = {"after", "before", "between"}

# #FUNC options → f: namespace option functions (QueryOptionsFromQuery
# recognizes f:groupby, f:unique, f:unique_by_*, f:sum..., :58-64).
_HASH_OPTIONS = {
    "GROUPBY": "groupby", "GROUP_BY": "groupby",
    "UNIQUE": "unique", "MOST_RECENT_UNIQUE": "most_recent_unique",
    "SUM": "sum", "MIN": "min", "MAX": "max", "AVERAGE": "average",
    "COUNT": "count", "RENAME": "rename",
    "EXCERPT_FIELDS": "excerpt_fields", "LIMIT_FIELDS": "limit_fields",
    "NOEXPANSION": "noexpansion", "LENIENT": "lenient", "STRICT": "strict",
}
_UNIQUE_BY = re.compile(r"UNIQUE_BY_([A-Z_]+)$")


class _Parser:
    def __init__(self, tokens):
        self.tokens = tokens
        self.i = 0

    def peek(self):
        return self.tokens[self.i]

    def next(self):
        t = self.tokens[self.i]
        self.i += 1
        return t

    def expect(self, kind):
        k, v = self.next()
        if k != kind:
            raise LuceneParseError(f"expected {kind}, got {v!r}")
        return v

    # OR over AND over unary; adjacency = implicit AND
    def parse_or(self) -> JexlNode:
        terms = [self.parse_and()]
        while self.peek()[0] == "or":
            self.next()
            terms.append(self.parse_and())
        return terms[0] if len(terms) == 1 else OrNode(tuple(terms))

    _STARTERS = {"lparen", "not", "hashfunc", "phrase", "fielded", "term",
                 "squote"}

    def parse_and(self) -> JexlNode:
        terms = [self.parse_unary()]
        while True:
            kind = self.peek()[0]
            if kind == "and":
                self.next()
                terms.append(self.parse_unary())
            elif kind in self._STARTERS:      # implicit AND
                terms.append(self.parse_unary())
            else:
                break
        return terms[0] if len(terms) == 1 else AndNode(tuple(terms))

    def parse_unary(self) -> JexlNode:
        kind, _ = self.peek()
        if kind == "not":
            self.next()
            return NotNode(self.parse_unary())
        if kind == "lparen":
            self.next()
            inner = self.parse_or()
            self.expect("rparen")
            return inner
        if kind == "hashfunc":
            return self.parse_hashfunc()
        return self.parse_term()

    def parse_hashfunc(self) -> JexlNode:
        _, raw = self.next()
        name = raw[1:].upper()
        args: list[JexlNode] = []
        if self.peek()[0] == "lparen":
            self.next()
            while self.peek()[0] != "rparen":
                k, v = self.next()
                if k == "comma":
                    continue
                if k == "lbracket":
                    # granularity suffix: #UNIQUE(FIELD[DAY]) — attach
                    # to the preceding field identifier
                    gran = self.expect("term")
                    self.expect("rbracket")
                    prev = args.pop()
                    base = prev.name if isinstance(prev, Identifier) else str(prev.value)
                    args.append(Identifier(f"{base}[{gran}]"))
                    continue
                if k == "phrase":
                    args.append(Literal(self._unquote(v)))
                elif k == "squote":
                    # single-quoted function arg — ANY chars incl.
                    # brackets/spaces (_FUNCTION_ARG_ALL_CHAR2,
                    # AccumuloSyntaxParser.jj:116), restricted escape
                    # set so a regex arg like '\d[0-9]' survives
                    args.append(Literal(_discard_escape(
                        v[1:-1], _FUNC_ARG_ESCAPES)))
                elif k == "term":
                    # single-quoted argument (the reference's function
                    # args are usually single-quoted:
                    # #MATCHES_AT_LEAST_COUNT_OF('3',NAM,'MICHAEL',…) —
                    # space-free by the term lexeme, like the Java's)
                    # AccumuloSyntaxParser:399's restricted escape set
                    # — a regex arg like '\d+' keeps its backslash
                    if len(v) >= 2 and v[0] == v[-1] == "'":
                        args.append(Literal(_discard_escape(
                            v[1:-1], _FUNC_ARG_ESCAPES)))
                        continue
                    # numbers stay numeric, words become identifiers or
                    # string literals depending on position (functions
                    # sort it out; identifiers are safe for both).
                    if re.fullmatch(r"-?\d+", v):
                        args.append(Literal(int(v)))
                    elif re.fullmatch(r"-?\d+\.\d+", v):
                        args.append(Literal(float(v)))
                    else:
                        args.append(Identifier(v))
                elif k in ("and", "or", "not", "to") \
                        and re.fullmatch(r"[A-Za-z]+", v):
                    # boolean keywords are plain WORDS in argument
                    # position — the AbstractEvaluationPhaseFunction
                    # combiner arg (#INCLUDE(OR, F1, v1, F2, v2))
                    args.append(Identifier(v))
                else:
                    raise LuceneParseError(f"bad #{name} argument {v!r}")
            self.expect("rparen")
        if name == "COMPARE":
            # language/functions/jexl/Compare.java:
            # #COMPARE(FIELD1, '<', 'ANY'|'ALL', FIELD2) → the full
            # filter:compare value-SET semantics (r6: ALL mode and the
            # reference's empty-set/bound rules now live in
            # functions/filter_functions.f_compare, so route there
            # instead of the FieldCmpNode any-pair approximation).
            if len(args) != 4:
                raise LuceneParseError(
                    f"#COMPARE takes (field, op, mode, field), got {args}")

            def _s(a):
                v = a.name if isinstance(a, Identifier) else str(a.value)
                # args may arrive single-quoted (lexed as bare terms)
                if len(v) >= 2 and v[0] == v[-1] and v[0] in "'\"":
                    v = v[1:-1]
                return v

            f1, op, mode, f2 = (_s(a) for a in args)
            if mode.upper() not in ("ANY", "ALL", ""):
                raise LuceneParseError(
                    f"#COMPARE mode {mode!r} unsupported")
            if op not in ("==", "=", "!=", "<", ">", "<=", ">="):
                raise LuceneParseError(f"#COMPARE op {op!r} unsupported")
            return FuncNode("filter", "compare",
                            (Identifier(f1), Literal(op),
                             Literal(mode.upper() or "ANY"),
                             Identifier(f2)))
        if name in _HASH_EVAL:
            ns, fn = _HASH_EVAL[name]
            if name in ("INCLUDE", "EXCLUDE", "TEXT", "MATCHES"):
                # AbstractEvaluationPhaseFunction argument shapes
                # (language/functions/jexl/AbstractEvaluationPhase
                # Function.java:22-91):
                #  - ONE arg → (_ANYFIELD_, value);
                #  - odd count >1 → leading AND/OR combiner over
                #    (field, value) pairs;
                #  - even count → pairs combined with AND.
                combiner = AndNode
                if len(args) == 1:
                    args = [Identifier("_ANYFIELD_"), self._lit(args[0])]
                elif len(args) % 2 == 1:
                    word = self._str(args[0]).upper()
                    if word not in ("AND", "OR"):
                        raise LuceneParseError(
                            f"#{name}: odd argument count needs a "
                            f"leading AND/OR, got {word!r}")
                    combiner = AndNode if word == "AND" else OrNode
                    args = args[1:]
                if len(args) > 2:
                    pairs = [
                        FuncNode(ns, fn, (args[i], self._lit(args[i + 1])))
                        for i in range(0, len(args), 2)]
                    return combiner(tuple(pairs))
                return FuncNode(ns, fn, (args[0], self._lit(args[1])))
            # filter: regex/value args arrive as Identifiers — convert
            # non-leading args to literals (fields stay identifiers only
            # in positions the functions expect).
            return FuncNode(ns, fn, tuple(args))
        if name in _GEOWAVE_OPS:
            # Geowave.java:31-44: first arg is the field, the rest are
            # escaped strings (the WKT geometry).
            return FuncNode("geowave", _GEOWAVE_OPS[name],
                            (args[0], *(self._lit(a) for a in args[1:])))
        if name == "GEO":
            # GeoFunction.java:51-66: #GEO(bounding_box|circle, FIELD
            # [, FIELD2], args...) → geo:within_<command>(...)
            if not args:
                raise LuceneParseError("#GEO requires a command argument")
            cmd = self._str(args[0]).lower()
            if cmd not in ("bounding_box", "circle"):
                raise LuceneParseError(
                    f"#GEO command must be bounding_box or circle, got {cmd!r}")
            rest = list(args[1:])
            # field name(s) lead; coordinate args become literals.  The
            # 7-arg bounding_box form has two leading fields (lon, lat).
            n_fields = 2 if (cmd == "bounding_box" and len(rest) == 6) else 1
            out = rest[:n_fields] + [self._lit(a) for a in rest[n_fields:]]
            return FuncNode("geo", f"within_{cmd}", tuple(out))
        if name == "DATE":
            # DateFunction.java:52-71: #DATE(FIELD[, after|before|
            # between], args...) → filter:afterDate/beforeDate/
            # betweenDates; an unrecognized second arg means "between"
            # with that arg as the first date value.
            if len(args) < 2:
                raise LuceneParseError("#DATE requires a field and dates")
            field, cmd = args[0], self._str(args[1]).lower()
            known = cmd in _DATE_COMMANDS
            fn = (cmd if known else "between") + "Date" \
                + ("s" if (not known or cmd == "between") else "")
            rest = args[1:] if not known else args[2:]
            return FuncNode("filter", fn,
                            (field, *(self._lit(a) for a in rest)))
        if name == "LOADED":
            # Loaded.java:55-73: #LOADED([after|before|between,] args...)
            # → filter:*LoadDate(LOAD_DATE, args...)
            if not args:
                raise LuceneParseError("#LOADED requires date arguments")
            cmd = self._str(args[0]).lower()
            known = cmd in _DATE_COMMANDS
            fn = (cmd if known else "between") + "LoadDate" \
                + ("s" if (not known or cmd == "between") else "")
            rest = args if not known else args[1:]
            return FuncNode("filter", fn,
                            (Identifier("LOAD_DATE"),
                             *(self._lit(a) for a in rest)))
        if name == "GET_ALL_MATCHES":
            # GetAllMatches.java:70-90: (field, regex) pairs ANDed.
            if not args or len(args) % 2:
                raise LuceneParseError(
                    "#GET_ALL_MATCHES takes (field, regex) pairs")
            terms = tuple(
                FuncNode("filter", "getAllMatches",
                         (args[i], self._lit(args[i + 1])))
                for i in range(0, len(args), 2))
            return terms[0] if len(terms) == 1 else AndNode(terms)
        if name == "EVALUATION_ONLY":
            # EvaluationOnly.java:34-51 wraps the re-parsed subquery in
            # ((_Eval_ = true) && (...)); the marker is a planner hint
            # that compiles to TRUE here (jexl/parser.py marker rule),
            # so the wrapped expression is all that remains.
            if len(args) != 1 or not isinstance(args[0], Literal):
                raise LuceneParseError(
                    "#EVALUATION_ONLY takes one quoted subquery")
            return parse_lucene(str(args[0].value))
        if name == "OPTIONS":
            # Options.java:32-47 → f:options(key, value, ...)
            if len(args) % 2:
                raise LuceneParseError("#OPTIONS takes key/value pairs")
            return FuncNode("f", "options",
                            tuple(self._lit(a) for a in args))
        m = _UNIQUE_BY.match(name)
        if m:
            gran = m.group(1)
            field_args = tuple(
                Identifier(f"{a.name if isinstance(a, Identifier) else a.value}[{gran}]")
                for a in args)
            return FuncNode("f", "unique", field_args)
        if name in _HASH_OPTIONS:
            return FuncNode("f", _HASH_OPTIONS[name], tuple(args))
        if name == "JEXL":
            from datawave_spark.jexl.parser import parse as parse_jexl
            assert args and isinstance(args[0], Literal)
            return parse_jexl(str(args[0].value))
        raise LuceneParseError(f"unknown function #{name}")

    @staticmethod
    def _unquote(s: str) -> str:
        return re.sub(r"\\(.)", r"\1", s[1:-1])

    @staticmethod
    def _str(a: JexlNode) -> str:
        """Argument node → its raw string (identifier name or literal)."""
        v = a.name if isinstance(a, Identifier) else str(a.value)
        if len(v) >= 2 and v[0] == v[-1] and v[0] in "'\"":
            v = v[1:-1]
        return v

    @classmethod
    def _lit(cls, a: JexlNode) -> Literal:
        """Force a value-position argument to a literal (bare terms lex
        as Identifiers; dates like 2024-01-01 must stay strings)."""
        if isinstance(a, Literal):
            return a
        return Literal(cls._str(a))

    def parse_term(self) -> JexlNode:
        kind, v = self.next()
        field = "_ANYFIELD_"
        if kind == "fielded":
            field = v[:-1]
            kind, v = self.next()
        if kind == "squote":
            # single quotes are NOT special in term position (the
            # reference's TERM token keeps them literally) — treat the
            # raw text as a plain term
            kind = "term"
        if kind == "phrase":
            words = self._unquote(v).split()
            # proximity suffix "a b"~N → content:within(field, N, terms)
            # (SlopQueryNodeBuilder.java:46 wraps the AdjNode in a
            # WithinNode with the slop as the distance → JexlWithinNode
            # .java:24 emits content:within).  A single-word phrase
            # ignores the slop — the reference's SelectorNode branch:
            # "within makes no sense" for one term.
            slop = None
            nk, nv = self.peek()
            if nk == "term" and re.fullmatch(r"~\d+", nv):
                self.next()
                slop = int(nv[1:])
            if len(words) == 1:
                return CmpNode("==", Identifier(field), Literal(words[0]))
            args = [Literal(w) for w in words]
            if slop is not None:
                args = [Literal(slop), *args]
                fn = "within"
            else:
                fn = "phrase"
            if field != "_ANYFIELD_":
                return FuncNode("content", fn,
                                (Identifier(field), *args))
            return FuncNode("content", fn, tuple(args))
        if kind == "regex":
            # Lucene regex term (UUID:/^[CS].*/ —
            # RegexpQueryNode → an ER node, UniqueTest's query form)
            # AccumuloSyntaxParser:464 unescapes ONLY '\/' in regex
            # terms — '\d' etc. must survive as regex syntax
            return CmpNode("=~", Identifier(field),
                           Literal(_discard_escape(v[1:-1],
                                                   _REGEX_ESCAPES)))
        if kind in ("lbracket", "lbrace"):
            lo_incl = kind == "lbracket"
            lo = self.expect("term")
            self.expect("to")
            hi = self.next()[1]
            end_kind = self.next()[0]
            hi_incl = end_kind == "rbracket"
            lo_op = ">=" if lo_incl else ">"
            hi_op = "<=" if hi_incl else "<"
            # a BOUNDED range (LuceneToJexlQueryParser emits the
            # ``((_Bounded_ = true) && ...)`` marker for every LUCENE
            # range, TestLuceneToJexlQueryParser.java:305): SAME-VALUE
            # semantics on multi-valued fields, not two independent
            # any-value bounds (lucene-referee r8)
            return RangeNode(Identifier(field), lo_op, Literal(lo),
                             hi_op, Literal(hi))
        if kind != "term":
            raise LuceneParseError(f"unexpected {v!r}")
        if "*" in v or "?" in v:
            return CmpNode("=~", Identifier(field),
                           Literal(_wildcard_to_regex(v)))
        # STRING literal always — LuceneToJexlQueryParser emits quoted
        # strings for every value ("FIELD1 == '99999'",
        # TestLuceneToJexlQueryParser.java:157,:305); numeric behavior
        # comes from the FIELD's type at compile time, never from the
        # literal's spelling.  (r8 fix: a numeric-looking term used to
        # become an int/float literal, turning equality on an untyped
        # string field into JexlArithmetic numeric coercion —
        # 'F:99999' wrongly matched stored '099999' — and ranges into
        # numeric compares where the reference's are lexicographic.)
        return CmpNode("==", Identifier(field), Literal(v))


def parse_lucene(text: str) -> JexlNode:
    p = _Parser(_tokenize(text))
    node = p.parse_or()
    if p.peek()[0] != "eof":
        raise LuceneParseError(f"trailing input at {p.peek()[1]!r}")
    return node
