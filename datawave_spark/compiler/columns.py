"""Compile the JEXL AST to a single ``pyspark.sql.Column`` predicate.

This module replaces the entire index/evaluation split of the reference:
where DataWave compiles the AST once into an index-iterator tree
(IteratorBuildingVisitor, warehouse/query-core/.../jexl/visitors/
IteratorBuildingVisitor.java:129) and again into a per-document JEXL
interpreter (DatawaveInterpreter.java:71), we emit one declarative
Column expression and let Catalyst do predicate pushdown, partition
pruning, reordering and whole-stage codegen.

Semantics implemented (DatawaveArithmetic parity,
jexl/DatawaveArithmetic.java:24,50-120):

- multi-valued fields (ArrayType columns) compare with ANY-value
  (implicit EXISTS) semantics; ``!=`` / ``!~`` mean NO value matches;
- every predicate is semantically *total* (never NULL): a comparison
  against a missing/null field is False, so its negation is True —
  matching per-document evaluation where an absent field simply fails
  the comparison.  Implementation detail that matters at 100 TB:
  negation is pushed down to the leaves (De Morgan) and only NEGATED
  leaves wrap in ``coalesce(.., False)`` — a positive leaf's NULL is
  indistinguishable from False under a WHERE clause (both drop the row,
  through any AND/OR combination), and leaving it bare keeps the
  comparison eligible for parquet predicate pushdown / row-group
  skipping, which a coalesce() wrapper defeats;
- ``=~`` is Java ``Pattern.matches`` — a FULL match — so patterns are
  anchored ``^(?:re)$`` before ``rlike``, with ``(?is)`` because the
  reference's DefaultArithmetic compiles via JexlPatternCache
  (CASE_INSENSITIVE | MULTILINE | DOTALL);
- literals are canonicalised with the field's normalizer (the ingest
  side stored normalized values), ExpandMultiNormalizedTerms parity;
- ``_ANYFIELD_ == v`` expands to an OR over all compatible fields
  (UnfieldedIndexExpansionVisitor parity, DefaultQueryPlanner.java:1406)
  using the DataFrame schema as the metadata source.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Callable

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from datawave_spark.jexl.ast import (
    AndNode, ArithCmpNode, ArithNode, CmpNode, FieldCmpNode, FuncNode,
    Identifier, JexlNode, Literal, MarkerNode, NotNode, OrNode, RangeNode, MethodNode,
)
from datawave_spark.normalizers import Normalizer, get_normalizer

ANYFIELD_NAMES = {"_ANYFIELD_", "ANYFIELD"}


@dataclass
class FieldSpec:
    """Per-field configuration — the analogue of the metadata table's
    per-(datatype, field) type binding (EventMetadata, SURVEY §1.4)."""
    column: str                      # physical column name
    normalizer: str = "noop"
    normalized_at_rest: bool = True  # stored values already canonical?


class _ModelDict(dict):
    """QueryModel lookup table: identifiers deconstruct ('$'-strip —
    JexlASTHelper.deconstructIdentifier) BEFORE model expansion, so
    every lookup site sees '$ALIAS' and 'ALIAS' identically (the
    reference strips the JEXL escape prefix before QueryModel
    expansion; a bare .upper() lookup missed '$'-escaped aliases)."""

    @staticmethod
    def _k(key):
        return key.lstrip("$") if isinstance(key, str) else key

    def __contains__(self, key):
        return super().__contains__(self._k(key))

    def __getitem__(self, key):
        return super().__getitem__(self._k(key))

    def get(self, key, default=None):
        return super().get(self._k(key), default)


@dataclass
class CompileContext:
    """Schema + field model for one query compilation."""
    schema: T.StructType
    fields: dict[str, FieldSpec] = dc_field(default_factory=dict)  # UPPER name → spec
    # query model: alias → concrete field names (QueryModelVisitor parity)
    model: dict[str, list[str]] = dc_field(default_factory=dict)
    # _ANYFIELD_ expansion set (the reference's unfielded expansion goes
    # against the INDEX — AnyFieldQueryTest's GenericCityFields); None =
    # expand over every schema field (the permissive default)
    anyfield: set | None = None

    def __post_init__(self):
        if not isinstance(self.model, _ModelDict):
            self.model = _ModelDict(self.model)
        if self.anyfield is not None:
            self.anyfield = {str(f).upper() for f in self.anyfield}

    @classmethod
    def for_dataframe(cls, df: DataFrame,
                      field_types: dict[str, str] | None = None,
                      model: dict[str, list[str]] | None = None,
                      at_rest: set[str] | list[str] | None = None,
                      anyfield: set[str] | list[str] | None = None) -> "CompileContext":
        """Derive a context from a DataFrame schema.  ``field_types``
        optionally binds normalizer names per field (case-insensitive).
        Fields named in ``at_rest`` hold values ALREADY normalized at
        ingest (sources.ingest normalize_at_rest / prepared assets):
        only the query literal is normalized, and the predicate stays a
        bare pushable comparison on the stored column — the reference
        stores normValue at ingest for exactly this reason (SURVEY
        §1.3)."""
        ft = {k.upper(): v for k, v in (field_types or {}).items()}
        rest = {k.upper() for k in (at_rest or ())}
        fields = {}
        for f in df.schema.fields:
            spec = FieldSpec(column=f.name)
            if f.name.upper() in ft:
                spec.normalizer = ft[f.name.upper()]
                spec.normalized_at_rest = f.name.upper() in rest
            fields[f.name.upper()] = spec
        mdl = {k.upper(): [v.upper() for v in vs] for k, vs in (model or {}).items()}
        return cls(schema=df.schema, fields=fields, model=mdl,
                   anyfield=anyfield)

    def resolve(self, name: str) -> FieldSpec | None:
        # leading '$' is the JEXL-escaped field prefix
        # (JexlASTHelper.deconstructIdentifier — '#JEXL("$UUID == ...")'
        # queries carry it)
        return self.fields.get(name.upper().lstrip("$"))

    def spark_type(self, spec: FieldSpec) -> T.DataType:
        for f in self.schema.fields:
            if f.name == spec.column:
                return f.dataType
        raise KeyError(spec.column)


# function compiler registry: (namespace, name) → fn(ctx, args) → Column
FUNCTION_COMPILERS: dict[tuple[str, str], Callable[..., Column]] = {}


def java_full_match(pattern: str) -> str:
    """The ONE encoding of the reference's regex evaluation contract:
    JexlPatternCache compiles every query regex with CASE_INSENSITIVE |
    MULTILINE | DOTALL, and every call site full-matches
    (Matcher.matches()) — so ``(?is)`` plus our own ^$ anchors.  (?m)
    is deliberately omitted: it would turn the outer anchors into
    per-line anchors and break the full-match contract; the only
    divergence is a user-embedded ^/$ inside the pattern against a
    multi-line value, where Java would line-anchor it.  Shared by the
    =~ operator (DefaultArithmetic), filter:/f: regex functions, and
    the grouping: value matchers."""
    return "(?is)^(?:" + pattern + ")$"


def fold_query_pattern(value: Any, norm: Normalizer) -> str:
    """Normalizer folding for a query REGEX, shared by the evaluation
    compiler (compile_cmp) and the index lookup (_index_value_pred) so
    the two paths cannot drift: patterns never pass through TYPED
    normalizers (a number-typed field's float('4.*') would raise), only
    pure string folds apply — the reference's LcNoDiacriticsType
    lowercases the pattern, NumberType patterns match the string form
    of the value.  List normalizers fold with their ELEMENT normalizer."""
    pat_src = str(value)
    fold = getattr(norm, "element", norm)
    if fold.name in ("lc", "lcNoDiacritics", "hexString", "macAddress"):
        pat_src = str(fold.normalize_literal(pat_src))
    return pat_src


def register_function(namespace: str, name: str):
    def deco(fn):
        FUNCTION_COMPILERS[(namespace, name)] = fn
        return fn
    return deco


def _false() -> Column:
    return F.lit(False)


def _total(c: Column) -> Column:
    """Make a predicate total: NULL → False."""
    return F.coalesce(c, F.lit(False))


def _element_type(dtype: T.DataType) -> T.DataType:
    return dtype.elementType if isinstance(dtype, T.ArrayType) else dtype


def _typed_literal(value: Any, norm: Normalizer, elem_type: T.DataType) -> Column:
    v = norm.normalize_literal(value)
    if isinstance(elem_type, (T.TimestampType, T.TimestampNTZType,
                              T.DateType)):
        # A query literal Spark's cast cannot parse must be a non-match,
        # not an ANSI CAST_INVALID_INPUT abort of the whole scan at
        # constant folding ('TS == "not-a-date"' — the r8 stored-value
        # sweep's bug class, on the LITERAL side; found by the r9
        # lenient-fields tests).  try_cast keeps Spark's exact
        # string→datetime acceptance, folds to NULL on failure, and a
        # NULL-literal comparison totalizes to false.
        return F.lit(str(v)).try_cast(elem_type)
    if isinstance(elem_type, (T.DoubleType, T.FloatType, T.DecimalType,
                              T.LongType, T.IntegerType, T.ShortType)):
        # RAISE on an unparseable literal (the caller turns it into
        # "term cannot match", the reference's failed-normalization
        # stance) — silently keeping the string form produced a
        # double-vs-string comparison that ANSI-aborted the scan
        # ('VAL <= 'Y'', lucene-referee r8).  A fractional bound
        # against an integer column stays a DOUBLE literal so range
        # semantics hold (Spark widens the column, no ANSI hazard).
        f = float(v)          # ValueError/TypeError propagate
        if isinstance(elem_type, (T.DoubleType, T.FloatType,
                                  T.DecimalType)):
            v = f
        else:
            v = int(f) if f == int(f) else f
    return F.lit(v)


def _ipv4_long(c: Column) -> Column:
    """Canonical dotted-quad → long, octet-weighted — the ordering the
    reference's zero-padded IpAddressType encoding realizes
    lexicographically (IpAddressQueryTest.testRange: '9.9.140.133' must
    sort ABOVE '9.9.40.1'; the unpadded canonical string sorts it
    below).  Pure codegen arithmetic; a non-IPv4 value try_casts to
    NULL and the comparison totalizes false."""
    p = F.split(c, r"\.")
    return (F.try_element_at(p, F.lit(1)).try_cast("long") * 16777216
            + F.try_element_at(p, F.lit(2)).try_cast("long") * 65536
            + F.try_element_at(p, F.lit(3)).try_cast("long") * 256
            + F.try_element_at(p, F.lit(4)).try_cast("long"))


def _scalar_cmp(op: str, col: Column, lit: Column, elem_type: T.DataType,
                norm: Normalizer, normalized_at_rest: bool) -> Column:
    """One value vs literal.  Numeric fields compare numerically (the
    reference's NumberType lexical encoding exists only to make Accumulo
    sort numerics; Catalyst compares natively)."""
    if not normalized_at_rest:
        col = norm.col(col)
    if norm.name == "ipAddress" and op != "==":
        # IP ordering is octet-numeric, not lexicographic on the
        # unpadded canonical form (r10: IpAddressQueryTest port)
        col, lit = _ipv4_long(col), _ipv4_long(lit)
    if isinstance(elem_type, T.StringType) and norm.name == "number":
        # try_cast, not cast: under ANSI a stored value that fails to
        # parse would kill the whole scan; the reference's evaluator
        # treats it as a non-match (review r8)
        col = col.try_cast("double")
    if op == "==":
        return col == lit
    if op == "<":
        return col < lit
    if op == ">":
        return col > lit
    if op == "<=":
        return col <= lit
    if op == ">=":
        return col >= lit
    raise ValueError(f"unsupported scalar op {op}")


def compile_cmp(node: CmpNode, ctx: CompileContext,
                negated: bool = False) -> Column:
    # deconstruct BEFORE model expansion (JexlASTHelper
    # .deconstructIdentifier) — '$ALIAS' must model-expand like 'ALIAS'
    name = node.field.name.upper().lstrip("$")
    if name in ANYFIELD_NAMES:
        return _compile_anyfield(node, ctx, negated)
    if name in ctx.model:
        # Query model (aliasing): alias → OR of concrete-field positives,
        # totalized before an outer negation.  The alias is removed from
        # the child context so identity entries (SOURCE → SOURCE) and
        # alias chains cannot recurse.
        child_ctx = CompileContext(
            schema=ctx.schema, fields=ctx.fields, anyfield=ctx.anyfield,
            model={k: v for k, v in ctx.model.items() if k != name})
        positive_op = {"!=": "==", "!~": "=~"}.get(node.op, node.op)
        out = None
        for c in ctx.model[name]:
            p = compile_cmp(CmpNode(positive_op, Identifier(c), node.value),
                            child_ctx)
            out = p if out is None else out | p
        if negated ^ (node.op in ("!=", "!~")):
            return ~_total(out)
        return out
    spec = ctx.resolve(name)
    negate = negated ^ (node.op in ("!=", "!~"))
    if spec is None:
        # Unknown field: comparison is False; negated ops become True.
        return F.lit(negate)

    positive_op = {"!=": "==", "!~": "=~"}.get(node.op, node.op)

    value = node.value.value
    norm = get_normalizer(spec.normalizer)
    dtype = ctx.spark_type(spec)
    elem_type = _element_type(dtype)
    # OneToManyNormalizerType over RAW (not-at-rest) storage: one value
    # fans out to many normalized values at query time.
    one_many = norm.one_to_many and not spec.normalized_at_rest

    # A LIST-valued query literal expands to the CONJUNCTION of
    # same-operator per-element terms (ExpandMultiNormalizedTerms
    # .java:323-338 builds an AND node over buildUntypedNode copies;
    # NumericListQueryTest.testFieldEqualsList: SIZE == '90,26.5'
    # plans as SIZE == '+bE9' && SIZE == '+bE2.65').  Literal
    # expansion is query-side, so it applies to at-rest list columns
    # too; elements carry no delimiter, so recursion terminates.
    if norm.one_to_many and value is not None \
            and node.op not in ("=~", "!~"):
        try:
            many = norm.normalize_to_many(value)
        except (ValueError, TypeError):
            many = None
        if many is not None and len(many) > 1:
            out = None
            for el in many:
                p = compile_cmp(CmpNode(node.op, Identifier(name),
                                        Literal(el)), ctx)
                out = p if out is None else out & p
            return ~_total(out) if negated else out

    if value is None:
        col = F.col(spec.column)
        if one_many:
            # null semantics match the at-rest array form: a raw value
            # whose fan-out is EMPTY (e.g. '' or ';;') holds no values.
            if isinstance(dtype, T.ArrayType):
                fan = F.flatten(F.filter(F.transform(col, norm.col),
                                         lambda a: a.isNotNull()))
            else:
                fan = norm.col(col)
            is_null = col.isNull() | (F.size(fan) == 0)
        elif isinstance(dtype, T.ArrayType):
            is_null = col.isNull() | (F.size(col) == 0)
        else:
            is_null = col.isNull()
        return ~is_null if negate else is_null

    if positive_op == "=~":
        # Regex patterns must NOT pass through typed normalizers — a
        # number-typed field's float('4.*') would raise and the term
        # would silently compile to constant False.  Only pure string
        # folds apply (the reference's LcNoDiacriticsType likewise
        # lowercases the pattern; NumberType patterns match the string
        # form of the value).
        pat_src = fold_query_pattern(value, norm)
        # java_full_match: =~ evaluates through DefaultArithmetic →
        # JexlPatternCache in the reference; normalizer folding above
        # covers typed fields, the pattern flags make raw/untyped
        # fields behave identically too.
        pattern = java_full_match(pat_src)

        def leaf(c: Column) -> Column:
            cc = norm.col(c) if not spec.normalized_at_rest else c
            return raw_match_string(cc, elem_type).rlike(pattern)
    elif isinstance(elem_type, T.StringType) \
            and isinstance(value, (int, float)) \
            and not isinstance(value, bool) and norm.name == "noop":
        # JexlArithmetic numeric coercion (DefaultArithmetic.equals:122
        # → super.equals): a NUMBER literal against an untyped string
        # field compares NUMERICALLY on stored values that parse —
        # '010' == 10 and '10.0' == 10 are true — and a non-numeric
        # stored value is a non-match.  try_cast, not cast: under ANSI
        # the first unparseable row would otherwise kill the whole
        # query (review r8 — CAST_INVALID_INPUT on 'S == 10').
        # Double-typed compare (JexlArithmetic uses BigDecimal; exact
        # for |values| < 2^53, the practical range of query literals).
        num_lit = F.lit(float(value))

        def leaf(c: Column) -> Column:
            cc = c if spec.normalized_at_rest else norm.col(c)
            return _scalar_cmp(positive_op, cc.try_cast("double"),
                               num_lit, T.DoubleType(), norm, True)
    else:
        try:
            lit = _typed_literal(value, norm, elem_type)
        except (ValueError, TypeError):
            # The literal does not normalize under this field's type (e.g.
            # _ANYFIELD_ expanding a word against an ipAddress field) — the
            # term simply cannot match this field.  ExpandMultiNormalized
            # Terms drops such branches in the reference.
            return F.lit(negate)

        def leaf(c: Column) -> Column:
            return _scalar_cmp(positive_op, c, lit, elem_type, norm,
                               spec.normalized_at_rest)

    if one_many:
        # OneToManyNormalizerType over RAW storage: normalize fans ONE
        # value out to MANY (array expression), and the comparison
        # matches ANY fanned element — the same set semantics an
        # at-rest array column gets below.  Elements come out of
        # norm.col already canonical, so compare them bare.  A raw
        # ARRAY column (multiple delimited values per row,
        # BaseIngestHelper.java:722-737's multi-raw-value case) fans
        # each element and matches any element of any fan-out.
        if positive_op == "=~":
            def fanned(e: Column) -> Column:
                return e.cast("string").rlike(pattern)
        else:
            def fanned(e: Column) -> Column:
                return _scalar_cmp(positive_op, e, lit, elem_type, norm, True)
        if isinstance(dtype, T.ArrayType):
            pred = F.exists(
                F.col(spec.column),
                lambda raw: F.coalesce(F.exists(norm.col(raw), fanned),
                                       F.lit(False)))
        else:
            pred = F.exists(norm.col(F.col(spec.column)), fanned)
    elif isinstance(dtype, T.ArrayType):
        pred = F.exists(F.col(spec.column), leaf)
    else:
        pred = leaf(F.col(spec.column))

    # Tokenized zones (a companion {field}_tf offset map exists): a term
    # also matches by TOKEN membership — the reference's content fields
    # index their tokens (ContentIndexingColumnBasedHandler), so
    # BODY == 'quick' hits documents containing the token, not only an
    # exact full-value match.
    tf_spec = ctx.resolve(f"{name}_TF")
    if tf_spec is not None and isinstance(value, str) \
            and positive_op in ("==", "=~"):
        tf_col = F.col(tf_spec.column)
        if positive_op == "==":
            tok_pred = F.map_contains_key(tf_col, str(value).lower())
        else:
            pat = java_full_match(str(value))
            tok_pred = F.exists(F.map_keys(tf_col), lambda t: t.rlike(pat))
        pred = pred | tok_pred
    # Bare (non-total) when positive — NULL behaves as False under a
    # WHERE clause and the comparison stays pushdown-eligible.
    return ~_total(pred) if negate else pred


def compile_range(node: "RangeNode", ctx: CompileContext,
                  negated: bool = False) -> Column:
    """Bounded range (``((_Bounded_ = true) && (F >= lo && F <= hi))``)
    — SAME-VALUE semantics: true iff some ONE value of the field
    satisfies BOTH bounds (QueryPropertyMarker BOUNDED_RANGE; on a
    multi-valued field this is strictly narrower than the unmarked
    conjunction, whose any-value semantics lets different values
    satisfy each bound — lucene-referee r8)."""
    name = node.field.name.upper().lstrip("$")
    if name in ctx.model:
        # model alias: OR of per-member bounded ranges (QueryModel
        # expansion; same-value holds within each member —
        # FunctionalSetTest's '10 <= AG && AG <= 18' reaches here via
        # the planner's mark_bounded_ranges)
        child_ctx = CompileContext(
            schema=ctx.schema, fields=ctx.fields, anyfield=ctx.anyfield,
            model={k: v for k, v in ctx.model.items() if k != name})
        out = None
        for member in ctx.model[name]:
            p = compile_range(
                RangeNode(Identifier(member), node.lo_op, node.lo,
                          node.hi_op, node.hi), child_ctx)
            out = p if out is None else out | p
        return ~_total(out) if negated else out
    spec = ctx.resolve(name)
    if spec is None:
        return F.lit(negated)
    norm = get_normalizer(spec.normalizer)
    dtype = ctx.spark_type(spec)
    elem_type = _element_type(dtype)
    bvals = (node.lo.value, node.hi.value)
    if isinstance(elem_type, T.StringType) and norm.name == "noop" \
            and any(isinstance(b, (int, float)) and not isinstance(b, bool)
                    for b in bvals):
        # JexlArithmetic numeric coercion, same-value across BOTH
        # bounds (the compile_cmp branch, mirrored — without it the
        # string-vs-number comparison ANSI-aborts on the first
        # non-numeric stored value; compiler-referee r8)
        try:
            lo_f, hi_f = (F.lit(float(b)) for b in bvals)
        except (TypeError, ValueError):
            return F.lit(negated)     # mixed bound fails coercion

        def leaf(c: Column) -> Column:
            cc = c if spec.normalized_at_rest else norm.col(c)
            d = cc.try_cast("double")
            return (_scalar_cmp(node.lo_op, d, lo_f, T.DoubleType(),
                                norm, True)
                    & _scalar_cmp(node.hi_op, d, hi_f, T.DoubleType(),
                                  norm, True))
    else:
        try:
            lo = _typed_literal(node.lo.value, norm, elem_type)
            hi = _typed_literal(node.hi.value, norm, elem_type)
        except (ValueError, TypeError):
            # a bound fails the field's type normalization: the range
            # cannot match (the compile_cmp cannot-match stance)
            return F.lit(negated)

        def leaf(c: Column) -> Column:
            return (_scalar_cmp(node.lo_op, c, lo, elem_type, norm,
                                spec.normalized_at_rest)
                    & _scalar_cmp(node.hi_op, c, hi, elem_type, norm,
                                  spec.normalized_at_rest))

    one_many = norm.one_to_many and not spec.normalized_at_rest
    if one_many:
        def fanned(e: Column) -> Column:
            return (_scalar_cmp(node.lo_op, e, lo, elem_type, norm, True)
                    & _scalar_cmp(node.hi_op, e, hi, elem_type, norm, True))
        if isinstance(dtype, T.ArrayType):
            pred = F.exists(
                F.col(spec.column),
                lambda raw: F.coalesce(F.exists(norm.col(raw), fanned),
                                       F.lit(False)))
        else:
            pred = F.exists(norm.col(F.col(spec.column)), fanned)
    elif isinstance(dtype, T.ArrayType):
        pred = F.exists(F.col(spec.column), leaf)
    else:
        pred = leaf(F.col(spec.column))
    return ~_total(pred) if negated else pred


def _compile_anyfield(node: CmpNode, ctx: CompileContext,
                      negated: bool = False) -> Column:
    """_ANYFIELD_ expansion over ALL schema fields — per field, the
    literal normalizes under THAT field's type, and a failed
    normalization drops only that branch (compile_cmp's cannot-match
    stance, ExpandMultiNormalizedTerms parity).  r8 fix: the old
    literal-spelling filter (numeric literal → numeric fields only)
    meant an unfielded '5.0' never reached a double column, and an
    unfielded numeric never reached the string columns the reference
    would match via normalization."""
    preds = []
    for fname, spec in ctx.fields.items():
        if ctx.anyfield is not None and fname not in ctx.anyfield:
            continue
        positive_op = ("==" if node.op in ("==", "!=")
                       else "=~" if node.op in ("=~", "!~") else node.op)
        preds.append(compile_cmp(CmpNode(positive_op, Identifier(fname),
                                         node.value), ctx))
    negate = negated ^ (node.op in ("!=", "!~"))
    if not preds:
        return F.lit(negate)
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return ~_total(out) if negate else out


def compile_field_cmp(node: FieldCmpNode, ctx: CompileContext,
                      negated: bool = False) -> Column:
    neg = negated ^ (node.op == "!=")
    lspec, rspec = ctx.resolve(node.left.name), ctx.resolve(node.right.name)
    if lspec is None or rspec is None:
        return F.lit(neg)
    lt, rt = ctx.spark_type(lspec), ctx.spark_type(rspec)
    lcol, rcol = F.col(lspec.column), F.col(rspec.column)

    def pair(op: str, a: Column, b: Column) -> Column:
        return {"==": a == b, "<": a < b, ">": a > b,
                "<=": a <= b, ">=": a >= b}[op]

    pop = "==" if node.op == "!=" else node.op
    if isinstance(lt, T.ArrayType) and isinstance(rt, T.ArrayType):
        pred = F.exists(lcol, lambda x: F.exists(rcol, lambda y: pair(pop, x, y)))
    elif isinstance(lt, T.ArrayType):
        pred = F.exists(lcol, lambda x: pair(pop, x, rcol))
    elif isinstance(rt, T.ArrayType):
        pred = F.exists(rcol, lambda y: pair(pop, lcol, y))
    else:
        pred = pair(pop, lcol, rcol)
    return ~_total(pred) if neg else pred


def _compile_arith_expr(node: JexlNode, ctx: CompileContext) -> Column:
    """Arithmetic operand tree → Column (JexlArithmetic surface).
    Identifiers resolve to scalar columns; multi-valued (array) fields
    are rejected — the any-value×any-value arithmetic product the
    reference's DatawaveArithmetic could express is out of surface."""
    if isinstance(node, Literal):
        return F.lit(node.value)
    if isinstance(node, Identifier):
        spec = ctx.resolve(node.name)
        if spec is None:
            return F.lit(None)
        if isinstance(ctx.spark_type(spec), T.ArrayType):
            raise ValueError(
                f"arithmetic over multi-valued field {node.name}")
        return F.col(spec.column)
    if isinstance(node, ArithNode):
        a = _compile_arith_expr(node.left, ctx)
        b = _compile_arith_expr(node.right, ctx)
        return {"+": a + b, "-": a - b, "*": a * b,
                "/": a / b, "%": a % b}[node.op]
    if isinstance(node, FuncNode):
        # value-returning JEXL functions as comparison/arithmetic
        # operands: filter:getTime(F) > 1700000000000,
        # filter:getMaxValue(F) >= filter:getMinValue(G)
        key = (node.namespace, node.name)
        if key not in FUNCTION_COMPILERS:
            raise ValueError(
                f"unknown function {node.namespace}:{node.name}")
        return FUNCTION_COMPILERS[key](ctx, node.args)
    if isinstance(node, MethodNode):
        # FunctionalSet methods as operands: AG.min() > 10,
        # DEATH_DATE.max() - BIRTH_DATE.min() > ms
        from datawave_spark.functions.functional_set import method_value
        mv = method_value(node, ctx)
        if mv.is_set:
            raise ValueError(
                f"set-valued method .{node.name}() used as a scalar — "
                f"compare its .size() / .isEmpty()")
        return mv.col
    raise TypeError(f"cannot compile arithmetic operand {node!r}")


def _collect_aliases(node, ctx: CompileContext, acc: set) -> None:
    if isinstance(node, Identifier) and "||" not in node.name \
            and node.name.upper() in ctx.model:
        acc.add(node.name.upper().lstrip("$"))
    for c in node.children():
        _collect_aliases(c, ctx, acc)


def _substitute_fields(node, mapping: dict):
    """Rewrite alias Identifiers to one concrete member (QueryModel
    cartesian expansion of a binary node,
    QueryModelVisitor.expandBinaryNodeFromModel:309)."""
    if isinstance(node, Identifier):
        return Identifier(mapping.get(node.name.upper().lstrip("$"),
                                      node.name))
    if isinstance(node, MethodNode):
        return MethodNode(_substitute_fields(node.target, mapping),
                          node.name,
                          tuple(_substitute_fields(a, mapping)
                                for a in node.args))
    if isinstance(node, FuncNode):
        return FuncNode(node.namespace, node.name,
                        tuple(_substitute_fields(a, mapping)
                              for a in node.args))
    if isinstance(node, ArithNode):
        return ArithNode(node.op, _substitute_fields(node.left, mapping),
                         _substitute_fields(node.right, mapping))
    if isinstance(node, ArithCmpNode):
        return ArithCmpNode(node.op, _substitute_fields(node.left, mapping),
                            _substitute_fields(node.right, mapping))
    return node


def _is_datems_expr(node, ctx: CompileContext) -> bool:
    """True when the expression yields epoch-millis from date parsing —
    the cue to parse a STRING comparison literal as a date
    (FunctionalSetTest: BIRTH_DATE.min() < '1920-12-28T00:00:05.000Z'
    and the compact '20160301120000' form — lexicographic string
    comparison would mis-order mixed formats)."""
    if isinstance(node, FuncNode):
        return (node.namespace, node.name) in {
            ("filter", "getMaxTime"), ("filter", "getMinTime"),
            ("filter", "getTime")}
    if isinstance(node, MethodNode) and node.name in ("min", "max"):
        from datawave_spark.functions.functional_set import target_kind
        return target_kind(node.target, ctx) == "date"
    return False


def compile_arith_cmp(node: ArithCmpNode, ctx: CompileContext,
                      negated: bool = False) -> Column:
    """``expr op expr`` where a side carries arithmetic: native Column
    arithmetic + comparison (floating semantics; NULL operands make the
    comparison NULL, totalized like every other leaf).  Model aliases
    anywhere in the expression expand by cartesian product into an OR
    of concrete-field comparisons ('AG.min() > 10' → 'AGE.min() > 10 ||
    ETA.min() > 10'; '!=' combines with AND — QueryModelVisitor's
    requiresAnd), exactly expandBinaryNodeFromModel:309-351."""
    aliases: set = set()
    _collect_aliases(node, ctx, aliases)
    if aliases:
        import itertools
        names = sorted(aliases)
        child = CompileContext(
            schema=ctx.schema, fields=ctx.fields, anyfield=ctx.anyfield,
            model={k: v for k, v in ctx.model.items() if k not in aliases})
        requires_and = node.op == "!="
        out = None
        for combo in itertools.product(*(ctx.model[a] for a in names)):
            variant = _substitute_fields(node, dict(zip(names, combo)))
            p = compile_arith_cmp(variant, child, False)
            if out is None:
                out = p
            elif requires_and:
                out = out & p
            else:
                out = out | p
        return ~_total(out) if negated else out
    # date-valued side vs string literal: parse the literal with the
    # reference's known-format chain (driver-side, plan-time)
    left, right = node.left, node.right
    for a_side, b_side in ((left, right), (right, left)):
        if isinstance(b_side, Literal) and isinstance(b_side.value, str) \
                and _is_datems_expr(a_side, ctx):
            import datetime as _dt
            from datawave_spark.functions.filter_functions import (
                _parse_date_literal)
            parsed, _g = _parse_date_literal(b_side.value, None)
            ms = int((parsed - _dt.datetime(1970, 1, 1))
                     .total_seconds() * 1000)
            repl = Literal(ms)
            left = repl if b_side is left else left
            right = repl if b_side is right else right
    node = ArithCmpNode(node.op, left, right)

    def _side(n):
        """→ (Column, is_set): SET-valued sides (set-returning methods;
        bare multi-valued fields in a method comparison —
        'AG.getValuesForGroups(...) == MAGIC') compare with ANY-element
        semantics, the DatawaveArithmetic collection contract."""
        if isinstance(n, MethodNode):
            from datawave_spark.functions.functional_set import method_value
            mv = method_value(n, ctx)
            return mv.col, mv.is_set
        if isinstance(n, Identifier):
            spec = ctx.resolve(n.name)
            if spec is not None and isinstance(ctx.spark_type(spec),
                                               T.ArrayType):
                return F.col(spec.column), True
        return _compile_arith_expr(n, ctx), False

    a, a_set = _side(node.left)
    b, b_set = _side(node.right)

    def cmp(x, y):
        return {"==": x == y, "!=": x != y, "<": x < y, ">": x > y,
                "<=": x <= y, ">=": x >= y}[node.op]

    if a_set or b_set:
        def any_match(op_fn):
            if a_set and b_set:
                return F.exists(a, lambda x: F.exists(b,
                                                      lambda y: op_fn(x, y)))
            if a_set:
                return F.exists(a, lambda x: op_fn(x, b))
            return F.exists(b, lambda y: op_fn(a, y))

        if node.op == "!=":
            # JEXL ne = !(equals); set equals = ANY element equals — so
            # set != x is NO-element-equals, not any-element-differs
            # (review r9; mirrors the scalar total-negation branch)
            eq = any_match(lambda x, y: x == y)
            return _total(eq) if negated else ~_total(eq)
        pred = any_match(cmp)
        return ~_total(pred) if negated else pred
    if node.op == "!=":
        # total-negation semantics, same as CmpNode '!=': a NULL
        # operand (missing field) satisfies the inequality
        eq = a == b
        return _total(eq) if negated else ~_total(eq)
    pred = cmp(a, b)
    return ~_total(pred) if negated else pred


def _expand_field_arg(ctx: CompileContext, field_name: str) -> list[str]:
    """Resolve a function field argument to concrete field names:
    ``F1||F2`` union syntax (the reference's multi-field form,
    CompositeFunctionsTest.testNulls) and query-model aliases
    (QueryModelVisitor — filter function args model-expand,
    ``filter:matchesAtLeastCountOf(3, NAM, ...)``) both yield the UNION
    of their members' value sets."""
    out: list[str] = []
    for part in str(field_name).split("||"):
        if part.upper().lstrip("$") in ANYFIELD_NAMES:
            # _ANYFIELD_ as a FUNCTION argument sweeps the expansion
            # set like an unfielded term does
            # (FilterFieldsQueryTest.testAnyFieldFilterIncludeRegex:
            # 'filter:includeRegex(_ANYFIELD_, ...)')
            out.extend(sorted(ctx.anyfield if ctx.anyfield is not None
                              else ctx.fields))
            continue
        out.extend(ctx.model.get(part.upper(), [part]))
    return out


def field_pred(ctx: CompileContext, field_name: str,
               leaf: Callable[[Column], Column],
               *, negate: bool = False) -> Column:
    """Build a total ANY-value predicate over a (possibly multi-valued)
    field — the shared helper for the filter:/f:/geo: function families.
    ``leaf`` receives one scalar value column.  Union / model-alias
    arguments predicate over ANY member's values (the reference's OR
    expansion)."""
    preds = []
    for name in _expand_field_arg(ctx, field_name):
        spec = ctx.resolve(name)
        if spec is None:
            continue
        dtype = ctx.spark_type(spec)
        if isinstance(dtype, T.ArrayType):
            preds.append(F.exists(F.col(spec.column), leaf))
        else:
            preds.append(leaf(F.col(spec.column)))
    if not preds:
        pred = _false()
    else:
        pred = preds[0]
        for p in preds[1:]:
            pred = pred | p
        pred = _total(pred)
    return ~pred if negate else pred


_NUMERIC_TYPES = (T.DoubleType, T.FloatType, T.DecimalType, T.LongType,
                  T.IntegerType, T.ShortType)


def raw_match_string(c: Column, elem_dtype) -> Column:
    """A value's string form FOR REGEX MATCHING: whole doubles render
    Java-style without the trailing '.0' — the reference matches
    patterns against the tuple's value ('110' must match a numeric 110,
    MatchRegexTest.testStandardQueryWithNumeric; same rule as
    functional_set._raw_str / grouping._elem_matches)."""
    s = c.cast("string")
    if isinstance(elem_dtype, _NUMERIC_TYPES):
        return F.regexp_replace(s, r"\.0$", "")
    return s


def field_regex_pred(ctx: CompileContext, field_name: str,
                     pattern: str, *, negate: bool = False) -> Column:
    """field_pred specialized to regex matching — the leaf sees the
    numeric-aware raw string form of each value."""
    preds = []
    for name in _expand_field_arg(ctx, field_name):
        spec = ctx.resolve(name)
        if spec is None:
            continue
        dtype = ctx.spark_type(spec)
        et = _element_type(dtype)
        if isinstance(dtype, T.ArrayType):
            def mk_leaf(_et):
                # PySpark lambda arity counts DEFAULT args — close over
                # the element type instead
                return lambda v: raw_match_string(v, _et).rlike(pattern)
            preds.append(F.exists(F.col(spec.column), mk_leaf(et)))
        else:
            preds.append(
                raw_match_string(F.col(spec.column), et).rlike(pattern))
    if not preds:
        pred = _false()
    else:
        pred = preds[0]
        for p in preds[1:]:
            pred = pred | p
        pred = _total(pred)
    return ~pred if negate else pred


def field_values(ctx: CompileContext, field_name: str) -> Column:
    """The field's values as an array column (scalar fields wrap to a
    0/1-element array) — for count/aggregate-style functions.  Union
    (``F1||F2``) / model-alias arguments concatenate their members'
    values: ``filter:isNull(UUID||NULL1)`` is false because the union
    holds UUID's values (CompositeFunctionsTest.testNulls), and
    isNotNull over the same union is true — one value-set semantics
    covers both directions."""
    arrs = []
    for name in _expand_field_arg(ctx, field_name):
        spec = ctx.resolve(name)
        if spec is None:
            continue
        dtype = ctx.spark_type(spec)
        col = F.col(spec.column)
        if isinstance(dtype, T.ArrayType):
            arrs.append(F.coalesce(col, F.array()))
        else:
            arrs.append(F.filter(F.array(col), lambda v: v.isNotNull()))
    if not arrs:
        return F.array()
    out = arrs[0]
    for a in arrs[1:]:
        out = F.concat(out, a)
    return out


def compile_node(node: JexlNode, ctx: CompileContext,
                 negated: bool = False) -> Column:
    """Compile with negation pushed down to the leaves (De Morgan), so
    positive comparisons stay bare (pushdown-eligible) and only negated
    leaves pay the coalesce() totalization."""
    if isinstance(node, AndNode):
        combine = Column.__or__ if negated else Column.__and__
        out = compile_node(node.terms[0], ctx, negated)
        for t in node.terms[1:]:
            out = combine(out, compile_node(t, ctx, negated))
        return out
    if isinstance(node, OrNode):
        combine = Column.__and__ if negated else Column.__or__
        out = compile_node(node.terms[0], ctx, negated)
        for t in node.terms[1:]:
            out = combine(out, compile_node(t, ctx, negated))
        return out
    if isinstance(node, NotNode):
        return compile_node(node.term, ctx, not negated)
    if isinstance(node, CmpNode):
        return compile_cmp(node, ctx, negated)
    if isinstance(node, RangeNode):
        return compile_range(node, ctx, negated)
    if isinstance(node, MarkerNode):
        # an unresolved QueryPropertyMarker assignment evaluates true
        return F.lit(not negated)
    if isinstance(node, FieldCmpNode):
        return compile_field_cmp(node, ctx, negated)
    if isinstance(node, ArithCmpNode):
        return compile_arith_cmp(node, ctx, negated)
    if isinstance(node, FuncNode):
        key = (node.namespace, node.name)
        if key not in FUNCTION_COMPILERS:
            raise ValueError(f"unknown function {node.namespace}:{node.name}")
        pred = FUNCTION_COMPILERS[key](ctx, node.args)
        # Function compilers return total predicates (they coalesce
        # internally), so direct negation is safe.
        return ~pred if negated else pred
    if isinstance(node, MethodNode):
        # a bare boolean method term (X.isEmpty()); scalar/set-valued
        # methods must open a comparison instead
        from datawave_spark.functions.functional_set import method_value
        mv = method_value(node, ctx)
        if mv.kind == "bool" and not mv.is_set:
            return ~_total(mv.col) if negated else _total(mv.col)
        raise TypeError(
            f"method .{node.name}() is not a boolean predicate — "
            f"compare its value")
    if isinstance(node, Literal) and isinstance(node.value, bool):
        return F.lit(node.value ^ negated)
    raise TypeError(f"cannot compile node {node!r}")


def compile_query(df: DataFrame, query, *,
                  field_types: dict[str, str] | None = None,
                  model: dict[str, list[str]] | None = None,
                  at_rest: set[str] | list[str] | None = None,
                  anyfield: set[str] | list[str] | None = None) -> DataFrame:
    """Parse (if needed) and apply a JEXL query to a DataFrame.
    ``at_rest`` names typed fields whose stored values are already
    normalized (ingest-time normalization) — their predicates compile
    to bare pushable comparisons."""
    from datawave_spark.jexl.parser import parse
    # Importing registers the filter:/f:/content:/geo:/grouping: compilers.
    import datawave_spark.functions  # noqa: F401
    node = parse(query) if isinstance(query, str) else query
    ctx = CompileContext.for_dataframe(df, field_types=field_types,
                                       model=model, at_rest=at_rest,
                                       anyfield=anyfield)
    return df.filter(compile_node(node, ctx))
