"""``grouping:`` namespace — grouping-context (sibling-group) matching.

Reference: warehouse/query-core/src/main/java/datawave/query/jexl/
functions/GroupingRequiredFilterFunctions.java —
``matchesInGroup:163``, ``matchesInGroupLeft:251``,
``getGroupsForMatchesInGroup:45``, ``atomValuesMatch:352``.

DataWave encodes nested-record siblings with flat field names
``FIELD.context.instance`` (SimpleGroupFieldNameParser) and these
functions re-associate values that came from the SAME sibling group.
Spark has the natural representation DataWave lacks: an
``array<struct<...>>`` column where each struct IS one sibling group.
``grouping:matchesInGroup(F1, v1, F2, v2)`` therefore compiles to one
``EXISTS`` over the struct array: some group has F1==v1 AND F2==v2.

Resolution: the compiler scans the schema for ArrayType(StructType)
columns whose struct fields (case-insensitive) cover all referenced
field names.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from datawave_spark.compiler.columns import (
    CompileContext, java_full_match, register_function,
)
from datawave_spark.jexl.ast import Identifier, Literal


def _find_group_column(ctx: CompileContext, names: list[str]) -> tuple[str, dict[str, str]] | None:
    """Find the array<struct> column containing all ``names`` as struct
    fields; returns (column, upper-name → struct-field map), or None —
    callers fall back to the PARALLEL-ARRAY representation (the
    reference's WiseGuys style: NAME.i / GENDER.i / AGE.i land as
    top-level arrays whose shared index IS the sibling group)."""
    wanted = {n.upper() for n in names}
    for f in ctx.schema.fields:
        if isinstance(f.dataType, T.ArrayType) and \
                isinstance(f.dataType.elementType, T.StructType):
            have = {sf.name.upper(): sf.name for sf in f.dataType.elementType.fields}
            if wanted <= set(have):
                return f.name, have
    return None


def _elem_matches(ctx: CompileContext, member: str, elem, value) -> "F.Column":
    """One group member's element vs a matchesInGroup VALUE arg — a
    REGEX through includeRegex's flags
    (GroupingRequiredFilterFunctions:163 → EvaluationPhaseFilter
    Functions.includeRegex); numeric-typed members compare the regex's
    numeric reading when it has one (the Java matches the tuple's
    normalized form — '30' must match a stored 30.0)."""
    spec = ctx.resolve(member)
    et = None
    if spec is not None:
        dt = ctx.spark_type(spec)
        et = dt.elementType if isinstance(dt, T.ArrayType) else dt
    if isinstance(et, (T.DoubleType, T.FloatType, T.LongType,
                       T.IntegerType, T.ShortType, T.DecimalType)):
        try:
            return elem.try_cast("double") == float(str(value))
        except (TypeError, ValueError):
            pass
        # regex arg over a numeric member: match against the NORMALIZED
        # string form ('30', not the double-render '30.0') — the Java
        # matches the tuple's normalized value
        return F.regexp_replace(elem.cast("string"), r"\.0$", "") \
            .rlike(java_full_match(str(value)))
    return elem.cast("string").rlike(java_full_match(str(value)))


def matching_indices_parallel(ctx: CompileContext,
                              pairs: list[tuple[str, object]]):
    """Sibling indices where every (FIELD, value) pair matches, over
    PARALLEL top-level arrays — model aliases expand by cartesian
    member combination (NAME↔GENDER vs NOME↔GENERE families), indices
    unioned across combos.  → array<int> Column."""
    import itertools
    from datawave_spark.compiler.columns import _expand_field_arg
    combos = itertools.product(
        *[_expand_field_arg(ctx, f) for f, _ in pairs])
    out = None
    for combo in combos:
        specs = [ctx.resolve(m) for m in combo]
        if any(s is None for s in specs):
            continue
        cols = [F.col(s.column) for s in specs]
        sizes = [
            F.coalesce(F.size(c), F.lit(0))
            if isinstance(ctx.spark_type(s), T.ArrayType)
            else F.when(c.isNotNull(), F.lit(1)).otherwise(F.lit(0))
            for s, c in zip(specs, cols)]
        max_size = sizes[0]
        for sz in sizes[1:]:
            max_size = F.greatest(max_size, sz)

        def elem_at(spec, col, i):
            if isinstance(ctx.spark_type(spec), T.ArrayType):
                return F.try_element_at(col, i + 1)
            return F.when(i == 0, col)

        def pred(i):
            p = None
            for (member, (_f, value)), spec, col in zip(
                    zip(combo, pairs), specs, cols):
                this = F.coalesce(
                    _elem_matches(ctx, member, elem_at(spec, col, i),
                                  value), F.lit(False))
                p = this if p is None else p & this
            return p

        idxs = F.when(
            max_size > 0,
            F.filter(F.sequence(F.lit(0), max_size - 1), pred)) \
            .otherwise(F.array().cast("array<int>"))
        out = idxs if out is None else F.array_distinct(
            F.concat(out, idxs))
    if out is None:
        return F.array().cast("array<int>")
    return out



def _struct_field_type(ctx: CompileContext, col_name: str, sf: str):
    for f in ctx.schema.fields:
        if f.name == col_name:
            for sub in f.dataType.elementType.fields:
                if sub.name == sf:
                    return sub.dataType
    return None


_NUM_TYPES = (T.DoubleType, T.FloatType, T.LongType, T.IntegerType,
              T.ShortType, T.DecimalType)


def _struct_matches(ctx: CompileContext, col_name: str, sf: str, g, value):
    """One struct group's member vs a matchesInGroup VALUE arg — same
    contract as ``_elem_matches`` (regex with includeRegex flags;
    numeric members compare the value's numeric reading), extended to
    ARRAY struct members (a sibling context can hold several values of
    one field — the reference's multimap matches ANY of them)."""
    dt = _struct_field_type(ctx, col_name, sf)
    elem_dt = dt.elementType if isinstance(dt, T.ArrayType) else dt

    def one(e):
        if isinstance(elem_dt, _NUM_TYPES):
            try:
                return e.try_cast("double") == float(str(value))
            except (TypeError, ValueError):
                pass
            return F.regexp_replace(e.cast("string"), r"\.0$", "") \
                .rlike(java_full_match(str(value)))
        return e.cast("string").rlike(java_full_match(str(value)))

    field = g.getField(sf)
    if isinstance(dt, T.ArrayType):
        return F.coalesce(F.exists(field, one), F.lit(False))
    return one(field)


def _pairs(args) -> list[tuple[str, object]]:
    """(FIELD, value, FIELD, value, ...) → [(name, value), ...].
    A trailing integer arg (group index) is accepted and ignored for the
    boolean form, as in the reference's matchesInGroup overloads."""
    flat = list(args)
    if len(flat) % 2 == 1 and isinstance(flat[-1], Literal) \
            and isinstance(flat[-1].value, int):
        flat = flat[:-1]
    out = []
    for i in range(0, len(flat), 2):
        fld = flat[i]
        val = flat[i + 1]
        assert isinstance(fld, Identifier), f"expected field, got {fld}"
        v = val.value if isinstance(val, Literal) else val.name
        out.append((fld.name, v))
    return out


@register_function("grouping", "matchesInGroup")
def g_matches_in_group(ctx: CompileContext, args):
    """GroupingRequiredFilterFunctions.matchesInGroup:163 — true iff some
    sibling group satisfies every (FIELD, value) pair.  Each value arg
    is a REGEX in the reference (matched per group member through
    includeRegex, i.e. JexlPatternCache's CASE_INSENSITIVE | DOTALL
    full match) — a plain literal behaves as case-insensitive equality,
    but metacharacters are live ('9.5' matches '905'), exactly the
    Java.  Groups are an ``array<struct>`` column when one covers the
    fields, else PARALLEL top-level arrays sharing an index
    (FunctionalSetTest's 'grouping:matchesInGroup(NAM, 'ALPHONSE',
    GEN, 'MALE', AG, 30)' shape)."""
    pairs = _pairs(args)
    found = _find_group_column(ctx, [p[0] for p in pairs])
    if found is None:
        idxs = matching_indices_parallel(ctx, pairs)
        return F.coalesce(F.size(idxs) > 0, F.lit(False))
    col_name, field_map = found

    def group_pred(g):
        pred = None
        for name, value in pairs:
            this = _struct_matches(ctx, col_name, field_map[name.upper()],
                                   g, value)
            pred = this if pred is None else pred & this
        return pred

    return F.coalesce(F.exists(F.col(col_name), group_pred), F.lit(False))


def matching_indices_for(ctx: CompileContext, func_node) -> F.Column:
    """Matching sibling indices for a
    ``grouping:getGroupsForMatchesInGroup(...)`` call used in VALUE
    position (FunctionalSet.getValuesForGroups:260 consumes the group
    list) — array<int> over either group representation."""
    pairs = _pairs(func_node.args)
    found = _find_group_column(ctx, [p[0] for p in pairs])
    if found is None:
        return matching_indices_parallel(ctx, pairs)
    col_name, field_map = found
    col = F.col(col_name)

    def pred(g):
        p = None
        for name, value in pairs:
            this = _struct_matches(ctx, col_name, field_map[name.upper()],
                                   g, value)
            p = this if p is None else p & this
        return p

    return F.when(
        F.size(col) > 0,
        F.filter(F.sequence(F.lit(0), F.size(col) - 1),
                 lambda i: F.coalesce(pred(F.element_at(col, i + 1)),
                                      F.lit(False)))) \
        .otherwise(F.array().cast("array<int>"))


@register_function("grouping", "matchesInGroupLeft")
def g_matches_in_group_left(ctx: CompileContext, args):
    """GroupingRequiredFilterFunctions.matchesInGroupLeft:251 — same-group
    matching anchored at the left (parent) context level.  With groups
    modeled as one struct per sibling, left-anchoring coincides with
    matchesInGroup."""
    return g_matches_in_group(ctx, args)


@register_function("grouping", "getGroupsForMatchesInGroup")
def g_get_groups_for_matches(ctx: CompileContext, args):
    """GroupingRequiredFilterFunctions.getGroupsForMatchesInGroup:45 —
    returns the grouping contexts whose group satisfies every pair; in
    a predicate position a JEXL collection is truthy iff non-empty, so
    the boolean compilation coincides with matchesInGroup.  Use
    ``matching_group_indices`` to materialize the matched groups
    themselves as a column (the value form the reference feeds to
    hit-term attribution)."""
    return g_matches_in_group(ctx, args)


def matching_group_indices(df, pairs: list[tuple[str, object]],
                           out_col: str = "matching_groups"):
    """Attach ``out_col``: array of indices of sibling groups matching
    every (FIELD, value) pair — the value form of
    getGroupsForMatchesInGroup (the index is the 'instance' part of the
    reference's FIELD.context.instance naming)."""
    ctx = CompileContext.for_dataframe(df)
    found = _find_group_column(ctx, [p[0] for p in pairs])
    if found is None:
        raise ValueError(
            f"no array<struct> group column covers fields "
            f"{sorted(p[0].upper() for p in pairs)}")
    col_name, field_map = found
    col = F.col(col_name)

    def pred(g):
        p = None
        for name, value in pairs:
            sf = field_map[name.upper()]
            this = g.getField(sf).cast("string").rlike(
                java_full_match(str(value)))
            p = this if p is None else p & this
        return p

    idxs = F.when(
        F.size(col) > 0,
        F.filter(F.sequence(F.lit(0), F.size(col) - 1),
                 lambda i: F.coalesce(pred(F.element_at(col, i + 1)),
                                      F.lit(False)))) \
        .otherwise(F.array().cast("array<int>"))
    return df.withColumn(out_col, idxs)


@register_function("grouping", "atomValuesMatch")
def g_atom_values_match(ctx: CompileContext, args):
    """GroupingRequiredFilterFunctions.atomValuesMatch:352 — two fields
    share at least one value within the same group (struct groups or
    parallel top-level arrays, index-wise)."""
    f1, f2 = args[0].name, args[1].name
    found = _find_group_column(ctx, [f1, f2])
    if found is None:
        # parallel-array groups: same index, case-folded equality
        import itertools
        from datawave_spark.compiler.columns import _expand_field_arg
        out = None
        for m1, m2 in itertools.product(_expand_field_arg(ctx, f1),
                                        _expand_field_arg(ctx, f2)):
            s1, s2 = ctx.resolve(m1), ctx.resolve(m2)
            if s1 is None or s2 is None:
                continue
            c1, c2 = F.col(s1.column), F.col(s2.column)
            a1 = c1 if isinstance(ctx.spark_type(s1), T.ArrayType) \
                else F.array(c1)
            a2 = c2 if isinstance(ctx.spark_type(s2), T.ArrayType) \
                else F.array(c2)
            p = F.exists(
                F.zip_with(a1, a2,
                           lambda x, y: F.lower(x.cast("string"))
                           == F.lower(y.cast("string"))),
                lambda b: b)
            out = p if out is None else out | p
        return F.coalesce(out, F.lit(False)) if out is not None \
            else F.lit(False)
    col_name, field_map = found
    s1, s2 = field_map[f1.upper()], field_map[f2.upper()]
    return F.coalesce(
        F.exists(F.col(col_name),
                 lambda g: F.lower(g.getField(s1).cast("string"))
                 == F.lower(g.getField(s2).cast("string"))),
        F.lit(False))
