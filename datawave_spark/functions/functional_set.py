"""FunctionalSet method-call compilation.

Reference: warehouse/query-core/src/main/java/datawave/query/
collections/FunctionalSet.java — ``size:61``, ``isEmpty:66``,
``max:232``, ``min:246`` (extremes over the tuples' NORMALIZED values,
elements that fail comparison skipped), ``compareWith:362`` (normalize
the reference literal through the ELEMENT's type, keep matching
tuples), ``lessThan:382``, ``greaterThan:386``.  A field reference in
JEXL binds to the FunctionalSet of its value tuples, so
``AG.min() > 10`` / ``AG.greaterThan(39).size() >= 1`` are the
reference's idiomatic set comparisons (FunctionalSetTest.java).

Spark restatement: the target's values become ONE array column whose
elements are already in comparable (normalized) form — double for
number-typed fields, epoch-millis long for date-typed, normalizer
output for strings — and every method is a higher-order column
function over it (zero shuffle, codegen'd).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

from datawave_spark.jexl.ast import FuncNode, Identifier, MethodNode


@dataclass
class MethodValue:
    """A compiled method result: a scalar Column (``is_set=False``) or
    an array Column of remaining values (``is_set=True``); ``kind``
    names the element/value domain."""
    col: Column
    kind: str          # 'number' | 'date' | 'string' | 'bool'
    is_set: bool


_DATE_NORMS = {"date"}
_NUM_NORMS = {"number"}


def target_kind(node, ctx) -> str:
    """Element domain of a method target's value set."""
    if isinstance(node, MethodNode):
        from datawave_spark.compiler.columns import CompileContext  # noqa: F401
        return target_kind(node.target, ctx)
    if isinstance(node, FuncNode):
        # getAllMatches(FIELD, regex) — the set keeps FIELD's domain
        return _field_kind(ctx, node.args[0].name) if node.args else "string"
    if isinstance(node, Identifier):
        return _field_kind(ctx, node.name)
    return "string"


def _field_kind(ctx, name: str) -> str:
    """Kind of the FIRST resolvable member (union parts / model members
    share a domain in any sane schema — the reference compares
    normalized values, which presumes the same)."""
    for part in str(name).split("||"):
        for member in ctx.model.get(part.upper(), [part]):
            spec = ctx.resolve(member)
            if spec is None:
                continue
            dt = ctx.spark_type(spec)
            et = dt.elementType if isinstance(dt, T.ArrayType) else dt
            if isinstance(et, (T.TimestampType, T.TimestampNTZType,
                               T.DateType)):
                return "date"
            if isinstance(et, (T.DoubleType, T.FloatType, T.DecimalType,
                               T.LongType, T.IntegerType, T.ShortType)):
                return "number"
            norm = getattr(spec, "normalizer", None) or "noop"
            if norm in _NUM_NORMS:
                return "number"
            if norm in _DATE_NORMS:
                return "date"
            return "string"
    return "string"


def _comparable(vals: Column, kind: str, ctx, field_name: str | None) -> Column:
    """Transform raw values into the comparable domain; elements that
    fail the transform drop out (FunctionalSet.min/max skip elements
    that throw — :236,:250)."""
    if kind == "number":
        out = F.transform(vals, lambda v: v.try_cast("double"))
    elif kind == "date":
        from datawave_spark.functions.filter_functions import _ts
        out = F.transform(vals, lambda v: F.unix_millis(_ts(v, None)))
    else:
        if field_name is not None:
            from datawave_spark.normalizers import get_normalizer
            spec = ctx.resolve(field_name)
            norm = get_normalizer(spec.normalizer if spec else "noop")
            out = F.transform(vals, lambda v: norm.col(v.cast("string")))
        else:
            out = F.transform(vals, lambda v: v.cast("string"))
    return F.filter(out, lambda v: v.isNotNull())


def _raw_str(v: Column, kind: str) -> Column:
    """A value's RAW string form for regex matching — whole doubles
    render Java-style without the trailing '.0' (the reference matches
    getAllMatches regexes against the tuple's value: '16' must match a
    numeric 16)."""
    s = v.cast("string")
    if kind == "number":
        return F.regexp_replace(s, r"\.0$", "")
    return s


def _target_set(node, ctx) -> tuple[Column, str]:
    """→ (comparable values array, kind) for a method target."""
    from datawave_spark.compiler.columns import field_values, java_full_match
    if isinstance(node, Identifier):
        kind = _field_kind(ctx, node.name)
        parts = []
        for part in node.name.split("||"):
            for member in ctx.model.get(part.upper(), [part]):
                parts.append(_comparable(field_values(ctx, member), kind,
                                         ctx, member))
        out = parts[0] if parts else F.array()
        for p in parts[1:]:
            out = F.concat(out, p)
        return out, kind
    if isinstance(node, FuncNode):
        if (node.namespace, node.name) == ("filter", "getAllMatches"):
            # the SET form of getAllMatches:343 — values fully matching
            # the regex (JexlPatternCache flags), in FIELD's domain
            field = node.args[0].name
            kind = _field_kind(ctx, field)
            pattern = java_full_match(str(node.args[1].value))
            raw = F.filter(field_values(ctx, field),
                           lambda v: _raw_str(v, kind).rlike(pattern))
            return (_comparable(raw, kind, ctx, field.split("||")[0]),
                    kind)
        if (node.namespace, node.name) == ("filter", "includeRegex"):
            # includeRegex returns a SINGLETON set holding the FIRST
            # matching value (EvaluationPhaseFilterFunctions
            # .includeRegex:263 — CompositeFunctionsTest pins
            # '.size() == 1')
            field = node.args[0].name
            kind = _field_kind(ctx, field)
            pattern = java_full_match(str(node.args[1].value))
            raw = F.slice(
                F.filter(field_values(ctx, field),
                         lambda v: _raw_str(v, kind).rlike(pattern)), 1, 1)
            return (_comparable(raw, kind, ctx, field.split("||")[0]),
                    kind)
        raise ValueError(
            f"function {node.namespace}:{node.name} does not yield a "
            f"FunctionalSet (methods apply to fields / getAllMatches / "
            f"includeRegex)")
    if isinstance(node, MethodNode):
        mv = method_value(node, ctx)
        if not mv.is_set:
            raise ValueError(
                f"method .{node.name}() yields a scalar, not a set")
        return mv.col, mv.kind
    raise ValueError(f"unsupported FunctionalSet target {node!r}")


def _ref_literal(arg, kind: str):
    """compareWith:371 — normalize the reference literal through the
    element's type before comparing."""
    v = arg.value if hasattr(arg, "value") else str(arg)
    if kind == "number":
        return float(v)
    if kind == "date":
        import datetime as _d
        from datawave_spark.functions.filter_functions import (
            _parse_date_literal)
        dt, _ = _parse_date_literal(v, None)
        return int((dt - _d.datetime(1970, 1, 1)).total_seconds() * 1000)
    return str(v)


_CMP = {"==": lambda a, b: a == b, "=": lambda a, b: a == b,
        "!=": lambda a, b: a != b, "<": lambda a, b: a < b,
        ">": lambda a, b: a > b, "<=": lambda a, b: a <= b,
        ">=": lambda a, b: a >= b}


def method_value(node: MethodNode, ctx) -> MethodValue:
    """Compile one FunctionalSet method call."""
    name = node.name
    if name in ("size", "isEmpty", "min", "max"):
        vals, kind = _target_set(node.target, ctx)
        if name == "size":
            return MethodValue(F.size(vals), "number", False)
        if name == "isEmpty":
            return MethodValue(F.size(vals) == 0, "bool", False)
        agg = F.array_min if name == "min" else F.array_max
        return MethodValue(agg(vals), kind, False)
    if name in ("greaterThan", "lessThan", "compareWith"):
        vals, kind = _target_set(node.target, ctx)
        first = next(iter(_members_of(node.target)), None)
        arg0 = node.args[0]
        ref = _norm_literal(
            ctx, first, str(arg0.value if hasattr(arg0, "value")
                            else arg0), kind)
        if name == "compareWith":
            op = str(node.args[1].value)
            if op not in _CMP:
                raise ValueError(f"compareWith operator {op!r} not in "
                                 f"{sorted(_CMP)}")
            pred = _CMP[op]
        else:
            pred = _CMP[">"] if name == "greaterThan" else _CMP["<"]
        lit = F.lit(ref)
        return MethodValue(F.filter(vals, lambda v: pred(v, lit)),
                           kind, True)
    if name == "hashCode":
        # Java String.hashCode over the scalar value's string form
        # (h = 31*h + c, 32-bit wraparound) — FunctionalSetTest
        # .testConcatMethods asserts NAM.min().hashCode() != 0.  The
        # reference hashes the ValueTuple; any deterministic nonzero
        # hash of the same value satisfies the published assertions,
        # and String.hashCode is the natural Spark-expressible choice.
        from datawave_spark.functions.functional_set import method_value \
            as _mv  # noqa: F401 (self-import keeps mypy honest)
        inner = method_value(node.target, ctx) \
            if isinstance(node.target, MethodNode) else None
        if inner is None or inner.is_set:
            raise ValueError(".hashCode() applies to a scalar method "
                             "result (e.g. NAM.min())")
        s = inner.col.cast("string")
        chars = F.filter(F.split(s, ""), lambda c: c != "")
        h = F.aggregate(
            chars, F.lit(0).cast("long"),
            lambda a, c: F.pmod(a * 31 + F.ascii(c) + F.lit(2**31),
                                F.lit(2**32)) - F.lit(2**31))
        return MethodValue(h.cast("int"), "number", False)
    if name == "getValuesForGroups":
        # FunctionalSet.getValuesForGroups:260 — the target field's
        # values in the sibling groups named by the argument (a
        # grouping:getGroupsForMatchesInGroup call); parallel-array
        # groups share the index, so this is element_at over the
        # matching indices, unioned across the alias's members
        from datawave_spark.functions.grouping import matching_indices_for
        arg = node.args[0]
        if not (isinstance(arg, FuncNode) and arg.namespace == "grouping"):
            raise ValueError(
                "getValuesForGroups takes a grouping:* group source")
        idxs = matching_indices_for(ctx, arg)
        kind = target_kind(node.target, ctx)
        parts = []
        for part in _members_of(node.target):
            for member in ctx.model.get(part.upper(), [part]):
                spec = ctx.resolve(member)
                if spec is None:
                    continue
                col = F.col(spec.column)
                if isinstance(ctx.spark_type(spec), T.ArrayType):
                    picked = F.transform(
                        idxs, lambda i: F.try_element_at(col, i + 1))
                else:
                    picked = F.transform(
                        idxs, lambda i: F.when(i == 0, col))
                parts.append(_comparable(picked, kind, ctx, member))
        out = parts[0] if parts else F.array()
        for p in parts[1:]:
            out = F.concat(out, p)
        return MethodValue(out, kind, True)
    if name == "containsAll":
        # FunctionalSet.containsAll:119 — every element of the argument
        # set is in the target set (vacuously true on an empty arg, the
        # java.util contract)
        vals, _kind = _target_set(node.target, ctx)
        arg_set, _k2 = _target_set(node.args[0], ctx)
        pred = F.forall(arg_set, lambda y: F.array_contains(vals, y))
        return MethodValue(F.coalesce(pred, F.lit(False)), "bool", False)
    if name == "contains":
        # FunctionalSet.contains:71 — plain value membership — and the
        # tuple-string form 'FIELD.instance:value' (:158, ValueTuple's
        # toString; CompositeFunctionsTest pins
        # "contains('NAME.0:ANTHONY') == true"): the named member's
        # value at that instance equals the value AND is in the set
        import re as _re
        vals, kind = _target_set(node.target, ctx)
        arg = str(node.args[0].value)
        m = _re.match(r"^([A-Za-z_$][A-Za-z0-9_$]*)\.(\d+):(.*)$", arg)
        if m:
            fld, idx, val = m.group(1), int(m.group(2)), m.group(3)
            members = {mm.upper() for part in _members_of(node.target)
                       for mm in ctx.model.get(part.upper(), [part])}
            spec = ctx.resolve(fld)
            if fld.upper() not in members or spec is None:
                return MethodValue(F.lit(False), "bool", False)
            col = F.col(spec.column)
            dt = ctx.spark_type(spec)
            if isinstance(dt, T.ArrayType):
                elem = F.try_element_at(col, F.lit(idx + 1))
            else:
                elem = col if idx == 0 else F.lit(None)
            one = _comparable(F.array(elem), kind, ctx, fld)
            lit = F.lit(_norm_literal(ctx, fld, val, kind))
            pred = (F.size(one) > 0) \
                & (F.try_element_at(one, F.lit(1)) == lit) \
                & F.array_contains(vals,
                                   F.try_element_at(one, F.lit(1)))
            return MethodValue(F.coalesce(pred, F.lit(False)), "bool",
                               False)
        first = next(iter(_members_of(node.target)), None)
        lit = F.lit(_norm_literal(ctx, first, arg, kind))
        return MethodValue(
            F.coalesce(F.array_contains(vals, lit), F.lit(False)),
            "bool", False)
    # add/clear/remove mutate — the reference rejects them in queries
    # (CompositeFunctionsTest.testAgainstUnsupportedCompositeStructures
    # expects DatawaveFatalQueryException); anything unimplemented
    # (getValuesForGroups, containsAll, hashCode) errors loudly too
    raise ValueError(f"unsupported FunctionalSet method .{name}()")


def _members_of(target) -> list[str]:
    """Field-name parts a method target draws values from."""
    if isinstance(target, Identifier):
        return target.name.split("||")
    if isinstance(target, FuncNode) and target.args:
        return str(target.args[0].name).split("||")
    if isinstance(target, MethodNode):
        return _members_of(target.target)
    return []


def _norm_literal(ctx, field_name: str | None, v: str, kind: str):
    """contains() literal in the set's comparable domain — string forms
    normalize through the member FIELD's normalizer, exactly as stored
    values did in ``_comparable``."""
    if kind == "number":
        return float(v)
    if kind == "date":
        return _ref_literal(type("L", (), {"value": v})(), "date")
    from datawave_spark.normalizers import get_normalizer
    spec = None
    for part in str(field_name or "").split("||"):
        for member in ctx.model.get(part.upper(), [part] if part else []):
            spec = ctx.resolve(member)
            if spec is not None:
                break
        if spec is not None:
            break
    norm = get_normalizer(spec.normalizer if spec else "noop")
    return str(norm.normalize_literal(v))
