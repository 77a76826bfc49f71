"""Multi-datatype event catalog with per-datatype query pruning.

Reference: all datatypes share DataWave's shard table; a query is
implicitly a union over datatypes, and IngestTypePruningVisitor removes
branches referencing fields a datatype never ingests (SURVEY §2.6),
driven by the metadata table's per-(datatype, field) rows.

Spark restatement: one DataFrame per datatype (its own schema,
normalizers, model).  A query compiles per-datatype after an AST
pruning pass that folds comparisons on absent fields to constants — a
datatype whose whole tree folds to False is SKIPPED (no scan at all,
the partition-pruning analog), and the survivors union by column name.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, functions as F

from datawave_spark.compiler.columns import CompileContext, compile_node
from datawave_spark.compiler.rewrite import default_pipeline, prune
from datawave_spark.jexl.ast import (
    AndNode, CmpNode, FieldCmpNode, FuncNode, Identifier, JexlNode,
    Literal, NotNode, OrNode,
)


def prune_missing_fields(node: JexlNode, available: set[str]) -> JexlNode:
    """IngestTypePruningVisitor: fold leaves referencing fields this
    datatype lacks — positive comparisons to False, negated ops to True
    (an absent field trivially satisfies not-equals) — then
    constant-fold the boolean structure."""
    avail = {a.upper() for a in available}

    def name_of(ident) -> str:
        # deconstruct the JEXL '$' escape like compile_cmp/compile_range
        # do before lookup — '$FIELD' must prune by FIELD (advice r10)
        return ident.name.lstrip("$").upper()

    def walk(n: JexlNode) -> JexlNode:
        if isinstance(n, CmpNode):
            if name_of(n.field) in avail or \
                    name_of(n.field) in ("_ANYFIELD_", "ANYFIELD"):
                return n
            return Literal(n.op in ("!=", "!~"))
        if isinstance(n, FieldCmpNode):
            if name_of(n.left) in avail and name_of(n.right) in avail:
                return n
            return Literal(n.op == "!=")
        if isinstance(n, FuncNode):
            refs = [name_of(a) for a in n.args if isinstance(a, Identifier)]
            if all(r in avail for r in refs):
                return n
            return Literal(False)
        if isinstance(n, (AndNode, OrNode)):
            return type(n)(tuple(walk(t) for t in n.terms))
        if isinstance(n, NotNode):
            return NotNode(walk(n.term))
        return n

    return prune(walk(node))


@dataclass
class DatatypeSpec:
    df: DataFrame
    field_types: dict[str, str] = dc_field(default_factory=dict)
    model: dict[str, list[str]] = dc_field(default_factory=dict)


class EventCatalog:
    """Query across datatypes as the reference's shared shard table
    does — with per-datatype pruning and by-name union output."""

    def __init__(self, datatypes: dict[str, DatatypeSpec | DataFrame]):
        self.datatypes: dict[str, DatatypeSpec] = {
            name: spec if isinstance(spec, DatatypeSpec) else DatatypeSpec(spec)
            for name, spec in datatypes.items()}

    def plan_per_datatype(self, jexl: str) -> dict[str, JexlNode | None]:
        """The pruned AST per datatype (None = fully pruned, no scan) —
        the EXPLAIN view of datatype pruning."""
        from datawave_spark.jexl.parser import parse
        node = default_pipeline(parse(jexl))
        out: dict[str, JexlNode | None] = {}
        for name, spec in self.datatypes.items():
            fields = {f.name for f in spec.df.schema.fields}
            pruned = prune_missing_fields(node, fields)
            if pruned == Literal(False):
                out[name] = None
            else:
                out[name] = pruned
        return out

    def field_datatypes(self) -> dict[str, set[str]]:
        """FIELD (upper) → datatypes ingesting it — the metadata
        table's per-(datatype, field) rows, derived from the registered
        schemas."""
        out: dict[str, set[str]] = {}
        for name, spec in self.datatypes.items():
            for f in spec.df.schema.fields:
                out.setdefault(f.name.upper(), set()).add(name)
        return out

    def plan(self, jexl: str, *, datatype_filter: set[str] | None = None,
             rebuild_datatype_filter: bool = False,
             reduce_ingest_types: bool = False,
             prune_query_by_ingest_types: bool = False,
             ) -> tuple[JexlNode | None, set[str]]:
        """ShapesTest option surface (ShapesTest.java:72;
        QueryParameters.DATATYPE_FILTER_SET + ShardQueryLogic's
        rebuildDatatypeFilter / reduceIngestTypes /
        pruneQueryByIngestTypes flags) → (planned AST or None when the
        whole query prunes, effective datatype filter; empty set =
        unfiltered).

        - a non-empty parameter filter fully exclusive of a query
          field's ingest types raises InvalidQueryException
          (testExclusiveFilter: the metadata lookup cannot resolve the
          field under the filter);
        - rebuild: the filter is recomputed from the query fields'
          ingest types regardless of the parameter;
        - reduce: a NON-empty filter intersects with the query's
          ingest types (an empty filter is never replaced);
        - prune: IngestTypePruningVisitor self-prune (plus the
          parameter filter when given), and a non-empty filter reduces
          to the pruned query's ingest types."""
        from datawave_spark.jexl.parser import parse
        node: JexlNode | None = default_pipeline(parse(jexl))
        ftypes = self.field_datatypes()
        ing = IngestTypes(ftypes)
        effective = {t.strip() for t in (datatype_filter or set()) if t}
        if effective:
            for f in _collect_fields(node):
                ft = ing.for_field(f)
                if UNKNOWN_TYPE not in ft and not (ft & effective):
                    raise InvalidQueryException(
                        f"field {f} has no ingest type in datatype "
                        f"filter {sorted(effective)} (types: {sorted(ft)})")
        if rebuild_datatype_filter:
            qt = ing.of_query(node)
            effective = set() if qt == {UNKNOWN_TYPE} else qt
        if reduce_ingest_types and effective:
            qt = ing.of_query(node)
            if qt != {UNKNOWN_TYPE}:
                effective &= qt
        if prune_query_by_ingest_types:
            node = prune_ingest_types(node, ftypes,
                                      effective or None)
            if node is not None and effective:
                qt = ing.of_query(node)
                if qt != {UNKNOWN_TYPE}:
                    effective &= qt
        return node, effective

    def query(self, jexl: str, select: list[str] | None = None,
              datatype_filter: set[str] | None = None,
              rebuild_datatype_filter: bool = False,
              reduce_ingest_types: bool = False,
              prune_query_by_ingest_types: bool = False) -> DataFrame:
        """Run across all datatypes; output columns = requested
        ``select`` (datatypes missing a column contribute NULL) plus a
        ``datatype`` discriminator.  The datatype-filter options follow
        :meth:`plan`; a non-empty effective filter restricts which
        datatype frames are scanned at all (the reference's scan-range
        datatype filter)."""
        import datawave_spark.functions  # noqa: F401
        planned, effective = self.plan(
            jexl, datatype_filter=datatype_filter,
            rebuild_datatype_filter=rebuild_datatype_filter,
            reduce_ingest_types=reduce_ingest_types,
            prune_query_by_ingest_types=prune_query_by_ingest_types)
        if planned is None:
            raise ValueError("query pruned for every datatype")
        plans = {}
        for name, spec in self.datatypes.items():
            if effective and name not in effective:
                plans[name] = None          # filtered: never scanned
                continue
            # EVENT_DATATYPE is queryable (BaseRawData.java:28 appends
            # it to every event's metadata; DataTypeQueryTest
            # .testDataTypeEqualInQuery) — a per-frame literal, so
            # 'EVENT_DATATYPE == x' constant-folds to false on other
            # datatypes and Catalyst never scans them
            fields = {f.name for f in spec.df.schema.fields} \
                | {"EVENT_DATATYPE"}
            pruned = prune_missing_fields(planned, fields)
            plans[name] = None if pruned == Literal(False) else pruned
        parts: list[DataFrame] = []
        for name, node in plans.items():
            if node is None:
                continue  # pruned: this datatype is never scanned
            spec = self.datatypes[name]
            # synthesize the EVENT_DATATYPE pseudo-field only when the
            # frame doesn't carry a real column of that name — an
            # unconditional overwrite+drop loses genuine data and breaks
            # a later select of it (advice r10)
            has_dt = any(f.name == "EVENT_DATATYPE"
                         for f in spec.df.schema.fields)
            src_df = spec.df if has_dt else \
                spec.df.withColumn("EVENT_DATATYPE", F.lit(name))
            ctx = CompileContext.for_dataframe(
                src_df,
                field_types={**(spec.field_types or {}),
                             "EVENT_DATATYPE": "lcNoDiacritics"},
                model=spec.model)
            hits = src_df.filter(compile_node(node, ctx))
            if not has_dt:
                hits = hits.drop("EVENT_DATATYPE")
            cols = select or [f.name for f in spec.df.schema.fields]
            have = {f.name.upper(): f.name for f in spec.df.schema.fields}
            proj = [F.lit(name).alias("datatype")]
            # project only the columns this datatype HAS —
            # unionByName(allowMissingColumns) fills the rest with
            # correctly-typed NULLs from the other datatypes' schemas
            for c in cols:
                src = have.get(c.upper())
                if src:
                    proj.append(F.col(src).alias(c))
            parts.append(hits.select(*proj))
        if not parts:
            raise ValueError("query pruned for every datatype")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out


class FederatedCatalog:
    """Cross-deployment query federation — the RemoteEventQueryLogic /
    BaseRemoteQueryLogic analog (warehouse/query-core/src/main/java/
    datawave/query/tables/RemoteEventQueryLogic.java:29 — a logic that
    delegates a query to ANOTHER deployment and streams its events
    back; tables/remote/RemoteQueryLogic.java is the interface,
    BaseRemoteQueryLogic.java:31 holds the remote-service plumbing).

    Spark restatement: a "remote deployment" is just another catalog
    root the cluster can read (a second warehouse path, bucket, or
    metastore), so federation is a by-name union over per-deployment
    ``EventCatalog.query`` results tagged with the deployment name —
    no result-page proxying needed, and Catalyst still pushes each
    deployment's filters into its own scan.  Per-deployment datatype
    pruning applies independently: a deployment where EVERY datatype
    prunes contributes nothing and is never scanned (the reference
    simply gets an empty page stream from that remote).

    Scale: each deployment's branch is its own pushdown-pruned scan;
    the union is a no-shuffle concatenation, so a 1000-executor job
    reads every deployment in parallel with per-source partition
    pruning intact."""

    def __init__(self, deployments: dict[str, EventCatalog]):
        if not deployments:
            raise ValueError("no deployments registered")
        self.deployments = dict(deployments)

    def query(self, jexl: str, select: list[str] | None = None,
              deployment_col: str = "deployment") -> DataFrame:
        """Run ``jexl`` on every deployment; rows tag with the
        deployment name.  Raises only if the query prunes on EVERY
        deployment (nothing anywhere can answer it)."""
        parts: list[DataFrame] = []
        for name, cat in self.deployments.items():
            try:
                df = cat.query(jexl, select=select)
            except ValueError as e:
                if "pruned" not in str(e):
                    raise           # a real error, not datatype pruning
                continue            # pruned everywhere: never scans
            parts.append(df.select(F.lit(name).alias(deployment_col), "*"))
        if not parts:
            raise ValueError("query pruned for every deployment")
        return _union_by_name(parts)


def _union_by_name(parts: list[DataFrame]) -> DataFrame:
    """Tagged-deployment merge: by-name union tolerating per-source
    schema gaps — the one fold every federation path shares."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def federated_edge_query(deployments: dict[str, DataFrame], jexl: str,
                         deployment_col: str = "deployment") -> DataFrame:
    """Cross-deployment edge-query federation — the
    RemoteEdgeQueryLogic analog (warehouse/query-core/src/main/java/
    datawave/query/tables/RemoteEdgeQueryLogic.java:36, the edge twin
    of RemoteEventQueryLogic): each deployment keeps its own
    ingest-materialized edge frame; the query compiles against each
    independently (its pushdown reaches its own scan) and results
    union by name with a deployment tag.  No shuffle is added by the
    union itself."""
    from datawave_spark.edges import edge_query
    if not deployments:
        raise ValueError("no deployments registered")
    return _union_by_name(
        [edge_query(edges, jexl)
         .select(F.lit(name).alias(deployment_col), "*")
         for name, edges in deployments.items()])


# -------------------------------------------- ingest-type visitor family
#
# Port of the reference's IngestTypeVisitor / IngestTypePruningVisitor
# pair (warehouse/query-core/src/main/java/datawave/query/jexl/
# visitors/IngestTypeVisitor.java:52, IngestTypePruningVisitor.java:65)
# and the ShapesTest datatype-filter option surface
# (query/ShapesTest.java:72: DATATYPE_FILTER_SET parameter,
# rebuildDatatypeFilter, reduceIngestTypes, pruneQueryByIngestTypes).

UNKNOWN_TYPE = "UNKNOWN_TYPE"
IGNORED_TYPE = "IGNORED_TYPE"


class InvalidQueryException(ValueError):
    """A datatype filter excludes every ingest type of a query field
    (ShapesTest.testExclusiveFilter — the reference's metadata lookup
    cannot resolve the field under the filter and raises)."""


def _leaf_fields(n: JexlNode) -> set[str]:
    """Identifiers referenced by one leaf (deconstructed — '$' strip)."""
    from datawave_spark.jexl.ast import MethodNode
    out: set[str] = set()
    if isinstance(n, CmpNode):
        out.add(n.field.name)
    elif isinstance(n, FieldCmpNode):
        out.update((n.left.name, n.right.name))
    elif isinstance(n, FuncNode):
        for a in n.args:
            if isinstance(a, Identifier):
                out.add(a.name)
    elif isinstance(n, MethodNode) and isinstance(n.target, Identifier):
        out.add(n.target.name)
    elif hasattr(n, "field") and isinstance(getattr(n, "field"), Identifier):
        out.add(n.field.name)          # RangeNode and friends
    expanded: set[str] = set()
    for f in out:
        for part in str(f).split("||"):
            expanded.add(part.upper().lstrip("$"))
    return expanded


def _collect_fields(n: JexlNode) -> set[str]:
    """Every field referenced anywhere in the query (deconstructed)."""
    out = _leaf_fields(n)
    for c in n.children():
        out |= _collect_fields(c)
    out.discard("_ANYFIELD_")
    out.discard("ANYFIELD")
    return out


class IngestTypes:
    """IngestTypeVisitor port over the engine AST.  ``ftypes`` maps
    FIELD (upper) → the set of datatypes that ingest it (the metadata
    table's per-(datatype, field) rows); a field absent from the map is
    UNKNOWN_TYPE (never prunable)."""

    def __init__(self, ftypes: dict[str, set[str]]):
        self.ftypes = {k.upper(): set(v) for k, v in ftypes.items()}

    def for_field(self, field: str) -> set[str]:
        return set(self.ftypes.get(field.upper(), {UNKNOWN_TYPE}))

    def of(self, n: JexlNode, external: bool = True) -> set[str]:
        """Ingest types of a node.  ``external=False`` is the
        reduce/rebuild entrypoint (negations and literal-less leaves
        are IGNORED_TYPE); True is the pruning traversal's mode."""
        from datawave_spark.jexl.ast import MarkerNode
        if isinstance(n, AndNode):
            return self._intersection(n, external)
        if isinstance(n, OrNode):
            out: set[str] = set()
            for t in n.terms:
                out |= self.of(t, external)
            if len(out) > 1:
                out.discard(IGNORED_TYPE)
            return out
        if isinstance(n, NotNode):
            if external:
                return self.of(n.term, external)
            return {IGNORED_TYPE}
        if isinstance(n, (Literal, MarkerNode)):
            return {IGNORED_TYPE} if not external else {UNKNOWN_TYPE}
        if not external:
            # getIngestTypesForLeaf: a leaf with no literal value
            # (null comparison, field-to-field) is IGNORED_TYPE in
            # non-external mode
            if isinstance(n, CmpNode) and (
                    not isinstance(n.value, Literal)
                    or n.value.value is None):
                return {IGNORED_TYPE}
            if isinstance(n, FieldCmpNode):
                return {IGNORED_TYPE}
        fields = _leaf_fields(n)
        if not fields:
            return {UNKNOWN_TYPE}
        out = set()
        for f in fields:
            out |= self.for_field(f)
        return out

    def _intersection(self, n: AndNode, external: bool) -> set[str]:
        out: set[str] = set()
        for i, t in enumerate(n.terms):
            child = self.of(t, external)
            if i == 0:
                out = child
            else:
                out = self._intersect(out, child)
            if not out:
                break
        if len(out) > 1:
            out.discard(IGNORED_TYPE)
        return out

    @staticmethod
    def _intersect(a: set[str], b: set[str]) -> set[str]:
        if UNKNOWN_TYPE in a or UNKNOWN_TYPE in b:
            return {UNKNOWN_TYPE}
        if (IGNORED_TYPE in a) != (IGNORED_TYPE in b):
            out = (a | b) - {IGNORED_TYPE}
            return out
        return a & b

    def of_query(self, n: JexlNode) -> set[str]:
        """Top-level entry (IngestTypeVisitor.getIngestTypes static):
        any UNKNOWN_TYPE collapses the answer to just UNKNOWN_TYPE."""
        out = self.of(n, external=False)
        if UNKNOWN_TYPE in out:
            return {UNKNOWN_TYPE}
        return out


def _is_null_eq(n: JexlNode) -> bool:
    return isinstance(n, CmpNode) and n.op == "==" \
        and isinstance(n.value, Literal) and n.value.value is None


def _is_not_null(n: JexlNode) -> bool:
    if isinstance(n, NotNode):
        return _is_null_eq(n.term)
    return isinstance(n, CmpNode) and n.op == "!=" \
        and isinstance(n.value, Literal) and n.value.value is None


def prune_ingest_types(node: JexlNode, ftypes: dict[str, set[str]],
                       filter_set: set[str] | None = None) -> JexlNode | None:
    """IngestTypePruningVisitor.prune port: drop branches whose ingest
    types are fully exclusive of their AND-context (or of the supplied
    datatype ``filter_set``).  Returns the pruned tree, or None when
    the whole query prunes.  Null-equality / negated leaves of
    exclusive types evaluate TRUE (drop from intersections, collapse
    unions); not-null terms of exclusive types evaluate FALSE (drop
    from unions, collapse intersections) — the visitor's documented
    rules."""
    ing = IngestTypes(ftypes)

    def should_prune(types: set[str], includes: set[str]) -> bool:
        if UNKNOWN_TYPE in types or UNKNOWN_TYPE in includes:
            return False
        if IGNORED_TYPE in types:
            return False
        return not (types & includes)

    def walk(n: JexlNode, data: set[str] | None):
        """→ pruned node, None = node dropped, or the TRUE/FALSE
        sentinel via Literal for union/intersection collapse."""
        if isinstance(n, AndNode):
            # intersection types use NON-external mode (null-literal
            # leaves and negations contribute IGNORED_TYPE, not their
            # field's types — IngestTypePruningVisitor's
            # ingestTypeVisitor starts non-external), while the
            # per-child prune checks below use external mode
            types = ing._intersection(n, False)
            if not types:
                return None
            pruning = data if data is not None else types
            kept = []
            for t in n.terms:
                if _is_null_eq(t) and should_prune(ing.of(t, True), pruning):
                    continue                       # true term drops
                if _is_not_null(t) and should_prune(ing.of(t, True), pruning):
                    return None                    # false term kills AND
                out = walk(t, pruning)
                if out is not None:
                    kept.append(out)
            if not kept:
                return None
            return kept[0] if len(kept) == 1 else AndNode(tuple(kept))
        if isinstance(n, OrNode):
            if data is None:
                kept = [walk(t, None) for t in n.terms]
                kept = [k for k in kept if k is not None]
            else:
                kept = []
                for t in n.terms:
                    tt = ing.of(t, True)
                    if (_is_null_eq(t) or isinstance(t, NotNode)) \
                            and should_prune(tt, data):
                        return None                # union evaluates true
                    if _is_not_null(t) and should_prune(tt, data):
                        continue                   # false term drops
                    if not isinstance(t, (AndNode, OrNode, NotNode)) \
                            and should_prune(tt, data):
                        continue                   # exclusive leaf drops
                    out = walk(t, data)
                    if out is not None:
                        kept.append(out)
            if not kept:
                return None
            return kept[0] if len(kept) == 1 else OrNode(tuple(kept))
        if isinstance(n, NotNode):
            out = walk(n.term, data)
            return None if out is None else NotNode(out)
        # leaf
        if data is not None and should_prune(ing.of(n, True), data):
            return None
        return n

    return walk(node, set(filter_set) if filter_set else None)
