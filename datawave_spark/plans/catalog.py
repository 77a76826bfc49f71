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

    def walk(n: JexlNode) -> JexlNode:
        if isinstance(n, CmpNode):
            if n.field.name.upper() in avail or n.field.name.upper() in ("_ANYFIELD_", "ANYFIELD"):
                return n
            return Literal(n.op in ("!=", "!~"))
        if isinstance(n, FieldCmpNode):
            if n.left.name.upper() in avail and n.right.name.upper() in avail:
                return n
            return Literal(n.op == "!=")
        if isinstance(n, FuncNode):
            refs = [a.name.upper() for a in n.args if isinstance(a, Identifier)]
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

    def query(self, jexl: str, select: list[str] | None = None) -> DataFrame:
        """Run across all datatypes; output columns = requested
        ``select`` (datatypes missing a column contribute NULL) plus a
        ``datatype`` discriminator."""
        import datawave_spark.functions  # noqa: F401
        plans = self.plan_per_datatype(jexl)
        parts: list[DataFrame] = []
        for name, node in plans.items():
            if node is None:
                continue  # pruned: this datatype is never scanned
            spec = self.datatypes[name]
            ctx = CompileContext.for_dataframe(
                spec.df, field_types=spec.field_types, model=spec.model)
            hits = spec.df.filter(compile_node(node, ctx))
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
