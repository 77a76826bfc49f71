"""Edge (graph) table: ingest-time edge materialization + edge query.

Reference:
- ingest: warehouse/ingest-core/.../handler/edge/
  ProtobufEdgeDataTypeHandler.java:82 — config-driven vertex-pair edges
  from co-occurring fields in one event (config keys :88-118, JEXL
  "preconditions" :116); key layout warehouse/core/.../edge/util/
  EdgeKey.java:21 (row = source\\0sink, STATS_TYPE:496
  ACTIVITY/DURATION/LINKS, EDGE_FORMAT:558 STANDARD|STATS);
- query: EdgeQueryLogic (query/tables/edge/EdgeQueryLogic.java:83) over
  virtual fields SOURCE/SINK/TYPE/RELATION/ATTRIBUTE1..3;
- event chaining: DefaultEdgeEventQueryLogic — rebuild an event query
  from an edge result.

Spark restatement: ``edges`` is an ordinary DataFrame built at ingest by
a config-driven select/explode; edge queries are the SAME JEXL compiler
with a field model mapping the virtual fields; STATS edges are a
groupBy; multi-hop traversal (a capability the reference lacks) is an
iterative self-join.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from datawave_spark.compiler import compile_query


@dataclass
class EdgeDefinition:
    """One configured relationship (ProtobufEdgeDataTypeHandler config
    entry): source/sink fields, labels, optional JEXL precondition."""
    source_field: str
    sink_field: str
    edge_type: str
    relationship: str = ""
    attribute1: str | None = None     # column copied into attr1
    precondition: str | None = None   # JEXL over the event
    bidirectional: bool = False


def _as_array(df: DataFrame, col: str) -> F.Column:
    dtype = dict(df.dtypes).get(col, "")
    c = F.col(col).cast("array<string>") if dtype.startswith("array") \
        else F.array(F.col(col).cast("string"))
    return F.filter(c, lambda v: v.isNotNull())


def build_edges(events: DataFrame, defs: list[EdgeDefinition],
                date_col: str | None = None,
                ts_col: str | None = None) -> DataFrame:
    """Materialize the edge frame: one row per (source value, sink
    value) pair per event per definition — STANDARD format.  Multi-value
    fields fan out (explode), preconditions filter events first."""
    outs = []
    for d in defs:
        src = events
        if d.precondition:
            src = compile_query(src, d.precondition)
        # Compute sibling expressions in a projection BELOW the
        # explode: siblings written next to a generator land in the
        # Project ABOVE it and re-run once per exploded element.
        pairs = src.select(
            _as_array(src, d.source_field).alias("__sources"),
            _as_array(src, d.sink_field).alias("__sinks"),
            *( [F.col(d.attribute1).cast("string").alias("attribute1")]
               if d.attribute1 else [F.lit(None).cast("string").alias("attribute1")] ),
            *( [F.to_date(F.col(date_col)).alias("edge_date")]
               if date_col else [F.lit(None).cast("date").alias("edge_date")] ),
            *( [F.hour(F.col(ts_col)).alias("edge_hour")]
               if ts_col else [F.lit(None).cast("int").alias("edge_hour")] ),
        ).select(
            F.explode("__sources").alias("source"),
            "__sinks", "attribute1", "edge_date", "edge_hour",
        ).select(
            "source", F.explode("__sinks").alias("sink"),
            "attribute1", "edge_date", "edge_hour",
        ).select(
            "source", "sink",
            F.lit(d.edge_type).alias("edge_type"),
            F.lit(d.relationship).alias("relationship"),
            "attribute1", "edge_date", "edge_hour",
        )
        outs.append(pairs)
        if d.bidirectional:
            outs.append(pairs.select(
                F.col("sink").alias("source"), F.col("source").alias("sink"),
                "edge_type",
                F.lit(d.relationship[::-1] if d.relationship else "").alias("relationship"),
                "attribute1", "edge_date", "edge_hour"))
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def stats_edges(edges: DataFrame) -> DataFrame:
    """STATS/LINKS format: aggregate edge weights per vertex pair per
    type (EdgeKey STATS_TYPE LINKS) — map-side partial keeps the shuffle
    at pair cardinality."""
    return (edges.groupBy("source", "sink", "edge_type", "relationship")
            .agg(F.count(F.lit(1)).alias("weight")))


def activity_stats_edges(edges: DataFrame) -> DataFrame:
    """STATS/ACTIVITY format (EdgeKey STATS_TYPE:496 ACTIVITY): per
    (vertex pair, type, day) the hourly activity histogram the
    reference packs into a protobuf value — restated long-form as one
    row per active hour with its count (relational, still one
    map-side-combinable aggregation at pair×24 cardinality)."""
    return (edges.groupBy("source", "sink", "edge_type", "edge_date",
                          F.col("edge_hour").alias("hour"))
            .agg(F.count(F.lit(1)).alias("n")))


def duration_stats_edges(edges: DataFrame,
                         elapsed_col: str = "elapsed") -> DataFrame:
    """STATS/DURATION format (EdgeKey STATS_TYPE:496 DURATION): per
    vertex pair per type, counts over the reference's SEVEN fixed
    elapsed-seconds buckets (EdgeValueHelper.getLongListForDuration:
    148-169 — <10s, 10-30s, 30-60s, 1-5m, 5-10m, 10-30m, >30m),
    long-form one row per occupied bucket."""
    e = F.col(elapsed_col)
    bucket = (F.when(e < 10, 0).when(e < 30, 1).when(e < 60, 2)
              .when(e < 5 * 60, 3).when(e < 10 * 60, 4)
              .when(e < 30 * 60, 5).otherwise(6))
    return (edges.withColumn("duration_bucket", bucket)
            .groupBy("source", "sink", "edge_type", "duration_bucket")
            .agg(F.count(F.lit(1)).alias("n")))


def edge_dictionary(events: DataFrame,
                    defs: list[EdgeDefinition],
                    date_col: str | None = None) -> DataFrame:
    """Edge dictionary (EdgeDictionary service parity:
    warehouse/edge-dictionary-core/.../edgedictionary/,
    web-services/dictionary/.../EdgeDictionaryBean.java): one row per
    configured edge definition describing WHAT the edge table contains
    — the type/relationship labels, the event fields that generate the
    vertices, whether a JEXL precondition gates it — plus observed
    corpus stats (edge count, distinct vertex counts, first/last edge
    date).  The reference derives this from DataWaveMetadata "edge"
    rows written at ingest; here it is ONE aggregation per definition
    over the same config the edge build uses, so dictionary and table
    can never drift.

    Scale: ONE aggregation over the def-tagged edge union — a union of
    per-definition single-row aggregates plans each branch as its own
    aggregation tree over the full corpus (N defs × N scans of
    contention); tagging rows and grouping once keeps a single
    Expand+shuffle pass whose output is defs-sized.  The tag is a
    compact int ``def_id`` (the distinct-count Expand triples the row
    stream, so every byte of group key is hashed three times per edge);
    the definition metadata joins back onto the defs-sized result as a
    broadcast."""
    if not defs:
        raise ValueError("edge_dictionary needs at least one definition")
    spark = events.sparkSession
    tagged = []
    for i, d in enumerate(defs):
        e = build_edges(events, [d], date_col=date_col)
        tagged.append(e.select(F.lit(i).alias("def_id"),
                               "source", "sink", "edge_date"))
    one = tagged[0]
    for t in tagged[1:]:
        one = one.union(t)
    agg = (one.groupBy("def_id")
           .agg(F.count(F.lit(1)).alias("n_edges"),
                F.countDistinct("source").alias("n_sources"),
                F.countDistinct("sink").alias("n_sinks"),
                F.min("edge_date").cast("string").alias("first_day"),
                F.max("edge_date").cast("string").alias("last_day")))
    meta = spark.createDataFrame(
        [(i, d.edge_type, d.relationship, d.source_field, d.sink_field,
          d.precondition is not None) for i, d in enumerate(defs)],
        "def_id int, edge_type string, relationship string, "
        "source_field string, sink_field string, has_precondition boolean")
    # LEFT join from the metadata side: a definition whose precondition
    # (or the corpus) produced zero edges still gets its dictionary row
    # — n_*=0, NULL dates — instead of silently vanishing.
    # broadcast the AGG side: for a left-outer join only the right
    # side can be the broadcast build side (a hint on the stream side
    # is silently ignored), and agg is the defs-sized frame anyway
    zero = F.lit(0).cast("long")
    return (meta.join(F.broadcast(agg), "def_id", "left")
            .select("edge_type", "relationship", "source_field",
                    "sink_field", "has_precondition",
                    F.coalesce("n_edges", zero).alias("n_edges"),
                    F.coalesce("n_sources", zero).alias("n_sources"),
                    F.coalesce("n_sinks", zero).alias("n_sinks"),
                    "first_day", "last_day"))


# Virtual-field model for edge JEXL queries (EdgeQueryLogic fields);
# SOURCE/SINK/ATTRIBUTE1 resolve directly (case-insensitive).
EDGE_MODEL = {"TYPE": ["EDGE_TYPE"], "RELATION": ["RELATIONSHIP"]}


def edge_query(edges: DataFrame, jexl: str) -> DataFrame:
    """JEXL over SOURCE/SINK/TYPE/RELATION/ATTRIBUTE1 virtual fields —
    the same compiler, a field model instead of a bespoke planner."""
    return compile_query(edges, jexl, model=EDGE_MODEL)


def edge_events(edges: DataFrame, events: DataFrame,
                source_field: str, sink_field: str | None = None) -> DataFrame:
    """DefaultEdgeEventQueryLogic: pivot an edge result back to the
    events that produced it — semi-join events on the edge endpoints."""
    keys = edges.select("source", "sink").distinct()
    cond = events[source_field].cast("string") == keys["source"]
    if sink_field:
        cond = cond & (events[sink_field].cast("string") == keys["sink"])
    return events.join(keys, cond, "left_semi")


def k_hop(edges: DataFrame, start_jexl: str, hops: int = 2,
          max_frontier: int | None = None) -> DataFrame:
    """Multi-hop traversal (beyond the reference): BFS frontier via
    iterative self-join; returns (vertex, hop) — minimal hop per vertex.
    ``max_frontier`` caps the frontier per level (supernode guard)."""
    start = edge_query(edges, start_jexl)
    frontier = start.select(F.col("sink").alias("vertex")).distinct() \
        .withColumn("hop", F.lit(1))
    seen = frontier
    fwd = edges.select(F.col("source").alias("vertex"),
                       F.col("sink").alias("next")).distinct()
    for h in range(2, hops + 1):
        if max_frontier is not None:
            frontier = frontier.limit(max_frontier)
        nxt = (frontier.join(fwd, "vertex")
               .select(F.col("next").alias("vertex")).distinct()
               .join(seen.select("vertex"), "vertex", "left_anti")
               .withColumn("hop", F.lit(h)))
        seen = seen.union(nxt)
        frontier = nxt
    return seen


def dated_edges(events: DataFrame, defs: list[EdgeDefinition],
                event_date_col: str,
                activity_date_col: str | None = None) -> DataFrame:
    """Edges under the reference's DATE_TYPE discipline (EdgeKey
    DATE_TYPE:533 — ACTIVITY_ONLY "C" / EVENT_ONLY "A" /
    ACTIVITY_AND_EVENT "B"): every edge row is dated, and the
    ``date_type`` column records WHICH semantic date stamped it, so
    date-bounded edge queries can ask for activity-dated or
    event-dated rows explicitly (the reference writes separate keys
    per date type).

    When both dates are given: rows where they fall on the same day
    are written once as ACTIVITY_AND_EVENT; differing days produce one
    EVENT_ONLY row (event date) and one ACTIVITY_ONLY row (activity
    date) — the reference's dual-write collapsed the same way.

    NULL dates: branch routing is null-SAFE (plain ``==``/``!=`` are
    both null-false, which would silently drop any row with a NULL
    date from every branch).  A row with one NULL date still writes
    its dated side (e.g. NULL event date + real activity date → one
    ACTIVITY_ONLY row); rows where the branch's own date is NULL are
    dropped at the end — an edge key cannot exist without a date."""
    outs = []
    for d in defs:
        src = events
        if d.precondition:
            src = compile_query(src, d.precondition)
        ed = F.to_date(F.col(event_date_col))
        ad = F.to_date(F.col(activity_date_col)) if activity_date_col else ed
        pairs = src.select(
            _as_array(src, d.source_field).alias("__sources"),
            _as_array(src, d.sink_field).alias("__sinks"),
            ed.alias("__ed"), ad.alias("__ad"),
        ).select(F.explode("__sources").alias("source"),
                 "__sinks", "__ed", "__ad",
        ).select("source", F.explode("__sinks").alias("sink"),
                 "__ed", "__ad") \
         .select("source", "sink", F.lit(d.edge_type).alias("edge_type"),
                 "__ed", "__ad")
        same_day = F.col("__ed").eqNullSafe(F.col("__ad"))
        same = pairs.filter(same_day).select(
            "source", "sink", "edge_type",
            F.col("__ed").alias("edge_date"),
            F.lit("ACTIVITY_AND_EVENT").alias("date_type"))
        ev_only = pairs.filter(~same_day).select(
            "source", "sink", "edge_type",
            F.col("__ed").alias("edge_date"),
            F.lit("EVENT_ONLY").alias("date_type"))
        act_only = pairs.filter(~same_day).select(
            "source", "sink", "edge_type",
            F.col("__ad").alias("edge_date"),
            F.lit("ACTIVITY_ONLY").alias("date_type"))
        outs += [same, ev_only, act_only]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.filter(F.col("edge_date").isNotNull())
