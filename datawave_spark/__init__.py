"""datawave_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of NationalSecurityAgency/datawave.

DataWave (the reference, at /root/reference) is a Java ingest-and-query
framework on Apache Accumulo whose query language is JEXL (with a LUCENE
front-end) evaluated per-document by server-side iterator trees over
inverted indexes.  This package re-expresses every capability Spark-first:

- the JEXL/LUCENE query surface compiles to ``pyspark.sql.Column``
  expressions (``datawave_spark.jexl`` + ``datawave_spark.compiler``) so
  Catalyst handles predicate pushdown, partition pruning and codegen —
  replacing DataWave's RangeStream/ivarator/iterator machinery
  (reference: warehouse/query-core/.../query/iterator/QueryIterator.java);
- the sharded event data model becomes Parquet/Delta tables partitioned by
  event_date with ArrayType multi-value fields (``datawave_spark.sources``);
- post-query transforms (#GROUPBY, #UNIQUE, limit.fields, excerpts) are
  DataFrame operators (``datawave_spark.operators``);
- JEXL function namespaces (filter:, f:, content:, geo:, grouping:) are
  built-in column expressions or Pandas UDFs (``datawave_spark.functions``);
- plus first-class large-scale training-data ops: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard), ANN similarity search, text analysis, and
  multimodal column plumbing (``datawave_spark.operators``).
"""

__version__ = "0.1.0"

from datawave_spark.session import get_spark  # noqa: F401
from datawave_spark.compiler import compile_query  # noqa: F401


def __getattr__(name):
    # QueryPlanner imports the full function surface; keep top-level
    # import light by resolving it lazily.
    if name == "QueryPlanner":
        from datawave_spark.plans import QueryPlanner
        return QueryPlanner
    raise AttributeError(name)
