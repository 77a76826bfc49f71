"""Custom stateful streaming operators (applyInPandasWithState).

The reference's UniqueTransform (query/transformer/UniqueTransform.java:
42,70) dedups a RESULT STREAM with a Bloom filter that lives for the
query's lifetime.  Structured Streaming generalizes that: keyed state
that lives across micro-batches.  ``streaming_unique`` is the streaming
#UNIQUE — emit each key's first-seen row, remember the key in state —
with exact state instead of the reference's false-positive-prone Bloom.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_unique(stream: DataFrame, key_cols: list[str]) -> DataFrame:
    """Keyed first-occurrence dedup across micro-batches.  Output schema
    = input schema; state per key = a seen flag."""
    schema = stream.schema
    cols = [f.name for f in schema.fields]

    def dedup(key: tuple, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.iloc[:1]
        if first is not None:
            state.update((1,))
            yield first[cols]

    return (stream.groupBy(*key_cols)
            .applyInPandasWithState(dedup, schema, "seen integer",
                                    "append", GroupStateTimeout.NoTimeout))


def streaming_unique_ttl(stream: DataFrame, key_cols: list[str],
                         ttl_ms: int) -> DataFrame:
    """First-occurrence dedup whose per-key state AGES OFF after
    ``ttl_ms`` of processing time — the streaming composition of
    UniqueTransform with the age-off filter family
    (ConfigurableAgeOffFilter.java:103): a key seen again after its
    state expired is emitted again, bounding state size by the active
    key set instead of all-time cardinality (the knob that matters for
    an unbounded stream)."""
    schema = stream.schema
    cols = [f.name for f in schema.fields]

    def dedup(key: tuple, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            # refresh nothing: the TTL is from first sight (age-off
            # semantics — retention counts from write time)
            return
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.iloc[:1]
        if first is not None:
            state.update((1,))
            state.setTimeoutDuration(ttl_ms)
            yield first[cols]

    return (stream.groupBy(*key_cols)
            .applyInPandasWithState(dedup, schema, "seen integer",
                                    "append",
                                    GroupStateTimeout.ProcessingTimeTimeout))


def streaming_running_counts(stream: DataFrame,
                             key_cols: list[str]) -> DataFrame:
    """Running per-key totals across micro-batches (the live-ingest
    metrics analog): state = cumulative count, emitted once per batch
    in which the key appears."""
    out_schema = ", ".join(f"`{c}` string" for c in key_cols) \
        + ", total long"

    def count(key: tuple, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        n = sum(len(pdf) for pdf in pdfs)
        total = (state.get[0] if state.exists else 0) + n
        state.update((total,))
        row = {c: [str(k)] for c, k in zip(key_cols, key)}
        row["total"] = [total]
        yield pd.DataFrame(row)

    return (stream.groupBy(*key_cols)
            .applyInPandasWithState(count, out_schema, "total long",
                                    "update",
                                    GroupStateTimeout.NoTimeout))
