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
