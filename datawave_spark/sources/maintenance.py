"""Table maintenance: small-file compaction for the event store.

Reference: Accumulo performs this continuously (minor/major compaction
merges RFiles per tablet; the reference's tables inherit it for free).
A parquet/Delta lake on object storage does NOT — streaming ingest
(foreachBatch appends, one file per partition per micro-batch) and
fine-grained shard partitioning accumulate small files, and at 100 TB
the scan-planning overhead (file listing, footer reads, one task per
tiny split) becomes the dominant query cost.  This module is the
major-compaction analog: rewrite a table (or one date partition) into
~target-size files, optionally re-clustered on a sort key so row-group
stats stay selective.

The rewrite is write-then-swap: the new files land in a sibling
directory and replace the old data only after the write commits
(_SUCCESS), so readers never observe a half-compacted table — the
parquet-level equivalent of Accumulo's atomic file replacement (and of
Delta's OPTIMIZE transaction, which subsumes this module when Delta is
available).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def parquet_file_count(path: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(1 for f in files
                 if f.endswith(".parquet") and not f.startswith((".", "_")))
    return n


def _recover_swap(target: str, old: str, tmp: str) -> None:
    """Crash recovery for the write-then-swap discipline, run BEFORE a
    new swap of the same target: a crash between ``rename(target, old)``
    and ``rename(tmp, target)`` leaves the live data stranded in
    ``old`` with ``target`` missing — without this, a re-run would take
    the 'target does not exist' branch and silently write the update
    batch alone, discarding every pre-existing row.  Recovery order:

    - ``old`` exists and ``target`` missing → roll BACK (restore old);
      the interrupted run's tmp (if any) is stale and removed.
    - ``old`` and ``target`` both exist → the swap completed but the
      old-dir cleanup didn't; drop ``old``.
    - a leftover ``tmp`` alone → an interrupted write; drop it (the
      writer re-creates it with mode=overwrite anyway).
    """
    if os.path.exists(old):
        if os.path.exists(target):
            shutil.rmtree(old)      # swap finished; cleanup didn't
        else:
            os.rename(old, target)  # swap half-done; roll back
    if os.path.exists(tmp):
        shutil.rmtree(tmp)


def recover_table(table_path: str, partition_col: str = "event_date") -> int:
    """Sweep ALL stranded swap siblings of a partitioned table (any
    ``<base>.{merge,modify}.old.<pval>`` left by a crash) and repair
    them.  Must run before any operation that DISCOVERS partitions by
    reading the table (``modify_field``): a stranded partition is
    invisible to partition discovery, so per-partition recovery alone
    would never reach it.  Returns the number of repairs."""
    base = os.path.basename(table_path.rstrip("/"))
    parent = os.path.dirname(table_path.rstrip("/")) or "."
    n = 0
    if not os.path.isdir(parent):
        return 0
    # the op name implies the table layout: rollup tables are
    # day-partitioned regardless of the caller's event-table column —
    # restoring a stranded rollup day under event_date=... would hide
    # it from every rollup reader
    op_cols = {"merge": partition_col, "modify": partition_col,
               "rollup": "day"}
    for name in os.listdir(parent):
        for op, pcol in op_cols.items():
            prefix = f"{base}.{op}.old."
            if name.startswith(prefix):
                pval = name[len(prefix):]
                _recover_swap(
                    os.path.join(table_path, f"{pcol}={pval}"),
                    os.path.join(parent, name),
                    os.path.join(parent, f"{base}.{op}.tmp.{pval}"))
                n += 1
    return n


def compact(spark: SparkSession, path: str,
            target_file_bytes: int = DEFAULT_TARGET_BYTES,
            sort_by: str | None = None) -> int:
    """Rewrite the parquet data at ``path`` into ``ceil(size/target)``
    files (optionally range-clustered + sorted on ``sort_by`` so the
    compaction also restores row-group-stat selectivity), then swap the
    new files in.  Returns the new file count.

    On a cluster this runs per date-partition directory (the unit the
    reference's major compaction works in); sizing by on-disk bytes
    keeps output files near the target regardless of row width."""
    _recover_swap(path, path.rstrip("/") + ".compact.old",
                  path.rstrip("/") + ".compact.tmp")
    total = _dir_bytes(path)
    n_files = max(1, -(-total // target_file_bytes))
    df: DataFrame = spark.read.parquet(path)
    if sort_by:
        w = df.repartitionByRange(n_files, sort_by) \
              .sortWithinPartitions(sort_by)
    else:
        w = df.repartition(n_files)
    tmp = path.rstrip("/") + ".compact.tmp"
    w.write.mode("overwrite").parquet(tmp)
    if not os.path.exists(os.path.join(tmp, "_SUCCESS")):
        raise RuntimeError(f"compaction write did not commit: {tmp}")
    old = path.rstrip("/") + ".compact.old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return parquet_file_count(path)


def merge_events(spark: SparkSession, table_path: str, updates: DataFrame,
                 id_col: str = "uid",
                 partition_col: str = "event_date") -> int:
    """Upsert a batch into a date-partitioned event store — the
    re-ingest overwrite semantics the reference gets for free from
    Accumulo's KV model (re-ingesting an event writes the same key, and
    compaction drops the older version).  Parquet is immutable, so the
    merge is per-partition copy-on-write:

    1. the update batch names the partitions it touches (tiny distinct);
    2. ONLY those partition directories are read back (partition-pruned
       scan — at 100 TB a re-ingest touches a handful of dates, not the
       corpus);
    3. existing rows losing to an update on ``id_col`` are anti-joined
       away, the union is rewritten, and each partition directory is
       swapped atomically (write-then-swap, as ``compact``).

    Returns the number of rewritten partitions.  (With Delta this whole
    function is ``MERGE INTO`` — this is the dependency-free analog.)
    """
    import datetime

    parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
    for p in parts:
        pval = p.isoformat() if isinstance(p, (datetime.date,)) else str(p)
        pdir = os.path.join(table_path, f"{partition_col}={pval}")
        # a prior crashed run of THIS partition must be repaired before
        # the exists-check below, or its rows are silently lost
        _recover_swap(pdir, table_path.rstrip("/") + f".merge.old.{pval}",
                      table_path.rstrip("/") + f".merge.tmp.{pval}")
        batch = updates.filter(F.col(partition_col) == F.lit(p)) \
            .drop(partition_col)
        if os.path.exists(pdir):
            existing = spark.read.parquet(pdir)
            keep = existing.join(batch.select(id_col), id_col, "left_anti")
            merged = keep.unionByName(batch)
        else:
            merged = batch
        # tmp/old live as SIBLINGS of the table root, never inside it:
        # a crash mid-swap must not leave a directory that partition
        # discovery would read as a bogus partition (the compact()
        # discipline).
        tmp = table_path.rstrip("/") + f".merge.tmp.{pval}"
        merged.write.mode("overwrite").parquet(tmp)
        if not os.path.exists(os.path.join(tmp, "_SUCCESS")):
            raise RuntimeError(f"merge write did not commit: {tmp}")
        if os.path.exists(pdir):
            old = table_path.rstrip("/") + f".merge.old.{pval}"
            os.rename(pdir, old)
            os.rename(tmp, pdir)
            shutil.rmtree(old)
        else:
            os.rename(tmp, pdir)
    return len(parts)


def modify_field(spark: SparkSession, table_path: str, uid: str,
                 field: str, mode: str, value=None,
                 id_col: str = "uid",
                 partition_col: str = "event_date") -> int:
    """Field-level modification of a STORED event — the modification
    service (web-services/modification ModificationBean →
    core/modification/MutableMetadataHandler.java:76: INSERT / UPDATE /
    DELETE of a field value on one event, addressed by uid).

    Accumulo mutates the KV in place; parquet is immutable, so this is
    the same per-partition copy-on-write as :func:`merge_events`:
    locate the partitions holding the uid (a pushed-filter scan that
    prunes to row groups), rewrite ONLY those directories with the
    field edited, swap atomically.  Multi-valued (array) fields treat
    INSERT as set-add and DELETE as value-remove — the reference's
    multi-value field semantics; scalars set/clear the single value.
    Returns the number of rewritten partitions.
    """
    import datetime
    mode = mode.upper()
    if mode not in ("INSERT", "UPDATE", "DELETE"):
        raise ValueError(f"mode must be INSERT/UPDATE/DELETE, got {mode!r}")
    # partitions are DISCOVERED from the table below, so stranded
    # partitions must be restored first or they are simply never seen
    recover_table(table_path, partition_col)
    table = spark.read.parquet(table_path)
    parts = [r[0] for r in table.filter(F.col(id_col) == uid)
             .select(partition_col).distinct().collect()]
    for p in parts:
        pval = p.isoformat() if isinstance(p, datetime.date) else str(p)
        pdir = os.path.join(table_path, f"{partition_col}={pval}")
        _recover_swap(pdir, table_path.rstrip("/") + f".modify.old.{pval}",
                      table_path.rstrip("/") + f".modify.tmp.{pval}")
        df = spark.read.parquet(pdir)
        ftype = dict(df.dtypes)[field]
        is_arr = ftype.startswith("array")
        if mode == "INSERT":
            new = F.array_union(
                F.coalesce(F.col(field), F.array().cast(ftype)),
                F.array(F.lit(value))) if is_arr else F.lit(value)
        elif mode == "UPDATE":
            new = F.array(F.lit(value)) if is_arr else F.lit(value)
        else:  # DELETE
            if is_arr:
                new = F.array_remove(F.col(field), value)
            elif value is not None:
                new = F.when(F.col(field) == F.lit(value),
                             F.lit(None).cast(ftype)).otherwise(F.col(field))
            else:
                new = F.lit(None).cast(ftype)
        df2 = df.withColumn(field, F.when(F.col(id_col) == uid, new)
                            .otherwise(F.col(field)))
        # sibling-of-table-root placement, as in merge_events/compact
        tmp = table_path.rstrip("/") + f".modify.tmp.{pval}"
        df2.write.mode("overwrite").parquet(tmp)
        if not os.path.exists(os.path.join(tmp, "_SUCCESS")):
            raise RuntimeError(f"modification write did not commit: {tmp}")
        old = table_path.rstrip("/") + f".modify.old.{pval}"
        os.rename(pdir, old)
        os.rename(tmp, pdir)
        shutil.rmtree(old)
    return len(parts)


def append_index(spark: SparkSession, index_path: str, new_events,
                 fields: list[str], id_col: str,
                 date_col: str | None = None,
                 field_types: dict[str, str] | None = None) -> int:
    """INCREMENTAL index maintenance: derive index rows for a NEW event
    batch and append them into the stored inverted-index asset — the
    steady-state ingest discipline (the reference's ingest job writes
    index mutations continuously; Accumulo merges them at compaction).

    Parquet append into the existing field=… hive partitions: queries
    see old ∪ new immediately (no rebuild of the corpus-sized asset
    per day — at 100 TB a full index rebuild per increment is the
    difference between a viable pipeline and not).  New files are
    value-sorted within themselves only; run :func:`compact` with
    ``sort_by='value'`` per field directory on your maintenance cadence
    to restore global clustering (exactly Accumulo's major compaction
    restoring locality over minor-compacted files).  Returns the number
    of appended rows."""
    from datawave_spark.sources.index_frame import build_index
    rows = build_index(new_events, fields, id_col, date_col=date_col,
                       field_types=field_types)
    # persist before count+write: without the barrier the full
    # explode/normalize derivation would execute twice per increment
    rows = rows.sortWithinPartitions("value").persist()
    try:
        n = rows.count()
        rows.write.mode("append").partitionBy("field").parquet(index_path)
    finally:
        rows.unpersist(blocking=False)
    return n


def tier_partitions(table_path: str, tiers: dict[str, tuple[str, int]],
                    now, partition_col: str = "event_date") -> list[tuple[str, str]]:
    """Date-based storage tiering for a date-partitioned table —
    the parquet-layout analog of the reference's
    ShardedTableDateBasedTieredVolumeChooser.java:58 (each shard's
    VOLUME chosen by floorKey(shard age) over per-tier ``days.back``
    thresholds, so old shards land on cold storage and recent ones on
    fast volumes).

    ``tiers`` maps tier name -> (root_dir, days_back): a partition
    whose age in days (relative to ``now``) is >= days_back belongs to
    the tier with the GREATEST matching threshold (the TreeMap
    floorKey); a partition younger than every threshold stays in the
    base table (the implicit hot tier, = the chooser's default-options
    fallback).  Partitions already in a tier root are re-evaluated too,
    so a policy change or the passage of time migrates them onward —
    age only grows, but the mechanism is direction-agnostic.

    Same-filesystem moves are single ``os.rename`` calls (atomic).
    Across filesystems (the normal tiering case — that is the point)
    the move is STAGED: copy into a dot-prefixed ``.<dir>.tiertmp``
    sibling of the destination (invisible to Spark readers), stamp a
    ``_COMPLETE`` marker, remove the source, rename the stage into
    place, drop the marker — every crash point is distinguishable and
    :func:`recover_tiers` (run automatically on entry) resumes or
    rolls back, mirroring this module's ``_recover_swap`` discipline.
    A reader never sees a doubled or half-written partition; it may
    briefly MISS one mid-move (between source removal and the stage
    rename — the tablet-offline window of the reference's migrations).
    A partition present at both source and destination with no stage
    marker raises (never silently merged).  Two tiers sharing a
    ``days_back`` raise up front (a TreeMap cannot even represent the
    duplicate, and one tier would silently shadow the other); a
    partition directory whose value does not parse as a date (e.g.
    ``__HIVE_DEFAULT_PARTITION__``) is left where it is.
    Returns the (partition_value, tier_name) moves performed; 'base'
    names the base table.  On object storage the same policy maps to
    lifecycle rules / storage classes; this module gives the
    HDFS-style explicit layout."""
    import datetime as dt

    thresholds = sorted(((db, name) for name, (_r, db) in tiers.items()),
                        reverse=True)
    seen_db = {}
    for db, name in thresholds:
        if db < 0:
            raise ValueError(f"invalid days back for {name}: must be >= 0")
        if db in seen_db:
            raise ValueError(
                f"tiers {seen_db[db]} and {name} share days_back={db}; "
                "one would silently shadow the other")
        seen_db[db] = name

    def target_for(age: int) -> str:
        for db, name in thresholds:        # greatest threshold <= age
            if age >= db:
                return name
        return "base"

    recover_tiers(table_path, tiers, partition_col)
    roots = {"base": table_path, **{n: r for n, (r, _d) in tiers.items()}}
    moves: list[tuple[str, str]] = []
    prefix = f"{partition_col}="
    for loc_name, root in list(roots.items()):
        if not os.path.isdir(root):
            continue
        for d in sorted(os.listdir(root)):
            if not d.startswith(prefix):
                continue
            try:
                pdate = dt.date.fromisoformat(d[len(prefix):])
            except ValueError:
                continue               # null/odd partition: stays put
            pval = d[len(prefix):]
            tgt = target_for(max((now - pdate).days, 0))
            if tgt == loc_name:
                continue
            src = os.path.join(root, d)
            dst = os.path.join(roots[tgt], d)
            if os.path.exists(dst):
                raise ValueError(
                    f"partition {pval} already exists in tier {tgt}")
            os.makedirs(roots[tgt], exist_ok=True)
            try:
                os.rename(src, dst)
            except OSError:
                _staged_move(src, dst)
            moves.append((pval, tgt))
    return moves


def _staged_move(src: str, dst: str) -> None:
    """Cross-filesystem partition move with distinguishable crash
    states: (1) copy src into a dot-prefixed stage next to dst,
    (2) stamp ``_COMPLETE`` in the stage, (3) remove src, (4) rename
    stage -> dst (atomic, same fs as dst), (5) drop the marker.
    The stage dir is invisible to Spark (leading dot); the marker file
    is invisible inside a live partition (leading underscore)."""
    tmp = os.path.join(os.path.dirname(dst),
                       "." + os.path.basename(dst) + ".tiertmp")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)             # partial stage from a prior crash
    shutil.copytree(src, tmp)
    with open(os.path.join(tmp, "_COMPLETE"), "w"):
        pass
    shutil.rmtree(src)
    os.rename(tmp, dst)
    os.remove(os.path.join(dst, "_COMPLETE"))


def recover_tiers(table_path: str, tiers: dict[str, tuple[str, int]],
                  partition_col: str = "event_date") -> int:
    """Sweep every tier root for interrupted :func:`_staged_move`
    states and repair them (run automatically by ``tier_partitions``):

    - stage WITHOUT marker → the copy never finished and the source is
      intact: drop the stage.
    - stage WITH marker → the copy finished: remove a still-present
      source (step 3 crashed), rename the stage into place (step 4),
      drop the marker (step 5) — resuming wherever the move stopped.
    - live partition holding a leftover ``_COMPLETE`` marker → only
      step 5 crashed: drop the marker.

    Returns the number of repairs."""
    roots = [table_path] + [r for r, _d in tiers.values()]
    prefix = f"{partition_col}="
    n = 0
    for root in roots:
        if not os.path.isdir(root):
            continue
        for name in sorted(os.listdir(root)):
            if name.startswith("." + prefix) and name.endswith(".tiertmp"):
                tmp = os.path.join(root, name)
                pdir = name[1:-len(".tiertmp")]
                if os.path.exists(os.path.join(tmp, "_COMPLETE")):
                    for other in roots:
                        srcd = os.path.join(other, pdir)
                        if other != root and os.path.isdir(srcd):
                            shutil.rmtree(srcd)
                    dst = os.path.join(root, pdir)
                    if os.path.isdir(dst):   # defensive: stage is stale
                        shutil.rmtree(tmp)
                    else:
                        os.rename(tmp, dst)
                        os.remove(os.path.join(dst, "_COMPLETE"))
                else:
                    shutil.rmtree(tmp)
                n += 1
            elif name.startswith(prefix) and os.path.exists(
                    os.path.join(root, name, "_COMPLETE")):
                os.remove(os.path.join(root, name, "_COMPLETE"))
                n += 1
    return n


def read_tiered(spark: SparkSession, table_path: str,
                tiers: dict[str, tuple[str, int]]) -> DataFrame:
    """Unified view over a tiered table: union of the base root and
    every tier root that holds data.  Each root is read with its own
    ``basePath`` so the hive partition column survives and partition
    pruning still works per root — a date-bounded query touches only
    the tiers its range reaches, which is the point of tiering."""
    out = None
    for root in [table_path] + [r for r, _d in tiers.values()]:
        if not os.path.isdir(root) or not any(
                not e.startswith(("_", ".")) for e in os.listdir(root)):
            continue
        df = spark.read.option("basePath", root).parquet(root)
        out = df if out is None else out.unionByName(df)
    if out is None:
        raise ValueError(f"no data under {table_path} or its tiers")
    return out


def refresh_rollup(spark: SparkSession, rollup_path: str,
                   new_events: DataFrame,
                   partition_col: str = "day",
                   epoch_key: str | None = None) -> int:
    """Incremental continuous-aggregate maintenance (the TimescaleDB
    cagg-refresh / druid delta-ingest analog for the stored hourly
    rollup): fold a NEW event batch into a day-partitioned rollup
    table of fixed schema (hour, event_type, n, sum_value — the
    prepared.rollup_hourly contract), rewriting ONLY the day
    partitions the batch touches.

    The rollup's measures are decomposable (count adds, sum adds), so
    the merge is a union + re-aggregate per affected partition — the
    batch's partials combine with the stored partials exactly as
    map-side partials combine in a shuffle.  Untouched days are never
    read or written (at 100 TB, a late-arriving hour costs one
    day-partition rewrite, not a full-table rebuild).  Rows with a
    NULL event time cannot be bucketed and are dropped here — route
    them through the ingest validation/dead-letter split upstream if
    they must be accounted for.

    ``epoch_key`` makes the fold IDEMPOTENT per (caller key, day): the
    key is written as an ``_epoch.<key>`` marker file INSIDE the new
    partition directory before the swap, so marker and merged data
    become visible in the same atomic rename — a retried fold skips
    every day whose live partition already carries the key, even if
    the previous attempt crashed between days (the streaming
    foreachBatch retry contract; see ``streaming.ingest.stream_rollup``).

    Layout: hive-partitioned by ``day`` (derived from ``hour``), hour-
    sorted within each partition.  Each partition rewrite is
    write-then-swap with the module's ``.rollup.old`` siblings, crash-
    recoverable via :func:`_recover_swap` on entry, and the swap is
    refused unless the tmp write committed (``_SUCCESS``), like every
    other swap in this module.  Creates the table on first call.
    Returns the number of day partitions rewritten."""
    new_partial = (new_events
                   .filter(F.col("ts").isNotNull())
                   .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"),
                            "event_type")
                   .agg(F.count(F.lit(1)).alias("n"),
                        F.sum("value").alias("sum_value"))
                   .withColumn(partition_col,
                               F.to_date("hour").cast("string"))
                   .persist())
    try:
        days = [r[0] for r in
                new_partial.select(partition_col).distinct().collect()]
        base = os.path.basename(rollup_path.rstrip("/"))
        parent = os.path.dirname(rollup_path.rstrip("/")) or "."
        n = 0
        for day in sorted(days):
            pdir = os.path.join(rollup_path, f"{partition_col}={day}")
            old = os.path.join(parent, f"{base}.rollup.old.{day}")
            tmp = os.path.join(parent, f"{base}.rollup.tmp.{day}")
            _recover_swap(pdir, old, tmp)
            if epoch_key is not None and os.path.exists(
                    os.path.join(pdir, f"_epoch.{epoch_key}")):
                continue               # retried fold: day already swapped
            batch_day = new_partial.filter(
                F.col(partition_col) == day).drop(partition_col)
            if os.path.isdir(pdir):
                stored = spark.read.parquet(pdir)
                merged = (stored.unionByName(batch_day)
                          .groupBy("hour", "event_type")
                          .agg(F.sum("n").alias("n"),
                               F.sum("sum_value").alias("sum_value")))
            else:
                merged = batch_day
            (merged.sortWithinPartitions("hour")
                   .write.mode("overwrite").parquet(tmp))
            if not os.path.exists(os.path.join(tmp, "_SUCCESS")):
                raise RuntimeError(f"rollup write did not commit: {tmp}")
            if epoch_key is not None:
                with open(os.path.join(tmp, f"_epoch.{epoch_key}"), "w"):
                    pass
            if os.path.isdir(pdir):
                os.rename(pdir, old)
            os.makedirs(rollup_path, exist_ok=True)
            os.rename(tmp, pdir)
            if os.path.isdir(old):
                shutil.rmtree(old)
            n += 1
        return n
    finally:
        new_partial.unpersist(blocking=False)
