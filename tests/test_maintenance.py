"""Compaction (major-compaction analog): small files merge to
target-size files, data survives byte-for-byte, swap is atomic
(write-then-rename), and a sort key restores clustering."""

import os

from pyspark.sql import functions as F

from datawave_spark.sources.maintenance import compact, parquet_file_count


def test_compact_merges_small_files(spark, tmp_path):
    path = str(tmp_path / "events")
    # 64 tiny files — the streaming-append pathology
    spark.range(0, 10000).select(
        F.col("id"), (F.col("id") % 7).alias("k")) \
        .repartition(64).write.parquet(path)
    assert parquet_file_count(path) == 64
    before = sorted(map(tuple, spark.read.parquet(path).collect()))

    n = compact(spark, path, target_file_bytes=10 * 1024 * 1024)
    assert n < 8                       # ~200KB of data → a few files
    assert parquet_file_count(path) == n
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before             # lossless
    assert not os.path.exists(path + ".compact.tmp")
    assert not os.path.exists(path + ".compact.old")


def test_compact_with_sort_restores_clustering(spark, tmp_path):
    path = str(tmp_path / "tbl")
    spark.range(0, 50000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("h")) \
        .repartition(32).write.parquet(path)
    compact(spark, path, target_file_bytes=512 * 1024, sort_by="id")
    # range clustering: per-file id ranges must be (near-)disjoint, so
    # an id-range filter prunes to ~one file via row-group stats
    import pyarrow.parquet as pq
    ranges = []
    for root, _d, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(root, f), columns=["id"])
                if t.num_rows:
                    ids = t.column("id").to_pylist()
                    ranges.append((min(ids), max(ids)))
    ranges.sort()
    assert len(ranges) >= 2
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi <= b_lo            # disjoint consecutive ranges


class TestMergeEvents:
    def _write(self, spark, path):
        import pyspark.sql.functions as F
        df = spark.createDataFrame(
            [("u1", "2024-01-01", 1.0), ("u2", "2024-01-01", 2.0),
             ("u3", "2024-01-02", 3.0)],
            "uid string, event_date string, value double")
        df.write.partitionBy("event_date").mode("overwrite") \
            .parquet(str(path))

    def test_upsert_replaces_matching_uid(self, spark, tmp_path):
        from datawave_spark.sources.maintenance import merge_events
        path = tmp_path / "events"
        self._write(spark, path)
        updates = spark.createDataFrame(
            [("u2", "2024-01-01", 20.0), ("u9", "2024-01-01", 9.0)],
            "uid string, event_date string, value double")
        n = merge_events(spark, str(path), updates)
        assert n == 1
        got = {r.uid: r.value
               for r in spark.read.parquet(str(path)).collect()}
        assert got == {"u1": 1.0, "u2": 20.0, "u9": 9.0, "u3": 3.0}

    def test_untouched_partitions_not_rewritten(self, spark, tmp_path):
        import os
        from datawave_spark.sources.maintenance import merge_events
        path = tmp_path / "events"
        self._write(spark, path)
        p2 = str(path / "event_date=2024-01-02")
        mtimes = {f: os.path.getmtime(os.path.join(p2, f))
                  for f in os.listdir(p2)}
        updates = spark.createDataFrame(
            [("u1", "2024-01-01", 11.0)],
            "uid string, event_date string, value double")
        merge_events(spark, str(path), updates)
        after = {f: os.path.getmtime(os.path.join(p2, f))
                 for f in os.listdir(p2)}
        assert mtimes == after  # 01-02 untouched

    def test_new_partition_created(self, spark, tmp_path):
        from datawave_spark.sources.maintenance import merge_events
        path = tmp_path / "events"
        self._write(spark, path)
        updates = spark.createDataFrame(
            [("u7", "2024-02-07", 7.0)],
            "uid string, event_date string, value double")
        merge_events(spark, str(path), updates)
        got = spark.read.parquet(str(path)) \
            .filter("event_date = '2024-02-07'").collect()
        assert [r.uid for r in got] == ["u7"]


class TestModifyField:
    def _write(self, spark, path):
        df = spark.createDataFrame(
            [("u1", "2024-01-01", ["a", "b"], 1.0),
             ("u2", "2024-01-01", ["c"], 2.0),
             ("u3", "2024-01-02", ["d"], 3.0)],
            "uid string, event_date string, tags array<string>, value double")
        df.write.partitionBy("event_date").mode("overwrite") \
            .parquet(str(path))

    def test_insert_adds_array_value(self, spark, tmp_path):
        from datawave_spark.sources.maintenance import modify_field
        path = tmp_path / "t"
        self._write(spark, path)
        n = modify_field(spark, str(path), "u1", "tags", "INSERT", "z")
        assert n == 1
        got = {r.uid: sorted(r.tags)
               for r in spark.read.parquet(str(path)).collect()}
        assert got["u1"] == ["a", "b", "z"] and got["u2"] == ["c"]

    def test_delete_removes_array_value(self, spark, tmp_path):
        from datawave_spark.sources.maintenance import modify_field
        path = tmp_path / "t"
        self._write(spark, path)
        modify_field(spark, str(path), "u1", "tags", "DELETE", "a")
        got = {r.uid: list(r.tags)
               for r in spark.read.parquet(str(path)).collect()}
        assert got["u1"] == ["b"]

    def test_update_scalar_and_targeted_delete(self, spark, tmp_path):
        from datawave_spark.sources.maintenance import modify_field
        path = tmp_path / "t"
        self._write(spark, path)
        modify_field(spark, str(path), "u3", "value", "UPDATE", 30.0)
        got = {r.uid: r.value
               for r in spark.read.parquet(str(path)).collect()}
        assert got["u3"] == 30.0 and got["u1"] == 1.0
        modify_field(spark, str(path), "u3", "value", "DELETE")
        got = {r.uid: r.value
               for r in spark.read.parquet(str(path)).collect()}
        assert got["u3"] is None

    def test_bad_mode_rejected(self, spark, tmp_path):
        import pytest as _pytest
        from datawave_spark.sources.maintenance import modify_field
        with _pytest.raises(ValueError, match="INSERT/UPDATE/DELETE"):
            modify_field(spark, "x", "u", "f", "UPSERT")


def test_merge_tmp_dirs_outside_table_root(spark, tmp_path, monkeypatch):
    # a crash between write and swap must not leave a directory that
    # partition discovery reads as a bogus partition
    import os
    from datawave_spark.sources import maintenance
    path = tmp_path / "t"
    spark.createDataFrame([("u1", "2024-01-01", 1.0)],
                          "uid string, event_date string, value double") \
        .write.partitionBy("event_date").parquet(str(path))
    calls = {}
    real_rename = os.rename

    def crashing_rename(a, b):
        calls["tmp"] = a
        raise RuntimeError("simulated crash at swap")

    monkeypatch.setattr(os, "rename", crashing_rename)
    updates = spark.createDataFrame([("u1", "2024-01-01", 9.0)],
                                    "uid string, event_date string, value double")
    try:
        maintenance.merge_events(spark, str(path), updates)
    except RuntimeError:
        pass
    monkeypatch.setattr(os, "rename", real_rename)
    # leftover tmp is a SIBLING of the table, so the table still reads
    # exactly its original rows
    got = spark.read.parquet(str(path)).collect()
    assert [r.value for r in got] == [1.0]


class TestCrashRecovery:
    def _write(self, spark, path):
        df = spark.createDataFrame(
            [("u1", "2024-01-01", 1.0), ("u2", "2024-01-01", 2.0),
             ("u3", "2024-01-02", 3.0)],
            "uid string, event_date string, value double")
        df.write.partitionBy("event_date").mode("overwrite") \
            .parquet(str(path))

    def test_merge_resumes_after_half_swap(self, spark, tmp_path):
        """Simulated crash between rename(pdir, old) and rename(tmp,
        pdir): pdir missing, live rows stranded in .merge.old.  A
        re-run must restore them before merging — NOT write the update
        batch alone."""
        import os
        from datawave_spark.sources.maintenance import merge_events
        path = tmp_path / "events"
        self._write(spark, path)
        pdir = str(path / "event_date=2024-01-01")
        old = str(path) + ".merge.old.2024-01-01"
        os.rename(pdir, old)          # the crash window state
        updates = spark.createDataFrame(
            [("u2", "2024-01-01", 20.0)],
            "uid string, event_date string, value double")
        merge_events(spark, str(path), updates)
        got = {r.uid: r.value
               for r in spark.read.parquet(str(path)).collect()}
        assert got == {"u1": 1.0, "u2": 20.0, "u3": 3.0}
        assert not os.path.exists(old)

    def test_merge_cleans_completed_swap_leftover(self, spark, tmp_path):
        """old-dir left AFTER a completed swap (crash during cleanup):
        the live pdir wins; the stale old is dropped, not restored."""
        import os
        import shutil
        from datawave_spark.sources.maintenance import merge_events
        path = tmp_path / "events"
        self._write(spark, path)
        pdir = str(path / "event_date=2024-01-01")
        old = str(path) + ".merge.old.2024-01-01"
        shutil.copytree(pdir, old)    # stale copy; pdir is live
        updates = spark.createDataFrame(
            [("u9", "2024-01-01", 9.0)],
            "uid string, event_date string, value double")
        merge_events(spark, str(path), updates)
        got = {r.uid for r in spark.read.parquet(str(path)).collect()}
        assert got == {"u1", "u2", "u3", "u9"}
        assert not os.path.exists(old)

    def test_modify_field_recovers_stranded_partition(self, spark, tmp_path):
        """modify_field discovers partitions by reading the table: a
        stranded partition is invisible, so the table-level sweep must
        restore it first."""
        import os
        from datawave_spark.sources.maintenance import modify_field
        path = tmp_path / "events"
        self._write(spark, path)
        pdir = str(path / "event_date=2024-01-01")
        old = str(path) + ".modify.old.2024-01-01"
        os.rename(pdir, old)
        modify_field(spark, str(path), "u1", "value", "UPDATE", 99.0)
        got = {r.uid: r.value
               for r in spark.read.parquet(str(path)).collect()}
        assert got["u1"] == 99.0 and got["u2"] == 2.0


class TestIncrementalIndex:
    def test_append_equals_full_rebuild(self, spark, tmp_path):
        from pyspark.sql import functions as F
        from datawave_spark.sources.index_frame import (build_index,
                                                        index_query)
        from datawave_spark.sources.maintenance import append_index
        rows = [(i, "click" if i % 2 else "view", i % 5)
                for i in range(40)]
        ev = spark.createDataFrame(rows, "event_id int, event_type string, grp int")
        old, new = ev.filter("event_id < 20"), ev.filter("event_id >= 20")
        path = str(tmp_path / "idx")
        build_index(old, ["event_type", "grp"], "event_id") \
            .write.partitionBy("field").parquet(path)
        n = append_index(spark, path, new, ["event_type", "grp"],
                         "event_id")
        assert n > 0
        merged = spark.read.parquet(path)
        full = build_index(ev, ["event_type", "grp"], "event_id")
        jexl = "EVENT_TYPE == 'click' && GRP == 3"
        got = {r.event_id for r in index_query(
            ev, merged, jexl, "event_id").collect()}
        want = {r.event_id for r in index_query(
            ev, full, jexl, "event_id").collect()}
        assert got == want and got
        # events from BOTH halves must be index-visible
        assert any(e < 20 for e in got) and any(e >= 20 for e in got)

    def test_compact_restores_clustering_per_field(self, spark, tmp_path):
        import os
        from datawave_spark.sources.index_frame import build_index
        from datawave_spark.sources.maintenance import (append_index,
                                                        compact)
        ev = spark.createDataFrame(
            [(i, f"t{i % 7}") for i in range(50)],
            "event_id int, event_type string")
        path = str(tmp_path / "idx")
        build_index(ev.filter("event_id < 25"), ["event_type"],
                    "event_id").write.partitionBy("field").parquet(path)
        append_index(spark, path, ev.filter("event_id >= 25"),
                     ["event_type"], "event_id")
        fdir = os.path.join(path, "field=EVENT_TYPE")
        n = compact(spark, fdir, sort_by="value")
        assert n >= 1
        got = spark.read.parquet(fdir).count()
        assert got == 50  # every (value, uid) survived the rewrite


class TestTiering:
    def _mk(self, spark, tmp_path, days):
        import datetime as dt
        base = str(tmp_path / "events")
        rows = [(i, dt.date(2024, 1, 31) - dt.timedelta(days=d), float(i))
                for i, d in enumerate(days)]
        df = spark.createDataFrame(rows, "id long, event_date date, v double")
        df.write.partitionBy("event_date").parquet(base)
        return base

    def test_floorkey_policy_moves_by_greatest_threshold(self, spark,
                                                         tmp_path):
        import datetime as dt
        from datawave_spark.sources.maintenance import tier_partitions
        base = self._mk(spark, tmp_path, [0, 5, 10, 40])
        tiers = {"warm": (str(tmp_path / "warm"), 7),
                 "cold": (str(tmp_path / "cold"), 30)}
        moves = dict(tier_partitions(base, tiers, now=dt.date(2024, 1, 31)))
        assert moves == {"2024-01-21": "warm", "2023-12-22": "cold"}
        assert os.path.isdir(
            str(tmp_path / "warm" / "event_date=2024-01-21"))
        assert os.path.isdir(
            str(tmp_path / "cold" / "event_date=2023-12-22"))
        # ages 0 and 5 stay in base
        assert os.path.isdir(os.path.join(base, "event_date=2024-01-31"))

    def test_idempotent_and_advances_with_time(self, spark, tmp_path):
        import datetime as dt
        from datawave_spark.sources.maintenance import tier_partitions
        base = self._mk(spark, tmp_path, [10])
        tiers = {"warm": (str(tmp_path / "warm"), 7),
                 "cold": (str(tmp_path / "cold"), 30)}
        assert len(tier_partitions(base, tiers,
                                   now=dt.date(2024, 1, 31))) == 1
        assert tier_partitions(base, tiers, now=dt.date(2024, 1, 31)) == []
        # 25 days later the same partition ages warm -> cold
        assert dict(tier_partitions(
            base, tiers, now=dt.date(2024, 2, 25))) == {"2024-01-21": "cold"}

    def test_conflict_raises_not_merges(self, spark, tmp_path):
        import datetime as dt
        import pytest
        from datawave_spark.sources.maintenance import tier_partitions
        base = self._mk(spark, tmp_path, [10])
        cold = str(tmp_path / "cold")
        os.makedirs(os.path.join(cold, "event_date=2024-01-21"))
        with pytest.raises(ValueError, match="already exists"):
            tier_partitions(base, {"cold": (cold, 7)},
                            now=dt.date(2024, 1, 31))

    def test_tiered_read_is_coverage_invariant_and_prunes(self, spark,
                                                          tmp_path):
        import datetime as dt
        from datawave_spark.sources.maintenance import (read_tiered,
                                                        tier_partitions)
        base = self._mk(spark, tmp_path, [0, 5, 10, 40])
        tiers = {"cold": (str(tmp_path / "cold"), 7)}
        before = spark.read.option("basePath", base).parquet(base) \
            .groupBy().sum("v").collect()[0][0]
        tier_partitions(base, tiers, now=dt.date(2024, 1, 31))
        view = read_tiered(spark, base, tiers)
        assert view.groupBy().sum("v").collect()[0][0] == before
        # date-bounded query partition-prunes within each root
        recent = view.filter(F.col("event_date") >= "2024-01-26")
        plan = recent._jdf.queryExecution().executedPlan().toString()
        assert plan.count("PartitionFilters: [isnotnull(event_date") >= 1
        assert recent.count() == 2

    def test_staged_move_recovery_states(self, spark, tmp_path):
        import datetime as dt
        from datawave_spark.sources.maintenance import (recover_tiers,
                                                        tier_partitions)
        base = self._mk(spark, tmp_path, [10, 40])
        cold = str(tmp_path / "cold")
        tiers = {"cold": (cold, 7)}
        os.makedirs(cold)
        pdir = "event_date=2024-01-21"

        # state A: stage without marker (interrupted copy), src intact
        os.makedirs(os.path.join(cold, f".{pdir}.tiertmp"))
        assert recover_tiers(base, tiers) == 1
        assert not os.path.exists(os.path.join(cold, f".{pdir}.tiertmp"))
        assert os.path.isdir(os.path.join(base, pdir))

        # state B: stage WITH marker (copy done, src not yet removed)
        import shutil
        stage = os.path.join(cold, f".{pdir}.tiertmp")
        shutil.copytree(os.path.join(base, pdir), stage)
        open(os.path.join(stage, "_COMPLETE"), "w").close()
        assert recover_tiers(base, tiers) == 1
        assert os.path.isdir(os.path.join(cold, pdir))
        assert not os.path.exists(os.path.join(base, pdir))
        assert not os.path.exists(os.path.join(cold, pdir, "_COMPLETE"))

        # state C: live partition with a leftover marker (step 5 crash)
        open(os.path.join(cold, pdir, "_COMPLETE"), "w").close()
        assert recover_tiers(base, tiers) == 1
        assert not os.path.exists(os.path.join(cold, pdir, "_COMPLETE"))

        # after recovery the normal run still works and is idempotent
        moves = tier_partitions(base, tiers, now=dt.date(2024, 1, 31))
        assert dict(moves) == {"2023-12-22": "cold"}

    def test_duplicate_days_back_raises(self, spark, tmp_path):
        import datetime as dt
        import pytest
        from datawave_spark.sources.maintenance import tier_partitions
        base = self._mk(spark, tmp_path, [10])
        with pytest.raises(ValueError, match="share days_back"):
            tier_partitions(base, {"warm": (str(tmp_path / "w"), 7),
                                   "cold": (str(tmp_path / "c"), 7)},
                            now=dt.date(2024, 1, 31))

    def test_unparseable_partition_value_stays_put(self, spark, tmp_path):
        import datetime as dt
        from datawave_spark.sources.maintenance import tier_partitions
        base = self._mk(spark, tmp_path, [40])
        weird = os.path.join(base, "event_date=__HIVE_DEFAULT_PARTITION__")
        os.makedirs(weird)
        tiers = {"cold": (str(tmp_path / "cold"), 7)}
        moves = tier_partitions(base, tiers, now=dt.date(2024, 1, 31))
        assert dict(moves) == {"2023-12-22": "cold"}
        assert os.path.isdir(weird)


class TestRollupRefresh:
    def _events(self, spark, ids):
        import datetime as dt
        rows = [(i, dt.datetime(2024, 1, 1 + (i % 3), i % 24),
                 "click" if i % 2 else "view", float(i)) for i in ids]
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string, "
                  "value double")

    def test_incremental_equals_scratch_and_touches_only_batch_days(
            self, spark, tmp_path):
        from datawave_spark.sources.maintenance import refresh_rollup
        path = str(tmp_path / "rollup")
        first = self._events(spark, range(40))
        assert refresh_rollup(spark, path, first) == 3
        # second batch touches only day 1 (i % 3 == 0 -> 2024-01-01)
        second = self._events(spark, [300, 303, 306])
        marker = os.path.getmtime(
            os.path.join(path, "day=2024-01-02"))
        assert refresh_rollup(spark, path, second) == 1
        assert os.path.getmtime(
            os.path.join(path, "day=2024-01-02")) == marker
        got = spark.read.parquet(path)
        want = (self._events(spark, list(range(40)) + [300, 303, 306])
                .groupBy(F.date_trunc("hour", "ts").alias("hour"),
                         "event_type")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("value").alias("sum_value")))
        a = {(r.hour, r.event_type): (r.n, r.sum_value)
             for r in got.collect()}
        b = {(r.hour, r.event_type): (r.n, r.sum_value)
             for r in want.collect()}
        assert a == b

    def test_crash_recovery_restores_stranded_day(self, spark, tmp_path):
        import shutil
        from datawave_spark.sources.maintenance import (recover_table,
                                                        refresh_rollup)
        path = str(tmp_path / "rollup")
        refresh_rollup(spark, path, self._events(spark, range(40)))
        pdir = os.path.join(path, "day=2024-01-01")
        old = str(tmp_path / "rollup.rollup.old.2024-01-01")
        n_before = spark.read.parquet(path).count()
        # simulate a crash between rename(pdir, old) and rename(tmp, pdir)
        shutil.move(pdir, old)
        assert recover_table(path, partition_col="day") >= 1
        assert os.path.isdir(pdir) and not os.path.exists(old)
        assert spark.read.parquet(path).count() == n_before
