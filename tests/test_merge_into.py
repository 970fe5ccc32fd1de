"""MERGE-shaped parquet sink: matched-replace / unmatched-keep / insert.

The reference's row-level UPDATE sites (ExecUtils.py:48-54, leaderboard
:275-287) map to this API; with a MERGE-capable format installed the
same signature becomes a native MERGE INTO.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tg_reporting_etl_spark.sources.writers import merge_into

SCHEMA = "k string, part int, v long"


def _read(spark, path):
    return {(r.k, r.part): r.v for r in spark.read.parquet(path).collect()}


def test_merge_into_semantics(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [("a", 1, 10), ("b", 1, 20), ("c", 2, 30)], SCHEMA
    )
    # first merge onto an absent target == plain write
    merge_into(spark, path, base, keys=["k"], partition_cols=["part"])
    assert _read(spark, path) == {("a", 1): 10, ("b", 1): 20, ("c", 2): 30}

    # replace a, insert d (both in partition 1); keep b; partition 2 untouched
    batch = spark.createDataFrame([("a", 1, 11), ("d", 1, 40)], SCHEMA)
    merge_into(spark, path, batch, keys=["k"], partition_cols=["part"])
    assert _read(spark, path) == {
        ("a", 1): 11,
        ("b", 1): 20,
        ("c", 2): 30,
        ("d", 1): 40,
    }


def test_merge_into_only_rewrites_touched_partitions(spark, tmp_path):
    import os

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([("a", 1, 10), ("c", 2, 30)], SCHEMA)
    merge_into(spark, path, base, keys=["k"], partition_cols=["part"])
    p2_files = sorted(os.listdir(os.path.join(path, "part=2")))

    batch = spark.createDataFrame([("a", 1, 99)], SCHEMA)
    merge_into(spark, path, batch, keys=["k"], partition_cols=["part"])
    # untouched partition's files are bit-identical (never rewritten)
    assert sorted(os.listdir(os.path.join(path, "part=2"))) == p2_files
    assert _read(spark, path) == {("a", 1): 99, ("c", 2): 30}


def test_merge_into_survives_static_session_conf(spark, tmp_path):
    """Regression: merge_into must not rely on the session-level
    partitionOverwriteMode.  Under Spark's default STATIC mode the
    overwrite would silently wipe every partition absent from the batch
    — the dynamic mode is forced per-write instead."""
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "static")
    try:
        path = str(tmp_path / "tbl")
        base = spark.createDataFrame([("a", 1, 10), ("c", 2, 30)], SCHEMA)
        merge_into(spark, path, base, keys=["k"], partition_cols=["part"])

        batch = spark.createDataFrame([("a", 1, 99)], SCHEMA)
        merge_into(spark, path, batch, keys=["k"], partition_cols=["part"])
        # partition 2 untouched by the batch must survive STATIC sessions
        assert _read(spark, path) == {("a", 1): 99, ("c", 2): 30}

        from tg_reporting_etl_spark.sources.writers import overwrite_window_partitions

        win = spark.createDataFrame([("a", 1, 7)], SCHEMA)
        overwrite_window_partitions(win, path, ["part"])
        assert _read(spark, path) == {("a", 1): 7, ("c", 2): 30}
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)


def test_merge_into_unpartitioned_snapshot(spark, tmp_path):
    path = str(tmp_path / "snap")
    base = spark.createDataFrame([("a", 1, 10), ("b", 1, 20)], SCHEMA)
    merge_into(spark, path, base, keys=["k"])
    # the merged plan may read the live snapshot — two-phase staging
    grown = spark.read.parquet(path).withColumn("v", F.col("v") + 1)
    merge_into(spark, path, grown, keys=["k"])
    assert _read(spark, path) == {("a", 1): 11, ("b", 1): 21}


def test_merge_into_unpartitioned_leaves_no_temp_dir(spark, tmp_path):
    import os

    path = str(tmp_path / "snap")
    base = spark.createDataFrame([("a", 1, 10)], SCHEMA)
    merge_into(spark, path, base, keys=["k"])
    merge_into(spark, path, spark.createDataFrame([("b", 1, 20)], SCHEMA), keys=["k"])
    assert not os.path.exists(path + "._merge_tmp")
    assert _read(spark, path) == {("a", 1): 10, ("b", 1): 20}


def test_merge_into_self_heals_crashed_swap(spark, tmp_path):
    """A crash between the swap's delete and rename leaves the complete
    merged table durable in the temp dir; the next merge must rename it
    back into place BEFORE reading, so kept rows survive."""
    import os
    import shutil

    path = str(tmp_path / "snap")
    base = spark.createDataFrame([("a", 1, 10), ("b", 1, 20)], SCHEMA)
    merge_into(spark, path, base, keys=["k"])

    # simulate the crash window: merged output durable in tmp, target gone
    shutil.move(path, path + "._merge_tmp")
    assert not os.path.exists(path)

    batch = spark.createDataFrame([("a", 1, 99)], SCHEMA)
    merge_into(spark, path, batch, keys=["k"])
    # without the heal, bootstrap-overwrite would have dropped row b
    assert _read(spark, path) == {("a", 1): 99, ("b", 1): 20}


def test_merge_backend_selection_defaults_to_parquet(spark):
    """No Delta jar in this container: the probe must fail closed and
    dispatch must land on the parquet backend."""
    from tg_reporting_etl_spark.sources import writers as w

    assert w._delta_available(spark) is False
    assert w.selected_merge_backend_name(spark) == "parquet"
    assert w._select_merge_backend(spark) is w._merge_parquet


def test_merge_backend_registry_prefers_available_native(spark, tmp_path, monkeypatch):
    """A registered backend whose probe passes takes over merge_into;
    one whose probe fails is skipped.  (This is exactly how the Delta
    entry activates in an environment that ships the jar.)"""
    from tg_reporting_etl_spark.sources import writers as w

    calls = []

    def fake_merge(spark_, target, batch, keys, partition_cols=None):
        calls.append((target, tuple(keys)))

    monkeypatch.setattr(
        w, "_MERGE_BACKENDS",
        [("fake-native", lambda s: True, fake_merge), *w._MERGE_BACKENDS],
    )
    assert w.selected_merge_backend_name(spark) == "fake-native"
    base = spark.createDataFrame([("a", 1, 10)], SCHEMA)
    w.merge_into(spark, str(tmp_path / "t"), base, keys=["k"])
    assert calls == [(str(tmp_path / "t"), ("k",))]

    # probe failure -> fall through to parquet
    monkeypatch.setattr(
        w, "_MERGE_BACKENDS",
        [("unavailable", lambda s: False, fake_merge),
         ("parquet", lambda s: True, w._merge_parquet)],
    )
    assert w.selected_merge_backend_name(spark) == "parquet"
    w.merge_into(spark, str(tmp_path / "t2"), base, keys=["k"])
    assert _read(spark, str(tmp_path / "t2")) == {("a", 1): 10}  # really wrote


def _install_fake_delta(monkeypatch, *, is_table: bool, calls: dict):
    """Inject a stub ``delta.tables.DeltaTable`` into sys.modules so
    _merge_delta's body executes without the jar, recording the merge
    condition / clause chain / bootstrap write it would issue."""
    import sys
    import types

    class FakeMerge:
        def __init__(self, path, source, cond):
            calls["merge"] = {"path": path, "source": source, "cond": cond, "clauses": []}

        def whenMatchedUpdateAll(self):
            calls["merge"]["clauses"].append("whenMatchedUpdateAll")
            return self

        def whenNotMatchedInsertAll(self):
            calls["merge"]["clauses"].append("whenNotMatchedInsertAll")
            return self

        def execute(self):
            calls["merge"]["executed"] = True

    class FakeDeltaTable:
        @staticmethod
        def isDeltaTable(spark, path):
            calls["probed"] = path
            return is_table

        @staticmethod
        def forPath(spark, path):
            class _Aliased:
                def merge(self, source, cond):
                    return FakeMerge(path, source, cond)

            class _Target:
                def alias(self, a):
                    calls["target_alias"] = a
                    return _Aliased()

            return _Target()

    mod = types.ModuleType("delta")
    tables = types.ModuleType("delta.tables")
    tables.DeltaTable = FakeDeltaTable
    mod.tables = tables
    monkeypatch.setitem(sys.modules, "delta", mod)
    monkeypatch.setitem(sys.modules, "delta.tables", tables)


class _FakeBatch:
    """Records the write-chain / alias calls _merge_delta makes; no JVM."""

    def __init__(self, calls: dict):
        self._calls = calls

    @property
    def write(self):
        calls = self._calls

        class _W:
            def format(self, f):
                calls["write"] = {"format": f}
                return self

            def mode(self, m):
                calls["write"]["mode"] = m
                return self

            def partitionBy(self, *cols):
                calls["write"]["partitionBy"] = cols
                return self

            def save(self, path):
                calls["write"]["saved"] = path

        return _W()

    def alias(self, a):
        self._calls["batch_alias"] = a
        return ("aliased-batch", a)


def test_merge_delta_bootstrap_overwrites_on_first_write(monkeypatch):
    """Target not yet a Delta table -> plain overwrite write (with the
    partition spec), no MERGE attempted."""
    from tg_reporting_etl_spark.sources import writers as w

    calls: dict = {}
    _install_fake_delta(monkeypatch, is_table=False, calls=calls)
    w._merge_delta(None, "/tmp/delta_t", _FakeBatch(calls), keys=["k"], partition_cols=["part"])
    assert calls["probed"] == "/tmp/delta_t"
    assert calls["write"] == {
        "format": "delta",
        "mode": "overwrite",
        "partitionBy": ("part",),
        "saved": "/tmp/delta_t",
    }
    assert "merge" not in calls


def test_merge_delta_builds_null_safe_merge(monkeypatch):
    """Existing Delta target -> MERGE INTO with a null-safe (<=>) key
    condition (matching the parquet backend's anti-join NULL semantics),
    update-all + insert-all clauses, and an execute() commit."""
    from tg_reporting_etl_spark.sources import writers as w

    calls: dict = {}
    _install_fake_delta(monkeypatch, is_table=True, calls=calls)
    w._merge_delta(
        None, "/tmp/delta_t", _FakeBatch(calls), keys=["summary_date", "player_name"]
    )
    m = calls["merge"]
    assert m["cond"] == "t.summary_date <=> s.summary_date AND t.player_name <=> s.player_name"
    assert calls["target_alias"] == "t" and calls["batch_alias"] == "s"
    assert m["source"] == ("aliased-batch", "s")
    assert m["clauses"] == ["whenMatchedUpdateAll", "whenNotMatchedInsertAll"]
    assert m["executed"] is True
    assert "write" not in calls  # no bootstrap write on the merge path


def test_delta_probe_activates_backend_when_importable(monkeypatch):
    """With the python package importable and the jar class resolvable,
    the registry dispatches merge_into to the Delta backend."""
    import types

    from tg_reporting_etl_spark.sources import writers as w

    _install_fake_delta(monkeypatch, is_table=True, calls={})
    jvm = types.SimpleNamespace(
        java=types.SimpleNamespace(
            lang=types.SimpleNamespace(Class=types.SimpleNamespace(forName=lambda n: object))
        )
    )
    fake_spark = types.SimpleNamespace(_jvm=jvm)
    assert w._delta_available(fake_spark) is True
    assert w.selected_merge_backend_name(fake_spark) == "delta"
    assert w._select_merge_backend(fake_spark) is w._merge_delta


def test_register_merge_backend_orders_above_parquet(spark):
    from tg_reporting_etl_spark.sources import writers as w

    before = list(w._MERGE_BACKENDS)
    try:
        w.register_merge_backend("iceberg", lambda s: False, lambda *a: None, front=False)
        names = [n for n, _, _ in w._MERGE_BACKENDS]
        assert names.index("iceberg") < names.index("parquet")
        w.register_merge_backend("custom", lambda s: False, lambda *a: None, front=True)
        assert w._MERGE_BACKENDS[0][0] == "custom"
    finally:
        w._MERGE_BACKENDS[:] = before


def test_partitioned_merge_releases_checkpoint_blocks(spark, tmp_path):
    """The eager localCheckpoint behind a partitioned merge must not
    leak storage: every RDD storage-info entry CREATED by the merge
    calls is gone once merge_into returns (streaming foreachBatch runs
    one merge per micro-batch — deterministic release, not GC luck).

    Scoped to the id-set difference, not a global count: earlier tests
    in a full-suite run may leave their own cached/checkpointed RDDs
    in the process-global gauge, and those must not fail this test.
    """
    def stored_ids():
        return {
            info.id() for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        }

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([("a", 1, 10), ("c", 2, 30)], SCHEMA)
    merge_into(spark, path, base, keys=["k"], partition_cols=["part"])  # bootstrap
    before = stored_ids()
    for i in range(3):
        batch = spark.createDataFrame([("a", 1, 100 + i)], SCHEMA)
        merge_into(spark, path, batch, keys=["k"], partition_cols=["part"])
    leaked = stored_ids() - before
    assert leaked == set(), f"merge_into leaked storage for RDD ids {sorted(leaked)}"
    assert _read(spark, path) == {("a", 1): 102, ("c", 2): 30}


def test_compact_table_unpartitioned(spark, tmp_path):
    """20 small files -> num_files larger ones, byte-identical data;
    swap protocol shares the merge self-heal contract."""
    import glob

    from tg_reporting_etl_spark.sources.writers import compact_table

    path = str(tmp_path / "frag")
    df = spark.range(1000).select(F.col("id"), (F.col("id") * 2).alias("v"))
    df.repartition(20).write.parquet(path)
    assert len(glob.glob(path + "/part-*")) == 20

    compact_table(spark, path, num_files=2)
    assert len(glob.glob(path + "/part-*")) == 2
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.agg(F.sum("v")).first()[0] == 999 * 1000


def test_compact_table_partitioned(spark, tmp_path):
    """Partitioned table: one file per partition after compaction."""
    import glob

    from tg_reporting_etl_spark.sources.writers import compact_table

    path = str(tmp_path / "frag_part")
    df = spark.range(400).select(
        F.col("id"), (F.col("id") % 4).alias("day"), (F.col("id") * 3).alias("v")
    )
    df.repartition(10).write.partitionBy("day").parquet(path)
    assert len(glob.glob(path + "/day=1/part-*")) > 1

    compact_table(spark, path, partition_cols=["day"])
    for d in range(4):
        assert len(glob.glob(path + f"/day={d}/part-*")) == 1
    back = spark.read.parquet(path)
    assert back.count() == 400
    assert back.agg(F.sum("v")).first()[0] == 3 * sum(range(400))


def test_write_clustered_narrows_rowgroup_stats(spark, tmp_path):
    """Clustered layout: per-file user_id min/max ranges are narrow and
    pairwise disjoint (pyarrow footer stats), vs the unclustered write
    where every file spans ~the whole key domain — the measurable
    precondition for parquet stats-based file/row-group skipping."""
    import glob

    import pyarrow.parquet as pq

    from tg_reporting_etl_spark.sources.writers import write_clustered

    df = spark.range(40_000).select(
        (F.xxhash64("id") % 1000).alias("user_id"), F.col("id").alias("v")
    )

    def file_ranges(path):
        out = []
        for f in sorted(glob.glob(path + "/part-*.parquet")):
            md = pq.ParquetFile(f).metadata
            los, his = [], []
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(0)  # user_id
                los.append(col.statistics.min)
                his.append(col.statistics.max)
            out.append((min(los), max(his)))
        return out

    base = str(tmp_path / "unclustered")
    df.repartition(4).write.parquet(base)
    clustered = str(tmp_path / "clustered")
    write_clustered(df, clustered, ["user_id"], files_per_partition=4)

    domain = 2000  # user_id spans about [-1000, 1000]
    wide = file_ranges(base)
    narrow = sorted(file_ranges(clustered))
    assert all(hi - lo > 0.8 * domain for lo, hi in wide)        # every file spans ~all keys
    assert all(hi - lo < 0.5 * domain for lo, hi in narrow)      # clustered files are slices
    for (_, hi_a), (lo_b, _) in zip(narrow, narrow[1:]):          # and pairwise disjoint
        assert hi_a <= lo_b
    # data survives intact
    assert spark.read.parquet(clustered).agg(F.sum("v")).first()[0] == sum(range(40_000))


# ------------------------------------------- real-Delta activation (env-gated)


def _delta_probe_spark():
    """Build a Delta-enabled session ONLY when the environment ships
    delta-spark (python pkg + jar); None otherwise.  Mirrors the Pillow
    pattern in test_llm_layer.py: the test self-activates in richer
    environments and skips honestly here."""
    try:
        import delta  # noqa: F401
        from delta import configure_spark_with_delta_pip
        from pyspark.sql import SparkSession

        builder = (
            SparkSession.builder.master("local[2]")
            .appName("delta-probe")
            .config("spark.ui.enabled", "false")
            .config(
                "spark.sql.extensions",
                "io.delta.sql.DeltaSparkSessionExtension",
            )
            .config(
                "spark.sql.catalog.spark_catalog",
                "org.apache.spark.sql.delta.catalog.DeltaCatalog",
            )
        )
        s = configure_spark_with_delta_pip(builder).getOrCreate()
        s._jvm.java.lang.Class.forName("io.delta.tables.DeltaTable")
        return s
    except Exception:
        return None


_HAS_DELTA = False
try:
    import delta  # noqa: F401

    _HAS_DELTA = True
except Exception:
    pass


@pytest.mark.skipif(not _HAS_DELTA, reason="delta-spark not installed in this container")
def test_merge_into_activates_real_delta_backend(tmp_path):
    """Integration twin of the fake-module tests above: with delta-spark
    actually installed, the registry must select the delta backend and a
    merge_into round-trip must land a transactional MERGE INTO (upsert +
    insert, untouched rows kept) on a real Delta table."""
    from tg_reporting_etl_spark.sources import writers as w

    s = _delta_probe_spark()
    if s is None:
        pytest.skip("delta python pkg present but jar not loadable")
    try:
        assert w.selected_merge_backend_name(s) == "delta"
        path = str(tmp_path / "delta_target")
        base = s.createDataFrame(
            [("k1", 1), ("k2", 2)], "k string, v int"
        )
        w.merge_into(s, path, base, keys=["k"])  # bootstrap write
        batch = s.createDataFrame(
            [("k2", 20), ("k3", 30)], "k string, v int"
        )
        w.merge_into(s, path, batch, keys=["k"])  # MERGE: update k2, insert k3
        got = {r.k: r.v for r in s.read.format("delta").load(path).collect()}
        assert got == {"k1": 1, "k2": 20, "k3": 30}
    finally:
        s.stop()


def test_compact_table_heals_crashed_swap(spark, tmp_path):
    """A crash between the tmp write and the rename leaves target
    missing + tmp complete; the next compact_table must rename the
    orphan into place before reading — same self-heal contract as the
    unpartitioned merge."""
    from tg_reporting_etl_spark.sources.writers import compact_table

    path = str(tmp_path / "t")
    spark.range(10).withColumn("v", F.col("id") * 2).write.parquet(path + "._merge_tmp")
    # no target dir at all — only the orphaned tmp survives the "crash"
    compact_table(spark, path, num_files=1)
    got = sorted((r.id, r.v) for r in spark.read.parquet(path).collect())
    assert got == [(i, 2 * i) for i in range(10)]
    import os
    assert not os.path.exists(path + "._merge_tmp")
