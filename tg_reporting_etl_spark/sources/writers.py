"""Idempotent sinks.

The reference guarantees window idempotency with DELETE-before-INSERT
keyed on (summary_date[, hours[, mins]]) plus optional platform/site/game
filters (task-executor/trans_summary/trans_summary_5min.py:103-128 and 11
sibling sites — SURVEY.md §2.1 S3).  The Spark-native equivalent is
dynamic partition overwrite on tables partitioned by exactly those delete
keys: rewriting a window replaces only the partitions the new batch
touches, atomically per partition, and re-running a window job is a no-op
change.  At 100 TB this also gives partition pruning on every tier read.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame


@contextmanager
def control_scope(spark):
    """Execute CONTROL-TABLE-sized actions (rerun journal, task board,
    alert state — frames of at most thousands of rows by contract)
    without AQE and with ONE shuffle partition.

    Under AQE every exchange in a plan materializes as its own job, so
    a journal update (read + union/dedup + repartition(1) + swap write)
    schedules 2+ jobs where one suffices — and on metadata-sized frames
    the per-job scheduling round trip (~0.15-0.2 s on the bench box) IS
    the cost, there is no data to adapt to.  Shuffle partitions pin to
    1 because a 32-way exchange of a 50-row frame spends more on task
    launches than on bytes.  Both confs are session-scoped and restored
    in ``finally``; the runner paths using this are single-threaded.

    NEVER wrap data-sized plans: AQE's skew handling and partition
    coalescing are exactly the 100 TB story there (digest-index merges,
    tier writes, and every catalog data path stay outside).
    """
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    old_sp = spark.conf.get("spark.sql.shuffle.partitions", "200")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)


def write_append(df: DataFrame, path: str, partition_cols: list[str] | None = None) -> None:
    """Plain append — reference ``to_sql(if_exists='append')`` analog
    (trans_summary_5min.py:49)."""
    writer = df.write.mode("append")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def overwrite_window_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Delete-before-insert as dynamic partition overwrite.

    The dynamic mode is forced per-write (Spark >= 2.4 honours the
    ``partitionOverwriteMode`` write option over the session conf), so the
    sink keeps delete-before-insert semantics even on a vanilla session
    where ``spark.sql.sources.partitionOverwriteMode`` is still STATIC —
    under STATIC the identical plan would silently drop every partition
    not present in ``df``.  Only partitions present in ``df`` are
    replaced; all other windows are untouched.  This is the
    exactly-once-ish sink semantics of SURVEY.md §2.10 ST6.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def _release_local_checkpoint(df: DataFrame) -> None:
    """Free the memory-and-disk blocks behind ``df.localCheckpoint()``.

    ``Dataset.unpersist`` only covers CacheManager-registered persists,
    not the RDD a local checkpoint pinned — without this, a long-lived
    driver (streaming foreachBatch runs a merge every micro-batch)
    relies on py4j GC + the async ContextCleaner to drop blocks, which
    can let executor storage accumulate.  Best-effort: on any internal-
    API mismatch the async cleaner remains the fallback.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        plan.rdd().unpersist(False)
    except Exception:
        pass


def _fs_path(spark, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _heal_swap(spark, target_path: str, tmp_path: str) -> None:
    """Self-heal a crash inside a previous swap window: target gone but
    the fully-written temp dir survived — rename it into place."""
    try:
        fs, jtarget = _fs_path(spark, target_path)
        _, jtmp = _fs_path(spark, tmp_path)
        if not fs.exists(jtarget) and fs.exists(jtmp):
            fs.rename(jtmp, jtarget)
    except Exception:
        pass


def _swap_write(spark, target_path: str, tmp_path: str, df: DataFrame) -> None:
    """Write ``df`` to a durable sibling temp dir, then swap it in with
    two filesystem metadata ops (delete + rename).  ``df`` may read the
    live target: the target is never the write destination, so no
    lineage hazard and no checkpoint; a crash inside the swap window is
    healed by :func:`_heal_swap` on the next write/read."""
    df.write.mode("overwrite").parquet(tmp_path)
    fs, jtarget = _fs_path(spark, target_path)
    _, jtmp = _fs_path(spark, tmp_path)
    fs.delete(jtarget, True)
    fs.rename(jtmp, jtarget)


def overwrite_small_table(spark, target_path: str, df: DataFrame, *, presized: bool = False) -> None:
    """Atomically replace a SMALL unpartitioned control table (rerun
    journal, alert state) with ``df`` — which may be derived from the
    live table itself.  One distributed write + two FS metadata ops;
    repartition(1) (NOT coalesce — coalesce(1) pulls the 1-partition
    constraint up through the plan and serializes every upstream join
    into a single task, and on a parallelized tiny frame stalls ~4 s in
    scheduler locality wait) lands one file, because control tables are
    metadata-sized and per-file open cost dominates their reads.

    ``presized=True`` skips that repartition: callers whose plan already
    lands in one-or-few partitions (a projection of the single-file live
    table, or an AQE-coalesced tiny shuffle) save a whole shuffle stage
    per write — half the fixed cost of a journal update."""
    tmp_path = target_path.rstrip("/") + "._merge_tmp"
    _heal_swap(spark, target_path, tmp_path)
    # control_scope: the whole plan (live-table read + caller transform
    # + repartition) executes inside the write action, so one scope here
    # collapses the AQE per-exchange job pair for every caller
    with control_scope(spark):
        _swap_write(spark, target_path, tmp_path, df if presized else df.repartition(1))


def merge_into(
    spark,
    target_path: str,
    batch: DataFrame,
    keys: list[str],
    partition_cols: list[str] | None = None,
) -> None:
    """MERGE-shaped upsert onto a table — backend-dispatched.

    Semantics (the reference's row-level UPDATE sites — ExecUtils.py:48-54,
    risk_ctrl_rtp_1d.py:122-170 — and Delta's ``MERGE INTO`` with
    when_matched=overwrite, when_not_matched=insert):

    - target rows whose ``keys`` match a batch row are REPLACED by it;
    - target rows with no batch match are KEPT untouched;
    - batch rows with no target match are INSERTED.

    The concrete write strategy comes from the MERGE BACKEND REGISTRY:
    the highest-priority backend whose availability probe passes wins.
    With Delta installed (jar + python package) the same signature maps
    onto a native ``MERGE INTO`` — a transactional metadata commit with
    none of the parquet path's swap/rewrite windows; this container has
    no such jar, so the parquet backend below is what runs everywhere
    today.  The dispatch itself is unit-tested so richer environments
    activate automatically.
    """
    _select_merge_backend(spark)(spark, target_path, batch, keys, partition_cols)


def _merge_parquet(
    spark,
    target_path: str,
    batch: DataFrame,
    keys: list[str],
    partition_cols: list[str] | None = None,
) -> None:
    """Parquet merge backend, two write strategies:

    PARTITIONED (``partition_cols`` given): only the partitions the
    batch touches are read, merged (anti-join on keys + union) and
    rewritten via dynamic partition overwrite — cost scales with the
    touched partitions, never the table.  The merged plan reads the
    live target files, so its lineage is truncated with an eager
    ``localCheckpoint`` before the overwrite (the write must not read
    what it is deleting); the checkpoint blocks are released
    deterministically after the write.  Idempotency caveat: the
    overwrite deletes touched partitions before rewriting them from
    executor-local blocks, so a mid-write failure can leave a partition
    partial — "re-running the merge heals it" holds only while the
    SOURCE rows for the batch are still available; with a MERGE-capable
    format (Delta/Iceberg) the swap would be a metadata commit instead.

    UNPARTITIONED (rerun journal / alert state — small control tables):
    the merged rows are written to a durable sibling temp dir, then
    swapped in with two filesystem metadata ops (delete + rename).  The
    target is never the write destination, so a mid-write failure
    leaves it untouched; a crash inside the swap window leaves the
    complete merged table durable in the temp dir, and the next merge
    self-heals by renaming it into place before reading.  No
    checkpoint, one distributed write, no executor-storage footprint.
    """
    from pyspark.sql import functions as F

    tmp_path = target_path.rstrip("/") + "._merge_tmp"
    if not partition_cols:
        _heal_swap(spark, target_path, tmp_path)

    from tg_reporting_etl_spark.sources.readers import fs_path_exists

    # FS-probe first: the common bootstrap (no target yet) costs one
    # metadata call and prints no stack trace.  The read-and-catch stays
    # for the one case existence can't distinguish — a target dir
    # holding only empty marker partitions has no files to infer a
    # schema from and must also take the bootstrap branch.
    target = None
    if fs_path_exists(spark, target_path):
        try:
            target = spark.read.parquet(target_path)
            target.schema  # force resolution
        except Exception:
            target = None
    if target is None:
        writer = batch.write.mode("overwrite")
        if partition_cols:
            # dynamic even on bootstrap: a target dir holding only empty
            # marker partitions (touched-but-empty days, runner/state.py)
            # has no files to infer a schema from and lands here — a
            # STATIC overwrite would wipe those markers
            writer = writer.option("partitionOverwriteMode", "dynamic").partitionBy(
                *partition_cols
            )
        writer.parquet(target_path)
        return

    # Pin the batch ONCE before building the merged plan: it appears
    # two-to-three times in that DAG (touched-partition set, anti-join
    # key set, union branch), and each reference re-executes the
    # caller's batch plan — a stateful micro-batch pipeline in
    # foreachBatch callers, a multi-day chain in the rtp state saves.
    # Callers that already hand over a block-backed leaf (the streaming
    # sinks localCheckpoint for their own emptiness guard) are detected
    # and not copied again.
    batch, pinned = _pin_once(batch)
    try:
        if partition_cols:
            # restrict the merge to touched partitions (broadcast semi
            # join on the partition tuple -> partition pruning on the
            # scan)
            touched = batch.select(*partition_cols).distinct()
            target = target.join(F.broadcast(touched), partition_cols, "left_semi")
        kept = target.join(batch.select(*keys).distinct(), keys, "left_anti")
        merged = kept.select(*batch.columns).unionByName(batch)

        if not partition_cols:
            # temp-dir + rename swap: merged reads the live target,
            # writes elsewhere — no lineage hazard, no checkpoint
            _swap_write(spark, target_path, tmp_path, merged)
            return
        _merge_write_partitioned(spark, target_path, merged, partition_cols)
    finally:
        if pinned:
            _release_local_checkpoint(batch)


def _pin_once(df: DataFrame):
    """``localCheckpoint(eager=True)`` unless the plan already IS a
    block-backed leaf (LogicalRDD — e.g. a frame the caller pinned);
    returns ``(frame, we_pinned_it)``.  Detection is best-effort: on
    any internal-API mismatch the frame is pinned normally."""
    try:
        leaf = (
            df._jdf.queryExecution().analyzed().getClass().getSimpleName()
            == "LogicalRDD"
        )
    except Exception:
        leaf = False
    if leaf:
        return df, False
    return df.localCheckpoint(eager=True), True


def _merge_write_partitioned(spark, target_path: str, merged: DataFrame, partition_cols) -> None:

    # Partition-level swap: write the merged rows — which READ the live
    # target files — to a durable sibling temp dir, then swap each
    # touched leaf partition dir into the target with filesystem
    # metadata ops.  The target is never the write destination, so
    # there is no read-what-you-delete lineage hazard and therefore no
    # eager localCheckpoint: the merged rows are materialized ONCE (the
    # parquet write) instead of twice (block-manager checkpoint + write
    # re-reading the blocks), which halves the per-merge write cost —
    # material in streaming foreachBatch, where this runs every
    # micro-batch.  Only partitions present in `merged` (== the touched
    # set: merged ⊇ batch and every touched partition carries at least
    # one batch row) are swapped, exactly dynamic partition overwrite's
    # replacement set.  Crash posture is unchanged-or-better: the temp
    # write completes durably before any target mutation, and a crash
    # mid-swap leaves each partition either whole-old or whole-new
    # (the old path's per-partition delete+stage-move had the same
    # non-atomicity across partitions); a stale temp dir is cleared on
    # the next merge.
    swap_tmp = target_path.rstrip("/") + "._merge_parts_tmp"
    fs, jtmp = _fs_path(spark, swap_tmp)
    fs.delete(jtmp, True)
    merged.write.mode("overwrite").partitionBy(*partition_cols).parquet(swap_tmp)
    _, jtarget = _fs_path(spark, target_path)
    _swap_partition_dirs(fs, jtmp, jtarget, len(partition_cols))
    fs.delete(jtmp, True)


def _swap_partition_dirs(fs, jsrc_root, jdst_root, depth: int) -> None:
    """Move every depth-``depth`` ``col=value`` leaf dir under
    ``jsrc_root`` into place under ``jdst_root`` (delete-then-rename —
    the FS-metadata form of delete-before-insert, O(touched leaves)
    ops).  Non-directory entries (_SUCCESS markers) are skipped."""
    made_parent = False
    for st in fs.listStatus(jsrc_root):
        if not st.isDirectory():
            continue
        jsrc = st.getPath()
        jdst = jdst_root.suffix("/" + jsrc.getName())
        if depth <= 1:
            if not made_parent:
                fs.mkdirs(jdst_root)
                made_parent = True
            fs.delete(jdst, True)
            fs.rename(jsrc, jdst)
        else:
            _swap_partition_dirs(fs, jsrc, jdst, depth - 1)


# ------------------------------------------------- merge backend registry
#
# Ordered (priority desc) list of (name, available?, merge_fn).  The
# first backend whose probe passes handles merge_into; the parquet
# backend always passes, so dispatch never fails.  register_merge_backend
# lets deployments plug in Iceberg/Hudi/... without touching this module.

def _delta_available(spark) -> bool:
    """True when both the Delta python package and the jar are loadable."""
    try:
        import delta  # noqa: F401  (pip package 'delta-spark')
        spark._jvm.java.lang.Class.forName("io.delta.tables.DeltaTable")
        return True
    except Exception:
        return False


def _merge_delta(
    spark,
    target_path: str,
    batch: DataFrame,
    keys: list[str],
    partition_cols: list[str] | None = None,
) -> None:
    """Native Delta ``MERGE INTO`` — a transactional commit, no
    delete/rename swap window and no checkpoint: Delta's log swaps file
    sets atomically.  ``<=>`` key equality so NULL key components match
    like the parquet backend's anti-join does."""
    from delta.tables import DeltaTable

    if not DeltaTable.isDeltaTable(spark, target_path):
        writer = batch.write.format("delta").mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.save(target_path)
        return
    cond = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
    (
        DeltaTable.forPath(spark, target_path)
        .alias("t")
        .merge(batch.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )


_MERGE_BACKENDS: list[tuple[str, object, object]] = [
    ("delta", _delta_available, _merge_delta),
    ("parquet", lambda spark: True, _merge_parquet),
]


def register_merge_backend(name: str, available, merge_fn, *, front: bool = True) -> None:
    """Plug in a MERGE backend (e.g. Iceberg).  ``available(spark) ->
    bool`` probes the environment; ``merge_fn`` has merge_into's
    signature.  ``front=True`` gives it priority over the built-ins."""
    entry = (name, available, merge_fn)
    if front:
        _MERGE_BACKENDS.insert(0, entry)
    else:
        _MERGE_BACKENDS.insert(len(_MERGE_BACKENDS) - 1, entry)  # above parquet


def selected_merge_backend_name(spark) -> str:
    """Which backend merge_into would dispatch to on this session."""
    for name, available, _ in _MERGE_BACKENDS:
        if available(spark):
            return name
    return "parquet"


def _select_merge_backend(spark):
    for _, available, merge_fn in _MERGE_BACKENDS:
        if available(spark):
            return merge_fn
    return _merge_parquet


def compact_table(
    spark,
    path: str,
    num_files: int = 1,
    partition_cols: list[str] | None = None,
) -> None:
    """Rewrite a parquet table into fewer, larger files — the
    maintenance pass every micro-batch streaming sink eventually needs
    (each trigger appends small files; scan cost degrades with file
    count, not data volume).

    UNPARTITIONED: coalesce to ``num_files`` and swap via the SAME
    temp-dir + rename protocol (and the same ``._merge_tmp`` suffix) as
    the unpartitioned merge — so a crash inside the swap window is
    healed by the next ``merge_into`` OR ``compact_table`` on the path,
    one shared self-heal contract.

    PARTITIONED: one file per partition via a repartition on the
    partition tuple + dynamic partition overwrite; carries the same
    documented mid-write partial-partition caveat as the partitioned
    merge (a table format with a commit log removes it).
    """
    tmp_path = path.rstrip("/") + "._merge_tmp"
    if partition_cols:
        df = spark.read.parquet(path).repartition(*partition_cols)
        df = df.localCheckpoint(eager=True)
        try:
            (
                df.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(*partition_cols)
                .parquet(path)
            )
        finally:
            _release_local_checkpoint(df)
        return

    # self-heal a previous crashed swap before reading
    try:
        fs, jtarget = _fs_path(spark, path)
        _, jtmp = _fs_path(spark, tmp_path)
        if not fs.exists(jtarget) and fs.exists(jtmp):
            fs.rename(jtmp, jtarget)
    except Exception:
        pass
    spark.read.parquet(path).coalesce(num_files).write.mode("overwrite").parquet(tmp_path)
    fs, jtarget = _fs_path(spark, path)
    _, jtmp = _fs_path(spark, tmp_path)
    fs.delete(jtarget, True)
    fs.rename(jtmp, jtarget)


# ------------------------------------------------- JDBC window sink
#
# The reference's actual sink is a MySQL table: DELETE the window's
# rows, then to_sql(if_exists='append') (trans_summary_5min.py:104-128
# + :49).  The parquet engine maps that onto dynamic partition
# overwrite; for deployments that keep a real DB as the serving layer,
# this is the literal JDBC equivalent.  No JDBC driver ships in this
# container, so the statement builder and the delete->insert ordering
# are unit-tested through injectable transports (the webhook-notifier
# pattern) and the DriverManager path activates wherever a driver jar
# is on the classpath.


def _sql_literal(v) -> str:
    """Render a Python value as a safe SQL literal (single quotes
    doubled — the reference interpolates raw f-strings; we do not).

    Non-finite floats are rejected: bare ``inf``/``nan`` is invalid SQL
    in MySQL and most JDBC targets, and silently NULL-izing a DELETE
    predicate value would make the predicate match nothing — the caller
    must decide, not the literal renderer."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
        raise ValueError(f"non-finite float {v!r} has no SQL literal form")
    if isinstance(v, (int, float)):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


#: The reference's wildcard sentinel (SURVEY §2.2 P3): a key whose value
#: equals this string means "no predicate on this key".  RESERVED — a
#: key whose data legitimately contains the string 'ALL' must use a
#: different sentinel via build_window_delete(wildcard=...).
ALL_WILDCARD = "ALL"


def build_window_delete(table: str, delete_keys: dict, *, wildcard: str | None = ALL_WILDCARD) -> str:
    """The reference's delete-before-insert DELETE statement
    (trans_summary_5min.py:119-127): one equality predicate per window
    key, with the ALL-wildcard convention (value == ``wildcard`` ->
    predicate omitted, SURVEY §2.2 P3).  An all-ALL key set deletes the
    whole table — exactly what re-running an unscoped task means.

    ``wildcard`` is a reserved sentinel, faithfully to the reference:
    a key value that IS the literal string 'ALL' would silently widen
    the DELETE.  Callers with such data pass a different sentinel (or
    ``wildcard=None`` to disable wildcarding entirely)."""
    preds = [
        f"{k} IS NULL" if v is None else f"{k} = {_sql_literal(v)}"
        for k, v in delete_keys.items()
        if wildcard is None or v != wildcard
    ]
    return f"DELETE FROM {table} WHERE {' AND '.join(preds) if preds else '1=1'}"


def _jdbc_execute_update(spark, url: str, sql: str) -> int:
    """Run one DML statement driver-side through java.sql.DriverManager
    (any driver jar on the classpath resolves the URL scheme)."""
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        try:
            return int(st.executeUpdate(sql))
        finally:
            st.close()
    finally:
        conn.close()


def jdbc_overwrite_window(
    spark,
    url: str,
    table: str,
    df: DataFrame,
    delete_keys: dict,
    *,
    options: dict | None = None,
    execute_update=None,
    write_batch=None,
    wildcard: str | None = ALL_WILDCARD,
) -> str:
    """Delete-before-insert onto a JDBC table — the reference sink's
    literal semantics for DB-serving deployments.

    NOT atomic, faithfully: the DELETE commits on its own driver-side
    connection before the distributed append starts (the reference has
    the same window — conn.execute(delete) then to_sql append), so a
    mid-append failure leaves the window partially loaded; re-running
    the task heals it, exactly as in the reference.  A table format
    with a commit log (sources above) is the upgrade path when that
    window is unacceptable.

    ``execute_update(url, sql)`` / ``write_batch(df)`` are injectable
    for tests and for pooled/transactional deployments; defaults use
    DriverManager + ``df.write.format('jdbc').mode('append')``.
    Returns the DELETE statement it ran (for task logs).

    ``wildcard``: the reserved value meaning "no predicate on this key"
    (default ``'ALL'``, the reference's convention).  If a key's data
    can legitimately be the string 'ALL', pass a different sentinel or
    ``None`` — otherwise that value would widen the DELETE."""
    sql = build_window_delete(table, delete_keys, wildcard=wildcard)
    if execute_update is None:
        execute_update = lambda u, s: _jdbc_execute_update(spark, u, s)  # noqa: E731
    if write_batch is None:

        def write_batch(batch: DataFrame) -> None:
            writer = (
                batch.write.format("jdbc")
                .option("url", url)
                .option("dbtable", table)
                .mode("append")
            )
            for k, v in (options or {}).items():
                writer = writer.option(k, v)
            writer.save()

    execute_update(url, sql)
    write_batch(df)
    return sql


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    partition_cols: list[str] | None = None,
    files_per_partition: int = 4,
) -> None:
    """Write parquet clustered on ``cluster_cols``: rows are
    range-partitioned then sorted within each file, so every file's
    row-group min/max statistics cover a NARROW, mostly-disjoint slice
    of the cluster key — the layout that lets a point/range predicate
    skip whole files and row groups at scan time (parquet stats
    pushdown), the single biggest scan lever after partition pruning.

    ``repartitionByRange`` gives globally disjoint file ranges (a sample
    -based range exchange); ``sortWithinPartitions`` orders inside each
    file so row-group stats stay tight.  With ``partition_cols`` the
    directory layout is partitioned first and clustering applies within
    each directory (partition key leads the range exchange).
    """
    keys = ([*partition_cols] if partition_cols else []) + list(cluster_cols)
    out = df.repartitionByRange(files_per_partition, *keys).sortWithinPartitions(*keys)
    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)
