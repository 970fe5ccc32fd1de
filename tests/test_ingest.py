"""Incremental ingest dedup (functions/ingest.py): first-seen-wins,
replay no-op, cross-batch growth, sharded index layout."""

from __future__ import annotations

import pyspark.sql.functions as F

from tg_reporting_etl_spark.functions import ingest as ig


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ingest_lifecycle(spark, tmp_path):
    path = str(tmp_path / "idx")
    b1 = _docs(spark, [(1, "alpha"), (2, "beta"), (3, "alpha")])  # within-batch dup
    assert ig.ingest_batch(spark, path, b1, 1) == 2  # alpha, beta

    b2 = _docs(spark, [(4, "beta"), (5, "gamma"), (6, None)])  # cross-batch dup + null
    assert ig.ingest_batch(spark, path, b2, 2) == 1  # only gamma

    # replay adds nothing
    assert ig.ingest_batch(spark, path, b2, 3) == 0

    idx = {r.digest: r for r in spark.read.parquet(path).collect()}
    assert len(idx) == 3
    by_first = {(r.first_doc_id, r.first_batch) for r in idx.values()}
    assert by_first == {(1, 1), (2, 1), (5, 2)}  # first-seen wins, min doc per digest
    # shard is the digest hex prefix (partition layout)
    assert all(r.shard == "s" + r.digest[:1] for r in idx.values())


def test_ingest_empty_batch_is_noop(spark, tmp_path):
    path = str(tmp_path / "idx")
    ig.ingest_batch(spark, path, _docs(spark, [(1, "x")]), 1)
    assert ig.ingest_batch(spark, path, _docs(spark, []), 2) == 0
    assert spark.read.parquet(path).count() == 1


def test_ingest_batch_job_and_stage_ceilings(spark, tmp_path):
    """Pin the single-exchange / count-rides-the-write claims with the
    scheduler's own accounting: a bootstrap ingest is 2 AQE jobs over 3
    stages (shard exchange + write), a replay ingest 4/4 (adds the
    index probe + anti-join).  Round 8 shipped before/after footer
    count jobs that doubled these numbers — this test fails if any
    job-per-ingest creep returns."""
    import pandas as pd

    from tg_reporting_etl_spark.functions.ingest import ingest_batch

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(100)), "text": [f"t{i % 37}" for i in range(100)]})
    )
    sc = spark.sparkContext
    tr = sc.statusTracker()

    def run(group, batch_id):
        sc.setJobGroup(group, "ingest ceiling probe")
        n = ingest_batch(spark, str(tmp_path / "idx"), docs, batch_id)
        jobs = tr.getJobIdsForGroup(group)
        stages = set()
        for j in jobs:
            stages.update(tr.getJobInfo(j).stageIds)
        return n, len(jobs), len(stages)

    n1, j1, s1 = run("ig_boot", 1)
    assert n1 == 37
    assert j1 <= 2 and s1 <= 3, f"bootstrap ingest grew to {j1} jobs / {s1} stages"
    n2, j2, s2 = run("ig_replay", 2)
    assert n2 == 0  # full replay adds nothing
    assert j2 <= 4 and s2 <= 4, f"replay ingest grew to {j2} jobs / {s2} stages"


def test_ingest_torn_index_dir_self_heals(spark, tmp_path):
    # A crashed prior append can leave the index dir existing but with
    # no committed parquet (e.g. only _temporary) — the next ingest must
    # bootstrap, not throw (ADVICE r9: replay-self-healing contract).
    path = tmp_path / "idx"
    (path / "_temporary" / "0").mkdir(parents=True)
    assert ig.ingest_batch(spark, str(path), _docs(spark, [(1, "a"), (2, "b")]), 1) == 2
    assert spark.read.parquet(str(path)).count() == 2


def test_index_schema_declaration_matches_disk(spark, tmp_path):
    """INDEX_SCHEMA is declared to SKIP footer inference — so nothing
    checks it against the files at read time.  Pin declaration ==
    inference here: if the write path ever changes a type, this fails
    instead of reads silently mis-typing."""
    path = str(tmp_path / "idx")
    ig.ingest_batch(spark, path, _docs(spark, [(1, "a"), (2, "b")]), 1)
    inferred = {f.name: f.dataType.simpleString() for f in spark.read.parquet(path).schema}
    declared = {
        f.name: f.dataType.simpleString()
        for f in spark.read.schema(ig.INDEX_SCHEMA).parquet(path).schema
    }
    assert inferred == declared
