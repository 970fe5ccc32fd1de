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
