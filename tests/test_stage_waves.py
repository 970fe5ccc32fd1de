"""Focused contracts for plans.streaming_plans._stage_waves (r18).

The wave sims' one-pass staging replaced N filtered source scans with
one partitionBy write plus hard-link releases.  Pinned here:

- a release delivers exactly its groups' rows, and a TUPLE release
  delivers the union (the overlapping-wave form);
- a group released twice is re-delivered under DISTINCT paths (the
  file source identifies files by path, so this is the replay the old
  second filtered write produced);
- release order == file mtime order (the file source batches by
  timestamp; the old sequential writes guaranteed this implicitly);
- rows whose wave expression is NULL are staged to the default
  partition and can never be released (the old ``filter(pred)`` form
  dropped them from every wave).
"""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from tg_reporting_etl_spark.plans.streaming_plans import _stage_waves


def _read_ids(spark, src):
    files = glob.glob(f"{src}/*.parquet")
    if not files:
        return []
    return sorted(r.doc_id for r in spark.read.parquet(src).collect())


def test_stage_waves_overlap_release_and_order(spark, tmp_path):
    # doc_id % 3 groups; doc_id 9 has a NULL group -> never releasable
    df = spark.createDataFrame(
        [(i,) for i in range(9)], "doc_id long"
    ).unionByName(spark.createDataFrame([(None,)], "doc_id long")).withColumn(
        "payload", F.col("doc_id") * 10
    )
    staging, src = str(tmp_path / "staging"), str(tmp_path / "src")
    release = _stage_waves(df, F.col("doc_id") % 3, staging, src)

    release((0, 1))  # wave A: groups {0,1} = old filter(% 3 != 2)
    wave_a = _read_ids(spark, src)
    assert wave_a == [0, 1, 3, 4, 6, 7]
    a_files = set(glob.glob(f"{src}/*.parquet"))
    # group-0 files exist only in release 1: their mtime must predate release 2
    g0_mtime = max(os.path.getmtime(f) for f in a_files if "_0_" in os.path.basename(f))

    release((1, 2))  # wave B: groups {1,2} = old filter(% 3 != 0)
    all_ids = _read_ids(spark, src)
    # group 1 re-delivered (duplicated), group 2 new, NULL row absent
    assert all_ids == sorted([0, 1, 3, 4, 6, 7] + [1, 2, 4, 5, 7, 8])
    b_files = set(glob.glob(f"{src}/*.parquet")) - a_files
    assert b_files, "second release must land NEW paths"
    assert all(os.path.getmtime(f) > g0_mtime for f in b_files), (
        "release order must equal mtime order for the file source"
    )
    # hard links, not copies: staged bytes are shared, not rewritten
    staged = glob.glob(f"{staging}/_wave=1/*.parquet")
    assert staged and all(os.stat(f).st_nlink >= 3 for f in staged)


def test_stage_waves_empty_group_is_noop(spark, tmp_path):
    df = spark.createDataFrame([(1,), (3,)], "doc_id long")
    staging, src = str(tmp_path / "staging"), str(tmp_path / "src")
    release = _stage_waves(df, F.col("doc_id") % 2, staging, src)
    release(0)  # no even ids staged: must be a no-op, like the empty filtered write
    assert glob.glob(f"{src}/*.parquet") == []
    release(1)
    assert _read_ids(spark, src) == [1, 3]
