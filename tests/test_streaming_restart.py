"""Checkpoint-restart recovery + late-revision receipt for the
partitioned merge sink (r15 verdict tasks 2+3).

The deployment-shape catalog rows (`streaming_trans_summary_update`,
`streaming_player_summary_update`) prove replay idempotence end-to-end,
but within ONE StreamingQuery.  This test kills the query between waves
and starts a NEW query on the SAME checkpoint, then lands a late row
that must be merged with state recovered from that checkpoint:

- if the restarted query lost the aggregation state, the revised
  group's sums would equal the late row alone — the closed-form compare
  fails;
- if the sink merged at the wrong grain or skipped the revision, the
  mid-run snapshot would survive into the final table — the derived
  measures (rtp, p_after, is_risky) would be stale.

Synthetic rows are used deliberately: the parquet fixture is ~1 row per
(player, game, day) group (measured r16: zero multi-row June groups at
sf0.001), so group-splitting revisions cannot be driven from it at
every sf — here the multi-row group is constructed, making the
revision deterministic at any scale.
"""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

_TS = "2024-03-05 00:01:30"
_ROW = {
    "platform": "PLT", "site_code": "S1", "game_code": "g1",
    "player_name": "alice", "country": "US", "is_robot": 0,
    "win": 10.0, "fee": 1.0, "refund": 0.0, "normal_value": 1.0,
    "bonus_value": 0.0, "free_value": 2.0, "jp_value": 0.0,
    "cancel_value": 0.0,
}


def _rows(spark, rows):
    import datetime

    def mk(over):
        r = dict(_ROW)
        r.update(over)
        r["round_time"] = datetime.datetime.fromisoformat(r["round_time"])
        r["valid_value"] = r["bet"]
        return r

    cols = ["platform", "site_code", "game_code", "player_name", "country",
            "is_robot", "round_time", "bet", "win", "fee", "profit", "refund",
            "normal_value", "bonus_value", "free_value", "jp_value",
            "valid_value", "cancel_value"]
    return spark.createDataFrame(
        [tuple(d[c] for c in cols) for d in (mk(o) for o in rows)],
        schema="platform string, site_code string, game_code string, player_name string,"
        " country string, is_robot int, round_time timestamp, bet double, win double,"
        " fee double, profit double, refund double, normal_value double,"
        " bonus_value double, free_value double, jp_value double, valid_value double,"
        " cancel_value double",
    )


@pytest.fixture(scope="module")
def run(spark):
    from tg_reporting_etl_spark.streaming.pipeline import (
        PLAYER_5MIN_GRAIN,
        start_partitioned_sink,
        streaming_player_summary_5min,
    )

    sites = spark.createDataFrame(
        [("PLT", "S1", 0.25)], "platform string, code string, ratio double"
    )
    # wave 1: group A twice (multi-row group), group B once a day later
    wave1 = _rows(spark, [
        {"round_time": _TS, "bet": 100.0, "profit": 100.0},
        {"round_time": _TS, "bet": 300.0, "profit": 100.0},
        {"round_time": "2024-03-06 12:00:00", "player_name": "bob", "bet": 50.0, "profit": 5.0},
    ])
    # late revision for group A, same event time, 1.5 days late but far
    # inside the 3-day horizon; profit 60k trips the unconditional
    # is_risky rule, so EVERY derived measure must move
    wave2 = _rows(spark, [{"round_time": _TS, "bet": 400.0, "profit": 60_000.0}])

    tmp = tempfile.mkdtemp(prefix="restart_p5_")
    src, table, ckpt = f"{tmp}/src", f"{tmp}/table", f"{tmp}/ckpt"

    def start():
        stream = spark.readStream.schema(wave1.schema).parquet(src)
        return start_partitioned_sink(
            streaming_player_summary_5min(stream, sites, watermark="3 days"),
            table, ckpt, keys=PLAYER_5MIN_GRAIN, partition_cols=["summary_date"],
        )

    wave1.write.mode("append").parquet(src)
    q1 = start()
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()  # KILL between waves — state lives only in ckpt now
    mid = {r.player_name: r.asDict() for r in spark.read.parquet(table).collect()}

    wave2.write.mode("append").parquet(src)
    q2 = start()  # NEW query, SAME checkpoint
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    final = {r.player_name: r.asDict() for r in spark.read.parquet(table).collect()}

    yield {"mid": mid, "final": final, "all": wave1.unionByName(wave2), "sites": sites, "spark": spark}
    shutil.rmtree(tmp, ignore_errors=True)


def test_first_emission_is_partial(run):
    a = run["mid"]["alice"]
    assert a["b_count"] == 2 and a["b_amount"] == 400.0
    assert a["profit_amount"] == 200.0 and a["is_risky"] == 0
    assert a["rtp"] == pytest.approx(0.5)
    assert a["p_after_amount"] == pytest.approx(150.0)  # ratio 0.25


def test_late_row_revises_after_restart(run):
    """State recovered from the checkpoint: final sums include BOTH
    wave-1 rows and the late row, and every derived measure moved."""
    a = run["final"]["alice"]
    assert a["b_count"] == 3 and a["b_amount"] == 800.0
    assert a["profit_amount"] == 60_200.0
    assert a["rtp"] == pytest.approx(60_200.0 / 800.0)
    assert a["p_after_amount"] == pytest.approx(60_200.0 * 0.75)
    assert a["tg_after_amount"] == pytest.approx(60_200.0 * 0.25)
    assert a["is_risky"] == 1  # flipped by the unconditional profit rule
    # the two failure modes this test exists to catch:
    assert a["b_amount"] != 400.0  # not just wave 1 (revision skipped)
    assert a["b_count"] != 1  # not just the late row (checkpoint state lost)


def test_untouched_group_survives_the_merge(run):
    """The merge must keep rows the revising batch didn't carry."""
    assert run["mid"]["bob"] == run["final"]["bob"]


def test_final_table_matches_batch_closed_form(run):
    from tg_reporting_etl_spark.operators.player_summary import (
        GROUP_KEYS,
        OUT_COLUMNS,
        player_summary_5min,
    )

    expected = player_summary_5min(
        run["all"], run["sites"], "2024-03-01 00:00:00", "2024-04-01 00:00:00"
    )
    exp = {r.player_name: r.asDict() for r in expected.collect()}
    assert set(exp) == set(run["final"])
    for name, e in exp.items():
        f = run["final"][name]
        for c in [*GROUP_KEYS, *OUT_COLUMNS]:
            if c in f:
                assert f[c] == pytest.approx(e[c]), (name, c)


# ---------------- index-sink checkpoint-kill-restart receipts (r16 task 3)
#
# The replay-heal tests in test_streaming.py re-run WAVES through the
# sinks; these kill the StreamingQuery BETWEEN waves and start a NEW
# query on the SAME checkpoint, so recovery goes through the commit log
# (wave 1 must NOT reprocess; wave 2 must probe the index wave 1 left on
# disk).  The closed form: every index table is a content-derived
# function of the ingested doc/vector set, so the restarted run must
# equal an UNINTERRUPTED single-query run over the same two waves —
# a restarted query that double-appends (lost commit log / skipped
# anti-join) or loses the band index (cross-wave pair missing) breaks
# the set equality.


def _table_set(spark, path, cols):
    return {tuple(r[c] for c in cols) for r in spark.read.parquet(path).collect()}


def test_minhash_index_survives_checkpoint_restart(spark, tmp_path):
    import os

    from tg_reporting_etl_spark.streaming.pipeline import start_near_dup_sink

    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a slow waltz under amber lights near the old harbor wall "
    ) * 3
    other = (
        "completely different content about spark shuffle partitions and "
        "columnar parquet encodings with dictionary pages and bloom filters "
    ) * 3
    schema = "doc_id long, text string"
    wave1 = [(1, base), (10, other)]
    wave2 = [(2, base.replace("amber", "violet")), (11, other[::-1])]

    def run(tag, restart):
        src = str(tmp_path / f"mh_{tag}_src")
        idx = str(tmp_path / f"mh_{tag}_idx")
        ckpt = str(tmp_path / f"mh_{tag}_ckpt")
        os.makedirs(src, exist_ok=True)

        def start():
            stream = spark.readStream.schema(schema).parquet(src)
            return start_near_dup_sink(stream, idx, ckpt)

        spark.createDataFrame(wave1, schema).write.mode("append").parquet(src)
        q = start()
        try:
            q.processAllAvailable()
        finally:
            if restart:
                q.stop()  # KILL between waves — state lives only in ckpt
        if restart:
            q = start()  # NEW query, SAME checkpoint
        spark.createDataFrame(wave2, schema).write.mode("append").parquet(src)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return idx

    restarted = run("restart", restart=True)
    straight = run("straight", restart=False)

    n_hashes = 16
    sig_cols = ["doc_id", *[f"m{i}" for i in range(n_hashes)]]
    for table, cols in (
        ("signatures", sig_cols),
        ("bands", ["doc_id", "band", "band_key"]),
        ("pairs", ["doc_a", "doc_b", "est_jaccard"]),
    ):
        got = _table_set(spark, f"{restarted}/{table}", cols)
        want = _table_set(spark, f"{straight}/{table}", cols)
        assert got == want, table
    # the two failure modes, stated directly:
    sigs = spark.read.parquet(f"{restarted}/signatures").groupBy("doc_id").count().collect()
    assert all(r["count"] == 1 for r in sigs)  # no double-append after restart
    pairs = {(r.doc_a, r.doc_b) for r in spark.read.parquet(f"{restarted}/pairs").collect()}
    assert (1, 2) in pairs  # cross-restart probe: wave 2 found wave 1's doc


def test_embedding_index_survives_checkpoint_restart(spark, tmp_path):
    import os

    from tg_reporting_etl_spark.streaming.pipeline import start_embedding_dup_sink

    base = [float(i % 5 + 1) for i in range(16)]
    near = list(base)
    near[0] += 0.05  # same sign pattern, cosine ~1
    anti = [-v for v in base]
    schema = "vec_id long, embedding array<float>"
    wave1 = [(1, base), (10, anti)]
    wave2 = [(2, near), (11, [v * 2 for v in anti])]

    def run(tag, restart):
        src = str(tmp_path / f"ed_{tag}_src")
        idx = str(tmp_path / f"ed_{tag}_idx")
        ckpt = str(tmp_path / f"ed_{tag}_ckpt")
        os.makedirs(src, exist_ok=True)

        def start():
            stream = spark.readStream.schema(schema).parquet(src)
            return start_embedding_dup_sink(stream, idx, ckpt, tau=0.95)

        spark.createDataFrame(wave1, schema).write.mode("append").parquet(src)
        q = start()
        try:
            q.processAllAvailable()
        finally:
            if restart:
                q.stop()
        if restart:
            q = start()
        spark.createDataFrame(wave2, schema).write.mode("append").parquet(src)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return idx

    restarted = run("restart", restart=True)
    straight = run("straight", restart=False)

    for table, cols in (
        ("vectors", ["vec_id", "embedding"]),
        ("bands", ["vec_id", "band", "band_key"]),
        ("pairs", ["vec_a", "vec_b", "cos_sim"]),
    ):
        got = _table_set(
            spark, f"{restarted}/{table}",
            [c for c in cols if c != "embedding"],
        )
        want = _table_set(
            spark, f"{straight}/{table}",
            [c for c in cols if c != "embedding"],
        )
        assert got == want, table
    # embeddings compared as value lists (Row arrays aren't hashable)
    emb_r = sorted(
        (r.vec_id, list(r.embedding))
        for r in spark.read.parquet(f"{restarted}/vectors").collect()
    )
    emb_s = sorted(
        (r.vec_id, list(r.embedding))
        for r in spark.read.parquet(f"{straight}/vectors").collect()
    )
    assert emb_r == emb_s
    vecs = spark.read.parquet(f"{restarted}/vectors").groupBy("vec_id").count().collect()
    assert all(r["count"] == 1 for r in vecs)  # no double-append
    pairs = {(r.vec_a, r.vec_b) for r in spark.read.parquet(f"{restarted}/pairs").collect()}
    assert (1, 2) in pairs  # cross-restart probe against wave 1's vector
    assert (10, 11) in pairs  # scaled copy of the anti vector pairs too


def test_embedding_catalog_row_env_gated_restart(spark, sf_dir, monkeypatch):
    """r17 verdict task 4 plumbing: SPARK_GRAFT_STREAM_RESTART=1 must
    route the CATALOG row (the surface tools/scale_probe.py's
    ``streaming_embedding_dup_index_restart`` variant drives) through a
    kill + checkpoint recovery — pinned by counting sink starts — and
    produce the identical frame."""
    from tg_reporting_etl_spark.plans.streaming_plans import (
        q_streaming_embedding_dup_index,
    )
    from tg_reporting_etl_spark.streaming import pipeline as pl

    real_start = pl.start_embedding_dup_sink
    starts = []

    def counting_start(*a, **kw):
        starts.append(1)
        return real_start(*a, **kw)

    monkeypatch.setattr(pl, "start_embedding_dup_sink", counting_start)

    monkeypatch.delenv("SPARK_GRAFT_STREAM_RESTART", raising=False)
    base = q_streaming_embedding_dup_index(spark, sf_dir).collect()
    assert len(starts) == 1  # uninterrupted: one query start

    starts.clear()
    monkeypatch.setenv("SPARK_GRAFT_STREAM_RESTART", "1")
    restarted = q_streaming_embedding_dup_index(spark, sf_dir).collect()
    assert len(starts) == 2  # killed after wave 1, recovered for wave 2
    assert sorted(map(tuple, restarted)) == sorted(map(tuple, base))
