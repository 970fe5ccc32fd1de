"""Structured Streaming 5-min tier: batch parity + late-data update mode."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from tg_reporting_etl_spark.adapters import testdata as td
from tg_reporting_etl_spark.operators.trans_summary import GROUP_KEYS, trans_summary_5min
from tg_reporting_etl_spark.streaming.pipeline import (
    start_memory_sink,
    streaming_trans_summary_5min,
)

GTE, LT = "2024-01-01 00:00:00", "2024-02-01 00:00:00"


def test_streaming_matches_batch(spark, sf_dir, tmp_path):
    """Replaying the wallet log through the streaming plan reproduces the
    batch tier exactly (same measure expressions, two runtimes)."""
    pvl = td.player_value_log(spark, sf_dir)
    src = str(tmp_path / "stream_src")
    pvl.write.parquet(src)

    stream = spark.readStream.schema(pvl.schema).parquet(src)
    q = start_memory_sink(streaming_trans_summary_5min(stream), "t5_stream", mode="complete")
    try:
        q.processAllAvailable()
        got = (
            spark.sql("SELECT * FROM t5_stream")
            .withColumn("n", F.col("trans_in_count") + F.col("trans_out_count"))
            .agg(F.sum("n"), F.count("*"))
            .first()
        )
    finally:
        q.stop()
    want = (
        trans_summary_5min(pvl, GTE, LT)
        .withColumn("n", F.col("trans_in_count") + F.col("trans_out_count"))
        .agg(F.sum("n"), F.count("*"))
        .first()
    )
    assert tuple(got) == tuple(want)


def test_late_data_updates_window(spark, sf_dir, tmp_path):
    """ST2/ST3: a late event re-emits its (already emitted) window with
    updated counts — the streaming form of the rerun cascade."""
    pvl = td.player_value_log(spark, sf_dir).limit(0)
    schema = pvl.schema
    src = str(tmp_path / "late_src")
    os.makedirs(src, exist_ok=True)

    def rows_df(ts, value):
        import datetime as dt

        return spark.createDataFrame(
            [
                (
                    "UFA", "TG", "p00001", "THB", "IN",
                    value, 0.0, 0.0, 20240105, "SUCCESS",
                    dt.datetime.fromisoformat(ts),
                )
            ],
            schema,
        )

    rows_df("2024-01-05 10:01:00", 10.0).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = start_memory_sink(streaming_trans_summary_5min(stream), "late_stream", mode="update")
    try:
        q.processAllAvailable()
        first = spark.sql(
            "SELECT sum(trans_in_amount) v FROM late_stream WHERE start_time = '2024-01-05 10:00:00'"
        ).first().v
        # late event for the SAME 5-min window arrives in a later batch
        rows_df("2024-01-05 10:02:00", 5.0).write.mode("append").parquet(src)
        q.processAllAvailable()
        emissions = spark.sql(
            "SELECT trans_in_amount FROM late_stream WHERE start_time = '2024-01-05 10:00:00' ORDER BY trans_in_amount"
        ).collect()
    finally:
        q.stop()
    assert first == 10.0
    # update mode re-emitted the window: first emission 10, corrected emission 15
    assert [r.trans_in_amount for r in emissions] == [10.0, 15.0]


def test_partitioned_sink_upserts_at_window_key_grain(spark, sf_dir, tmp_path):
    """ST6: a later micro-batch that changes ONE key of a window must not
    wipe the window's other keys from the sink (update mode re-emits
    only changed rows; the sink merges, never partition-overwrites)."""
    from tg_reporting_etl_spark.streaming.pipeline import (
        TRANS_5MIN_GRAIN,
        start_partitioned_sink,
    )

    pvl = td.player_value_log(spark, sf_dir).limit(0)
    schema = pvl.schema
    src = str(tmp_path / "sink_src")
    out = str(tmp_path / "sink_out")
    ckpt = str(tmp_path / "sink_ckpt")
    os.makedirs(src, exist_ok=True)

    def rows_df(player, ts, value):
        import datetime as dt

        return spark.createDataFrame(
            [
                (
                    "UFA", "TG", player, "THB", "IN",
                    value, 0.0, 0.0, 20240105, "SUCCESS",
                    dt.datetime.fromisoformat(ts),
                )
            ],
            schema,
        )

    # batch 1: two keys in the same 5-min window
    rows_df("p1", "2024-01-05 10:01:00", 10.0).unionAll(
        rows_df("p2", "2024-01-05 10:02:00", 7.0)
    ).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = start_partitioned_sink(streaming_trans_summary_5min(stream), out, ckpt, TRANS_5MIN_GRAIN)
    try:
        q.processAllAvailable()
        # batch 2: late event updates ONLY p1's row of that window
        rows_df("p1", "2024-01-05 10:03:00", 5.0).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.player_name: r.trans_in_amount
        for r in spark.read.parquet(out)
        .filter(F.col("start_time") == "2024-01-05 10:00:00")
        .collect()
    }
    # p1 upserted to 15, p2's untouched row survived the second batch
    assert got == {"p1": 15.0, "p2": 7.0}


def test_player_stream_partitioned_sink_keeps_per_game_rows(spark, sf_dir, tmp_path):
    """The player aggregation's grain includes game_code: merging its
    stream at the player grain must keep a player's rows for OTHER game
    codes intact when a later batch touches only one game (the silent
    delete the hardcoded trans grain would have caused), and pairing the
    player agg with the trans grain must be rejected loudly."""
    import datetime as dt

    from tg_reporting_etl_spark.operators.player_summary import GROUP_KEYS as P_KEYS
    from tg_reporting_etl_spark.streaming.pipeline import (
        PLAYER_5MIN_GRAIN,
        TRANS_5MIN_GRAIN,
        start_partitioned_sink,
        streaming_player_summary_5min,
    )

    ppl = td.player_profit_log(spark, sf_dir).limit(0).withColumn(
        "round_time", F.col("round_time").cast("timestamp")
    )
    schema = ppl.schema
    sites = td.game_sites(spark, sf_dir)
    src = str(tmp_path / "pg_src")
    out = str(tmp_path / "pg_out")
    ckpt = str(tmp_path / "pg_ckpt")
    os.makedirs(src, exist_ok=True)

    def row(game, ts, bet):
        vals = []
        for f in schema.fields:
            if f.name == "game_code":
                vals.append(game)
            elif f.name == "round_time":
                vals.append(dt.datetime.fromisoformat(ts))
            elif f.name == "bet":
                vals.append(bet)
            elif f.name == "is_robot":
                vals.append(0)
            elif f.name in ("platform", "site_code", "player_name", "country"):
                vals.append({"platform": "P1", "site_code": "S1"}.get(f.name, "px"))
            elif f.dataType.simpleString() in ("double", "float"):
                vals.append(0.0)
            elif f.dataType.simpleString() in ("int", "bigint"):
                vals.append(0)
            else:
                vals.append("x")
        return spark.createDataFrame([tuple(vals)], schema)

    agg = streaming_player_summary_5min(
        spark.readStream.schema(schema).parquet(src), sites
    )
    # a grain naming columns the aggregation doesn't produce fails loudly
    with pytest.raises(ValueError, match="trade_kind"):
        start_partitioned_sink(agg, out, ckpt, [*TRANS_5MIN_GRAIN, "trade_kind"])

    # batch 1: same player, same window, two games
    row("G1", "1996-06-14 10:01:00", 10.0).unionAll(
        row("G2", "1996-06-14 10:02:00", 7.0)
    ).write.mode("append").parquet(src)
    q = start_partitioned_sink(agg, out, ckpt, PLAYER_5MIN_GRAIN)
    try:
        q.processAllAvailable()
        # batch 2 touches only G1
        row("G1", "1996-06-14 10:03:00", 5.0).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.game_code: r.b_amount
        for r in spark.read.parquet(out).filter(F.col("player_name") == "px").collect()
    }
    assert got == {"G1": 15.0, "G2": 7.0}
    assert "game_code" in P_KEYS  # the grain really is finer than trans


def test_streaming_player_summary_matches_batch(spark, sf_dir, tmp_path):
    """player_summary streaming twin: two micro-batches (pre-agg
    stream-static dim join) reproduce the batch tier exactly."""
    from tg_reporting_etl_spark.operators.player_summary import player_summary_5min
    from tg_reporting_etl_spark.streaming.pipeline import streaming_player_summary_5min

    # watermarks need TIMESTAMP (the adapter yields NTZ from lineitem dates)
    ppl = td.player_profit_log(spark, sf_dir).withColumn(
        "round_time", F.col("round_time").cast("timestamp")
    )
    sites = td.game_sites(spark, sf_dir)
    split = "1997-01-01 00:00:00"
    src = str(tmp_path / "ppl_src")
    ppl.filter(F.col("round_time") < split).write.mode("append").parquet(src)

    stream = spark.readStream.schema(ppl.schema).parquet(src)
    q = start_memory_sink(
        streaming_player_summary_5min(stream, sites), "p5_stream", mode="complete"
    )
    try:
        q.processAllAvailable()
        ppl.filter(F.col("round_time") >= split).write.mode("append").parquet(src)
        q.processAllAvailable()
        assert q.lastProgress is None or q.recentProgress  # drove >= 2 batches
        got = (
            spark.sql("SELECT * FROM p5_stream")
            .agg(
                F.count("*"),
                F.round(F.sum("profit_amount"), 4),
                F.round(F.sum("p_after_amount"), 4),
                F.sum("b_count"),
                F.sum("is_risky"),
            )
            .first()
        )
    finally:
        q.stop()
    want = (
        player_summary_5min(ppl, sites, "1995-01-01 00:00:00", "2002-01-01 00:00:00")
        .agg(
            F.count("*"),
            F.round(F.sum("profit_amount"), 4),
            F.round(F.sum("p_after_amount"), 4),
            F.sum("b_count"),
            F.sum("is_risky"),
        )
        .first()
    )
    assert tuple(got) == tuple(want)


def test_player_stream_late_event_revises_one_upsert_row(spark, sf_dir, tmp_path):
    """ST2/ST3 at the player grain: an event that is LATE in event time
    (earlier than data already processed, inside the watermark) must
    revise exactly ONE (game_code, window) row of the partitioned sink
    — every other game's row and every other window's row survives
    byte-identically, and no duplicate row for the revised key appears
    (upsert, not append)."""
    import datetime as dt

    from tg_reporting_etl_spark.streaming.pipeline import (
        PLAYER_5MIN_GRAIN,
        start_partitioned_sink,
        streaming_player_summary_5min,
    )

    ppl = td.player_profit_log(spark, sf_dir).limit(0).withColumn(
        "round_time", F.col("round_time").cast("timestamp")
    )
    schema = ppl.schema
    sites = td.game_sites(spark, sf_dir)
    src = str(tmp_path / "late_pg_src")
    out = str(tmp_path / "late_pg_out")
    ckpt = str(tmp_path / "late_pg_ckpt")
    os.makedirs(src, exist_ok=True)

    def row(game, ts, bet):
        vals = []
        for f in schema.fields:
            if f.name == "game_code":
                vals.append(game)
            elif f.name == "round_time":
                vals.append(dt.datetime.fromisoformat(ts))
            elif f.name == "bet":
                vals.append(bet)
            elif f.name == "is_robot":
                vals.append(0)
            elif f.name in ("platform", "site_code", "player_name", "country"):
                vals.append({"platform": "P1", "site_code": "S1"}.get(f.name, "px"))
            elif f.dataType.simpleString() in ("double", "float"):
                vals.append(0.0)
            elif f.dataType.simpleString() in ("int", "bigint"):
                vals.append(0)
            else:
                vals.append("x")
        return spark.createDataFrame([tuple(vals)], schema)

    # batch 1: two games in window 10:00, plus G1 again in window 10:10
    # (advances max event time so batch 2's event is genuinely late)
    row("G1", "1996-06-14 10:01:00", 10.0).unionAll(
        row("G2", "1996-06-14 10:02:00", 7.0)
    ).unionAll(row("G1", "1996-06-14 10:12:00", 3.0)).write.mode("append").parquet(src)
    agg = streaming_player_summary_5min(
        spark.readStream.schema(schema).parquet(src), sites
    )
    q = start_partitioned_sink(agg, out, ckpt, PLAYER_5MIN_GRAIN)
    try:
        q.processAllAvailable()
        before = {
            (r.game_code, str(r.start_time)): r.b_amount
            for r in spark.read.parquet(out).collect()
        }
        # batch 2: late event — event time 10:03 < max seen 10:12, inside
        # the 10-minute watermark, targeting the already-emitted window
        row("G1", "1996-06-14 10:03:00", 5.0).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    after = {
        (r.game_code, str(r.start_time)): r.b_amount
        for r in spark.read.parquet(out).collect()
    }
    w0, w1 = "1996-06-14 10:00:00", "1996-06-14 10:10:00"
    assert before == {("G1", w0): 10.0, ("G2", w0): 7.0, ("G1", w1): 3.0}
    # exactly one row revised; same cardinality (upsert, no dup rows)
    assert after == {("G1", w0): 15.0, ("G2", w0): 7.0, ("G1", w1): 3.0}


def test_streaming_exact_dedup_drops_cross_batch_copies(spark, tmp_path):
    """A duplicate text arriving in a LATER micro-batch (within the
    watermark) is dropped; distinct texts all pass; the survivor is the
    first-seen copy."""
    import datetime as dt

    from tg_reporting_etl_spark.streaming.pipeline import streaming_exact_dedup

    schema = "doc_id long, text string, ingest_time timestamp"
    src = str(tmp_path / "dedup_src")
    os.makedirs(src, exist_ok=True)

    def batch(rows):
        spark.createDataFrame(
            [(i, t, dt.datetime.fromisoformat(ts)) for i, t, ts in rows], schema
        ).write.mode("append").parquet(src)

    batch([(1, "alpha text", "2024-01-05 10:00:00"),
           (2, "beta text", "2024-01-05 10:00:10"),
           (3, "alpha text", "2024-01-05 10:00:20")])  # same-batch dup
    stream = spark.readStream.schema(schema).parquet(src)
    q = start_memory_sink(streaming_exact_dedup(stream), "dedup_stream", mode="append")
    try:
        q.processAllAvailable()
        batch([(4, "alpha text", "2024-01-05 10:05:00"),   # cross-batch dup
               (5, "gamma text", "2024-01-05 10:05:10")])  # new content
        q.processAllAvailable()
        rows = spark.sql("SELECT doc_id, text FROM dedup_stream").collect()
    finally:
        q.stop()

    by_text = {}
    for r in rows:
        by_text.setdefault(r.text, []).append(r.doc_id)
    assert sorted(by_text) == ["alpha text", "beta text", "gamma text"]
    assert by_text["beta text"] == [2] and by_text["gamma text"] == [5]
    assert by_text["alpha text"] in ([1], [3])  # one survivor, first batch
    assert len(rows) == 3


def test_streaming_near_dup_across_batches(spark, tmp_path):
    """Incremental MinHash-LSH: a near-duplicate (not byte-identical)
    arriving in a LATER micro-batch is detected against documents
    indexed by earlier batches, and intra-batch near-dups are caught in
    the same pass.  Unrelated docs never pair."""
    import os

    from tg_reporting_etl_spark.streaming.pipeline import start_near_dup_sink

    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a slow waltz under amber lights near the old harbor wall "
    ) * 3
    mutated = base.replace("amber", "violet")
    other = (
        "completely different content about spark shuffle partitions and "
        "columnar parquet encodings with dictionary pages and bloom filters "
    ) * 3

    src = str(tmp_path / "nd_src")
    os.makedirs(src, exist_ok=True)
    schema = "doc_id long, text string"

    spark.createDataFrame([(1, base), (10, other)], schema).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = start_near_dup_sink(stream, str(tmp_path / "nd_index"), str(tmp_path / "nd_ckpt"))
    try:
        q.processAllAvailable()
        pairs_path = str(tmp_path / "nd_index" / "pairs")
        assert spark.read.parquet(pairs_path).count() == 0  # nothing similar yet

        # batch 2: two near-dups of doc 1 — cross-batch AND intra-batch
        spark.createDataFrame(
            [(2, mutated), (3, base.replace("slow", "quick")), (11, other[::-1])], schema
        ).write.mode("append").parquet(src)
        q.processAllAvailable()

        got = {
            (r.doc_a, r.doc_b): r.est_jaccard
            for r in spark.read.parquet(pairs_path).collect()
        }
    finally:
        q.stop()

    assert set(got) == {(1, 2), (1, 3), (2, 3)}, got
    assert all(v >= 0.5 for v in got.values())
    # signature index carries every ingested doc; band index 4 rows each
    idx = spark.read.parquet(str(tmp_path / "nd_index" / "signatures"))
    assert {r.doc_id for r in idx.collect()} == {1, 2, 3, 10, 11}
    bands = spark.read.parquet(str(tmp_path / "nd_index" / "bands"))
    assert bands.count() == 5 * 4


def _collect_sessions(df):
    return sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, r.n_event_types, r.total_value)
        for r in df.collect()
    )


def test_streaming_sessionize_matches_batch(spark, sf_dir, tmp_path):
    """Native session_window reproduces the batch lag+cumsum sessionizer:
    same (user, start, end, counts) set over the whole events table."""
    from tg_reporting_etl_spark.operators.sessions import sessionize
    from tg_reporting_etl_spark.sources.readers import load_table
    from tg_reporting_etl_spark.streaming.pipeline import streaming_sessionize

    events = load_table(spark, sf_dir, "events").select("ts", "user_id", "event_type", "value")
    src = str(tmp_path / "sess_src")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    q = start_memory_sink(streaming_sessionize(stream, 30), "sess_stream", mode="complete")
    try:
        q.processAllAvailable()
        got = _collect_sessions(spark.table("sess_stream"))
    finally:
        q.stop()
    want = _collect_sessions(
        sessionize(events, 30).select(
            "user_id", "session_start", "session_end", "n_events", "total_value", "n_event_types"
        )
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:5] == w[:5]
        assert g[5] == pytest.approx(w[5], abs=1e-4)  # float sum order may differ per runtime


def test_streaming_sessionize_merges_across_batches(spark, tmp_path):
    """A session straddling two micro-batches emits as ONE merged row —
    the state-store behavior the batch operator gets from seeing all
    rows at once."""
    import datetime as dt

    from tg_reporting_etl_spark.streaming.pipeline import streaming_sessionize

    def rows_df(rows):
        return spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, 0, m), uid, et, v) for (m, uid, et, v) in rows],
            "ts timestamp, user_id long, event_type string, value double",
        )

    src = str(tmp_path / "merge_src")
    rows_df([(0, 1, "a", 1.0), (10, 1, "b", 2.0), (0, 2, "a", 5.0)]).write.parquet(src)

    stream = spark.readStream.schema("ts timestamp, user_id long, event_type string, value double").parquet(src)
    q = start_memory_sink(streaming_sessionize(stream, 30), "sess_merge", mode="complete")
    try:
        q.processAllAvailable()
        assert spark.table("sess_merge").count() == 2
        # second batch: user 1 event 25 min after their last -> same session
        rows_df([(25, 1, "a", 4.0)]).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = _collect_sessions(spark.table("sess_merge"))
    finally:
        q.stop()
    assert got == [
        (1, dt.datetime(2024, 1, 1, 0, 0), dt.datetime(2024, 1, 1, 0, 25), 3, 2, 7.0),
        (2, dt.datetime(2024, 1, 1, 0, 0), dt.datetime(2024, 1, 1, 0, 0), 1, 1, 5.0),
    ]


def test_streaming_embedding_dup_across_batches(spark, tmp_path):
    """Incremental sign-LSH + exact-cosine verify: a near-duplicate
    vector arriving in a later micro-batch pairs with its earlier twin;
    orthogonal vectors never pair; reported cos_sim is the exact value."""
    import os

    from tg_reporting_etl_spark.streaming.pipeline import start_embedding_dup_sink

    base = [float(i % 7 + 1) for i in range(16)]
    near = [v + (0.01 if i == 3 else 0.0) for i, v in enumerate(base)]   # cos ~1
    anti = [-v for v in base]                                            # cos = -1
    schema = "vec_id long, embedding array<float>"

    src = str(tmp_path / "ed_src")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame([(1, base), (10, anti)], schema).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = start_embedding_dup_sink(
        stream, str(tmp_path / "ed_index"), str(tmp_path / "ed_ckpt"), tau=0.95
    )
    try:
        q.processAllAvailable()
        pairs_path = str(tmp_path / "ed_index" / "pairs")
        assert spark.read.parquet(pairs_path).count() == 0

        # batch 2: near-dup of vec 1 (cross-batch) + fresh intra-batch twin pair
        twin = [1.0] * 16
        spark.createDataFrame(
            [(2, near), (20, twin), (21, list(twin))], schema
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {
            (r.vec_a, r.vec_b): r.cos_sim for r in spark.read.parquet(pairs_path).collect()
        }
    finally:
        q.stop()

    assert set(got) == {(1, 2), (20, 21)}, got
    assert got[(20, 21)] == 1.0
    assert got[(1, 2)] >= 0.999
    vecs = spark.read.parquet(str(tmp_path / "ed_index" / "vectors"))
    assert {r.vec_id for r in vecs.collect()} == {1, 2, 10, 20, 21}


def test_streaming_sessionize_watermark_closes_sessions(spark, tmp_path):
    """Append mode emits a session only after the watermark passes its
    gap horizon — the bounded-state contract: closed sessions leave the
    state store and are immutable to later events."""
    import datetime as dt

    from tg_reporting_etl_spark.streaming.pipeline import streaming_sessionize

    schema = "ts timestamp, user_id long, event_type string, value double"

    def rows_df(rows):
        return spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, h, m), uid, "a", 1.0) for (h, m, uid) in rows], schema
        )

    src = str(tmp_path / "wm_src")
    rows_df([(0, 0, 1), (0, 5, 1)]).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = start_memory_sink(streaming_sessionize(stream, 10, watermark="10 minutes"), "wm_sess", mode="append")
    try:
        q.processAllAvailable()
        # watermark is still at 00:05 - 10min: nothing closed yet
        assert spark.table("wm_sess").count() == 0
        # an event far ahead advances the watermark past user 1's gap
        rows_df([(2, 0, 2)]).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {(r.user_id, r.n_events) for r in spark.table("wm_sess").collect()}
    finally:
        q.stop()
    assert got == {(1, 2)}  # user 1's session closed; user 2's still open


def test_continuous_topk_matches_batch_bruteforce(spark, tmp_path):
    """After streaming the corpus in two batches, the standing top-k
    table equals the batch brute-force top-k over everything ingested —
    re-ranking under arrival order changes nothing."""
    import math
    import os

    from pyspark.sql import functions as F

    from tg_reporting_etl_spark.functions import similarity as sim
    from tg_reporting_etl_spark.streaming.pipeline import start_continuous_topk_sink

    def vec(i):
        return [math.sin(i * 1.7 + d) for d in range(8)]

    all_rows = [(i, vec(i)) for i in range(10)]
    schema = "vec_id long, embedding array<float>"
    src = str(tmp_path / "ct_src")
    os.makedirs(src, exist_ok=True)

    queries = spark.createDataFrame(
        [(i, v) for i, v in all_rows if i in (0, 5)], schema
    ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))

    spark.createDataFrame(all_rows[:6], schema).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    idx = str(tmp_path / "ct_index")
    q = start_continuous_topk_sink(stream, queries, idx, str(tmp_path / "ct_ckpt"), k=3)
    try:
        q.processAllAvailable()
        spark.createDataFrame(all_rows[6:], schema).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {
            (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
            for r in spark.read.parquet(os.path.join(idx, "topk")).collect()
        }
    finally:
        q.stop()

    emb = spark.createDataFrame(all_rows, schema)
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in sim.brute_force_topk(emb, F.col("vec_id").isin(0, 5), k=3).collect()
    }
    assert got == want


def test_streaming_quality_audit_per_batch(spark, tmp_path):
    """Each micro-batch contributes its own rule rows; violations are
    attributed to the batch that carried them."""
    import os

    from tg_reporting_etl_spark.streaming.pipeline import start_quality_audit_sink

    schema = "id long, v double"
    src = str(tmp_path / "qa_src")
    os.makedirs(src, exist_ok=True)
    audit = str(tmp_path / "qa_audit")

    spark.createDataFrame([(1, 5.0), (2, 7.0)], schema).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    rules = dict(not_null=["id"], ranges={"v": (0.0, 10.0)})
    q = start_quality_audit_sink(stream, rules, audit, str(tmp_path / "qa_ckpt"))
    try:
        q.processAllAvailable()
        spark.createDataFrame([(3, 99.0), (None, 1.0)], schema).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.read.parquet(audit).collect()
    finally:
        q.stop()

    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r.epoch_id, {})[r.rule] = r.n_violations
    assert len(by_epoch) == 2
    clean, dirty = (by_epoch[e] for e in sorted(by_epoch))
    assert clean == {"id_not_null": 0, "v_range": 0}
    assert dirty == {"id_not_null": 1, "v_range": 1}


def test_streaming_wau_tracks_batch_within_hll_error(spark, sf_dir, tmp_path):
    """Sliding-window streaming WAU lands within HLL error of the exact
    batch operator on every report day both sides cover."""
    from tg_reporting_etl_spark.operators.sessions import trailing_active_users
    from tg_reporting_etl_spark.sources.readers import load_table
    from tg_reporting_etl_spark.streaming.pipeline import streaming_trailing_active_users

    ev = load_table(spark, sf_dir, "events").select("ts", "user_id")
    src = str(tmp_path / "wau_src")
    ev.write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = start_memory_sink(streaming_trailing_active_users(stream), "wau_stream", mode="complete")
    try:
        q.processAllAvailable()
        approx = {r.report_date: r.n_active for r in spark.table("wau_stream").collect()}
    finally:
        q.stop()
    exact = {r.report_date: r.n_active for r in trailing_active_users(ev, 7).collect()}
    shared = set(approx) & set(exact)
    assert len(shared) >= len(exact) - 1  # sliding grid may clip the edge day
    for d in shared:
        assert abs(approx[d] - exact[d]) <= max(5, 0.05 * exact[d]), d


def test_streaming_wau_exact_chained_aggs(spark, tmp_path):
    """The EXACT streaming WAU (two chained append-mode stateful aggs)
    equals the hand-computed fan-out on a tiny fixture: stage-1 window
    close must feed stage-2's tumbling re-window in the no-data batch
    cascade, and the sentinel must advance the watermark (it rides
    un-filtered through the EventTimeWatermark node — an in-stream
    filter would be predicate-pushed below it and starve the
    watermark)."""
    from pyspark.sql import functions as F

    from tg_reporting_etl_spark.streaming.pipeline import (
        streaming_trailing_active_users_exact,
    )

    base = spark.createDataFrame(
        [(7, "2024-01-01 10:00:00"), (7, "2024-01-02 10:00:00"),
         (8, "2024-01-02 11:00:00"), (-1, "2035-01-01 00:00:00")],
        ["user_id", "s"],
    ).select("user_id", F.col("s").cast("timestamp").alias("ts"))
    src = str(tmp_path / "wau_exact_src")
    base.write.parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    q = start_memory_sink(
        streaming_trailing_active_users_exact(stream), "wau_exact", mode="append"
    )
    try:
        q.processAllAvailable()
        got = {
            str(r.report_date): r.n_active
            for r in spark.table("wau_exact").collect()
            if str(r.report_date) < "2030"
        }
    finally:
        q.stop()
    # user 7 active Jan 1+2, user 8 active Jan 2: report days fan 7 forward
    want = {"2024-01-01": 1}
    want.update({f"2024-01-0{d}": 2 for d in range(2, 9)})
    assert got == want


def test_streaming_cms_matches_batch_sketch(spark, tmp_path):
    """The streaming CMS after two micro-batches must equal the batch
    sketch over the union, estimates must never underestimate, and a
    replayed epoch must be a no-op (per-epoch delta idempotency)."""
    import os

    import pyspark.sql.functions as F

    from tg_reporting_etl_spark.functions import sketch as sk
    from tg_reporting_etl_spark.streaming.pipeline import (
        cms_counters,
        cms_ingest_epoch,
        start_cms_sink,
    )

    W, D = 64, 4
    src = str(tmp_path / "cms_src")
    deltas = str(tmp_path / "cms_deltas")
    os.makedirs(src, exist_ok=True)
    schema = "tok string"
    b1 = [(t,) for t in ["a"] * 5 + ["b"] * 3]
    b2 = [(t,) for t in ["a"] * 2 + ["c"] * 7]

    spark.createDataFrame(b1, schema).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = start_cms_sink(stream, deltas, str(tmp_path / "cms_ckpt"), width=W, depth=D)
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, schema).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    live = cms_counters(spark, deltas)
    rebuilt = sk.cms_build(spark.createDataFrame(b1 + b2, schema), "tok", W, D)
    diff = live.join(rebuilt, ["d", "idx"], "full").filter(
        F.coalesce(live["c"], F.lit(0)) != F.coalesce(rebuilt["c"], F.lit(0))
    )
    assert diff.count() == 0

    keys = spark.createDataFrame([("a",), ("b",), ("c",)], schema)
    est = {r.tok: r.cms_est for r in sk.cms_estimate(keys, "tok", live, W, D).collect()}
    assert est["a"] >= 7 and est["b"] >= 3 and est["c"] >= 7

    # replay epoch 0 with the same rows: byte-identical delta, no double-add
    cms_ingest_epoch(spark, deltas, spark.createDataFrame(b1, schema), 0, width=W, depth=D)
    live2 = cms_counters(spark, deltas)
    diff2 = live2.join(rebuilt, ["d", "idx"], "full").filter(
        F.coalesce(live2["c"], F.lit(0)) != F.coalesce(rebuilt["c"], F.lit(0))
    )
    assert diff2.count() == 0


def test_streaming_range_join_stream_static(spark, tmp_path):
    """The bucketed range join works unchanged as a stream-static
    join: streaming points land in static incident windows — the
    bucket key is a deterministic column on both sides, so Spark's
    stream-static equi join handles it with no custom state."""
    import datetime as dt
    import os

    from tg_reporting_etl_spark.functions.rangejoin import bucketed_range_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def t(secs):
        return t0 + dt.timedelta(seconds=secs)

    ivs = spark.createDataFrame(
        [(1, t(0), t(300)), (2, t(600), t(900))],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    src = str(tmp_path / "rj_src")
    os.makedirs(src, exist_ok=True)
    schema = "pid long, ts timestamp"
    spark.createDataFrame([(1, t(10)), (2, t(400))], schema).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        spark.createDataFrame([], schema).schema
    ).parquet(src)
    out = bucketed_range_join(stream, ivs, bucket_secs=300)
    q = (
        out.writeStream.format("memory")
        .queryName("rj_sink")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame([(3, t(700))], schema).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = {(r.iid, r.pid) for r in spark.sql("SELECT * FROM rj_sink").collect()}
    finally:
        q.stop()
    assert rows == {(1, 1), (2, 3)}  # pid 2 at t=400 is in no window


def test_streaming_cms_survives_restart(spark, tmp_path):
    """Stop the CMS sink and start a NEW query on the same checkpoint:
    the restarted stream must pick up after the committed batch — no
    re-processing, no double-add — and the live counters must equal a
    batch rebuild over everything ingested across both incarnations."""
    import os

    import pyspark.sql.functions as F

    from tg_reporting_etl_spark.functions import sketch as sk
    from tg_reporting_etl_spark.streaming.pipeline import cms_counters, start_cms_sink

    W, D = 64, 4
    src = str(tmp_path / "cmsr_src")
    deltas = str(tmp_path / "cmsr_deltas")
    ckpt = str(tmp_path / "cmsr_ckpt")
    os.makedirs(src, exist_ok=True)
    schema = "tok string"
    b1 = [("a",)] * 4 + [("b",)] * 2
    b2 = [("a",)] * 1 + [("c",)] * 3

    spark.createDataFrame(b1, schema).write.mode("append").parquet(src)
    stream = spark.readStream.schema(spark.createDataFrame([], schema).schema).parquet(src)
    q1 = start_cms_sink(stream, deltas, ckpt, width=W, depth=D)
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()

    # second incarnation: same checkpoint, new data lands while down
    spark.createDataFrame(b2, schema).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(spark.createDataFrame([], schema).schema).parquet(src)
    q2 = start_cms_sink(stream2, deltas, ckpt, width=W, depth=D)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    live = cms_counters(spark, deltas)
    rebuilt = sk.cms_build(spark.createDataFrame(b1 + b2, schema), "tok", W, D)
    diff = live.join(rebuilt, ["d", "idx"], "full").filter(
        F.coalesce(live["c"], F.lit(0)) != F.coalesce(rebuilt["c"], F.lit(0))
    )
    assert diff.count() == 0


def test_streaming_deterministic_sampling_is_stateless(spark, tmp_path):
    """The md5-membership samplers are pure narrow filters, so they
    run unchanged on a stream — and pick EXACTLY the rows the batch
    sampler picks, independent of batch boundaries."""
    import os

    from tg_reporting_etl_spark.functions.sampling import stratified_sample

    src = str(tmp_path / "samp_src")
    os.makedirs(src, exist_ok=True)
    schema = "doc_id long, source string"
    rows = [(i, f"s{i % 2}") for i in range(200)]
    fractions = {"s0": 0.5, "s1": 0.2}

    spark.createDataFrame(rows[:120], schema).write.mode("append").parquet(src)
    stream = spark.readStream.schema(spark.createDataFrame([], schema).schema).parquet(src)
    out = stratified_sample(stream, "source", fractions)
    q = (
        out.writeStream.format("memory").queryName("samp_sink").outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows[120:], schema).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = sorted(r.doc_id for r in spark.sql("SELECT doc_id FROM samp_sink").collect())
    finally:
        q.stop()
    want = sorted(
        r.doc_id
        for r in stratified_sample(
            spark.createDataFrame(rows, schema), "source", fractions
        ).collect()
    )
    assert got == want and 0 < len(got) < 200


def test_streaming_pii_scrub_batch_invariant(spark, tmp_path):
    """PII scrubbing is a pure narrow map, so it runs unchanged on a
    stream and yields byte-identical censuses regardless of batch
    boundaries — scrub-at-ingestion with no state."""
    import os

    from tg_reporting_etl_spark.functions.scrub import scrub_pii

    src = str(tmp_path / "pii_src")
    os.makedirs(src, exist_ok=True)
    schema = "doc_id long, text string"
    rows = [
        (1, "mail alice@example.com now"),
        (2, "server 10.0.0.7 is up"),
        (3, "call 555-123-4567 today"),
        (4, "nothing sensitive here"),
    ]
    spark.createDataFrame(rows[:2], schema).write.mode("append").parquet(src)
    stream = spark.readStream.schema(spark.createDataFrame([], schema).schema).parquet(src)
    q = (
        scrub_pii(stream)
        .writeStream.format("memory")
        .queryName("pii_sink")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows[2:], schema).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {
            r.doc_id: (r.n_emails, r.n_ips, r.n_phones, r.scrubbed_digest)
            for r in spark.sql("SELECT * FROM pii_sink").collect()
        }
    finally:
        q.stop()
    want = {
        r.doc_id: (r.n_emails, r.n_ips, r.n_phones, r.scrubbed_digest)
        for r in scrub_pii(spark.createDataFrame(rows, schema)).collect()
    }
    assert got == want and got[1][0] == 1 and got[2][1] == 1 and got[3][2] == 1


def test_near_dup_index_schemas_match_disk_and_replay_heals(spark, tmp_path):
    """The near-dup sink declares its three index schemas to skip
    footer inference — pin declaration == inference on real index
    files, and prove a torn pairs append self-heals on replay (the
    anti-join re-inserts only what is missing)."""
    import os
    import shutil

    from tg_reporting_etl_spark.streaming.pipeline import start_near_dup_sink

    base = ("alpha beta gamma delta epsilon zeta eta theta " * 4)
    src = str(tmp_path / "nd2_src")
    os.makedirs(src, exist_ok=True)
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [(1, base), (2, base.replace("zeta", "iota"))], schema
    ).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    idx = str(tmp_path / "nd2_index")
    q = start_near_dup_sink(stream, idx, str(tmp_path / "nd2_ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    n_hashes = 16
    declared = {
        "signatures": "doc_id bigint, " + ", ".join(f"m{i} bigint" for i in range(n_hashes)),
        "bands": "doc_id bigint, band int, band_key string",
        "pairs": "doc_a bigint, doc_b bigint, est_jaccard double",
    }
    for table, ddl in declared.items():
        path = f"{idx}/{table}"
        inferred = {f.name: f.dataType.simpleString() for f in spark.read.parquet(path).schema}
        decl = {f.name: f.dataType.simpleString() for f in spark.read.schema(ddl).parquet(path).schema}
        assert inferred == decl, table

    # torn append: wipe the pairs table to a file-less dir, then replay
    # the same wave — the anti-join bootstrap re-inserts the pair
    pairs_before = spark.read.parquet(f"{idx}/pairs").collect()
    assert pairs_before
    shutil.rmtree(f"{idx}/pairs")
    os.makedirs(f"{idx}/pairs/_temporary")
    spark.createDataFrame(
        [(1, base), (2, base.replace("zeta", "iota"))], schema
    ).write.mode("append").parquet(src)
    q2 = start_near_dup_sink(
        spark.readStream.schema(schema).parquet(src), idx, str(tmp_path / "nd2_ckpt")
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    healed = {(r.doc_a, r.doc_b) for r in spark.read.parquet(f"{idx}/pairs").collect()}
    assert healed == {(r.doc_a, r.doc_b) for r in pairs_before}


def test_streaming_embedding_index_dedups_within_batch(spark, tmp_path):
    """A micro-batch carrying the same vec_id twice must append ONE
    vector row and one band-row set (r14 advice): the anti-joins only
    protect against rows already committed, so without in-batch dedup
    the index tables grow dirty duplicate rows."""
    import os

    from tg_reporting_etl_spark.streaming.pipeline import start_embedding_dup_sink

    base = [float(i % 5 + 1) for i in range(16)]
    schema = "vec_id long, embedding array<float>"
    src = str(tmp_path / "dd_src")
    os.makedirs(src, exist_ok=True)
    # same vec_id twice IN ONE batch (identical content)
    spark.createDataFrame([(1, base), (1, list(base)), (2, [-v for v in base])], schema)\
        .write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = start_embedding_dup_sink(
        stream, str(tmp_path / "dd_index"), str(tmp_path / "dd_ckpt"), tau=0.95
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    vecs = spark.read.parquet(str(tmp_path / "dd_index" / "vectors")).collect()
    assert sorted(r.vec_id for r in vecs) == [1, 2]
    bands = spark.read.parquet(str(tmp_path / "dd_index" / "bands")).toPandas()
    assert bands.groupby("vec_id").band.count().tolist() == [4, 4]
    assert not bands.duplicated(["vec_id", "band"]).any()


def test_streaming_embedding_in_batch_conflict_winner_is_deterministic(spark, tmp_path):
    """Content-stable vec_ids are the upstream contract, but if one
    batch DOES carry a vec_id with two DIFFERENT embeddings the elected
    row must be deterministic (r15 residual 3): max payload xxhash64,
    not dropDuplicates' partition-arrival order.  Run the same
    conflicting batch through two independent sinks with the rows in
    OPPOSITE order — both indexes must store the same embedding."""
    import os

    from pyspark.sql import functions as F

    from tg_reporting_etl_spark.streaming.pipeline import start_embedding_dup_sink

    a = [float(i % 5 + 1) for i in range(16)]
    b = [float(i % 3 + 2) for i in range(16)]
    schema = "vec_id long, embedding array<float>"
    # expected winner: the payload with the larger xxhash64 (computed
    # through Spark itself so the test can't drift from the engine)
    hashed = spark.createDataFrame([(1, a), (1, b)], schema).select(
        "embedding", F.xxhash64("embedding").alias("h")
    ).collect()
    expect = max(hashed, key=lambda r: r.h).embedding

    stored = []
    for tag, rows in (("fwd", [(1, a), (1, b)]), ("rev", [(1, b), (1, a)])):
        src = str(tmp_path / f"cf_src_{tag}")
        os.makedirs(src, exist_ok=True)
        spark.createDataFrame(rows, schema).repartition(2).write.mode("append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q = start_embedding_dup_sink(
            stream, str(tmp_path / f"cf_idx_{tag}"), str(tmp_path / f"cf_ckpt_{tag}")
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        vecs = spark.read.parquet(str(tmp_path / f"cf_idx_{tag}" / "vectors")).collect()
        assert [r.vec_id for r in vecs] == [1]
        stored.append(list(vecs[0].embedding))

    assert stored[0] == stored[1] == list(expect)
