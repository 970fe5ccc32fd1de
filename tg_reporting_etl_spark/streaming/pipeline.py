"""Structured Streaming variant of the 5-min tier (SURVEY §2.10).

The reference fakes streaming with cron + task_board: 5-minute tumbling
windows minted as tasks (ST1), open windows recomputed every cycle until
now() passes lt_time (ST2 update mode), and late corrections via the
rerun cascade (ST3).  Structured Streaming expresses all three natively:

- ST1: ``groupBy(window(trade_time, "5 minutes"), keys)``
- ST2: update output mode — Spark re-emits a window's row every time a
  batch changes it, exactly the recompute-and-overwrite loop
- ST3: ``withWatermark`` keeps window state open for the late-data
  horizon; a late event re-aggregates its window instead of needing a
  manual rerun cascade
- ST6: ``foreachBatch`` + dynamic partition overwrite gives the same
  idempotent delete-before-insert sink as the batch tier

Local testing drives a parquet-backed stream through
``processAllAvailable`` (synchronous, deterministic).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from tg_reporting_etl_spark.operators.player_summary import GROUP_KEYS as _PLAYER_KEYS
from tg_reporting_etl_spark.operators.trans_summary import GROUP_KEYS, MEASURES, _base_aggs


#: upsert grain of each streaming aggregation: its groupBy keys plus the
#: window start.  The partitioned sink REQUIRES the matching grain —
#: merging a finer-grained aggregation on a coarser key set would not
#: fail, it would silently anti-join away same-key rows the batch didn't
#: carry (e.g. a player's other game_codes).
TRANS_5MIN_GRAIN = [*GROUP_KEYS, "start_time"]
PLAYER_5MIN_GRAIN = [*_PLAYER_KEYS, "start_time"]


def streaming_trans_summary_5min(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """The trans_summary_5min aggregation as a streaming plan.

    Identical measure expressions to the batch operator (shared
    ``_base_aggs``) — one definition, two runtimes.
    """
    filtered = stream.filter(F.col("trade_status") == "SUCCESS").withWatermark(
        "trade_time", watermark
    )
    win = F.window("trade_time", "5 minutes")
    agg = filtered.groupBy(win.alias("w"), *GROUP_KEYS).agg(*_base_aggs(filtered))
    return agg.select(
        *GROUP_KEYS,
        *MEASURES,
        F.col("w.start").alias("start_time"),
        F.col("w.end").alias("end_time"),
    )


def streaming_player_summary_5min(
    stream: DataFrame, game_sites: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """The player_summary_5min aggregation as a streaming plan.

    Same measure expressions as the batch operator (shared
    ``base_player_aggs``/``derive_player_measures``).  One structural
    difference forced by the runtime: Structured Streaming forbids joins
    after a streaming aggregation, so the site-ratio dim joins the event
    stream BEFORE the groupBy (stream-static broadcast join) and rides
    through as ``min(ratio)`` — ratio is functionally dependent on
    (platform, site_code), so the result is identical to the batch
    post-agg join.
    """
    from tg_reporting_etl_spark.operators.player_summary import (
        GROUP_KEYS as P_KEYS,
        OUT_COLUMNS as P_OUT,
        base_player_aggs,
        derive_player_measures,
        site_ratio_dim,
    )

    enriched = (
        stream.filter(F.col("is_robot") == 0)
        .join(site_ratio_dim(game_sites), on=["platform", "site_code"], how="left")
        .withColumn("ratio", F.coalesce(F.col("ratio"), F.lit(0.0)))
        .withWatermark("round_time", watermark)
    )
    win = F.window("round_time", "5 minutes")
    agg = enriched.groupBy(win.alias("w"), *P_KEYS).agg(
        *base_player_aggs(), F.min("ratio").alias("ratio")
    )
    return derive_player_measures(agg).select(
        *P_KEYS,
        *P_OUT,
        F.col("w.start").alias("start_time"),
        F.col("w.end").alias("end_time"),
    )


def start_memory_sink(agg: DataFrame, name: str, mode: str = "update") -> StreamingQuery:
    """Drive a streaming aggregation into an in-memory table for tests."""
    return (
        agg.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(processingTime="0 seconds")
        .start()
    )


def start_partitioned_sink(
    agg: DataFrame,
    path: str,
    checkpoint: str,
    keys: list[str],
    partition_cols: list[str] | None = None,
) -> StreamingQuery:
    """Production shape: exactly-once-ish idempotent window sink (ST6).

    Update mode re-emits only the (window, key) rows a micro-batch
    changed, so the sink must UPSERT at exactly that grain: foreachBatch
    merges the batch into the table on ``keys`` (the aggregation's
    groupBy keys + start_time — TRANS_5MIN_GRAIN / PLAYER_5MIN_GRAIN),
    keeping every previously-emitted row the batch didn't touch.  The
    grain is an explicit REQUIRED argument: a coarser key set would not
    fail, it would silently anti-join away same-key rows absent from
    the batch (e.g. a player's other game_codes when merging the player
    stream at the trans grain).  A plain partition overwrite — even at
    (date, hour, min) granularity — would likewise wipe same-window
    rows for keys absent from the batch.  Re-delivered batches merge to
    the same rows (idempotent).  ``partition_cols`` picks the DIRECTORY
    grain (default (summary_date, hours, mins) — the reference's delete
    keys): the merge reads and rewrites only the touched partitions.
    All three derived time columns are always present in the table; at
    deployment scale a coarser directory grain (e.g. ["summary_date"])
    keeps the per-trigger filesystem metadata cost at O(touched days)
    instead of O(touched 5-min windows) — thousands of tiny directory
    overwrites per micro-batch is a real small-files scale-killer.
    """
    missing = [k for k in keys if k not in agg.columns]
    if missing:
        raise ValueError(f"sink grain columns not in the aggregation output: {missing}")
    part_cols = partition_cols or ["summary_date", "hours", "mins"]

    def _write(batch: DataFrame, epoch_id: int) -> None:
        from tg_reporting_etl_spark.sources.writers import (
            _release_local_checkpoint,
            merge_into,
        )

        out = (
            batch.withColumn(
                "summary_date",
                (F.year("start_time") * 10000 + F.month("start_time") * 100 + F.dayofmonth("start_time")).cast("int"),
            )
            .withColumn("hours", F.hour("start_time"))
            .withColumn("mins", F.minute("start_time"))
        )
        # Pin the micro-batch output ONCE: merge_into references the
        # batch three times (touched-partition set, anti-join key set,
        # union branch), and in foreachBatch each reference re-executes
        # the whole stateful micro-batch plan (source scan + shuffle +
        # state-store pass).  One eager localCheckpoint makes the
        # changed-window set — small by update-mode construction — a
        # block-backed leaf instead.
        out = out.localCheckpoint(eager=True)
        try:
            # Watermark-advance triggers hand update-mode foreachBatch an
            # EMPTY batch; merging it is a no-op by construction (no
            # touched partitions, nothing anti-joined or unioned), so
            # skip the whole target-read + anti-join + write cycle.  The
            # emptiness probe is one tiny job over the already-pinned
            # blocks, not a plan re-execution.
            if out.take(1):
                merge_into(
                    batch.sparkSession,
                    path,
                    out,
                    keys=keys,
                    partition_cols=part_cols,
                )
        finally:
            _release_local_checkpoint(out)

    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def streaming_exact_dedup(
    stream: DataFrame,
    event_time_col: str = "ingest_time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of ``functions.dedup.exact_dedup`` — the
    incremental-ingestion shape: emit each document the FIRST time its
    content digest is seen; later copies (same batch or any later batch
    within the watermark horizon) are dropped.

    ``dropDuplicatesWithinWatermark`` keys state on the 16-byte content
    digest, not the text, and the watermark bounds state so a perpetual
    ingest stream does not accumulate digests forever — the batch
    operator's full-corpus groupBy semantics, traded for a bounded
    dedup horizon (duplicates farther apart than the watermark pass
    through, the standard streaming-dedup contract).
    """
    digested = stream.withColumn("digest", F.md5("text")).withWatermark(
        event_time_col, watermark
    )
    return digested.dropDuplicatesWithinWatermark(["digest"])


def start_near_dup_sink(
    stream: DataFrame,
    index_dir: str,
    checkpoint: str,
    k: int = 5,
    n_hashes: int = 16,
    bands: int = 4,
    est_tau: float = 0.5,
) -> StreamingQuery:
    """Incremental MinHash-LSH near-dup detection over a document stream.

    The streaming completion of the LLM dedup layer (the batch twin is
    ``functions.dedup.minhash_dedup``; ``streaming_exact_dedup`` covers
    only byte-identical copies).  Each micro-batch:

    1. computes MinHash signatures for the batch docs
       (:func:`~tg_reporting_etl_spark.functions.dedup.minhash_signatures`
       — 16 longs/doc, the bounded unit of index state);
    2. probes the PERSISTENT band table with the batch's band rows
       ((band, band_key) equi-join, batch side broadcast) for collisions
       against every previously indexed document, plus a batch-local
       self-join for intra-batch pairs;
    3. scores each candidate by signature agreement — mean over i of
       [m_i(a) == m_i(b)], the unbiased MinHash Jaccard estimator — and
       keeps pairs with ``est_jaccard >= est_tau``;
    4. APPENDS the never-seen signatures/band rows/pairs (anti-join on
       the key, then insert — all three tables are insert-only because
       their rows are content-derived, so re-delivered batches are
       idempotent at O(new) write cost per batch, never O(index);
       replay after a torn append self-heals the same way
       ``functions.ingest.ingest_batch`` does).

    Index layout under ``index_dir``: ``signatures`` (doc_id, m0..),
    ``bands`` (doc_id, band, band_key), ``pairs`` (doc_a, doc_b,
    est_jaccard).  Per-batch cost is O(batch × collisions): history is
    touched only through the band-key equi-join and the candidate-keyed
    signature lookup, never rescanned per doc.  At 100 TB the parquet
    index swaps for a MERGE-capable format (the sources/writers backend
    registry) bucketed by band_key; exact full-text verification (the
    batch path's ``_jaccard_on_hashed``) needs shingle sets the index
    deliberately does not keep — signature agreement is the documented
    detection contract here, with P(candidate) = 1-(1-J^r)^b recall as
    in the batch LSH path.
    """
    import os

    from tg_reporting_etl_spark.functions.dedup import (
        char_shingles,
        minhash_band_rows,
        minhash_signatures,
    )
    from tg_reporting_etl_spark.sources.readers import read_parquet_if_committed
    from tg_reporting_etl_spark.sources.writers import _release_local_checkpoint

    sig_path = os.path.join(index_dir, "signatures")
    band_path = os.path.join(index_dir, "bands")
    pairs_path = os.path.join(index_dir, "pairs")

    # Fixed on-disk schemas: declared reads skip the per-batch parquet
    # footer-inference job (three index tables x every micro-batch).
    sig_schema = "doc_id bigint, " + ", ".join(f"m{i} bigint" for i in range(n_hashes))
    band_schema = "doc_id bigint, band int, band_key string"
    pairs_schema = "doc_a bigint, doc_b bigint, est_jaccard double"

    def _write(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        docs = batch.select("doc_id", "text")
        # signatures are reused four ways below (bands, both estimator
        # sides, index merge) — checkpoint once, batch-sized
        sig_b = minhash_signatures(char_shingles(docs, k), n_hashes).localCheckpoint(eager=True)
        try:
            _near_dup_batch(spark, sig_b)
        finally:
            _release_local_checkpoint(sig_b)

    def _near_dup_batch(spark, sig_b: DataFrame) -> None:
        if not sig_b.take(1):
            return
        bands_b = minhash_band_rows(sig_b, n_hashes, bands)

        cand_frames = [
            bands_b.alias("a").join(
                bands_b.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
        ]
        hist = read_parquet_if_committed(spark, band_path, band_schema)
        # read the signatures table INDEPENDENTLY of the bands table:
        # writes are ordered pairs->signatures->bands, so a crash
        # between the signatures and bands appends leaves sigs committed
        # with bands absent — gating this read on `hist` would skip the
        # signatures anti-join on replay and append the batch's rows a
        # second time (duplicate doc_id rows accumulating in the index)
        hist_sigs = read_parquet_if_committed(spark, sig_path, sig_schema)
        if hist is not None:
            # history never collides with itself here — those pairs were
            # reported when their younger doc arrived
            cand_frames.append(
                F.broadcast(bands_b).alias("a").join(
                    hist.alias("b"),
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.band_key") == F.col("b.band_key"))
                    & (F.col("a.doc_id") != F.col("b.doc_id")),
                )
            )
        cands = reduce(
            DataFrame.unionByName,
            [
                f.select(
                    F.least("a.doc_id", "b.doc_id").alias("doc_a"),
                    F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
                )
                for f in cand_frames
            ],
        ).distinct()

        sigs_all = sig_b if hist_sigs is None else sig_b.unionByName(hist_sigs).dropDuplicates(["doc_id"])
        sa = sigs_all.select(F.col("doc_id").alias("doc_a"), *[F.col(f"m{i}").alias(f"_a{i}") for i in range(n_hashes)])
        sb = sigs_all.select(F.col("doc_id").alias("doc_b"), *[F.col(f"m{i}").alias(f"_b{i}") for i in range(n_hashes)])
        agree = sum(
            F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0) for i in range(n_hashes)
        ) / F.lit(float(n_hashes))
        pairs = (
            cands.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("est_jaccard", agree)
            .filter(F.col("est_jaccard") >= est_tau)
            .select("doc_a", "doc_b", "est_jaccard")
        )

        # All three index tables are INSERT-only (signatures and bands
        # are content-derived, so a re-delivered doc's rows are
        # bit-identical; a pair's estimator likewise) — so idempotency
        # is an anti-join + APPEND of the never-seen keys, O(new) per
        # batch, exactly the ingest_batch shape.  The earlier merge_into
        # rewrote each table whole per batch — O(index) writes that
        # cannot survive a long-running stream.  Replay after a torn
        # append self-heals: the anti-join re-inserts only what is
        # missing.  (The batch side of the anti-join is tiny; the index
        # side prunes to the join keys.)
        old_pairs = read_parquet_if_committed(spark, pairs_path, pairs_schema)
        new_pairs = (
            pairs
            if old_pairs is None
            else pairs.join(old_pairs.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_anti")
        )
        new_pairs.write.mode("append").parquet(pairs_path)
        new_sigs = (
            sig_b
            if hist_sigs is None
            else sig_b.join(hist_sigs.select("doc_id"), "doc_id", "left_anti")
        )
        new_sigs.write.mode("append").parquet(sig_path)
        new_bands = (
            bands_b
            if hist is None
            else bands_b.join(hist.select("doc_id", "band"), ["doc_id", "band"], "left_anti")
        )
        new_bands.write.mode("append").parquet(band_path)

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def streaming_sessionize(
    stream: DataFrame, gap_minutes: int = 30, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming twin of ``operators.sessions.sessionize`` via native
    ``session_window`` — Spark's gap-based session state machine.

    The batch operator assigns per-user session ids with lag + running
    cumsum; Structured Streaming expresses the same gap semantics
    declaratively: ``session_window(ts, gap)`` opens a window at each
    event and MERGES overlapping windows across micro-batches in the
    state store, so a session straddling any number of batches emits as
    one row once the watermark closes it.  Aggregates mirror the batch
    columns; two contract deltas, both forced by the runtime:

    - no running ``session_id`` counter (needs a total order over a
      user's closed sessions) — ``session_start`` is the natural key;
    - ``countDistinct`` is unsupported in streaming aggs, so
      ``n_event_types`` is ``size(collect_set(...))`` — identical value,
      state bounded by the event-type alphabet.

    ``session_end`` is ``max(ts)`` (batch parity), not the
    ``session_window.end`` bound (which is max(ts) + gap).
    """
    win = F.session_window("ts", f"{gap_minutes} minutes")
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), win.alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
            F.size(F.collect_set("event_type")).cast("long").alias("n_event_types"),
        )
    )
    return agg.select(
        "user_id", "session_start", "session_end", "n_events", "total_value", "n_event_types"
    )


def start_embedding_dup_sink(
    stream: DataFrame,
    index_dir: str,
    checkpoint: str,
    tau: float = 0.9,
    bands: int = 4,
    dims_per_band: int = 4,
) -> StreamingQuery:
    """Incremental embedding-cosine near-dup detection over a vector
    stream — the embedding twin of :func:`start_near_dup_sink`.

    Same index/probe/merge skeleton, one semantic upgrade: because the
    index keeps FULL vectors (a bounded ``dim x 8`` bytes per doc, vs
    the unbounded shingle sets the MinHash index cannot afford), every
    candidate is verified with the EXACT cosine — the only approximation
    is candidate recall, set by sign-LSH banding (a pair is probed only
    if some band's sign pattern matches, the batch analogue is
    ``similarity.sign_lsh_bands``/``ann_sign_lsh_topk``).

    Index layout under ``index_dir``: ``vectors`` (vec_id, embedding),
    ``bands`` (vec_id, band, band_key), ``pairs`` (vec_a, vec_b,
    cos_sim).  Per-batch cost is O(batch x band-collisions): history is
    touched via the (band, band_key) equi-join (batch side broadcast)
    and the candidate-keyed vector lookup, never rescanned.  All three
    tables are INSERT-only (vectors and band rows are content-derived,
    a pair's exact cosine likewise), so idempotency is an anti-join +
    APPEND of never-seen keys — O(new) writes per batch, never
    O(index), the same r10 rewrite the MinHash sink got (a long-running
    stream cannot afford whole-index rewrites per trigger).  Replay
    after a torn append self-heals: the anti-join re-inserts only what
    is missing.
    """
    import os

    from tg_reporting_etl_spark.functions.similarity import cosine, sign_lsh_bands
    from tg_reporting_etl_spark.sources.readers import read_parquet_if_committed
    from tg_reporting_etl_spark.sources.writers import _release_local_checkpoint

    vec_path = os.path.join(index_dir, "vectors")
    band_path = os.path.join(index_dir, "bands")
    pairs_path = os.path.join(index_dir, "pairs")

    # Fixed on-disk schemas: declared reads skip the per-batch parquet
    # footer-inference job (three index tables x every micro-batch).
    vec_schema = "vec_id bigint, embedding array<float>"
    band_schema = "vec_id bigint, band int, band_key string"
    pairs_schema = "vec_a bigint, vec_b bigint, cos_sim double"

    def _write(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        # In-batch dedup: the anti-joins below only protect against rows
        # already COMMITTED to the index — a micro-batch carrying the same
        # vec_id twice would otherwise append duplicate vector/band rows
        # (pairs stay correct via cands.distinct(), but the index tables
        # grow dirty rows that every later batch re-joins against).
        # Content-stable ids are the upstream contract, but if one batch
        # DOES carry a vec_id with conflicting embeddings the winner must
        # be deterministic (r15 residual 3): dropDuplicates picks an
        # arbitrary row per partition-arrival order, so keep the max-by
        # payload hash instead — any replica of the batch elects the
        # same row.
        w = Window.partitionBy("vec_id").orderBy(F.xxhash64("embedding").desc())
        vec_b = (
            batch.select("vec_id", "embedding")
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .localCheckpoint(eager=True)
        )
        try:
            _dup_batch(spark, vec_b)
        finally:
            _release_local_checkpoint(vec_b)

    def _dup_batch(spark, vec_b: DataFrame) -> None:
        if not vec_b.take(1):
            return
        bands_b = sign_lsh_bands(vec_b, bands, dims_per_band)

        cand_frames = [
            bands_b.alias("a").join(
                bands_b.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
        ]
        hist = read_parquet_if_committed(spark, band_path, band_schema)
        # vectors read INDEPENDENTLY of bands: writes are ordered
        # pairs->vectors->bands, so a crash between the vectors and
        # bands appends leaves vectors committed with bands absent —
        # gating this read on `hist` would skip the vectors anti-join
        # on replay and append the batch's rows a second time
        hist_vecs = read_parquet_if_committed(spark, vec_path, vec_schema)
        if hist is not None:
            # history never collides with itself — those pairs were
            # reported when their younger vector arrived
            cand_frames.append(
                F.broadcast(bands_b).alias("a").join(
                    hist.alias("b"),
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.band_key") == F.col("b.band_key"))
                    & (F.col("a.vec_id") != F.col("b.vec_id")),
                )
            )
        cands = reduce(
            DataFrame.unionByName,
            [
                f.select(
                    F.least("a.vec_id", "b.vec_id").alias("vec_a"),
                    F.greatest("a.vec_id", "b.vec_id").alias("vec_b"),
                )
                for f in cand_frames
            ],
        ).distinct()

        vecs_all = (
            vec_b if hist_vecs is None else vec_b.unionByName(hist_vecs).dropDuplicates(["vec_id"])
        )
        va = vecs_all.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("_ea"))
        vb = vecs_all.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("_eb"))
        pairs = (
            cands.join(va, "vec_a")
            .join(vb, "vec_b")
            .withColumn("cos_sim", F.round(cosine(F.col("_ea"), F.col("_eb")), 6))
            .filter(F.col("cos_sim") >= tau)
            .select("vec_a", "vec_b", "cos_sim")
        )

        old_pairs = read_parquet_if_committed(spark, pairs_path, pairs_schema)
        new_pairs = (
            pairs
            if old_pairs is None
            else pairs.join(old_pairs.select("vec_a", "vec_b"), ["vec_a", "vec_b"], "left_anti")
        )
        new_pairs.write.mode("append").parquet(pairs_path)
        new_vecs = (
            vec_b
            if hist_vecs is None
            else vec_b.join(hist_vecs.select("vec_id"), "vec_id", "left_anti")
        )
        new_vecs.write.mode("append").parquet(vec_path)
        new_bands = (
            bands_b
            if hist is None
            else bands_b.join(hist.select("vec_id", "band"), ["vec_id", "band"], "left_anti")
        )
        new_bands.write.mode("append").parquet(band_path)

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def start_continuous_topk_sink(
    stream: DataFrame,
    queries: DataFrame,
    index_dir: str,
    checkpoint: str,
    k: int = 5,
) -> StreamingQuery:
    """Continuous top-k similarity search: registered query vectors keep
    an always-current top-k neighbor table while the corpus streams in
    (the incremental-session-search shape — EDBT'20 incremental top-k /
    SIGMOD'20 continuously adaptive search).

    ``queries`` is a static (query_id, q_emb) frame, broadcast against
    each micro-batch — per batch cost is O(batch x queries), never the
    corpus.  The persistent ``topk`` table is the ONLY state: each batch
    unions its candidate scores with the standing top-k and re-ranks by
    (cos_sim DESC, neighbor_id ASC), so displaced neighbors fall out
    and re-delivered batches are idempotent (a neighbor can only tie
    with itself).  Bounded at |queries| x k rows forever.
    """
    import os

    from pyspark.sql import Window as W

    from tg_reporting_etl_spark.functions.similarity import cosine

    topk_path = os.path.join(index_dir, "topk")
    q = queries.select("query_id", "q_emb")

    def _write(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        if not batch.take(1):
            return
        scored = batch.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos_sim"),
        )
        from tg_reporting_etl_spark.sources.writers import _fs_path

        fs, jpath = _fs_path(spark, topk_path)
        if fs.exists(jpath):
            standing = spark.read.parquet(topk_path).select("query_id", "neighbor_id", "cos_sim")
            scored = scored.unionByName(standing).dropDuplicates(["query_id", "neighbor_id"])
        w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
        new_topk = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("int").alias("rank"))
        )
        # bounded table: materialize then overwrite (reading and writing
        # the same path in one plan is illegal)
        rows = new_topk.collect()
        spark.createDataFrame(rows, new_topk.schema).write.mode("overwrite").parquet(topk_path)

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def start_quality_audit_sink(
    stream: DataFrame,
    rules: dict,
    audit_path: str,
    checkpoint: str,
) -> StreamingQuery:
    """Per-micro-batch data-quality audit: run the declarative rule set
    (:func:`~tg_reporting_etl_spark.functions.validate.quality_report`)
    over every batch and APPEND the (epoch_id, rule, n_violations) rows
    to a durable audit table — the streaming form of the batch gate,
    giving an always-growing record of when violations entered the
    stream.  One agg pass per batch regardless of rule count; the audit
    table grows by |rules| rows per trigger."""
    from tg_reporting_etl_spark.functions.validate import quality_report

    def _write(batch: DataFrame, epoch_id: int) -> None:
        if not batch.take(1):
            return
        report = quality_report(batch, **rules).withColumn(
            "epoch_id", F.lit(int(epoch_id)).cast("long")
        )
        report.write.mode("append").parquet(audit_path)

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def streaming_trailing_active_users(
    stream: DataFrame, window_days: int = 7, watermark: str = "1 day", rsd: float = 0.02
) -> DataFrame:
    """Streaming twin of the batch WAU operator: a sliding event-time
    window (length ``window_days``, sliding daily) with
    ``approx_count_distinct`` — exact distinct over sliding windows
    would keep every user id per open window in state, so the streaming
    path trades to HLL state the same way the batch sketch-merge path
    does (tests/test_approx.py).  Emits (report_date, n_active) where
    report_date is the window's LAST day, matching the batch frame."""
    win = F.window("ts", f"{window_days} days", "1 day")
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(win.alias("w"))
        .agg(F.approx_count_distinct("user_id", rsd).cast("long").alias("n_active"))
        .select(F.date_add(F.to_date("w.end"), -1).alias("report_date"), "n_active")
    )


def streaming_trailing_active_users_exact(
    stream: DataFrame, window_days: int = 7, watermark: str = "1 day"
) -> DataFrame:
    """EXACT streaming WAU via two chained stateful aggregations —
    the oracle-checkable twin of :func:`streaming_trailing_active_users`.

    Stage 1 groups by (sliding window, user_id): the groupBy IS the
    per-window distinct, and append mode emits each (window, user) pair
    exactly once when the watermark closes the window.  Stage 2 re-keys
    those emissions by a 1-day tumbling window over
    ``window_time(w)`` (= w.end - 1µs, the event-time Spark assigns a
    closed window) and counts rows — distinct users per report window.
    Chained stateful operators in one append-mode query are a Spark
    3.5+/4.x capability (watermark propagation, SPARK-40925); the
    re-window via ``window_time`` is what marks stage 2's grouping as
    event-time so its state also evicts.

    State is O(windows x users-per-window) — the exact-distinct cost
    the HLL path avoids; use this when per-day audits must reconcile
    to exact counts, the HLL twin for unbounded-cardinality streams.
    ``report_date`` is the window's LAST day, matching the batch frame
    (stage-2's tumbling window is [w.end - 1 day, w.end), so that's
    its ``start`` date).
    """
    w = F.window("ts", f"{window_days} days", "1 day")
    per_user = (
        stream.withWatermark("ts", watermark)
        .groupBy(w.alias("w"), "user_id")
        .agg(F.count("*").alias("_c"))
    )
    return (
        per_user.groupBy(F.window(F.window_time("w"), "1 day").alias("w2"))
        .agg(F.count("*").cast("long").alias("n_active"))
        .select(F.to_date("w2.start").alias("report_date"), "n_active")
    )


def cms_ingest_epoch(
    spark,
    deltas_path: str,
    batch: DataFrame,
    epoch_id: int,
    key_col: str = "tok",
    width: int = 1024,
    depth: int = 4,
) -> None:
    """One micro-batch of the streaming count-min sketch: build the
    batch's own D x W counter delta and MERGE it keyed by
    (epoch_id, d, idx).

    Per-EPOCH deltas (not a mutated running total) make re-delivery
    idempotent: a replayed epoch rewrites byte-identical rows instead
    of double-adding, the additive-merge property the batch
    :func:`~tg_reporting_etl_spark.functions.sketch.cms_merge` test
    pins.  The live sketch is the epoch-sum view
    (:func:`cms_counters`); a compaction job may fold closed epochs
    into one row set at any time without changing that view."""
    from tg_reporting_etl_spark.functions.sketch import cms_build
    from tg_reporting_etl_spark.sources.writers import (
        _release_local_checkpoint,
        merge_into,
    )

    delta = cms_build(batch.select(key_col), key_col, width, depth).withColumn(
        "epoch_id", F.lit(int(epoch_id)).cast("long")
    )
    # Pin the D x W delta (<= depth*width rows) once: the emptiness
    # guard and the merge's two batch references would otherwise each
    # re-run the stateful micro-batch plan behind `batch`.
    delta = delta.localCheckpoint(eager=True)
    try:
        if delta.take(1):
            merge_into(spark, deltas_path, delta, keys=["epoch_id", "d", "idx"])
    finally:
        _release_local_checkpoint(delta)


def cms_counters(spark, deltas_path: str) -> DataFrame:
    """The live counter table: epoch deltas summed to (d, idx, c) —
    directly consumable by
    :func:`~tg_reporting_etl_spark.functions.sketch.cms_estimate`."""
    return (
        spark.read.parquet(deltas_path)
        .groupBy("d", "idx")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def start_cms_sink(
    stream: DataFrame,
    deltas_path: str,
    checkpoint: str,
    key_col: str = "tok",
    width: int = 1024,
    depth: int = 4,
) -> StreamingQuery:
    """Streaming heavy-hitter counters: maintain a count-min sketch
    over an unbounded key stream with O(D x W) state per epoch and no
    per-key state at all — the frequency twin of the HLL distinct
    path (streaming_trailing_active_users)."""

    def _write(batch: DataFrame, epoch_id: int) -> None:
        cms_ingest_epoch(
            batch.sparkSession, deltas_path, batch, epoch_id, key_col, width, depth
        )

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .start()
    )
