"""Incremental corpus-ingest dedup: the batch twin of the streaming
exact-dedup sink (streaming/pipeline.py) — each arriving batch is
deduped against a PERSISTENT digest index on disk, first-seen wins,
and the index grows by exactly the never-seen digests.

This is the ingestion shape of a living training corpus: crawls land
in batches, and "is this document new?" must consult everything ever
ingested, not just the current batch.

Scale posture: the index holds one row per distinct digest —
(digest, shard, first_doc_id, first_batch), ~50 bytes — partitioned by
a hex-prefix shard so a 1e10-digest index splits into balanced
partitions, and each ingest shuffles only (doc_id, digest, shard)
rows, never document bodies.  Writes are APPEND-only deltas (each ingest writes exactly the
never-seen digests, O(new) not O(index)); idempotency comes from the
anti-join, which makes replay after any partial write self-healing.
A MERGE-capable table format (Delta, via the sources/writers.py
backend registry) upgrades the append to a transactional insert-only
MERGE with no change to the dedup logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from tg_reporting_etl_spark.sources.readers import read_parquet_if_committed
from tg_reporting_etl_spark.sources.writers import write_append

#: hex-prefix length of the shard partition key (1 -> 16 shards; a real
#: deployment sizes this to target partition row counts)
SHARD_PREFIX = 1

#: The index's FIXED on-disk schema (shard is the partition column):
#: passing it to reads skips parquet footer inference — one whole
#: 1-task Spark job saved per ingest.
INDEX_SCHEMA = "digest string, first_doc_id bigint, first_batch int, shard string"


def ingest_batch(
    spark: SparkSession, index_path: str, docs: DataFrame, batch_id: int
) -> int:
    """Dedup ``docs`` against the index at ``index_path``, insert the
    never-seen digests (first-seen wins: existing index rows are NEVER
    replaced), and return how many new digests were added.

    Re-ingesting the same batch is a no-op (returns 0).  Single-writer
    contract (matching the reference's serial producer): the returned
    count is the index growth across THIS call's append.

    Index grain: (digest, shard, first_doc_id, first_batch), first-seen
    wins within a batch via min(doc_id); NULL text drops (text family
    contract)."""
    # Committed-read probe, not bare existence: a crashed prior append
    # can leave index_path existing but file-less (only _temporary), and
    # that torn index must take the bootstrap branch or every later
    # ingest fails at schema inference — the replay-self-healing
    # contract in the module docstring depends on this.
    index = read_parquet_if_committed(spark, index_path, INDEX_SCHEMA)
    existing = index.select("digest") if index is not None else None
    # ONE exchange per ingest: repartition on the shard key FIRST (16-byte
    # digest + doc_id rows, never document bodies), then dedup with
    # groupBy(shard, digest) — hash(shard) already satisfies the
    # aggregate's clustered-distribution requirement because shard is a
    # digest prefix, so the dedup adds NO second exchange, and the write
    # inherits the shard partitioning so each task owns whole shard
    # directories (one file per shard per batch, not tasks x shards
    # fragments).  The previous digest-grain-groupBy-then-repartition
    # layout cost two exchanges; the trade is that this shuffle carries
    # the batch at document grain rather than digest grain — for ingest
    # batches, where duplicates are the minority, the row counts are
    # within a small constant, and a dup-heavy batch still dedups in the
    # aggregate before any write.  The one-file-per-shard layout holds in
    # the broadcast-join regime (index side under the AQE threshold);
    # once the index outgrows broadcast, SMJ re-keys the probe on digest
    # and appends fragment per batch — at that scale the layout owner is
    # periodic shard compaction or the MERGE backend, not this append.
    batch = (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", F.md5("text").alias("digest"))
        # letter-prefixed so parquet partition-value type inference can
        # never read an all-numeric shard back as an int
        .withColumn("shard", F.concat(F.lit("s"), F.substring("digest", 1, SHARD_PREFIX)))
        .repartition("shard")
    )
    probed = batch if existing is None else batch.join(existing, "digest", "left_anti")
    new = (
        probed.groupBy("shard", "digest")
        .agg(F.min("doc_id").alias("first_doc_id"))
        # cast pins the on-disk type to int32 regardless of the batch-id
        # magnitude, so INDEX_SCHEMA stays true for every batch's files
        .select(
            "digest",
            "shard",
            "first_doc_id",
            F.lit(int(batch_id)).cast("int").alias("first_batch"),
        )
    )
    # The returned count comes from an Observation riding the WRITE job
    # itself: the anti-join evaluates exactly once (persisting it for a
    # count/write pair measured 2x slower — caching materializes full
    # rows and defeats column pruning; round 8's before/after footer
    # counts added two whole jobs per ingest), and the observed count is
    # accumulated over the very rows the append landed, so even a
    # nondeterministic input can never make count and contents disagree.
    # CollectMetrics sits ABOVE the plan's only exchange (the shard
    # repartition at the bottom), whose input is the raw batch — never
    # empty even on replay — so AQE's empty-relation folding cannot
    # swallow the metrics row on the all-duplicates path.
    #
    # APPEND, not merge: the anti-join guarantees every written row is
    # a never-seen key, so appending only the delta costs O(new) while
    # a MERGE would rewrite O(index).  The anti-join also makes replay
    # self-healing — after a torn append the re-run inserts exactly the
    # missing digests and converges.  A MERGE-capable backend
    # (sources/writers.py registry) upgrades this to a transactional
    # insert-only MERGE if torn-append visibility is unacceptable.
    obs = Observation()
    write_append(
        new.observe(obs, F.count(F.lit(1)).alias("n_new")),
        index_path,
        partition_cols=["shard"],
    )
    return int(obs.get["n_new"])
