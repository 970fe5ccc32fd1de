"""Driver-visible Structured Streaming parity (SURVEY §2.10 + LLM
streaming layer): run a REAL streaming query — file-source micro-
batches, cross-batch dedup state, memory sink — and oracle-check its
materialized output as a batch table.

The streaming components were previously pytest-pinned only (the
driver's harness compares batch DataFrames); this catalog row closes
that gap with a deterministic fixture: the stream's OUTPUT is order-
insensitive by construction (one row per distinct content digest), so
whatever order the file source assigns to micro-batches, the final
index matches the closed-form batch answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tg_reporting_etl_spark.plans.catalog import register
from tg_reporting_etl_spark.sources.readers import load_table

# The stream's emitted rows are exactly one per distinct digest seen
# (first-seen wins; later copies dropped by cross-batch state), so the
# order-insensitive projection equals DISTINCT over the whole corpus.
_STREAM_DEDUP_ORACLE = """
SELECT DISTINCT md5(text) AS digest
FROM documents
WHERE text IS NOT NULL
"""


@register(
    "streaming_exact_dedup_index",
    _STREAM_DEDUP_ORACLE,
    survey_ids="ST1 ST6 + LLM streaming exact dedup (streaming/pipeline.py streaming_exact_dedup)",
)
def q_streaming_exact_dedup_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed the documents corpus through ``streaming_exact_dedup`` as
    TWO overlapping micro-batch waves (doc_id%3 in {0,1}, then {1,2} —
    the overlap guarantees cross-batch duplicates at every sf), collect
    the append-mode memory sink, and return the emitted digest set.

    Exercises end-to-end: file streaming source, watermarked
    ``dropDuplicatesWithinWatermark`` state carried ACROSS micro-
    batches, and an append-mode sink — then proves the streaming
    answer equals the batch closed form via the DuckDB oracle.
    """
    import shutil
    import tempfile

    from tg_reporting_etl_spark.streaming.pipeline import (
        start_memory_sink,
        streaming_exact_dedup,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    base = docs.select(
        "doc_id",
        "text",
        # constant event time: the 1h watermark never expires state
        # within the run, so dedup is corpus-wide like the batch twin
        F.lit("2024-01-05 10:00:00").cast("timestamp").alias("ingest_time"),
    )
    tmp = tempfile.mkdtemp(prefix="stream_dedup_")
    src = f"{tmp}/src"
    sink = "streaming_exact_dedup_index_sink"
    try:
        base.filter(F.col("doc_id") % 3 != 2).write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            "doc_id long, text string, ingest_time timestamp"
        ).parquet(src)
        q = start_memory_sink(streaming_exact_dedup(stream), sink, mode="append")
        try:
            q.processAllAvailable()
            # second wave lands while the query runs: %3==1 docs replay
            # (cross-batch duplicates -> dropped by state), %3==2 are new
            base.filter(F.col("doc_id") % 3 != 0).write.mode("append").parquet(src)
            q.processAllAvailable()
            pdf = spark.sql(f"SELECT digest FROM {sink}").toPandas()
        finally:
            q.stop()
            spark.catalog.dropTempView(sink)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # pandas -> Arrow LocalRelation (a row list would parallelize to 32 tasks)
    return spark.createDataFrame(pdf, "digest string")
