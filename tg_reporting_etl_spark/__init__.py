"""tg_reporting_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
the reference reporting ETL (peterhu0224/tg-reporting-etl) as an idiomatic
PySpark library:

- ``schemas``    — explicit StructType catalog for every logical table
- ``sources``    — parquet/JDBC readers and idempotent partitioned sinks
- ``adapters``   — deterministic mapping of the driver testdata (TPC-H-ish)
                   onto the reference-shaped fact/dimension tables
- ``operators``  — window-parameterized DataFrame transforms (the reports)
- ``functions``  — scalar helpers + the LLM-data-pipeline layer
                   (dedup, similarity search, text analysis, multimodal)
- ``runner``     — driver-side orchestration replacing the task_board queue
- ``streaming``  — Structured Streaming variants of the 5-min tier

Design stance (SURVEY.md §7): DataFrame/SQL declarative plans, Catalyst
does the optimizing; no RDDs, no custom Catalyst rules; Pandas UDFs only
where built-ins genuinely cannot express the semantics.
"""

__version__ = "0.1.0"
