"""Declarative data-quality gate: rule set -> violation report.

The reference trusts MariaDB's implicit schema (SURVEY §1.3 — types
"are whatever the DB returns"); a lakehouse engine has to make those
constraints explicit.  ``quality_report`` turns a declarative rule set
(not-null, enum domain, numeric range, key uniqueness) into ONE
aggregation pass over the table — every rule is a conditional-sum
measure in the same partial-aggregable agg, so the gate costs a single
scan regardless of rule count — followed by a constant-size unpivot
(``stack``) into the (rule, n_violations) report shape.

Usage gate pattern: ``assert report.filter("n_violations > 0").count()
== 0`` before a sink write, or persist the report next to the output
as an audit artifact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _viol(cond: Column) -> Column:
    """Count of rows where ``cond`` (the VIOLATION predicate) holds;
    null predicate results count as violations (unknown => not
    provably valid)."""
    return F.sum(F.when(F.coalesce(cond, F.lit(True)), 1).otherwise(0)).cast("long")


def quality_report(
    df: DataFrame,
    not_null: list[str] = (),
    in_set: dict[str, list] | None = None,
    ranges: dict[str, tuple] | None = None,
    unique: list[str] = (),
) -> DataFrame:
    """(rule, n_violations) — one row per declared rule.

    - ``not_null``: columns that must not be NULL
    - ``in_set``: column -> allowed values (NULL is a violation)
    - ``ranges``: column -> (lo, hi) inclusive numeric bounds
    - ``unique``: key columns whose TUPLE must be unique across the
      table (violations = n_rows - n_distinct_tuples)
    """
    measures: list[tuple[str, Column]] = []
    for c in not_null:
        measures.append((f"{c}_not_null", _viol(F.col(c).isNull())))
    for c, allowed in (in_set or {}).items():
        measures.append((f"{c}_in_set", _viol(~F.col(c).isin(list(allowed)))))
    for c, (lo, hi) in (ranges or {}).items():
        measures.append((f"{c}_range", _viol((F.col(c) < lo) | (F.col(c) > hi))))
    if unique:
        tuple_col = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in unique])
        measures.append(
            (
                "_".join(unique) + "_unique",
                (F.count("*") - F.count_distinct(tuple_col)).cast("long"),
            )
        )
    if not measures:
        raise ValueError("quality_report needs at least one rule")

    agged = df.agg(*[m.alias(name) for name, m in measures])
    stack = ", ".join(f"'{name}', {name}" for name, _ in measures)
    return agged.select(
        F.expr(f"stack({len(measures)}, {stack}) as (rule, n_violations)")
    )
