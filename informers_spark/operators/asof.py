"""As-of join — a temporal operator Spark's DataFrame API lacks.

asof_join(left, right): for each left row, attach the most recent right
row with right.ts <= left.ts within the same `by` key (backward as-of).

Implementation is the scalable union+window pattern (no per-row Python,
no range explosion): tag both sides, union on (by, ts), carry right
payload columns forward with last_value(ignorenulls) over the event
order, keep left rows. One shuffle on `by` — the same partitioning a
sort-merge join would need; skew in `by` is handled by AQE.

Tie rule: a right row with ts equal to a left row's ts IS visible to it
(right sorts before left at equal ts) — matching standard ASOF JOIN
(ts_r <= ts_l) semantics, e.g. DuckDB's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    by = [by] if isinstance(by, str) else (by or [])
    right_cols = right_cols or [c for c in right.columns if c != on and c not in by]

    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        *by, F.col(on), *[F.col(c).alias(c + suffix) for c in right_cols]
    ).withColumn("_side", F.lit(0))

    # align schemas for the union
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    for c in [rc + suffix for rc in right_cols]:
        lt = lt.withColumn(c, F.lit(None).cast(rt.schema[c].dataType))
    cols = by + [on, "_side"] + \
        [c for c in left.columns if c not in by and c != on] + \
        [rc + suffix for rc in right_cols]
    unioned = lt.select(*cols).unionAll(rt.select(*cols))

    # right rows (side 0) sort before left rows at equal ts → ts_r <= ts_l
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *[c for c in cols if not c.endswith(suffix) and c != "_side"],
        F.col("_side"),
        *[
            F.last(F.col(rc + suffix), ignorenulls=True).over(w).alias(rc + suffix)
            for rc in right_cols
        ],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")
