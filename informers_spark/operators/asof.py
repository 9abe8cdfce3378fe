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

    # the right payload travels as ONE struct, so every left row sees one
    # CONSISTENT right row — per-column last(ignorenulls) would skip a
    # legitimately-NULL payload value and mix values from different right
    # rows. The struct is non-null whenever a right row exists, even if
    # all its fields are NULL.
    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        *by,
        F.col(on),
        F.struct(*[F.col(c).alias(c) for c in right_cols]).alias("_rpay"),
    ).withColumn("_side", F.lit(0))

    # align schemas for the union
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    lt = lt.withColumn("_rpay", F.lit(None).cast(rt.schema["_rpay"].dataType))
    cols = by + [on, "_side"] + \
        [c for c in left.columns if c not in by and c != on] + ["_rpay"]
    unioned = lt.select(*cols).unionAll(rt.select(*cols))

    # right rows (side 0) sort before left rows at equal ts → ts_r <= ts_l;
    # right-side ties on (by, ts) break deterministically on the payload
    # struct (lexicographic by field) — last() then always picks the max.
    # Structs containing MapType are NOT orderable (AnalysisException), so
    # the tiebreak is skipped for such payloads: ties then resolve
    # arbitrarily, which is the best any engine offers for map payloads.
    def _orderable(dt) -> bool:
        from pyspark.sql import types as T

        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        if isinstance(dt, T.ArrayType):
            return _orderable(dt.elementType)
        return True

    order_cols = [F.col(on).asc(), F.col("_side").asc()]
    if _orderable(rt.schema["_rpay"].dataType):
        order_cols.append(F.col("_rpay").asc_nulls_first())
    w = (
        Window.partitionBy(*by)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *[c for c in cols if c not in ("_side", "_rpay")],
        F.col("_side"),
        F.last(F.col("_rpay"), ignorenulls=True).over(w).alias("_rpay"),
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *[c for c in cols if c not in ("_side", "_rpay")],
            *[F.col("_rpay")[rc].alias(rc + suffix) for rc in right_cols],
        )
    )
