"""Time-series operators: tumbling/sliding/session windows, as-of join
(SURVEY.md §2.B / build plan M3). All batch DataFrame API; the streaming
twins live in ``datacooker_dist_spark.streaming``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling(
    df: DataFrame, ts: str, duration: str, keys: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """Tumbling time window aggregate. ``F.window`` assigns each row to one
    bucket; the aggregate then behaves like a hash agg keyed by
    (window, *keys) with map-side partials, so the shuffle carries one row
    per bucket per input partition regardless of raw volume."""
    return (
        df.groupBy(F.window(ts, duration).alias("w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def sliding(
    df: DataFrame,
    ts: str,
    duration: str,
    slide: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Sliding window aggregate. Each row lands in duration/slide buckets
    (Spark expands them before the agg — input amplification factor is
    duration/slide, bounded and known)."""
    return (
        df.groupBy(F.window(ts, duration, slide).alias("w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def session(
    df: DataFrame, ts: str, gap: str, keys: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """Session window aggregate (gap-based). ``F.session_window`` merges
    overlapping per-row [ts, ts+gap) intervals per key — Spark implements the
    merge after a shuffle on the keys, equivalent to the classic
    gaps-and-islands rewrite but without a per-key sort window in user code."""
    return (
        df.groupBy(F.session_window(ts, gap).alias("w"), *keys)
        .agg(*aggs)
        .withColumn("session_start", F.col("w.start"))
        .withColumn("session_end", F.col("w.end"))
        .drop("w")
    )


def sessionize(df: DataFrame, ts: str, gap_seconds: int, keys: Sequence[str]) -> DataFrame:
    """Explicit gaps-and-islands sessionization: attach ``session_id`` (the
    session's first event timestamp) to every row. One shuffle on keys, one
    per-key sort — the classic lag→flag→cumsum pipeline, kept for when the
    per-row session id is needed (``session`` only yields aggregates)."""
    w = Window.partitionBy(*keys).orderBy(F.col(ts))
    gap_flag = (
        F.when(
            F.col(ts) - F.lag(F.col(ts)).over(w)
            >= F.expr(f"INTERVAL '{gap_seconds}' SECOND"),
            1,
        )
        .otherwise(0)
        .cast("long")
    )
    df = df.withColumn("_new_session", gap_flag)
    df = df.withColumn("_session_seq", F.sum("_new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ))
    w2 = Window.partitionBy(*keys, "_session_seq")
    return df.withColumn("session_id", F.min(F.col(ts)).over(w2)).drop(
        "_new_session", "_session_seq"
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    how: str = "inner",
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the single right row with the greatest
    ``right_ts`` ≤ ``left_ts`` within the same key (DuckDB ``ASOF JOIN``
    semantics). ``direction="forward"`` flips it: the SMALLEST
    ``right_ts`` ≥ ``left_ts`` (the "next event" match). ``tolerance``
    (an SQL interval string, e.g. ``"7 days"``) bounds the match gap the
    way pandas ``merge_asof(tolerance=...)`` does: a carried match farther
    than the tolerance is discarded (inner) or nulled (left) — the stale
    quote/price guard. The filter is applied AFTER the single-pass carry,
    so the plan cost is unchanged.

    Implementation: union-tag + per-key ordered window carrying the last seen
    right row forward — ONE shuffle on the key, one per-key sort, no range
    self-join blowup. This is the merge-join formulation that scales: the
    equi-key shuffle distributes, and skewed keys are handled by AQE.
    A naive ``left×right + row_number`` is O(|matches|) intermediate; this is
    O(|left|+|right|).
    """
    lkey = F.col(left_on)
    # The matched row's timestamp rides inside the carried struct so the
    # tolerance check reads match time and payload from the SAME row.
    rrow = F.struct(
        *[F.col(c) for c in right_cols], F.col(right_ts).alias("__mt")
    )
    r = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_ts).alias("_t"),
        rrow.alias("_rv"),
        F.lit(0).alias("_side"),
    )
    l = left.select(
        lkey.alias("_k"),
        F.col(left_ts).alias("_t"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lv"),
        F.lit(1).alias("_side"),
    )
    both = r.unionByName(l.withColumn("_rv", F.lit(None).cast(r.schema["_rv"].dataType)),
                         allowMissingColumns=True)
    # Backward: right rows sort before left rows at equal timestamps
    # (_side 0 < 1), so a right row AT the left timestamp is visible in the
    # trailing frame — matching ASOF's ≤. Forward mirrors it: left sorts
    # before right at equal timestamps and the frame looks ahead, so the
    # first carried right row is the smallest _t ≥ the left's.
    wb = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_side").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    if direction == "backward":
        carried = both.withColumn("_m", F.last("_rv", ignorenulls=True).over(wb))
    elif direction == "forward":
        carried = both.withColumn("_m", F.first("_rv", ignorenulls=True).over(wf))
    elif direction == "nearest":
        # pandas merge_asof(direction="nearest"): whichever of the
        # backward/forward carries lies closer in time wins; exact time
        # ties (gap 0 on both sides can't happen — equal timestamps are
        # a backward match) and equal gaps break BACKWARD, matching
        # pandas. Both carries ride the SAME key shuffle (two sorts on
        # one exchange), so the plan cost stays one shuffle.
        carried = (
            both.withColumn("_mb", F.last("_rv", ignorenulls=True).over(wb))
            .withColumn("_mf", F.first("_rv", ignorenulls=True).over(wf))
        )
        # timestamp subtraction yields DAY-TIME INTERVALs, which compare
        # exactly at microsecond precision and work for TIMESTAMP and
        # TIMESTAMP_NTZ alike (a double/long epoch cast does not).
        gap_b = F.col("_t") - F.col("_mb.__mt")
        gap_f = F.col("_mf.__mt") - F.col("_t")
        carried = carried.withColumn(
            "_m",
            F.when(F.col("_mb").isNull(), F.col("_mf"))
            .when(F.col("_mf").isNull(), F.col("_mb"))
            .when(gap_b <= gap_f, F.col("_mb"))
            .otherwise(F.col("_mf")),
        ).drop("_mb", "_mf")
    else:
        raise ValueError(f"unknown direction {direction!r}")
    out = carried.filter(F.col("_side") == 1)
    if tolerance is not None:
        lo_ok = F.col("_m.__mt") >= F.col("_t") - F.expr(
            f"INTERVAL {tolerance}"
        )
        hi_ok = F.col("_m.__mt") <= F.col("_t") + F.expr(
            f"INTERVAL {tolerance}"
        )
        gap_ok = (
            lo_ok
            if direction == "backward"
            else hi_ok if direction == "forward" else lo_ok & hi_ok
        )
        out = out.withColumn(
            "_m", F.when(F.col("_m").isNotNull() & gap_ok, F.col("_m"))
        )
    if how == "inner":
        out = out.filter(F.col("_m").isNotNull())
    cols = [F.col("_lv")[c].alias(c) for c in left.columns] + [
        F.col("_m")[c].alias(c) for c in right_cols
    ]
    return out.select(*cols)


def time_weighted_avg(
    df: DataFrame,
    ts: str,
    value: str,
    keys: Sequence[str],
    tiebreak: Sequence[str] = (),
    sum_scale: int = 6,
) -> DataFrame:
    """Time-weighted average of ``value`` per key over [first, last] event
    (the TWAP/sensor-mean shape): each observation is weighted by the
    interval it was in force — value_i · (t_{i+1} − t_i), summed and
    divided by the covered span. One shuffle (the per-key ordered window);
    keys with a single event (zero span) are excluded. Durations are
    integer epoch-micros and the weighted sum accumulates in exact
    decimal, so the result is partition-order independent; equal
    timestamps pair with zero-length intervals EXCEPT the last of a tie
    run, so pass ``tiebreak`` columns forming a total order to make which
    observation carries the following interval engine-stable.
    Output: (*keys, span_us, twap).
    """
    from ..functions.scalars import dsum

    t_us = F.unix_micros(F.col(ts).cast("timestamp"))
    base = df.select(
        *keys, t_us.alias("_t"), F.col(value).alias("_v"),
        *[F.col(c) for c in tiebreak],
    )
    w2 = Window.partitionBy(*keys).orderBy("_t", *[F.col(c) for c in tiebreak])
    stepped = base.withColumn("_d", F.lead("_t").over(w2) - F.col("_t")).filter(
        F.col("_d").isNotNull()
    )
    return (
        stepped.groupBy(*keys)
        .agg(
            F.sum("_d").alias("span_us"),
            dsum(F.col("_v") * F.col("_d"), sum_scale).alias("_wsum"),
        )
        .filter(F.col("span_us") > 0)
        .select(
            *keys,
            "span_us",
            F.round(F.col("_wsum") / F.col("span_us"), 6).alias("twap"),
        )
    )


def ema_fixedpoint(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    alpha_num: int = 1,
    alpha_den: int = 8,
    out_col: str = "ema",
) -> DataFrame:
    """Per-series exponential moving average in exact integer fixed-point:
    ema_1 = x_1; ema_t = (num·x_t + (den-num)·ema_{t-1}) div den.

    EMA is inherently sequential (each step's floor division depends on
    the previous result — no closed form survives integer truncation), so
    this is the textbook ``applyInPandas`` case: partition by series key,
    Arrow-ship each group once, run the O(len) loop in Python ints
    (arbitrary precision — no int64 overflow mid-multiply), return one
    Arrow batch. ONE shuffle on the series keys; series length is the
    per-group memory bound (days/hours per key, not corpus size), and
    group count is the parallelism — the layout that scales to millions
    of independent series. Values must be pre-scaled integers (e.g.
    cents): all arithmetic is exact, so results are bit-identical to any
    other engine running the same recurrence (the suite oracle is a
    DuckDB recursive CTE).
    """
    import pandas as pd

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, {out_col} bigint"
    a_num, a_den = int(alpha_num), int(alpha_den)

    def _ema(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        out = []
        prev = None
        for v in pdf[value_col]:
            # NULL observations (pandas NaN/None) don't move the state and
            # emit a NULL ema — the gap-tolerant convention, instead of
            # crashing the task on int(NaN).
            if pd.isna(v):
                out.append(None)
                continue
            x = int(v)
            prev = x if prev is None else (a_num * x + (a_den - a_num) * prev) // a_den
            out.append(prev)
        pdf[out_col] = pd.array(out, dtype="Int64")
        return pdf

    return df.groupBy(*keys).applyInPandas(_ema, schema=schema)


def holt_fixedpoint(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    alpha_num: int = 1,
    alpha_den: int = 4,
    beta_num: int = 1,
    beta_den: int = 4,
) -> DataFrame:
    """Per-series Holt double-exponential smoothing (level + trend) in
    exact integer fixed-point — the trend-aware big sibling of
    :func:`ema_fixedpoint`:

        l_1 = x_1, b_1 = 0
        l_t = (a_num·x_t + (a_den−a_num)·(l_{t−1}+b_{t−1})) div a_den
        b_t = (b_num·(l_t−l_{t−1}) + (b_den−b_num)·b_{t−1}) div b_den

    Same scale layout: ONE shuffle on the series keys, each series an
    Arrow batch, O(len) Python-int loop (arbitrary precision), group
    count = parallelism. Floor division (Python ``//`` ≡ DuckDB ``//``)
    keeps both engines bit-identical even when the trend goes negative.
    Appends (level, trend, forecast_next = level + trend) columns.
    """
    import pandas as pd

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, level bigint, trend bigint, forecast_next bigint"
    a_n, a_d = int(alpha_num), int(alpha_den)
    b_n, b_d = int(beta_num), int(beta_den)

    def _holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        levels, trends, fcs = [], [], []
        l = b = None
        for v in pdf[value_col]:
            if pd.isna(v):
                levels.append(None)
                trends.append(None)
                fcs.append(None)
                continue
            x = int(v)
            if l is None:
                l, b = x, 0
            else:
                l_prev = l
                l = (a_n * x + (a_d - a_n) * (l + b)) // a_d
                b = (b_n * (l - l_prev) + (b_d - b_n) * b) // b_d
            levels.append(l)
            trends.append(b)
            fcs.append(l + b)
        pdf["level"] = pd.array(levels, dtype="Int64")
        pdf["trend"] = pd.array(trends, dtype="Int64")
        pdf["forecast_next"] = pd.array(fcs, dtype="Int64")
        return pdf

    return df.groupBy(*keys).applyInPandas(_holt, schema=schema)
