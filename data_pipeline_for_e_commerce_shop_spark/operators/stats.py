"""Grouped statistical model fitting as single-pass aggregates.

Closed-form estimators (ordinary least squares, and friends) decompose
into per-group sums, so they run as ONE map-side-combinable aggregate —
the cheapest possible distributed shape: no iteration, no broadcast
model, no second pass over the fact table.

Determinism discipline: the five sufficient statistics (n, Σx, Σy,
Σxy, Σx²) are EXACT int64 sums of integer-encoded inputs (cents, day
indices); only the final slope/intercept arithmetic is double, applied
in an identical expression order on both engines, so results are
bit-identical.  (Naive per-row double accumulation would make the
result depend on partition count.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_for_e_commerce_shop_spark.schemas import load_table

X_EPOCH = "1992-01-01"  # day-index origin keeps Σxy comfortably in int64


def price_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-category OLS trend of line-item price over ship date.

    x = days since 1992-01-01 (int), y = extended price in cents (int).
    slope/intercept come from the normal equations on exact integer
    sufficient statistics; the int64 sums are converted to double ONCE
    and combined in a fixed expression order (n*Σxy - Σx*Σy etc.), so
    Spark and DuckDB produce identical IEEE doubles.

    Plan: broadcast part dim join (category lookup) -> one grouped
    aggregate with map-side partials.  Scales as a pure scan-agg; no
    shuffle beyond the 6-row final groupBy exchange.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    x = F.datediff(
        F.col("l_shipdate").cast("date"), F.lit(X_EPOCH).cast("date")
    ).cast("long")
    y = F.floor(F.col("l_extendedprice") * 100).cast("long")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    suff = joined.select(
        "p_type", x.alias("x"), y.alias("y")
    ).groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return suff.select(
        F.col("p_type").alias("category"),
        "n",
        slope.alias("slope_cents_per_day"),
        ((sy - slope * sx) / n).alias("intercept_cents"),
    )


def _conversion_cells(
    spark: SparkSession, sf_dir: str, with_arm: bool = False
) -> DataFrame:
    """Weighted (arm?, t, is_event) cells of per-user conversion times:
    days from first view to first purchase, right-censored at the
    cohort's last observed day, with every user collapsed into its
    (arm?, tv, tp) contingency cell BEFORE the horizon broadcast.

    Every user in a cell walks the identical (t, is_event) trajectory
    (t depends only on tv, tp and the global horizon), so carrying the
    cell count `nu` as a weight makes every downstream integer sum
    bit-identical to the per-user form — while the table the horizon
    and at-risk branches re-derive shrinks from user-count rows to a
    calendar-bounded |days|²-cell checkpoint.  Previously each of the
    2x2 consumer branches (horizon x risk/tot) re-ran the events scan
    and the user-level shuffle: four fact passes per query, now one.
    """
    from data_pipeline_for_e_commerce_shop_spark.functions.scalars import (
        portable_hash32,
    )

    ev = load_table(spark, sf_dir, "events")
    day = F.expr("unix_timestamp(ts) div 86400")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", day)).alias("tv"),
        F.min(
            F.when(F.col("event_type") == "purchase", day)
        ).alias("tp"),
        F.max(day).alias("last_seen"),
    ).where(F.col("tv").isNotNull())
    keys = ["tv", "tp"]
    if with_arm:
        per_user = per_user.select(
            (portable_hash32(F.col("user_id"), prefix="ab-") % 2).alias(
                "arm"
            ),
            "tv",
            "tp",
            "last_seen",
        )
        keys = ["arm", "tv", "tp"]
    cells = per_user.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("nu"),
        F.max("last_seen").alias("ls"),
    ).localCheckpoint(eager=True)
    horizon = cells.agg(F.max("ls").alias("h"))
    return cells.crossJoin(F.broadcast(horizon)).select(
        *(["arm"] if with_arm else []),
        F.coalesce(
            F.when(
                F.col("tp").isNotNull() & (F.col("tp") >= F.col("tv")),
                F.col("tp") - F.col("tv"),
            ),
            F.col("h") - F.col("tv"),
        ).alias("t"),
        (
            F.col("tp").isNotNull() & (F.col("tp") >= F.col("tv"))
        ).cast("long").alias("is_event"),
        "nu",
    )


def km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival of view→purchase conversion time, fully
    set-oriented: per-user durations (first view to first purchase,
    censored at end-of-observation), integer at-risk/event counts via
    one window pass, then the survival product S(t) = Π(1 - d/n) as a
    higher-order fold over the (≤ |days|) event-time array — a LEFT
    fold seeded at 1.0, so both engines multiply in the identical
    sequence and the curve is bit-exact (products of exact-ratio
    doubles; no exp/ln).

    The only collect-like step is the |event-times|-sized array
    aggregate (bounded by the observation window, not the user
    count) — the same size-gate argument as the k-means model table.
    """
    timed = _conversion_cells(spark, sf_dir)
    risk = timed.groupBy("t").agg(
        F.sum(F.col("is_event") * F.col("nu")).alias("d"),
        F.sum("nu").alias("leaving"),
    )
    w = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # the cohort total rides the plan as a 1-row broadcast (no eager
    # driver count — the tfidf lesson)
    tot = risk.agg(F.sum("leaving").alias("total"))
    at_risk = risk.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        (
            F.col("total")
            - (F.sum("leaving").over(w) - F.col("leaving"))
        ).alias("n_at_risk"),
    ).where(F.col("d") > 0)
    factor = (
        (F.col("n_at_risk") - F.col("d")).cast("double")
        / F.col("n_at_risk").cast("double")
    )
    packed = at_risk.select(
        F.struct("t", "d", "n_at_risk", factor.alias("f")).alias("row")
    ).agg(F.sort_array(F.collect_list("row")).alias("arr"))
    folded = packed.select(
        F.expr(
            "transform(sequence(1, size(arr)), j -> struct("
            " element_at(arr, j).t AS t,"
            " element_at(arr, j).d AS d,"
            " element_at(arr, j).n_at_risk AS n_at_risk,"
            " aggregate(slice(arr, 1, j), CAST(1.0 AS DOUBLE),"
            " (acc, x) -> acc * x.f) AS s))"
        ).alias("z")
    )
    return folded.select(F.explode("z").alias("e")).select(
        F.col("e.t").alias("t_days"),
        F.col("e.d").alias("n_events"),
        F.col("e.n_at_risk").alias("n_at_risk"),
        F.col("e.s").alias("survival"),
    )


def ab_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test: does conversion-time survival differ between the
    hash-assigned experiment arms?  At each event time the arm-1
    observed events are compared with the hypergeometric expectation
    E1 = d·n1/n and variance V = d·(n1/n)·(1-n1/n)·(n-d)/(n-1); the
    statistic z = (O1-ΣE1)/sqrt(ΣV) uses only exact-ratio doubles and
    sqrt.  The E/V sums run as an ORDERED FOLD over the collected
    event-time array (double addition is not associative — a plain
    SUM would be partition-order dependent; the fold is the
    deterministic form, and the array is bounded by the observation
    window).  O1 is an integer sum, order-free.
    """
    timed = _conversion_cells(spark, sf_dir, with_arm=True)
    risk = timed.groupBy("t").agg(
        F.sum(F.col("is_event") * F.col("nu")).alias("d"),
        F.sum(
            F.col("is_event") * F.col("arm") * F.col("nu")
        ).alias("d1"),
        F.sum("nu").alias("leaving"),
        F.sum(F.col("arm") * F.col("nu")).alias("leaving1"),
    )
    tot = risk.agg(
        F.sum("leaving").alias("total"),
        F.sum("leaving1").alias("total1"),
    )
    w = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ar = risk.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        "d1",
        (
            F.col("total")
            - (F.sum("leaving").over(w) - F.col("leaving"))
        ).alias("n"),
        (
            F.col("total1")
            - (F.sum("leaving1").over(w) - F.col("leaving1"))
        ).alias("n1"),
    ).where((F.col("d") > 0) & (F.col("n") > 1))
    dd = F.col("d").cast("double")
    nn = F.col("n").cast("double")
    n1 = F.col("n1").cast("double")
    e1 = dd * n1 / nn
    v = (
        dd
        * (n1 / nn)
        * (F.lit(1).cast("double") - n1 / nn)
        * (nn - dd)
        / (nn - F.lit(1).cast("double"))
    )
    packed = ar.select(
        "d1", F.struct("t", e1.alias("e1"), v.alias("v")).alias("row")
    ).agg(
        F.sum("d1").alias("o1"),
        F.sort_array(F.collect_list("row")).alias("arr"),
    )
    folded = packed.select(
        "o1",
        F.expr(
            "aggregate(arr,"
            " struct(CAST(0.0 AS DOUBLE) AS e, CAST(0.0 AS DOUBLE) AS v),"
            " (acc, x) -> struct(acc.e + x.e1 AS e, acc.v + x.v AS v))"
        ).alias("sums"),
    )
    return folded.select(
        "o1",
        F.col("sums.e").alias("e1_total"),
        F.col("sums.v").alias("v_total"),
        (
            (F.col("o1").cast("double") - F.col("sums.e"))
            / F.sqrt(F.col("sums.v"))
        ).alias("z_logrank"),
    )


def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator over the same
    view→purchase conversion times as km_survival: H(t) = Σ d_i/n_i
    and its variance Σ d_i/n_i² as running window sums over the
    event-time spine.  Hazard-scale readings ADD across strata (the
    property the KM product lacks), which is what makes this the
    estimator you aggregate across shards at 100 TB; no exp/ln — only
    exact-ratio doubles, so both engines agree bit-for-bit.

    Same shape as km_survival up to the at-risk table (one user
    shuffle, one window pass, 1-row broadcast total); the cumsum
    replaces the product fold.
    """
    timed = _conversion_cells(spark, sf_dir)
    risk = timed.groupBy("t").agg(
        F.sum(F.col("is_event") * F.col("nu")).alias("d"),
        F.sum("nu").alias("leaving"),
    )
    w = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = risk.agg(F.sum("leaving").alias("total"))
    at_risk = (
        risk.crossJoin(F.broadcast(tot))
        .select(
            "t",
            "d",
            (
                F.col("total")
                - (F.sum("leaving").over(w) - F.col("leaving"))
            ).cast("long").alias("n_at_risk"),
        )
        .where(F.col("d") > 0)
    )
    wt = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    na = at_risk.select(
        "t",
        "d",
        "n_at_risk",
        F.sum(
            F.expr("CAST(d AS DOUBLE) / n_at_risk")
        ).over(wt).alias("ch"),
        F.sum(
            F.expr(
                "CAST(d AS DOUBLE)"
                " / (CAST(n_at_risk AS DOUBLE) * n_at_risk)"
            )
        ).over(wt).alias("vh"),
    )
    return na.select(
        F.col("t").alias("t_days"),
        F.col("d").cast("long").alias("n_events"),
        "n_at_risk",
        F.expr("CAST(floor(ch * 1000000) AS BIGINT)").alias(
            "cum_hazard_e6"
        ),
        F.expr("CAST(floor(vh * 1000000000000) AS BIGINT)").alias(
            "var_e12"
        ),
    ).orderBy("t_days")


def km_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time: the area under the KM step
    curve up to the last event time — "expected days to convert,
    capped at the horizon", the single number the KM curve is usually
    summarised to.  Composes km_survival's rows; each step's area is
    (t_i − t_{i−1})·S_{i−1} (first step height 1), summed in a
    t-ordered fold (double addition is not associative).
    """
    km = km_survival(spark, sf_dir).select("t_days", "survival")
    w = Window.orderBy("t_days")
    lagd = km.select(
        "t_days",
        "survival",
        F.lag("t_days").over(w).alias("pt"),
        F.lag("survival").over(w).alias("ps"),
    )
    terms = lagd.select(
        "t_days",
        F.expr(
            "CASE WHEN pt IS NULL THEN CAST(t_days AS DOUBLE)"
            " ELSE (t_days - pt) * ps END"
        ).alias("term"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_event_times"),
        F.max("t_days").cast("long").alias("horizon_days"),
        F.expr(
            "CAST(floor(aggregate(array_sort(collect_list("
            " named_struct('key', t_days, 'v', term))),"
            " CAST(0.0 AS DOUBLE), (a, x) -> a + x.v) * 1000000)"
            " AS BIGINT)"
        ).alias("rmst_e6"),
    )
