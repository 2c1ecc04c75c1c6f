"""Control-plane semantics: gated streaming ingest (T1/T2), debounce
windows (T3/T4), single-flight runner + state machine (T5-T9)."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_for_e_commerce_shop_spark.schemas import ORDERS_SCHEMA
from data_pipeline_for_e_commerce_shop_spark.streaming.debounce import debounce_batches
from data_pipeline_for_e_commerce_shop_spark.streaming.ingest import run_gated_ingest
from data_pipeline_for_e_commerce_shop_spark.streaming.runner import (
    BatchStateTable,
    run_until_drained,
)

GOOD_CSV = """order_id,user_id,status,created_at,returned_at,shipped_at,delivered_at,num_of_item
1,10,delivered,2024-03-01 10:00:00,,,,2
2,11,shipped,2024-03-01 11:00:00,,,,1
"""

BAD_ROW_CSV = """order_id,user_id,status,created_at,returned_at,shipped_at,delivered_at,num_of_item
notanint,10,delivered,2024-03-01 10:00:00,,,,2
3,12,delivered,2024-03-02 10:00:00,,,,1
"""


def test_gated_ingest_routes_corrupt_rows(spark, tmp_path):
    inbox = tmp_path / "inbox"
    os.makedirs(inbox)
    (inbox / "orders_part1.csv").write_text(GOOD_CSV)
    (inbox / "orders_part2.csv").write_text(BAD_ROW_CSV)

    run_gated_ingest(
        spark,
        str(inbox),
        ORDERS_SCHEMA,
        admitted_path=str(tmp_path / "admitted"),
        rejected_path=str(tmp_path / "rejected"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    admitted = spark.read.parquet(str(tmp_path / "admitted"))
    rejected = spark.read.parquet(str(tmp_path / "rejected"))
    assert admitted.count() == 3
    assert rejected.count() == 1
    assert rejected.collect()[0]["error_type"] == "SCHEMA_ERROR"
    # provenance columns survive the gate
    assert "_source_file" in admitted.columns
    assert admitted.filter(F.col("_entity") != "orders").count() == 0

    # exactly-once: re-running with the same checkpoint ingests nothing new
    run_gated_ingest(
        spark,
        str(inbox),
        ORDERS_SCHEMA,
        admitted_path=str(tmp_path / "admitted"),
        rejected_path=str(tmp_path / "rejected"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    assert spark.read.parquet(str(tmp_path / "admitted")).count() == 3


EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_ts", T.TimestampType(), False),
        T.StructField("group_key", T.StringType(), False),
        T.StructField("file_path", T.StringType(), False),
    ]
)


def _ev(sec, key, path):
    return (dt.datetime(2024, 3, 1, 10, 0, 0) + dt.timedelta(seconds=sec), key, path)


def test_debounce_gap_semantics(spark):
    """Reference T3: events within 90 s share a batch; an event beyond
    the gap opens a NEW batch (lambda/s3_validation.py:64-71)."""
    events = spark.createDataFrame(
        [
            _ev(0, "g1", "a.csv"),
            _ev(60, "g1", "b.csv"),      # within gap of previous -> same window
            _ev(200, "g1", "c.csv"),     # 140s after b -> NEW window
            _ev(10, "g2", "x.csv"),      # separate group key
        ],
        EVENT_SCHEMA,
    )
    batches = debounce_batches(events, watermark=None).collect()
    by_key = {}
    for r in batches:
        by_key.setdefault(r["group_key"], []).append(r)
    assert len(by_key["g1"]) == 2
    first, second = sorted(by_key["g1"], key=lambda r: r["batch_start"])
    assert first["file_paths"] == ["a.csv", "b.csv"]
    assert second["file_paths"] == ["c.csv"]
    assert len(by_key["g2"]) == 1
    assert all(r["status"] == "pending" for r in batches)
    # batch_id idempotent: same inputs -> same ids
    again = {r["batch_id"] for r in debounce_batches(events, watermark=None).collect()}
    assert again == {r["batch_id"] for r in batches}


def test_debounce_streaming_mode(spark, tmp_path):
    """Same debounce through readStream + watermark (append mode):
    windows older than the watermark emit, state is bounded."""
    src = tmp_path / "events"
    os.makedirs(src)
    events = spark.createDataFrame(
        [_ev(0, "g1", "a.csv"), _ev(30, "g1", "b.csv"), _ev(4000, "g1", "z.csv")],
        EVENT_SCHEMA,
    )
    events.coalesce(1).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(str(src))
    batches = debounce_batches(stream, watermark="10 minutes")
    q = (
        batches.writeStream.format("memory")
        .queryName("debounced")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select * from debounced").collect()
    # the first window (a+b) is older than watermark set by z -> emitted;
    # z's window stays open in state (append semantics)
    assert len(got) == 1
    assert got[0]["file_paths"] == ["a.csv", "b.csv"]


def _mk_batches(spark, rows):
    schema = T.StructType(
        [
            T.StructField("batch_id", T.StringType(), False),
            T.StructField("group_key", T.StringType(), True),
            T.StructField("file_paths", T.ArrayType(T.StringType()), True),
            T.StructField("batch_start", T.TimestampType(), True),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_runner_fifo_and_state_machine(spark, tmp_path):
    table = BatchStateTable(spark, str(tmp_path / "state"))
    t0 = dt.datetime(2024, 3, 1, 10, 0, 0)
    table.enqueue(
        _mk_batches(
            spark,
            [
                ("b1", "g1", ["a.csv"], t0),
                ("b2", "g1", ["b.csv"], t0 + dt.timedelta(seconds=100)),
            ],
        )
    )
    # idempotent enqueue: same ids don't duplicate
    table.enqueue(_mk_batches(spark, [("b1", "g1", ["a.csv"], t0)]))
    assert table.read().count() == 2

    processed = []
    stats = run_until_drained(table, lambda row: processed.append(row["batch_id"]))
    assert processed == ["b1", "b2"]  # FIFO by created_at
    assert stats == {"done": 2, "failed": 0}
    state = {r["batch_id"]: r for r in table.read().collect()}
    assert all(r["status"] == "done" for r in state.values())
    assert all(r["processing_started_at"] is not None for r in state.values())
    assert all(r["completed_at"] is not None for r in state.values())


def test_runner_retries_then_fails(spark, tmp_path):
    table = BatchStateTable(spark, str(tmp_path / "state"))
    t0 = dt.datetime(2024, 3, 1, 10, 0, 0)
    table.enqueue(_mk_batches(spark, [("bad", "g1", ["x.csv"], t0)]))

    attempts = []

    def process(row):
        attempts.append(row["attempts"])
        raise RuntimeError("boom")

    stats = run_until_drained(table, process, max_attempts=3)
    assert stats == {"done": 0, "failed": 1}
    row = table.read().collect()[0]
    assert row["attempts"] == 3            # reference Step Functions Retry 3x
    assert "boom" in row["last_error"]


def test_runner_single_flight(spark, tmp_path):
    """T6: while a batch is processing, claim_next yields nothing
    (reference controller probe, lambda/controller.py:52-61)."""
    table = BatchStateTable(spark, str(tmp_path / "state"))
    t0 = dt.datetime(2024, 3, 1, 10, 0, 0)
    table.enqueue(
        _mk_batches(spark, [("b1", "g1", ["a.csv"], t0), ("b2", "g1", ["b.csv"], t0)])
    )
    first = table.claim_next()
    assert first is not None and first["status"] == "processing"
    assert table.claim_next() is None  # single flight
    table.finish(first["batch_id"], "done")
    second = table.claim_next()
    assert second is not None and second["batch_id"] != first["batch_id"]


def test_stream_batch_duality(spark, sf_dir):
    """T8 extension: the event-time streaming hourly aggregate (real
    readStream + watermark + availableNow drain) is bit-identical to
    its batch dual — decomposable aggregates guarantee it."""
    from data_pipeline_for_e_commerce_shop_spark.operators import events
    from data_pipeline_for_e_commerce_shop_spark.streaming.windowed import (
        stream_hourly_kpis,
    )

    streamed = stream_hourly_kpis(spark, sf_dir)
    batch = events.hourly_window(spark, sf_dir).drop("n_users")
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_stream_drain_leaves_no_session_state(spark, sf_dir):
    """Regression (ADVICE r2): a streaming drain must not mutate the
    session it borrowed — shuffle.partitions restored, the memory-sink
    temp view dropped, no active streaming query left behind."""
    from data_pipeline_for_e_commerce_shop_spark.streaming.windowed import (
        stream_hourly_kpis,
        stream_sessionize,
    )

    before_parts = spark.conf.get("spark.sql.shuffle.partitions")
    before_views = {v.name for v in spark.catalog.listTables()}
    stream_hourly_kpis(spark, sf_dir)
    stream_sessionize(spark, sf_dir)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before_parts
    after_views = {v.name for v in spark.catalog.listTables()}
    assert after_views - before_views == set(), "leaked temp views"
    assert not [q for q in spark.streams.active], "leaked active stream"


def test_streaming_dedup_drops_replayed_files(spark, tmp_path):
    """The same micro-batch replayed as a second file must not emit its
    keys twice (at-least-once upstream -> exactly-once downstream)."""
    import shutil

    from data_pipeline_for_e_commerce_shop_spark.streaming.ingest import (
        run_streaming_dedup,
    )

    src = tmp_path / "arrivals"
    src.mkdir()
    base = spark.range(100).selectExpr(
        "id AS event_id",
        "timestamp_micros(CAST(1700000000000000 + id * 1000000 AS BIGINT)) AS ts",
        "id % 7 AS user_id",
    )
    base.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "b1"))
    f1 = next((tmp_path / "b1").glob("*.parquet"))
    shutil.copy(f1, src / "a.parquet")
    shutil.copy(f1, src / "b.parquet")  # the replay

    out = run_streaming_dedup(
        spark,
        str(src),
        base.schema,
        "dedup_sink_test",
        ["event_id"],
    )
    assert out.count() == 100
    assert out.select("event_id").distinct().count() == 100


def test_stream_interval_join_matches_batch_dual(spark):
    """The stream-stream watermarked join must produce exactly the
    batch interval join's rows (same keys, same counts, same cents)."""
    from data_pipeline_for_e_commerce_shop_spark.operators.events import (
        purchase_click_window,
    )
    from data_pipeline_for_e_commerce_shop_spark.streaming.windowed import (
        stream_interval_join,
    )

    sf = "/root/testdata/sf0.001"
    streamed = {
        (r["event_id"], r["user_id"], r["p_sec"]): (r["n_clicks"], r["click_value"])
        for r in stream_interval_join(spark, sf).collect()
    }
    batch = {
        (r["event_id"], r["user_id"], r["p_sec"]): (r["n_clicks"], r["click_value"])
        for r in purchase_click_window(spark, sf).collect()
    }
    assert streamed == batch
    assert any(v[0] > 0 for v in batch.values())


def test_stream_enriched_matches_batch_join(spark):
    """Stream-static enrichment must equal the batch join+agg, and the
    per-batch dim side must be broadcast."""
    from data_pipeline_for_e_commerce_shop_spark.schemas import load_table
    from data_pipeline_for_e_commerce_shop_spark.streaming.windowed import (
        stream_enriched_kpis,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r["segment"], r["event_type"]): (r["n_events"], r["n_users"], r["total_value"])
        for r in stream_enriched_kpis(spark, sf).collect()
    }
    events = load_table(spark, sf, "events")
    customer = load_table(spark, sf, "customer")
    from pyspark.sql import functions as F

    exp = {
        (r["c_mktsegment"], r["event_type"]): (r["n"], r["u"], r["v"])
        for r in events.join(
            customer, events.user_id == customer.c_custkey
        )
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("u"),
            (F.sum(F.floor(F.col("value") * 100)) / 100.0).alias("v"),
        )
        .collect()
    }
    assert got == exp


def test_stream_dedup_really_removes_redeliveries(spark):
    """The staged stream dir must genuinely contain duplicates (a
    batch count over it exceeds the table's), and the streaming dedup
    must land exactly on the duplicate-free aggregate — proving state
    actually dropped the re-delivered rows, not that none existed."""
    from data_pipeline_for_e_commerce_shop_spark.schemas import load_table
    from data_pipeline_for_e_commerce_shop_spark.streaming.dedup import (
        DUP_EVERY,
        _dup_stream_dir,
        stream_dedup_kpis,
    )

    sf = "/root/testdata/sf0.001"
    src = f"{sf}/events.parquet"
    events = load_table(spark, sf, "events")
    n_table = events.count()
    n_dupes = events.where(F.col("event_id") % DUP_EVERY == 0).count()
    assert n_dupes > 0, "subset empty — dedup test would be vacuous"
    staged = spark.read.parquet(_dup_stream_dir(spark, src))
    assert staged.count() == n_table + n_dupes
    got = stream_dedup_kpis(spark, sf)
    assert got.agg(F.sum("n_events")).collect()[0][0] == n_table


def test_transform_with_state_totals_match_batch(spark):
    """transformWithStateInPandas running totals must equal the batch
    GROUP BY — skipped where the API's protobuf state server is
    unavailable (this container); the code path is the deliverable."""
    import importlib.util

    import pytest

    try:
        has_pb = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        has_pb = False
    if not has_pb:
        pytest.skip("transformWithState needs protobuf at runtime")
    from data_pipeline_for_e_commerce_shop_spark.schemas import load_table
    from data_pipeline_for_e_commerce_shop_spark.streaming.stateful import (
        stateful_user_totals,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in stateful_user_totals(spark, sf).collect()
    }
    exp = {
        r["user_id"]: (r["n"], r["v"])
        for r in load_table(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.floor(F.col("value") * 100)) / 100.0).alias("v"),
        )
        .collect()
    }
    assert got == exp
