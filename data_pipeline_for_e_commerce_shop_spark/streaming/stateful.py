"""Custom stateful streaming operator via ``applyInPandasWithState``:
gap-based sessionization with explicit per-user state — the
"operator Spark lacks, built on the state-store API" tier of the
charter (the built-in dual is ``session_window``, streaming/windowed.
stream_sessionize; the batch dual is the lag/running-sum form,
operators/events.sessionize — all three are held to the SAME DuckDB
oracle).

Reference parity: the 90 s debounce gap of lambda/s3_validation.py:64-71,
expressed as a hand-rolled state machine instead of the built-in
session window — the pattern to copy when the per-group logic stops
fitting ``session_window`` (e.g. carts with value-dependent timeouts).

Determinism contract: timestamps are reduced to integer epoch seconds
and money to integer cents JVM-SIDE before entering Python, so the
Arrow-batched pandas fold only ever adds integers — bit-identical to
the SQL oracle regardless of engine or batch slicing.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .windowed import _as_stream_dir, _canon_ts, _drain_to_memory

GAP_SECONDS = 90

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_no", T.LongType()),
        T.StructField("session_start", T.LongType()),
        T.StructField("session_end", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)

# Open-session carry-over between micro-batches:
# (next_session_no, open_start, open_last, open_n, open_cents)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_no", T.LongType()),
        T.StructField("start", T.LongType()),
        T.StructField("last", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)


def _sessionize_group(
    key: Tuple[Any],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold one user's batch of events into gap sessions, carrying the
    open session in the state store.

    Emits EVERY session the batch touched (closed and still-open) —
    update-mode semantics: a later batch that extends an open session
    re-emits it with more events, and the finalizer keeps the widest
    emission per (user, session).  A finite availableNow drain never
    advances the watermark past the last event, so waiting for a
    timeout to flush the final open session would lose it; eager
    re-emission makes the drain lossless without timeouts.

    Ordering caveat (inherent to hand-rolled state): gap logic assumes
    batches arrive in event-time order per user.  The file source
    replays a static table in one batch (sorted here), which satisfies
    it; a live source would need watermark-driven late-event dropping
    in front of this operator.
    """
    (user_id,) = key
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["epoch_sec", "event_id"], kind="mergesort")

    if state.exists:
        session_no, start, last, n, cents = state.get
    else:
        session_no, start, last, n, cents = 0, None, None, 0, 0

    out: list[tuple] = []
    for epoch_sec, _eid, ecents in zip(
        rows["epoch_sec"].to_numpy(),
        rows["event_id"].to_numpy(),
        rows["cents"].to_numpy(),
    ):
        e, c = int(epoch_sec), int(ecents)
        if start is None:
            start, last, n, cents = e, e, 1, c
        elif e - last > GAP_SECONDS:
            out.append((user_id, session_no, start, last, n, cents))
            session_no += 1
            start, last, n, cents = e, e, 1, c
        else:
            last, n, cents = e, n + 1, cents + c
    if start is not None:
        out.append((user_id, session_no, start, last, n, cents))
    state.update((session_no, start, last, n, cents))
    yield pd.DataFrame(
        out,
        columns=[
            "user_id",
            "session_no",
            "session_start",
            "session_end",
            "n_events",
            "cents",
        ],
    )


def stateful_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization as a CUSTOM stateful streaming operator:
    ``readStream → applyInPandasWithState(per-user state machine) →
    availableNow drain → widest-emission finalize``.

    Scale: state is one fixed-width row per active user (the open
    session), evicted naturally as users go quiet under a timeout in
    live deployments; the shuffle is the groupBy(user_id) state
    partitioning.  The pandas fold is O(batch) per user with integer
    arithmetic only.
    """
    src = f"{sf_dir}/events.parquet"
    from ..schemas import ensure_nanos_conf

    ensure_nanos_conf(spark)
    schema = spark.read.parquet(src).schema
    stream = _canon_ts(
        spark.readStream.schema(schema).parquet(_as_stream_dir(src)), schema
    )
    prepared = stream.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("epoch_sec"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    sessions = prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    sink = "stateful_session_sink"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        _drain_to_memory(spark, sessions, sink, output_mode="update")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    drained = spark.table(sink)
    # Finalize: per (user, session) keep the WIDEST emission — n_events
    # grows monotonically as batches extend a session, so max_by the
    # event count (session_end tiebreak is redundant but explicit).
    out = (
        drained.groupBy("user_id", "session_no")
        .agg(
            F.max_by(
                F.struct("session_start", "session_end", "n_events", "cents"),
                F.struct("n_events", "session_end"),
            ).alias("s")
        )
        .select(
            "user_id",
            "session_no",
            F.col("s.session_start").alias("session_start"),
            F.col("s.session_end").alias("session_end"),
            F.col("s.n_events").alias("n_events"),
            (F.col("s.cents") / 100.0).alias("total_value"),
        )
    )
    out = out.localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    return out
