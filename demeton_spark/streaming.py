"""Structured Streaming operators (engine extras — SURVEY.md §2.11).

The reference is batch-only; its incremental behaviors (negative cache,
resumable import) map to the checkpoint manifest in ``engine.py``.  For
true stream processing the engine exposes watermarked tumbling-window
aggregation and gap-based session windows over an events stream, plus a
file-source factory so the same parquet layout works batch or
streaming.  All state handling is Spark-native (``window`` /
``session_window`` + watermark): no custom Python state in the hot
path.

At scale: the file source incrementally lists new files per
micro-batch; watermarks bound the state store; ``availableNow`` gives
exactly-once backfill over existing data with the same code path as the
live stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: schema of the events table (TESTDATA.md) for the streaming source —
#: streaming file sources cannot infer schemas
EVENTS_SCHEMA = (
    "event_id long, user_id long, event_type string, ts timestamp_ntz, "
    "value double"
)


def read_events_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming scan of an events parquet directory."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(events_dir)


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts per event type with late-data watermark.

    Works on both batch and streaming DataFrames (same plan; streaming
    adds state eviction at the watermark).
    """
    ts = F.col("ts").cast("timestamp")
    return (
        events.withColumn("ts", ts)
        .withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows per user (the streaming twin of the
    batch ``events_sessionize`` contract query)."""
    ts = F.col("ts").cast("timestamp")
    return (
        events.withColumn("ts", ts)
        .withWatermark("ts", watermark_delay)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


USER_STATS_SCHEMA = (
    "user_id long, n_events long, sum_value double, max_value double"
)
_USER_STATE_SCHEMA = "n long, s double, m double"


def running_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (count, sum, max) over ``value``, emitting the updated
    aggregate every micro-batch.

    This is the escape hatch for stateful logic the built-in
    window/session operators can't express; state is one tiny tuple per
    user, managed by Spark's state store (checkpointed, exactly-once).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, s, m = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            if len(pdf):
                m = max(m, float(pdf["value"].max()))
        state.update((n, s, m))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [s],
                "max_value": [m],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=USER_STATS_SCHEMA,
        stateStructType=_USER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(
    stream_df: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> DataFrame:
    """Drain the stream with ``availableNow`` into an in-memory table and
    return it as a DataFrame (backfill/testing harness; production sinks
    swap ``format``)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)
