"""Structured Streaming surface (task brief: streams via readStream ->
transform -> writeStream; watermarks for late data;
applyInPandasWithState for custom stateful operators).

The reference is cron-batch (SURVEY §2.7 P6), so streaming is an
engine capability demonstration over the `events` table shape: the
same hourly windowed aggregation the batch catalog runs
(queries.q_events_hourly), plus a custom stateful running-counter
operator. Both run under trigger(availableNow=True) so a batch-parity
test can pin them against the DuckDB-checked batch results.

Scale notes: the windowed agg is partial-aggregated before state
(map-side combine) and keyed state is sharded by the grouping key;
watermark bounds state size for unbounded streams.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_DDL = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over the events parquet directory/file."""
    return spark.readStream.schema(EVENTS_DDL).parquet(path)


def hourly_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h window x event_type counts with late-data watermark —
    the streaming twin of queries.q_events_hourly."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").cast("long").alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.unix_timestamp("w.start").cast("long").alias("hour_epoch"),
                    "event_type", "n", "sum_value"))


def running_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count + max ts, emitted every micro-batch (the
    streaming analogue of the seen-set's keyed state updates)."""

    def update(key: Tuple[int], pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        (total, max_ts) = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            total += len(pdf)
            if len(pdf):
                max_ts = max(max_ts, int(pdf["ts"].astype("int64").max() // 10**9))
        state.update((total, max_ts))
        yield pd.DataFrame({"user_id": [key[0]], "total_events": [total],
                            "last_ts_epoch": [max_ts]})

    return (events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, total_events long, last_ts_epoch long",
        stateStructType="total long, max_ts long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout))


def dedup_stream(events: DataFrame, keys: list[str] | None = None,
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming D3 (IsSeen/MarkSeen as a stream operator):
    dropDuplicatesWithinWatermark keeps one row per key with state
    BOUNDED by the watermark — the unbounded-stream twin of the batch
    seen-set anti-join (deduplicator.go:49-67's first-writer-wins), for
    feeds where a key may legitimately reappear after the horizon."""
    return (events.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(keys or ["event_id"]))


def run_available_now(stream_df: DataFrame, query_name: str,
                      output_mode: str, checkpoint_dir: str) -> DataFrame:
    """Drain the whole source as a stream (trigger availableNow) into a
    memory sink; returns the result table. Checkpointed, so a rerun
    resumes rather than reprocessing (exactly-once sink contract)."""
    q = (stream_df.writeStream.format("memory")
         .queryName(query_name)
         .outputMode(output_mode)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def stream_crawl(spark: SparkSession, pages_path: str, store,
                 robots: DataFrame, host_rank: DataFrame,
                 checkpoint_dir: str, waves_per_batch: int = 20,
                 **driver_kwargs):
    """The crawl itself as a Structured Streaming consumer: pages land
    incrementally (a fetcher fleet writing parquet files) and each
    micro-batch drives wave(s) of the SAME WaveDriver over the pages
    seen SO FAR — schedule, extract, dedup, normalize, snapshot-commit.

    Semantics (and why they compose):
    - The frontier/seen state lives in the SnapshotStore, NOT in
      streaming state: pending urls whose pages haven't landed yet are
      'missing' this batch and simply retry on the next one (P8), so
      discovery order across batches mirrors the batch crawl.
    - Each batch unions the new files with everything before them (the
      accumulating view a fetcher's output directory gives you anyway)
      by re-reading the source path in batch mode — micro-batch input
      alone would lose earlier pages that a later-enqueued url needs.
    - Exactly-once: SnapshotStore commits are atomic per wave and the
      streaming checkpoint makes file delivery at-least-once; replayed
      batches re-run waves against already-committed state and commit
      only new deltas (same property the kill-resume test pins).

    driver_kwargs: forwarded to WaveDriver — raise max_retries when
    pages can land many batches after their urls are enqueued.
    Returns the streaming query (trigger availableNow drains the
    current backlog and stops; drop it for a long-running tail -f).
    """
    from .driver import WaveDriver
    from .schemas import PAGES_SCHEMA

    drv = WaveDriver(spark, store, **driver_kwargs)

    def process(_batch_df: DataFrame, _epoch: int) -> None:
        pages = spark.read.schema(PAGES_SCHEMA).parquet(pages_path)
        if drv.pending_count() == 0:
            return
        # Like run_until_done, but a wave that fetches/enqueues/defers
        # NOTHING means the pending urls' pages haven't LANDED yet —
        # stop the batch and leave them pending for the next one,
        # instead of burning the P8 retry budget against an incomplete
        # corpus (each batch costs at most one attempt per missing url).
        for _ in range(waves_per_batch):
            stats = drv.run_wave(pages, robots, host_rank)
            if not stats["work_remains"]:
                break
            if (stats["fetched"] == 0 and stats["enqueued"] == 0
                    and stats["deferred"] == 0):
                break

    return (spark.readStream.schema(PAGES_SCHEMA).parquet(pages_path)
            .writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
