"""Structured Streaming batch-parity tests over the events table."""

import shutil

import pytest
from pyspark.sql import functions as F

from crawlspark import streaming as S

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events_dir(tmp_path):
    # the file stream source requires a directory of files
    d = tmp_path / "events"
    d.mkdir()
    shutil.copy(f"{SF}/events.parquet", d / "part-0.parquet")
    return str(d)


def test_hourly_counts_stream_matches_batch(spark, tmp_path, events_dir):
    stream = S.read_events_stream(spark, events_dir)
    agg = S.hourly_counts(stream)
    got = S.run_available_now(agg, "hourly_q", "complete", str(tmp_path / "cp1"))

    from crawlspark.queries import q_events_hourly
    want = q_events_hourly(spark, SF)
    assert got.count() == want.count()
    diff = (got.exceptAll(want).count() + want.exceptAll(got).count())
    assert diff == 0


def test_running_user_counts_stateful(spark, tmp_path, events_dir):
    stream = S.read_events_stream(spark, events_dir)
    out = S.running_user_counts(stream)
    got = S.run_available_now(out, "ruc_q", "update", str(tmp_path / "cp2"))
    # last emitted row per user == total batch counts
    from pyspark.sql.window import Window
    final = (got.withColumn(
        "_rn", F.row_number().over(
            Window.partitionBy("user_id").orderBy(F.col("total_events").desc())))
        .filter("_rn = 1").drop("_rn"))
    want = (spark.read.parquet(f"{SF}/events.parquet")
            .groupBy("user_id").agg(F.count("*").cast("long").alias("n")))
    joined = final.join(want, "user_id")
    assert joined.filter(F.col("total_events") != F.col("n")).count() == 0
    assert final.count() == want.count()


def test_dedup_stream(spark, tmp_path):
    """Streaming dedup: duplicated event_ids collapse to one row per
    key, exactly matching the batch distinct."""
    import pandas as pd
    from crawlspark import streaming as S

    src = str(tmp_path / "dup_events")
    base = pd.DataFrame({
        "event_id": [1, 2, 3, 2, 1, 4],
        "ts": pd.to_datetime(["2026-01-01 00:00:00"] * 6),
        "user_id": [10, 11, 12, 11, 10, 13],
        "event_type": ["a"] * 6,
        "value": [1.0] * 6,
        "props": ["{}"] * 6,
    })
    spark.createDataFrame(base).write.mode("overwrite").parquet(src)
    stream = S.dedup_stream(S.read_events_stream(spark, src))
    out = S.run_available_now(stream, "dedup_stream_t", "append",
                              str(tmp_path / "ckpt_dedup"))
    rows = out.collect()
    assert sorted(r["event_id"] for r in rows) == [1, 2, 3, 4]


def test_stream_crawl_matches_batch_crawl(spark, tmp_path):
    """The crawl as a stream consumer: pages land in three chunks
    (lists first, details split), stream_crawl drains them with
    availableNow triggers, and the final seen/extracted/jobs state is
    BIT-IDENTICAL to a one-shot batch crawl of the same corpus."""
    from crawlspark import synth
    from crawlspark.driver import WaveDriver, table_hash
    from crawlspark.streaming import stream_crawl
    from crawlspark.tables import SnapshotStore

    N = 300
    pdf = synth.gen_pages_pandas(N, seed=42)
    robots = spark.createDataFrame(synth.gen_robots())
    ranks = spark.createDataFrame(synth.gen_host_rank())
    seeds = synth.gen_seed_list(N)

    # batch reference
    bdrv = WaveDriver(spark, SnapshotStore(tmp_path / "wh_batch"),
                      num_partitions=4)
    bdrv.bootstrap(seeds)
    bdrv.run_until_done(spark.createDataFrame(pdf), robots, ranks, 10)

    def fingerprint(drv):
        # wave NUMBERS legitimately differ (a detail whose page lands
        # two batches later is fetched in a later wave); the parity
        # contract is the CONTENT: seen set, extracted bytes, jobs
        return (table_hash(drv.seen_view().drop("expires_at")),
                table_hash(drv.extracted_view().select("url", "text")),
                table_hash(drv.jobs_view().drop("wave")))

    ref = fingerprint(bdrv)

    # streaming: lists land first, then details in two chunks
    pages_dir = tmp_path / "pages_stream"
    is_list = pdf["url"].str.contains("viec-lam-vi|viec-lam-trang")
    chunks = [pdf[is_list], pdf[~is_list].iloc[::2], pdf[~is_list].iloc[1::2]]
    store = SnapshotStore(tmp_path / "wh_stream")
    first = True
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk).repartition(2).write.mode("append") \
            .parquet(str(pages_dir))
        if first:
            drv = WaveDriver(spark, store, num_partitions=4)
            drv.bootstrap(seeds)
            first = False
        q = stream_crawl(spark, str(pages_dir), store, robots, ranks,
                         str(tmp_path / "ckpt"), num_partitions=4,
                         max_retries=6)
        q.awaitTermination()

    sdrv = WaveDriver(spark, store, num_partitions=4, max_retries=6)
    assert fingerprint(sdrv) == ref
