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
