"""Politeness scheduler unit tests: defaults for hosts missing from
robots, per-class budgets, disallow gating — pure window-expression
path (no Python stage)."""

import pandas as pd
from pyspark.sql import functions as F

from crawlspark import politeness


def _frontier(spark, rows):
    cols = ["url", "host", "source", "id", "last_updated_on", "depth",
            "wave", "page", "rank", "priority", "state", "attempts"]
    return spark.createDataFrame(pd.DataFrame(rows, columns=cols))


def test_unknown_host_gets_defaults(spark):
    """A host absent from robots schedules with the reference default
    delay (3000 ms) and an unbounded budget (crawler.go:40-42)."""
    fr = _frontier(spark, [
        (f"https://x.vn/{i}", "x.vn", "s", str(i), None, 0, 0, 0, i,
         0.0, "pending", 0) for i in range(3)])
    robots = spark.createDataFrame(
        [("other.vn", 9999, None, 1)],
        "host string, crawl_delay_ms int, disallow_prefixes array<string>, "
        "tokens_per_wave int")
    out = {r["id"]: r for r in
           politeness.schedule(fr, robots, "2026-01-01 00:00:00").collect()}
    assert all(r["state"] == "scheduled" for r in out.values())
    epochs = sorted(int(r["scheduled_ts"].timestamp()) for r in out.values())
    assert epochs[1] - epochs[0] == 3 and epochs[2] - epochs[1] == 3  # 3000ms


def test_detail_class_spacing_and_budget(spark):
    """P2: depth>0 rows get the detail delay + their own budget when
    robots carries the detail columns (scraper.go:29-32)."""
    fr = _frontier(spark, [
        (f"https://h.vn/l{i}", "h.vn", "s", f"l{i}", None, 0, 0, 0, i,
         0.0, "pending", 0) for i in range(2)
    ] + [
        (f"https://h.vn/d{i}", "h.vn", "s", f"d{i}", None, 1, 0, 0, i,
         0.0, "pending", 0) for i in range(3)])
    robots = spark.createDataFrame(
        [("h.vn", 3000, None, 100, 5000, 2)],
        "host string, crawl_delay_ms int, disallow_prefixes array<string>, "
        "tokens_per_wave int, detail_delay_ms int, detail_tokens_per_wave int")
    out = {r["id"]: r for r in
           politeness.schedule(fr, robots, "2026-01-01 00:00:00").collect()}
    # independent slot sequences per class
    assert [out[f"l{i}"]["slot"] for i in range(2)] == [0, 1]
    assert [out[f"d{i}"]["slot"] for i in range(3)] == [0, 1, 2]
    # detail spacing 5s vs list 3s
    d_ep = [int(out[f"d{i}"]["scheduled_ts"].timestamp()) for i in range(3)]
    l_ep = [int(out[f"l{i}"]["scheduled_ts"].timestamp()) for i in range(2)]
    assert d_ep[1] - d_ep[0] == 5 and l_ep[1] - l_ep[0] == 3
    # detail budget 2: third detail row deferred; lists unaffected
    assert out["d2"]["state"] == "deferred"
    assert out["l1"]["state"] == "scheduled"
