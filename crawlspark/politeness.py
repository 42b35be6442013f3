"""Politeness scheduling (SURVEY §2.7 P1-P4): per-host token budgets
with robots gates, as pure JVM window expressions keyed by TRUE host.

The reference sleeps between requests (3s+jitter list pages,
vieclam24h/crawler.go:169-171; 5s+jitter details, scraper.go:29-32,
86-91) and lets colly check robots.txt on Visit() paths (go.mod:34).
Wall-clock sleeps don't exist in a batch engine; the same *budget* is
enforced logically:

- each frontier row gets a deterministic ``scheduled_ts`` =
  wave_start + slot * crawl_delay(host, class), slot assigned in FIFO
  priority order within the (host, class) group;
- rows whose slot exceeds the class's tokens_per_wave are DEFERRED to
  the next wave (state='deferred');
- robots disallow-prefix matches are DISALLOWED and never fetched.

Delay classes (P2): the reference runs list crawling and detail
scraping as separate processes with separate delays (3 s lists,
5 s details — scraper.go:29-32). When the robots table carries
``detail_delay_ms`` / ``detail_tokens_per_wave`` columns, depth>0 rows
form their own per-host slot sequence with the detail budget; without
those columns the single-class budget applies to every depth
(backward-compatible).

Jitter is dropped (deterministic schedule is the north_rule's
"holding fetch-schedule determinism"); the budget math is unchanged
because jitter never changed the reference's per-host ordering either
(requests are sequential per process).

Scale note: this was a grouped-map pandas UDF in round 1; slot
assignment is plain window arithmetic (delay/tokens arrive via the
broadcast robots join), so it is now whole-stage-codegen'd JVM — the
Zipf-hot host still lands in one window partition, but spills instead
of funnelling every row through a single Python worker, and the plan
has no FlatMapGroupsInPandas (pinned in tests/test_plans.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_DELAY_MS = 3000         # reference list default (crawler.go:40-42)
DEFAULT_DETAIL_DELAY_MS = 5000  # reference detail default (scraper.go:29-32)


def join_robots(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Broadcast-join the (tiny) robots table; flag disallowed urls with
    a built-in higher-order prefix match (P4)."""
    path = F.regexp_replace(F.col("url"), r"^https?://[^/]+", "")
    fr = frontier.join(F.broadcast(robots), "host", "left")
    return fr.withColumn(
        "_disallowed",
        F.when(F.col("disallow_prefixes").isNotNull(),
               F.exists("disallow_prefixes",
                        lambda p: path.startswith(p))).otherwise(F.lit(False)),
    )


def schedule(frontier: DataFrame, robots: DataFrame, wave_start,
             default_delay_ms: int = DEFAULT_DELAY_MS,
             default_detail_delay_ms: int = DEFAULT_DETAIL_DELAY_MS) -> DataFrame:
    """Assign (slot, scheduled_ts, state) per (host[, delay-class]) group.

    state: 'scheduled' (fetch this wave) | 'deferred' (budget exhausted)
    | 'disallowed' (robots). Deterministic: FIFO priority order inside
    the group, no wall clock, no RNG. Pure Column expressions.

    Scale note (10^10 frontier, Zipf hosts): the slot window sorts each
    host's PENDING rows, so one mega-host backlog lands in one sort
    task. The budget bounds what a wave FETCHES, not the backlog; if a
    single host accumulates ~10^8 pending rows the exact-equivalent
    mitigation is a two-phase per-host top-k (per-partition top-budget
    by the same order, then this window on the union — rows outside a
    partition's top-budget can never be globally scheduled). Not
    implemented: the closed-world backlogs stay wave-bounded, and the
    driver's enqueue path feeds hosts incrementally.
    """
    fr = join_robots(frontier, robots)
    keep_cols = [f.name for f in frontier.schema.fields if f.name != "state"]

    two_class = "detail_delay_ms" in robots.columns
    is_detail = F.col("depth") > 0
    delay = F.coalesce(F.col("crawl_delay_ms").cast("long"),
                       F.lit(default_delay_ms).cast("long"))
    tokens = F.coalesce(F.col("tokens_per_wave").cast("long"),
                        F.lit(10**9).cast("long"))
    part_cols: list[Column] = [F.col("host")]
    if two_class:
        d_delay = F.coalesce(F.col("detail_delay_ms").cast("long"),
                             F.lit(default_detail_delay_ms).cast("long"))
        delay = F.when(is_detail, d_delay).otherwise(delay)
        if "detail_tokens_per_wave" in robots.columns:
            tokens = F.when(
                is_detail,
                F.coalesce(F.col("detail_tokens_per_wave").cast("long"), tokens)
            ).otherwise(tokens)
        part_cols.append(is_detail.alias("_class"))

    # FIFO priority order (matches frontier.order_cols; null placement
    # mirrors the round-1 pandas sort: NaN last in every direction)
    w = (Window.partitionBy(*part_cols)
         .orderBy(F.col("priority").desc_nulls_last(),
                  F.col("wave").asc_nulls_last(),
                  F.col("page").asc_nulls_last(), F.col("rank").asc_nulls_last(),
                  F.col("url").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    allowed = ~F.coalesce(F.col("_disallowed"), F.lit(False))
    slot_raw = F.sum(allowed.cast("long")).over(w) - 1
    slot = F.when(allowed, slot_raw).otherwise(F.lit(-1)).cast("int")

    ws_ms = F.unix_millis(F.to_timestamp(F.lit(str(pd.Timestamp(wave_start)))))
    sched_ts = F.when(
        allowed, F.timestamp_millis(ws_ms + slot.cast("long") * delay))
    state = (F.when(~allowed, F.lit("disallowed"))
             .when(slot.cast("long") >= tokens, F.lit("deferred"))
             .otherwise(F.lit("scheduled")))

    return fr.select(*keep_cols, slot.alias("slot"),
                     sched_ts.alias("scheduled_ts"), state.alias("state"))
