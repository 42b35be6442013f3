"""Politeness scheduling (SURVEY §2.7 P1-P4): per-host token budgets
with robots gates, as a grouped-map pandas UDF keyed by TRUE host.

The reference sleeps between requests (3s+jitter list pages,
vieclam24h/crawler.go:169-171; 5s+jitter details, scraper.go:29-32,
86-91) and lets colly check robots.txt on Visit() paths (go.mod:34).
Wall-clock sleeps don't exist in a batch engine; the same *budget* is
enforced logically:

- each frontier row gets a deterministic ``scheduled_ts`` =
  wave_start + slot * crawl_delay(host), slot assigned in FIFO
  priority order within the host;
- rows whose slot exceeds the host's tokens_per_wave are DEFERRED to
  the next wave (state='deferred');
- robots disallow-prefix matches are DISALLOWED and never fetched.

Jitter is dropped (deterministic schedule is the north_rule's
"holding fetch-schedule determinism"); the budget math is unchanged
because jitter never changed the reference's per-host ordering either
(requests are sequential per process).

Skew note: this grouped-map MUST key by true host — politeness is a
per-host semantic constraint, not a perf accident (SURVEY §4). The
Zipf-hot host makes one fat group; its pandas payload is only the
frontier row metadata (no html), so even a 30%-of-frontier host at
sandbox scale is a few MB. At 10^10 scale the wave is budget-bounded
per host anyway (tokens_per_wave rows survive), so the group size is
capped by budget, not by corpus skew — the deferral itself is the
skew control.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DELAY_MS = 3000  # reference list default (crawler.go:40-42)

SCHEDULED_SCHEMA_SUFFIX = ("slot int, scheduled_ts timestamp, state string")


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
             default_delay_ms: int = DEFAULT_DELAY_MS) -> DataFrame:
    """Assign (slot, scheduled_ts, state) per host group.

    state: 'scheduled' (fetch this wave) | 'deferred' (budget exhausted)
    | 'disallowed' (robots). Deterministic: FIFO priority order inside
    the host, no wall clock, no RNG.
    """
    fr = join_robots(frontier, robots)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in frontier.schema.fields
        if f.name not in ("state",)
    ) + ", " + SCHEDULED_SCHEMA_SUFFIX

    ws = pd.Timestamp(wave_start)
    keep_cols = [f.name for f in frontier.schema.fields if f.name != "state"]

    def assign(pdf: pd.DataFrame) -> pd.DataFrame:
        delay = int(pdf["crawl_delay_ms"].dropna().iloc[0]) \
            if pdf["crawl_delay_ms"].notna().any() else default_delay_ms
        tokens = int(pdf["tokens_per_wave"].dropna().iloc[0]) \
            if pdf["tokens_per_wave"].notna().any() else 10**9
        pdf = pdf.sort_values(
            ["priority", "wave", "page", "rank", "url"],
            ascending=[False, True, True, True, True], kind="stable")
        allowed = ~pdf["_disallowed"].fillna(False).to_numpy()
        slot = allowed.cumsum() - 1
        out = pdf[keep_cols].copy()
        out["slot"] = slot.astype("int32")
        out["scheduled_ts"] = ws + pd.to_timedelta(slot * delay, unit="ms")
        out["state"] = "scheduled"
        out.loc[slot >= tokens, "state"] = "deferred"
        out.loc[~allowed, ["state"]] = "disallowed"
        out.loc[~allowed, "slot"] = -1
        out.loc[~allowed, "scheduled_ts"] = pd.NaT
        return out

    return fr.groupBy("host").applyInPandas(assign, schema=out_schema)
