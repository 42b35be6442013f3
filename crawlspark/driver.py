"""Wave driver (SURVEY §3): the crawl loop, one snapshot per wave.

Per wave:
  pending frontier -> politeness schedule (per-host budgets, robots)
  -> "fetch" = equi-join against the pages table (S7: the closed-world
  analogue of the HTTP GET) -> list pages: link extraction -> dedup
  classify (bloom + seen join) -> enqueue NEW/UPDATED, mark seen
  -> detail pages: extract struct -> normalize -> MERGE into jobs
  -> lineage rows per partition -> ONE atomic snapshot commit of
  frontier + seen + jobs + audit + lineage.

This inverts the reference's topology (three processes x Redis queues,
one Redis round-trip per job — SURVEY §3.1-3.3) into one declarative
plan per wave; the publish-then-mark at-least-once contract
(vieclam24h/crawler.go:131-141) strengthens to exactly-once because
frontier append and seen merge commit atomically.

Resume (north_rule, P10): every wave is a snapshot; a killed run
restarts from the last committed wave and reproduces the uninterrupted
run bit-for-bit (tests/test_driver.py pins this).

Scale notes:
- pages join: frontier wave (budget-bounded) joins pages (100 TB side)
  on url — sort-merge with AQE; at 10^10 frontier the pages table is
  Iceberg-bucketed by url hash so the join co-locates (storage-layer
  config, not code).
- html bytes are dropped immediately after extraction (payload
  pruning, scraper.go:76 equivalent) so no shuffle ever carries them.
- everything after extraction is Column expressions (codegen).
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dedup as D
from . import politeness
from .clean import udfs as clean_udfs
from .extract import udfs as extract_udfs
from .frontier import host_of, priority_expr
from .normalize import normalize_vieclam24h
from .schemas import FRONTIER_SCHEMA, SEEN_SCHEMA
from .tables import SnapshotStore

WAVE_EPOCH = datetime(2026, 1, 1)
WAVE_SECONDS = 3600  # one wave = one cron cycle (cmd/vieclam24h/crawler/main.go:24)


def wave_start(wave: int) -> datetime:
    return WAVE_EPOCH + timedelta(seconds=wave * WAVE_SECONDS)


def table_hash(df: DataFrame) -> int:
    """Order-insensitive content fingerprint (determinism evidence)."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\0")) for c in df.columns]
    row_hash = F.xxhash64(F.concat_ws("\x1f", *cols)).cast("decimal(38,0)")
    out = df.select(row_hash.alias("h")).agg(
        F.sum("h").alias("s"), F.count("*").alias("n")).first()
    return hash((int(out["s"] or 0), int(out["n"])))


class WaveDriver:
    def __init__(self, spark: SparkSession, store: SnapshotStore,
                 source: str = "vieclam24h", num_partitions: int = 32,
                 n_salts: int = D.N_SALTS, max_retries: int = 3,
                 use_bloom: bool = True, collect_stats: bool = True,
                 snapshot_files: int | None = 8):
        self.spark = spark
        self.store = store
        self.source = source
        self.num_partitions = num_partitions
        self.n_salts = n_salts
        self.max_retries = max_retries
        self.use_bloom = use_bloom
        # collect_stats=False drops the per-wave driver-side counts
        # (each is a full Spark job); lineage still records real counts
        # as part of the single commit. Bench mode uses False — the
        # counts are the serial fraction that caps scaling efficiency.
        self.collect_stats = collect_stats
        self.snapshot_files = snapshot_files

    # -- bootstrap ----------------------------------------------------------
    def bootstrap(self, seeds: pd.DataFrame) -> int:
        """Seed the frontier with depth-0 list pages (wave 0 snapshot).
        seeds: pandas (url, host, page, depth)."""
        pdf = seeds.copy()
        pdf["source"] = self.source
        pdf["id"] = pdf["url"]  # D6 fallback: id=url when no API id
        pdf["last_updated_on"] = None
        pdf["wave"] = 0
        pdf["rank"] = 0
        pdf["priority"] = 0.0
        pdf["state"] = "pending"
        pdf["attempts"] = 0
        fr = self.spark.createDataFrame(
            pdf[[f.name for f in FRONTIER_SCHEMA.fields]], schema=FRONTIER_SCHEMA)
        seen = self.spark.createDataFrame([], SEEN_SCHEMA)
        return self.store.commit(0, {"frontier": fr, "seen": seen})

    def reseed(self, seeds: pd.DataFrame | None = None) -> int:
        """Model the cron re-crawl (P6): flip fetched list pages back to
        pending for the next cycle. Pass the cycle's seed list to also
        enqueue NEW list pages — a growing corpus adds pagination tail
        pages that the previous cycle never saw (the reference reaches
        them by re-paginating the API until LastPage each run,
        vieclam24h/crawler.go:76-166)."""
        wave = self.store.latest_wave()
        fr = self.store.read(self.spark, "frontier")
        reset = fr.withColumn(
            "state",
            F.when((F.col("depth") == 0) & (F.col("state") == "fetched"),
                   F.lit("pending")).otherwise(F.col("state")),
        ).withColumn(
            "wave",
            F.when((F.col("depth") == 0), F.lit(wave + 1)).otherwise(F.col("wave")),
        )
        if seeds is not None:
            pdf = seeds.copy()
            pdf["source"] = self.source
            pdf["id"] = pdf["url"]
            pdf["last_updated_on"] = None
            pdf["wave"] = wave + 1
            pdf["rank"] = 0
            pdf["priority"] = 0.0
            pdf["state"] = "pending"
            pdf["attempts"] = 0
            fresh = self.spark.createDataFrame(
                pdf[[f.name for f in FRONTIER_SCHEMA.fields]], schema=FRONTIER_SCHEMA)
            fresh = fresh.join(fr.select("url"), "url", "left_anti")
            reset = reset.unionByName(fresh.select(*reset.columns))
        return self.store.commit(wave + 1, {"frontier": reset})

    # -- one wave -----------------------------------------------------------
    def run_wave(self, pages: DataFrame, robots: DataFrame,
                 host_rank: DataFrame) -> dict:
        t0 = time.time()
        spark = self.spark
        wave = self.store.latest_wave() + 1
        ws = wave_start(wave)

        frontier = self.store.read(spark, "frontier")
        seen = self.store.read(spark, "seen") or spark.createDataFrame([], SEEN_SCHEMA)
        seen = seen.cache()

        pending = frontier.filter(
            (F.col("state") == "pending") & (F.col("attempts") < self.max_retries))
        rest = frontier.filter(
            ~((F.col("state") == "pending") & (F.col("attempts") < self.max_retries)))

        # priority (north_rule): recrawl age = waves since enqueue
        age_hours = (F.lit(wave) - F.col("wave")) * F.lit(WAVE_SECONDS / 3600.0)
        pending = (pending.drop("priority")
                   .join(F.broadcast(host_rank.withColumnRenamed("rank", "_hr")),
                         "host", "left")
                   .withColumn("priority",
                               priority_expr(F.col("depth"), F.col("_hr"), age_hours))
                   .drop("_hr"))

        # Persist each shared lineage; forced ONCE before the parallel
        # snapshot writes (concurrent Spark jobs do not coordinate on an
        # unmaterialized cache — without this every table write would
        # recompute the pUDF stages; observed 6x duplicated extraction).
        # sched materializes as a by-product of fetched.count().
        sched = politeness.schedule(pending, robots, ws).persist()
        to_fetch = sched.filter(F.col("state") == "scheduled").drop("slot", "scheduled_ts")
        deferred = (sched.filter(F.col("state") == "deferred")
                    .drop("slot", "scheduled_ts")
                    .withColumn("state", F.lit("pending")))
        disallowed = sched.filter(F.col("state") == "disallowed").drop("slot", "scheduled_ts")

        # "fetch": equi-join with the pages table. The frontier side is
        # explicitly broadcast (inner join) and PRUNED to the columns
        # the downstream stages read: the wave is politeness-budget-
        # bounded while pages is the 100 TB side — broadcasting the
        # small side guarantees the fat html column NEVER crosses a
        # shuffle (pages stream from parquet straight into extraction).
        # At a 10^10 frontier the same guarantee comes from bucketing
        # both tables by url hash (storage config); plan shape is
        # identical. Unfetchable urls (P8 retry) come from a separate
        # anti join that reads ONLY the pruned url column of pages.
        fetch_cols = to_fetch.select("url", "depth", "page", "id", "last_updated_on")
        fetched = (pages.select("url", F.col("html").cast("string").alias("_html"),
                                F.col("warc_ts").alias("_warc_ts"))
                   .join(F.broadcast(fetch_cols), "url", "inner")
                   .persist())
        missing = (to_fetch.join(pages.select("url"), "url", "left_anti")
                   .withColumn("attempts", F.col("attempts") + 1))  # P8 retry
        got = fetched

        ex_udf, links_udf, jsonld_udf = extract_udfs()

        # ---- list pages -> frontier candidates (S5 + D1/D2) --------------
        lists = got.filter(F.col("depth") == 0)
        links = (lists
                 .withColumn("l", F.explode(links_udf(F.col("_html"))))
                 .select(F.col("l.href").alias("url"),
                         F.lit(self.source).alias("source"),
                         F.coalesce(F.col("l.item_id"), F.col("l.href")).alias("id"),
                         F.col("l.item_updated").alias("last_updated_on"),
                         (F.col("depth") + 1).alias("depth"),
                         F.lit(wave).alias("wave"),
                         F.col("page"),
                         F.col("l.rank").alias("rank"))
                 .withColumn("host", host_of(F.col("url"))))

        if self.use_bloom and not seen.isEmpty():
            blooms = D.build_blooms(seen)
            classified = D.classify_with_bloom(
                links, seen, blooms, F.to_timestamp(F.lit(str(ws))),
                n_salts=self.n_salts).drop("url_hash", "salt")
        else:
            classified = D.classify(links, seen, F.to_timestamp(F.lit(str(ws))))
        classified = classified.persist()

        enqueue = (classified.filter(F.col("status") != D.STATUS_UNCHANGED)
                   .drop("status")
                   .withColumn("priority", F.lit(0.0))
                   .withColumn("state", F.lit("pending"))
                   .withColumn("attempts", F.lit(0))
                   .select(*[f.name for f in FRONTIER_SCHEMA.fields]))

        # publish-then-mark, atomically: seen merge in the same snapshot
        new_seen = D.mark_seen(
            seen, classified.filter(F.col("status") != D.STATUS_UNCHANGED)
            .select("source", "id", "host", "last_updated_on"),
            F.to_timestamp(F.lit(str(ws))), n_salts=self.n_salts)

        # ---- detail pages -> extract -> normalize -> jobs MERGE ----------
        details = got.filter(F.col("depth") > 0)
        ext = (details
               .withColumn("x", ex_udf(F.col("_html")))
               .withColumn("jsonld", jsonld_udf(F.col("_html")))
               .drop("_html")  # payload pruning: html never crosses a shuffle
               .persist())
        # Force ext first: it materializes every fetched partition (the
        # depth filter does not prune cached partitions), so sched and
        # fetched caches fill as a by-product of ONE action; classified
        # then reuses the fetched cache. Without this the parallel
        # snapshot writes would recompute the pUDF stages concurrently.
        _trace = os.environ.get("CRAWLSPARK_TRACE") == "1"
        _t = time.time()
        ext.count()
        if _trace:
            print(f"[wave {wave}] ext.count {time.time()-_t:.1f}s", flush=True)
            _t = time.time()
        classified.count()
        if _trace:
            print(f"[wave {wave}] classified.count {time.time()-_t:.1f}s", flush=True)
            _t = time.time()
        staged = (ext
                  .withColumn("source", F.lit(self.source))
                  .withColumn("item_title", F.col("x.title"))
                  .withColumn("crawled_at", F.col("_warc_ts")))
        jobs_batch = (normalize_vieclam24h(staged).dropDuplicates(["id"])
                      .withColumn("wave", F.lit(wave)))

        # the byte-identity surface (C2, worker.go:145-147): CleanToText of
        # the extracted description, committed per url
        _, clean_to_text_udf, _ = clean_udfs()
        extracted_batch = ext.select(
            "url", F.lit(wave).alias("wave"),
            clean_to_text_udf(F.col("x.job_description")).alias("text"))
        audit = (ext.select("url", F.lit(wave).alias("wave"),
                            F.posexplode("jsonld").alias("blob_index", "blob")))

        # ---- frontier state update ---------------------------------------
        # fetched = scheduled minus unfetchable; the anti join against the
        # (usually tiny) missing set avoids re-deriving frontier columns
        # through the pruned fetch join
        fetched_rows = (to_fetch.join(missing.select("url"), "url", "left_anti")
                        .withColumn("state", F.lit("fetched")))
        new_frontier = (rest
                        .unionByName(fetched_rows.select(*rest.columns))
                        .unionByName(missing.select(*rest.columns))
                        .unionByName(deferred.select(*rest.columns))
                        .unionByName(disallowed.select(*rest.columns))
                        .unionByName(enqueue))

        # ---- lineage (per-partition metrics, north_rule) ------------------
        pid = F.spark_partition_id().alias("partition_id")
        fetch_counts = got.groupBy(pid).agg(F.count("*").alias("urls_fetched"))
        cls_counts = (classified.groupBy(pid).agg(
            F.count(F.when(F.col("status") == D.STATUS_NEW, 1)).alias("new"),
            F.count(F.when(F.col("status") == D.STATUS_UPDATED, 1)).alias("updated"),
            F.count(F.when(F.col("status") == D.STATUS_UNCHANGED, 1)).alias("unchanged"),
        ).withColumn("dedup_hits", F.col("unchanged")))
        wall_ms = int((time.time() - t0) * 1000)
        lineage_new = (fetch_counts.join(cls_counts, "partition_id", "full_outer")
                       .na.fill(0)
                       .withColumn("wave", F.lit(wave))
                       .withColumn("wall_ms", F.lit(wall_ms))
                       .withColumn("committed_at", F.current_timestamp())
                       .select("wave", "partition_id", "urls_fetched", "dedup_hits",
                               "new", "updated", "unchanged", "wall_ms", "committed_at"))

        if self.collect_stats:
            stats = {
                "wave": wave,
                "fetched": got.count(),
                "missing": missing.count(),
                "deferred": deferred.count(),
                "disallowed": disallowed.count(),
                "enqueued": enqueue.count(),
                "new": classified.filter(F.col("status") == D.STATUS_NEW).count(),
                "updated": classified.filter(F.col("status") == D.STATUS_UPDATED).count(),
                "unchanged": classified.filter(F.col("status") == D.STATUS_UNCHANGED).count(),
                "jobs": jobs_batch.count(),
            }
        else:
            stats = {"wave": wave}
        # frontier/seen are state tables (overwrite); jobs/extracted/
        # lineage/audit append the wave's batch only (O(batch) IO);
        # last-write-wins reads go through jobs_view()/extracted_view()
        if _trace:
            print(f"[wave {wave}] stats+plan {time.time()-_t:.1f}s", flush=True)
            _t = time.time()
        self.store.commit(
            wave,
            {"frontier": new_frontier, "seen": new_seen},
            appends={"jobs": jobs_batch, "extracted": extracted_batch,
                     "lineage": lineage_new, "jsonld_audit": audit},
            output_partitions=self.snapshot_files)
        if _trace:
            print(f"[wave {wave}] commit {time.time()-_t:.1f}s", flush=True)
        seen.unpersist()
        sched.unpersist()
        fetched.unpersist()
        classified.unpersist()
        ext.unpersist()
        stats["wall_ms"] = int((time.time() - t0) * 1000)
        return stats

    # -- read-side views (append tables resolve last-write-wins here,
    # the parquet-sandbox equivalent of Iceberg MERGE results) ----------
    def _latest_view(self, table: str, key: str) -> DataFrame | None:
        from pyspark.sql.window import Window

        df = self.store.read(self.spark, table)
        if df is None:
            return None
        w = Window.partitionBy(key).orderBy(F.col("wave").desc())
        return (df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1).drop("_rn"))

    def jobs_view(self) -> DataFrame | None:
        """Normalized jobs, last write per id (K3 upsert semantics)."""
        return self._latest_view("jobs", "id")

    def extracted_view(self) -> DataFrame | None:
        """Extracted text, last write per url (byte-identity surface)."""
        return self._latest_view("extracted", "url")

    # -- loop ---------------------------------------------------------------
    def pending_count(self) -> int:
        fr = self.store.read(self.spark, "frontier")
        if fr is None:
            return 0
        return fr.filter((F.col("state") == "pending")
                         & (F.col("attempts") < self.max_retries)).count()

    def run_until_done(self, pages: DataFrame, robots: DataFrame,
                       host_rank: DataFrame, max_waves: int = 10) -> list[dict]:
        """P5 termination: loop while pending work remains. Starvation
        guard: a wave that leaves the pending count unchanged made no
        progress (e.g. zero robots budget) — stop instead of burning
        no-op waves to the max_waves cap."""
        out = []
        prev_pending = None
        pending = self.pending_count()
        while pending > 0 and len(out) < max_waves:
            if prev_pending is not None and pending == prev_pending:
                break
            out.append(self.run_wave(pages, robots, host_rank))
            prev_pending, pending = pending, self.pending_count()
        return out
