"""Wave driver (SURVEY §3): the crawl loop, one snapshot per wave.

Per wave:
  pending frontier -> politeness schedule (per-host budgets, robots)
  -> "fetch" = equi-join against the pages table (S7: the closed-world
  analogue of the HTTP GET) -> ONE combined extraction pass (list
  pages: link scan; detail pages: JSON-LD enrichment + audit blobs)
  -> dedup classify (incremental bloom + seen join) -> enqueue
  NEW/UPDATED, append seen delta -> normalize -> append jobs batch
  -> lineage rows per partition -> ONE atomic snapshot commit.

This inverts the reference's topology (three processes x Redis queues,
one Redis round-trip per job — SURVEY §3.1-3.3) into one declarative
plan per wave; the publish-then-mark at-least-once contract
(vieclam24h/crawler.go:131-141) strengthens to exactly-once because
frontier append and seen append commit atomically.

State tables are O(delta) per wave (Iceberg merge-on-read analogue):
  - frontier and seen commit ONLY the wave's changed rows, stamped
    with a commit sequence (_wseq); readers resolve last-write-wins
    per key through frontier_view()/seen_view() windows.
  - deferred rows write NOTHING (they simply stay pending in the
    resolved view) — deferral is free.
  - compact() (auto every ``compact_every`` waves, wave-count-keyed so
    kill-resume replays it deterministically) rewrites the resolved
    views as a fresh base, physically drops TTL-expired seen rows
    (deduplicator.go:76-84's Redis expiry), and rebuilds the bloom
    table from surviving keys. Between compactions, per-wave commit
    IO never scales with total state size.
  - blooms update incrementally: the wave's seen delta builds a
    fixed-capacity per-salt bloom that OR-merges into the stored
    bloom table — O(delta + n_salts) per wave, never a full rebuild.

Resume (north_rule, P10): every wave is a snapshot; a killed run
restarts from the last committed wave and reproduces the uninterrupted
run bit-for-bit on the resolved views (tests/test_driver.py pins this).

Scale notes:
- pages join: frontier wave (budget-bounded) broadcasts against pages
  (the 100 TB side) on url, so the fat html column NEVER crosses a
  shuffle — pages stream from parquet straight into extraction. At a
  10^10 frontier the same guarantee comes from bucketing both tables
  by url hash (storage-layer config); plan shape is identical.
- html stays BINARY end-to-end and is dropped inside the same stage
  that extracts from it; nothing html-bearing is ever persisted.
- exactly TWO driver-side actions per wave: narrow counts that fill
  the extraction and classify caches (serializing the Python stage so
  concurrent commit writes cannot duplicate it). Every wave stat rides
  Observation metrics attached to frames those jobs and the commit
  writes materialize anyway — no dedicated counter job (the round-1
  serial floor of ~11 .count() actions, then round-2's one 9-branch
  union job, are both gone); loop control is exact arithmetic over
  the stats, never a frontier re-read.
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import dedup as D
from . import politeness
from .clean import udfs as clean_udfs
from .extract import extract_pages
from .frontier import host_of, priority_expr
from .normalize import normalize_vieclam24h
from .schemas import FRONTIER_SCHEMA, SEEN_SCHEMA
from .tables import SnapshotStore

WAVE_EPOCH = datetime(2026, 1, 1)
WAVE_SECONDS = 3600  # one wave = one cron cycle (cmd/vieclam24h/crawler/main.go:24)

_FRONTIER_COLS = [f.name for f in FRONTIER_SCHEMA.fields]
_SEEN_COLS = [f.name for f in SEEN_SCHEMA.fields]

_STAT_KEYS = ("fetched", "missing", "missing_retryable", "deferred",
              "disallowed", "enqueued", "new", "updated", "unchanged")


def _obs_get(obs: Observation, names: list[str], fallback: DataFrame,
             exprs: list) -> dict:
    """Observation metrics with a deterministic fallback.

    Metrics ride CollectMetrics accumulators on jobs the wave runs
    anyway (zero dedicated counter jobs). Two PySpark 4.1.2 edge cases
    are handled: Observation.get's toPyRow asserts on the schemaless
    row produced when the observed node first executes inside a
    broadcast-build job (read getAsJava instead), and a query that hits
    the persisted cache ABOVE the metrics node can complete first with
    no metrics at all — then recompute the same aggregates directly on
    the cached frame (tiny: one job over cached partitions, rare in
    practice).

    Missing metrics are detected with the NON-blocking getRowOrEmpty
    (None until the observation fires): getAsJava blocks forever on an
    unfired observation's future, which would hang the driver on the
    cache-hit path instead of reaching the fallback (verified
    empirically on 4.1.2). One short grace retry covers listener
    latency between job completion and metric registration."""
    # NB getRowOrEmpty returns a *scala Option* — py4j hands back a
    # JavaObject proxy even for None$, so test isEmpty(), not `is None`
    fired = not obs._jo.getRowOrEmpty().isEmpty()
    if not fired:
        time.sleep(0.1)
        fired = not obs._jo.getRowOrEmpty().isEmpty()
    if fired:
        m = dict(obs._jo.getAsJava())
        if all(n in m for n in names):
            return {n: int(m[n]) for n in names}
    row = fallback.agg(*exprs).first()
    return {n: int(row[n]) for n in names}


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
                 snapshot_files: int | None = 8, compact_every: int = 8,
                 bloom_capacity_per_salt: int = 1_000_000,
                 normalize_fn=None):
        self.spark = spark
        self.store = store
        self.source = source
        # N1 source dispatch (normalizer.go:30-43): the per-source
        # normalizer is an injectable seam; the closed-world fixtures
        # are vieclam24h-shaped, so that path is the default. The other
        # reference paths (normalize_vietnamworks / normalize_topdev /
        # normalize_generic) plug in here against their own staged
        # input contracts.
        self.normalize_fn = normalize_fn or normalize_vieclam24h
        self.num_partitions = num_partitions
        self.n_salts = n_salts
        self.max_retries = max_retries
        self.use_bloom = use_bloom
        # Stats now cost ZERO extra actions (they ride the single
        # forcing aggregate); the flag is kept for API compatibility.
        self.collect_stats = collect_stats
        self.snapshot_files = snapshot_files
        self.compact_every = compact_every
        # Fixed bloom capacity per salt bucket so per-wave delta blooms
        # OR-merge into the stored table (dedup.merge_blooms). At the
        # 10^10-key design point: 256 salts x ~4e7 keys => ~50 MB/salt.
        self.bloom_capacity_per_salt = bloom_capacity_per_salt

    # -- pending predicate ---------------------------------------------------
    def _pending(self) -> F.Column:
        return (F.col("state") == "pending") & (F.col("attempts") < self.max_retries)

    # -- delta resolution (merge-on-read views) ------------------------------
    def _resolved(self, table: str, keys: list[str]) -> DataFrame | None:
        """Last-write-wins per key — the read side of the O(delta)
        commit scheme (Iceberg MoR / Redis SET equivalence).

        The base (bootstrap or last compaction) is already one row per
        key, and every delta is too (per-wave dedup), so ONLY the delta
        chain is window-resolved; the base streams through a broadcast
        anti join against the resolved delta keys. The per-wave read
        therefore exchanges O(delta-chain) rows, never O(total state) —
        the round-2 scheme's full-table `row_number() OVER (source,id)`
        shuffle+sort is gone. Delta waves always carry a higher `_wseq`
        than the base they follow, so delta-wins is exact. The broadcast
        of delta keys is bounded by compact_every waves of changes
        (compaction folds the chain back into the base); production
        analogue: Iceberg bucket-partitioned MoR with storage-partitioned
        joins."""
        base, deltas = self.store.read_split(self.spark, table)
        if base is None:
            return None
        if deltas is None:
            return base
        w = Window.partitionBy(*keys).orderBy(F.col("_wseq").desc())
        dres = (deltas.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1).drop("_rn"))
        # membership only — distinct over the raw deltas (map-side
        # combined) instead of re-running the window subtree under the
        # broadcast
        dkeys = deltas.select(*keys).distinct()
        survivors = base.join(F.broadcast(dkeys), keys, "left_anti")
        return dres.unionByName(survivors)

    def frontier_view(self) -> DataFrame | None:
        """Current frontier state: one row per url."""
        out = self._resolved("frontier", ["url"])
        return None if out is None else out.select(*_FRONTIER_COLS)

    def seen_view(self) -> DataFrame | None:
        """Current seen set: one row per (source, id); TTL expiry is
        applied lazily by consumers via dedup.seen_live. Column order is
        canonicalized (a salt-partitioned base reads salt last)."""
        out = self._resolved("seen", ["source", "id"])
        if out is None:
            return None
        return out.select(*_SEEN_COLS)

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
        fr = (self.spark.createDataFrame(pdf[_FRONTIER_COLS], schema=FRONTIER_SCHEMA)
              .withColumn("_wseq", F.lit(0)))
        seen = (self.spark.createDataFrame([], SEEN_SCHEMA)
                .withColumn("_wseq", F.lit(0)))
        return self.store.commit(0, {}, appends={"frontier": fr, "seen": seen})

    def reseed(self, seeds: pd.DataFrame | None = None) -> int:
        """Model the cron re-crawl (P6): flip fetched list pages back to
        pending for the next cycle — as an O(list pages) delta, never a
        frontier rewrite. Pass the cycle's seed list to also enqueue NEW
        list pages — a growing corpus adds pagination tail pages that
        the previous cycle never saw (the reference reaches them by
        re-paginating the API until LastPage each run,
        vieclam24h/crawler.go:76-166)."""
        wave = self.store.latest_wave()
        fv = self.frontier_view()
        flips = (fv.filter((F.col("depth") == 0) & (F.col("state") == "fetched"))
                 .withColumn("state", F.lit("pending"))
                 .withColumn("wave", F.lit(wave + 1)))
        delta = flips
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
                pdf[_FRONTIER_COLS], schema=FRONTIER_SCHEMA)
            fresh = fresh.join(fv.select("url"), "url", "left_anti")
            delta = delta.unionByName(fresh.select(*delta.columns))
        delta = delta.withColumn("_wseq", F.lit(wave + 1))
        return self.store.commit(wave + 1, {}, appends={"frontier": delta})

    # -- one wave -----------------------------------------------------------
    def run_wave(self, pages: DataFrame, robots: DataFrame,
                 host_rank: DataFrame) -> dict:
        t0 = time.time()
        spark = self.spark
        wave = self.store.latest_wave() + 1
        ws = wave_start(wave)
        now_ts = F.to_timestamp(F.lit(str(ws)))

        pending = (self.frontier_view() or
                   spark.createDataFrame([], FRONTIER_SCHEMA)).filter(self._pending())

        # priority (north_rule): recrawl age = waves since enqueue
        age_hours = (F.lit(wave) - F.col("wave")) * F.lit(WAVE_SECONDS / 3600.0)
        pending = (pending.drop("priority")
                   .join(F.broadcast(host_rank.withColumnRenamed("rank", "_hr")),
                         "host", "left")
                   .withColumn("priority",
                               priority_expr(F.col("depth"), F.col("_hr"), age_hours))
                   .drop("_hr")
                   .select(*_FRONTIER_COLS))

        # Persist shared lineage. Wave stats ride Observation metrics
        # (CollectMetrics accumulators) attached to frames the wave's
        # own jobs materialize anyway — no dedicated counter job.
        obs_sched = Observation()
        sched_metrics = [
            F.count(F.when(F.col("state") == "deferred", 1)).alias("deferred"),
            F.count(F.when(F.col("state") == "disallowed", 1))
            .alias("disallowed")]
        sched = (politeness.schedule(pending, robots, ws)
                 .observe(obs_sched, *sched_metrics)
                 .persist())
        to_fetch = sched.filter(F.col("state") == "scheduled").drop("slot", "scheduled_ts")
        # deferred rows stay pending: no delta row, counted via obs_sched
        disallowed = (sched.filter(F.col("state") == "disallowed")
                      .drop("slot", "scheduled_ts"))

        # "fetch": equi-join with the pages table. The frontier side is
        # explicitly broadcast (inner join) and PRUNED to the columns
        # the downstream stages read: the wave is politeness-budget-
        # bounded while pages is the 100 TB side — broadcasting the
        # small side guarantees the fat html column NEVER crosses a
        # shuffle. html stays binary; the combined mapInArrow page stage
        # (pandas-free — 2.3x faster measured, BENCH.md) decodes per
        # Arrow batch and html is dropped inside the same stage, so the
        # wave-long cache holds only extracted columns. Unfetchable urls
        # (P8 retry) come from an anti join reading ONLY pages.url.
        fetch_cols = to_fetch.select("url", "depth", "page", "id", "last_updated_on")
        obs_fetch = Observation()
        fetch_metrics = [F.count(F.lit(1)).alias("fetched")]
        processed = (extract_pages(
            pages.select("url", "html", F.col("warc_ts").alias("_warc_ts"))
                 .join(F.broadcast(fetch_cols), "url", "inner"))
            .select("url", "depth", "page", "id", "last_updated_on",
                    "_warc_ts", "_links", "x", "jsonld")
            .observe(obs_fetch, *fetch_metrics)
            .persist())
        # P8 retry: missing urls return to the pending pool with
        # attempts+1 (state left 'scheduled' would orphan them forever;
        # the pending filter caps at max_retries).
        # persisted: consumed by the frontier delta and observed for the
        # retry stats — one column-pruned pages.url scan, zero extra jobs
        obs_missing = Observation()
        missing_metrics = [
            F.count(F.lit(1)).alias("missing"),
            F.count(F.when(F.col("attempts") < self.max_retries, 1))
            .alias("missing_retryable")]
        missing = (to_fetch.join(pages.select("url"), "url", "left_anti")
                   .withColumn("attempts", F.col("attempts") + 1)
                   .withColumn("state", F.lit("pending"))
                   .observe(obs_missing, *missing_metrics)
                   .persist())

        # ---- list pages -> frontier candidates (S5 + D1/D2) --------------
        links = (processed.filter(F.col("depth") == 0)
                 .withColumn("l", F.explode("_links"))
                 .select(F.col("l.href").alias("url"),
                         F.lit(self.source).alias("source"),
                         F.coalesce(F.col("l.item_id"), F.col("l.href")).alias("id"),
                         F.col("l.item_updated").alias("last_updated_on"),
                         (F.col("depth") + 1).alias("depth"),
                         F.lit(wave).alias("wave"),
                         F.col("page"),
                         F.col("l.rank").alias("rank"))
                 .withColumn("host", host_of(F.col("url"))))

        seen = self.seen_view() or spark.createDataFrame([], SEEN_SCHEMA)
        blooms_prev = self.store.read(spark, "blooms") if self.use_bloom else None
        bloom_cand = None
        if blooms_prev is not None:
            raw_cls = D.classify_with_bloom(
                links, seen, blooms_prev, now_ts,
                n_salts=self.n_salts, cache=True)
            bloom_cand = raw_cls._bloom_cand  # probed frame: cogroup
            classified = raw_cls.drop("url_hash", "salt")
        else:
            classified = D.classify(links, seen, now_ts)
        obs_cls = Observation()
        cls_metrics = [
            F.count(F.when(F.col("status") == D.STATUS_NEW, 1)).alias("new"),
            F.count(F.when(F.col("status") == D.STATUS_UPDATED, 1))
            .alias("updated"),
            F.count(F.when(F.col("status") == D.STATUS_UNCHANGED, 1))
            .alias("unchanged")]
        classified = classified.observe(obs_cls, *cls_metrics).persist()

        changed = classified.filter(F.col("status") != D.STATUS_UNCHANGED)
        enqueue = (changed.drop("status")
                   .withColumn("priority", F.lit(0.0))
                   .withColumn("state", F.lit("pending"))
                   .withColumn("attempts", F.lit(0))
                   .select(*_FRONTIER_COLS))

        # publish-then-mark, atomically: the seen DELTA commits in the
        # same snapshot as the frontier delta (O(delta), no anti-join
        # against the stored seen set). One row per (source,id): a wave
        # that lists the same item twice keeps the earliest FIFO
        # discovery — the same deterministic tie-break as frontier_delta,
        # so resolved seen values stay parallelism/resume-invariant.
        w_seen = Window.partitionBy("source", "id").orderBy(
            F.col("page").asc_nulls_last(), F.col("rank").asc_nulls_last(),
            F.col("last_updated_on").asc_nulls_last(), F.col("url").asc())
        seen_new = (D.seen_delta(
            changed.withColumn("_rn", F.row_number().over(w_seen))
                   .filter(F.col("_rn") == 1)
                   .select("source", "id", "host", "last_updated_on"),
            now_ts, n_salts=self.n_salts)
            .withColumn("_wseq", F.lit(wave)))

        # ---- detail pages -> extract -> normalize -> jobs append ---------
        details = processed.filter(F.col("depth") > 0)
        staged = (details
                  .withColumn("source", F.lit(self.source))
                  .withColumn("item_title", F.col("x.title"))
                  .withColumn("crawled_at", F.col("_warc_ts")))
        # single-consumer frame: its one write computes it once — no
        # cache, and it stays OUT of the counter job (the normalize +
        # unescape-pUDF subtree would dominate the stats action)
        jobs_batch = (self.normalize_fn(staged).dropDuplicates(["id"])
                      .withColumn("wave", F.lit(wave)))

        # the byte-identity surface (C2, worker.go:145-147): CleanToText of
        # the extracted description, committed per url
        _, clean_to_text_udf, _ = clean_udfs()
        extracted_batch = details.select(
            "url", F.lit(wave).alias("wave"),
            clean_to_text_udf(F.col("x.job_description")).alias("text"))
        audit = details.select("url", F.lit(wave).alias("wave"),
                               F.posexplode("jsonld").alias("blob_index", "blob"))

        # ---- frontier delta (O(changed rows), never a rewrite) -----------
        fetched_rows = (to_fetch.join(missing.select("url"), "url", "left_anti")
                        .withColumn("state", F.lit("fetched")))
        state_changes = (fetched_rows.select(*_FRONTIER_COLS)
                         .unionByName(missing.select(*_FRONTIER_COLS))
                         .unionByName(disallowed.select(*_FRONTIER_COLS))
                         .withColumn("_pri", F.lit(0)))
        # Within-wave resolution: one row per url. An enqueue beats a
        # state update (an UPDATED link re-pends a just-fetched url for
        # recrawl — publisher.go:30-83 re-push semantics); duplicate
        # enqueues keep the earliest FIFO discovery (page, rank).
        wave_delta = state_changes.unionByName(
            enqueue.withColumn("_pri", F.lit(1)))
        w_dedup = Window.partitionBy("url").orderBy(
            F.col("_pri").desc(), F.col("page").asc_nulls_last(),
            F.col("rank").asc_nulls_last(),
            F.col("last_updated_on").asc_nulls_last(), F.col("id").asc())
        frontier_delta = (wave_delta
                          .withColumn("_rn", F.row_number().over(w_dedup))
                          .filter(F.col("_rn") == 1).drop("_rn", "_pri")
                          .withColumn("_wseq", F.lit(wave)))

        # ---- lineage (per-partition metrics, north_rule) ------------------
        pid = F.spark_partition_id().alias("partition_id")
        fetch_counts = processed.groupBy(pid).agg(F.count("*").alias("urls_fetched"))
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

        # ---- driver-side actions (two, both doing real work) --------------
        # Wave stats are Observation metrics riding jobs the wave runs
        # anyway — the round-2 dedicated 9-branch counter job (pure
        # task-scheduling overhead, ~5 s/crawl measured) is gone. Loop
        # control stays exact arithmetic: the scheduler partitions EVERY
        # pending row into scheduled/deferred/disallowed, so work
        # remains after this wave iff something was enqueued, deferred,
        # or returned retryable-missing.
        _trace = os.environ.get("CRAWLSPARK_TRACE") == "1"
        _t = time.time()

        def _tick(label):
            nonlocal _t
            if _trace:
                print(f"[wave {wave}] {label} {time.time() - _t:.2f}s", flush=True)
            _t = time.time()

        # THE pre-commit action (one per wave): materializing classified
        # computes the whole chain beneath it — sched, the Python
        # extraction stage, and the bloom probe all fill their persist
        # caches in this single job, and obs_sched/obs_fetch/obs_cls
        # all fire (their CollectMetrics nodes sit below the persists).
        # Round-4 merge: a separate processed.count() action was pure
        # job-constant overhead — the extraction cache fills here just
        # the same, and the commit's concurrent writes still see only
        # cached frames. The bloom decision below needs the enqueued
        # count pre-commit, hence counting classified, not processed.
        classified.count()
        fetched = _obs_get(obs_fetch, ["fetched"],
                           processed, fetch_metrics)["fetched"]
        cls = _obs_get(obs_cls, ["new", "updated", "unchanged"],
                       classified, cls_metrics)
        counted = {"fetched": fetched, **cls,
                   "enqueued": cls["new"] + cls["updated"]}
        _tick("extract+classify")

        # incremental bloom maintenance: delta bloom at fixed capacity,
        # OR-merged into the stored table — O(delta + n_salts); skipped
        # entirely on waves that marked nothing new (detail waves)
        blooms_out = None
        if self.use_bloom and counted.get("enqueued", 0) > 0:
            delta_blooms = D.build_blooms(
                seen_new, capacity_per_salt=self.bloom_capacity_per_salt)
            blooms_out = (D.merge_blooms(blooms_prev, delta_blooms)
                          if blooms_prev is not None else delta_blooms)
            _tick("blooms")
        tables = {"blooms": blooms_out} if blooms_out is not None else {}
        self.store.commit(
            wave,
            tables,
            appends={"frontier": frontier_delta, "seen": seen_new,
                     "jobs": jobs_batch, "extracted": extracted_batch,
                     "lineage": lineage_new, "jsonld_audit": audit},
            output_partitions=self.snapshot_files,
            # only the fat tables pay a file-sizing shuffle; control
            # tables write with natural partitioning.
            # MEASURED ANTI-RESULT (round 4, 60k pages, best-of-2):
            # folding appends into one partitionBy(_table) job — the
            # obvious way to cut per-job constants — is SLOWER than
            # the thread-pooled separate writes at both 2c and 8c:
            # baseline 7.2s@8c/11.0s@2c commit wall, 4-control-table
            # fold 8.1/12.1, all-6 fold 9.9/15.3. Concurrent job
            # submission already overlaps the constants, while the
            # fold serializes all branches into one DAG, pays a
            # column-superset union, and runs 7 dynamic-partition
            # writers per task. fold_appends stays available in
            # SnapshotStore (tested) for regimes with higher per-job
            # cost (e.g. a remote catalog), but the driver doesn't use it.
            repartition_tables={"jobs", "extracted"})
        _tick("commit")
        # sched/missing observations filled during action 1 / the
        # frontier-delta write respectively — read after commit
        counted.update(_obs_get(obs_sched, ["deferred", "disallowed"],
                                sched, sched_metrics))
        counted.update(_obs_get(obs_missing,
                                ["missing", "missing_retryable"],
                                missing, missing_metrics))
        stats = {"wave": wave, **{k: int(counted.get(k, 0)) for k in _STAT_KEYS}}
        # exact pending-work indicator: deferred rows stay pending,
        # enqueues become pending, retryable missing re-pend; every
        # other pending row transitioned this wave
        stats["work_remains"] = (stats["enqueued"] + stats["deferred"]
                                 + stats["missing_retryable"]) > 0
        sched.unpersist()
        processed.unpersist()
        classified.unpersist()
        missing.unpersist()
        if bloom_cand is not None:
            bloom_cand.unpersist()
        if self.compact_every and wave % self.compact_every == 0:
            self.compact()
        stats["wall_ms"] = int((time.time() - t0) * 1000)
        return stats

    # -- compaction ----------------------------------------------------------
    def compact(self) -> int:
        """Rewrite frontier/seen as their resolved views (fresh base for
        the delta chain), physically drop TTL-expired seen rows, and
        rebuild blooms from the surviving keys. Keyed to the current
        wave (deterministic under kill-resume); the expiry cutoff is the
        wave start, never the wall clock."""
        wave = self.store.latest_wave()
        now_ts = F.to_timestamp(F.lit(str(wave_start(wave))))
        fr = self._resolved("frontier", ["url"])
        if self.snapshot_files:
            # cluster the base by state within files: parquet row-group
            # min/max stats then let the every-wave pending filter SKIP
            # the (dominant, ever-growing) fetched row groups instead of
            # scanning the whole frontier
            fr = (fr.repartition(self.snapshot_files)
                  .sortWithinPartitions("state"))
        # seen base is stored bucketed by salt (directory partitioning —
        # the plain-parquet analogue of Iceberg bucket-partitioned MoR):
        # clustered by the same key the blooms and the hot-domain skew
        # scheme use, one file per salt (repartition on salt, not a
        # blind N-way split), so per-salt maintenance and salt-pruned
        # probes read only their bucket's files.
        sn = (D.seen_live(self._resolved("seen", ["source", "id"]), now_ts)
              .repartition(F.col("salt")))
        tables: dict[str, DataFrame] = {"frontier": fr, "seen": sn}
        if self.use_bloom:
            tables["blooms"] = D.build_blooms(
                sn, capacity_per_salt=self.bloom_capacity_per_salt)
        return self.store.commit(wave, tables,
                                 partition_by={"seen": ["salt"]},
                                 output_partitions=self.snapshot_files,
                                 repartition_tables={"blooms"})

    # -- read-side views (append tables resolve last-write-wins here,
    # the parquet-sandbox equivalent of Iceberg MERGE results) ----------
    def _latest_view(self, table: str, key: str) -> DataFrame | None:
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
        fr = self.frontier_view()
        if fr is None:
            return 0
        return fr.filter(self._pending()).count()

    def run_until_done(self, pages: DataFrame, robots: DataFrame,
                       host_rank: DataFrame, max_waves: int = 10) -> list[dict]:
        """P5 termination: loop while pending work remains. Starvation
        guard: progress is measured by WORK DONE (fetched / enqueued /
        state transitions), not by the pending count staying equal — a
        wave that fetches N rows while enqueuing exactly N new links is
        real progress; a wave where only deferrals happen (e.g. zero
        robots budget) is not, and stops the loop."""
        out: list[dict] = []
        if self.pending_count() == 0:
            return out
        while len(out) < max_waves:
            stats = self.run_wave(pages, robots, host_rank)
            out.append(stats)
            progressed = (stats["fetched"] + stats["enqueued"]
                          + stats["disallowed"] + stats["missing"]) > 0
            if not stats["work_remains"] or not progressed:
                break
        return out
