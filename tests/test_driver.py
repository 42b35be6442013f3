"""End-to-end wave driver tests: full crawl, three-way state machine
across waves, robots, budget deferral, kill-resume determinism."""

import shutil
import time

import pytest
from pyspark.sql import functions as F

from crawlspark import synth
from crawlspark.driver import WaveDriver, table_hash
from crawlspark.tables import SnapshotStore

N = 400


@pytest.fixture()
def world(spark, tmp_path):
    pages = spark.createDataFrame(synth.gen_pages_pandas(N, seed=42)).cache()
    robots = spark.createDataFrame(synth.gen_robots())
    ranks = spark.createDataFrame(synth.gen_host_rank())
    seeds = synth.gen_seed_list(N)
    store = SnapshotStore(tmp_path / "wh")
    drv = WaveDriver(spark, store, num_partitions=4)
    drv.bootstrap(seeds)
    return dict(pages=pages, robots=robots, ranks=ranks, seeds=seeds,
                store=store, drv=drv)


def crawl_all(w, max_waves=6):
    return w["drv"].run_until_done(w["pages"], w["robots"], w["ranks"], max_waves)


class TestFullCrawl:
    def test_two_wave_crawl(self, spark, world):
        stats = crawl_all(world)
        # wave 1 fetches all list pages; wave 2 fetches enqueued details
        assert stats[0]["fetched"] == len(world["seeds"])
        assert stats[0]["new"] > 0 and stats[0]["unchanged"] == 0
        st = world["store"]
        jobs = st.read(spark, "jobs")
        extracted = st.read(spark, "extracted")
        frontier = world["drv"].frontier_view()  # resolved O(delta) state

        # ~5% of urls are robots-disallowed, never fetched
        n_disallowed = frontier.filter(F.col("state") == "disallowed").count()
        assert n_disallowed > 0
        assert frontier.filter(F.col("state") == "disallowed")\
            .filter(~F.col("url").contains("/private-")).count() == 0
        assert jobs.count() == N - n_disallowed
        assert extracted.count() == N - n_disallowed

        # BYTE-IDENTITY through the full engine: committed extracted.text
        # equals the frozen golden pages.text for every fetched url
        golden = world["pages"].select("url", F.col("text").alias("golden"))
        bad = (extracted.join(golden, "url")
               .filter(F.col("text") != F.col("golden")).count())
        assert bad == 0

        # lineage recorded per wave with real counts
        lineage = st.read(spark, "lineage")
        agg = lineage.groupBy("wave").agg(F.sum("urls_fetched").alias("f")).collect()
        assert {r["wave"]: r["f"] for r in agg}[1] == len(world["seeds"])

        # audit side channel has JobPosting + Organization blobs
        audit = st.read(spark, "jsonld_audit")
        assert audit.count() > (N - n_disallowed)  # >=1 per detail + org blobs

    def test_wave2_three_way_state_machine(self, spark, world):
        """FIXTURES.md §4: re-crawl with wave-2 corpus -> ~20% UPDATED,
        ~70% UNCHANGED, 10% new ids NEW (deduplicator.go:49-67)."""
        crawl_all(world)
        pages2 = spark.createDataFrame(synth.gen_pages_pandas(N, seed=42, wave=2))
        # new cycle's seed list includes pagination tail pages added by
        # corpus growth — reseed must enqueue them (driver.reseed)
        world["drv"].reseed(synth.gen_seed_list(N, seed=42, wave=2))
        stats = world["drv"].run_until_done(pages2, world["robots"], world["ranks"], 6)
        s1 = stats[0]  # the list-recrawl wave
        total = s1["new"] + s1["updated"] + s1["unchanged"]
        assert total == synth.n_total_ids(N)
        assert s1["new"] == synth.n_total_ids(N) - N          # the 10% new ids
        assert abs(s1["updated"] / N - 0.2) < 0.05            # ~20% bumped
        assert s1["unchanged"] > 0.6 * N                      # rest skipped
        # unchanged jobs were NOT refetched: only new+updated detail fetches
        fetched_details = sum(s["fetched"] for s in stats[1:])
        disallowed_rate = 0.06
        assert fetched_details <= (s1["new"] + s1["updated"])
        assert fetched_details >= (s1["new"] + s1["updated"]) * (1 - disallowed_rate) - 2

    def test_budget_deferral(self, spark, world):
        """P1 token budgets: tokens_per_wave=5 forces multi-wave drain,
        FIFO within host preserved."""
        robots = spark.createDataFrame(
            synth.gen_robots().assign(tokens_per_wave=5))
        drv = world["drv"]
        s1 = drv.run_wave(world["pages"], robots, world["ranks"])  # list pages
        s2 = drv.run_wave(world["pages"], robots, world["ranks"])  # details
        assert s2["deferred"] > 0  # hot host's detail fan-out exceeds budget
        assert s2["fetched"] <= 5 * synth.N_HOSTS
        stats = drv.run_until_done(world["pages"], robots, world["ranks"], 40)
        # eventually drains completely
        assert drv.pending_count() == 0
        frontier = drv.frontier_view()
        assert frontier.filter(F.col("state") == "pending").count() == 0


class TestResume:
    def test_kill_resume_bit_identical(self, spark, tmp_path, world):
        """north_rule P10: kill after wave k; resume produces the same
        frontier/seen/jobs as the uninterrupted run."""
        # uninterrupted run in store A (hashes over the RESOLVED views —
        # the observable state of the O(delta) commit scheme)
        def state_hashes(drv):
            return {
                "frontier": table_hash(drv.frontier_view()),
                "seen": table_hash(drv.seen_view()),
                "jobs": table_hash(drv.store.read(spark, "jobs")),
                "extracted": table_hash(drv.store.read(spark, "extracted")),
            }

        crawl_all(world)
        hA = state_hashes(world["drv"])

        # interrupted run in store B: wave 1, "crash", new driver resumes
        storeB = SnapshotStore(tmp_path / "whB")
        drvB = WaveDriver(spark, storeB, num_partitions=4)
        drvB.bootstrap(world["seeds"])
        drvB.run_wave(world["pages"], world["robots"], world["ranks"])
        # simulate a crash mid-wave-2: orphan data dir, no manifest entry
        orphan = storeB.root / "data" / "999" / "frontier"
        orphan.mkdir(parents=True)
        (orphan / "part-zzz.parquet").write_bytes(b"garbage")
        drvB2 = WaveDriver(spark, SnapshotStore(storeB.root), num_partitions=4)
        drvB2.run_until_done(world["pages"], world["robots"], world["ranks"], 6)
        hB = state_hashes(drvB2)
        assert hA == hB

    def test_time_travel(self, spark, world):
        crawl_all(world)
        st = world["store"]
        sids = [s["sid"] for s in st.snapshots()]
        assert len(sids) >= 3
        f0 = st.read(spark, "frontier", snapshot_id=sids[0])
        fN = st.read(spark, "frontier")
        assert f0.filter(F.col("state") == "pending").count() > 0
        assert f0.count() < fN.count()


class TestParallelismInvariance:
    def test_same_state_at_different_parallelism(self, spark, tmp_path, world):
        """Scaling-determinism evidence: identical final state when run
        with different partition counts (the local analogue of N vs 4N
        executors holding the same crawl order + seen set)."""
        crawl_all(world)
        drvA = world["drv"]
        hA = (table_hash(drvA.seen_view()),
              table_hash(drvA.store.read(spark, "jobs")),
              table_hash(drvA.store.read(spark, "extracted")))
        storeB = SnapshotStore(tmp_path / "whP")
        drvB = WaveDriver(spark, storeB, num_partitions=13)
        drvB.bootstrap(world["seeds"])
        drvB.run_until_done(world["pages"], world["robots"], world["ranks"], 6)
        hB = (table_hash(drvB.seen_view()),
              table_hash(drvB.store.read(spark, "jobs")),
              table_hash(drvB.store.read(spark, "extracted")))
        assert hA == hB


class TestDeltaState:
    def test_missing_urls_retried_then_capped(self, spark, tmp_path, world):
        """P8: a scheduled url absent from pages returns to the pending
        pool (state='pending', attempts+1) and is retried until
        max_retries, then parked — never silently dropped in a
        transient 'scheduled' state."""
        # drop a slice of detail pages from the corpus
        pages = world["pages"].filter(~F.col("url").rlike(r"3\.html$"))
        dropped = world["pages"].join(pages, "url", "left_anti")
        n_dropped_details = dropped.count()
        assert n_dropped_details > 0
        drv = world["drv"]
        stats = drv.run_until_done(pages, world["robots"], world["ranks"], 12)
        missing_waves = [s["missing"] for s in stats if s["missing"] > 0]
        assert len(missing_waves) == drv.max_retries  # retried to the cap
        parked = (drv.frontier_view()
                  .filter((F.col("state") == "pending")
                          & (F.col("attempts") >= drv.max_retries)))
        assert parked.count() > 0
        assert drv.pending_count() == 0  # capped rows leave the pool

    def test_zero_budget_wave_stops_loop(self, spark, world):
        """Starvation guard: a wave that only defers (zero tokens) is
        no progress -> stop, even though the pending count is static."""
        robots0 = spark.createDataFrame(
            synth.gen_robots().assign(tokens_per_wave=0))
        stats = world["drv"].run_until_done(
            world["pages"], robots0, world["ranks"], 10)
        assert len(stats) == 1
        assert stats[0]["fetched"] == 0 and stats[0]["deferred"] > 0

    def test_equal_pending_count_with_progress_continues(self, spark, world):
        """A wave that fetches N list pages while enqueuing ~N links
        keeps the loop alive (work done, not pending-count equality)."""
        stats = crawl_all(world)
        assert len(stats) >= 2  # wave 2 ran despite similar pending counts

    def test_per_wave_commit_is_o_delta(self, spark, world):
        """The frontier/seen appends of a wave contain ONLY that wave's
        changed rows — not a rewrite of the full state table."""
        crawl_all(world)
        st = world["store"]
        total = world["drv"].frontier_view().count()
        # last wave's frontier delta dir
        last_entry = st.snapshots()[-1]["tables"]["frontier"]
        assert isinstance(last_entry, list) and len(last_entry) >= 3
        last_delta = spark.read.parquet(str(st.root / last_entry[-1]))
        assert 0 < last_delta.count() < total  # strictly a subset

    def test_compaction_preserves_views(self, spark, tmp_path, world):
        """compact() (here auto, every wave) rewrites the base without
        changing the resolved views or the crawl outcome."""
        crawl_all(world)
        hA = (table_hash(world["drv"].frontier_view()),
              table_hash(world["drv"].seen_view()))
        storeB = SnapshotStore(tmp_path / "whC")
        drvB = WaveDriver(spark, storeB, num_partitions=4, compact_every=1)
        drvB.bootstrap(world["seeds"])
        drvB.run_until_done(world["pages"], world["robots"], world["ranks"], 6)
        hB = (table_hash(drvB.frontier_view()), table_hash(drvB.seen_view()))
        assert hA == hB
        # after compaction the base is a single dir + later deltas
        fr_entry = storeB.snapshots()[-1]["tables"]["frontier"]
        base_len = len(fr_entry) if isinstance(fr_entry, list) else 1
        raw = storeB.read(spark, "frontier").count()
        assert raw == drvB.frontier_view().count()  # fully compacted base

    def test_compaction_drops_expired_seen(self, spark, tmp_path):
        """compact() physically removes TTL-expired seen rows (the
        Redis expiry of deduplicator.go:76-84) — lazy reads already
        hid them; after compaction the storage does too."""
        import pandas as pd
        from crawlspark import dedup as D
        from pyspark.sql import functions as F

        store = SnapshotStore(tmp_path / "whT")
        drv = WaveDriver(spark, store, num_partitions=2, use_bloom=False)
        drv.bootstrap(synth.gen_seed_list(60))
        # seed a seen delta: one row far expired, one alive
        from crawlspark.driver import wave_start
        rows = pd.DataFrame({
            "source": ["s", "s"], "id": ["dead", "alive"],
            "url_hash": [1, 2], "last_updated_on": ["1", "2"],
            "expires_at": [pd.Timestamp("2020-01-01"),
                           pd.Timestamp("2100-01-01")],
            "salt": [0, 1],
        })
        from crawlspark.schemas import SEEN_SCHEMA
        delta = (spark.createDataFrame(rows)
                 .select(*[F.col(f.name).cast(f.dataType) for f in SEEN_SCHEMA.fields])
                 .withColumn("_wseq", F.lit(1)))
        store.commit(1, {}, appends={"seen": delta})
        assert drv.seen_view().count() == 2  # raw view keeps both
        drv.compact()
        left = {r["id"] for r in drv.seen_view().collect()}
        assert left == {"alive"}  # expired row physically gone
        raw = store.read(spark, "seen")
        assert raw.filter(F.col("id") == "dead").count() == 0


class TestSeenDeterminism:
    def test_duplicate_listing_keeps_earliest_discovery(self, spark, tmp_path):
        """A wave that lists the same (source,id) twice with conflicting
        values resolves seen deterministically: the earliest FIFO
        discovery (page, rank) wins — same tie-break as frontier_delta,
        so resume/parallelism invariance holds even for dup listings."""
        import pandas as pd

        host = synth.host_name(0)
        durl = synth.detail_url(host, "nhan-vien-x", 7)

        def list_html(updated):
            a = (f'<div class="job-item"><a class="job-link" href="{durl}" '
                 f'data-id="7" data-updated="{updated}">X</a></div>')
            return ("<!DOCTYPE html><html><head></head><body>"
                    f"{a}</body></html>").encode()

        # page 2 carries the LATER listing with a different value; the
        # earliest page (1) must win regardless of partition order
        pages = spark.createDataFrame(pd.DataFrame({
            "url": [synth.list_url(host, 1), synth.list_url(host, 2)],
            "warc_ts": [pd.Timestamp("2026-01-01")] * 2,
            "html": [list_html(1111), list_html(2222)],
            "text": ["", ""], "lang": ["vi", "vi"],
        }), schema="url string, warc_ts timestamp, html binary, text string, lang string")
        seeds = pd.DataFrame({
            "url": [synth.list_url(host, 1), synth.list_url(host, 2)],
            "host": [host, host], "page": [1, 2], "depth": [0, 0]})
        robots = spark.createDataFrame(synth.gen_robots())
        ranks = spark.createDataFrame(synth.gen_host_rank())

        hashes = set()
        for i in range(2):
            drv = WaveDriver(spark, SnapshotStore(tmp_path / f"wh{i}"),
                             num_partitions=4 if i == 0 else 1)
            drv.bootstrap(seeds)
            drv.run_wave(pages, robots, ranks)
            seen = drv.seen_view().filter(F.col("id") == "7").collect()
            assert len(seen) == 1
            assert seen[0]["last_updated_on"] == "1111"  # page 1 wins
            hashes.add(table_hash(drv.seen_view()))
        assert len(hashes) == 1  # invariant across partition layouts


class TestObsGet:
    def test_unfired_observation_falls_back_without_hanging(self, spark):
        """ADVICE r3: getAsJava blocks forever on an unfired
        observation. _obs_get must detect the missing metrics with the
        non-blocking getRowOrEmpty probe and run the deterministic
        fallback aggregate instead — the cache-hit-above-CollectMetrics
        wave path depends on it."""
        from pyspark.sql import Observation

        from crawlspark.driver import _obs_get

        obs = Observation("never_fires")
        df = spark.range(7)
        df.observe(obs, F.count("*").alias("n"))  # observed plan NEVER run
        t0 = time.monotonic()
        got = _obs_get(obs, ["n"], df, [F.count("*").alias("n")])
        assert got == {"n": 7}
        assert time.monotonic() - t0 < 30  # not the blocked future

    def test_fired_observation_reads_metrics(self, spark):
        from pyspark.sql import Observation

        from crawlspark.driver import _obs_get

        obs = Observation("fires")
        df = spark.range(5).observe(obs, F.count("*").alias("n"))
        df.count()
        # fallback frame is wrong on purpose: metrics must win
        got = _obs_get(obs, ["n"], spark.range(99), [F.count("*").alias("n")])
        assert got == {"n": 5}


class TestFoldedCommit:
    def test_fold_roundtrip_select_pruning_and_empty(self, spark, tmp_path):
        """SnapshotStore.fold_appends: several append tables written as
        one partitioned job must read back with their own schemas; a
        zero-row table appends nothing; later unfolded appends to the
        same table union cleanly with folded dirs.

        (The wave driver measured the fold SLOWER than thread-pooled
        separate writes on this box and does not use it — the seam
        stays for high-per-job-cost backends, so it stays tested.)"""
        from crawlspark.tables import SnapshotStore

        store = SnapshotStore(tmp_path / "wh")
        a = spark.createDataFrame([(1, "x"), (2, "y")], "k int, va string")
        b = spark.createDataFrame([(7, 3.5)], "k int, vb double")
        empty = spark.createDataFrame([], "k int, vc string")
        store.commit(1, {}, appends={"ta": a, "tb": b, "tc": empty},
                     fold_appends={"ta", "tb", "tc"})
        ra = store.read(spark, "ta")
        assert sorted(ra.columns) == ["k", "va"]      # superset pruned
        assert {(r.k, r.va) for r in ra.collect()} == {(1, "x"), (2, "y")}
        rb = store.read(spark, "tb")
        assert sorted(rb.columns) == ["k", "vb"]
        assert rb.first().vb == 3.5
        assert store.read(spark, "tc") is None         # nothing appended

        # mixed chain: plain (unfolded) append after a folded one
        a2 = spark.createDataFrame([(3, "z")], "k int, va string")
        store.commit(2, {}, appends={"ta": a2})
        assert {r.k for r in store.read(spark, "ta").collect()} == {1, 2, 3}

        # overwrite drops the delta chain and prunes stale select keys
        store.commit(3, {"ta": spark.createDataFrame([(9, "w")],
                                                     "k int, va string")})
        assert {r.k for r in store.read(spark, "ta").collect()} == {9}
        assert all(not k.endswith("=ta") for k in store._select_map())
        # tb's folded dir is still live, its select entry survives
        assert any(k.endswith("=tb") for k in store._select_map())
