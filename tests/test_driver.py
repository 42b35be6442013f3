"""End-to-end wave driver tests: full crawl, three-way state machine
across waves, robots, budget deferral, kill-resume determinism."""

import shutil

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
        frontier = st.read(spark, "frontier")

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
        st = world["store"]
        frontier = st.read(spark, "frontier")
        assert frontier.filter(F.col("state") == "pending").count() == 0


class TestResume:
    def test_kill_resume_bit_identical(self, spark, tmp_path, world):
        """north_rule P10: kill after wave k; resume produces the same
        frontier/seen/jobs as the uninterrupted run."""
        # uninterrupted run in store A
        crawl_all(world)
        hA = {t: table_hash(world["store"].read(spark, t))
              for t in ("frontier", "seen", "jobs", "extracted")}

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
        hB = {t: table_hash(SnapshotStore(storeB.root).read(spark, t))
              for t in ("frontier", "seen", "jobs", "extracted")}
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
        hA = {t: table_hash(world["store"].read(spark, t))
              for t in ("seen", "jobs", "extracted")}
        storeB = SnapshotStore(tmp_path / "whP")
        drvB = WaveDriver(spark, storeB, num_partitions=13)
        drvB.bootstrap(world["seeds"])
        drvB.run_until_done(world["pages"], world["robots"], world["ranks"], 6)
        hB = {t: table_hash(storeB.read(spark, t))
              for t in ("seen", "jobs", "extracted")}
        assert hA == hB
