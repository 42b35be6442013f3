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


class TestRobotsTxtParsing:
    ROBOTS = """
# comment line
User-agent: googlebot
Disallow: /g-only/

User-agent: crawlspark
User-agent: otherbot
Disallow: /private/
Allow: /private/jobs/
Crawl-delay: 2
Disallow:

User-agent: *
Disallow: /everything/
""".strip()

    def _parsed(self, spark, txt=None):
        from crawlspark.politeness import parse_robots_txt

        df = spark.createDataFrame(
            [("a.vn", txt if txt is not None else self.ROBOTS)],
            "host string, robots_txt string")
        return parse_robots_txt(df, "crawlspark").collect()[0]

    def test_group_selection_and_rules(self, spark):
        r = self._parsed(spark)
        # the named group wins over * and googlebot; consecutive UA
        # lines share it; empty Disallow contributes nothing
        assert r.disallow_prefixes == ["/private/"]
        assert r.allow_prefixes == ["/private/jobs/"]
        assert r.crawl_delay_ms == 2000
        assert r.tokens_per_wave == 1800

    def test_star_fallback_and_defaults(self, spark):
        r = self._parsed(spark, "User-agent: *\nDisallow: /x/")
        assert r.disallow_prefixes == ["/x/"]
        assert r.crawl_delay_ms == 3000  # no Crawl-delay -> default
        r2 = self._parsed(spark, "User-agent: googlebot\nDisallow: /y/")
        assert r2.disallow_prefixes == []  # no applicable group: permissive

    def test_rules_before_any_group_ignored(self, spark):
        r = self._parsed(spark, "Disallow: /orphan/\nUser-agent: *\nDisallow: /x/")
        assert r.disallow_prefixes == ["/x/"]

    def test_longest_match_allow_wins(self, spark):
        from crawlspark.politeness import robots_allows

        df = spark.createDataFrame(
            [("/private/jobs/1",), ("/private/other",), ("/public",)],
            "path string")
        out = {r.path: r.ok for r in df.select(
            "path", robots_allows(
                F.col("path"),
                F.array(F.lit("/private/")),
                F.array(F.lit("/private/jobs/"))).alias("ok")).collect()}
        assert out == {"/private/jobs/1": True,   # longer Allow wins
                       "/private/other": False,
                       "/public": True}           # no match -> allowed

    def test_wildcard_and_anchor_patterns(self, spark):
        """ADVICE r3: RFC 9309 special characters — '*' spans any
        char sequence, trailing '$' anchors the path end; regex
        metacharacters in rule values stay literal."""
        from crawlspark.politeness import robots_allows

        cases = [
            # Disallow: /*.php
            ("/index.php", ["/*.php"], [], False),
            ("/a/b/page.php", ["/*.php"], [], False),
            ("/php-guide", ["/*.php"], [], True),      # '.php' not present
            ("/file.phpx", ["/*.php"], [], False),     # no anchor: matches
            # Disallow: /search$
            ("/search", ["/search$"], [], False),
            ("/search/results", ["/search$"], [], True),
            ("/search?q=x", ["/search$"], [], True),
            # mid-pattern '*' with anchor
            ("/a/x/end", ["/a/*/end$"], [], False),
            ("/a/x/end/more", ["/a/*/end$"], [], True),
            # Allow wildcard beats shorter Disallow (specificity=len)
            ("/dir/page.html", ["/dir/"], ["/dir/*.html"], True),
            # regex metachars in values are literal, not operators
            ("/price(usd)", ["/price(usd)"], [], False),
            ("/priceusd", ["/price(usd)"], [], True),
            ("/a+b", ["/a+b"], [], False),
            ("/ab", ["/a+b"], [], True),
        ]
        rows = [(p,) for p, _, _, _ in cases]
        df = spark.createDataFrame(rows, "path string")
        for i, (p, dis, allow, want) in enumerate(cases):
            got = df.filter(F.col("path") == p).select(robots_allows(
                F.col("path"),
                F.array(*[F.lit(d) for d in dis]) if dis else
                F.array().cast("array<string>"),
                F.array(*[F.lit(a) for a in allow]) if allow else
                F.array().cast("array<string>")).alias("ok")) \
                .first()["ok"]
            assert got == want, (p, dis, allow, want, got)

    def test_tie_goes_to_allow(self, spark):
        from crawlspark.politeness import robots_allows

        df = spark.createDataFrame([("/p/x",)], "path string")
        ok = df.select(robots_allows(
            F.col("path"), F.array(F.lit("/p/")),
            F.array(F.lit("/p/"))).alias("ok")).first()["ok"]
        assert ok  # equal length: least restrictive

    def test_parsed_robots_drive_the_scheduler(self, spark):
        """End-to-end: raw robots.txt -> parse -> schedule. The Allow
        carve-out survives the gate; the Disallow blocks; Crawl-delay
        sets the slot spacing."""
        from crawlspark import politeness as P

        robots = P.parse_robots_txt(spark.createDataFrame(
            [("a.vn", self.ROBOTS)], "host string, robots_txt string"),
            "crawlspark")
        fr = spark.createDataFrame(
            [(f"https://a.vn{p}", "a.vn", 0, 1, 0, i, 1.0, "pending", 0)
             for i, p in enumerate(
                 ["/private/jobs/1", "/private/x", "/ok"])],
            "url string, host string, depth int, wave int, page int, "
            "rank int, priority double, state string, attempts int")
        out = {r.url.split("a.vn")[1]: r.state
               for r in P.schedule(fr, robots, "2026-01-01").collect()}
        assert out == {"/private/jobs/1": "scheduled",
                       "/private/x": "disallowed", "/ok": "scheduled"}


class TestTwoPhase:
    """The mega-host mitigation (schedule(two_phase=True)): exact
    equivalence with the single-window form, and bounded per-task sort
    input for a host holding a huge backlog."""

    def _robots(self, spark):
        return spark.createDataFrame(
            [("mega.vn", 1000, ["/private-"], 7),
             ("small.vn", 3000, None, 100)],
            "host string, crawl_delay_ms int, "
            "disallow_prefixes array<string>, tokens_per_wave int")

    def test_exact_equivalence_with_single_window(self, spark):
        import random

        rng = random.Random(7)
        rows = []
        for i in range(4000):                       # zipf-ish skew
            host = "mega.vn" if i % 10 else "small.vn"
            pref = "/private-" if rng.random() < 0.08 else "/jobs/"
            rows.append((f"https://{host}{pref}{i}", host, "s", str(i),
                         None, rng.randint(0, 1), rng.randint(0, 3),
                         rng.randint(0, 9), rng.randint(0, 999),
                         rng.random(), "pending", 0))
        fr = _frontier(spark, rows).repartition(16)  # many source splits
        robots = self._robots(spark)
        one = politeness.schedule(fr, robots, "2026-01-01").collect()
        two = politeness.schedule(fr, robots, "2026-01-01",
                                  two_phase=True).collect()

        def sched_set(res):
            return {(r.url, r.slot, str(r.scheduled_ts)) for r in res
                    if r.state == "scheduled"}

        def state_sets(res):
            out = {}
            for r in res:
                out.setdefault(r.state, set()).add(r.url)
            return out

        assert sched_set(one) == sched_set(two)
        assert state_sets(one) == state_sets(two)
        assert len(one) == len(two) == len(rows)

    def test_mega_host_bounded_task_input(self, spark):
        """1e6 pending rows on ONE host: phase 1 must split the sort
        across source partitions (window keyed by spark_partition_id)
        and phase 2 must see at most tokens x n_partitions survivors."""
        n = 1_000_000
        fr = (spark.range(n)
              .select(F.concat(F.lit("https://mega.vn/jobs/"), F.col("id"))
                      .alias("url"),
                      F.lit("mega.vn").alias("host"), F.lit("s").alias("source"),
                      F.col("id").cast("string").alias("id"),
                      F.lit(None).cast("string").alias("last_updated_on"),
                      F.lit(1).alias("depth"), F.lit(0).alias("wave"),
                      F.lit(0).alias("page"),
                      (F.col("id") % 100000).cast("int").alias("rank"),
                      F.lit(0.0).alias("priority"),
                      F.lit("pending").alias("state"), F.lit(0).alias("attempts"))
              .repartition(32))
        robots = self._robots(spark)
        out = politeness.schedule(fr, robots, "2026-01-01", two_phase=True)
        # the plan's phase-1 window partitions by SPARK_PARTITION_ID —
        # that is the bounded-task-input guarantee (each sort task holds
        # one source partition's share of the mega host, ~n/32 rows)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SPARK_PARTITION_ID" in plan.upper()
        agg = {r["state"]: r["n"] for r in
               out.groupBy("state").agg(F.count("*").alias("n")).collect()}
        assert agg["scheduled"] == 7                   # the budget
        assert agg["deferred"] == n - 7
        # FIFO head: rank asc, then url — rank 0 ids are 0,100000,...
        top = {r.url for r in out.filter(F.col("state") == "scheduled")
               .collect()}
        assert "https://mega.vn/jobs/0" in top
