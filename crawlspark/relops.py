"""Relational operators Spark's DataFrame API lacks as primitives.

The reference engine never needs these (its queries are single-table
scans over Elasticsearch/Postgres — reference internal/common/
indexer/elasticsearch.go, internal/common/indexer/postgres.go), but an analytics
engine over the same crawled corpus does: "what was the last list-page
fetch before this detail fetch" is an as-of join, and frontier
priority's host-rank term (BASELINE north_star: depth x host-rank x
recrawl-age) needs an iterative rank over the link graph. Both are
expressed as compositions of built-in DataFrame ops — one shuffle per
logical step, no cartesian range join, no driver-side row loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str,
              suffix: str = "_r") -> DataFrame:
    """Backward-inclusive as-of join: each left row picks the right
    row with the greatest ``right_ts`` <= its ``left_ts`` within the
    same ``on`` key (pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
    semantics; kdb's ``aj``). Left rows with no prior right row keep
    NULL payload columns.

    Spark has no asof primitive; the naive encodings are a range
    theta-join (O(n*m) per key — a cartesian blow-up Catalyst cannot
    avoid) or a groupBy().applyInPandas merge_asof (a Python stage).
    This is instead the union trick: interleave both sides on
    (key, ts, side-tag), one window sort per key, and carry the last
    non-null right payload forward — a single hash shuffle on the key
    and a per-key sort, all JVM-side.

    Ties: a right row AT the left row's timestamp matches (tag orders
    right before left at equal ts). (key, right_ts) must be unique —
    pre-aggregate the right side (e.g. max_by) if it is not; with
    duplicates the LAST in the engine's sort order would win
    nondeterministically.

    Scale note (10^10 rows): ONE exchange on the key for both inputs
    combined, then a per-key sort — the same shape and skew profile as
    sessionization (a mega-key lands in one sort task; AQE skew split
    applies because the sort is windowed, not grouped). The right
    payload travels as ONE struct column, so the carry-forward
    last(ignorenulls) scans a single value slot regardless of payload
    width.
    """
    rpay_fields = [c for c in right.columns if c not in (on, right_ts)]
    r = right.select(
        F.col(on), F.col(right_ts).alias("_ts"), F.lit(0).alias("_tag"),
        F.struct(*[F.col(c) for c in rpay_fields]).alias("_rpay"),
    )
    rpay_type = r.schema["_rpay"].dataType

    lpay_fields = [c for c in left.columns if c != on]
    l = left.select(
        F.col(on), F.col(left_ts).alias("_ts"), F.lit(1).alias("_tag"),
        F.struct(*[F.col(c) for c in lpay_fields]).alias("_lpay"),
        F.lit(None).cast(rpay_type).alias("_rpay"),
    )
    lpay_type = l.schema["_lpay"].dataType
    r = r.select(F.col(on), "_ts", "_tag",
                 F.lit(None).cast(lpay_type).alias("_lpay"), "_rpay")

    w = (Window.partitionBy(on).orderBy("_ts", "_tag")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (l.unionByName(r)
               .withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
               .filter(F.col("_tag") == 1))
    out_cols = [F.col(on)] \
        + [F.col(f"_lpay.{c}").alias(c) for c in lpay_fields] \
        + [F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in rpay_fields]
    return matched.select(*out_cols)


def entity_rank(edges: DataFrame, iters: int = 5,
                damping: float = 0.85) -> DataFrame:
    """Fixed-iteration PageRank over an edge list (src, dst) — the
    host-rank term of the reference frontier's priority
    (BASELINE north_star: priority = depth x host-rank x recrawl-age;
    the reference hard-codes per-site behaviour via its static module
    config, internal/config/config.go — here rank is computed from
    the graph).

    Every node MUST have outdegree >= 1 (pass an undirected edge list
    — both directions — to guarantee it); dangling-mass redistribution
    would need a per-iteration global scalar, which breaks both the
    pure-DataFrame shape here and the single-recursive-reference SQL
    oracle.

    Shape: the edge list joins its source's outdegree ONCE and is
    persisted; each iteration is join(ranks, on node) -> partial-agg
    sum by dst -> left-anchor on the node list. Node count enters as a
    1-row broadcast cross join, so the whole program is lazy — no
    driver action. Per iteration: one shuffle for the join, one for
    the agg; the rank frame is |V| rows (hosts, not pages — tiny next
    to the corpus). Skew = a hub node's in-edges land in one agg
    bucket, but the sum is partial-agg'd map-side so the hot reducer
    receives pre-combined rows, not raw edges.
    """
    # persisted FIRST: the edge list is referenced four times below
    # (deg, the degree join, and both node-set legs) — when the caller
    # hands an expensive pipeline (a JSON-extraction scan + distinct),
    # every unpersisted reference re-runs it end to end (measured r6:
    # the events pipeline ran 4x per call; LRU-evicted like any cache).
    edges = edges.persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("_deg"))
    # every node appears as a source (the outdegree >= 1 contract
    # above), so the node set IS deg's key set — no second union +
    # distinct pass over the edge list
    nodes = deg.select(F.col("src").alias("node"))
    ncnt = F.broadcast(nodes.agg(F.count("*").cast("double").alias("_n")))
    e = edges.join(deg, "src").persist()
    anchored = nodes.crossJoin(ncnt).persist()

    ranks = anchored.select("node", (F.lit(1.0) / F.col("_n")).alias("rank"))
    for _ in range(iters):
        contrib = (e.join(ranks, e["src"] == ranks["node"])
                   .select(F.col("dst").alias("node"),
                           (F.col("rank") / F.col("_deg")).alias("_c"))
                   .groupBy("node").agg(F.sum("_c").alias("_s")))
        ranks = (anchored.join(contrib, "node", "left")
                 .select("node",
                         ((1.0 - damping) / F.col("_n")
                          + damping * F.coalesce("_s", F.lit(0.0)))
                         .alias("rank")))
    return ranks


def interval_join(points: DataFrame, intervals: DataFrame, on: str,
                  point_ts: str, start_col: str, end_col: str,
                  bucket_us: int = 600_000_000,
                  suffix: str = "_i") -> DataFrame:
    """Range (interval-containment) join: each point row pairs with
    every interval row of the same ``on`` key whose
    [start, end) contains its timestamp — half-open, end exclusive.
    All three time columns are epoch-microsecond longs.

    Spark plans a bare `p.ts >= i.start AND p.ts < i.end` predicate as
    a nested-loop join (per key it is O(points x intervals) — at
    crawl-log scale that is the plan that never finishes). This is the
    standard bucketed decomposition instead: points hash to
    floor(ts / bucket_us); intervals EXPLODE onto every bucket their
    span overlaps; the pair join is then a plain equi-join on
    (key, bucket) with the exact containment predicate as a cheap
    post-filter. Equi-join => hash shuffle + whole-stage codegen, and
    AQE can split skewed buckets.

    Pick ``bucket_us`` near the typical interval length: an interval
    explodes onto span/bucket_us + 1 rows (duplication factor ~2 at
    the default), while points never duplicate — so the blow-up sits
    on the (usually far smaller) interval side.

    Returns point rows + interval payload columns (suffixed); points
    inside k overlapping intervals appear k times — aggregate on the
    interval key downstream for per-interval rollups."""
    b = F.lit(int(bucket_us))
    ipay = [c for c in intervals.columns if c != on]
    iex = intervals.select(
        F.col(on),
        F.explode(F.sequence(F.floor(F.col(start_col) / b),
                             F.floor((F.col(end_col) - 1) / b)))
        .alias("_bkt"),
        F.struct(*[F.col(c) for c in ipay]).alias("_ipay"))
    pex = points.withColumn("_bkt", F.floor(F.col(point_ts) / b))
    j = (pex.join(iex, [on, "_bkt"])
         .filter((F.col(point_ts) >= F.col(f"_ipay.{start_col}"))
                 & (F.col(point_ts) < F.col(f"_ipay.{end_col}"))))
    out = [F.col(c) for c in points.columns] \
        + [F.col(f"_ipay.{c}").alias(f"{c}{suffix}") for c in ipay]
    return j.select(*out)
