"""Dedup / membership / change detection (SURVEY §2.3 — the engine's heart).

Re-expresses the reference's Redis-keyed state machine
(internal/common/dedup/deduplicator.go) as joins over a salted,
snapshot-committed ``seen`` table, plus a partitioned bloom-filter fast
path and simhash near-dup detection (north_rule upgrades).

Scale design (10^10-URL frontier):
- The per-job Redis round-trip (deduplicator.go:49-67, the reference's
  scalability ceiling) becomes ONE shuffle: candidates LEFT JOIN seen
  on (source, id).
- ``seen`` is salted by xxhash64(host) % n_salts so one hot domain
  (Zipf top host owns ~30% of URLs) spreads over n_salts buckets in
  the membership layer; politeness grouping stays keyed by TRUE host
  (frontier.py) — salting only where skew hurts, never where semantics
  need the real key.
- Bloom fast path: per-salt blooms built distributively with
  applyInPandas, updated INCREMENTALLY per wave (build from the wave's
  delta at fixed capacity, OR-merge into the stored bloom table —
  O(delta + n_salts) per wave), and probed via COGROUP on salt so each
  probe task deserializes only its own salt's bits. At 10^10 keys and
  10 bits/key that is ~12.5 GB total across 256 salts => ~50 MB per
  salt bucket per task — never collected to the driver, never shipped
  whole to any executor.
- TTL without Redis: lazy expiry — reads filter expires_at >= now;
  a compaction wave physically drops expired rows (same observable
  semantics as Redis per-key TTL, deduplicator.go:76-84) and rebuilds
  blooms from the surviving keys (resizing m if the capacity estimate
  drifted).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_SALTS = 16

STATUS_NEW = "NEW"
STATUS_UPDATED = "UPDATED"
STATUS_UNCHANGED = "UNCHANGED"


def salt_of(host: Column, n_salts: int = N_SALTS) -> Column:
    """Membership-layer salt (north_rule): xxhash64(host) % n_salts."""
    return F.pmod(F.xxhash64(host), F.lit(n_salts)).cast("int")


def url_hash(source: Column, id_: Column) -> Column:
    """64-bit key hash of the reference's Redis key
    '{prefix}:{source}:{id}' (deduplicator.go:123-125)."""
    return F.xxhash64(F.concat_ws(":", source, id_))


def seen_live(seen: DataFrame, now: Column | None = None) -> DataFrame:
    """Lazy TTL expiry: rows past expires_at read as unseen
    (Redis TTL equivalence, deduplicator.go:76-84)."""
    now = F.current_timestamp() if now is None else now
    return seen.filter(F.col("expires_at").isNull() | (F.col("expires_at") > now))


def classify(candidates: DataFrame, seen: DataFrame,
             now: Column | None = None, broadcast: bool = True) -> DataFrame:
    """D1 three-way change detection (deduplicator.go:49-67):
    missing -> NEW; stored != last_updated_on -> UPDATED; else UNCHANGED.

    candidates: needs (source, id, last_updated_on). Adds ``status``.

    SHUFFLE SHAPE (the 100 TB invariant): candidates is the wave-
    bounded side, seen is the 10^10-key state side. A plain left join
    would hash-exchange the ENTIRE seen table every wave. Instead the
    left join is decomposed so seen only ever STREAMS (column-pruned
    scan, zero exchange):
      hit_vals = seen ⋈ broadcast(candidate KEYS)   (inner, streamed)
      hits = candidates ⋈ broadcast(hit_vals)        (status compare)
      news = candidates ▷ broadcast(hit_vals keys)   (anti)
    Only (source, id[, last_updated_on]) triples are ever broadcast —
    never full candidate rows (a list-heavy wave's payload columns
    would press the 8 GB broadcast hard limit; ADVICE r3) — and the
    candidate frame itself never shuffles either. Seen is scanned
    once per materializing branch, but pruned columnar scans beat a
    full-table shuffle write+read at any scale where seen >> wave.

    broadcast=False is the escape hatch for a wave whose KEY SET
    alone outgrows the driver: one plain left join (both sides
    hash-exchange; seen pays a full shuffle) with identical output —
    degradation, not failure.

    NULL semantics match the reference's Redis string compare: presence
    is the inner-join match itself (a stored NULL value is still
    *seen*), and value comparison is null-safe — candidate NULL vs
    stored non-NULL (or vice versa) is UPDATED, NULL vs NULL is
    UNCHANGED (deduplicator.go:60-66: the Redis GET distinguishes
    key-missing from empty-value).
    """
    out_cols = list(candidates.columns) + ["status"]
    s = (seen_live(seen, now)
         .select("source", "id", F.col("last_updated_on").alias("_seen_val")))
    if not broadcast:
        joined = candidates.join(
            s.withColumn("_seen", F.lit(True)), ["source", "id"], "left")
        return joined.withColumn(
            "status",
            F.when(F.col("_seen").isNull(), F.lit(STATUS_NEW))
            .when(~F.col("_seen_val").eqNullSafe(F.col("last_updated_on")),
                  F.lit(STATUS_UPDATED))
            .otherwise(F.lit(STATUS_UNCHANGED))).select(*out_cols)
    # distinct: duplicate candidate keys must not fan out the
    # candidates ⋈ hit_vals join (seen is unique per key, so distinct
    # keys keep hit_vals at <=1 row per key)
    keys = candidates.select("source", "id").distinct()
    hit_vals = s.join(F.broadcast(keys), ["source", "id"], "inner")
    hits = (candidates.join(F.broadcast(hit_vals), ["source", "id"], "inner")
            .withColumn(
                "status",
                F.when(~F.col("_seen_val").eqNullSafe(F.col("last_updated_on")),
                       F.lit(STATUS_UPDATED))
                .otherwise(F.lit(STATUS_UNCHANGED)))
            .select(*out_cols))
    news = (candidates
            .join(F.broadcast(hit_vals.select("source", "id")),
                  ["source", "id"], "left_anti")
            .withColumn("status", F.lit(STATUS_NEW))
            .select(*out_cols))
    return hits.unionByName(news)


def expires_at_expr(expired_on: Column, now: Column | None = None,
                    default_ttl_days: int = 30) -> Column:
    """D2 TTL arithmetic (deduplicator.go:72-89): ttl = until(expired_on);
    if <= 0 use default 30d; then +24h buffer."""
    now = F.current_timestamp() if now is None else now
    base = F.when(expired_on > now, expired_on).otherwise(
        now + F.make_interval(days=F.lit(default_ttl_days)))
    return base + F.make_interval(days=F.lit(1))


def seen_delta(emitted: DataFrame, now: Column | None = None,
               default_ttl_days: int = 30,
               n_salts: int = N_SALTS) -> DataFrame:
    """D2 MarkSeenWithTTL, delta form: emit ONLY the wave's new/updated
    seen rows (O(delta) — never touches the stored seen table). The
    MERGE semantics (last-write-wins on (source,id), the Redis SET of
    deduplicator.go:69-89) resolve at read time via the driver's
    seen_view window + periodic compaction — the Iceberg
    merge-on-read analogue.

    emitted: (source, id, host, last_updated_on[, expired_on timestamp]).
    """
    cols = ["source", "id", "url_hash", "last_updated_on", "expires_at", "salt"]
    exp = F.col("expired_on") if "expired_on" in emitted.columns \
        else F.lit(None).cast("timestamp")
    return emitted.select(
        "source", "id",
        url_hash(F.col("source"), F.col("id")).alias("url_hash"),
        F.col("last_updated_on"),
        expires_at_expr(exp, now, default_ttl_days).alias("expires_at"),
        salt_of(F.col("host"), n_salts).alias("salt"),
    ).select(*cols)


def mark_seen(seen: DataFrame, emitted: DataFrame,
              now: Column | None = None, default_ttl_days: int = 30,
              n_salts: int = N_SALTS) -> DataFrame:
    """Eager MERGE form of seen_delta (anti-join + union) — API
    convenience for bounded states; the wave driver uses seen_delta +
    read-side resolution so per-wave cost never scales with the total
    seen-set size."""
    cols = ["source", "id", "url_hash", "last_updated_on", "expires_at", "salt"]
    new_rows = seen_delta(emitted, now, default_ttl_days, n_salts)
    kept = seen.join(new_rows.select("source", "id"), ["source", "id"], "left_anti")
    return kept.select(*cols).unionByName(new_rows.select(*cols))


def content_hash(col: Column) -> Column:
    """D4 (deduplicator.go:127-130): sha256, first 16 bytes as 32 hex chars.
    Built-in — no UDF."""
    return F.substring(F.sha2(col, 256), 1, 32)


def exact_dedup(df: DataFrame, text_col: str = "text",
                key_col: str = "url") -> DataFrame:
    """Content-hash exact dedup: keep the minimum-key row per content
    hash (deterministic winner), one hash-aggregate shuffle."""
    h = content_hash(F.col(text_col)).alias("_chash")
    winners = (df.select(h, F.col(key_col).alias("_k"))
                 .groupBy("_chash").agg(F.min("_k").alias(key_col)))
    return df.join(winners, key_col, "left_semi")


# ---------------------------------------------------------------------------
# Bloom fast path (D1 pre-filter)
# ---------------------------------------------------------------------------
def bloom_params(n: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m bits, k hashes) for n keys at target false-positive rate."""
    n = max(n, 1)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, (m + 63) // 64 * 64)
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def _bloom_positions(hashes: np.ndarray, m: int, k: int) -> np.ndarray:
    """k positions per key via double hashing h1 + i*h2 (Kirsch-
    Mitzenmacher); vectorized, deterministic."""
    h = hashes.astype(np.uint64)
    h1 = h
    h2 = (h ^ (h >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD) & np.uint64(0xFFFFFFFFFFFFFFFF)
    h2 = h2 | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(m)).astype(np.int64)


BLOOM_SCHEMA = "salt int, m long, k int, bits binary, n_keys long"


def build_blooms(seen: DataFrame, fpp: float = 0.01,
                 capacity_per_salt: int | None = None) -> DataFrame:
    """Build one bloom per salt bucket, distributively
    (groupBy(salt).applyInPandas). Returns a Spark DataFrame
    (salt, m, k, bits, n_keys) — never collected to the driver; the
    probe side cogroups on salt so each task touches exactly one salt's
    bits (the 10^10-key design point is ~50 MB per salt bucket, which
    must not be closure-shipped or broadcast in aggregate).

    capacity_per_salt fixes m/k for the stated key capacity so blooms
    built from per-wave DELTAS can be OR-merged into the stored blooms
    (merge_blooms) — the incremental path. Without it, m is sized from
    the batch itself (one-shot builds)."""
    if capacity_per_salt is not None:
        m_fixed, k_fixed = bloom_params(capacity_per_salt, fpp)
    else:
        m_fixed = k_fixed = None

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        hashes = pdf["url_hash"].to_numpy()
        if m_fixed is not None:
            m, k = m_fixed, k_fixed
        else:
            m, k = bloom_params(len(hashes), fpp)
        bits = np.zeros(m // 64, dtype=np.uint64)
        pos = _bloom_positions(hashes, m, k).ravel()
        np.bitwise_or.at(bits, pos // 64, np.uint64(1) << (pos % 64).astype(np.uint64))
        return pd.DataFrame({"salt": [int(pdf["salt"].iloc[0])], "m": [m],
                             "k": [k], "bits": [bits.tobytes()],
                             "n_keys": [len(hashes)]})

    return (seen.select("salt", "url_hash")
            .groupBy("salt")
            .applyInPandas(build, schema=BLOOM_SCHEMA))


def merge_blooms(prev: DataFrame, delta: DataFrame) -> DataFrame:
    """OR-merge two bloom tables built at the SAME capacity (same m/k
    per salt): per-salt bitwise OR — O(n_salts) rows per wave, never
    O(total keys). Salts present on only one side pass through."""
    both = (prev.select("salt", "m", "k", "bits", "n_keys")
            .unionByName(delta.select("salt", "m", "k", "bits", "n_keys")))

    def orr(pdf: pd.DataFrame) -> pd.DataFrame:
        ms = pdf["m"].unique()
        if len(ms) != 1:
            raise ValueError(
                f"bloom m mismatch in salt {pdf['salt'].iloc[0]}: {ms}; "
                "rebuild blooms at one capacity (compaction) before merging")
        acc = np.zeros(int(ms[0]) // 64, dtype=np.uint64)
        for b in pdf["bits"]:
            acc |= np.frombuffer(b, dtype=np.uint64)
        return pd.DataFrame({"salt": [int(pdf["salt"].iloc[0])],
                             "m": [int(pdf["m"].iloc[0])],
                             "k": [int(pdf["k"].iloc[0])],
                             "bits": [acc.tobytes()],
                             "n_keys": [int(pdf["n_keys"].sum())]})

    return both.groupBy("salt").applyInPandas(orr, schema=BLOOM_SCHEMA)


def bloom_might_contain(candidates: DataFrame, blooms: DataFrame,
                        hash_col: str = "url_hash",
                        salt_col: str = "salt") -> DataFrame:
    """Adds ``might_contain`` (false => definitively NEW, skip the join).

    Distribution: candidates COGROUP blooms on salt — each task
    deserializes ONLY its salt's bit array (never the full bloom set;
    no driver collect, no closure capture). The salt shuffle of the
    candidate metadata is one the classify join pays anyway."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields
    ) + ", might_contain boolean"

    def probe(cand: pd.DataFrame, bl: pd.DataFrame) -> pd.DataFrame:
        if cand.empty:
            return cand.assign(might_contain=pd.Series([], dtype=bool))
        if bl.empty:
            return cand.assign(might_contain=False)  # empty bucket: all new
        bits = np.frombuffer(bl["bits"].iloc[0], dtype=np.uint64)
        m, k = int(bl["m"].iloc[0]), int(bl["k"].iloc[0])
        pos = _bloom_positions(cand[hash_col].to_numpy().astype(np.uint64), m, k)
        hit = np.ones(len(cand), dtype=bool)
        for row in pos:
            hit &= (bits[row // 64] >> (row % 64).astype(np.uint64)) & np.uint64(1) != 0
        return cand.assign(might_contain=hit)

    return (candidates.groupBy(salt_col)
            .cogroup(blooms.groupBy("salt"))
            .applyInPandas(probe, schema=out_schema))


def classify_with_bloom(candidates: DataFrame, seen: DataFrame,
                        blooms: DataFrame, now: Column | None = None,
                        n_salts: int = N_SALTS,
                        cache: bool = False) -> DataFrame:
    """D1 with the bloom pre-filter: bloom misses short-circuit to NEW
    without joining; only possible hits stream into the seen join.
    n_salts MUST match the salt modulus the seen/bloom tables were
    built with (threaded from the driver, not defaulted silently).

    cache=True persists the bloom-probed candidate frame: the probed
    subtree (cogroup Python stage + salt shuffle) is consumed by the
    misses branch AND twice inside classify's decomposition, and a
    broadcast build cannot be reused as a streamed input — without the
    cache it would re-run up to three times. The persisted handle is
    attached to the result as ``_bloom_cand`` for the caller to
    unpersist once the result is materialized (the wave driver does)."""
    cand = candidates.withColumn(
        "url_hash", url_hash(F.col("source"), F.col("id"))
    ).withColumn("salt", salt_of(F.col("host"), n_salts))
    cand = bloom_might_contain(cand, blooms)
    if cache:
        cand = cand.persist()
    misses = (cand.filter(~F.col("might_contain"))
                  .withColumn("status", F.lit(STATUS_NEW)))
    hits = classify(cand.filter(F.col("might_contain")), seen, now)
    out = misses.unionByName(hits).drop("might_contain")
    if cache:
        out._bloom_cand = cand
    return out


# ---------------------------------------------------------------------------
# D5 simhash near-dup (north_rule upgrade; reference is exact-hash only)
# ---------------------------------------------------------------------------
def simhash64_py(text: str | None) -> int:
    """64-bit simhash: whitespace-tokenize lower(text); per-token 64-bit
    hash = first 16 hex chars of md5 (md5 chosen so the DuckDB oracle
    can reproduce it in SQL); signed bit-vote; sign -> bits.
    Returns a signed int64 (Spark LongType)."""
    import hashlib

    if not text:
        return 0
    tokens = text.lower().split()
    if not tokens:
        return 0
    votes = np.zeros(64, dtype=np.int64)
    for t in tokens:
        h = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:16], 16)
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        votes += np.where(bits == 1, 1, -1)
    v = int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
    return v - (1 << 64) if v >= (1 << 63) else v


_simhash_udf = None


def simhash_udf():
    global _simhash_udf
    if _simhash_udf is None:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def simhash64(texts: pd.Series) -> pd.Series:
            return pd.Series([simhash64_py(t) for t in texts], dtype="int64")

        _simhash_udf = simhash64
    return _simhash_udf


def simhash64_expr(text_col) -> "F.Column":
    """Per-ROW md5 bit-vote simhash as one JVM Column expression —
    bit-for-bit equal to simhash64_py (pinned in tests/test_dedup.py
    and by the DuckDB oracle queries.SQL_DOC_SIMHASH).

    Shape: tokenize -> transform(md5) -> fold a 64-long bit-counter
    array (aggregate + zip_with over each token's little-endian binary
    string) -> sign bits reassembled into a signed long (bit 63
    contributes LONG_MIN; ties vote 0, as votes>0 in the pUDF).

    Why a higher-order-function projection and not the round-4
    explode + 64-sum groupBy (measured anti-result, sf0.1 5k docs /
    256k tokens, local[32]): the 65-buffer HashAggregate generated a
    huge Janino compile — COLD 9.1 s vs 2.3 s warm, and the driver
    always times queries cold — and needed a key shuffle plus a
    multiplicity join-back. This form is a narrow projection: no
    shuffle, no Python stage, tiny codegen (HOF lambdas evaluate as
    interpreted expressions inside the stage), and measured 2.2 s
    cold / 1.1 s warm on the same input. It also composes anywhere a
    Column does (streaming projections, withColumn chains) with no
    aggregation state.

    Implementation notes:
    - conv(hex16, 16, 2) treats the 16-hex-char token hash as
      UNSIGNED 64-bit (Spark conv semantics), so no signed-overflow
      split into hi/lo halves is needed.
    - split(reversed_bits, "") yields a trailing "" element in Spark;
      slice(..., 1, 64) pins exactly 64 chars — zip_with would
      otherwise null-pad the 64-counter accumulator and poison sums.
    - tokenize = split(lower(text), '\\s+') with empties filtered;
      Python str.split() splits on Unicode whitespace, Java regex \\s
      is ASCII-only — identical on the ASCII corpus and both test- and
      oracle-pinned.
    - empty/null text: zero tokens -> all counters 0, n = 0, so every
      sign bit is 0 and sh = 0, matching simhash64_py('') == 0.
    - 2^i for i <= 62 via pow(2.0, i).cast(long): exact (powers of
      two are exact doubles); computed once per DOC, not per token.
    """
    txt = F.lower(F.coalesce(text_col, F.lit("")))
    toks = F.filter(F.split(txt, r"\s+"), lambda x: x != F.lit(""))
    md5s = F.transform(toks, lambda t: F.md5(t))
    bits_of = lambda h: F.slice(
        F.split(F.reverse(F.lpad(F.conv(F.substring(h, 1, 16), 16, 2),
                                 64, "0")), ""), 1, 64)
    zero = F.array_repeat(F.lit(0).cast("long"), 64)
    ones = F.aggregate(
        md5s, zero,
        lambda acc, h: F.zip_with(acc, bits_of(h),
                                  lambda a, c: a + F.when(c == "1", 1)
                                  .otherwise(0)))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.lit(63))
    terms = F.zip_with(ones, idx, lambda o, i:
                       F.when(o * 2 > n,
                              F.when(i == 63, F.lit(-(1 << 63)).cast("long"))
                              .otherwise(F.pow(F.lit(2.0), i.cast("double"))
                                         .cast("long")))
                       .otherwise(F.lit(0).cast("long")))
    return F.aggregate(terms, F.lit(0).cast("long"), lambda a, x: a + x)


def simhash64_frame(df: DataFrame, text_col: str = "text",
                    key_col: str = "url") -> DataFrame:
    """(key, sh) via simhash64_expr — a pure zero-shuffle projection,
    so input multiplicity is preserved natively (every row hashes its
    own text; no grouped collapse, no join-back). simhash_udf remains
    the cross-checked Python twin (C-backed md5 — measured faster on a
    single node, but it puts an Arrow/Python stage in the plan)."""
    return df.select(F.col(key_col).alias("key"),
                     simhash64_expr(F.col(text_col)).alias("sh"))


def simhash_near_dups(df: DataFrame, text_col: str = "text",
                      key_col: str = "url", bands: int = 4,
                      max_hamming: int = 3) -> DataFrame:
    """Banded simhash near-dup pairs: split the 64-bit simhash into
    `bands` 16-bit bands; candidate pairs share >=1 band (pigeonhole:
    hamming<=3 over 4 bands guarantees one identical band); verify
    hamming distance on the full hash. Returns (key_a, key_b, hamming).

    Scale: the groupBy(band, band_val) shuffle is the only wide op;
    intra-bucket pairing is bounded by bucket size (hot buckets can be
    additionally length-salted upstream if text duplication is extreme).
    """
    base = (simhash64_frame(df, text_col, key_col)
            .withColumnRenamed("key", "k"))
    return _banded_pairs(base, bands, max_hamming)


def _banded_pairs(base: DataFrame, bands: int, max_hamming: int) -> DataFrame:
    """Banded self-join over a (k, sh) frame -> (key_a, key_b, hamming)."""
    band_width = 64 // bands
    mask = (1 << band_width) - 1
    bands_df = base.select(
        "k", "sh",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.shiftright(F.col("sh"), b * band_width)
                     .bitwiseAND(F.lit(mask)).alias("val"))
            for b in range(bands)
        ])).alias("bv"),
    ).select("k", "sh", "bv.band", "bv.val")
    a = bands_df.alias("a")
    b = bands_df.alias("b")
    pairs = (a.join(b, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.val") == F.col("b.val"))
                    & (F.col("a.k") < F.col("b.k")))
             .select(F.col("a.k").alias("key_a"), F.col("b.k").alias("key_b"),
                     F.col("a.sh").alias("sh_a"), F.col("b.sh").alias("sh_b"))
             .distinct())
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (pairs.withColumn("hamming", hamming)
                 .filter(F.col("hamming") <= max_hamming)
                 .select("key_a", "key_b", "hamming"))


def dup_clusters(nodes: DataFrame, pairs: DataFrame,
                 max_iter: int = 25) -> DataFrame:
    """Connected components over near-dup pairs — the step that turns
    pairwise LSH/simhash hits into KEEP-ONE-PER-CLUSTER decisions (a
    reference dedup pass keeps the minimum key of each component;
    reference parity: the crawler's exact-hash dedup is the 1-edge
    special case of this, deduplicator.go:39-67).

    nodes: one column `key` (every document, so singletons label
    themselves); pairs: (key_a, key_b), undirected. Returns
    (key, cluster) where cluster = the minimum key reachable.

    Iterative min-label propagation: each round every node takes the
    min of its own label and its neighbors' labels — one grouped min
    over the edge list + one join, O(E) exchange per round, rounds =
    component diameter. Near-dup graphs are overwhelmingly tiny
    star/clique components (diameter 1-2), so this converges in 2-4
    rounds; a corpus with adversarially long chains would swap this
    loop's body for large-star/small-star alternation (Kiveris et
    al., 'Connected Components in MapReduce and Beyond'), which uses
    the same per-round primitives. Convergence is checked exactly (no
    label changed); every round persists its labels and unpersists
    the previous so lineage stays bounded."""
    # Symmetrize via ONE explode, not a self-union: the union form
    # references `pairs` twice and the pair source is typically itself
    # an expensive banded-join pipeline — each reference re-runs it
    # (the same multi-reference trap measured on the LSH verify, r4).
    # Persisted because every round's neighbor-min re-reads the edges.
    edges = (pairs.select(F.explode(F.array(
        F.struct(F.col("key_a").alias("a"), F.col("key_b").alias("b")),
        F.struct(F.col("key_b").alias("a"), F.col("key_a").alias("b"))))
        .alias("e"))
        .select("e.a", "e.b").distinct().persist())
    # r6: fold the FIRST propagation step into initialization. With
    # labels(0) = key, round one's neighbor-min is just min(neighbor
    # key) — computable directly from the edge list with no staged
    # frame, no convergence action. Star/clique components (the
    # overwhelming near-dup shape) then converge inside the loop's
    # FIRST confirmation pass instead of its second, saving one full
    # round of jobs; the fixpoint is unchanged (min-label propagation
    # reaches the same labels from any intermediate state of the
    # propagation lattice).
    nbr0 = edges.groupBy("a").agg(F.min("b").alias("nlbl"))
    labels = (nodes.join(nbr0, nodes["key"] == nbr0["a"], "left")
              .select("key",
                      F.least(F.col("key"),
                              F.coalesce(F.col("nlbl"), F.col("key")))
                      .alias("lbl"))
              .persist())
    persisted = labels  # unpersist must hit the EXACT persisted plan
    for _ in range(max_iter):
        nbr = (edges.join(labels, edges["b"] == labels["key"])
               .groupBy("a").agg(F.min("lbl").alias("nlbl")))
        staged = (labels.join(nbr, labels["key"] == nbr["a"], "left")
                  .select(labels["key"],
                          F.least(F.col("lbl"),
                                  F.coalesce(F.col("nlbl"), F.col("lbl")))
                          .alias("_new"),
                          F.col("lbl").alias("_old"))
                  .persist())
        # ONE full-scan aggregate both (a) answers the convergence
        # check and (b) materializes every cached partition of
        # `staged`. The previous filter(...).limit(1).count() could
        # stop after a few partitions, leaving the rest uncached so
        # the NEXT round's join re-ran this round's lineage for them.
        changed = staged.agg(F.sum(
            (F.col("_new") < F.col("_old")).cast("int")).alias("n")
        ).first()["n"] or 0
        persisted.unpersist()
        persisted = staged
        labels = staged.select("key", F.col("_new").alias("lbl"))
        if changed == 0:
            break
    # the final labels are cached; edges only matter again if that
    # cache is evicted (recompute stays correct, just cold)
    edges.unpersist()
    return labels.select("key", F.col("lbl").alias("cluster"))


def simhash_dup_classes(df: DataFrame, text_col: str = "text",
                        key_col: str = "url", bands: int = 4,
                        max_hamming: int = 3
                        ) -> tuple[DataFrame, DataFrame]:
    """D5 under EXTREME duplication — the hot-bucket form.

    simhash_near_dups emits every qualifying pair, which is inherently
    O(g^2) OUTPUT for a group of g byte-identical docs (10k identical
    docs = 50M pairs x 4 bands): no join strategy can bound it, the
    semantics are quadratic. The scale form collapses exact-simhash
    groups to one representative BEFORE banding, so band buckets hold
    DISTINCT hashes only — the mass-duplication hot bucket disappears
    upstream of the pair join, and the banded join's input is bounded
    by the number of distinct simhashes (residual near-identical skew
    is handled by AQE skew-join splitting).

    Returns (classes, rep_pairs):
      classes: (key, rep, group_size) — every doc assigned to its
        exact-dup class (rep = min key of the class);
      rep_pairs: (key_a, key_b, hamming) — near-dup pairs BETWEEN
        class representatives, verified on the full 64-bit hash.
    """
    base = simhash64_frame(df, text_col, key_col)
    w = Window.partitionBy("sh")
    classes = (base.withColumn("rep", F.min("key").over(w))
               .withColumn("group_size", F.count("*").over(w)))
    reps = (classes.filter(F.col("key") == F.col("rep"))
            .select(F.col("key").alias("k"), "sh"))
    rep_pairs = _banded_pairs(reps, bands, max_hamming)
    return classes.select("key", "rep", "group_size"), rep_pairs


def keep_best_per_cluster(labels: DataFrame, scores: DataFrame) -> DataFrame:
    """Cluster-aware retention: given near-dup component labels
    (``labels``: key, cluster — dup_clusters output) and per-doc
    quality (``scores``: key, quality), mark exactly ONE survivor per
    cluster — the highest quality, minimum key on ties. This is the
    decision step every dedup pipeline ends with: the reference keeps
    first-seen (deduplicator.go:39-67 — arrival order IS its quality
    order); a training-data pipeline keeps the best-scored copy.

    Per-cluster argmax via ONE grouped max_by on the (quality, -key)
    struct — partial+final aggregated, so a pathological mega-cluster
    (a boilerplate page duplicated across half the crawl) is combined
    map-side instead of serializing through a single window-sort task
    — then an equi-join back on cluster. (quality, -key) is a total
    order, so the winner is deterministic at any parallelism."""
    j = (labels.join(scores, "key")
         .select("key", "cluster", "quality"))
    winners = (j.groupBy("cluster")
               .agg(F.max_by(
                   "key", F.struct(F.col("quality"),
                                   (-F.col("key")).alias("_nk")))
                   .alias("_best")))
    return (j.join(winners, "cluster")
            .select("key", "cluster", "quality",
                    (F.col("key") == F.col("_best")).alias("kept")))
