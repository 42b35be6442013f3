"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship web-text pipeline over /root/testdata/sf0.001 —
document quality/langid/token stats + exact-dedup winners + minhash
signature join (the training-data path of the crawlspark engine).

queries()/oracle_sql(): one entry per implemented operator from
SURVEY.md §2 (see crawlspark/queries.py for the operator citations);
SQL-expressible ops carry a DuckDB oracle, pandas-UDF/approximate ops
are rows-only.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: norm-text search + dedup + quality + language +
    minhash over documents. The full-text filter goes through the
    reference's ES vietnamese_analyzer equivalence (lowercase +
    asciifolding norm column, Q4 — indexer/elasticsearch.go:163-170),
    so 'Kỹ Sư Spark' and 'ky su spark' hit the same rows."""
    from crawlspark import textops as X

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    norm = X.norm_text(F.col("text"))
    stats = docs.select(
        "doc_id", "lang", "source",
        X.token_count(F.col("text")).cast("long").alias("n_tokens"),
        X.quality_score(F.col("text")).alias("quality"),
        X.lang_id(F.col("text")).alias("pred_lang"),
        X.doc_fingerprint(F.col("text")).alias("fingerprint"),
        norm.contains(X.norm_text(F.lit("Spárk"))).alias("matches_spark"),
    )
    sig = X.minhash_signature(docs, num_perm=4)
    dup_groups = X.exact_dup_groups(docs).select(
        F.col("keep_id").alias("doc_id"), F.col("n_dups"))
    return (stats.join(sig, "doc_id", "left")
            .join(dup_groups, "doc_id", "left")
            .na.fill({"n_dups": 1})
            .filter(F.col("n_tokens") > 0)
            .orderBy("doc_id"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from crawlspark.queries import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from crawlspark.queries import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql}
