"""crawlspark — a PySpark-native URL-frontier + fetch-scheduler / extract /
normalize / dedup engine over Iceberg-style tables of Common-Crawl-like
web pages.

Capability parity target: wdfday/job-crawler (see SURVEY.md). This is a
from-scratch Spark-first design: the reference's Redis queues become
snapshot-committed frontier tables, its per-job Redis round-trips become
one shuffle per wave, and its goroutine pools are subsumed by
partitioning. No RDDs, no per-row Python UDFs; vectorized pandas/Arrow
UDFs only where built-in functions cannot express the semantics
(HTML extraction, HTML cleaning, simhash).
"""

__version__ = "0.1.0"
