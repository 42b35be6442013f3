"""Determinism + shape tests for the synthetic corpus generator."""

import json
import re

import numpy as np
import pandas as pd

from crawlspark import synth
from crawlspark.clean import clean_to_text


def test_deterministic_across_calls():
    a = synth.gen_pages_pandas(200, seed=42)
    b = synth.gen_pages_pandas(200, seed=42)
    pd.testing.assert_frame_equal(a, b)


def test_chunking_invariance():
    """Per-id hashing means chunked generation == monolithic generation."""
    ids = np.arange(1, 101, dtype=np.int64)
    whole = synth.gen_detail_chunk(ids)
    parts = pd.concat([synth.gen_detail_chunk(ids[:50]),
                       synth.gen_detail_chunk(ids[50:])], ignore_index=True)
    pd.testing.assert_frame_equal(whole, parts)


def test_zipf_skew():
    ids = np.arange(1, 20001, dtype=np.int64)
    hosts = synth.assign_hosts(ids, 42)
    top_share = np.bincount(hosts).max() / len(ids)
    assert 0.2 < top_share < 0.4  # FIXTURES.md: top host ~30%


def test_fifo_positions():
    ids = np.arange(1, 1001, dtype=np.int64)
    hosts = synth.assign_hosts(ids, 42)
    page, rank = synth.fifo_positions(ids, hosts)
    # within a host, (page, rank) strictly increases with id
    df = pd.DataFrame({"id": ids, "h": hosts, "p": page, "r": rank})
    for _, g in df.groupby("h"):
        g = g.sort_values("id")
        keys = list(zip(g["p"], g["r"]))
        assert keys == sorted(keys)
        assert g["r"].max() <= synth.PER_PAGE


def test_detail_page_shape():
    df = synth.gen_detail_chunk(np.arange(1, 51, dtype=np.int64))
    row = df.iloc[0]
    html = row["html"].decode("utf-8")
    assert '<link rel="canonical"' in html
    assert "Kinh nghiệm" in html
    m = re.search(r'<script type="application/ld\+json">(.*?)</script>', html, re.S)
    blob = json.loads(m.group(1))
    assert blob["@type"] == "JobPosting"
    # golden text is the oracle clean of the JSON-LD description
    assert row["text"] == clean_to_text(blob["description"])
    assert row["url"].endswith(".html") and "id1.html" in row["url"]


def test_list_pages_carry_items():
    pages = synth.gen_list_chunk(300, seed=42)
    html = pages.iloc[0]["html"].decode("utf-8")
    assert 'class="job-link"' in html
    assert "data-updated=" in html
    # every detail id appears exactly once across all list pages
    all_ids = []
    for h in pages["html"]:
        all_ids += re.findall(r'data-id="(\d+)"', h.decode("utf-8"))
    assert sorted(map(int, all_ids)) == list(range(1, 301))


def test_wave2_semantics():
    """FIXTURES.md §4: ~20% updated, 10% new, rest byte-identical."""
    n = 500
    w1 = synth.gen_pages_pandas(n, wave=1)
    w2 = synth.gen_pages_pandas(n, wave=2)
    d1 = w1[w1["text"] != ""].set_index("url")
    d2 = w2[w2["text"] != ""].set_index("url")
    assert len(d2) == synth.n_total_ids(n)
    common = d1.index.intersection(d2.index)
    assert len(common) == n
    changed = (d1.loc[common, "text"] != d2.loc[common, "text"]).mean()
    assert 0.15 < changed < 0.25
    # unchanged rows byte-identical
    same = d1.loc[common][d1.loc[common, "text"] == d2.loc[common, "text"]]
    pd.testing.assert_frame_equal(
        same[["html", "text"]], d2.loc[same.index][["html", "text"]])


def test_seed_list_and_robots():
    seeds = synth.gen_seed_list(300)
    assert (seeds["depth"] == 0).all()
    assert seeds["url"].str.contains("viec-lam").all()
    robots = synth.gen_robots()
    assert set(robots["crawl_delay_ms"].unique()) <= {1000, 3000, 5000}
    assert (robots["tokens_per_wave"] == 3_600_000 // robots["crawl_delay_ms"]).all()
    ranks = synth.gen_host_rank()
    assert len(ranks) == synth.N_HOSTS
    assert ranks["rank"].between(0, 1).all()


def test_spark_generation_matches_pandas(spark):
    got = (synth.gen_pages_spark(spark, 200, parallelism=4)
           .toPandas().sort_values("url").reset_index(drop=True))
    want = (synth.gen_pages_pandas(200)
            .sort_values("url").reset_index(drop=True))
    assert list(got["url"]) == list(want["url"])
    assert list(got["text"]) == list(want["text"])
    assert [bytes(x) for x in got["html"]] == [bytes(x) for x in want["html"]]
