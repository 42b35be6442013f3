"""WARC build + segment round-trip (crawlspark.warc)."""

import hashlib

import pytest

from crawlspark import warc as W


class TestWarcRoundTrip:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_round_trip_identity(self, spark):
        rows = [(i, f"page {i} body with ünïcode 汉字" * (i % 3 + 1))
                for i in range(100)]
        df = self._df(spark, rows)
        got = {r.rec_id: (r.content_length, r.payload_md5)
               for r in W.parse_warc_chunks(W.build_warc_chunks(df)).collect()}
        assert len(got) == 100
        for i, t in rows:
            b = t.encode("utf-8")
            assert got[i] == (len(b), hashlib.md5(b).hexdigest())

    def test_payload_containing_warc_magic(self, spark):
        # the reason Content-Length-driven parsing exists: a payload
        # that embeds a fake record header must NOT split the record
        evil = ("prefix\r\n\r\nWARC/1.0\r\nWARC-Record-ID: 999\r\n"
                "Content-Length: 3\r\n\r\nxyz\r\n\r\nsuffix")
        df = self._df(spark, [(7, evil), (8, "plain")])
        got = {r.rec_id: r.content_length
               for r in W.parse_warc_chunks(W.build_warc_chunks(df)).collect()}
        assert got == {7: len(evil.encode()), 8: 5}

    def test_empty_payload_and_chunking(self, spark):
        # 70 docs at chunk_docs=32 -> 3 chunks; empty text is a valid
        # 0-length record; None text is excluded (no record to write)
        rows = [(i, "" if i % 10 == 0 else f"t{i}") for i in range(70)]
        rows.append((99, None))
        df = self._df(spark, rows)
        chunks = W.build_warc_chunks(df)
        assert chunks.count() == 3
        parsed = W.parse_warc_chunks(chunks).collect()
        assert len(parsed) == 70
        empties = [r for r in parsed if r.content_length == 0]
        assert len(empties) == 7
        assert empties[0].payload_md5 == hashlib.md5(b"").hexdigest()

    def test_blob_bytes_parallelism_invariant(self, spark):
        rows = [(i, f"body {i}") for i in range(64)]
        a = {r.chunk_id: r.blob for r in
             W.build_warc_chunks(self._df(spark, rows)).collect()}
        b = {r.chunk_id: r.blob for r in
             W.build_warc_chunks(self._df(spark, rows).repartition(11))
             .collect()}
        assert a == b

    def test_malformed_blob_raises(self):
        with pytest.raises(ValueError, match="bad WARC version"):
            W._parse_blob(b"HTTP/1.1 200\r\n\r\n")
        with pytest.raises(ValueError, match="unterminated"):
            W._parse_blob(b"WARC/1.0\r\nContent-Length: 3")
        with pytest.raises(ValueError, match="truncated"):
            W._parse_blob(b"WARC/1.0\r\nWARC-Record-ID: 1\r\n"
                          b"Content-Length: 99\r\n\r\nshort")
