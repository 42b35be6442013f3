"""Codec round-trips for the self-contained multimodal decoders:
PNG (encode/decode incl. non-zero scanline filters), PPM, PCM16 WAV,
the CSV1 video container, and the resize kernel."""

import struct
import zlib

import numpy as np
import pytest

from crawlspark import multimodal as M


class TestPng:
    def test_rgb_roundtrip(self):
        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
        assert np.array_equal(M.decode_png(M.encode_png(px)), px)

    def test_gray_roundtrip(self):
        rng = np.random.default_rng(8)
        px = rng.integers(0, 256, (9, 5), dtype=np.uint8)
        assert np.array_equal(M.decode_png(M.encode_png(px)), px)

    def test_nonzero_filters_decode(self):
        """Hand-build a PNG whose scanlines use filters 1 (Sub),
        2 (Up), 3 (Average) and 4 (Paeth) — the decoder must invert
        each (PNG spec §6)."""
        rng = np.random.default_rng(9)
        px = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
        h, w, ch = px.shape
        stride = w * ch
        flat = px.reshape(h, stride).astype(np.int32)
        lines = []
        for y, f in enumerate((1, 2, 3, 4)):
            cur = flat[y]
            prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int32)
            left = np.concatenate([[0] * ch, cur[:-ch]])
            ul = np.concatenate([[0] * ch, prev[:-ch]]) if y else np.zeros(stride, dtype=np.int32)
            if f == 1:
                enc = (cur - left) % 256
            elif f == 2:
                enc = (cur - prev) % 256
            elif f == 3:
                enc = (cur - (left + prev) // 2) % 256
            else:
                pa = np.abs(prev - ul)
                pb = np.abs(left - ul)
                pc = np.abs(left + prev - 2 * ul)
                pred = np.where((pa <= pb) & (pa <= pc), left,
                                np.where(pb <= pc, prev, ul))
                enc = (cur - pred) % 256
            lines.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        data = (b"\x89PNG\r\n\x1a\n"
                + M._png_chunk(b"IHDR", ihdr)
                + M._png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
                + M._png_chunk(b"IEND", b""))
        assert np.array_equal(M.decode_png(data), px)

    def test_rejects_non_png(self):
        with pytest.raises(ValueError):
            M.decode_png(b"GIF89a....")


class TestOtherCodecs:
    def test_ppm_roundtrip(self):
        rng = np.random.default_rng(10)
        px = rng.integers(0, 256, (7, 11, 3), dtype=np.uint8)
        assert np.array_equal(M.decode_ppm(M.encode_ppm(px)), px)

    def test_wav_roundtrip(self):
        t = np.arange(4000)
        samples = (12000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
        out, rate = M.decode_wav(M.encode_wav(samples, 16000))
        assert rate == 16000
        assert np.array_equal(out, samples)

    def test_video_container_and_sampling(self):
        frames = [np.full((8, 8, 3), k * 20, dtype=np.uint8) for k in range(10)]
        blob = M.encode_video(frames)
        decoded = [M.decode_png(p) for p in M.iter_video_frames(blob)]
        assert len(decoded) == 10
        assert all(np.array_equal(a, b) for a, b in zip(decoded, frames))
        feat, n = M.decode_and_featurize(blob, "video", "video/x-csv1",
                                         frame_stride=4)
        assert n == 3  # frames 0, 4, 8
        assert len(feat) == M.FEATURE_DIM

    def test_resize_nearest(self):
        px = np.arange(64, dtype=np.uint8).reshape(8, 8)
        t = M.resize_nearest(px, 4, 4)
        assert t.shape == (4, 4)
        assert t[0, 0] == px[0, 0] and t[3, 3] == px[6, 6]


class TestFeatures:
    def test_audio_feature_separates_tones(self):
        t = np.arange(8000)
        low = (10000 * np.sin(2 * np.pi * 100 * t / 16000)).astype(np.int16)
        high = (10000 * np.sin(2 * np.pi * 6000 * t / 16000)).astype(np.int16)
        fl = M.audio_feature(low, 16000)
        fh = M.audio_feature(high, 16000)
        # energy concentrates in different FFT bands
        assert np.argmax(fl[2:10]) < np.argmax(fh[2:10])
        # zero-crossing rate much higher for the high tone
        assert fh[1] > fl[1] * 5

    def test_image_feature_reflects_brightness(self):
        dark = np.zeros((16, 16, 3), dtype=np.uint8)
        bright = np.full((16, 16, 3), 250, dtype=np.uint8)
        fd = M.image_feature(dark)
        fb = M.image_feature(bright)
        assert fb[0] > 0.9 and fd[0] < 0.1          # channel means
        assert fd[6] == 1.0 and fb[13] == 1.0       # histogram extremes


class TestSparkPath:
    """The catalog path: gen_media_pandas → createDataFrame(MEDIA_SCHEMA)
    → extract_features. Round 2's media_features row crashed because the
    generator emitted float64 width/height/duration_ms (int+None upcast);
    this pins the full Spark path, not just the codecs."""

    def test_gen_media_dtypes_accepted_by_schema(self, spark):
        pdf = M.gen_media_pandas(12)
        for col in ("width", "height", "duration_ms"):
            assert str(pdf[col].dtype) == "Int32", col
        df = spark.createDataFrame(pdf, schema=M.MEDIA_SCHEMA)
        assert df.count() == 12

    def test_gen_media_rows_raw_tuples(self):
        # The catalog path must NOT depend on pandas dtype preservation:
        # every metadata value is a Python int or None, never numpy/float.
        for row in M.gen_media_rows(12):
            mid, kind, payload, mime, w, h, dur = row
            assert type(mid) is int
            assert payload is None or isinstance(payload, bytes)
            for v in (w, h, dur):
                assert v is None or type(v) is int, row

    def test_media_features_without_arrow(self, spark):
        """Round-3 red row: the driver's harness runs a vanilla session
        (no Arrow), where createDataFrame(pandas) falls back to
        to_records() and coerces Int32→float64. The catalog query must
        survive that exact config."""
        from crawlspark.queries import QUERIES

        key = "spark.sql.execution.arrow.pyspark.enabled"
        prev = spark.conf.get(key)
        spark.conf.set(key, "false")
        try:
            rows = QUERIES["media_features"][0](spark, None).limit(3).collect()
            assert len(rows) == 3
        finally:
            spark.conf.set(key, prev)

    def test_media_features_query_runs(self, spark):
        from crawlspark.queries import QUERIES
        rows = QUERIES["media_features"][0](spark, None).collect()
        assert len(rows) == 120
        kinds = {r.kind for r in rows}
        assert kinds == {"image", "audio", "video"}
        # the catalog row flattens the vector to a %.5f string (r5 —
        # the driver's pandas canonicalization cannot sort list cells);
        # still exactly FEATURE_DIM parseable floats per row
        for r in rows:
            assert r.feature is not None
            assert len([float(x) for x in r.feature.split(",")]) \
                == M.FEATURE_DIM
        # videos sample multiple frames; images exactly one
        by_kind = {k: [r for r in rows if r.kind == k] for k in kinds}
        assert all(r.n_frames == 1 for r in by_kind["image"])
        assert all(r.n_frames > 1 for r in by_kind["video"])


class TestJpeg:
    def _img(self, h=24, w=40):
        gx = np.linspace(0, 255, w)
        gy = np.linspace(0, 255, h).reshape(-1, 1)
        return np.stack([np.tile(gx, (h, 1)), np.tile(gy, (1, w)),
                         np.full((h, w), 128.0)], axis=-1).astype(np.uint8)

    def test_rgb_roundtrip_close(self):
        from crawlspark.jpegc import decode_jpeg, encode_jpeg

        img = self._img()
        dec = decode_jpeg(encode_jpeg(img))
        assert dec.shape == img.shape and dec.dtype == np.uint8
        assert np.abs(dec.astype(float) - img.astype(float)).mean() < 4.0

    def test_gray_roundtrip_close(self):
        from crawlspark.jpegc import decode_jpeg, encode_jpeg

        g = self._img()[..., 0]
        dec = decode_jpeg(encode_jpeg(g))
        assert dec.shape == g.shape
        assert np.abs(dec.astype(float) - g.astype(float)).mean() < 2.0

    def test_odd_dims_pad_and_crop(self):
        from crawlspark.jpegc import decode_jpeg, encode_jpeg

        img = self._img(h=13, w=19)
        assert decode_jpeg(encode_jpeg(img)).shape == (13, 19, 3)

    def test_marker_structure_is_spec_valid(self):
        from crawlspark.jpegc import encode_jpeg

        data = encode_jpeg(self._img())
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        # walk segments up to SOS without desync
        import struct
        pos, seen = 2, []
        while data[pos + 1] != 0xDA:
            assert data[pos] == 0xFF
            seen.append(data[pos + 1])
            (ln,) = struct.unpack(">H", data[pos + 2:pos + 4])
            pos += 2 + ln
        assert 0xC0 in seen and 0xDB in seen and 0xC4 in seen

    def test_420_roundtrip_close(self):
        """4:2:0 — the dominant web-JPEG layout (r4): generic MCU
        interleave + chroma upsampling; odd dims pad to the 16x16 MCU
        and crop back."""
        from crawlspark.jpegc import decode_jpeg, encode_jpeg

        for h, w in ((32, 32), (24, 33), (13, 19)):
            img = self._img(h=h, w=w)
            dec = decode_jpeg(encode_jpeg(img, subsampling="420"))
            assert dec.shape == img.shape and dec.dtype == np.uint8
            err = np.abs(dec.astype(float) - img.astype(float)).mean()
            # chroma halving on a sharp gradient costs more on tiny
            # images (13x19 measures ~6.3); random noise would be ~85
            assert err < 8.0, (h, w, err)

    def test_420_stream_declares_422_style_sampling(self):
        from crawlspark.jpegc import encode_jpeg

        data = encode_jpeg(self._img(), subsampling="420")
        i = data.index(b"\xff\xc0")
        # SOF0 component table: Y sampling byte 0x22, chroma 0x11
        assert data[i + 11] == 0x22 and data[i + 14] == 0x11

    def test_422_roundtrip_close(self):
        """4:2:2 (Y=2x1): a third sampling layout through the same
        generic MCU loop — the decoder handles arbitrary uniform
        factors, not just the two the old code special-cased."""
        from crawlspark.jpegc import decode_jpeg, encode_jpeg

        img = self._img(h=21, w=30)
        dec = decode_jpeg(encode_jpeg(img, subsampling="422"))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(float) - img.astype(float)).mean() < 5.0

    def test_progressive_bit_identical_to_baseline(self):
        """SOF2 decode (r4): spectral selection + successive
        approximation. The progressive stream carries the SAME
        quantized coefficients as the baseline stream, so the decoded
        pixels must match BIT FOR BIT — across subsampling layouts,
        odd dims, grayscale, and a noise channel that densely
        exercises ZRL/EOB-run/correction-bit paths."""
        from crawlspark.jpegc import (decode_jpeg, encode_jpeg,
                                      encode_jpeg_progressive)

        rng = np.random.default_rng(7)
        cases = [((24, 33), "444"), ((32, 32), "420"), ((17, 19), "420"),
                 ((21, 30), "422")]
        for (h, w), sub in cases:
            noise = rng.integers(0, 256, (h, w))
            img = self._img(h=h, w=w)
            img[..., 2] = noise
            base = decode_jpeg(encode_jpeg(img, subsampling=sub))
            prog = decode_jpeg(encode_jpeg_progressive(img, subsampling=sub))
            assert np.array_equal(base, prog), (h, w, sub)
        g = rng.integers(0, 256, (13, 9)).astype(np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(g)),
                              decode_jpeg(encode_jpeg_progressive(g)))

    def test_unsupported_features_raise(self):
        from crawlspark.jpegc import decode_jpeg, encode_jpeg

        data = bytearray(encode_jpeg(self._img()))
        i = data.index(b"\xff\xc0")
        data[i + 1] = 0xC3  # lossless SOF: genuinely unsupported
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(data))
        with pytest.raises(NotImplementedError):
            encode_jpeg(self._img(), subsampling="411")

    def test_dispatch_and_feature_parity_with_png(self):
        """A JPEG of the same image featurizes ~like its PNG (lossy
        but the 14-dim stats stay close) through the real seam."""
        img = self._img()
        fp, _ = M.decode_and_featurize(M.encode_png(img), "image", "image/png")
        from crawlspark.jpegc import encode_jpeg

        fj, n = M.decode_and_featurize(encode_jpeg(img), "image", "image/jpeg")
        assert n == 1
        assert max(abs(a - b) for a, b in zip(fp[:6], fj[:6])) < 0.05

    def test_restart_intervals_bit_identical(self):
        """DRI/RSTn (r4): restart markers byte-align the stream and
        reset DC predictors but carry the same coefficients — decoded
        pixels match the restart-free stream bit for bit, at every
        interval incl. 1 (marker after every MCU)."""
        from crawlspark.jpegc import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
        ref = decode_jpeg(encode_jpeg(img, subsampling="420"))
        for dri in (1, 3, 7):
            got = decode_jpeg(encode_jpeg(img, subsampling="420",
                                          restart_interval=dri))
            assert np.array_equal(ref, got), dri
        # the stream really contains RST markers
        data = encode_jpeg(img, restart_interval=2)
        assert any(data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7
                   for i in range(2, len(data) - 2))

    def test_progressive_restart_intervals_bit_identical(self):
        """r5 (the last progressive gate): DRI/RSTn inside progressive
        scans — every scan byte-aligns, flushes its EOB-run/correction
        state and resets DC predictors at each interval, yet decodes
        bit-identically to (a) the restart-free progressive stream and
        (b) the BASELINE encoding (same coefficients, same IDCT).
        Covers all subsampling layouts, grayscale, odd dims, and
        interval 1 (an RSTn after every unit of every scan)."""
        from crawlspark.jpegc import (decode_jpeg, encode_jpeg,
                                      encode_jpeg_progressive)

        rng = np.random.default_rng(5)
        for shape, sub in (((24, 40, 3), "444"), ((24, 40, 3), "420"),
                           ((17, 23, 3), "422"), ((16, 16), "444")):
            img = rng.integers(0, 256, shape).astype(np.uint8)
            ref = decode_jpeg(encode_jpeg_progressive(img, subsampling=sub))
            assert np.array_equal(
                ref, decode_jpeg(encode_jpeg(img, subsampling=sub)))
            for dri in (1, 2, 7):
                got = decode_jpeg(encode_jpeg_progressive(
                    img, subsampling=sub, restart_interval=dri))
                assert np.array_equal(ref, got), (shape, sub, dri)
        data = encode_jpeg_progressive(img, restart_interval=1)
        assert b"\xFF\xDD" in data
        assert any(data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7
                   for i in range(2, len(data) - 2))
