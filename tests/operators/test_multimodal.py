"""Multimodal-column plumbing tests (binary payloads, mapInPandas stubs)."""

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators.multimodal import (
    attach_payload,
    decode_image,
    extract_features,
    payload_meta,
    sample_frames,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 200)], "doc_id bigint, text string"
    )


class TestPayload:
    def test_attach_and_meta(self, spark, docs):
        out = (
            attach_payload(docs, "text")
            .select("doc_id", payload_meta("payload").alias("m"))
            .select("doc_id", "m.n_bytes", "m.digest")
            .collect()
        )
        by_id = {r["doc_id"]: r for r in out}
        assert by_id[1]["n_bytes"] == len("hello world")
        assert by_id[2]["n_bytes"] == 200
        assert len(by_id[1]["digest"]) == 32

    def test_meta_stays_jvm_side(self, spark, docs):
        plan = (
            attach_payload(docs, "text")
            .select(payload_meta("payload"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Python" not in plan


class TestDecodeImage:
    def test_fake_decode_shapes(self, spark, docs):
        out = decode_image(attach_payload(docs, "text"), fake=True).collect()
        row = {r["doc_id"]: r for r in out}[1]
        assert row["width"] >= 1 and row["height"] >= 1
        assert len(row["pixels"]) == row["width"] * row["height"]

    def test_real_decode_raises(self, spark, docs):
        with pytest.raises(Exception, match="codec libraries"):
            decode_image(attach_payload(docs, "text"), fake=False).collect()

    def test_deterministic(self, spark, docs):
        a = decode_image(attach_payload(docs, "text"), fake=True).collect()
        b = decode_image(attach_payload(docs, "text"), fake=True).collect()
        assert sorted(map(str, a)) == sorted(map(str, b))


class TestExtractFeatures:
    def test_normalized_histogram(self, spark, docs):
        out = extract_features(attach_payload(docs, "text"), dim=16).collect()
        for row in out:
            assert len(row["feature"]) == 16
            assert abs(sum(row["feature"]) - 1.0) < 1e-9

    def test_exact_values(self, spark):
        df = spark.createDataFrame([(1, "aa")], "doc_id bigint, text string")
        out = extract_features(attach_payload(df, "text"), dim=16).collect()[0]
        # 'a' = 97; 97 % 16 = 1 → all mass in bucket 1.
        assert out["feature"][1] == 1.0


class TestSampleFrames:
    def test_fake_sampling(self, spark):
        df = spark.createDataFrame(
            [(1, "z" * 640)], "doc_id bigint, text string"
        )
        out = sample_frames(attach_payload(df, "text"), every_n=5, fake=True).collect()
        # 640 bytes → 10 "frames" of 64 bytes; every 5th → indices 0, 5.
        assert sorted(r["frame_idx"] for r in out) == [0, 5]

    def test_real_raises(self, spark):
        df = spark.createDataFrame([(1, "abc")], "doc_id bigint, text string")
        with pytest.raises(Exception, match="codec libraries"):
            sample_frames(attach_payload(df, "text"), fake=False).collect()


class TestResizeImage:
    def test_fake_resize_size_contract(self, spark, docs):
        from ons_utils_spark.operators.multimodal import resize_image

        out = resize_image(attach_payload(docs, "text"), 8, 4, fake=True).collect()
        for row in out:
            assert len(bytes(row["resized"])) == 8 * 4
            assert (row["width"], row["height"]) == (8, 4)

    def test_real_resize_raises(self, spark, docs):
        from ons_utils_spark.operators.multimodal import resize_image

        with pytest.raises(Exception, match="imaging libraries"):
            resize_image(attach_payload(docs, "text"), 8, 4, fake=False).collect()

    def test_deterministic(self, spark, docs):
        from ons_utils_spark.operators.multimodal import resize_image

        a = resize_image(attach_payload(docs, "text"), 4, 4, fake=True).collect()
        b = resize_image(attach_payload(docs, "text"), 4, 4, fake=True).collect()
        assert sorted(map(str, a)) == sorted(map(str, b))


class TestDecodeAudio:
    def test_fake_decode(self, spark, docs):
        from ons_utils_spark.operators.multimodal import decode_audio

        out = {r["doc_id"]: r for r in decode_audio(attach_payload(docs, "text"), fake=True).collect()}
        row = out[1]
        assert row["n_samples"] == len("hello world")
        assert row["sample_rate"] == 16000
        assert all(-1.0 <= s < 1.0 for s in row["samples"])

    def test_real_raises(self, spark, docs):
        from ons_utils_spark.operators.multimodal import decode_audio

        with pytest.raises(Exception, match="codec libraries"):
            decode_audio(attach_payload(docs, "text"), fake=False).collect()


def make_bmp(width, height, rgb_rows, bpp=24, top_down=False):
    """Minimal uncompressed BMP: BITMAPFILEHEADER + BITMAPINFOHEADER +
    padded BGR(A) pixel rows. ``rgb_rows`` is rows of (r, g, b[, a])
    tuples, top-to-bottom."""
    import struct

    channels = bpp // 8
    stride = (width * channels + 3) & ~3
    stored = rgb_rows if top_down else rgb_rows[::-1]
    body = b""
    for row in stored:
        raw = b"".join(
            bytes((px[2], px[1], px[0], *px[3:4])) for px in row
        )
        body += raw + b"\x00" * (stride - len(raw))
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(body), 0, 0, offset)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, width, -height if top_down else height, 1, bpp, 0,
        len(body), 2835, 2835, 0, 0,
    )
    return header + info + body


def make_wav(sample_rate, channels, bits, frames):
    """Minimal PCM RIFF/WAVE: fmt + data chunks. ``frames`` is a flat
    list of integer sample values at the given bit width."""
    import struct

    if bits == 8:
        raw = bytes(frames)
    elif bits == 16:
        raw = struct.pack(f"<{len(frames)}h", *frames)
    else:
        raw = struct.pack(f"<{len(frames)}i", *frames)
    block = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


class TestRealBmpDecode:
    PIXELS = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    ]

    def test_bmp_bytes_roundtrip(self):
        from ons_utils_spark.operators.multimodal import decode_bmp_bytes

        w, h, c, px = decode_bmp_bytes(make_bmp(3, 2, self.PIXELS))
        assert (w, h, c) == (3, 2, 3)
        assert px == [v for row in self.PIXELS for p in row for v in p]

    def test_top_down_equals_bottom_up(self):
        from ons_utils_spark.operators.multimodal import decode_bmp_bytes

        up = decode_bmp_bytes(make_bmp(3, 2, self.PIXELS))
        down = decode_bmp_bytes(make_bmp(3, 2, self.PIXELS, top_down=True))
        assert up == down

    def test_32bit_keeps_alpha(self):
        from ons_utils_spark.operators.multimodal import decode_bmp_bytes

        rows = [[(1, 2, 3, 128), (4, 5, 6, 255)]]
        w, h, c, px = decode_bmp_bytes(make_bmp(2, 1, rows, bpp=32))
        assert (w, h, c) == (2, 1, 4)
        assert px == [1, 2, 3, 128, 4, 5, 6, 255]

    def test_end_to_end_through_mapinpandas(self, spark):
        df = spark.createDataFrame(
            [(7, bytearray(make_bmp(3, 2, self.PIXELS)))],
            "doc_id bigint, payload binary",
        )
        row = decode_image(df, fake=False).collect()[0]
        assert (row["width"], row["height"], row["channels"]) == (3, 2, 3)
        assert list(row["pixels"]) == [
            v for r in self.PIXELS for p in r for v in p
        ]

    def test_non_bmp_still_raises(self):
        from ons_utils_spark.operators.multimodal import decode_bmp_bytes

        with pytest.raises(ValueError):
            decode_bmp_bytes(b"\x89PNG" + b"\x00" * 60)


class TestRealWavDecode:
    def test_pcm16_roundtrip(self):
        from ons_utils_spark.operators.multimodal import decode_wav_bytes

        frames = [0, 16384, -16384, 32767, -32768, 123]
        rate, ch, samples = decode_wav_bytes(make_wav(44100, 2, 16, frames))
        assert (rate, ch) == (44100, 2)
        assert samples == [v / 32768.0 for v in frames]

    def test_pcm8_unsigned(self):
        from ons_utils_spark.operators.multimodal import decode_wav_bytes

        rate, ch, samples = decode_wav_bytes(
            make_wav(8000, 1, 8, [0, 128, 255])
        )
        assert rate == 8000
        assert samples == [-1.0, 0.0, 127 / 128.0]

    def test_non_pcm_not_implemented(self):
        from ons_utils_spark.operators.multimodal import decode_wav_bytes
        import struct

        wav = bytearray(make_wav(8000, 1, 16, [0]))
        struct.pack_into("<H", wav, 20, 3)  # format 3 = IEEE float
        with pytest.raises(NotImplementedError):
            decode_wav_bytes(bytes(wav))

    def test_end_to_end_through_mapinpandas(self, spark):
        from ons_utils_spark.operators.multimodal import decode_audio

        frames = [100, -100, 32000, -32000]
        df = spark.createDataFrame(
            [(9, bytearray(make_wav(16000, 1, 16, frames)))],
            "doc_id bigint, payload binary",
        )
        row = decode_audio(df, fake=False).collect()[0]
        assert row["sample_rate"] == 16000
        assert row["n_samples"] == 4
        assert list(row["samples"]) == [v / 32768.0 for v in frames]


class TestWavValidation:
    def test_truncated_data_chunk_raises(self):
        from ons_utils_spark.operators.multimodal import decode_wav_bytes

        wav = make_wav(8000, 1, 16, [1, 2, 3, 4])
        with pytest.raises(ValueError, match="truncated"):
            decode_wav_bytes(wav[:-3])  # cut mid-data-chunk

    def test_short_fmt_chunk_raises_valueerror(self):
        import struct

        from ons_utils_spark.operators.multimodal import decode_wav_bytes

        fmt = struct.pack("<HHI", 1, 1, 8000)  # only 8 bytes, no bits field
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", 0)
        wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
        with pytest.raises(ValueError, match="fmt chunk too short"):
            decode_wav_bytes(wav)


def make_png(
    width,
    height,
    rows,
    channels=3,
    filters=None,
    idat_split=1,
    interlace=0,
    bit_depth=8,
    color_type=None,
    with_ancillary=False,
    palette=None,
    trns=None,
):
    """Minimal PNG encoder: IHDR + [PLTE/tRNS] + (split) IDAT + IEND,
    applying the requested per-row filter type (0-4) forward so the
    decoder's unfiltering of every filter is exercised. ``rows`` is rows
    of (r, g, b[, a]) tuples top-to-bottom — or, for palette /
    sub-byte-grayscale images, rows of plain ints (palette indices or
    gray samples), packed MSB-first at ``bit_depth``. ``palette`` is a
    list of (r, g, b); ``trns`` a list of alphas."""
    import struct
    import zlib

    from ons_utils_spark.operators.multimodal import _paeth

    if color_type is None:
        color_type = 2 if channels == 3 else 6

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload))
        )

    def pack_row(samples):
        if bit_depth == 8:
            return bytes(samples)
        per_byte = 8 // bit_depth
        out = bytearray((len(samples) + per_byte - 1) // per_byte)
        for i, s in enumerate(samples):
            out[i // per_byte] |= s << (8 - bit_depth * (i % per_byte + 1))
        return bytes(out)

    ihdr = struct.pack(
        ">IIBBBBB", width, height, bit_depth, color_type, 0, 0, interlace
    )
    filters = filters if filters is not None else [0] * height
    raw_channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    bpp = max(1, (raw_channels * bit_depth) // 8)
    rowbytes = (width * raw_channels * bit_depth + 7) // 8
    raw = b""
    prior = bytes(rowbytes)
    for r in range(height):
        if rows[r] and isinstance(rows[r][0], tuple):
            line = bytes(v for px in rows[r] for v in px)
        else:
            line = pack_row(rows[r])
        f = filters[r]
        filt = bytearray()
        for i in range(len(line)):
            left = line[i - bpp] if i >= bpp else 0
            up = prior[i]
            upleft = prior[i - bpp] if i >= bpp else 0
            if f == 0:
                x = line[i]
            elif f == 1:
                x = (line[i] - left) & 0xFF
            elif f == 2:
                x = (line[i] - up) & 0xFF
            elif f == 3:
                x = (line[i] - (left + up) // 2) & 0xFF
            else:
                x = (line[i] - _paeth(left, up, upleft)) & 0xFF
            filt.append(x)
        raw += bytes([f]) + bytes(filt)
        prior = line
    comp = zlib.compress(raw)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", bytes(v for rgb in palette for v in rgb))
    if trns is not None:
        out += chunk(b"tRNS", bytes(trns))
    if with_ancillary:
        out += chunk(b"tEXt", b"Comment\x00synthesized")
    step = max(1, len(comp) // idat_split)
    for i in range(0, len(comp), step):
        out += chunk(b"IDAT", comp[i : i + step])
    return out + chunk(b"IEND", b"")


class TestRealPngDecode:
    PIXELS = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
        [(1, 1, 1), (200, 150, 100), (0, 0, 0)],
    ]
    FLAT = [v for row in PIXELS for px in row for v in px]

    def test_png_bytes_roundtrip(self):
        from ons_utils_spark.operators.multimodal import decode_png_bytes

        w, h, c, px = decode_png_bytes(make_png(3, 3, self.PIXELS))
        assert (w, h, c) == (3, 3, 3)
        assert px == self.FLAT

    @pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
    def test_every_filter_type_unfilters(self, ftype):
        from ons_utils_spark.operators.multimodal import decode_png_bytes

        png = make_png(3, 3, self.PIXELS, filters=[ftype] * 3)
        assert decode_png_bytes(png)[3] == self.FLAT

    def test_mixed_filters_and_split_idat(self):
        from ons_utils_spark.operators.multimodal import decode_png_bytes

        png = make_png(
            3, 3, self.PIXELS, filters=[1, 4, 2], idat_split=3,
            with_ancillary=True,
        )
        assert decode_png_bytes(png)[3] == self.FLAT

    def test_rgba_keeps_alpha(self):
        from ons_utils_spark.operators.multimodal import decode_png_bytes

        rows = [[(1, 2, 3, 128), (4, 5, 6, 255)]]
        w, h, c, px = decode_png_bytes(
            make_png(2, 1, rows, channels=4, filters=[4])
        )
        assert (w, h, c) == (2, 1, 4)
        assert px == [1, 2, 3, 128, 4, 5, 6, 255]

    def test_unsupported_variants_not_implemented(self):
        from ons_utils_spark.operators.multimodal import decode_png_bytes

        with pytest.raises(NotImplementedError, match="interlace"):
            decode_png_bytes(make_png(3, 3, self.PIXELS, interlace=1))
        with pytest.raises(NotImplementedError, match="16-bit"):
            decode_png_bytes(
                make_png(3, 3, self.PIXELS, bit_depth=16)
            )

    def test_corrupt_bytes_raise_valueerror(self):
        from ons_utils_spark.operators.multimodal import decode_png_bytes

        png = make_png(3, 3, self.PIXELS)
        with pytest.raises(ValueError, match="not a PNG"):
            decode_png_bytes(b"BM" + png)
        with pytest.raises(ValueError):
            decode_png_bytes(png[:40])  # truncated mid-chunk
        # Flip a byte inside the (single) IDAT payload: zlib's integrity
        # check must surface as ValueError, not a raw zlib.error.
        idat_at = png.index(b"IDAT") + 8
        corrupt = bytearray(png)
        corrupt[idat_at] ^= 0xFF
        with pytest.raises(ValueError, match="corrupt|pixel stream"):
            decode_png_bytes(bytes(corrupt))

    def test_end_to_end_through_mapinpandas(self, spark):
        """r5 verdict ask #5 done-criterion: a byte-synthesized PNG
        decodes end-to-end through the mapInPandas operator, alongside a
        BMP payload in the same DataFrame (magic-byte dispatch)."""
        png = make_png(3, 3, self.PIXELS, filters=[1, 4, 2])
        bmp = make_bmp(3, 2, TestRealBmpDecode.PIXELS)
        df = spark.createDataFrame(
            [(1, bytearray(png)), (2, bytearray(bmp))],
            "doc_id bigint, payload binary",
        )
        rows = {r["doc_id"]: r for r in decode_image(df, fake=False).collect()}
        assert (rows[1]["width"], rows[1]["height"], rows[1]["channels"]) == (3, 3, 3)
        assert list(rows[1]["pixels"]) == self.FLAT
        assert (rows[2]["width"], rows[2]["height"]) == (3, 2)


class TestPngPaletteGrayscale:
    """r8: the PNG subset widens to grayscale (sub-byte depths scaled to
    0-255), palette via PLTE (tRNS upgrades output to RGBA), and
    gray+alpha — closing the r7 'missing' list's palette/grayscale
    entries. 16-bit and Adam7 stay declared NotImplementedError."""

    def test_grayscale_8bit(self):
        from ons_utils_spark.operators.multimodal import decode_png_bytes

        rows = [[0, 128, 255], [10, 20, 30]]
        w, h, c, px = decode_png_bytes(
            make_png(3, 2, rows, color_type=0, filters=[2, 4])
        )
        assert (w, h, c) == (3, 2, 1)
        assert px == [0, 128, 255, 10, 20, 30]

    @pytest.mark.parametrize(
        "depth,samples,scaled",
        [
            (1, [1, 0, 1, 1, 0], [255, 0, 255, 255, 0]),
            (2, [0, 1, 2, 3, 2], [0, 85, 170, 255, 170]),
            (4, [0, 5, 10, 15, 7], [0, 85, 170, 255, 119]),
        ],
    )
    def test_grayscale_subbyte_scales_to_255(self, depth, samples, scaled):
        from ons_utils_spark.operators.multimodal import decode_png_bytes

        w, h, c, px = decode_png_bytes(
            make_png(5, 1, [samples], color_type=0, bit_depth=depth)
        )
        assert (w, h, c) == (5, 1, 1)
        assert px == scaled

    def test_gray_alpha(self):
        from ons_utils_spark.operators.multimodal import decode_png_bytes

        rows = [[(7, 255), (200, 0)]]
        w, h, c, px = decode_png_bytes(
            make_png(2, 1, rows, color_type=4, filters=[1])
        )
        assert (w, h, c) == (2, 1, 2)
        assert px == [7, 255, 200, 0]

    PAL = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]

    def test_palette_8bit(self):
        from ons_utils_spark.operators.multimodal import decode_png_bytes

        rows = [[0, 1, 2], [3, 2, 0]]
        w, h, c, px = decode_png_bytes(
            make_png(
                3, 2, rows, color_type=3, palette=self.PAL, filters=[0, 2]
            )
        )
        assert (w, h, c) == (3, 2, 3)
        assert px == [255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9, 0, 0, 255, 255, 0, 0]

    @pytest.mark.parametrize("depth", [1, 2, 4])
    def test_palette_subbyte_indices(self, depth):
        from ons_utils_spark.operators.multimodal import decode_png_bytes

        n_idx = 1 << depth
        pal = self.PAL[: min(n_idx, 4)]
        rows = [[i % len(pal) for i in range(5)]]
        w, h, c, px = decode_png_bytes(
            make_png(5, 1, rows, color_type=3, bit_depth=depth, palette=pal)
        )
        assert (w, h, c) == (5, 1, 3)
        want = []
        for i in range(5):
            want.extend(pal[i % len(pal)])
        assert px == want

    def test_palette_trns_adds_alpha(self):
        from ons_utils_spark.operators.multimodal import decode_png_bytes

        rows = [[0, 1, 2]]
        w, h, c, px = decode_png_bytes(
            make_png(
                3, 1, rows, color_type=3, palette=self.PAL, trns=[128, 0]
            )
        )
        # tRNS shorter than PLTE: entries past its end are opaque (255)
        assert (w, h, c) == (3, 1, 4)
        assert px == [255, 0, 0, 128, 0, 255, 0, 0, 0, 0, 255, 255]

    def test_palette_index_out_of_range_raises(self):
        from ons_utils_spark.operators.multimodal import decode_png_bytes

        rows = [[0, 3]]  # PLTE below has only 2 entries
        with pytest.raises(ValueError, match="palette index"):
            decode_png_bytes(
                make_png(2, 1, rows, color_type=3, palette=self.PAL[:2])
            )

    def test_palette_missing_plte_raises(self):
        from ons_utils_spark.operators.multimodal import decode_png_bytes

        with pytest.raises(ValueError, match="PLTE"):
            decode_png_bytes(make_png(2, 1, [[0, 1]], color_type=3))

    def test_end_to_end_through_mapinpandas(self, spark):
        from ons_utils_spark.operators.multimodal import decode_image

        png = make_png(
            3, 2, [[0, 1, 2], [3, 2, 0]], color_type=3, palette=self.PAL
        )
        gray = make_png(2, 1, [[5, 250]], color_type=0)
        df = spark.createDataFrame(
            [(1, bytearray(png)), (2, bytearray(gray))],
            "doc_id bigint, payload binary",
        )
        rows = {r["doc_id"]: r for r in decode_image(df, fake=False).collect()}
        assert (rows[1]["width"], rows[1]["channels"]) == (3, 3)
        assert (rows[2]["width"], rows[2]["channels"]) == (2, 1)
        assert list(rows[2]["pixels"]) == [5, 250]


class TestImageDhash:
    """image_dhash — the 64-bit perceptual difference hash + its
    banded Hamming near-dup composition."""

    def _img_bytes(self, width, height, fn):
        return bytes(fn(x, y) % 256 for y in range(height)
                     for x in range(width))

    def test_known_gradient_hash(self, spark):
        """A strict left-to-right gradient sets EVERY dHash bit (each
        right neighbor is brighter); a constant image sets none."""
        from ons_utils_spark.operators.multimodal import image_dhash

        grad = self._img_bytes(16, 8, lambda x, y: x * 10)
        flat = self._img_bytes(16, 8, lambda x, y: 7)
        df = spark.createDataFrame(
            [(1, bytearray(grad)), (2, bytearray(flat))],
            "doc_id bigint, payload binary",
        )
        got = {
            r["doc_id"]: r["dhash"]
            for r in image_dhash(df, width=16, height=8).collect()
        }
        assert got[1] == -1  # all 64 bits set, two's complement
        assert got[2] == 0

    def test_short_payload_zero_pads(self, spark):
        from ons_utils_spark.operators.multimodal import image_dhash

        df = spark.createDataFrame(
            [(1, bytearray(b"")), (2, bytearray(b"\x00" * (16 * 8)))],
            "doc_id bigint, payload binary",
        )
        got = {
            r["doc_id"]: r["dhash"]
            for r in image_dhash(df, width=16, height=8).collect()
        }
        assert got[1] == got[2] == 0

    def test_minimum_geometry_validated(self, spark):
        from ons_utils_spark.operators.multimodal import image_dhash

        df = spark.createDataFrame(
            [(1, bytearray(b"x"))], "doc_id bigint, payload binary"
        )
        with pytest.raises(ValueError, match="9x8"):
            image_dhash(df, width=8, height=8)

    def test_near_dup_images_within_budget(self, spark):
        """One flipped pixel in the sampled grid moves few gradient
        signs — the perceptual property the hash exists for."""
        from ons_utils_spark.operators.dedup import hamming_pairs
        from ons_utils_spark.operators.multimodal import image_dhash

        base = list(self._img_bytes(16, 8, lambda x, y: (x * 7 + y * 3)))
        tweak = list(base)
        tweak[3] = (tweak[3] + 40) % 256  # one sampled pixel
        other = self._img_bytes(16, 8, lambda x, y: (x * x + 5 * y))
        df = spark.createDataFrame(
            [(1, bytearray(bytes(base))), (2, bytearray(bytes(tweak))),
             (3, bytearray(other))],
            "doc_id bigint, payload binary",
        )
        hashed = image_dhash(df, width=16, height=8)
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in hamming_pairs(
                hashed, max_hamming=4, id_col="doc_id", hash_col="dhash"
            ).collect()
        }
        assert (1, 2) in pairs and pairs[(1, 2)] <= 4

    def test_banding_matches_brute_force(self, spark):
        """hamming_pairs (pigeonhole banding) must find EXACTLY the
        pairs a brute-force all-pairs Hamming check finds."""
        import itertools
        import random

        from ons_utils_spark.operators.dedup import hamming_pairs
        from ons_utils_spark.operators.multimodal import image_dhash

        rng = random.Random(3)
        rows = [
            (i, bytearray(bytes(rng.randrange(4) * 60
                                for _ in range(16 * 8))))
            for i in range(30)
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
        hashed = image_dhash(df, width=16, height=8)
        sketches = {r["doc_id"]: r["dhash"] for r in hashed.collect()}
        for mh in (0, 3):
            got = {
                (r["id_a"], r["id_b"], r["hamming"])
                for r in hamming_pairs(
                    hashed, max_hamming=mh, id_col="doc_id",
                    hash_col="dhash",
                ).collect()
            }
            want = set()
            for a, b in itertools.combinations(sorted(sketches), 2):
                h = bin((sketches[a] ^ sketches[b]) & ((1 << 64) - 1)
                        ).count("1")
                if h <= mh:
                    want.add((a, b, h))
            assert got == want, mh

    def test_max_hamming_validated(self, spark):
        from ons_utils_spark.operators.dedup import hamming_pairs
        from ons_utils_spark.operators.multimodal import image_dhash

        df = spark.createDataFrame(
            [(1, bytearray(b"x" * 128))], "doc_id bigint, payload binary"
        )
        hashed = image_dhash(df, width=16, height=8)
        with pytest.raises(ValueError, match="max_hamming"):
            hamming_pairs(hashed, max_hamming=64, id_col="doc_id",
                          hash_col="dhash")
