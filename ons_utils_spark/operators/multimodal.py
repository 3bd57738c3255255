"""Multimodal-column plumbing: binary payloads + typed metadata, decode /
feature-extract via Arrow-batched pandas UDFs.

LLM-data-pipeline extension (SURVEY.md §7). Convention: a modality column is
an opaque ``binary`` payload plus a ``struct`` metadata column — the payload
is never parsed by Catalyst, only moved, so scans stay columnar and column
pruning drops the (huge) payload whenever a query touches metadata only.

Decoding: two dependency-free formats are decoded FOR REAL — uncompressed
BMP (24/32-bit BI_RGB, pure struct unpacking) in :func:`decode_image` and
PCM WAV (8/16/32-bit RIFF) in :func:`decode_audio`. Every other media
format needs codec libraries that are NOT in this environment — those
paths raise ``NotImplementedError`` or use a clearly-marked deterministic
fake. Real and tested either way: the schemas, the ``mapInPandas``
plumbing (Arrow batch shapes, iterator contract), the partitioning
advice, and the metadata math.

Scale notes: payload rows are large — keep
``spark.sql.files.maxPartitionBytes`` at the default 128 MB and let each
task hold only its batch; ``mapInPandas`` streams record batches, so peak
executor memory is O(batch), not O(partition).
"""

from __future__ import annotations

from typing import Iterator, Union

import pandas as pd
from pyspark.sql import Column as SparkCol, DataFrame as SparkDF, functions as F

#: Metadata struct layout per modality (DDL fragments).
IMAGE_META_DDL = "width int, height int, channels int, format string"
AUDIO_META_DDL = "sample_rate int, n_samples bigint, channels int, format string"
VIDEO_META_DDL = "width int, height int, fps double, n_frames bigint, format string"


def _col(c: Union[str, SparkCol]) -> SparkCol:
    return F.col(c) if isinstance(c, str) else c


def attach_payload(df: SparkDF, text_col: str, payload_col: str = "payload") -> SparkDF:
    """Deterministic fake payload: UTF-8 bytes of a text column.

    Stands in for real media bytes so the binary-column plumbing is
    exercised end-to-end with content both Spark and DuckDB can reproduce.
    """
    return df.withColumn(payload_col, F.encode(_col(text_col), "UTF-8"))


def payload_meta(payload: Union[str, SparkCol]) -> SparkCol:
    """Cheap, decode-free metadata of a binary column: byte length + md5.

    Pure Catalyst expressions — the payload never leaves the JVM.
    """
    p = _col(payload)
    return F.struct(
        F.octet_length(p).alias("n_bytes"),
        F.md5(p).alias("digest"),
    )


def decode_bmp_bytes(data: bytes) -> tuple[int, int, int, list[int]]:
    """REAL decode of an uncompressed BMP payload — pure struct unpacking.

    Supports the format a pipeline can emit without codec libraries:
    BITMAPINFOHEADER (or larger), 24/32 bits per pixel, BI_RGB (no
    compression). Returns ``(width, height, channels, pixels)`` with
    pixels flattened row-major, top-to-bottom, channel-interleaved in RGB
    (RGBA for 32-bit) order — BMP's bottom-up row order and BGR byte
    order are normalized away. Raises ``ValueError`` on non-BMP bytes and
    ``NotImplementedError`` on BMP variants needing real codec support.
    """
    import struct

    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    width, height_raw = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0:
        raise NotImplementedError(f"compressed BMP (method {compression})")
    if bpp not in (24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP (only 24/32 supported)")
    if width <= 0 or height_raw == 0:
        raise ValueError(f"bad BMP dimensions {width}x{height_raw}")
    height = abs(height_raw)
    channels = bpp // 8
    stride = (width * channels + 3) & ~3  # rows pad to 4 bytes
    if pixel_offset + stride * height > len(data):
        raise ValueError("truncated BMP pixel data")
    pixels: list[int] = []
    # Positive height → bottom-up storage; negative → top-down.
    row_order = range(height - 1, -1, -1) if height_raw > 0 else range(height)
    for r in row_order:
        row = data[pixel_offset + r * stride:]
        for x in range(width):
            px = row[x * channels: (x + 1) * channels]
            # stored B,G,R[,A] → emit R,G,B[,A]
            pixels.extend((px[2], px[1], px[0], *px[3:4]))
    return width, height, channels, pixels


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): the neighbor (left a, up b,
    up-left c) closest to the linear estimate ``a + b - c``."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


#: raw channel count per PNG color type (RFC 2083 §4.1.1)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: allowed bit depths per color type (16-bit is declared out of scope)
_PNG_DEPTHS = {0: (1, 2, 4, 8), 2: (8,), 3: (1, 2, 4, 8), 4: (8,), 6: (8,)}


def decode_png_bytes(data: bytes) -> tuple[int, int, int, list[int]]:
    """REAL decode of the common PNG subset — stdlib ``zlib`` only.

    PNG's only compression method is DEFLATE, which ``zlib`` speaks, so
    the pipeline-emitted subset decodes honestly without codec
    libraries: grayscale (color type 0, depths 1/2/4/8, scaled to
    0-255), truecolor RGB (type 2), palette (type 3, depths 1/2/4/8,
    expanded through PLTE; a tRNS chunk upgrades output to RGBA),
    gray+alpha (type 4) and RGBA (type 6) — all non-interlaced. The
    full recipe per RFC 2083: concatenate the IDAT chunks, inflate,
    reverse each scanline's filter (None/Sub/Up/Average/Paeth, at the
    byte stride ``bpp``) against the reconstructed prior scanline, then
    unpack sub-byte samples MSB-first and expand palette indices.
    Returns ``(width, height, channels, pixels)`` with pixels flattened
    row-major, channel-interleaved — the same contract as
    :func:`decode_bmp_bytes`; ``channels`` is 1 (gray), 2 (gray+alpha),
    3 (RGB / opaque palette) or 4 (RGBA / palette+tRNS). Raises
    ``ValueError`` on non-PNG or corrupt bytes and
    ``NotImplementedError`` on the two declared-out-of-scope variants
    (16-bit samples, Adam7 interlace). Chunk CRCs are not verified
    (zlib's own Adler-32 check still guards the pixel stream).
    """
    import struct
    import zlib

    if len(data) < 8 or data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    bit_depth = color_type = 0
    palette: "bytes | None" = None
    trns: "bytes | None" = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack_from(">I", data, pos), data[pos + 4: pos + 8]
        chunk = data[pos + 8: pos + 8 + length]
        if len(chunk) < length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # length + type + payload + CRC
        if ctype == b"IHDR":
            if length != 13:
                raise ValueError(f"bad IHDR length {length}")
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", chunk)
            )
            if comp != 0 or filt != 0:
                raise ValueError(
                    f"bad IHDR compression/filter method {comp}/{filt}"
                )
            if interlace != 0:
                raise NotImplementedError("Adam7-interlaced PNG")
            if color_type not in _PNG_CHANNELS:
                raise ValueError(f"bad PNG color type {color_type}")
            if bit_depth == 16:
                raise NotImplementedError("16-bit PNG samples")
            if bit_depth not in _PNG_DEPTHS[color_type]:
                raise ValueError(
                    f"illegal depth {bit_depth} for color type {color_type}"
                )
        elif ctype == b"PLTE":
            if length == 0 or length % 3:
                raise ValueError(f"bad PLTE length {length}")
            palette = bytes(chunk)
        elif ctype == b"tRNS":
            trns = bytes(chunk)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        # ancillary chunks (tEXt, pHYs, …) are skipped
    if width is None:
        raise ValueError("PNG missing IHDR")
    if width == 0 or height == 0:
        raise ValueError(f"bad PNG dimensions {width}x{height}")
    if color_type == 3 and palette is None:
        raise ValueError("palette PNG missing PLTE")
    if not idat:
        raise ValueError("PNG missing IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG pixel stream: {e}") from e

    raw_channels = _PNG_CHANNELS[color_type]
    rowbytes = (width * raw_channels * bit_depth + 7) // 8
    # filter stride: whole bytes per pixel, min 1 (sub-byte depths
    # filter at stride 1 per RFC 2083 §6.2)
    bpp = max(1, (raw_channels * bit_depth) // 8)
    if len(raw) != (rowbytes + 1) * height:
        raise ValueError(
            f"PNG pixel stream is {len(raw)} bytes, "
            f"expected {(rowbytes + 1) * height}"
        )

    # sub-byte sample scaling (gray 1/2/4-bit → 0-255) and palette prep
    gray_scale = 255 // ((1 << bit_depth) - 1) if bit_depth < 8 else 1
    pal_n = len(palette) // 3 if palette is not None else 0
    pal_alpha = color_type == 3 and trns is not None
    channels = (
        (4 if pal_alpha else 3) if color_type == 3 else raw_channels
    )

    pixels: list[int] = []
    prior = bytearray(rowbytes)  # scanline above row 0 is all zero
    for r in range(height):
        base = r * (rowbytes + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1: base + 1 + rowbytes])
        if ftype == 1:  # Sub
            for i in range(bpp, rowbytes):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(rowbytes):
                line[i] = (line[i] + prior[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(rowbytes):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (left + prior[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(rowbytes):
                left = line[i - bpp] if i >= bpp else 0
                upleft = prior[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prior[i], upleft)) & 0xFF
        elif ftype != 0:  # 0 = None
            raise ValueError(f"bad PNG filter type {ftype} on row {r}")
        prior = line

        if bit_depth == 8:
            samples = line
        else:  # unpack MSB-first, exactly `width` samples (pad bits drop)
            per_byte = 8 // bit_depth
            mask = (1 << bit_depth) - 1
            samples = [
                (line[i // per_byte]
                 >> (8 - bit_depth * (i % per_byte + 1))) & mask
                for i in range(width)
            ]
        if color_type == 3:
            for idx in samples:
                if idx >= pal_n:
                    raise ValueError(
                        f"palette index {idx} out of range (PLTE has "
                        f"{pal_n} entries)"
                    )
                pixels.extend(palette[idx * 3: idx * 3 + 3])
                if pal_alpha:
                    pixels.append(trns[idx] if idx < len(trns) else 255)
        elif color_type == 0 and bit_depth < 8:
            pixels.extend(s * gray_scale for s in samples)
        else:
            pixels.extend(samples)
    return width, height, channels, pixels


def decode_image(df: SparkDF, payload_col: str = "payload", fake: bool = False) -> SparkDF:
    """Decode image payloads → pixel arrays + metadata via ``mapInPandas``.

    ``fake=False`` REALLY decodes uncompressed BMP payloads (24/32-bit
    BI_RGB — :func:`decode_bmp_bytes`, dependency-free struct unpacking)
    and non-interlaced PNG payloads (grayscale / RGB / palette+PLTE(+
    tRNS) / gray+alpha / RGBA, sub-byte depths included —
    :func:`decode_png_bytes`, stdlib zlib inflate + scanline
    unfiltering), dispatched on magic bytes; any other format (JPEG/
    WebP/… need codec libs not in this container) raises
    ``NotImplementedError`` from the workers. ``fake=True`` emits
    deterministic pseudo-pixels derived from the payload bytes — same
    Arrow batch shapes, output schema and iterator contract, for
    plumbing tests on arbitrary payloads.
    """
    out_schema = (
        "doc_id bigint, width int, height int, channels int, pixels array<int>"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data = bytes(payload)
                if fake:
                    width = max(1, len(data) % 64)
                    height = max(1, (len(data) // 64) % 64)
                    # Deterministic "pixels": first width*height bytes, cycled.
                    n = width * height
                    pixels = (
                        [data[i % len(data)] for i in range(n)]
                        if data
                        else [0] * n
                    )
                    rows.append((doc_id, width, height, 1, pixels))
                    continue
                if data[:2] == b"BM":
                    width, height, channels, pixels = decode_bmp_bytes(data)
                elif data[:8] == _PNG_MAGIC:
                    width, height, channels, pixels = decode_png_bytes(data)
                else:
                    raise NotImplementedError(
                        "only uncompressed BMP and non-interlaced PNG "
                        "(gray/palette/RGB/RGBA, <=8-bit samples) decode "
                        "without codec libraries (PIL/opencv absent in "
                        "this environment); pass fake=True for the "
                        "deterministic stub"
                    )
                rows.append((doc_id, width, height, channels, pixels))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "channels", "pixels"]
            )

    return df.select("doc_id", payload_col).mapInPandas(decode, out_schema)


def extract_features(
    df: SparkDF,
    payload_col: str = "payload",
    dim: int = 16,
) -> SparkDF:
    """Deterministic byte-histogram features from a binary payload.

    A stand-in for a real (model-based) feature extractor with the same
    plumbing: Arrow-batched ``mapInPandas``, fixed-width ``array<double>``
    output. The feature is the L1-normalized histogram of bytes folded into
    ``dim`` buckets — deterministic, so tests can assert exact values.
    """
    out_schema = "doc_id bigint, feature array<double>"

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data = bytes(payload)
                hist = [0] * dim
                for byte in data:
                    hist[byte % dim] += 1
                total = sum(hist) or 1
                rows.append((doc_id, [h / total for h in hist]))
            yield pd.DataFrame(rows, columns=["doc_id", "feature"])

    return df.select("doc_id", payload_col).mapInPandas(featurize, out_schema)


def image_dhash(
    df: SparkDF,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    width: int = 32,
    height: int = 32,
    hash_col: str = "dhash",
) -> SparkDF:
    """64-bit perceptual difference hash (dHash) of a binary payload
    interpreted as a ``width × height`` row-major 8-bit grayscale image
    — the standard perceptual-dedup sketch for image corpora (near-dup
    images agree on most gradient signs, so Hamming distance on the
    hash approximates visual similarity; pair it with
    ``dedup.hamming_pairs`` for the banded near-dup join).

    Fully deterministic and externally replayable (the oracle rebuilds
    it from the payload's hex dump): (1) payloads shorter than
    ``width·height`` bytes zero-pad, longer ones truncate; (2) the
    image downsamples to a 9×8 grid by NEAREST-NEIGHBOR index
    arithmetic (``src_x = ⌊x·width/9⌋``, ``src_y = ⌊y·height/8⌋`` —
    pure integer ops, no resampling filter to disagree over); (3) bit
    ``y·8 + x`` is set iff ``p(y,x) < p(y,x+1)``; (4) the 64 bits pack
    into a signed BIGINT (two's complement — bit 63 contributes
    ``−2^63``, the SimHash convention).

    Arrow-batched ``mapInPandas`` over the binary column (the brief's
    decode/feature plumbing — batch shape ``(id, payload)`` in,
    ``(id, dhash)`` out), row-local, zero shuffle. Compose upstream
    with :func:`decode_image`/:func:`resize_image` when payloads are
    real encoded images rather than raw grayscale planes.

    Returns ``(id_col, hash_col)``.
    """
    import numpy as np

    if width < 9 or height < 8:
        raise ValueError(
            f"image must be at least 9x8 for a dHash grid, got "
            f"{width}x{height}"
        )
    need = width * height
    xs = (np.arange(9, dtype=np.int64) * width) // 9
    ys = (np.arange(8, dtype=np.int64) * height) // 8
    out_schema = f"{id_col} bigint, {hash_col} bigint"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload or b"")
                if len(data) < need:
                    data = data + b"\x00" * (need - len(data))
                arr = np.frombuffer(
                    data[:need], dtype=np.uint8
                ).reshape(height, width)
                g = arr[np.ix_(ys, xs)].astype(np.int64)
                bits = (g[:, :-1] < g[:, 1:]).ravel()
                val = 0
                for k in range(64):
                    if bits[k]:
                        val |= 1 << k
                if val >= 1 << 63:
                    val -= 1 << 64
                rows.append((doc_id, val))
            yield pd.DataFrame(rows, columns=[id_col, hash_col])

    return df.select(id_col, payload_col).mapInPandas(gen, out_schema)


def sample_frames(
    df: SparkDF,
    payload_col: str = "payload",
    every_n: int = 10,
    fake: bool = False,
) -> SparkDF:
    """Sample every ``n``-th frame of video payloads.

    Real decoder absent (``NotImplementedError``); the fake treats each
    64-byte block of the payload as one "frame" so the explode shape —
    one output row per sampled frame — is real.
    """
    out_schema = "doc_id bigint, frame_idx int, frame binary"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decode requires codec libraries not present here; "
                    "pass fake=True for the deterministic stub"
                )
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data = bytes(payload)
                frames = [data[i : i + 64] for i in range(0, len(data), 64)]
                for idx in range(0, len(frames), every_n):
                    rows.append((doc_id, idx, frames[idx]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return df.select("doc_id", payload_col).mapInPandas(sample, out_schema)


def resize_image(
    df: SparkDF,
    width: int,
    height: int,
    payload_col: str = "payload",
    fake: bool = False,
) -> SparkDF:
    """Resize image payloads to ``width``x``height`` via ``mapInPandas``.

    Real resampling needs codec/imaging libraries absent here
    (``NotImplementedError``); the fake emits a deterministic byte-sampled
    "resized" payload of exactly ``width*height`` bytes so the schema,
    batch shapes, and size contract are real and testable.
    """
    out_schema = "doc_id bigint, width int, height int, resized binary"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resize requires imaging libraries (PIL/opencv) not "
                    "present in this environment; pass fake=True for the "
                    "deterministic stub"
                )
            rows = []
            n = width * height
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data = bytes(payload)
                resized = bytes(data[(i * max(len(data), 1)) // n % len(data)] for i in range(n)) if data else bytes(n)
                rows.append((doc_id, width, height, resized))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "resized"])

    return df.select("doc_id", payload_col).mapInPandas(resize, out_schema)


def decode_wav_bytes(data: bytes) -> tuple[int, int, list[float]]:
    """REAL decode of a PCM WAV (RIFF) payload — pure struct unpacking.

    Walks the RIFF chunk list for ``fmt `` and ``data``; supports PCM
    (format 1) at 8 (unsigned), 16, and 32 bits (signed little-endian).
    Returns ``(sample_rate, channels, samples)`` with samples normalized
    to [-1, 1) and channel-interleaved exactly as stored. Raises
    ``ValueError`` on non-WAV bytes and ``NotImplementedError`` on
    non-PCM encodings (they need real codec libraries).
    """
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    raw = None
    pos = 12
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        if pos + 8 + size > len(data):
            # Trusting a declared size beyond the payload would silently
            # truncate samples; fail loudly instead.
            raise ValueError(
                f"WAV chunk {cid!r} declares {size} bytes but only "
                f"{len(data) - pos - 8} remain (truncated payload)"
            )
        body = data[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError(f"WAV fmt chunk too short ({len(fmt)} < 16 bytes)")
    audio_format, channels, sample_rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_format != 1:
        raise NotImplementedError(
            f"non-PCM WAV (format {audio_format}) needs codec libraries"
        )
    if bits == 8:
        samples = [(b - 128) / 128.0 for b in raw]
    elif bits == 16:
        n = len(raw) // 2
        samples = [v / 32768.0 for v in struct.unpack(f"<{n}h", raw[: n * 2])]
    elif bits == 32:
        n = len(raw) // 4
        samples = [
            v / 2147483648.0 for v in struct.unpack(f"<{n}i", raw[: n * 4])
        ]
    else:
        raise NotImplementedError(f"{bits}-bit PCM WAV (8/16/32 supported)")
    return sample_rate, channels, samples


def decode_audio(
    df: SparkDF,
    payload_col: str = "payload",
    fake: bool = False,
    sample_rate: int = 16000,
) -> SparkDF:
    """Decode audio payloads → sample arrays + metadata via ``mapInPandas``.

    ``fake=False`` REALLY decodes PCM WAV payloads (8/16/32-bit RIFF —
    :func:`decode_wav_bytes`, dependency-free struct unpacking; the
    ``sample_rate`` argument is ignored in favor of the header's) and
    raises ``NotImplementedError`` for compressed formats (mp3/ogg/… need
    codec libraries absent here). ``fake=True`` treats each payload byte
    as one centered sample in [-1, 1) at the declared ``sample_rate`` —
    same schema and batch plumbing, for tests on arbitrary payloads.
    """
    out_schema = "doc_id bigint, sample_rate int, n_samples bigint, samples array<double>"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data = bytes(payload)
                if fake:
                    samples = [(b - 128) / 128.0 for b in data]
                    rows.append((doc_id, sample_rate, len(samples), samples))
                    continue
                if data[:4] != b"RIFF":
                    raise NotImplementedError(
                        "only PCM WAV decodes without codec libraries "
                        "(soundfile/ffmpeg absent in this environment); pass "
                        "fake=True for the deterministic stub"
                    )
                rate, _channels, samples = decode_wav_bytes(data)
                rows.append((doc_id, rate, len(samples), samples))
            yield pd.DataFrame(
                rows, columns=["doc_id", "sample_rate", "n_samples", "samples"]
            )

    return df.select("doc_id", payload_col).mapInPandas(decode, out_schema)
