"""Multimodal-column plumbing: binary payloads + typed metadata, decode /
feature-extract via Arrow-batched pandas UDFs.

LLM-data-pipeline extension (SURVEY.md §7). Convention: a modality column is
an opaque ``binary`` payload plus a ``struct`` metadata column — the payload
is never parsed by Catalyst, only moved, so scans stay columnar and column
pruning drops the (huge) payload whenever a query touches metadata only.

The actual media decode (image/audio/video) needs codec libraries that are
NOT in this environment — those steps are stubbed behind
``NotImplementedError`` or a clearly-marked deterministic fake. What IS real
and tested: the schemas, the ``mapInPandas`` plumbing (Arrow batch shapes,
iterator contract), the partitioning advice, and the metadata math.

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


def decode_image(df: SparkDF, payload_col: str = "payload", fake: bool = False) -> SparkDF:
    """Decode image payloads → pixel arrays + metadata via ``mapInPandas``.

    ``fake=False`` raises ``NotImplementedError`` from the workers (no codec
    libs in this container). ``fake=True`` emits deterministic pseudo-pixels
    derived from the payload bytes — the Arrow batch shapes, output schema
    and iterator contract are identical to a real decoder, which is the part
    this environment can test.
    """
    out_schema = (
        "doc_id bigint, width int, height int, channels int, pixels array<int>"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires codec libraries (PIL/opencv) not "
                    "present in this environment; pass fake=True for the "
                    "deterministic stub"
                )
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data = bytes(payload)
                width = max(1, len(data) % 64)
                height = max(1, (len(data) // 64) % 64)
                # Deterministic "pixels": first width*height bytes, cycled.
                n = width * height
                pixels = [data[i % len(data)] for i in range(n)] if data else [0] * n
                rows.append((doc_id, width, height, 1, pixels))
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


def decode_audio(
    df: SparkDF,
    payload_col: str = "payload",
    fake: bool = False,
    sample_rate: int = 16000,
) -> SparkDF:
    """Decode audio payloads → sample arrays + metadata via ``mapInPandas``.

    Real codecs absent (``NotImplementedError``); the fake treats each
    payload byte as one centered sample in [-1, 1), with a fixed declared
    sample rate — schema and batch plumbing identical to a real decoder.
    """
    out_schema = "doc_id bigint, sample_rate int, n_samples bigint, samples array<double>"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "audio decode requires codec libraries (soundfile/ffmpeg) "
                    "not present in this environment; pass fake=True for the "
                    "deterministic stub"
                )
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data = bytes(payload)
                samples = [(b - 128) / 128.0 for b in data]
                rows.append((doc_id, sample_rate, len(samples), samples))
            yield pd.DataFrame(
                rows, columns=["doc_id", "sample_rate", "n_samples", "samples"]
            )

    return df.select("doc_id", payload_col).mapInPandas(decode, out_schema)
