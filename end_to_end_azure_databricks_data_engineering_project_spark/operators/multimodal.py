"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The Spark-side machinery (schemas, partition-aware batch iteration via
``mapInPandas``, UDF signatures, deterministic fakes) is real and
tested; the actual codec calls are STUBBED — the container has no
image/audio libraries — behind ``DecodeBackend``:

 - ``FakeDecodeBackend`` (default): deterministic synthetic features
   derived from the payload bytes (md5-seeded) — lets the whole pipeline
   (including tests and downstream joins/aggs) run end to end.
 - ``LibraryDecodeBackend``: raises ``NotImplementedError`` with the
   exact integration point where Pillow/librosa/av would plug in.

Scale notes: binary payloads stay columnar in parquet and flow through
Arrow in batches (`spark.sql.execution.arrow.maxRecordsPerBatch` bounds
memory). Feature extraction is embarrassingly parallel — no shuffle —
and the output schema is fixed so downstream plans are stable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),    # image/video
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),  # audio/video
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


class DecodeBackend:
    """Integration point for real codecs."""

    def decode_features(self, media_type: str, payload: bytes) -> list[float]:
        raise NotImplementedError


class LibraryDecodeBackend(DecodeBackend):
    """Where Pillow (image), librosa/soundfile (audio), or PyAV (video)
    would decode ``payload`` and produce features. Not available in this
    container — kept as the documented integration point."""

    def decode_features(self, media_type: str, payload: bytes) -> list[float]:
        raise NotImplementedError(
            "codec libraries not installed: plug Pillow/librosa/av in here"
        )


class FakeDecodeBackend(DecodeBackend):
    """Deterministic md5-derived features — real plumbing, fake pixels.

    Hashes the *hex* rendering of the payload (not raw bytes) so the
    exact same digest is reproducible in engines whose md5 only accepts
    strings (the DuckDB oracle for ``media_features`` replays this)."""

    def decode_features(self, media_type: str, payload: bytes) -> list[float]:
        h = hashlib.md5(
            f"{media_type or ''}|{(payload or b'').hex()}".encode()
        ).digest()
        # FEATURE_DIM floats in [0,1), 1 byte each (deterministic; k/256
        # is exact in float32 so casts never lose bits)
        return [h[i % 16] / 256.0 for i in range(FEATURE_DIM)]


def extract_features(
    media: DataFrame, backend: DecodeBackend | None = None
) -> DataFrame:
    """media frame → (media_id, media_type, n_bytes, feature[16]).

    `mapInPandas`: Arrow batches in, Arrow batches out; per-partition,
    shuffle-free."""
    backend = backend or FakeDecodeBackend()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ).astype("int32"),
                    "feature": [
                        backend.decode_features(t, p)
                        for t, p in zip(pdf["media_type"], pdf["payload"])
                    ],
                }
            )
            yield out

    cols = ["media_id", "media_type", "payload"]
    return media.select(*cols).mapInPandas(op, FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Stub of an image-resize stage: passes payload through, rewrites the
    metadata dims (real backend would re-encode). Demonstrates the
    binary-in/binary-out Pandas-UDF shape."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            img = pdf["media_type"] == "image"
            pdf.loc[img, "width"] = width
            pdf.loc[img, "height"] = height
            yield pdf

    return media.mapInPandas(op, media.schema)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling stub: emits one row per sampled timestamp with
    a deterministic fake frame payload (md5 of payload+ts). Real backend:
    PyAV seek+decode. Output schema = input + frame_ts_ms."""
    out_schema = T.StructType(
        media.schema.fields + [T.StructField("frame_ts_ms", T.IntegerType(), True)]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                dur = r["duration_ms"]
                # NULL duration arrives as NaN through Arrow->pandas
                # (nullable int -> float64): NaN is truthy, so a bare
                # `not dur` passes it through and int(NaN) raises —
                # check pd.isna explicitly.
                if r["media_type"] != "video" or dur is None or pd.isna(dur) or not dur:
                    rows.append({**r.to_dict(), "frame_ts_ms": None})
                    continue
                for ts in range(0, int(dur), every_ms):
                    d = r.to_dict()
                    payload = d["payload"] or b""
                    d["payload"] = hashlib.md5(payload + str(ts).encode()).digest()
                    d["frame_ts_ms"] = ts
                    rows.append(d)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return media.mapInPandas(op, out_schema)


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for tests/demos."""
    rows = []
    for i in range(n):
        mt = ["image", "audio", "video"][i % 3]
        payload = hashlib.md5(f"media{i}".encode()).digest() * (i % 7 + 1)
        rows.append(
            (
                i,
                mt,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[mt],
                bytearray(payload),
                64 if mt != "audio" else None,
                48 if mt != "audio" else None,
                (i % 5 + 1) * 1000 if mt != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
