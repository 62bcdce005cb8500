"""Multimodal column plumbing: opaque binary assets + typed metadata.

Image/audio/video payloads ride through the engine as ``binary`` columns with
a typed metadata struct — the 100 TB pattern: Spark never interprets the
bytes; per-modality kernels run as Arrow-batched ``mapInPandas`` so the bytes
cross into Python once per batch, not per row.

The actual codecs (Pillow/ffmpeg/librosa) are NOT installed in this
environment, so the decode step is pluggable:

* ``decoder="fake"`` (default) — a deterministic hash-derived decoder: byte
  content -> stable pseudo pixel/sample statistics.  Schema, partitioning,
  UDF signature and batch shape are the real production plumbing; only the
  innermost bytes->array call is simulated.
* ``decoder="real"`` — raises ``NotImplementedError`` with the exact seam
  where a real codec plugs in.

Everything is deterministic: same bytes -> same features on any executor.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

ASSET_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ]
)

ASSETS = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", ASSET_META),
    ]
)

FEATURES = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),  # fixed-dim embedding
    ]
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for decode + feature extraction: a fixed-dim
    float vector derived from the byte content.  Replace with a real
    decode -> model-embed call at the seam below."""
    h = hashlib.sha1(kind.encode() + b"\x00" + payload).digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / 2**32).astype(np.float32)


def _real_decode(payload: bytes, kind: str) -> np.ndarray:
    raise NotImplementedError(
        "real decoder seam: plug Pillow (image), soundfile/librosa (audio) or "
        "pyav/ffmpeg (video) here; container has no codec libraries installed"
    )


def extract_features(assets: DataFrame, decoder: str = "fake") -> DataFrame:
    """assets (ASSETS schema) -> per-asset feature vectors (FEATURES schema).

    The hot loop is one numpy pass per Arrow batch; bytes stay zero-copy until
    the decode call."""
    decode = _fake_decode if decoder == "fake" else _real_decode

    def run(batches):
        for pdf in batches:
            rows = []
            for asset_id, kind, payload in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                payload = bytes(payload)
                rows.append(
                    {
                        "asset_id": asset_id,
                        "kind": kind,
                        "n_bytes": len(payload),
                        "sha1": hashlib.sha1(payload).hexdigest(),
                        "feature": decode(payload, kind),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "kind", "n_bytes", "sha1", "feature"]
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        run, schema=FEATURES
    )


def resize_images(assets: DataFrame, width: int, height: int, decoder: str = "fake") -> DataFrame:
    """Image resize plumbing: filters to images (predicate pushes to scan),
    rewrites payload + meta.  Fake decoder passes bytes through and updates
    meta (the real seam re-encodes)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for asset_id, payload, meta in zip(pdf["asset_id"], pdf["payload"], pdf["meta"]):
                if decoder == "real":
                    _real_decode(bytes(payload), "image")
                meta = dict(meta)
                meta["width"], meta["height"] = width, height
                rows.append(
                    {"asset_id": asset_id, "kind": "image", "payload": payload, "meta": meta}
                )
            yield pd.DataFrame(rows, columns=["asset_id", "kind", "payload", "meta"])

    return (
        assets.filter(F.col("kind") == "image")
        .select("asset_id", "payload", "meta")
        .mapInPandas(run, schema=ASSETS)
    )


def sample_frames(assets: DataFrame, every_ms: int = 1000, decoder: str = "fake") -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame with a
    deterministic frame feature; frame count derives from duration metadata
    (no decode needed to plan the fan-out — metadata-driven explode)."""
    schema = T.StructType(
        [
            T.StructField("asset_id", T.StringType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("ts_ms", T.IntegerType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for asset_id, payload, meta in zip(pdf["asset_id"], pdf["payload"], pdf["meta"]):
                duration = int(meta["duration_ms"] or 0)
                payload = bytes(payload)
                for k in range(max(duration // every_ms, 1)):
                    if decoder == "real":
                        _real_decode(payload, "video")
                    ts = k * every_ms
                    rows.append(
                        {
                            "asset_id": asset_id,
                            "frame_no": k,
                            "ts_ms": ts,
                            "feature": _fake_decode(
                                payload + ts.to_bytes(4, "big"), "video-frame"
                            ),
                        }
                    )
            yield pd.DataFrame(rows, columns=["asset_id", "frame_no", "ts_ms", "feature"])

    return (
        assets.filter(F.col("kind") == "video")
        .select("asset_id", "payload", "meta")
        .mapInPandas(run, schema=schema)
    )


def assets_from_pages(pages: DataFrame) -> DataFrame:
    """Derive an assets table from the pages corpus: the html payload is the
    binary asset (stand-in for crawled media), kind assigned deterministically."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("url"), F.lit(3)) + 1).cast("int"),
    )
    return pages.select(
        F.md5("url").alias("asset_id"),
        kind.alias("kind"),
        F.col("html").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.pmod(F.xxhash64("url", F.lit(1)), F.lit(10000)) + 1000)
            .cast("int")
            .alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )
