"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The decode step is a clearly-marked STUB (image/audio libraries are not
available in this container): ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic pseudo-decoder stands in. The Spark-side plumbing —
schema, partitioning, UDF signature, Arrow batch shape — is real and
pytest-covered; swapping the stub for PIL/ffmpeg is a body-only change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),          # image | audio | video
        StructField("payload", BinaryType()),        # opaque encoded bytes
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURES = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("features", ArrayType(FloatType())),
        StructField("n_bytes", LongType()),
    ]
)


def synth_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a deterministic binary media table from a text table (no
    external data): payload = unhex(md5 chain), metadata from the id."""
    payload = F.unhex(
        F.concat(F.md5(F.col(text_col)), F.md5(F.concat(F.col(text_col), F.lit("2"))))
    )
    return docs.select(
        F.concat(F.lit("m"), F.col(id_col).cast("string")).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, F.lit("image"))
        .when(F.col(id_col) % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        payload.alias("payload"),
        (F.col(id_col) % 640 + 32).cast("int").alias("width"),
        (F.col(id_col) % 480 + 32).cast("int").alias("height"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB — real decode needs an image library not present here."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv (not in this container); "
            "pass fake=True for the deterministic stand-in"
        )
    # hash the lowercase-hex encoding (not raw bytes): every SQL engine can
    # reproduce sha256(lower(hex(payload))) for the oracle check
    h = hashlib.sha256(payload.hex().encode()).digest()
    return np.frombuffer(h[:32], dtype=np.uint8).astype(np.float32) / 255.0


def extract_features(media: DataFrame, n_features: int = 8, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction — one Arrow batch in, one out.
    Deterministic fake featurizer (sha256-derived) behind the stub."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_image(bytes(p), fake=fake)[:n_features].tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                    "n_bytes": pdf["n_bytes"],
                }
            )

    return media.select("media_id", "kind", "payload", "n_bytes").mapInPandas(
        gen, schema=FEATURES
    )


def frame_sample(media: DataFrame, every_n: int = 10, fake: bool = True) -> DataFrame:
    """Video frame-sampling plumbing: one input row → N frame rows
    (demonstrates the 1→many mapInPandas shape; frames are stub bytes).

    Vectorized fan-out: per-row frame counts → numpy repeat/concatenate
    for the (media_id, frame_no) expansion; the only per-frame Python is
    the sha256 stand-in occupying the codec call's slot (a real decoder
    is per-frame work by nature — swap the hash for the library call)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["kind"] == "video"]
            if not len(vids):
                yield pd.DataFrame(
                    {"media_id": [], "frame_no": [], "frame_bytes": []}
                )
                continue
            n_frames = np.clip(
                vids["n_bytes"].to_numpy() // every_n, 1, 5
            ).astype(np.int64)
            media_ids = np.repeat(vids["media_id"].to_numpy(), n_frames)
            payloads = np.repeat(vids["payload"].to_numpy(), n_frames)
            frame_no = np.concatenate([np.arange(n) for n in n_frames])
            frames = [
                hashlib.sha256(bytes(p) + int(i).to_bytes(4, "big")).digest()
                for p, i in zip(payloads, frame_no)
            ]
            yield pd.DataFrame(
                {
                    "media_id": media_ids,
                    "frame_no": frame_no.astype(np.int32),
                    "frame_bytes": frames,
                }
            )

    schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("frame_no", IntegerType()),
            StructField("frame_bytes", BinaryType()),
        ]
    )
    return media.mapInPandas(gen, schema=schema)
