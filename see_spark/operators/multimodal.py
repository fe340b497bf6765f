"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media documents flow through the engine as the input_hint prescribes —
``kind='media'`` spans carrying a ``media_ref`` — and as standalone media
tables with a ``binary`` payload column. The Spark-side plumbing (schema,
partitioning, Arrow batch shape, UDF signatures) is real and tested; the
actual codec work (image decode, audio resample, video frame extraction)
needs libraries this container does not ship, so the decode kernel is
STUBBED: it raises NotImplementedError unless ``fake=True``, in which case
a clearly-marked deterministic fake (byte-level stats standing in for pixel
stats) exercises the full pipeline.

Scale notes: payloads stay opaque binary until the last possible stage
(column pruning keeps them out of every scan that doesn't need bytes);
decode runs in mapInPandas with small Arrow batches
(maxRecordsPerBatch already bounded session-wide) so a 10 MB payload
(see_http.erl:11's cap) times batch size stays inside executor memory.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),   # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from a text corpus (sandbox stand-in for a
    real binary store): payload = utf-8 bytes, kind derived from source."""
    return docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def _decode_image(payload: bytes, fake: bool) -> np.ndarray:
    if not fake:
        # STUB: real decode requires PIL/libjpeg etc., absent in this
        # container. The fake below preserves shapes/dtypes end-to-end.
        raise NotImplementedError(
            "image decode requires an imaging library not present in this "
            "environment; pass fake=True for the deterministic stand-in"
        )
    arr = np.frombuffer(payload, dtype=np.uint8)
    return arr  # deterministic fake "pixel buffer"


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_histogram", T.ArrayType(T.LongType())),
    ]
)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Vectorized feature extraction over binary payloads (mapInPandas).
    With fake=True: byte-level stats as the deterministic decode stand-in;
    with fake=False the real-decoder stub raises (documented above)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for media_id, kind, payload in zip(
                batch["media_id"], batch["kind"], batch["payload"]
            ):
                buf = _decode_image(bytes(payload or b""), fake)
                hist = np.bincount(buf % 16, minlength=16).astype("int64")
                rows.append(
                    (
                        media_id,
                        kind,
                        int(len(buf)),
                        float(buf.mean()) if len(buf) else 0.0,
                        hist.tolist(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "n_bytes", "byte_mean", "byte_histogram"],
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        _run, schema=FEATURES_SCHEMA
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 50, stride: int = 3) -> DataFrame:
    """Deterministic frame-sampling plan for video rows: frame indices
    0, stride, 2*stride ... over a duration proxy (n_bytes/every_n_bytes).
    Pure Catalyst (sequence+explode) — the real decoder would seek to these
    indices; the plan/shape is what's exercised here."""
    frames = F.sequence(
        F.lit(0),
        F.greatest((F.col("n_bytes") / every_n_bytes).cast("int"), F.lit(0)),
        F.lit(stride),
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_no"))
    )
