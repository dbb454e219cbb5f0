"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; all *Spark-side* mechanics (schema, Arrow batching,
partition sizing, UDF signatures) are real and tested. The actual
media decode is STUBBED — codec libraries aren't in this environment —
behind ``decode_stub``: a deterministic fake that derives "decoded"
attributes from the payload bytes, so tests exercise the full
mapInPandas path with verifiable outputs. Swap ``decode_stub`` for a real
decoder (PIL/ffmpeg) in deployment; nothing else changes.

Scale notes: binary payloads make rows wide — size input splits by bytes
(``spark.sql.files.maxPartitionBytes``), never by row count; keep
metadata in columns so filters prune *before* any payload is decoded
(predicate pushdown works on metadata, never on blobs).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Metadata carried beside every media payload.
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_media(
    df: DataFrame, payload_col: str, media_type: str = "application/octet-stream"
) -> DataFrame:
    """Wrap a binary column with the typed metadata struct (columnar, so
    Catalyst can filter on size/checksum without touching payloads)."""
    payload = F.col(payload_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("checksum"),
        ),
    )


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decode: attributes derived from payload bytes.

    Replace with a real codec in deployment. Raises on empty payloads the
    way a real decoder raises on corrupt media (exercises the error path).
    """
    if not payload:
        raise ValueError("empty media payload")
    digest = hashlib.sha256(payload).digest()
    return {
        "width": 64 + digest[0],
        "height": 64 + digest[1],
        "feature": [b / 255.0 for b in digest[:8]],
    }


def decode_media(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: Callable[[bytes], dict] = decode_stub,
) -> DataFrame:
    """Decode payloads via Arrow-batched mapInPandas (the 10-100× faster
    path vs row-at-a-time UDFs); bad payloads quarantine as NULL attributes
    instead of failing the batch (per-record fault isolation, the same
    stance as the ingest pipeline — reference cloud_function.py:91-95)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {
                "doc_id": [], "media_type": [], "n_bytes": [],
                "width": [], "height": [], "feature": [],
            }
            for doc_id, meta, payload in zip(
                batch[id_col], batch["media_meta"], batch[payload_col]
            ):
                out["doc_id"].append(doc_id)
                out["media_type"].append(meta["media_type"])
                out["n_bytes"].append(meta["n_bytes"])
                try:
                    dec = decoder(bytes(payload) if payload is not None else b"")
                    out["width"].append(dec["width"])
                    out["height"].append(dec["height"])
                    out["feature"].append(dec["feature"])
                except Exception:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["feature"].append(None)
            yield pd.DataFrame(out)

    return df.select(id_col, "media_meta", payload_col).mapInPandas(
        decode_batches, DECODED_SCHEMA
    )


def resize_decoded(
    df: DataFrame,
    target_w: int,
    target_h: int,
) -> DataFrame:
    """Resize stage over decoded media rows (DECODED_SCHEMA in/out).

    The pixel resample is represented by a deterministic feature rescale
    (area ratio) — swap the body for a real interpolation kernel in
    deployment; the Spark-side contract (Arrow batches, vectorized pandas
    ops, NULL pass-through for quarantined decodes, stable schema) is the
    part under test. Pure pandas arithmetic per batch — no per-row Python.
    """

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = batch.copy()
            ok = out["width"].notna() & out["height"].notna()
            area = (out.loc[ok, "width"] * out.loc[ok, "height"]).astype("float64")
            scale = (target_w * target_h) / area
            out.loc[ok, "feature"] = pd.Series(
                [
                    [x * s for x in feat] if feat is not None else None
                    for feat, s in zip(out.loc[ok, "feature"], scale)
                ],
                index=out.index[ok],
            )
            out.loc[ok, "width"] = target_w
            out.loc[ok, "height"] = target_h
            yield out

    return df.mapInPandas(resize_batches, DECODED_SCHEMA)


def sample_frames(
    df: DataFrame,
    n_frames_col: str,
    every: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame sampling plan for video-shaped media: one row per sampled
    frame index (pure explode — the decode of each frame happens in a
    later decode_media-style stage). No Python, no shuffle."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every))
        ).alias("frame_idx"),
    )
