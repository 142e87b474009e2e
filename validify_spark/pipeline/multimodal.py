"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
operators.

The actual codec work (image decode, audio resample, video frame
extraction) needs libraries not present in this container — those steps
are STUBBED behind ``decode_fn`` hooks that either raise
NotImplementedError (default in strict mode) or produce a deterministic
fake derived from the bytes (test mode). Everything Spark-side — schema,
batching, partitioning, UDF signatures — is real and tested, so swapping
in a real decoder is a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# canonical multimodal schema fragments
MEDIA_META_DDL = ("struct<media_type:string,format:string,"
                  "width:int,height:int,duration_ms:int,n_bytes:long>")

IMAGE_FEATURES_DIM = 16


def attach_fake_blob(df: DataFrame, text_col: str = "text",
                     media_type: str = "image") -> DataFrame:
    """Deterministic stand-in media: bytes derived from the text column
    (so tests have a binary column with realistic plumbing)."""
    return (df
            .withColumn("blob", F.encode(F.col(text_col), "UTF-8")
                        .cast("binary"))
            .withColumn("media_meta", F.struct(
                F.lit(media_type).alias("media_type"),
                F.lit("fake/raw").alias("format"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("int").alias("duration_ms"),
                F.octet_length(F.col(text_col)).cast("long")
                 .alias("n_bytes"))))


def _fake_decode(blob: bytes) -> dict:
    """Deterministic fake 'decode': dimensions + checksum derived from
    the byte content. CLEARLY A STUB — replace with a real codec."""
    h = hashlib.md5(blob).digest()
    return {
        "width": 16 + h[0] % 64,
        "height": 16 + h[1] % 64,
        "checksum": h.hex(),
    }


def decode_media(df: DataFrame, id_col: str = "doc_id",
                 blob_col: str = "blob",
                 decode_fn: Optional[Callable[[bytes], dict]] = None,
                 strict: bool = False,
                 batch_note: str = "decode") -> DataFrame:
    """mapInPandas decode pass: binary → (width, height, checksum).

    strict=True raises NotImplementedError (no codec in this container);
    otherwise uses the deterministic fake decoder. The iterator-of-
    batches shape is the real production plumbing: one Arrow batch in,
    one out, no per-row Python calls outside the batch loop."""
    if strict and decode_fn is None:
        raise NotImplementedError(
            "no media codec available in this environment; supply "
            "decode_fn (e.g. PIL/ffmpeg-backed) to decode_media()")
    fn = decode_fn or _fake_decode

    out_schema = f"{id_col} long, width int, height int, checksum string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [fn(b) if b is not None else
                       {"width": None, "height": None, "checksum": None}
                       for b in pdf[blob_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "width": [d["width"] for d in decoded],
                "height": [d["height"] for d in decoded],
                "checksum": [d["checksum"] for d in decoded],
            })

    return df.select(id_col, blob_col).mapInPandas(run, schema=out_schema)


def resize_media(df: DataFrame, width: int, height: int,
                 id_col: str = "doc_id", blob_col: str = "blob",
                 resize_fn: Optional[Callable[[bytes, int, int],
                                              bytes]] = None,
                 strict: bool = False) -> DataFrame:
    """mapInPandas resize pass: binary → (width, height, checksum of
    the resized bytes). Same stub contract as decode_media: the real
    resampler plugs in via ``resize_fn``; the default produces
    deterministic fake output (md5(md5(blob) || '-WxH')) so the full
    Arrow plumbing is value-checkable against a SQL oracle."""
    if strict and resize_fn is None:
        raise NotImplementedError(
            "no image codec available in this environment; supply "
            "resize_fn (e.g. PIL-backed) to resize_media()")

    out_schema = (f"{id_col} long, width int, height int, "
                  f"resized_checksum string")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sums = []
            for b in pdf[blob_col]:
                if b is None:
                    sums.append(None)
                elif resize_fn is not None:
                    sums.append(hashlib.md5(
                        resize_fn(bytes(b), width, height)).hexdigest())
                else:
                    inner = hashlib.md5(bytes(b)).hexdigest()
                    sums.append(hashlib.md5(
                        f"{inner}-{width}x{height}".encode()).hexdigest())
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "width": width, "height": height,
                "resized_checksum": sums,
            })

    return df.select(id_col, blob_col).mapInPandas(run, schema=out_schema)


def decode_and_resize(df: DataFrame, width: int, height: int,
                      id_col: str = "doc_id", blob_col: str = "blob",
                      decode_fn: Optional[Callable[[bytes], dict]] = None,
                      resize_fn: Optional[Callable[[bytes, int, int],
                                                   bytes]] = None,
                      strict: bool = False) -> DataFrame:
    """Decode AND resize in ONE Arrow pass: where a pipeline needs both
    outputs, composing decode_media + resize_media costs two full
    mapInPandas passes over the blobs plus a join to recombine — this
    fused operator reads each blob once and emits
    (width, height, checksum, resized_checksum) together. Same stub
    contract as the single-op versions."""
    if strict and (decode_fn is None or resize_fn is None):
        raise NotImplementedError(
            "no media codec available in this environment; supply "
            "decode_fn and resize_fn to decode_and_resize()")
    dfn = decode_fn or _fake_decode

    out_schema = (f"{id_col} long, width int, height int, "
                  f"checksum string, resized_checksum string")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, cs, rs = [], [], [], []
            for b in pdf[blob_col]:
                if b is None:
                    ws.append(None); hs.append(None)
                    cs.append(None); rs.append(None)
                    continue
                d = dfn(bytes(b))
                ws.append(d["width"]); hs.append(d["height"])
                cs.append(d["checksum"])
                if resize_fn is not None:
                    rs.append(hashlib.md5(
                        resize_fn(bytes(b), width, height)).hexdigest())
                else:
                    # EXACTLY resize_media's stub: md5(md5(blob)||-WxH)
                    # from the RAW bytes — not the decoder's checksum,
                    # which a custom decode_fn may define differently
                    inner = hashlib.md5(bytes(b)).hexdigest()
                    rs.append(hashlib.md5(
                        f"{inner}-{width}x{height}"
                        .encode()).hexdigest())
            yield pd.DataFrame({
                id_col: pdf[id_col], "width": ws, "height": hs,
                "checksum": cs, "resized_checksum": rs,
            })

    return df.select(id_col, blob_col).mapInPandas(run, schema=out_schema)


def extract_features(df: DataFrame, id_col: str = "doc_id",
                     blob_col: str = "blob",
                     dim: int = IMAGE_FEATURES_DIM) -> DataFrame:
    """Stub feature extractor: fixed-dim float vector deterministically
    derived from the bytes (md5-seeded). Real plumbing: Arrow batches,
    array<float> output column ready for the similarity operators."""
    import numpy as np

    out_schema = f"{id_col} long, features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[blob_col]:
                if b is None:
                    feats.append(None)
                    continue
                seed = hashlib.md5(b).digest()
                arr = np.frombuffer(
                    (seed * ((dim * 4) // len(seed) + 1))[: dim * 4],
                    dtype=np.uint8).astype(np.float32)
                arr = arr.reshape(dim, 4).mean(axis=1) / 255.0
                feats.append([float(x) for x in arr])
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, blob_col).mapInPandas(run, schema=out_schema)


def frame_sample_plan(df: DataFrame, id_col: str = "doc_id",
                      meta_col: str = "media_meta",
                      every_ms: int = 1000) -> DataFrame:
    """Pure-SQL frame-sampling plan for video rows: one output row per
    planned frame timestamp (the decode of each frame is the stubbed
    step). Demonstrates the explode-based fan-out shape used for
    frame-level pipelines."""
    dur = F.coalesce(F.col(f"{meta_col}.duration_ms"), F.lit(0))
    ts = F.sequence(F.lit(0), F.greatest(dur - 1, F.lit(0)),
                    F.lit(every_ms))
    return (df
            .withColumn("frame_ms", F.explode(ts))
            .select(id_col, "frame_ms"))
