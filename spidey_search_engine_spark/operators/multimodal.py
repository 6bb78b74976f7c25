"""Multimodal column plumbing (image/audio/video as opaque binary).

The Spark-side contract is real and tested: schema (payload:binary + typed
metadata struct), Arrow batch shape, partitioning, and mapInPandas UDF
signatures. The actual decode/feature kernels are STUBBED — the container
has no image/audio libraries — behind ``_decode_image``/``_decode_audio``:
each either raises NotImplementedError (strict mode) or produces a
deterministic fake derived from the payload bytes (test mode), so the
pipeline shape is exercisable end-to-end without the codec.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

IMAGE_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("sha256", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("feature", ArrayType(FloatType())),
])


def _decode_image(payload: bytes, fake: bool):
    """STUB: real impl would decode via PIL/libjpeg. Deterministic fake:
    dims + feature vector derived from the payload digest."""
    if not fake:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "run with fake=True for pipeline testing")
    h = hashlib.sha256(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    feat = (np.frombuffer(h, dtype=np.uint8)[:8].astype(np.float32) / 255.0)
    return width, height, feat


def image_features(df: DataFrame, payload_col: str = "payload",
                   id_col: str = "doc_id", fake: bool = True) -> DataFrame:
    """Decode+featurize images over mapInPandas: Arrow-batched binary in,
    typed metadata + feature vector out. Partitioning is preserved — at
    scale run after `repartition(n)` sized so one batch of payloads fits
    executor memory (payloads are the dominant bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                w, h, feat = _decode_image(data, fake)
                rows.append((int(doc_id), len(data),
                             hashlib.sha256(data).hexdigest(), w, h,
                             [float(x) for x in feat]))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              IMAGE_META_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(
        gen, schema=IMAGE_META_SCHEMA)


def frame_sample_plan(df: DataFrame, payload_col: str = "payload",
                      id_col: str = "doc_id", every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan* (stub kernel): emits (doc_id, frame_no)
    rows for frames ≡ 0 (mod every_n) based on a fake frame count derived
    from payload length — the explode/partition shape of the real op."""
    n_frames = (F.octet_length(F.col(payload_col)) / 1024).cast("int") + 1
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no")
    ).filter(F.col("frame_no") % every_n == 0)


RESIZED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("payload", BinaryType()),
])


def resize_images(df: DataFrame, target_w: int, target_h: int,
                  payload_col: str = "payload", id_col: str = "doc_id",
                  fake: bool = True) -> DataFrame:
    """Resize plumbing: binary in → (fixed dims, binary out) per Arrow
    batch. STUB kernel (real impl: PIL resize); the deterministic fake
    re-digests the payload to a target_w·target_h-byte pseudo-bitmap so
    output size actually scales with the target dims — the memory/batch
    shape the real kernel would have."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                if not fake:
                    raise NotImplementedError(
                        "image codec not available in this environment")
                seed = hashlib.sha256(data).digest()
                need = target_w * target_h
                out = (seed * (need // len(seed) + 1))[:need]
                rows.append((int(doc_id), target_w, target_h, out))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              RESIZED_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(
        gen, schema=RESIZED_SCHEMA)


AUDIO_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("sample_rate", IntegerType()),
    StructField("duration_sec", FloatType()),
    StructField("mfcc", ArrayType(FloatType())),
])


def audio_features(df: DataFrame, payload_col: str = "payload",
                   id_col: str = "doc_id", fake: bool = True) -> DataFrame:
    """Audio decode+featurize plumbing (STUB kernel — real impl:
    soundfile/librosa): sample rate/duration + a 13-dim MFCC-shaped
    feature vector, deterministically faked from the payload digest."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                if not fake:
                    raise NotImplementedError(
                        "audio codec not available in this environment")
                h = hashlib.sha256(data).digest()
                sr = (8000, 16000, 22050, 44100)[h[2] % 4]
                dur = len(data) / float(sr)
                mfcc = (np.frombuffer(h, dtype=np.uint8)[:13]
                        .astype(np.float32) / 255.0 - 0.5)
                rows.append((int(doc_id), len(data), sr, dur,
                             [float(x) for x in mfcc]))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              AUDIO_META_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(
        gen, schema=AUDIO_META_SCHEMA)


def text_as_binary(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Adapter used by tests: treat a text column as an opaque payload."""
    return df.select(F.col(id_col),
                     F.encode(F.col(text_col), "UTF-8").alias("payload"))
