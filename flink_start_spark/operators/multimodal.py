"""Multimodal binary-column plumbing (SURVEY §2b).

Contract: image/audio/video payloads travel as opaque ``binary`` columns
beside a typed metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched Pandas functions over
``mapInPandas`` — per-partition batch iterators, so a 100 TB corpus
streams through Python in Arrow batches with no driver involvement and
no per-row pickling.

The image/audio codec libraries are not in this container, so the decode
step is STUBBED: ``decode_stub`` raises NotImplementedError and
``fake_decode`` produces a deterministic fake (documented below). The
Spark-side plumbing — schema, batch iteration, partitioning, UDF
signatures — is real and oracle-tested (metadata extraction over real
bytes).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Output schema for binary metadata extraction.
BINARY_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256_8", T.StringType(), False),
        T.StructField("first_byte", T.IntegerType(), True),
    ]
)

#: Fake "decoded media" feature schema (stands in for image embeddings /
#: audio features until real codecs are available).
FAKE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_intensity", T.DoubleType(), False),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a binary column (UTF-8 bytes of ``text_col``) + metadata
    struct — the ingestion shape a real multimodal table would have
    (payload from object storage, metadata from the manifest)."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.col(text_col)).alias("declared_len"),
        ).alias("meta"),
    )


def binary_metadata(df: DataFrame) -> DataFrame:
    """Extract per-payload metadata via mapInPandas (Arrow batches).

    This is the template every real decode follows: iterate Arrow
    batches, vectorize per batch, yield frames matching the declared
    schema. hashlib/sha256 here stands where PIL/ffmpeg would run.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256_8": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()[:8]
                    ),
                    "first_byte": payloads.map(
                        lambda b: int(b[0]) if len(b) else None
                    ).astype("Int32"),
                }
            )

    return df.mapInPandas(extract, schema=BINARY_META_SCHEMA)


def decode_stub(df: DataFrame) -> DataFrame:
    """Real decode entry point — requires codec libs absent from this
    container. Kept as the documented integration point."""
    raise NotImplementedError(
        "media decode requires PIL/torchaudio/ffmpeg, not available in "
        "this environment; use fake_decode for pipeline testing"
    )


#: Frame-sample output: one row per sampled "frame" of a payload.
FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_offset", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def fake_frame_sample(df: DataFrame, n_frames: int = 4, frame_bytes: int = 16) -> DataFrame:
    """Frame sampling plumbing (video → k evenly spaced frames), decoder
    stubbed: "frames" are ``frame_bytes``-byte slices at evenly spaced
    offsets of the payload. The real implementation swaps the slicing
    for ffmpeg keyframe extraction; the Spark-side shape — one payload
    row in, k typed frame rows out via mapInPandas — is exactly this.
    Payloads shorter than ``frame_bytes`` yield a single whole-payload
    frame; empty payloads yield nothing.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if not b:
                    continue
                if len(b) <= frame_bytes:
                    offsets = [0]
                else:
                    span = len(b) - frame_bytes
                    offsets = sorted({span * i // max(n_frames - 1, 1) for i in range(n_frames)})
                for idx, off in enumerate(offsets):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_offset"].append(off)
                    out["frame"].append(b[off : off + frame_bytes])
            yield pd.DataFrame(out)

    return df.mapInPandas(sample, schema=FRAME_SAMPLE_SCHEMA)


def fake_decode(df: DataFrame) -> DataFrame:
    """Deterministic fake decode: pretends each payload is an image whose
    dimensions/intensity derive from its sha256. Exercises the exact
    mapInPandas shape (batch iterator, Arrow transfer, typed schema) a
    real decoder uses."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf["payload"].map(lambda b: hashlib.sha256(bytes(b)).digest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": digests.map(lambda d: 64 + d[0] % 192).astype("int32"),
                    "height": digests.map(lambda d: 64 + d[1] % 192).astype("int32"),
                    "mean_intensity": digests.map(lambda d: d[2] / 255.0),
                }
            )

    return df.mapInPandas(decode, schema=FAKE_FEATURE_SCHEMA)
