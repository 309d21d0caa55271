"""Multimodal binary-column plumbing (SURVEY §2b).

Contract: image/audio/video payloads travel as opaque ``binary`` columns
beside a typed metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched Pandas functions over
``mapInPandas`` — per-partition batch iterators, so a 100 TB corpus
streams through Python in Arrow batches with no driver involvement and
no per-row pickling.

Both decodes are REAL container parses. Audio: ``pcm_decode`` parses a
fixed binary layout — an 8-byte header (magic 'PCM1', uint16-BE sample
rate, uint16-BE sample count) followed by int16-BE PCM samples — with
``struct``/``numpy.frombuffer`` inside mapInPandas and emits audio
features (duration, mean/peak amplitude, RMS). Image: ``ppm_decode``
parses the netpbm PPM (P6) container — tokenized ASCII header with
comment support, then the raw RGB raster — and emits per-channel
statistics. ``with_pcm_payload`` / ``with_ppm_payload`` synthesize
valid payloads deterministically from the text column so both decodes
are oracle-checkable end to end; a production pipeline swaps only the
raster/sample parse for a codec library (PIL/ffmpeg, absent in this
container), keeping the identical Spark-side plumbing.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
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

#: Real image-decode output schema (per-channel raster statistics).
PPM_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("maxval", T.IntegerType(), False),
        T.StructField("n_px_bytes", T.LongType(), False),
        T.StructField("mean_r", T.DoubleType(), False),
        T.StructField("mean_g", T.DoubleType(), False),
        T.StructField("mean_b", T.DoubleType(), False),
        T.StructField("max_px", T.IntegerType(), False),
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


#: PCM payload layout (all multi-byte fields big-endian):
#:   bytes 0-3   magic 'PCM1'
#:   bytes 4-5   uint16 sample rate (Hz)
#:   bytes 6-7   uint16 sample count n
#:   bytes 8-..  n x int16 samples
PCM_MAGIC = b"PCM1"
PCM_RATE = 8000

#: Real-decode output schema (audio features).
PCM_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("header_hex", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("duration_ms", T.DoubleType(), False),
        T.StructField("mean_amp", T.DoubleType(), False),
        T.StructField("peak_amp", T.LongType(), False),
        T.StructField("rms", T.DoubleType(), False),
    ]
)


def with_pcm_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a binary payload in the fixed PCM layout above, derived
    deterministically from ``text_col``: sample i is UTF-8 byte i of
    the text duplicated into both octets (value ``b*257``, int16
    two's-complement — bytes >= 0x80 go negative). Pure string
    projections — ``hex(text)`` then ONE regexp doubling each byte
    pair — so the build is engine-portable and costs no per-char
    arrays (the first version's per-char ``transform`` chain was 5x
    slower, measured at sf0.1). For ASCII text (the whole corpus;
    pinned by the binary-meta oracle) byte == code point, so the
    oracle's ``(ascii(c)*257) % 2^16`` formula is byte-identical."""
    text = F.col(text_col)
    n = F.least(F.octet_length(text), F.lit(65535))
    sample_hex = F.substring(
        F.regexp_replace(F.hex(text), "(..)", "$1$1"), 1, 65535 * 4
    )
    header_hex = F.concat(
        F.lit(PCM_MAGIC.hex().upper()),
        F.lpad(F.hex(F.lit(PCM_RATE)), 4, "0"),
        F.lpad(F.hex(n), 4, "0"),
    )
    return df.select(
        "doc_id", F.unhex(F.concat(header_hex, sample_hex)).alias("payload")
    )


def pcm_decode(df: DataFrame) -> DataFrame:
    """REAL binary decode: parse the PCM header with ``struct.unpack``,
    the sample block with ``numpy.frombuffer``, and emit audio features
    — the actual decode shape (header parse → typed sample array →
    per-payload features) a production audio pipeline runs, minus only
    the codec library. Arrow-batched mapInPandas; nothing touches the
    driver."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in PCM_FEATURE_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != PCM_MAGIC:
                    raise ValueError(f"doc {doc_id}: bad magic {b[:4]!r}")
                rate, n = struct.unpack(">HH", b[4:8])
                samples = np.frombuffer(b[8 : 8 + 2 * n], dtype=">i2").astype(
                    np.int64
                )
                out["doc_id"].append(doc_id)
                out["header_hex"].append(b[:8].hex().upper())
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                # No round() on the features: every partial sum here is an
                # integer-valued float64 below 2^53 (|v| <= 32768, n <=
                # 65535), so mean/rms are bit-identical across engines at
                # full precision — while Python round (banker's) vs DuckDB
                # round (half-away) could disagree on exact halves.
                out["duration_ms"].append(n * 1000.0 / rate)
                out["mean_amp"].append(float(samples.mean()) if n else 0.0)
                out["peak_amp"].append(int(np.abs(samples).max()) if n else 0)
                out["rms"].append(
                    float(np.sqrt((samples.astype(np.float64) ** 2).mean()))
                    if n
                    else 0.0
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(decode, schema=PCM_FEATURE_SCHEMA)


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


def with_ppm_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a binary payload that is a VALID binary PPM (P6) image —
    ASCII header ``P6\\n{w} {h}\\n255\\n`` followed by ``w*h*3`` RGB
    raster bytes — derived deterministically from ``text_col``:

    - ``w = 4 + n % 5`` and ``h = 4 + (n // 7) % 5`` (n = byte length
      of the text), so rasters are 4x4..8x8;
    - raster byte ``j`` is text byte ``j % n`` (zeros for empty text).

    Same engine-portable construction discipline as
    :func:`with_pcm_payload`: hex-string projections + one ``unhex``,
    no per-byte arrays, so the DuckDB oracle can rebuild every payload
    byte from ``hex(encode(text))`` and the decode is value-checked
    end to end. The output opens in any PPM viewer — this is a real
    image container, not a placeholder layout."""
    text = F.col(text_col)
    n = F.octet_length(text).cast("long")
    w = (F.lit(4) + F.pmod(n, F.lit(5))).cast("int")
    h = (F.lit(4) + F.pmod(F.floor(n / F.lit(7)), F.lit(5))).cast("int")
    npix = (w.cast("long") * h.cast("long") * F.lit(3)).cast("long")
    header_hex = F.hex(
        F.concat(
            F.lit("P6\n"),
            w.cast("string"),
            F.lit(" "),
            h.cast("string"),
            F.lit("\n255\n"),
        )
    )
    # raster = first npix bytes of text repeated end-to-end (hex form:
    # 2 chars/byte); empty text degenerates to an all-zero raster
    pixel_hex = F.when(
        n > 0,
        F.substring(
            F.repeat(F.hex(text), F.ceil(npix / n).cast("int")),
            1,
            (npix * 2).cast("int"),
        ),
    ).otherwise(F.repeat(F.lit("00"), npix.cast("int")))
    return df.select(
        "doc_id", F.unhex(F.concat(header_hex, pixel_hex)).alias("payload")
    )


def ppm_decode(df: DataFrame) -> DataFrame:
    """REAL image decode: parse the PPM (P6) container — tokenized
    ASCII header (magic, width, height, maxval, with ``#`` comment
    support per the netpbm spec) then the raw RGB raster via
    ``numpy.frombuffer`` — and emit per-channel raster statistics.
    This is the decode shape an image pipeline runs (header parse →
    typed pixel array → per-image features), the image sibling of
    :func:`pcm_decode`; a codec library would only swap the raster
    parse for JPEG/PNG entropy decode. Means/max are exact (integer
    sums below 2^53 in float64), so the oracle matches bit-for-bit.
    Arrow-batched mapInPandas; nothing touches the driver."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in PPM_FEATURE_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:2] != b"P6":
                    raise ValueError(f"doc {doc_id}: bad magic {b[:2]!r}")
                pos, vals = 2, []
                while len(vals) < 3:
                    while pos < len(b) and b[pos : pos + 1].isspace():
                        pos += 1
                    if b[pos : pos + 1] == b"#":  # netpbm comment line
                        while pos < len(b) and b[pos : pos + 1] != b"\n":
                            pos += 1
                        continue
                    start = pos
                    while pos < len(b) and b[pos : pos + 1].isdigit():
                        pos += 1
                    if pos == start:
                        raise ValueError(f"doc {doc_id}: malformed header")
                    vals.append(int(b[start:pos]))
                w, h, maxval = vals
                # contract checks BEFORE touching the raster, each with
                # a doc-addressed error (a silent misparse would emit
                # plausible-but-wrong stats): maxval > 255 means
                # 2-byte-BE samples per the netpbm spec — out of this
                # decoder's 1-byte contract, so refuse rather than read
                # the raster at the wrong stride; zero dims would make
                # raster.max() raise numpy's opaque zero-size error;
                # the single byte after maxval must be whitespace.
                if not (0 < maxval <= 255):
                    raise ValueError(
                        f"doc {doc_id}: maxval {maxval} outside the "
                        "1-byte-sample contract (1..255)"
                    )
                if w < 1 or h < 1:
                    raise ValueError(f"doc {doc_id}: empty raster {w}x{h}")
                if not b[pos : pos + 1].isspace():
                    raise ValueError(
                        f"doc {doc_id}: expected whitespace after maxval, "
                        f"got {b[pos:pos + 1]!r}"
                    )
                pos += 1  # exactly one whitespace byte after maxval
                raster = np.frombuffer(
                    b[pos : pos + w * h * 3], dtype=np.uint8
                )
                if raster.size != w * h * 3:
                    raise ValueError(
                        f"doc {doc_id}: truncated raster "
                        f"({raster.size} of {w * h * 3} bytes)"
                    )
                if len(b) - pos > w * h * 3:
                    # refuse-rather-than-misparse both directions: an
                    # oversized payload means the header lied about the
                    # dims (or the container carries junk) — stats over
                    # a silently-cropped raster would be plausible but
                    # wrong, the same failure mode as a truncated read
                    raise ValueError(
                        f"doc {doc_id}: {len(b) - pos - w * h * 3} trailing "
                        f"bytes after the {w * h * 3}-byte raster"
                    )
                rgb = raster.reshape(-1, 3).astype(np.int64)
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["maxval"].append(maxval)
                out["n_px_bytes"].append(raster.size)
                out["mean_r"].append(float(rgb[:, 0].mean()))
                out["mean_g"].append(float(rgb[:, 1].mean()))
                out["mean_b"].append(float(rgb[:, 2].mean()))
                out["max_px"].append(int(raster.max()))
            yield pd.DataFrame(out)

    return df.mapInPandas(decode, schema=PPM_FEATURE_SCHEMA)


#: Resample output: the re-encoded payload plus audit fields.
PCM_RESAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_in", T.LongType(), False),
        T.StructField("n_out", T.LongType(), False),
        T.StructField("rate_out", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def pcm_resample(df: DataFrame, factor: int = 2) -> DataFrame:
    """REAL media resize, audio edition: decimate each PCM payload by
    ``factor`` (keep samples 0, factor, 2*factor, …) and re-encode a
    valid payload at ``rate/factor`` — the decode → transform →
    re-encode round trip every resize/resample pipeline runs (an image
    resize swaps the numpy slicing for interpolation; the Spark-side
    shape is identical). Header is re-written with the new rate and
    count; the output is a decodable payload, not just features.

    Arrow-batched mapInPandas, one row in → one row out, zero shuffle
    at any scale.
    """

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in PCM_RESAMPLE_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != PCM_MAGIC:
                    raise ValueError(f"doc {doc_id}: bad magic {b[:4]!r}")
                rate, n = struct.unpack(">HH", b[4:8])
                samples = np.frombuffer(b[8 : 8 + 2 * n], dtype=">i2")
                kept = samples[::factor]
                rate_out = rate // factor
                hdr = PCM_MAGIC + struct.pack(">HH", rate_out, len(kept))
                out["doc_id"].append(doc_id)
                out["n_in"].append(n)
                out["n_out"].append(len(kept))
                out["rate_out"].append(rate_out)
                out["payload"].append(hdr + kept.tobytes())
            yield pd.DataFrame(out)

    return df.mapInPandas(resample, schema=PCM_RESAMPLE_SCHEMA)
