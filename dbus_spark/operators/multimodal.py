"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct — the Spark-side plumbing (schema, Arrow batch
shape, ``mapInPandas`` signature, partition sizing) is real and tested.
Decoders: ``fake_decoder`` is the deterministic byte-hash "decode" the
driver oracle can value-check exactly; ``real_decoder`` (round 6)
actually decodes PNG and PCM-WAV payloads via the dependency-free
in-repo codecs (operators/codecs.py — stdlib zlib/wave + numpy) and
raises NotImplementedError only for entropy-coded formats (JPEG/MP4/
Opus) that genuinely need PIL/pyav.

Scale notes: decode is the textbook mapInPandas case — pure map-side,
no shuffle, CPU-bound — so throughput scales with executors as long as
input splits stay balanced; keep ``spark.sql.files.maxPartitionBytes``
small enough that a partition of heavy blobs fits in executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # png|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def attach_fake_media(
    df: DataFrame, id_col: str = "doc_id", n_bytes: int = 256
) -> DataFrame:
    """Deterministic fake binary payload per row (test fixture):
    content = repeated md5 bytes of the id — no RNG, replay-stable."""
    hex_blob = F.md5(F.col(id_col).cast("string"))
    repeats = (n_bytes + 15) // 16
    return df.withColumn(
        "content", F.to_binary(F.repeat(hex_blob, repeats), F.lit("hex"))
    ).withColumn(
        "media_meta",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            F.lit(16).alias("width"),
            F.lit(16).alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ),
    )


def fake_decoder(content: bytes, n_features: int = 8) -> np.ndarray:
    """Deterministic stand-in for image decode + feature extraction:
    features = normalized digest bytes of md5 over the content's hex
    text — stable across runs, shaped like a real embedding head's
    output. Hashing the hex TEXT (not the raw bytes) keeps the fixture
    reproducible in engines whose md5 only accepts strings (DuckDB), so
    the driver oracle can value-check this path exactly."""
    h = hashlib.md5(content.hex().encode("ascii")).digest()
    raw = np.frombuffer((h * ((n_features // 16) + 1))[:n_features], np.uint8)
    return (raw.astype(np.float32) / 255.0).round(4)


def real_decoder(content: bytes, n_features: int = 8) -> np.ndarray:
    """Real decode + feature extraction for the formats the in-repo
    dependency-free codecs cover (operators/codecs.py): PNG (8-bit
    grey/RGB/RGBA, all five scanline filters) and 16-bit PCM WAV —
    sniffed by magic bytes, features from the decoded pixels/samples
    (stats head, same float32[n] shape as fake_decoder).  JPEG / MP4 /
    Opus remain NotImplemented: entropy-coded formats are genuine
    library territory (PIL/pyav), and this container has neither the
    libraries nor a network to fetch them — the error names the
    plug-in point."""
    from dbus_spark.operators import codecs

    if content[:8] == codecs.PNG_SIG:
        return codecs.image_features(
            codecs.decode_png(content), n_features
        )
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        samples, rate = codecs.decode_wav(content)
        return codecs.audio_features(samples, rate, n_features)
    raise NotImplementedError(
        "unrecognized media payload: in-repo codecs cover PNG and PCM "
        "WAV; JPEG/MP4/Opus need PIL/pyav plugged in here — the Spark "
        "plumbing does not change"
    )


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """Resize plumbing: same mapInPandas shape as feature extraction;
    the codec is stubbed (no PIL in container) with a deterministic
    byte-slice 'resize' so the batch/schema path is testable. Output
    keeps the binary column plus updated metadata."""

    def do(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height // 64 or 1
        for pdf in it:
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "content": [
                        (c * ((target // max(len(c), 1)) + 1))[:target]
                        for c in pdf[content_col]
                    ],
                    "width": width,
                    "height": height,
                }
            )
            yield out

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    return df.select(id_col, content_col).mapInPandas(do, schema=schema)


def sample_frames(
    df: DataFrame,
    every_n: int = 4,
    id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    sampled 'frame' (here: fixed-size byte window — the pyav decode is
    the stub). Demonstrates the 1→N generator shape under mapInPandas,
    which is what a real decoder needs."""
    frame_bytes = 16

    def do(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for i, c in zip(pdf[id_col], pdf[content_col]):
                n = max(len(c) // frame_bytes, 1)
                for k in range(0, n, every_n):
                    ids.append(int(i))
                    idxs.append(k)
                    frames.append(
                        bytes(c[k * frame_bytes : (k + 1) * frame_bytes])
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )
    return df.select(id_col, content_col).mapInPandas(do, schema=schema)


def extract_media_features(
    df: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = fake_decoder,
    id_col: str = "doc_id",
    content_col: str = "content",
    batch_hint: int = 1024,
) -> DataFrame:
    """Decode/feature-extract via ``mapInPandas`` (Arrow batches).

    The generator processes whole Arrow batches, holding one batch in
    memory at a time — the pattern that survives blobs at 100 TB. The
    decoder is row-local so the stage is map-side only.
    """

    def decode_batches(
        it: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decoder(c) for c in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf[content_col].str.len().astype("int32"),
                    "features": [f.tolist() for f in feats],
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        decode_batches, schema=FEATURE_SCHEMA
    )
