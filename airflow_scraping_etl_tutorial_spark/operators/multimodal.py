"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed by Arrow-batched mapInPandas operators.

The Spark-side plumbing is REAL and tested: schemas, partitioning,
Arrow batch shapes, UDF signatures, and the parquet round-trip. The
actual media decoding is STUBBED — the image/audio libraries are not in
this container — behind ``decoder=`` injection points:

- default decoder = deterministic fake (byte-derived features), so
  tests and pipelines run end-to-end;
- ``strict_decoder`` raises NotImplementedError with the exact swap-in
  instructions (PIL/librosa/pyav), marking the production boundary.

Scale: media bytes are the heaviest column in any multimodal corpus.
The operators therefore (a) never shuffle the binary column — feature
extraction is map-only; (b) process in Arrow batches sized by Spark's
``maxRecordsPerBatch``; (c) project metadata early so plans that don't
touch bytes never read them (parquet column pruning does this for free).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.partitioning import fan_out

# One row per media object: opaque bytes + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # 'image' | 'audio' | 'video'
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def fake_decode(content: bytes) -> list[float]:
    """Deterministic stand-in for a real decode+featurize: FEATURE_DIM
    floats derived from the sha256 digest. Stable across runs/machines,
    so downstream joins/ANN over the feature column are testable."""
    digest = hashlib.sha256(content).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def strict_decoder(content: bytes) -> list[float]:
    """The production decode boundary. Swap in a real implementation:
    image -> PIL.Image.open(io.BytesIO(content)) + a vision embedder;
    audio -> soundfile/librosa frames; video -> pyav keyframe sampling.
    None of those libraries ship in this container."""
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in "
        "this environment; inject decoder=fake_decode for testing"
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: the documents fixture re-typed as a media table (text
    bytes standing in for image bytes) so the multimodal plumbing has a
    real corpus to run on."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], list[float]] = fake_decode,
) -> DataFrame:
    """Decode/featurize each media object via Arrow-batched mapInPandas.

    The UDF boundary receives pandas DataFrames (one per Arrow batch) and
    yields FEATURE_SCHEMA batches — the decoder runs per row inside the
    batch, but serialization is per ~10k-row Arrow chunk, not per row.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": content.map(len).astype("int64"),
                    "content_sha256": content.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "feature": content.map(decoder),
                }
            )

    return fan_out(media).mapInPandas(featurize, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize: plumbing real (binary in -> binary out, map-only),
    pixel work stubbed — the fake 'resize' truncates/pads bytes to a
    deterministic length so batch shapes and schemas are exercised."""
    target = width * height // 64 + 1

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["content"] = pdf["content"].map(
                lambda b: bytes(b[:target]).ljust(target, b"\0")
            )
            meta = pdf["meta"].map(
                lambda m: {**(m or {}), "resized": f"{width}x{height}"}
            )
            pdf["meta"] = meta
            yield pdf

    return media.mapInPandas(do_resize, MEDIA_SCHEMA)


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: one row in -> k rows out (the UDTF-shaped
    multimodal op). The fake samples byte-slices as 'frames'; a real
    implementation yields decoded keyframes. Output demonstrates the
    1->N mapInPandas row-expansion contract."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = r["content"] or b""
                n_frames = max(len(content) // (every_n * 16), 1)
                for f_no in range(n_frames):
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_no": f_no,
                            "frame": bytes(
                                content[f_no * every_n * 16 : (f_no + 1) * every_n * 16]
                            ),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame"])

    return fan_out(media).mapInPandas(sample, out_schema)
