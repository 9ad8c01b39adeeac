"""Multimodal columns — image/audio/video as opaque ``binary`` with typed
metadata; decode/feature-extract as Arrow-batched stubs.

The training-data pipeline treats media exactly like this engine treats
``html``: an opaque binary column plus derived metadata, with the expensive
decode isolated in a mapInPandas stage. Three tiers:

* ``image_pixel_features`` / ``decode_image`` — REAL decoding for PNG via
  the dependency-free stdlib codec (operators/png_codec.py): inflate IDAT,
  reverse all five scanline filters, reduce actual pixel statistics.
  Oracle-verified end-to-end by the ``image_features`` pair: Spark
  round-trips a deterministic pixel law through encode→decode, DuckDB
  computes the same stats straight from the law.
* ``media_features`` — a deterministic fake extractor (md5-derived values)
  whose Spark-side plumbing (schema, Arrow batch shape, column pruning) is
  real and oracle-verified; swap ``_fake_feature_vector`` for a real model
  (CLIP et al.) and nothing else changes.
* ``decode_image`` on non-PNG formats — pillow when installed; a loud
  NotImplementedError otherwise (import-gated, never at module load).

``media_stats`` is pure column expressions (byte length, magic prefix,
content hash) — metadata extraction never leaves the JVM.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC_BYTES = 4


def media_stats(docs: DataFrame, media_col: str = "html") -> DataFrame:
    """(doc_id, n_bytes, magic, content_md5) — typed metadata over an
    opaque binary column; all JVM-side."""
    col = F.col(media_col)
    return docs.select(
        "doc_id",
        F.length(col).cast("long").alias("n_bytes"),
        F.lower(F.hex(F.substring(col, 1, MAGIC_BYTES))).alias("magic"),
        F.md5(col).alias("content_md5"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        # feature fields are nullable: a NULL media payload surfaces as a
        # row with NULL features (mirrors media_stats), never a task kill
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feat_hash", T.StringType(), True),
        T.StructField("feat0", T.LongType(), True),
        T.StructField("feat1", T.LongType(), True),
    ]
)


def _fake_feature_vector(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for a real encoder: md5 of the bytes plus two
    byte-slices of it as integers. Mirrored in oracle SQL so the Spark
    plumbing (batching, schema, ordering) is value-hash-verified."""
    import hashlib

    digest = hashlib.md5(bytes(payload)).hexdigest()
    return digest, int(digest[:8], 16), int(digest[8:16], 16)


def media_features(docs: DataFrame, media_col: str = "html") -> DataFrame:
    """Arrow-batched 'decode + featurize' stage over the binary column.
    Column-prunes to (doc_id, media) before the Python boundary."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            # a NULL payload yields NULL features (media_stats emits NULL
            # metadata for the same row) — bytes(None) would kill the task
            feats = [
                (None, None, None) if b is None else _fake_feature_vector(b)
                for b in pdf[media_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [
                        None if b is None else len(bytes(b))
                        for b in pdf[media_col]
                    ],
                    "feat_hash": [f[0] for f in feats],
                    "feat0": [f[1] for f in feats],
                    "feat1": [f[2] for f in feats],
                }
            )

    return docs.select("doc_id", media_col).mapInPandas(
        _extract, schema=FEATURE_SCHEMA
    )


FRAME_SIZE = 128  # bytes per "frame" of the opaque media payload
FRAME_SAMPLES = 4  # frames sampled per document


def frame_sample(
    docs: DataFrame,
    media_col: str = "html",
    frame_size: int = FRAME_SIZE,
    k: int = FRAME_SAMPLES,
) -> DataFrame:
    """(doc_id, frame_idx, byte_offset, frame_md5) — uniform frame sampling
    over an opaque binary column: the payload is viewed as consecutive
    ``frame_size``-byte frames; k evenly spaced frame indices are sampled
    (deduped when the payload has fewer than k frames) and each sampled
    frame's bytes are sliced and hashed.

    This is the video-frame-sampling SHAPE with the codec stubbed by
    byte-slicing: offsets, slicing, and hashing are REAL (pure column
    expressions — substring on binary stays JVM-side, no Python at all);
    a real deployment replaces the fixed frame_size with container-parsed
    frame offsets and the md5 with a frame encoder in a mapInPandas stage
    (media_features shows that plumbing). The fingerprint is md5 of the
    HEX of the frame bytes (both engines hex uppercase): DuckDB's md5
    only accepts VARCHAR, so hashing raw bytes could not be mirrored for
    payloads whose slices aren't valid UTF-8 — the adversarial-corpus
    sweep caught exactly that divergence on non-ASCII media."""
    col = F.col(media_col)
    n_frames = (F.length(col) / frame_size).cast("long")
    j = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    sampled = (
        docs.select("doc_id", col.alias("_media"), n_frames.alias("_nf"))
        .filter(F.col("_nf") > 0)
        .select("doc_id", "_media", "_nf", j)
        .withColumn(
            "frame_idx",
            (F.col("j") * F.col("_nf") / k).cast("long"),
        )
        .dropDuplicates(["doc_id", "frame_idx"])
    )
    offset = (F.col("frame_idx") * frame_size).cast("long")
    return sampled.select(
        "doc_id",
        "frame_idx",
        offset.alias("byte_offset"),
        F.md5(
            F.hex(
                F.substring(
                    F.col("_media"), offset.cast("int") + 1, frame_size
                )
            )
        ).alias("frame_md5"),
    )


IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mode", T.StringType(), True),
    ]
)


def decode_image(docs: DataFrame, media_col: str = "image") -> DataFrame:
    """REAL decode path. PNG payloads decode with the built-in
    dependency-free codec (operators/png_codec.py — stdlib zlib, all
    five filter types, CRC-checked); any other format uses pillow when
    installed. Only a non-PNG payload WITHOUT pillow raises
    NotImplementedError — loud, never a wrong pixel."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from .png_codec import PNG_SIG, png_decode

        try:
            from PIL import Image
        except ImportError:  # env-dependent; PNG still decodes
            Image = None

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[media_col]):
                if payload is None:
                    rows.append((doc_id, None, None, None))
                    continue
                b = bytes(payload)
                if b[:8] == PNG_SIG:
                    px, mode = png_decode(b)
                    rows.append((doc_id, px.shape[1], px.shape[0], mode))
                elif Image is not None:  # pragma: no cover - needs pillow
                    img = Image.open(io.BytesIO(b))
                    rows.append((doc_id, img.width, img.height, img.mode))
                else:
                    raise NotImplementedError(
                        "decode_image: non-PNG payload and pillow is not "
                        "installed; PNG decodes dependency-free"
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "mode"]
            )

    return docs.select("doc_id", media_col).mapInPandas(
        _decode, schema=IMAGE_SCHEMA
    )


# ------------------------------------------------- real pixel features

# Deterministic synthetic-image law, shared verbatim with the DuckDB
# oracle (image_features_sql): doc d gets a grayscale
# (8 + d%5) × (8 + d%3) image whose row-major pixel i has value
# (d·7919 + i) mod 256. The Spark path round-trips these pixels through
# a REAL PNG encode→decode (cycling row filters, so every unfilter
# branch runs); the oracle computes the same stats straight from the
# law — any codec bug breaks value-hash parity.
PIXEL_PRIME = 7919


def synth_png_images(docs: DataFrame, media_col: str = "image") -> DataFrame:
    """(doc_id, image: binary) — deterministic PNG payloads per document
    (the crafted-image fixture for the real decode path)."""
    import numpy as np

    from .png_codec import png_encode

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            imgs = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 8 + d % 5, 8 + d % 3
                v = (d * PIXEL_PRIME + np.arange(w * h)) % 256
                imgs.append(
                    png_encode(v.astype(np.uint8).reshape(h, w), filter_mode="cycle")
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], media_col: imgs})

    return docs.select("doc_id").mapInPandas(
        _synth,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField(media_col, T.BinaryType(), True),
            ]
        ),
    )


PIXEL_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("mean_px", T.DoubleType(), True),
        T.StructField("min_px", T.IntegerType(), True),
        T.StructField("max_px", T.IntegerType(), True),
    ]
)


def image_pixel_features(docs: DataFrame, media_col: str = "image") -> DataFrame:
    """(doc_id, width, height, channels, mean_px, min_px, max_px) — REAL
    pixel statistics from decoded PNG bytes (not the md5 stub): the
    dependency-free codec inflates IDAT, reverses the scanline filters,
    and the stats reduce over the actual pixel array. mean_px is the
    float64 mean rounded 4 dp (exact integer sum / count — bit-equal to
    the oracle's avg). NULL or undecodable payloads yield NULL features,
    mirroring media_features' row-preserving contract."""
    import numpy as np

    from .png_codec import png_decode

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[media_col]):
                if payload is None:
                    rows.append((int(doc_id), None, None, None, None, None, None))
                    continue
                try:
                    px, _mode = png_decode(bytes(payload))
                except (ValueError, NotImplementedError):
                    rows.append((int(doc_id), None, None, None, None, None, None))
                    continue
                h, w, ch = px.shape
                flat = px.astype(np.int64)
                rows.append(
                    (
                        int(doc_id),
                        int(w),
                        int(h),
                        int(ch),
                        round(float(flat.sum()) / flat.size, 4),
                        int(flat.min()),
                        int(flat.max()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in PIXEL_FEATURE_SCHEMA])

    return docs.select("doc_id", media_col).mapInPandas(
        _feats, schema=PIXEL_FEATURE_SCHEMA
    )
