"""Multimodal columns — image/audio/video as opaque ``binary`` with typed
metadata; decode/feature-extract as Arrow-batched stubs.

The training-data pipeline treats media exactly like this engine treats
``html``: an opaque binary column plus derived metadata, with the expensive
decode isolated in a mapInPandas stage. The sandbox ships no image/audio
libraries, so the decode step is STUBBED two ways:

* ``media_features`` — a deterministic fake extractor (md5-derived values)
  whose Spark-side plumbing (schema, Arrow batch shape, column pruning) is
  real and oracle-verified; swap ``_fake_feature_vector`` for a real model
  and nothing else changes.
* ``decode_image`` — the real-library path; raises NotImplementedError with
  a clear message when PIL is absent (import-gated, never at module load).

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
    """REAL decode path (requires PIL — absent in this sandbox; the stage
    raises a clear NotImplementedError per batch if so). Kept so the
    operator surface, schema and batching are in place for a real cluster
    image with pillow installed."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "decode_image needs pillow; this environment ships no image "
                "codecs. Use media_features (deterministic stub) for "
                "plumbing tests."
            ) from e
        import io

        for pdf in batches:  # pragma: no cover - needs pillow
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[media_col]):
                if payload is None:
                    rows.append((doc_id, None, None, None))
                    continue
                img = Image.open(io.BytesIO(bytes(payload)))
                rows.append((doc_id, img.width, img.height, img.mode))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "mode"]
            )

    return docs.select("doc_id", media_col).mapInPandas(
        _decode, schema=IMAGE_SCHEMA
    )
