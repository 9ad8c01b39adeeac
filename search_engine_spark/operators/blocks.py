"""Compressed posting-block build — document-sharded index layout.

Layout decision (the 100 TB story): blocks are **document-sharded** —
partition key = doc_bucket = doc_id mod N_BUCKETS — not term-sharded.

* Build: one shuffle (groupBy doc_bucket+term) → applyInPandas encodes each
  (bucket, term) posting run into delta+varbyte blocks. Head-term skew
  (a term in 80% of all docs — FIXTURES.md injects one) is bounded by the
  bucket size: the hottest (bucket, term) group holds ≤ |bucket| postings,
  so bucketing IS the salt (SURVEY §7 step 5). No group ever sees more than
  ~N/N_BUCKETS rows regardless of term popularity.
* Query: each bucket holds ALL terms for its doc subset, so conjunctive
  AND / top-k scoring is embarrassingly parallel per bucket with NO query-
  time shuffle — per-bucket top-k heaps merge at the driver (the classic
  document-partitioned web-search design; per-term ordering/early-exit from
  the reference, SearchServiceImpl.java:152-180, happens inside each bucket).
* Storage: written partitionBy("doc_bucket") so a term filter + bucket scan
  prunes files; doc_ids within a bucket stay globally sorted because we sort
  by doc_id before encoding.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .codec import encode_blocks_columns

N_BUCKETS_DEFAULT = 32

BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("doc_bucket", T.IntegerType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("count", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("max_tf", T.LongType(), False),
        T.StructField("sum_tf", T.LongType(), False),
        T.StructField("min_dl", T.LongType(), False),
        T.StructField("doc_bytes", T.BinaryType(), False),
        T.StructField("tf_bytes", T.BinaryType(), False),
        T.StructField("dl_bytes", T.BinaryType(), False),
    ]
)


def block_rows_frame(bucket: int, term, cols: dict, schema) -> pd.DataFrame:
    """Assemble one (bucket, term) group's encoded block columns into the
    schema-ordered pandas frame applyInPandas expects — the shared tail of
    every block emitter (build, fused merge, segment compaction,
    positional): a schema change lands in exactly one place."""
    import numpy as np

    nb = len(cols["doc_bytes"])
    return pd.DataFrame(
        {
            "doc_bucket": np.full(nb, bucket, dtype=np.int32),
            "term": term,
            **cols,
        },
        columns=[f.name for f in schema.fields],
    )


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (doc_bucket, term) posting run → encoded block rows."""
    pdf = pdf.sort_values("doc_id")
    bucket = int(pdf["doc_bucket"].iloc[0])
    term = pdf["term"].iloc[0]
    cols = encode_blocks_columns(
        pdf["doc_id"].to_numpy(), pdf["tf"].to_numpy(), pdf["dl"].to_numpy()
    )
    return block_rows_frame(bucket, term, cols, BLOCKS_SCHEMA)


def build_posting_blocks(
    postings: DataFrame, n_buckets: int = N_BUCKETS_DEFAULT
) -> DataFrame:
    """(doc_id, term, tf) → compressed block rows.

    The groupBy key includes doc_bucket so Arrow batches stay small and
    skew-free; applyInPandas receives each (bucket, term) run whole.

    Each posting carries its document's dl (Σ tf over the doc — postings
    always arrive complete per document, so the self-aggregation is exact):
    BM25 norms live inside the blocks, and the query path reads dl at
    decode time instead of cogrouping a norms table per query.
    """
    dl = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    with_bucket = postings.join(dl, "doc_id").withColumn(
        "doc_bucket", F.pmod(F.col("doc_id"), F.lit(n_buckets)).cast("int")
    )
    return with_bucket.groupBy("doc_bucket", "term").applyInPandas(
        _encode_group, schema=BLOCKS_SCHEMA
    )


def decode_blocks(blocks: DataFrame) -> DataFrame:
    """Inverse of build_posting_blocks: block rows → logical postings
    (doc_bucket, term, doc_id, tf). Vectorized numpy decode per Arrow batch;
    used by the incremental-reindex path to reconstruct a bucket's postings
    without re-reading the corpus."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("doc_bucket", T.IntegerType(), False),
            T.StructField("term", T.StringType(), False),
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("tf", T.LongType(), False),
        ]
    )

    def _decode(batches):
        from .codec import decode_block

        for pdf in batches:
            if pdf.empty:
                continue
            ids_parts, tf_parts = [], []
            for row in pdf.itertuples(index=False):
                ids, tfs = decode_block(row.doc_bytes, row.tf_bytes, row.count)
                ids_parts.append(ids)
                tf_parts.append(tfs)
            # per-BLOCK repeat of the key columns, not a per-POSTING
            # Python loop (a reindexed bucket decodes ~N/n_buckets
            # postings through here — list appends would dominate)
            sizes = np.fromiter(
                (a.size for a in ids_parts), dtype=np.int64, count=len(ids_parts)
            )
            yield pd.DataFrame(
                {
                    "doc_bucket": np.repeat(
                        pdf["doc_bucket"].to_numpy(np.int32), sizes
                    ),
                    "term": np.repeat(pdf["term"].to_numpy(object), sizes),
                    "doc_id": np.concatenate(ids_parts),
                    "tf": np.concatenate(tf_parts),
                }
            )

    cols = ["doc_bucket", "term", "count", "doc_bytes", "tf_bytes"]
    return blocks.select(*cols).mapInPandas(_decode, schema=out_schema)


def term_dict_from_blocks(blocks: DataFrame) -> DataFrame:
    """(term, df, cf) from block metadata alone — exact (df = Σ count,
    cf = Σ sum_tf), no decode, no corpus re-read. Equals
    index_build.build_term_dict(postings) by construction."""
    return blocks.groupBy("term").agg(
        F.sum("count").alias("df"), F.sum("sum_tf").alias("cf")
    )


def write_blocks(blocks: DataFrame, path: str) -> None:
    """Persist partitioned by doc_bucket (file-level pruning on bucket;
    min/max column stats prune on term within each bucket)."""
    (
        blocks.repartition("doc_bucket")
        .sortWithinPartitions("term", "block_id")
        .write.mode("overwrite")
        .partitionBy("doc_bucket")
        .parquet(path)
    )


def decode_blocks_with_dl(blocks: DataFrame) -> DataFrame:
    """decode_blocks plus the per-posting doc length: (doc_bucket, term,
    doc_id, tf, dl). dl_bytes ships inside every block, so consumers
    that need length-normalized scores (impact quantization, the
    two-tier exact rescope) never join the corpus-scale doc_stats
    relation — the block scan is self-contained, and a term/bucket
    filter above this operator pushes down to the parquet scan."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("doc_bucket", T.IntegerType(), False),
            T.StructField("term", T.StringType(), False),
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("tf", T.LongType(), False),
            T.StructField("dl", T.LongType(), False),
        ]
    )

    def _decode(batches):
        from .codec import decode_block, decode_payload

        for pdf in batches:
            if pdf.empty:
                continue
            ids_parts, tf_parts, dl_parts = [], [], []
            for row in pdf.itertuples(index=False):
                ids, tfs = decode_block(row.doc_bytes, row.tf_bytes, row.count)
                ids_parts.append(ids)
                tf_parts.append(tfs)
                dl_parts.append(decode_payload(row.dl_bytes, row.count))
            sizes = np.fromiter(
                (a.size for a in ids_parts), dtype=np.int64,
                count=len(ids_parts),
            )
            yield pd.DataFrame(
                {
                    "doc_bucket": np.repeat(
                        pdf["doc_bucket"].to_numpy(np.int32), sizes
                    ),
                    "term": np.repeat(pdf["term"].to_numpy(object), sizes),
                    "doc_id": np.concatenate(ids_parts),
                    "tf": np.concatenate(tf_parts),
                    "dl": np.concatenate(dl_parts),
                }
            )

    cols = ["doc_bucket", "term", "count", "doc_bytes", "tf_bytes", "dl_bytes"]
    return blocks.select(*cols).mapInPandas(_decode, schema=out_schema)
