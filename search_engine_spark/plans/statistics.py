"""Statistics surface — reference A1 (StatisticsServiceImpl.java:30-100):
total + per-site page and lemma counts. One groupBy per table, joined on
site; totals are a final agg. All codegen-able relational ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_columns import explode_terms
from ..sources.documents import site_key_col


def per_site_statistics(docs: DataFrame) -> DataFrame:
    """(site_key, pages, lemmas) — pages per site and distinct terms per
    site (the reference's per-site detail rows)."""
    pages = (
        docs.withColumn("site_key", site_key_col())
        .groupBy("site_key")
        .agg(F.count("*").alias("pages"))
    )
    # count_distinct(term) directly — building the full per-site
    # dictionary forces an extra count_distinct(doc_id) df aggregate and
    # a cf sum per (site, term) whose results the row count throws away
    lemmas = (
        explode_terms(
            docs.withColumn("site_key", site_key_col()), keep=["site_key"]
        )
        .groupBy("site_key")
        .agg(F.count_distinct("term").alias("lemmas"))
    )
    return pages.join(lemmas, "site_key", "left").select(
        "site_key",
        F.col("pages").cast("long"),
        F.coalesce(F.col("lemmas"), F.lit(0)).cast("long").alias("lemmas"),
    )


def index_stats(blocks):
    """One-row index introspection over the compressed block metadata —
    the ES `GET /index/_stats` shape for the posting tier: distinct
    terms, block count, posting count, total token mass, max tf. Pure
    relational over the block METADATA columns (the oracle re-derives
    the identical numbers from the 128-posting segmentation without
    knowing the byte codec), so it also double-checks that no posting
    was lost or duplicated across blocks. One map-side-combinable agg
    over the blocks scan."""
    from pyspark.sql import functions as F

    return blocks.agg(
        F.count_distinct("term").cast("long").alias("n_terms"),
        F.count("*").cast("long").alias("n_blocks"),
        F.sum("count").cast("long").alias("n_postings"),
        F.sum("sum_tf").cast("long").alias("total_tokens"),
        F.max("max_tf").cast("long").alias("max_tf"),
    )
