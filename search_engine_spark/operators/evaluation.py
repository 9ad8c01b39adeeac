"""Ranking-quality evaluation — Elasticsearch's `_rank_eval` API as one
distributed plan: score a ranking against graded relevance judgments and
emit NDCG@k / MRR / Precision@k.

The reference has no quality measurement at all (SearchServiceImpl returns
hits, never metrics); ES ships _rank_eval precisely because a search
engine you can't measure regresses silently. Judgments (qrels) here are
DERIVED, deterministically, from the corpus itself so the operator is
oracle-verifiable with no external data: grade(doc) = min(3, Σ tf of the
query terms in the doc) over docs matching ≥1 term. Raw term frequency is
deliberately a DIFFERENT signal than BM25 (no idf, no length
normalization), so the metric is informative, not tautologically 1.0 —
the pytest pins both that a perfect ranking scores NDCG=1 and that BM25's
NDCG against tf-grades sits strictly between 0 and 1 on the fixture.

Metric spec (pinned; ties in every sort break by doc_id asc):
  DCG@k  = Σ_{i=1..k} (2^grade_i − 1) / log2(i + 1)   over the ranking
  IDCG@k = the same sum over the qrels' own top-k grades (grade desc)
  NDCG@k = DCG/IDCG (0 when IDCG = 0)
  MRR    = 1 / rank of the first hit with grade ≥ rel_threshold (0 if none)
  P@k    = |hits in top-k with grade ≥ rel_threshold| / k

Plan at scale: qrels are ONE map-side-combinable aggregate over the query
terms' postings (the same pruned scan the search itself does); the ranking
is the engine's TakeOrderedAndProject top-k. Everything after touches ≤k
rows: two bounded `ranked_topk` rank assignments, a broadcast join, and
three scalar aggregates folded into one row. No Window anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .search import K1_DEFAULT, B_DEFAULT, ranked_topk, search_bm25

GRADE_CAP = 3


def qrels_from_tf(postings: DataFrame, terms: list[str]) -> DataFrame:
    """Derived graded judgments → (doc_id, grade): min(GRADE_CAP, Σ tf of
    the query terms). One aggregate over the term-pruned postings scan."""
    uniq = sorted(set(terms))
    return (
        postings.filter(F.col("term").isin(uniq))
        .groupBy("doc_id")
        .agg(
            F.least(
                F.lit(GRADE_CAP), F.sum("tf").cast("int")
            ).alias("grade")
        )
    )


def _dcg(grade_col, rank_col):
    return (F.pow(F.lit(2.0), grade_col.cast("double")) - 1.0) / (
        F.log2(rank_col.cast("double") + 1.0)
    )


def rank_eval(
    postings: DataFrame,
    term_dict: DataFrame,
    doc_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    terms: list[str],
    k: int = 10,
    rel_threshold: int = 2,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Evaluate the disjunctive BM25 top-k against tf-derived qrels →
    ONE row (ndcg_at_k, mrr, precision_at_k), each rounded 4 dp."""
    qrels = qrels_from_tf(postings, terms)
    ranking = search_bm25(
        postings, term_dict, doc_stats, n_docs, avgdl, terms,
        k1=k1, b=b, limit=k, conjunctive=False,
    )
    # Materialize the ≤k-row top-k driver-side (the presentation path's
    # bounded-by-k idiom) so the corpus-scale BM25 pass runs exactly once —
    # referencing its lazy subtree from two joins would score twice.
    topk_local = ranked_topk(ranking, "score")
    topk = ranking.sparkSession.createDataFrame(
        topk_local.collect(), topk_local.schema
    )
    # qrels scale with the query terms' document frequency (millions of rows
    # for a common term at web scale) — never broadcast them whole. Restrict
    # to the top-k's doc_ids first: an inner join whose BUILD side is the
    # broadcast k-row top-k (the grade aggregate itself stays distributed
    # over the term-pruned postings scan), leaving ≤k graded rows that ARE
    # safe to broadcast into the left join.
    topk_grades = qrels.join(F.broadcast(topk.select("doc_id")), "doc_id")
    ranked = topk.join(
        F.broadcast(topk_grades), "doc_id", "left"
    ).select(
        "rank", F.coalesce(F.col("grade"), F.lit(0)).alias("grade")
    )
    # ideal ranking: qrels' own top-k by grade (desc), doc_id asc tiebreak
    ideal = ranked_topk(
        qrels.orderBy(F.col("grade").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", F.col("grade").cast("double").alias("g")),
        "g",
    )
    idcg = ideal.agg(
        F.coalesce(F.sum(_dcg(F.col("g"), F.col("rank"))), F.lit(0.0))
        .alias("idcg")
    )
    rel = F.col("grade") >= int(rel_threshold)
    agg = ranked.agg(
        F.coalesce(F.sum(_dcg(F.col("grade"), F.col("rank"))), F.lit(0.0))
        .alias("dcg"),
        F.coalesce(
            F.min(F.when(rel, F.col("rank"))), F.lit(0)
        ).alias("first_rel"),
        F.coalesce(F.sum(F.when(rel, 1).otherwise(0)), F.lit(0))
        .alias("n_rel"),
    )
    return agg.crossJoin(F.broadcast(idcg)).select(
        F.round(
            F.when(F.col("idcg") > 0.0, F.col("dcg") / F.col("idcg"))
            .otherwise(F.lit(0.0)),
            4,
        ).alias("ndcg_at_k"),
        F.round(
            F.when(
                F.col("first_rel") > 0,
                F.lit(1.0) / F.col("first_rel").cast("double"),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("mrr"),
        F.round(F.col("n_rel").cast("double") / F.lit(float(k)), 4)
        .alias("precision_at_k"),
    )
