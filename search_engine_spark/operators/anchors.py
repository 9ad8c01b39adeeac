"""Anchor-text indexing + BM25F fielded ranking — the classic web-search
composition the reference cannot express (it indexes one body field only;
reference model/Index.java postings carry a single `rank` weight).

Web engines since Brin & Page (1998, §2.2 "Anchor Text") index the text
of INBOUND links as a separate field on the *target* document: anchor
text is a human-written summary of the target and is the strongest
sparse relevance signal for navigational queries. Ranking then combines
the fields with BM25F (Zaragoza et al., CIKM 2004, "Microsoft Cambridge
at TREC-13"): per-field length-normalized term frequencies are combined
with field weights BEFORE the BM25 saturation, i.e.

    wtf(t,d) = Σ_f  w_f · tf_f(t,d) / (1 - b_f + b_f · dl_f(d)/avgdl_f)
    score(d) = Σ_t  idf(t) · wtf(t,d) / (k1 + wtf(t,d))

(the "simple BM25F" form; saturating the weighted sum, not each field,
is what distinguishes BM25F from a naive per-field score mix). idf uses
document frequency over the UNION of fields (a doc counts once if the
term occurs in any field).

Scale notes:

- anchor harvest is a codegen map (regexp_extract_all ×2 + arrays_zip +
  explode) over the html scan — no UDF; the dst-url resolve is one join
  against the documents spine on the dst key (docs never move: the
  exploded anchor side shuffles, at ~tens of bytes per edge).
- anchor postings aggregate by (dst_doc, term) — one shuffle over the
  tokenized anchor stream, which is ~2 tokens/edge, orders of magnitude
  smaller than body postings.
- BM25F query evaluation mirrors search.py::search_bm25: query-term df
  collected driver-side into a literal idf map, field frames filtered by
  the term set FIRST, length tables joined post-filter — the length
  frames are per-document (corpus-scaling) so the join is a sort-merge
  on doc_id, never hint-broadcast — then two map-side-combinable groupBys
  ((doc,term) → wtf, doc → score). No global window anywhere.

Fixture derivation (FIXTURES pattern, mirrored in
functions/oracle_pipeline.py::search_bm25f_sql): ``anchored_html``
appends the SAME deterministic edge set as graph.linked_html (chain
doc_id+1 + tree doc_id//2) but with two-word anchor texts drawn from a
frozen 7-word vocabulary indexed by (dst % 7, src % 7). Unlike
linked_html, anchors here carry text, so the extraction invariant
``extract_text(html) == text`` deliberately does NOT hold for this
derived fixture — it exists only for the anchor queries, and the oracle
derives the identical anchors arithmetically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_columns import explode_terms
from .graph import _url_of, resolve_doc_url

# RE2 ∩ java.util.regex subset (the oracle never parses html — it derives
# the same anchors arithmetically — but the pattern stays portable).
ANCHOR_RE = '<a href="([^"]+)">([^<]*)</a>'

# Frozen anchor vocabulary — real corpus words so anchor terms share the
# dictionary/stoplist path (and df) with body terms.
ANCHOR_WORDS = ["data", "fast", "join", "scan", "merge", "index", "query"]

K1_DEFAULT = 1.2
W_BODY = 1.0
W_ANCHOR = 2.0
B_BODY = 0.75
B_ANCHOR = 0.4


def _anchor_word(expr):
    """ANCHOR_WORDS[expr % 7] as a column (literal array element_at)."""
    arr = F.array(*[F.lit(w) for w in ANCHOR_WORDS])
    return F.element_at(arr, (expr % len(ANCHOR_WORDS) + 1).cast("int"))


def anchored_html(docs: DataFrame) -> DataFrame:
    """Fixture derivation: append two TEXT-carrying anchors per page —
    to doc_id+1 (chain) and doc_id//2 (tree back-edge) — with anchor
    text ANCHOR_WORDS[dst%7] + ' ' + ANCHOR_WORDS[src%7]."""
    d = F.col("doc_id")
    tree = F.floor(d / 2).cast("long")

    def a(dst):
        return F.concat(
            F.lit('<a href="'),
            _url_of(dst),
            F.lit('">'),
            _anchor_word(dst),
            F.lit(" "),
            _anchor_word(d),
            F.lit("</a>"),
        )

    return docs.withColumn(
        "html",
        F.encode(
            F.concat(F.decode(F.col("html"), "utf-8"), a(d + 1), a(tree)),
            "utf-8",
        ),
    )


def harvest_anchors(docs: DataFrame, drop_self: bool = True) -> DataFrame:
    """(src_doc, dst_doc, anchor_text) — inbound-anchor relation over
    RESOLVED targets (dst must exist in the corpus; dangling links drop).

    Pure codegen: two aligned regexp_extract_all passes (href group /
    text group) zipped and exploded, dst resolved from the url pattern,
    then one semi-ish inner join against the doc_id spine."""
    html = F.decode(F.col("html"), "utf-8")
    pairs = F.arrays_zip(
        F.regexp_extract_all(html, F.lit(ANCHOR_RE), F.lit(1)).alias("href"),
        F.regexp_extract_all(html, F.lit(ANCHOR_RE), F.lit(2)).alias("atext"),
    )
    edges = (
        docs.select(
            F.col("doc_id").alias("src_doc"), F.explode(pairs).alias("p")
        )
        .select(
            "src_doc",
            F.col("p.href").alias("dst_url"),
            F.col("p.atext").alias("anchor_text"),
        )
        .withColumn("dst_doc", resolve_doc_url(F.col("dst_url")))
        .filter(F.col("dst_doc").isNotNull())
    )
    if drop_self:
        edges = edges.filter(F.col("src_doc") != F.col("dst_doc"))
    spine = docs.select(F.col("doc_id").alias("dst_doc"))
    return edges.join(spine, "dst_doc").select(
        "src_doc", "dst_doc", "anchor_text"
    )


def anchor_postings(docs_anchored: DataFrame) -> DataFrame:
    """(doc_id, term, tf) — the anchor FIELD postings: inbound anchor
    text per target doc through the shared tokenize/lemmatize path,
    aggregated over all inbound edges."""
    anchors = harvest_anchors(docs_anchored).select(
        F.col("dst_doc").alias("doc_id"), F.col("anchor_text").alias("text")
    )
    return (
        explode_terms(anchors, keep=["doc_id"])
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


TIE_BREAKER = 0.3


def _field_bm25_scored(
    post: DataFrame,
    dl_frame: DataFrame,
    dl_col: str,
    avg_dl: float,
    n_docs: int,
    terms: list[str],
    k1: float,
    b: float,
) -> DataFrame:
    """One field's disjunctive BM25 scored set → (doc_id, fscore).

    Field-scoped statistics: df counted over THIS field's postings only
    (a term common in anchors but rare in bodies is rare for the body
    scorer), dl/avgdl are the field's own lengths — the per-field
    sub-scorer of Elasticsearch's `best_fields` multi_match. df for the
    ≤|terms| query terms is collected driver-side into a literal idf map
    exactly like search.py::bm25_scored; dl_frame is per-document
    (corpus-scaling) so that join stays sort-merge, never hint-broadcast."""
    from .search import bm25_idf

    pq = post.filter(F.col("term").isin(terms))
    df_rows = (
        pq.select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .collect()
    )
    idf = {r["term"]: bm25_idf(float(n_docs), float(r["df"])) for r in df_rows}
    empty = post.select(
        F.col("doc_id"), F.lit(0.0).alias("fscore")
    ).limit(0)
    if not idf or avg_dl <= 0.0:
        return empty
    idf_col = F.create_map(
        *[x for t in sorted(idf) for x in (F.lit(t), F.lit(idf[t]))]
    )
    return (
        pq.join(dl_frame, "doc_id")
        .withColumn(
            "part",
            idf_col[F.col("term")]
            * (F.col("tf").cast("double") * (k1 + 1.0))
            / (
                F.col("tf").cast("double")
                + k1
                * (
                    1.0
                    - b
                    + b * F.col(dl_col).cast("double") / float(avg_dl)
                )
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("part").alias("fscore"))
    )


def search_dismax(
    body: DataFrame,
    anchor: DataFrame,
    doc_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    terms: list[str],
    k1: float = K1_DEFAULT,
    b_body: float = B_BODY,
    b_anchor: float = B_ANCHOR,
    tie_breaker: float = TIE_BREAKER,
    limit: int = 20,
    offset: int = 0,
) -> DataFrame:
    """Elasticsearch `multi_match` best_fields over (body, anchor) →
    (doc_id, score): each field is scored as its OWN BM25 index
    (field-scoped df, dl, avgdl), then combined per doc with dis_max —

        score(d) = max_f s_f(d) + tie_breaker · Σ_{f ≠ argmax} s_f(d)

    (Lucene DisjunctionMaxQuery). This is the OTHER canonical multi-field
    mode next to BM25F (`search_bm25f`): BM25F fuses evidence before
    saturation (one virtual document), best_fields bets on the single
    best field and only tie-breaks with the rest — the ES default for
    multi-field `multi_match`. Disjunctive OR semantics; deterministic
    (rounded score desc, doc_id asc) tiebreak.

    Plan: two independent field scorers (filter → dl join → one
    map-side-combinable groupBy each) merged by a full-outer join on
    doc_id — every stage keyed on doc_id, no global window, nothing
    corpus-scaling is broadcast."""
    uniq = sorted(set(terms))
    empty = body.select(F.col("doc_id"), F.lit(0.0).alias("score")).limit(0)
    if not uniq:
        return empty

    anchor_dl = anchor.groupBy("doc_id").agg(F.sum("tf").alias("adl"))
    total_anchor = anchor.agg(F.sum("tf")).collect()[0][0] or 0
    avg_adl = float(total_anchor) / float(n_docs) if n_docs else 0.0

    sb = _field_bm25_scored(
        body, doc_stats, "dl", avgdl, n_docs, uniq, k1, b_body
    ).withColumnRenamed("fscore", "s_body")
    sa = _field_bm25_scored(
        anchor, anchor_dl, "adl", avg_adl, n_docs, uniq, k1, b_anchor
    ).withColumnRenamed("fscore", "s_anchor")

    both = (
        sb.join(sa, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce(F.col("s_body"), F.lit(0.0)).alias("s_body"),
            F.coalesce(F.col("s_anchor"), F.lit(0.0)).alias("s_anchor"),
        )
        .withColumn("best", F.greatest("s_body", "s_anchor"))
        .select(
            "doc_id",
            F.round(
                F.col("best")
                + tie_breaker
                * (F.col("s_body") + F.col("s_anchor") - F.col("best")),
                4,
            ).alias("score"),
        )
    )
    return (
        both.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .offset(offset)
        .limit(limit)
    )


def search_bm25f(
    body: DataFrame,
    anchor: DataFrame,
    doc_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    terms: list[str],
    k1: float = K1_DEFAULT,
    w_body: float = W_BODY,
    w_anchor: float = W_ANCHOR,
    b_body: float = B_BODY,
    b_anchor: float = B_ANCHOR,
    limit: int = 20,
    offset: int = 0,
) -> DataFrame:
    """BM25F disjunctive top-k over (body, anchor) fields →
    (doc_id, score). Absent query terms drop out (OR semantics — the
    web-search default); deterministic tiebreak (score desc, doc_id asc).

    Driver-side scalars (|terms| df rows + two field avgdl floats) bake
    into the plan as literals — same strategy as search.py::search_bm25;
    everything distributed is filter→join→two partial-agg groupBys."""
    uniq = sorted(set(terms))
    empty = body.select(F.col("doc_id"), F.lit(0.0).alias("score")).limit(0)
    if not uniq:
        return empty

    # anchor field lengths: total retained anchor tokens per target doc
    anchor_dl = anchor.groupBy("doc_id").agg(F.sum("tf").alias("adl"))
    total_anchor = anchor.agg(F.sum("tf")).collect()[0][0] or 0
    avg_adl = float(total_anchor) / float(n_docs) if n_docs else 0.0

    bq = body.filter(F.col("term").isin(uniq))
    aq = anchor.filter(F.col("term").isin(uniq))

    # idf over the union of fields (doc counts once per term, any field)
    df_rows = (
        bq.select("doc_id", "term")
        .union(aq.select("doc_id", "term"))
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .collect()
    )
    from .search import bm25_idf

    idf = {r["term"]: bm25_idf(float(n_docs), float(r["df"])) for r in df_rows}
    if not idf:
        return empty
    idf_col = F.create_map(
        *[x for t in sorted(idf) for x in (F.lit(t), F.lit(idf[t]))]
    )

    ntf_body = bq.join(doc_stats, "doc_id").select(
        "doc_id",
        "term",
        (
            w_body
            * F.col("tf").cast("double")
            / (1.0 - b_body + b_body * F.col("dl").cast("double") / float(avgdl))
        ).alias("ntf"),
    )
    if avg_adl > 0.0:
        ntf_anchor = aq.join(anchor_dl, "doc_id").select(
            "doc_id",
            "term",
            (
                w_anchor
                * F.col("tf").cast("double")
                / (
                    1.0
                    - b_anchor
                    + b_anchor * F.col("adl").cast("double") / avg_adl
                )
            ).alias("ntf"),
        )
        fields = ntf_body.union(ntf_anchor)
    else:
        fields = ntf_body

    wtf = fields.groupBy("doc_id", "term").agg(F.sum("ntf").alias("wtf"))
    scored = (
        wtf.withColumn(
            "part",
            idf_col[F.col("term")] * F.col("wtf") / (k1 + F.col("wtf")),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("part"), 4).alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .offset(offset)
        .limit(limit)
    )


def search_cross_fields(
    body: DataFrame,
    anchor: DataFrame,
    doc_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    terms: list[str],
    k1: float = K1_DEFAULT,
    b_body: float = B_BODY,
    b_anchor: float = B_ANCHOR,
    limit: int = 20,
    offset: int = 0,
) -> DataFrame:
    """ES `multi_match` cross_fields over (body, anchor) → (doc_id,
    score): the TERM-CENTRIC multi-field mode (Lucene BlendedTermQuery)
    that completes the trilogy —

      * BM25F (`search_bm25f`): fuse evidence per term BEFORE saturation
        (one virtual document);
      * best_fields (`search_dismax`): score whole query per field, bet
        on the best field;
      * cross_fields (here): per TERM take the best field's contribution,
        then sum over terms —

          score(d) = Σ_t  idf_blended(t) · max_f sat_f(tf_{f,t,d})

        with BLENDED document frequency idf over max_f df_f(t) (ES
        blends dfs so a term rare in one field but common in another
        is not over-rewarded; "first name in field A, last name in
        field B" is the canonical query this mode exists for).

    Plan: per-field saturated parts (filter → dl join → codegen map),
    full-outer on (doc_id, term), greatest(), one groupBy(doc_id) — all
    doc-keyed, no window, field dfs collected driver-side (≤|terms| rows
    each) into one blended idf literal."""
    from .search import bm25_idf

    uniq = sorted(set(terms))
    empty = body.select(F.col("doc_id"), F.lit(0.0).alias("score")).limit(0)
    if not uniq:
        return empty

    anchor_dl = anchor.groupBy("doc_id").agg(F.sum("tf").alias("adl"))
    total_anchor = anchor.agg(F.sum("tf")).collect()[0][0] or 0
    avg_adl = float(total_anchor) / float(n_docs) if n_docs else 0.0

    bq = body.filter(F.col("term").isin(uniq))
    aq = anchor.filter(F.col("term").isin(uniq))

    def field_df(pq):
        return {
            r["term"]: float(r["df"])
            for r in pq.select("doc_id", "term")
            .distinct()
            .groupBy("term")
            .agg(F.count("*").alias("df"))
            .collect()
        }

    df_b, df_a = field_df(bq), field_df(aq)
    blended = {
        t: max(df_b.get(t, 0.0), df_a.get(t, 0.0))
        for t in set(df_b) | set(df_a)
    }
    idf = {t: bm25_idf(float(n_docs), d) for t, d in blended.items() if d > 0}
    if not idf:
        return empty
    idf_col = F.create_map(
        *[x for t in sorted(idf) for x in (F.lit(t), F.lit(idf[t]))]
    )

    def sat(pq, dl_frame, dl_col, avg, b):
        if avg <= 0.0:
            return pq.select(
                "doc_id", "term", F.lit(0.0).alias("part")
            ).limit(0)
        return pq.join(dl_frame, "doc_id").select(
            "doc_id",
            "term",
            (
                F.col("tf").cast("double") * (k1 + 1.0)
                / (
                    F.col("tf").cast("double")
                    + k1
                    * (1.0 - b + b * F.col(dl_col).cast("double") / float(avg))
                )
            ).alias("part"),
        )
    pb = sat(bq, doc_stats, "dl", avgdl, b_body).withColumnRenamed(
        "part", "p_body"
    )
    pa = sat(aq, anchor_dl, "adl", avg_adl, b_anchor).withColumnRenamed(
        "part", "p_anchor"
    )
    both = pb.join(pa, ["doc_id", "term"], "full_outer").select(
        "doc_id",
        "term",
        F.greatest(
            F.coalesce(F.col("p_body"), F.lit(0.0)),
            F.coalesce(F.col("p_anchor"), F.lit(0.0)),
        ).alias("best"),
    )
    scored = (
        both.withColumn("part", idf_col[F.col("term")] * F.col("best"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("part"), 4).alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .offset(offset)
        .limit(limit)
    )


def search_combined_fields(
    body: DataFrame,
    anchor: DataFrame,
    doc_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    terms: list[str],
    k1: float = K1_DEFAULT,
    b: float = 0.75,
    w_body: float = W_BODY,
    w_anchor: float = W_ANCHOR,
    limit: int = 20,
    offset: int = 0,
) -> DataFrame:
    """ES `combined_fields` (Lucene CombinedFieldQuery) — the FOURTH
    multi-field model beside BM25F / dis_max / cross_fields: the fields
    merge into one SYNTHETIC field before any saturation. Term
    frequencies add (weighted), field lengths add (weighted), and ONE
    BM25 with a single (k1, b) runs over the merged statistics:

        tf_c  = w_body·tf_body + w_anchor·tf_anchor
        dl_c  = w_body·dl      + w_anchor·adl
        idf   = Robertson idf over union-of-fields df

    vs BM25F, which length-normalizes each field separately BEFORE
    summing (per-field b) — combined_fields is what you get when the
    fields genuinely form one text (title+body), BM25F when they have
    different verbosity priors (body vs anchors). Disjunctive OR
    semantics, deterministic (rounded score desc, doc_id asc) tiebreak.

    Plan shape (same strategy as search_bm25f): per-field term-filtered
    slices full-outer-merge on (doc_id, term) — doc_id-led shuffle keys
    AQE coalesces; idf and the two avg-length scalars are driver
    literals; one final groupBy(doc_id); top-k is
    TakeOrderedAndProject. No UDF, no window."""
    uniq = sorted(set(terms))
    empty = body.select(F.col("doc_id"), F.lit(0.0).alias("score")).limit(0)
    if not uniq:
        return empty

    anchor_dl = anchor.groupBy("doc_id").agg(F.sum("tf").alias("adl"))
    total_anchor = anchor.agg(F.sum("tf")).collect()[0][0] or 0
    avg_adl = float(total_anchor) / float(n_docs) if n_docs else 0.0
    avgdl_c = w_body * float(avgdl) + w_anchor * avg_adl

    bq = body.filter(F.col("term").isin(uniq)).select(
        "doc_id", "term", F.col("tf").cast("double").alias("tf_b")
    )
    aq = anchor.filter(F.col("term").isin(uniq)).select(
        "doc_id", "term", F.col("tf").cast("double").alias("tf_a")
    )

    from .search import bm25_idf

    df_rows = (
        bq.select("doc_id", "term")
        .union(aq.select("doc_id", "term"))
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .collect()
    )
    idf = {r["term"]: bm25_idf(float(n_docs), float(r["df"])) for r in df_rows}
    if not idf:
        return empty
    idf_col = F.create_map(
        *[x for t in sorted(idf) for x in (F.lit(t), F.lit(idf[t]))]
    )

    merged = (
        bq.join(aq, ["doc_id", "term"], "full_outer")
        .select(
            "doc_id",
            "term",
            (
                w_body * F.coalesce(F.col("tf_b"), F.lit(0.0))
                + w_anchor * F.coalesce(F.col("tf_a"), F.lit(0.0))
            ).alias("tf_c"),
        )
        .join(doc_stats, "doc_id")
        .join(anchor_dl, "doc_id", "left")
        .withColumn(
            "dl_c",
            w_body * F.col("dl").cast("double")
            + w_anchor * F.coalesce(F.col("adl"), F.lit(0)).cast("double"),
        )
    )
    scored = (
        merged.withColumn(
            "part",
            idf_col[F.col("term")]
            * (F.col("tf_c") * (k1 + 1.0))
            / (
                F.col("tf_c")
                + k1 * (1.0 - b + b * F.col("dl_c") / float(avgdl_c))
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("part"), 4).alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .offset(offset)
        .limit(limit)
    )


# ------------------------------------------------- parent-child join field

def has_child(
    docs: DataFrame,
    terms: list[str],
    min_children: int = 1,
    score_mode: str = "sum",
    limit: int = 20,
) -> DataFrame:
    """ES `has_child` query over the anchor join-field → (doc_id,
    n_children, score): parent pages whose inbound-anchor CHILD
    documents match the query. A child (one (src,dst) anchor annotation,
    analyzed with the shared tokenizer chain) matches when it contains
    ≥1 query term; its score is the matched-term occurrence count.
    Parents keep ≥ `min_children` matching children (ES
    min_children) and fold child scores via score_mode (ES default for
    has_child is none→constant; sum/max/avg supported here, sum
    default). Order score desc, n_children desc, doc_id asc.

    Plan: the anchor harvest is pure codegen (regexp zip + explode +
    spine join); child matching is one term-pruned filter + a
    two-level combinable aggregate ((src,dst) then parent) — the same
    one-extra-aggregation shape as the nested type, because ES
    implements both on the same block-join machinery."""
    from ..functions.text_columns import explode_terms

    q = sorted(set(terms))
    empty = docs.select(
        F.col("doc_id"),
        F.lit(0).cast("bigint").alias("n_children"),
        F.lit(0.0).alias("score"),
    ).limit(0)
    if not q:
        return empty
    edges = harvest_anchors(anchored_html(docs))
    aterm = explode_terms(
        edges.select(
            "src_doc", "dst_doc", F.col("anchor_text").alias("text")
        ),
        keep=["src_doc", "dst_doc"],
    )
    child = (
        aterm.filter(F.col("term").isin(q))
        .groupBy("src_doc", "dst_doc")
        .agg(F.count("*").alias("child_score"))
    )
    agg = {
        "sum": F.sum(F.col("child_score").cast("double")),
        "max": F.max(F.col("child_score").cast("double")),
        "avg": F.avg(F.col("child_score").cast("double")),
    }[score_mode]
    return (
        child.groupBy(F.col("dst_doc").alias("doc_id"))
        .agg(F.count("*").alias("n_children"), agg.alias("score_raw"))
        .filter(F.col("n_children") >= int(min_children))
        .select(
            "doc_id",
            "n_children",
            F.round(F.col("score_raw"), 4).alias("score"),
        )
        .orderBy(
            F.col("score").desc(),
            F.col("n_children").desc(),
            F.col("doc_id").asc(),
        )
        .limit(int(limit))
    )


def has_parent(docs: DataFrame, terms: list[str]) -> DataFrame:
    """ES `has_parent` query → (src_doc, dst_doc): the anchor CHILD
    documents whose PARENT page's body conjunctively matches `terms`
    (ES semantics: children returned, parent provides the predicate;
    score=false → constant-score children, so rows come back unscored
    in the pinned (src, dst) order).

    Plan: the parent hit set is the usual conjunctive count-distinct
    aggregate over term-pruned body postings; children join it on the
    parent key — a semi-join that AQE broadcasts when the hit set is
    small."""
    from ..functions.text_columns import explode_terms

    q = sorted(set(terms))
    edges = harvest_anchors(anchored_html(docs))
    if not q:
        return edges.select("src_doc", "dst_doc").limit(0)
    parents = (
        explode_terms(docs)
        .filter(F.col("term").isin(q))
        .groupBy("doc_id")
        .agg(F.count_distinct("term").alias("nt"))
        .filter(F.col("nt") == len(q))
        .select(F.col("doc_id").alias("dst_doc"))
    )
    return (
        edges.join(parents, "dst_doc")
        .select("src_doc", "dst_doc")
        .orderBy("src_doc", "dst_doc")
    )


def search_most_fields(
    body: DataFrame,
    anchor: DataFrame,
    doc_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    terms: list[str],
    k1: float = K1_DEFAULT,
    b_body: float = B_BODY,
    b_anchor: float = B_ANCHOR,
    limit: int = 20,
    offset: int = 0,
) -> DataFrame:
    """ES `multi_match` most_fields → (doc_id, score): every field is
    scored as its own BM25 index and the per-field scores SUM — the
    mode for fields that hold the SAME text analyzed differently
    (stemmed body + raw body, body + anchors), where each extra field a
    term matches should reinforce, not shadow. Completes the
    multi-field quartet beside best_fields (`search_dismax`),
    cross_fields, BM25F, and combined_fields.

    Implementation note (and the reason this cannot drift from
    best_fields): sum = max + 1.0·(sum − max), i.e. most_fields IS
    dis_max with tie_breaker = 1.0 — Lucene documents exactly this
    degenerate identity — so this delegates to `search_dismax` with the
    tie-breaker pinned. Same plan, same oracle family; the identity is
    also pinned by a pytest against an independently-registered oracle
    pair."""
    return search_dismax(
        body, anchor, doc_stats, n_docs, avgdl, terms,
        k1=k1, b_body=b_body, b_anchor=b_anchor,
        tie_breaker=1.0, limit=limit, offset=offset,
    )
