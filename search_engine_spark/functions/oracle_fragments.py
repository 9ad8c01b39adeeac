"""DuckDB oracle SQL fragments mirroring the engine's frozen specs.

The driver verifies every `queries()` entry against `oracle_sql()` run in
DuckDB over the same parquet (views: region nation customer supplier part
orders lineitem events documents embeddings). This module is the single
place that re-expresses the engine's tokenization / derivation / hashing /
scoring rules in ANSI-ish DuckDB SQL, so Spark and oracle can't drift apart.

Pinned by: textproc/tokenize.py (tokenizer), sources/documents.py
(derived columns), hashing.py (portable h60), operators/search.py (scoring).
"""

from __future__ import annotations

from ..hashing import HEX_DIGITS
from ..textproc.lemmas import lemma_items
from ..textproc.ruletier import rule_lemma_sql
from ..textproc.stopwords import sql_not_in_list
from ..textproc.tokenize import BOUNDARY_STRIP, WORD_PATTERN, WS_SPLIT

# ---------------------------------------------------------------- tokenizer

def lemma_dict_values() -> str:
    """The full generated dictionary (word, normal) — the oracle's
    mirror of the broadcast dictionary join, embedded verbatim in every
    lemma-using SQL string so each query stays self-contained.

    Emitted as ONE delimited string literal split with
    string_split/split_part rather than a VALUES list: at the v3
    dictionary size (34k+ forms) DuckDB spends ~1.2 s parsing 34k value
    tuples per query, vs ~0.07 s for a single literal — a 15× win
    across the ~150 lemma-using gate queries. Both forms are the same
    frozen table (words are letters/hyphens only, so ' ' and '|' are
    safe delimiters; pinned equal by test_oracle_lemma_embedding)."""
    blob = "|".join(f"{w} {n}" for w, n in lemma_items())
    return (
        "SELECT split_part(x, ' ', 1) AS word, split_part(x, ' ', 2) AS normal "
        f"FROM unnest(string_split('{blob}', '|')) AS t(x)"
    )


def terms_cte(table: str = "documents", extra_cols: str = "",
              lemmatize: bool = True) -> str:
    """CTE `terms(doc_id[, extra], term)` — one row per retained term
    occurrence (normal form when lemmatize). Mirrors
    functions/text_columns.py::explode_terms: filters apply to the cleaned
    SURFACE token, then the lemma dictionary joins (left, identity
    fallback)."""
    cols = f"d.doc_id{(', ' + extra_cols) if extra_cols else ''}"
    out_names = ["doc_id"]
    if extra_cols:
        out_names.append(extra_cols.rsplit(" AS ", 1)[-1].strip())
    toks = f"""
toks AS (
  SELECT {cols},
         regexp_replace(t.tok, '{BOUNDARY_STRIP}', '', 'g') AS term
  FROM {table} d, unnest(string_split_regex(lower(trim(d.text)), '{WS_SPLIT}')) AS t(tok)
)"""
    if not lemmatize:
        return f"""{toks},
terms AS (
  SELECT * FROM toks
  WHERE term <> ''
    AND regexp_matches(term, '{WORD_PATTERN}')
    AND term NOT IN {sql_not_in_list()}
)"""
    keep = ", ".join(f"toks.{c}" for c in out_names)
    return f"""
lemma_dict AS ({lemma_dict_values()}),
{toks.lstrip()},
terms AS (
  SELECT {keep}, coalesce(ld.normal, {rule_lemma_sql('toks.term')}) AS term
  FROM toks LEFT JOIN lemma_dict ld ON ld.word = toks.term
  WHERE toks.term <> ''
    AND regexp_matches(toks.term, '{WORD_PATTERN}')
    AND toks.term NOT IN {sql_not_in_list()}
)"""


# ------------------------------------------------------- derived doc columns

SITE_KEY_SQL = "('site-' || chr(97 + (doc_id % 3)::INT))"
SITE_SQL = f"('https://' || {SITE_KEY_SQL} || '.example')"
PATH_SQL = "('/docs/' || doc_id)"
URL_SQL = f"({SITE_SQL} || {PATH_SQL})"
RAW_URL_SQL = (
    f"({SITE_SQL} || '/Docs/' || doc_id"
    " || CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN '?ref=track' ELSE '' END)"
)
HTTP_CODE_SQL = (
    "(CASE doc_id % 53 WHEN 13 THEN 404 WHEN 27 THEN 415 WHEN 41 THEN 500 "
    "WHEN 50 THEN 102 ELSE 200 END)"
)
PARSEABLE_SQL = f"({HTTP_CODE_SQL} = 200 AND trim(text) <> '')"
REQUIRED_MATCHES_SQL = "((doc_id % 3 + 1)::INT)"


def status_filter_sql(table: str = "documents") -> str:
    """S2 status classification: (doc_id, http_code, can_parse) —
    mirrors sources/documents.py::http_code_col + parseable_documents."""
    return f"""
SELECT doc_id, {HTTP_CODE_SQL}::INT AS http_code,
       {PARSEABLE_SQL} AS can_parse
FROM {table}
"""


def h60_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, {HEX_DIGITS}))::BIGINT)"


# -------------------------------------------------------------- index tables

def postings_sql(table: str = "documents") -> str:
    """(doc_id, term, tf) — the logical postings relation (reference
    model/Index.java: one row per page×lemma, rank = tf)."""
    return f"""
WITH {terms_cte(table)}
SELECT doc_id, term, count(*)::BIGINT AS tf
FROM terms GROUP BY doc_id, term
"""


def block_meta_sql(table: str = "documents", n_buckets: int = 16) -> str:
    """Per-block metadata of the compressed posting blocks. The block
    SEGMENTATION (each (doc_bucket, term) run's doc_id-sorted postings
    chunked into BLOCK_SIZE=128 slices) and its zone-map / block-max stats
    (first/last doc, max_tf for the score bound, sum_tf for the
    resume-path dictionary, min_dl for the tightened BM25 bound) are fully
    relational — DuckDB re-derives them with a window function, without
    knowing anything about the byte codec. Pins operators/codec.py's
    encode_blocks block layout at oracle scale."""
    return f"""
WITH {terms_cte(table)},
postings AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms GROUP BY doc_id, term
),
dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM postings GROUP BY doc_id),
numbered AS (
  SELECT (((p.doc_id % {n_buckets}) + {n_buckets}) % {n_buckets})::INT AS doc_bucket, p.term, p.doc_id,
         p.tf, dl.dl,
         row_number() OVER (PARTITION BY ((p.doc_id % {n_buckets}) + {n_buckets}) % {n_buckets}, p.term
                            ORDER BY p.doc_id) - 1 AS rn
  FROM postings p JOIN dl USING (doc_id)
)
SELECT doc_bucket, term, (rn // 128)::INT AS block_id,
       count(*)::INT AS n_postings,
       min(doc_id)::BIGINT AS first_doc, max(doc_id)::BIGINT AS last_doc,
       max(tf)::BIGINT AS max_tf, sum(tf)::BIGINT AS sum_tf,
       min(dl)::BIGINT AS min_dl
FROM numbered GROUP BY doc_bucket, term, rn // 128
"""


def term_dict_sql(table: str = "documents") -> str:
    """(term, df, cf) — term dictionary (reference model/Lemma.java:
    frequency = document frequency)."""
    return f"""
WITH {terms_cte(table)}
SELECT term,
       count(DISTINCT doc_id)::BIGINT AS df,
       count(*)::BIGINT AS cf
FROM terms GROUP BY term
"""


def term_dict_site_sql(table: str = "documents") -> str:
    """Site-scoped dictionary — the reference scopes lemma rows per site
    (model/Lemma.java:20-24)."""
    return f"""
WITH {terms_cte(table, extra_cols=f"{SITE_KEY_SQL.replace('doc_id', 'd.doc_id')} AS site_key")}
SELECT site_key, term,
       count(DISTINCT doc_id)::BIGINT AS df,
       count(*)::BIGINT AS cf
FROM terms GROUP BY site_key, term
"""


def doc_stats_sql(table: str = "documents") -> str:
    """(doc_id, dl) for every document (dl = retained-term count, 0 when the
    text has no retained terms)."""
    return f"""
WITH {terms_cte(table)},
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM terms GROUP BY doc_id)
SELECT d.doc_id, coalesce(dl.dl, 0)::BIGINT AS dl
FROM {table} d LEFT JOIN dl USING (doc_id)
"""


# ----------------------------------------------------------------- search

def _terms_in(query_terms: list[str]) -> str:
    return "(" + ", ".join(f"'{t}'" for t in query_terms) + ")"


def search_compat_sql(query_terms: list[str], site_key: str | None = None,
                      limit: int = 20, offset: int = 0,
                      table: str = "documents") -> str:
    """Reference-compatible conjunctive search (SURVEY §2.G):
    R_abs = Σ tf over docs containing ALL query terms;
    rel = R_abs / max(R_abs); order rel desc, doc_id asc.
    Returns (doc_id, url, score_abs, rel)."""
    n = len(set(query_terms))
    site_filter = (
        f"AND {SITE_KEY_SQL} = '{site_key}'" if site_key else ""
    )
    return f"""
WITH {terms_cte(table)},
post AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms
  WHERE term IN {_terms_in(query_terms)} GROUP BY doc_id, term
),
hits AS (
  SELECT doc_id, sum(tf)::BIGINT AS score_abs
  FROM post GROUP BY doc_id
  HAVING count(DISTINCT term) = {n}
),
gated AS (
  SELECT doc_id, score_abs FROM hits
  WHERE TRUE {site_filter}
)
SELECT doc_id, {URL_SQL} AS url, score_abs,
       round(score_abs / (max(score_abs) OVER ()), 4) AS rel
FROM gated
ORDER BY score_abs DESC, doc_id ASC
LIMIT {limit} OFFSET {offset}
"""


def bm25_scored_ctes(query_terms: list[str], k1: float = 1.2,
                     b: float = 0.75, table: str = "documents") -> str:
    """The BM25 scoring CTE chain (assumes `terms` is already in scope) —
    ends with scored(doc_id, score, nt). Shared by search_bm25_sql /
    search_bm25_msm_sql / rank_eval_sql / search_hybrid_rrf_sql so every
    oracle states the SAME Robertson-idf arithmetic."""
    return f"""post AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms
  WHERE term IN {_terms_in(query_terms)} GROUP BY doc_id, term
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM terms GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM {table})::DOUBLE AS n_docs,
         (SELECT sum(coalesce(dl.dl,0)) FROM {table} d LEFT JOIN dl USING (doc_id))
           / (SELECT count(*) FROM {table}) AS avgdl
),
df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM terms
  WHERE term IN {_terms_in(query_terms)} GROUP BY term
),
scored AS (
  SELECT p.doc_id,
         sum( ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * p.tf * ({k1} + 1)
              / (p.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score,
         count(DISTINCT p.term) AS nt
  FROM post p
  JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN stats s
  GROUP BY p.doc_id
)"""


def search_bm25_sql(query_terms: list[str], k1: float = 1.2, b: float = 0.75,
                    limit: int = 20, offset: int = 0,
                    table: str = "documents",
                    conjunctive: bool = True) -> str:
    """BM25 (Robertson idf = ln(1 + (N-df+0.5)/(df+0.5))); conjunctive AND
    by default, disjunctive OR with conjunctive=False; deterministic
    tiebreak (rounded score desc, doc_id asc). Returns (doc_id, score)."""
    n = len(set(query_terms))
    nt_filter = f"WHERE nt = {n}" if conjunctive else ""
    return f"""
WITH {terms_cte(table)},
{bm25_scored_ctes(query_terms, k1, b, table)}
SELECT doc_id, round(score, 4) AS score
FROM scored {nt_filter}
ORDER BY round(score, 4) DESC, doc_id ASC
LIMIT {limit} OFFSET {offset}
"""


def search_bm25_msm_sql(query_terms: list[str], min_should_match: int = 2,
                        k1: float = 1.2, b: float = 0.75, limit: int = 20,
                        table: str = "documents") -> str:
    """Mirrors operators/search.py::search_bm25_msm — docs matching ≥ m
    distinct query terms, scored over the terms they match. Returns
    (doc_id, score, n_matched)."""
    return f"""
WITH {terms_cte(table)},
{bm25_scored_ctes(query_terms, k1, b, table)}
SELECT doc_id, round(score, 4) AS score, nt::BIGINT AS n_matched
FROM scored WHERE nt >= {int(min_should_match)}
ORDER BY round(score, 4) DESC, doc_id ASC
LIMIT {limit}
"""


def search_query_string_sql(query: str, limit: int = 20,
                            table: str = "documents") -> str:
    """Mirrors operators/search.py::search_query_string — the SAME
    parse_query_tree AST rendered as set-algebra SQL (AND→INTERSECT,
    OR→UNION, NOT→universe EXCEPT), ranked by Σtf over positive terms.
    Single source of truth for the grammar: both engines evaluate one
    parse."""
    from ..operators.search import parse_query_tree

    tree = parse_query_tree(query)
    if tree is None:
        return f"SELECT doc_id, 0::BIGINT AS score_abs FROM {table} WHERE 1=0"

    def render(node) -> str:
        kind = node[0]
        if kind == "term":
            return f"SELECT DISTINCT doc_id FROM terms WHERE term = '{node[1]}'"
        if kind == "and":
            return " INTERSECT ".join(f"({render(c)})" for c in node[1])
        if kind == "or":
            return " UNION ".join(f"({render(c)})" for c in node[1])
        return f"(SELECT doc_id FROM {table}) EXCEPT ({render(node[1])})"

    def pos_terms(node, neg=False) -> set[str]:
        kind = node[0]
        if kind == "term":
            return set() if neg else {node[1]}
        if kind == "not":
            return pos_terms(node[1], not neg)
        return set().union(*(pos_terms(c, neg) for c in node[1]))

    pos = sorted(pos_terms(tree))
    score = (
        f"""sc AS (
  SELECT doc_id, count(*)::BIGINT AS score_abs FROM terms
  WHERE term IN {_terms_in(pos)} GROUP BY doc_id
)"""
        if pos
        else "sc AS (SELECT doc_id, 0::BIGINT AS score_abs FROM terms WHERE 1=0)"
    )
    return f"""
WITH {terms_cte(table)},
m AS ({render(tree)}),
{score}
SELECT m.doc_id, coalesce(sc.score_abs, 0)::BIGINT AS score_abs
FROM m LEFT JOIN sc USING (doc_id)
ORDER BY score_abs DESC, doc_id ASC
LIMIT {int(limit)}
"""


def search_bm25_filtered_sql(query_terms: list[str], where: str,
                             k1: float = 1.2, b: float = 0.75,
                             limit: int = 20,
                             table: str = "documents") -> str:
    """Mirrors operators/search.py::search_bm25_filtered — disjunctive
    BM25 restricted to docs satisfying ``where`` (a predicate over the
    documents row, alias d). Scores are identical to the unfiltered
    query because BM25's per-doc score depends only on the doc's own
    rows + corpus-global stats, so the oracle may filter AFTER scoring.
    Returns (doc_id, score)."""
    return f"""
WITH {terms_cte(table)},
{bm25_scored_ctes(query_terms, k1, b, table)}
SELECT s.doc_id, round(s.score, 4) AS score
FROM scored s JOIN {table} d ON d.doc_id = s.doc_id
WHERE {where}
ORDER BY round(s.score, 4) DESC, s.doc_id ASC
LIMIT {int(limit)}
"""


def search_lmd_sql(query_terms: list[str], mu: float = 2000.0,
                   limit: int = 20, table: str = "documents") -> str:
    """Mirrors operators/search.py::search_lmd — Dirichlet-smoothed query
    likelihood (Lucene LMDirichletSimilarity): per matched term
    ln(1 + tf/(mu·cf/T)) + ln(mu/(dl+mu)), summed per doc, disjunctive.
    Returns (doc_id, score)."""
    return f"""
WITH {terms_cte(table)},
post AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms
  WHERE term IN {_terms_in(query_terms)} GROUP BY doc_id, term
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM terms GROUP BY doc_id),
cf AS (
  SELECT term, count(*)::DOUBLE AS cf FROM terms
  WHERE term IN {_terms_in(query_terms)} GROUP BY term
),
tot AS (SELECT count(*)::DOUBLE AS t FROM terms),
scored AS (
  SELECT p.doc_id,
         sum( ln(1 + p.tf / ({mu} * cf.cf / tot.t))
              + ln({mu} / (dl.dl + {mu})) ) AS score
  FROM post p JOIN dl USING (doc_id) JOIN cf USING (term) CROSS JOIN tot
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored
ORDER BY round(score, 4) DESC, doc_id ASC
LIMIT {int(limit)}
"""


def search_lmjm_sql(query_terms: list[str], lam: float = 0.1,
                    limit: int = 20, table: str = "documents") -> str:
    """Mirrors operators/search.py::search_lmjm — Jelinek-Mercer-smoothed
    query likelihood (Lucene LMJelinekMercerSimilarity): per matched term
    ln(1 + ((1-λ)·tf/dl) / (λ·cf/T)), summed per doc, disjunctive.
    Returns (doc_id, score)."""
    one_minus = 1.0 - float(lam)
    return f"""
WITH {terms_cte(table)},
post AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms
  WHERE term IN {_terms_in(query_terms)} GROUP BY doc_id, term
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM terms GROUP BY doc_id),
cf AS (
  SELECT term, count(*)::DOUBLE AS cf FROM terms
  WHERE term IN {_terms_in(query_terms)} GROUP BY term
),
tot AS (SELECT count(*)::DOUBLE AS t FROM terms),
scored AS (
  SELECT p.doc_id,
         sum( ln(1 + ({one_minus!r} * p.tf / dl.dl)
                     / ({float(lam)!r} * cf.cf / tot.t)) ) AS score
  FROM post p JOIN dl USING (doc_id) JOIN cf USING (term) CROSS JOIN tot
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored
ORDER BY round(score, 4) DESC, doc_id ASC
LIMIT {int(limit)}
"""


def search_dfr_sql(query_terms: list[str], c: float = 1.0,
                   limit: int = 20, table: str = "documents") -> str:
    """Mirrors operators/search.py::search_dfr — DFR I(n)L2 (Lucene
    DFRSimilarity(In, L, H2), Amati & Van Rijsbergen TOIS'02): with
    tfn = tf·log2(1 + c·avgdl/dl), per matched term
    tfn·log2((N+1)/(df+0.5))/(tfn+1), summed per doc, disjunctive.
    Returns (doc_id, score)."""
    return f"""
WITH {terms_cte(table)},
post AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms
  WHERE term IN {_terms_in(query_terms)} GROUP BY doc_id, term
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM terms GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM {table})::DOUBLE AS n_docs,
         (SELECT sum(coalesce(dl.dl,0)) FROM {table} d LEFT JOIN dl USING (doc_id))
           / (SELECT count(*) FROM {table}) AS avgdl
),
df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM terms
  WHERE term IN {_terms_in(query_terms)} GROUP BY term
),
scored AS (
  SELECT p.doc_id,
         sum( (p.tf * log2(1 + {float(c)!r} * s.avgdl / dl.dl))
              * log2((s.n_docs + 1) / (df.df + 0.5))
              / ((p.tf * log2(1 + {float(c)!r} * s.avgdl / dl.dl)) + 1) ) AS score
  FROM post p
  JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN stats s
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored
ORDER BY round(score, 4) DESC, doc_id ASC
LIMIT {int(limit)}
"""


def search_ib_sql(query_terms: list[str], c: float = 1.0,
                  limit: int = 20, table: str = "documents") -> str:
    """Mirrors operators/search.py::search_ib — information-based
    log-logistic with LambdaTTF (Lucene IBSimilarity(LL, TTF, H2),
    Clinchant & Gaussier SIGIR'10): with tfn = tf·log2(1 + c·avgdl/dl)
    and λ = (cf+1)/(N+1), per matched term ln(1 + tfn/λ), summed per
    doc, disjunctive. Returns (doc_id, score)."""
    return f"""
WITH {terms_cte(table)},
post AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms
  WHERE term IN {_terms_in(query_terms)} GROUP BY doc_id, term
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM terms GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM {table})::DOUBLE AS n_docs,
         (SELECT sum(coalesce(dl.dl,0)) FROM {table} d LEFT JOIN dl USING (doc_id))
           / (SELECT count(*) FROM {table}) AS avgdl
),
cf AS (
  SELECT term, count(*)::DOUBLE AS cf FROM terms
  WHERE term IN {_terms_in(query_terms)} GROUP BY term
),
scored AS (
  SELECT p.doc_id,
         sum( ln(1 + (p.tf * log2(1 + {float(c)!r} * s.avgdl / dl.dl))
                     / ((cf.cf + 1) / (s.n_docs + 1))) ) AS score
  FROM post p
  JOIN dl USING (doc_id) JOIN cf USING (term) CROSS JOIN stats s
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored
ORDER BY round(score, 4) DESC, doc_id ASC
LIMIT {int(limit)}
"""


def search_bm25_plus_sql(query_terms: list[str], k1: float = 1.2,
                         b: float = 0.75, delta: float = 1.0,
                         limit: int = 20,
                         table: str = "documents") -> str:
    """Mirrors operators/search.py::search_bm25_plus — BM25+ (Lv & Zhai
    CIKM'11): Robertson idf · (tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) + δ),
    summed per doc, disjunctive. Returns (doc_id, score)."""
    return f"""
WITH {terms_cte(table)},
{bm25_scored_ctes(query_terms, k1, b, table)},
plus AS (
  SELECT p.doc_id,
         sum( ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * ( p.tf * ({k1} + 1)
                  / (p.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl))
                  + {float(delta)!r} ) ) AS score
  FROM post p
  JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN stats s
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM plus
ORDER BY round(score, 4) DESC, doc_id ASC
LIMIT {int(limit)}
"""


GEO_LAT_E4_SQL = (
    "((('0x' || substr(md5('geo:lat:' || doc_id), 1, 15))::BIGINT"
    " % 1600001 - 800000))"
)
GEO_LON_E4_SQL = (
    "((('0x' || substr(md5('geo:lon:' || doc_id), 1, 15))::BIGINT"
    " % 3600001 - 1800000))"
)


def _geo_cte(table: str = "documents") -> str:
    """Derived geo_point (FIXTURES pattern) — mirrors
    operators/geo.py::with_geo exactly (integer micro-degrees / 1e4)."""
    return f"""geo AS (
  SELECT doc_id,
         {GEO_LAT_E4_SQL} AS lat_e4, {GEO_LON_E4_SQL} AS lon_e4,
         {GEO_LAT_E4_SQL} / 10000.0 AS lat,
         {GEO_LON_E4_SQL} / 10000.0 AS lon
  FROM {table}
)"""


def _haversine_sql(clat: float, clon: float) -> str:
    """Same operation order as operators/geo.py::_haversine_m."""
    return (
        f"2.0 * 6371000.0 * asin(sqrt("
        f"sin(radians(lat - {float(clat)!r}) / 2.0)"
        f" * sin(radians(lat - {float(clat)!r}) / 2.0)"
        f" + cos(radians({float(clat)!r})) * cos(radians(lat))"
        f" * sin(radians(lon - {float(clon)!r}) / 2.0)"
        f" * sin(radians(lon - {float(clon)!r}) / 2.0)))"
    )


def geo_distance_sql(clat: float, clon: float, radius_m: float,
                     limit: int = 20, table: str = "documents") -> str:
    """Mirrors operators/geo.py::geo_distance_search — ES geo_distance
    query + _geo_distance sort. Returns (doc_id, dist_m)."""
    return f"""
WITH {_geo_cte(table)},
d AS (
  SELECT doc_id, round({_haversine_sql(clat, clon)}, 4) AS dist_m FROM geo
)
SELECT doc_id, dist_m FROM d
WHERE dist_m <= {float(radius_m)!r}
ORDER BY dist_m ASC, doc_id ASC
LIMIT {int(limit)}
"""


def geo_bbox_sql(min_lat: float, max_lat: float, min_lon: float,
                 max_lon: float, table: str = "documents") -> str:
    """Mirrors operators/geo.py::geo_bounding_box — integer-exact box,
    ES antimeridian wrap when min_lon > max_lon.
    Returns (doc_id, lat, lon)."""
    lo_lat, hi_lat = int(round(min_lat * 10000)), int(round(max_lat * 10000))
    lo_lon, hi_lon = int(round(min_lon * 10000)), int(round(max_lon * 10000))
    if lo_lon > hi_lon:
        lon_pred = f"(lon_e4 >= {lo_lon} OR lon_e4 <= {hi_lon})"
    else:
        lon_pred = f"(lon_e4 >= {lo_lon} AND lon_e4 <= {hi_lon})"
    return f"""
WITH {_geo_cte(table)}
SELECT doc_id, lat, lon FROM geo
WHERE lat_e4 >= {lo_lat} AND lat_e4 <= {hi_lat} AND {lon_pred}
"""


def distance_feature_sql(clat: float, clon: float, pivot_m: float,
                         boost: float = 1.0, k: int = 20,
                         table: str = "documents") -> str:
    """Mirrors operators/geo.py::distance_feature — ES distance_feature
    proximity ranker: boost · pivot / (pivot + haversine), distance
    rounded 4 dp before the score (the rings' cross-engine pin)."""
    return f"""
WITH {_geo_cte(table)},
d AS (
  SELECT doc_id, round({_haversine_sql(clat, clon)}, 4) AS dist_m FROM geo
)
SELECT doc_id,
       round({float(boost)!r} * {float(pivot_m)!r}
             / ({float(pivot_m)!r} + dist_m), 4) AS score
FROM d
ORDER BY score DESC, doc_id ASC
LIMIT {int(k)}
"""


def geotile_grid_sql(zoom: int = 5, size: int = 20,
                     table: str = "documents") -> str:
    """Mirrors operators/geo.py::geotile_grid — web-mercator z/x/y tile
    buckets, top `size` by count, with the engine's same clamp to
    min(4^zoom, 65536). Returns (tile, doc_count)."""
    size = min(int(size), (1 << int(zoom)) ** 2, 65536)
    n = float(1 << int(zoom))
    return f"""
WITH {_geo_cte(table)},
t AS (
  SELECT doc_id,
         floor(round((lon + 180.0) / 360.0 * {n!r}, 9)) AS x_raw,
         floor(round((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat)))
                / pi()) / 2.0 * {n!r}, 9)) AS y_raw
  FROM geo
),
k AS (
  SELECT doc_id,
         '{int(zoom)}' || '/' ||
         CAST(greatest(0.0, least(x_raw, {n - 1.0!r})) AS BIGINT)::VARCHAR
         || '/' ||
         CAST(greatest(0.0, least(y_raw, {n - 1.0!r})) AS BIGINT)::VARCHAR
           AS tile
  FROM t
)
SELECT tile, count(*)::BIGINT AS doc_count
FROM k GROUP BY tile
ORDER BY doc_count DESC, tile ASC
LIMIT {int(size)}
"""


def geo_rings_sql(clat: float, clon: float, edges_m: list[float],
                  table: str = "documents") -> str:
    """Mirrors operators/geo.py::geo_distance_rings — ES geo_distance
    aggregation (concentric half-open rings) with min/max sub-metrics.
    Returns (ring, doc_count, min_dist, max_dist)."""
    edges = [float(e) for e in edges_m]
    bounds = [(None, edges[0])]
    bounds += [(edges[i], edges[i + 1]) for i in range(len(edges) - 1)]
    bounds += [(edges[-1], None)]
    label_cases, order_cases = [], []
    for i, (lo, hi) in enumerate(bounds):
        label = f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
        conds = []
        if lo is not None:
            conds.append(f"dist_m >= {lo!r}")
        if hi is not None:
            conds.append(f"dist_m < {hi!r}")
        pred = " AND ".join(conds) if conds else "TRUE"
        label_cases.append(f"WHEN {pred} THEN '{label}'")
        order_cases.append(f"WHEN {pred} THEN {i}")
    return f"""
WITH {_geo_cte(table)},
d AS (
  SELECT doc_id, round({_haversine_sql(clat, clon)}, 4) AS dist_m FROM geo
),
r AS (
  SELECT dist_m,
         CASE {' '.join(label_cases)} END AS ring,
         CASE {' '.join(order_cases)} END AS ord
  FROM d
)
SELECT ring, count(*)::BIGINT AS doc_count,
       min(dist_m) AS min_dist, max(dist_m) AS max_dist
FROM r GROUP BY ring, ord
ORDER BY ord ASC
"""


def url_normalize_sql(table: str = "documents") -> str:
    """S4 normalizer over the deterministically-derived raw_url.
    Returns (doc_id, raw_url, norm_path)."""
    return f"""
WITH raw AS (
  SELECT doc_id, {RAW_URL_SQL} AS raw_url, {SITE_SQL} AS site FROM {table}
),
step AS (
  SELECT doc_id, raw_url,
         regexp_replace(lower(trim(raw_url)), '[?#].*$', '') AS u,
         regexp_replace(lower(trim(site)), '/+$', '') AS root
  FROM raw
),
p AS (
  SELECT doc_id, raw_url,
         CASE WHEN starts_with(u, root) THEN substr(u, length(root) + 1)
              WHEN starts_with(u, '/') THEN u
              ELSE NULL END AS path
  FROM step
),
p2 AS (
  SELECT doc_id, raw_url,
         CASE WHEN length(path) > 1 THEN regexp_replace(path, '/+$', '')
              ELSE path END AS path
  FROM p
)
SELECT doc_id, raw_url,
       CASE WHEN path = '' THEN '/'
            WHEN starts_with(path, '/') THEN path
            ELSE NULL END AS norm_path
FROM p2
"""


def url_reorder_sql(table: str = "documents") -> str:
    """Mirror of operators/reorder.py::url_ordered_ids — dense 0-based rank
    under lexicographic (url, doc_id) order. Returns (doc_id, new_id)."""
    return f"""
SELECT doc_id,
       (row_number() OVER (ORDER BY {URL_SQL}, doc_id) - 1)::BIGINT AS new_id
FROM {table}
"""


def statistics_sql(table: str = "documents") -> str:
    """A1 per-site statistics: (site_key, pages, lemmas)."""
    return f"""
WITH {terms_cte(table, extra_cols=f"{SITE_KEY_SQL.replace('doc_id', 'd.doc_id')} AS site_key")},
pages AS (
  SELECT {SITE_KEY_SQL} AS site_key, count(*)::BIGINT AS pages
  FROM {table} GROUP BY 1
),
lemmas AS (
  SELECT site_key, count(DISTINCT term)::BIGINT AS lemmas
  FROM terms GROUP BY site_key
)
SELECT p.site_key, p.pages, coalesce(l.lemmas, 0)::BIGINT AS lemmas
FROM pages p LEFT JOIN lemmas l USING (site_key)
"""


def site_gate_sql(query_terms: list[str], table: str = "documents") -> str:
    """Q2 conjunctive site gate: sites where EVERY query term occurs on at
    least one page (reference SearchServiceImpl.java:122-127).
    Returns (site_key,)."""
    n = len(set(query_terms))
    return f"""
WITH {terms_cte(table, extra_cols=f"{SITE_KEY_SQL.replace('doc_id', 'd.doc_id')} AS site_key")}
SELECT site_key
FROM terms WHERE term IN {_terms_in(query_terms)}
GROUP BY site_key
HAVING count(DISTINCT term) = {n}
"""


def related_terms_sql(probe: str, k: int = 15, table: str = "documents") -> str:
    """Mirrors operators/search.py::related_terms — doc-level co-occurrence
    with lift = co_df · N / (df_probe · df), top-k by (lift, co_df, term)."""
    return f"""
WITH {terms_cte(table)},
post AS (
  SELECT doc_id, term FROM terms GROUP BY doc_id, term
),
n AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n_docs FROM post),
probe AS (SELECT doc_id FROM post WHERE term = '{probe}'),
dfp AS (SELECT count(*)::DOUBLE AS df_probe FROM probe),
co AS (
  SELECT p.term, count(*)::BIGINT AS co_df
  FROM post p JOIN probe USING (doc_id)
  WHERE p.term <> '{probe}'
  GROUP BY p.term
),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM post GROUP BY term)
SELECT co.term, co.co_df, dfs.df,
       round(co.co_df::DOUBLE * n.n_docs / (dfp.df_probe * dfs.df::DOUBLE), 4) AS lift
FROM co JOIN dfs ON co.term = dfs.term, n, dfp
ORDER BY lift DESC, co.co_df DESC, co.term ASC
LIMIT {k}
"""


def spell_suggest_sql(probe: str, k: int = 5, table: str = "documents") -> str:
    """Mirrors operators/search.py::spell_suggest — brute-force levenshtein
    over the term dictionary (the oracle may scan; the Spark plan uses the
    deletion-neighborhood join)."""
    return f"""
WITH {terms_cte(table)},
td AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM terms GROUP BY term
)
SELECT term, df FROM td
WHERE levenshtein(term, '{probe}') = 1
ORDER BY df DESC, term ASC
LIMIT {k}
"""


# ------------------------------------------------------ positional / phrase

def positional_terms_cte(table: str = "documents") -> str:
    """CTE `pos_terms(doc_id, term, pos)` — one row per RETAINED token
    occurrence with its 0-based position in the document's retained-token
    stream. Mirrors textproc/fast_tokenize.py::tokenize_positions_arrays:
    analyzer rules 3-5 filter BEFORE numbering (stopwords do not occupy
    positions), lemma join after. `unnest` + `generate_subscripts` run in
    lockstep in DuckDB, giving the original token order to number by."""
    return f"""
lemma_dict AS ({lemma_dict_values()}),
base AS (
  SELECT doc_id,
         string_split_regex(lower(trim(text)), '{WS_SPLIT}') AS lst
  FROM {table}
),
rawtoks AS (
  SELECT doc_id,
         regexp_replace(unnest(lst), '{BOUNDARY_STRIP}', '', 'g') AS term,
         generate_subscripts(lst, 1) AS ord
  FROM base
),
pos_terms AS (
  SELECT rawtoks.doc_id, coalesce(ld.normal, {rule_lemma_sql('rawtoks.term')}) AS term,
         row_number() OVER (PARTITION BY rawtoks.doc_id
                            ORDER BY rawtoks.ord) - 1 AS pos
  FROM rawtoks LEFT JOIN lemma_dict ld ON ld.word = rawtoks.term
  WHERE rawtoks.term <> ''
    AND regexp_matches(rawtoks.term, '{WORD_PATTERN}')
    AND rawtoks.term NOT IN {sql_not_in_list()}
)"""


def positional_postings_sql(table: str = "documents") -> str:
    """(doc_id, term, pos) — the positional postings relation (mirrors
    operators/positional.py::build_positional)."""
    return f"""
WITH {positional_terms_cte(table)}
SELECT doc_id, term, pos::BIGINT AS pos FROM pos_terms
"""


def search_phrase_sql(terms: list[str], k: int = 20,
                      table: str = "documents") -> str:
    """Mirrors operators/positional.py::search_phrase for an ANALYZED term
    sequence: anchor on terms[0], require terms[i] at pos₀+i, count
    occurrences per doc, top-k by (phrase_tf desc, doc_id asc)."""
    sel = f"(SELECT doc_id, pos FROM pos_terms WHERE term = '{terms[0]}') p0"
    for i, t in enumerate(terms[1:], start=1):
        sel += (
            f"\n  JOIN (SELECT doc_id, pos FROM pos_terms WHERE term = '{t}') p{i}"
            f" ON p{i}.doc_id = p0.doc_id AND p{i}.pos = p0.pos + {i}"
        )
    return f"""
WITH {positional_terms_cte(table)}
SELECT p0.doc_id, count(*)::BIGINT AS phrase_tf
FROM {sel}
GROUP BY p0.doc_id
ORDER BY phrase_tf DESC, p0.doc_id ASC
LIMIT {k}
"""


def facet_by_site_sql(query_terms: list[str],
                      table: str = "documents") -> str:
    """Mirrors operators/search.py::facet_by_site — per-site hit count and
    max Σtf score over the conjunctive hit set."""
    n = len(set(query_terms))
    return f"""
WITH {terms_cte(table)},
post AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms
  WHERE term IN {_terms_in(query_terms)} GROUP BY doc_id, term
),
hits AS (
  SELECT doc_id, sum(tf)::BIGINT AS score_abs
  FROM post GROUP BY doc_id
  HAVING count(DISTINCT term) = {n}
)
SELECT {SITE_KEY_SQL} AS site_key, count(*)::BIGINT AS n_hits,
       max(score_abs) AS max_score
FROM hits
GROUP BY site_key
ORDER BY n_hits DESC, site_key ASC
"""


def facet_stats_sql(query_terms: list[str], field: str = "n_chars",
                    table: str = "documents") -> str:
    """Mirrors operators/search.py::facet_stats — ES stats agg of a
    numeric doc field over the conjunctive hit set."""
    n = len(set(query_terms))
    return f"""
WITH {terms_cte(table)},
post AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms
  WHERE term IN {_terms_in(query_terms)} GROUP BY doc_id, term
),
hits AS (
  SELECT doc_id FROM post GROUP BY doc_id
  HAVING count(DISTINCT term) = {n}
)
SELECT count(*)::BIGINT AS n_hits,
       min(d.{field})::BIGINT AS min_v,
       max(d.{field})::BIGINT AS max_v,
       sum(d.{field})::BIGINT AS sum_v,
       round(avg(d.{field}), 4) AS avg_v
FROM hits h JOIN {table} d USING (doc_id)
"""


def search_sorted_by_time_sql(query_terms: list[str], limit: int = 20,
                              table: str = "documents") -> str:
    """Mirrors operators/search.py::search_sorted_by_time — conjunctive
    match set ordered by derived crawl epoch desc, doc_id asc."""
    n = len(set(query_terms))
    return f"""
WITH {terms_cte(table)},
post AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms
  WHERE term IN {_terms_in(query_terms)} GROUP BY doc_id, term
),
hits AS (
  SELECT doc_id, sum(tf)::BIGINT AS score_abs
  FROM post GROUP BY doc_id
  HAVING count(DISTINCT term) = {n}
)
SELECT doc_id, score_abs, (1704067200 + 60 * doc_id)::BIGINT AS epoch_s
FROM hits
ORDER BY epoch_s DESC, doc_id ASC
LIMIT {int(limit)}
"""


def next_word_suggest_sql(prev_word: str, prefix: str = "", k: int = 10,
                          table: str = "documents") -> str:
    """Mirrors operators/search.py::next_word_suggest — bigram
    continuations of prev_word, optional prefix filter, count desc."""
    pw = prev_word.strip().lower()
    pf = prefix.strip().lower()
    pred = f"AND b.term LIKE '{pf}%'" if pf else ""
    return f"""
WITH {positional_terms_cte(table)}
SELECT b.term, count(*)::BIGINT AS n
FROM pos_terms a JOIN pos_terms b
  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
WHERE a.term = '{pw}' {pred}
GROUP BY b.term
ORDER BY n DESC, b.term ASC
LIMIT {int(k)}
"""


def facet_top_hits_sql(query_terms: list[str], per_site: int = 3,
                       table: str = "documents") -> str:
    """Mirrors operators/search.py::facet_top_hits — per-site-bucket
    top hits (score_abs desc, doc_id asc)."""
    n = len(set(query_terms))
    return f"""
WITH {terms_cte(table)},
post AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms
  WHERE term IN {_terms_in(query_terms)} GROUP BY doc_id, term
),
hits AS (
  SELECT doc_id, sum(tf)::BIGINT AS score_abs
  FROM post GROUP BY doc_id
  HAVING count(DISTINCT term) = {n}
),
ranked AS (
  SELECT {SITE_KEY_SQL} AS site_key, doc_id, score_abs,
         row_number() OVER (PARTITION BY {SITE_KEY_SQL}
                            ORDER BY score_abs DESC, doc_id ASC)::INT
           AS site_rank
  FROM hits
)
SELECT site_key, doc_id, score_abs, site_rank
FROM ranked WHERE site_rank <= {int(per_site)}
ORDER BY site_key ASC, site_rank ASC
"""


def collocations_sql(min_count: int = 5, k: int = 20,
                     table: str = "documents") -> str:
    """Mirrors operators/textstats.py::collocations — adjacent-bigram PMI
    over the positional postings relation."""
    return f"""
WITH {positional_terms_cte(table)},
occ AS (SELECT term, count(*)::DOUBLE AS occ FROM pos_terms GROUP BY term),
t_total AS (SELECT count(*)::DOUBLE AS t FROM pos_terms),
bigrams AS (
  SELECT a.term AS term_a, b.term AS term_b, count(*)::BIGINT AS pair_count
  FROM pos_terms a JOIN pos_terms b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY a.term, b.term
),
b_total AS (SELECT sum(pair_count)::DOUBLE AS b FROM bigrams),
scored AS (
  SELECT g.term_a, g.term_b, g.pair_count,
         round(ln((g.pair_count::DOUBLE * t.t * t.t)
                  / (bt.b * oa.occ * ob.occ)), 4) AS pmi
  FROM bigrams g
  JOIN occ oa ON oa.term = g.term_a
  JOIN occ ob ON ob.term = g.term_b
  CROSS JOIN t_total t CROSS JOIN b_total bt
  WHERE g.pair_count >= {min_count}
)
SELECT term_a, term_b, pair_count, pmi FROM scored
ORDER BY pmi DESC, term_a ASC, term_b ASC
LIMIT {k}
"""


def more_like_this_sql(seed_doc_id: int, m: int = 10, k: int = 20,
                       table: str = "documents") -> str:
    """Mirrors operators/search.py::more_like_this — seed doc's top-m
    tf·idf terms as a disjunctive query, Σ tf·idf scoring."""
    return f"""
WITH {terms_cte(table)},
post AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms GROUP BY doc_id, term
),
dfs AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM terms GROUP BY term),
nd AS (SELECT (SELECT count(*) FROM {table})::DOUBLE AS n),
seed AS (
  SELECT p.term,
         ln(1 + (nd.n - d.df + 0.5) / (d.df + 0.5)) AS idf,
         p.tf::DOUBLE * ln(1 + (nd.n - d.df + 0.5) / (d.df + 0.5)) AS w
  FROM post p JOIN dfs d USING (term) CROSS JOIN nd
  WHERE p.doc_id = {seed_doc_id}
  ORDER BY w DESC, p.term ASC
  LIMIT {m}
),
scored AS (
  SELECT p.doc_id, round(sum(p.tf::DOUBLE * s.idf), 4) AS score
  FROM post p JOIN seed s USING (term)
  WHERE p.doc_id <> {seed_doc_id}
  GROUP BY p.doc_id
)
SELECT doc_id, score FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def search_synonyms_sql(groups: list[list[str]], limit: int = 20,
                        table: str = "documents") -> str:
    """Mirrors operators/search.py::search_synonyms — per-group Σ member
    tf, conjunctive across groups (groups are disjoint by construction,
    textproc/synonyms.py::expand_terms)."""
    groups = [sorted(set(g)) for g in groups if g]
    n = len(groups)
    members = sorted({t for g in groups for t in g})
    vals = ", ".join(
        f"('{t}', {gi})" for gi, g in enumerate(groups) for t in g
    )
    return f"""
WITH {terms_cte(table)},
post AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms
  WHERE term IN {_terms_in(members)} GROUP BY doc_id, term
),
syn(member, grp) AS (VALUES {vals}),
hits AS (
  SELECT p.doc_id, sum(p.tf)::BIGINT AS score_abs,
         count(DISTINCT s.grp) AS ng
  FROM post p JOIN syn s ON p.term = s.member
  GROUP BY p.doc_id
  HAVING count(DISTINCT s.grp) = {n}
)
SELECT doc_id, score_abs FROM hits
ORDER BY score_abs DESC, doc_id ASC
LIMIT {limit}
"""


def search_boolean_sql(must: list[str], must_not: list[str],
                       limit: int = 20, table: str = "documents") -> str:
    """Mirrors operators/search.py::search_boolean — conjunctive Σtf hits
    on `must`, minus docs containing ANY `must_not` term."""
    n = len(set(must))
    not_clause = (
        f"""AND doc_id NOT IN (
    SELECT DISTINCT doc_id FROM terms WHERE term IN {_terms_in(must_not)}
  )"""
        if must_not
        else ""
    )
    return f"""
WITH {terms_cte(table)},
post AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms
  WHERE term IN {_terms_in(must)} GROUP BY doc_id, term
),
hits AS (
  SELECT doc_id, sum(tf)::BIGINT AS score_abs
  FROM post GROUP BY doc_id
  HAVING count(DISTINCT term) = {n}
)
SELECT doc_id, score_abs FROM hits
WHERE TRUE {not_clause}
ORDER BY score_abs DESC, doc_id ASC
LIMIT {limit}
"""


def search_proximity_sql(terms: list[str], slop: int = 0, k: int = 20,
                         table: str = "documents") -> str:
    """Mirrors operators/positional.py::proximity_match — greedy-earliest
    ordered-window chain: per anchor pos0, keep min feasible position of
    each next term; count surviving anchors per doc."""
    window = len(terms) - 1 + slop
    ctes = [
        f"a0 AS (SELECT doc_id, pos AS pos0, pos AS prev FROM pos_terms"
        f" WHERE term = '{terms[0]}')"
    ]
    for i, t in enumerate(terms[1:], start=1):
        ctes.append(
            f"""a{i} AS (
  SELECT a{i - 1}.doc_id, a{i - 1}.pos0, min(p.pos) AS prev
  FROM a{i - 1} JOIN pos_terms p
    ON p.doc_id = a{i - 1}.doc_id AND p.term = '{t}'
   AND p.pos > a{i - 1}.prev AND p.pos <= a{i - 1}.pos0 + {window}
  GROUP BY a{i - 1}.doc_id, a{i - 1}.pos0
)"""
        )
    last = f"a{len(terms) - 1}"
    return f"""
WITH {positional_terms_cte(table)},
{",".join(ctes)}
SELECT doc_id, count(*)::BIGINT AS prox_tf FROM {last}
GROUP BY doc_id
ORDER BY prox_tf DESC, doc_id ASC
LIMIT {k}
"""


def prefix_suggest_sql(prefix: str, k: int = 10,
                       table: str = "documents") -> str:
    """Mirrors operators/search.py::prefix_suggest — dictionary terms
    starting with `prefix`, df desc then term asc, limit k."""
    return f"""
WITH {terms_cte(table)},
td AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM terms GROUP BY term
)
SELECT term, df FROM td
WHERE term LIKE '{prefix}%'
ORDER BY df DESC, term ASC
LIMIT {k}
"""


def search_collapsed_sql(query_terms: list[str], per_site: int = 1,
                         limit: int = 20, table: str = "documents") -> str:
    """Site-collapsed BM25 top-k (one-result-per-domain diversification) —
    mirrors operators/search.py::collapse_hits over the full scored set.
    The oracle states the spec as a window; the engine's max_by collapse
    must elect identical winners (score desc, doc_id asc per site)."""
    inner = search_bm25_sql(query_terms, limit=1_000_000, table=table)
    return f"""
WITH hits AS ({inner}),
g AS (SELECT doc_id, score, {SITE_KEY_SQL} AS site_key FROM hits),
r AS (
  SELECT site_key, doc_id, score,
         row_number() OVER (PARTITION BY site_key
                            ORDER BY score DESC, doc_id ASC) AS rn
  FROM g
)
SELECT site_key, doc_id, score FROM r WHERE rn <= {per_site}
ORDER BY score DESC, doc_id ASC LIMIT {limit}
"""


def search_fuzzy_sql(query_terms: list[str], k1: float = 1.2, b: float = 0.75,
                     limit: int = 20, offset: int = 0,
                     table: str = "documents") -> str:
    """BM25 with query-time spell correction — mirrors
    operators/search.py::search_fuzzy: per input term, keep it if it is in
    the dictionary, else substitute its top distance-1 suggestion (df
    desc, term asc); terms with no suggestion drop out; conjunctive over
    the resolved set. The oracle resolves with a brute levenshtein join
    (the spec); the engine resolves via the SymSpell deletion-neighborhood
    probe — both must elect identical terms."""
    vals = ", ".join(f"('{t}')" for t in sorted(set(query_terms)))
    return f"""
WITH {terms_cte(table)},
dict AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM terms GROUP BY term
),
q0 AS (SELECT qt FROM (VALUES {vals}) v(qt)),
sugg AS (
  SELECT q0.qt, d.term,
         row_number() OVER (PARTITION BY q0.qt
                            ORDER BY d.df DESC, d.term ASC) AS rn
  FROM q0 JOIN dict d ON levenshtein(q0.qt, d.term) = 1
  WHERE q0.qt NOT IN (SELECT term FROM dict)
),
qterms AS (
  SELECT qt AS term FROM q0 WHERE qt IN (SELECT term FROM dict)
  UNION
  SELECT term FROM sugg WHERE rn = 1
),
post AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms
  WHERE term IN (SELECT term FROM qterms) GROUP BY doc_id, term
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM terms GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM {table})::DOUBLE AS n_docs,
         (SELECT sum(coalesce(dl.dl,0)) FROM {table} d LEFT JOIN dl USING (doc_id))
           / (SELECT count(*) FROM {table}) AS avgdl
),
qdf AS (
  SELECT term, df FROM dict WHERE term IN (SELECT term FROM qterms)
),
scored AS (
  SELECT p.doc_id,
         sum( ln(1 + (s.n_docs - qdf.df + 0.5) / (qdf.df + 0.5))
              * p.tf * ({k1} + 1)
              / (p.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score,
         count(DISTINCT p.term) AS nt
  FROM post p
  JOIN dl USING (doc_id) JOIN qdf USING (term) CROSS JOIN stats s
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored WHERE nt = (SELECT count(*) FROM qterms)
ORDER BY round(score, 4) DESC, doc_id ASC
LIMIT {limit} OFFSET {offset}
"""


def search_bm25_batch_sql(queries: dict[str, list[str]], limit: int = 20,
                          table: str = "documents") -> str:
    """Batched BM25 — the oracle states each query independently
    (UNION ALL of the single-query spec); the engine's one-pass batch
    plan must reproduce the union exactly."""
    parts = [
        f"SELECT '{qid}' AS query_id, doc_id, score FROM ("
        + search_bm25_sql(qts, limit=limit, table=table)
        + ")"
        for qid, qts in sorted(queries.items())
    ]
    return "\nUNION ALL\n".join(parts)


def surt_keys_sql(table: str = "documents") -> str:
    """SURT canonical keys over raw_url — mirrors
    functions/text_columns.py::surt_key_col."""
    return f"""
WITH u AS (SELECT doc_id, lower({RAW_URL_SQL}) AS u FROM {table}),
p AS (SELECT doc_id, regexp_replace(u, '^[a-z]+://', '') AS rest FROM u),
h AS (
  SELECT doc_id,
         regexp_replace(regexp_extract(rest, '^([^/?#]+)', 1),
                        '^www\\.', '') AS host,
         regexp_replace(regexp_replace(regexp_replace(rest, '^[^/?#]+', ''),
                        '[?#].*$', ''), '/+$', '') AS path
  FROM p
)
SELECT doc_id,
       array_to_string(list_reverse(string_split(host, '.')), ',')
         || ')' || path AS surt
FROM h
"""


def pruned_postings_sql(keep: int = 10, table: str = "documents") -> str:
    """Static index pruning oracle (top-`keep` per term by tf desc,
    doc_id asc) — mirrors operators/pruning.py::prune_postings; the
    oracle states the spec as a window, the engine must produce the
    identical set via its two-phase skew-safe selection."""
    return f"""
WITH {terms_cte(table)},
post AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms GROUP BY doc_id, term
),
r AS (
  SELECT doc_id, term, tf,
         row_number() OVER (PARTITION BY term
                            ORDER BY tf DESC, doc_id ASC) AS rn
  FROM post
)
SELECT doc_id, term, tf FROM r WHERE rn <= {keep}
"""


def best_passage_sql(terms: list[str], width: int = 30, k: int = 20,
                     table: str = "documents") -> str:
    """Best-passage oracle — mirrors positional.py::best_passage
    (match-anchored window enumeration, per-doc argmax, top-k docs)."""
    uniq = sorted(set(terms))
    return f"""
WITH {positional_terms_cte(table)},
m AS (SELECT doc_id, pos FROM pos_terms WHERE term IN {_terms_in(uniq)}),
w AS (
  SELECT a.doc_id, a.pos AS p_start, count(*)::BIGINT AS n_matches
  FROM m a JOIN m b ON b.doc_id = a.doc_id
    AND b.pos >= a.pos AND b.pos < a.pos + {width}
  GROUP BY a.doc_id, a.pos
),
r AS (
  SELECT doc_id, p_start, n_matches,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY n_matches DESC, p_start ASC) AS rn
  FROM w
)
SELECT doc_id, p_start, (p_start + {width - 1})::BIGINT AS p_end, n_matches
FROM r WHERE rn = 1
ORDER BY n_matches DESC, doc_id ASC
LIMIT {k}
"""


def percolate_sql(queries: list[tuple[str, list[str]]],
                  table: str = "documents") -> str:
    """Reverse-search oracle — mirrors operators/search.py::percolate
    (conjunctive containment as relational division)."""
    rows = ", ".join(
        f"('{qid}', '{t}', {len(set(terms))})"
        for qid, terms in queries
        for t in sorted(set(terms))
    )
    all_terms = sorted({t for _, terms in queries for t in terms})
    return f"""
WITH {terms_cte(table)},
post AS (
  SELECT doc_id, term FROM terms
  WHERE term IN {_terms_in(all_terms)} GROUP BY doc_id, term
),
q AS (SELECT * FROM (VALUES {rows}) v(query_id, term, n_terms)),
m AS (
  SELECT q.query_id, p.doc_id,
         count(*) AS nt, max(q.n_terms) AS n_terms
  FROM post p JOIN q USING (term)
  GROUP BY q.query_id, p.doc_id
)
SELECT query_id, doc_id FROM m WHERE nt = n_terms
"""


def doc_signatures_sql(table: str = "documents") -> str:
    """Signature-file oracle — mirrors
    operators/signatures.py::doc_signatures (63-bit superimposed coding,
    bit = h60('sig:'+term) mod 63)."""
    h = h60_sql("('sig:' || term)")
    bit = f"({h} % 63)::INT"
    return f"""
WITH {terms_cte(table)},
t AS (SELECT doc_id, term FROM terms GROUP BY doc_id, term),
b AS (SELECT doc_id, (1::BIGINT << {bit}) AS b FROM t)
SELECT doc_id, bit_or(b)::BIGINT AS sig FROM b GROUP BY doc_id
"""


def induced_stopwords_sql(max_df_ratio: float = 0.5,
                          table: str = "documents") -> str:
    """Corpus-induced stopword oracle — mirrors
    operators/search.py::induced_stopwords."""
    return f"""
WITH {terms_cte(table)},
td AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM terms GROUP BY term
),
n AS (SELECT count(*)::DOUBLE AS n_docs FROM {table})
SELECT term, df, round(df / n.n_docs, 4) AS df_ratio
FROM td, n
WHERE round(df / n.n_docs, 4) >= {max_df_ratio!r}
"""


def _conj_hits_cte(query_terms: list[str]) -> str:
    """CTE `hits(doc_id)` — conjunctive hit set (docs containing ALL query
    terms); mirrors operators/search.py::_conjunctive_hits."""
    n = len(set(query_terms))
    return f"""
hits AS (
  SELECT doc_id FROM terms
  WHERE term IN {_terms_in(query_terms)}
  GROUP BY doc_id
  HAVING count(DISTINCT term) = {n}
)"""


def term_vectors_sql(doc_ids: list[int], table: str = "documents") -> str:
    """Mirrors operators/positional.py::term_vectors: per (doc, term) tf +
    ascending CSV of token positions."""
    ids = ", ".join(str(int(d)) for d in doc_ids)
    return f"""
WITH {positional_terms_cte(table)}
SELECT doc_id, term, count(*)::BIGINT AS tf,
       string_agg(pos::VARCHAR, ',' ORDER BY pos) AS positions
FROM pos_terms
WHERE doc_id IN ({ids})
GROUP BY doc_id, term
"""


def facet_date_histogram_sql(query_terms: list[str],
                             bucket_secs: int = 86400,
                             table: str = "documents") -> str:
    """Mirrors operators/search.py::facet_date_histogram. warc_ts is the
    frozen epoch derivation 1704067200 + 60·doc_id (sources/documents.py);
    bucketing is integer modulo — TZ-independent in both engines."""
    b = int(bucket_secs)
    return f"""
WITH {terms_cte(table)},
{_conj_hits_cte(query_terms).lstrip()}
SELECT ((1704067200 + 60 * doc_id)
        - (1704067200 + 60 * doc_id) % {b})::BIGINT AS bucket_epoch,
       count(*)::BIGINT AS n_hits
FROM hits
GROUP BY 1
"""


def significant_terms_sql(query_terms: list[str], k: int = 20,
                          min_fg: int = 2,
                          table: str = "documents") -> str:
    """Mirrors operators/search.py::significant_terms: lift =
    (fg_df/n_fg)/(bg_df/n_docs) over non-query terms of the conjunctive
    hit set, fg_df >= min_fg, top-k by (lift desc, term asc)."""
    return f"""
WITH {terms_cte(table)},
{_conj_hits_cte(query_terms).lstrip()},
nfg AS (SELECT count(*)::DOUBLE AS n_fg FROM hits),
nd AS (SELECT count(*)::DOUBLE AS n_docs FROM {table}),
fg AS (
  SELECT t.term, count(DISTINCT t.doc_id)::BIGINT AS fg_df
  FROM terms t JOIN hits USING (doc_id)
  WHERE t.term NOT IN {_terms_in(query_terms)}
  GROUP BY t.term
  HAVING count(DISTINCT t.doc_id) >= {int(min_fg)}
),
bg AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS bg_df
  FROM terms GROUP BY term
)
SELECT fg.term, fg.fg_df, bg.bg_df,
       round((fg.fg_df / nfg.n_fg) / (bg.bg_df / nd.n_docs), 4) AS lift
FROM fg JOIN bg USING (term) CROSS JOIN nfg CROSS JOIN nd
ORDER BY lift DESC, fg.term ASC
LIMIT {int(k)}
"""


def significant_text_sql(query_terms: list[str], k: int = 20,
                         min_fg: int = 2,
                         table: str = "documents") -> str:
    """Mirrors operators/search.py::significant_text: JLH =
    (fg% − bg%) · (fg% / bg%) over non-query terms of the conjunctive
    hit set, fg_df >= min_fg AND fg% > bg%, top-k by (jlh desc,
    term asc) — same operation order as the Spark expression."""
    return f"""
WITH {terms_cte(table)},
{_conj_hits_cte(query_terms).lstrip()},
nfg AS (SELECT count(*)::DOUBLE AS n_fg FROM hits),
nd AS (SELECT count(*)::DOUBLE AS n_docs FROM {table}),
fg AS (
  SELECT t.term, count(DISTINCT t.doc_id)::BIGINT AS fg_df
  FROM terms t JOIN hits USING (doc_id)
  WHERE t.term NOT IN {_terms_in(query_terms)}
  GROUP BY t.term
  HAVING count(DISTINCT t.doc_id) >= {int(min_fg)}
),
bg AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS bg_df
  FROM terms GROUP BY term
)
SELECT fg.term, fg.fg_df, bg.bg_df,
       round((fg.fg_df / nfg.n_fg - bg.bg_df / nd.n_docs)
             * ((fg.fg_df / nfg.n_fg) / (bg.bg_df / nd.n_docs)), 4)
         AS jlh
FROM fg JOIN bg USING (term) CROSS JOIN nfg CROSS JOIN nd
WHERE (fg.fg_df / nfg.n_fg) > (bg.bg_df / nd.n_docs)
ORDER BY jlh DESC, fg.term ASC
LIMIT {int(k)}
"""


def bpe_pairs_sql(k: int = 50, table: str = "documents") -> str:
    """Mirrors operators/bpe.py::bpe_pairs: occurrence-weighted adjacent
    character-pair counts over the SURFACE tokens (lemmatize=False —
    tokenizer training sees raw forms), pair = 'a|b', top-k by
    (n desc, pair asc). DuckDB substring is character-based, matching
    Spark's split(word, '') symbols (Cyrillic included)."""
    return f"""
WITH {terms_cte(table, lemmatize=False)},
wf AS (
  SELECT term AS word, count(*)::BIGINT AS c
  FROM terms WHERE length(term) >= 2 GROUP BY term
),
pr AS (
  SELECT substring(word, i, 1) || '|' || substring(word, i + 1, 1) AS pair,
         c
  FROM wf, unnest(range(1, length(word)::BIGINT)) AS t(i)
)
SELECT pair, sum(c)::BIGINT AS n
FROM pr GROUP BY pair
ORDER BY n DESC, pair ASC
LIMIT {int(k)}
"""


def search_wildcard_sql(pattern: str, k1: float = 1.2, b: float = 0.75,
                        limit: int = 20, max_expansions: int = 128,
                        table: str = "documents") -> str:
    """Mirrors operators/search.py::search_wildcard: expand the wildcard
    against the dictionary (term asc, capped), then disjunctive BM25 over
    the expansion set. `*`→`%`, `?`→`_` (terms are letters/hyphens only,
    so no LIKE escaping is ever needed)."""
    like = pattern.strip().lower().replace("*", "%").replace("?", "_")
    return f"""
WITH {terms_cte(table)},
wterms AS (
  SELECT term FROM (
    SELECT term FROM terms GROUP BY term
  ) WHERE term LIKE '{like}'
  ORDER BY term ASC LIMIT {int(max_expansions)}
),
post AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms
  WHERE term IN (SELECT term FROM wterms) GROUP BY doc_id, term
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM terms GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM {table})::DOUBLE AS n_docs,
         (SELECT sum(coalesce(dl.dl,0)) FROM {table} d LEFT JOIN dl USING (doc_id))
           / (SELECT count(*) FROM {table}) AS avgdl
),
df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM terms
  WHERE term IN (SELECT term FROM wterms) GROUP BY term
),
scored AS (
  SELECT p.doc_id,
         sum( ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * p.tf * ({k1} + 1)
              / (p.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
  FROM post p
  JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN stats s
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored
ORDER BY round(score, 4) DESC, doc_id ASC
LIMIT {int(limit)}
"""


def search_regexp_sql(pattern: str, k1: float = 1.2, b: float = 0.75,
                      limit: int = 20, max_expansions: int = 128,
                      table: str = "documents") -> str:
    """Mirrors operators/search.py::search_regexp: full-term regexp
    dictionary expansion (term asc, capped), then disjunctive BM25 over
    the expansion set — identical chain to search_wildcard_sql with the
    LIKE predicate swapped for regexp_full_match (the pattern subset is
    pinned to the java.util.regex ∩ RE2 common grammar)."""
    pat = pattern.strip().lower()
    return f"""
WITH {terms_cte(table)},
wterms AS (
  SELECT term FROM (
    SELECT term FROM terms GROUP BY term
  ) WHERE regexp_full_match(term, '(?:{pat})')
  ORDER BY term ASC LIMIT {int(max_expansions)}
),
post AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms
  WHERE term IN (SELECT term FROM wterms) GROUP BY doc_id, term
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM terms GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM {table})::DOUBLE AS n_docs,
         (SELECT sum(coalesce(dl.dl,0)) FROM {table} d LEFT JOIN dl USING (doc_id))
           / (SELECT count(*) FROM {table}) AS avgdl
),
df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM terms
  WHERE term IN (SELECT term FROM wterms) GROUP BY term
),
scored AS (
  SELECT p.doc_id,
         sum( ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * p.tf * ({k1} + 1)
              / (p.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
  FROM post p
  JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN stats s
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored
ORDER BY round(score, 4) DESC, doc_id ASC
LIMIT {int(limit)}
"""


def explain_score_sql(query_terms: list[str], k1: float = 1.2,
                      b: float = 0.75,
                      table: str = "documents") -> str:
    """Mirrors operators/search.py::explain_score for the TOP-1 BM25 hit
    of the query (the doc the engine-side callable selects the same way):
    per-term (tf, df, idf, part_score) breakdown, term asc."""
    n = len(set(query_terms))
    return f"""
WITH {terms_cte(table)},
post AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms
  WHERE term IN {_terms_in(query_terms)} GROUP BY doc_id, term
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM terms GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM {table})::DOUBLE AS n_docs,
         (SELECT sum(coalesce(dl.dl,0)) FROM {table} d LEFT JOIN dl USING (doc_id))
           / (SELECT count(*) FROM {table}) AS avgdl
),
df AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM terms
  WHERE term IN {_terms_in(query_terms)} GROUP BY term
),
scored AS (
  SELECT p.doc_id,
         round(sum( ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * p.tf * ({k1} + 1)
              / (p.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ), 4) AS score,
         count(DISTINCT p.term) AS nt
  FROM post p
  JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN stats s
  GROUP BY p.doc_id
),
top1 AS (
  SELECT doc_id FROM scored WHERE nt = {n}
  ORDER BY score DESC, doc_id ASC LIMIT 1
)
SELECT p.term, p.tf, df.df,
       round(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)), 4) AS idf,
       round(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
             * p.tf * ({k1} + 1)
             / (p.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)), 4)
         AS part_score
FROM post p
JOIN top1 USING (doc_id)
JOIN df USING (term) JOIN dl ON dl.doc_id = p.doc_id
CROSS JOIN stats s
ORDER BY p.term ASC
"""


def datehist_pipeline_sql(query_terms: list[str], bucket_secs: int = 3600,
                          window: int = 3,
                          table: str = "documents") -> str:
    """Mirrors operators/search.py::datehist_pipeline — derivative +
    trailing moving average over the non-empty date-histogram buckets.
    First bucket's delta diffs against 0; head windows shrink."""
    b = int(bucket_secs)
    w = int(window)
    return f"""
WITH {terms_cte(table)},
{_conj_hits_cte(query_terms).lstrip()},
base AS (
  SELECT ((1704067200 + 60 * doc_id)
          - (1704067200 + 60 * doc_id) % {b})::BIGINT AS bucket_epoch,
         count(*)::BIGINT AS n_hits
  FROM hits GROUP BY 1
)
SELECT bucket_epoch, n_hits,
       (n_hits - coalesce(lag(n_hits) OVER (ORDER BY bucket_epoch), 0))::BIGINT
         AS delta,
       round(avg(n_hits) OVER (ORDER BY bucket_epoch
                               ROWS BETWEEN {w - 1} PRECEDING
                               AND CURRENT ROW), 4) AS mov_avg
FROM base
"""


def datehist_pipeline2_sql(query_terms: list[str], bucket_secs: int = 3600,
                           lag: int = 2, min_hits: int = 2,
                           table: str = "documents") -> str:
    """Mirrors operators/search.py::datehist_pipeline2 — cumulative_sum,
    serial_diff (0-padded head), bucket_script share-of-total, and the
    bucket_selector filter applied AFTER the metrics."""
    b = int(bucket_secs)
    return f"""
WITH {terms_cte(table)},
{_conj_hits_cte(query_terms).lstrip()},
base AS (
  SELECT ((1704067200 + 60 * doc_id)
          - (1704067200 + 60 * doc_id) % {b})::BIGINT AS bucket_epoch,
         count(*)::BIGINT AS n_hits
  FROM hits GROUP BY 1
),
piped AS (
  SELECT bucket_epoch, n_hits,
         sum(n_hits) OVER (ORDER BY bucket_epoch)::BIGINT AS cum_hits,
         (n_hits - coalesce(lag(n_hits, {int(lag)})
                            OVER (ORDER BY bucket_epoch), 0))::BIGINT
           AS sdiff,
         round(n_hits::DOUBLE
               / (sum(n_hits) OVER ())::DOUBLE, 4) AS share
  FROM base
)
SELECT * FROM piped WHERE n_hits >= {int(min_hits)}
"""


def terms_set_sql(query_terms: list[str], table: str = "documents") -> str:
    """Mirrors operators/search.py::terms_set_query — per-doc dynamic
    minimum-should-match (REQUIRED_MATCHES_SQL, clamped to the candidate
    set size)."""
    uniq = sorted(set(query_terms))
    return f"""
WITH {terms_cte(table)},
m AS (
  SELECT doc_id, count(DISTINCT term)::BIGINT AS n_matched
  FROM terms WHERE term IN {_terms_in(uniq)}
  GROUP BY doc_id
)
SELECT doc_id, n_matched,
       least({len(uniq)}, {REQUIRED_MATCHES_SQL})::INT AS required
FROM m
WHERE n_matched >= least({len(uniq)}, {REQUIRED_MATCHES_SQL})
"""


def term_suggester_sql(token: str, max_edits: int = 2, k: int = 10,
                       table: str = "documents") -> str:
    """Mirrors operators/search.py::term_suggester — dictionary terms
    within Levenshtein max_edits of the token (exact match excluded),
    (distance asc, df desc, term asc) top-k."""
    t = token.strip().lower().replace("'", "''")
    return f"""
WITH {terms_cte(table)},
dict AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df
  FROM terms GROUP BY term
)
SELECT term AS suggestion,
       levenshtein(term, '{t}')::INT AS distance,
       df
FROM dict
WHERE levenshtein(term, '{t}') <= {int(max_edits)} AND term <> '{t}'
ORDER BY distance ASC, df DESC, suggestion ASC
LIMIT {int(k)}
"""


def auto_date_histogram_sql(query_terms: list[str],
                            target_buckets: int = 20,
                            table: str = "documents") -> str:
    """Mirrors operators/search.py::auto_date_histogram — smallest frozen
    ladder rung with floor(span/rung)+1 <= target_buckets (top rung as
    fallback), then modulo bucketing of the conjunctive hit epochs."""
    from ..operators.search import AUTO_DH_LADDER

    ladder = AUTO_DH_LADDER
    case = "CASE "
    for secs in ladder[:-1]:
        case += (f"WHEN (span // {secs}) + 1 <= {int(target_buckets)} "
                 f"THEN {secs} ")
    case += f"ELSE {ladder[-1]} END"
    return f"""
WITH {terms_cte(table)},
{_conj_hits_cte(query_terms).lstrip()},
ep AS (SELECT (1704067200 + 60 * doc_id)::BIGINT AS epoch FROM hits),
sp AS (SELECT max(epoch) - min(epoch) AS span FROM ep),
iv AS (SELECT ({case})::BIGINT AS interval_secs FROM sp
       WHERE span IS NOT NULL)
SELECT iv.interval_secs,
       (ep.epoch - ep.epoch % iv.interval_secs)::BIGINT AS bucket_epoch,
       count(*)::BIGINT AS n_hits
FROM ep CROSS JOIN iv
GROUP BY 1, 2
"""


def top_metrics_sql(table: str = "documents") -> str:
    """Mirrors operators/search.py::top_metrics — per-site argmax by
    (epoch, doc_id) with the doc's length as the carried metric."""
    return f"""
WITH ranked AS (
  SELECT {SITE_KEY_SQL} AS site_key,
         (1704067200 + 60 * doc_id)::BIGINT AS epoch,
         doc_id, len(text)::BIGINT AS n_chars,
         row_number() OVER (PARTITION BY {SITE_KEY_SQL}
                            ORDER BY (1704067200 + 60 * doc_id) DESC,
                                     doc_id DESC) AS rn
  FROM {table}
)
SELECT site_key, epoch AS latest_epoch, doc_id AS latest_doc_id,
       n_chars AS latest_n_chars
FROM ranked WHERE rn = 1
"""


def rank_eval_sql(query_terms: list[str], k: int = 10,
                  rel_threshold: int = 2, k1: float = 1.2, b: float = 0.75,
                  table: str = "documents") -> str:
    """Mirrors operators/evaluation.py::rank_eval — NDCG@k / MRR / P@k of
    the disjunctive BM25 top-k against tf-derived graded qrels
    (grade = min(3, Σ tf of query terms))."""
    t = int(rel_threshold)
    return f"""
WITH {terms_cte(table)},
{bm25_scored_ctes(query_terms, k1, b, table)},
ranking AS (
  SELECT doc_id, row_number() OVER (ORDER BY round(score, 4) DESC,
                                    doc_id ASC) AS rank
  FROM scored QUALIFY rank <= {int(k)}
),
qrels AS (
  SELECT doc_id, least(3, sum(tf))::INT AS grade FROM post GROUP BY doc_id
),
ideal AS (
  SELECT grade, row_number() OVER (ORDER BY grade DESC, doc_id ASC) AS rank
  FROM qrels QUALIFY rank <= {int(k)}
),
icalc AS (
  SELECT coalesce(sum((pow(2, grade) - 1) / log2(rank + 1)), 0) AS idcg
  FROM ideal
),
j AS (
  SELECT r.rank, coalesce(q.grade, 0) AS grade
  FROM ranking r LEFT JOIN qrels q USING (doc_id)
),
m AS (
  SELECT coalesce(sum((pow(2, grade) - 1) / log2(rank + 1)), 0) AS dcg,
         coalesce(min(CASE WHEN grade >= {t} THEN rank END), 0) AS first_rel,
         coalesce(sum(CASE WHEN grade >= {t} THEN 1 ELSE 0 END), 0) AS n_rel
  FROM j
)
SELECT round(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0 END, 4) AS ndcg_at_k,
       round(CASE WHEN first_rel > 0 THEN 1.0 / first_rel ELSE 0 END, 4)
         AS mrr,
       round(n_rel / {float(k)}, 4) AS precision_at_k
FROM m CROSS JOIN icalc
"""


def search_bm25_relaxed_sql(query_terms: list[str], k1: float = 1.2,
                            b: float = 0.75, limit: int = 20,
                            table: str = "documents") -> str:
    """Mirrors operators/search.py::search_bm25_relaxed — strict AND
    first; on zero conjunctive hits, disjunctive OR top-k. Returns
    (matched_mode, doc_id, score); the scalar-subquery gate is the SQL
    twin of the broadcast 1-row cross join."""
    n = len(set(query_terms))
    return f"""
WITH {terms_cte(table)},
{bm25_scored_ctes(query_terms, k1, b, table)},
and_hits AS (SELECT * FROM scored WHERE nt = {n}),
n_and AS (SELECT count(*) AS c FROM and_hits),
and_topk AS (
  SELECT 'and' AS matched_mode, doc_id, round(score, 4) AS score
  FROM and_hits ORDER BY round(score, 4) DESC, doc_id ASC LIMIT {limit}
),
or_topk AS (
  SELECT 'or' AS matched_mode, doc_id, round(score, 4) AS score
  FROM scored ORDER BY round(score, 4) DESC, doc_id ASC LIMIT {limit}
)
SELECT matched_mode, doc_id, score FROM and_topk
WHERE (SELECT c FROM n_and) > 0
UNION ALL
SELECT matched_mode, doc_id, score FROM or_topk
WHERE (SELECT c FROM n_and) = 0
"""


def search_bm25_per_lang_sql(query_terms: list[str], k1: float = 1.2,
                             b: float = 0.75, k_per_lang: int = 10,
                             table: str = "documents") -> str:
    """Mirrors operators/search.py::search_bm25_per_lang — every BM25
    statistic (N, avgdl, df) scoped to the document's `lang`; conjunctive;
    top-k per language. Returns (lang, doc_id, score, lang_rank)."""
    n = len(set(query_terms))
    return f"""
WITH {terms_cte(table)},
post AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms
  WHERE term IN {_terms_in(query_terms)} GROUP BY doc_id, term
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM terms GROUP BY doc_id),
lang_stats AS (
  SELECT d.lang, count(*)::DOUBLE AS n_docs_l,
         avg(coalesce(dl.dl, 0)) AS avgdl_l
  FROM {table} d LEFT JOIN dl USING (doc_id) GROUP BY d.lang
),
df_l AS (
  SELECT d.lang, p.term, count(DISTINCT p.doc_id)::DOUBLE AS df_l
  FROM post p JOIN {table} d USING (doc_id) GROUP BY d.lang, p.term
),
scored AS (
  SELECT d.lang, p.doc_id,
         sum( ln(1 + (ls.n_docs_l - f.df_l + 0.5) / (f.df_l + 0.5))
              * p.tf * ({k1} + 1)
              / (p.tf + {k1} * (1 - {b} + {b} * dl.dl / ls.avgdl_l)) ) AS score,
         count(DISTINCT p.term) AS nt
  FROM post p
  JOIN {table} d USING (doc_id)
  JOIN dl USING (doc_id)
  JOIN lang_stats ls ON ls.lang = d.lang
  JOIN df_l f ON f.lang = d.lang AND f.term = p.term
  GROUP BY d.lang, p.doc_id
),
ranked AS (
  SELECT lang, doc_id, round(score, 4) AS score,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY round(score, 4) DESC, doc_id ASC
         ) AS lang_rank
  FROM scored WHERE nt = {n}
)
SELECT lang, doc_id, score, lang_rank::BIGINT AS lang_rank
FROM ranked WHERE lang_rank <= {k_per_lang}
"""


def phrase_suggest_sql(phrase: list[str], k: int = 5, backoff: float = 0.4,
                       table: str = "documents") -> str:
    """Mirrors operators/search.py::phrase_suggest — per-position
    Levenshtein ≤ 1 candidates over the retained-token unigram table,
    phrases scored by the stupid-backoff bigram LM. Returns
    (suggestion, score)."""
    words = [w.strip().lower() for w in phrase if w.strip()]
    n = len(words)
    cand_ctes = ",\n".join(
        f"""c{i} AS (
  SELECT term AS c{i}, cf AS cf{i} FROM uni
  WHERE levenshtein(term, '{w}') <= 1
)""" for i, w in enumerate(words)
    )
    cross = " CROSS JOIN ".join(f"c{i}" for i in range(n))
    bi_joins = "\n".join(
        f"LEFT JOIN bi AS bi{i} ON bi{i}.w1 = c{i-1} AND bi{i}.w2 = c{i}"
        for i in range(1, n)
    )
    score = "ln(cf0 / (SELECT t FROM total))"
    for i in range(1, n):
        score += f"""
      + CASE WHEN bi{i}.n12 IS NOT NULL THEN ln(bi{i}.n12 / cf{i-1})
             ELSE ln({backoff} * cf{i} / (SELECT t FROM total)) END"""
    sep = "' '"
    suggestion = " || ".join(
        f"c{i}" if i == 0 else f"{sep} || c{i}" for i in range(n)
    )
    return f"""
WITH {positional_terms_cte(table)},
uni AS (SELECT term, count(*)::DOUBLE AS cf FROM pos_terms GROUP BY term),
total AS (SELECT count(*)::DOUBLE AS t FROM pos_terms),
bi AS (
  SELECT a.term AS w1, b.term AS w2, count(*)::DOUBLE AS n12
  FROM pos_terms a
  JOIN pos_terms b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY a.term, b.term
),
{cand_ctes},
scored AS (
  SELECT {suggestion} AS suggestion,
         {score} AS score
  FROM {cross}
  {bi_joins}
)
SELECT suggestion, round(score, 4) AS score
FROM scored
ORDER BY round(score, 4) DESC, suggestion ASC
LIMIT {k}
"""


def search_diversified_sql(query_terms: list[str], lam: float = 0.7,
                           n_cand: int = 20, k: int = 5,
                           k1: float = 1.2, b: float = 0.75,
                           table: str = "documents") -> str:
    """Mirrors operators/search.py::search_diversified — the k greedy MMR
    steps unrolled as chained CTEs (s1..sk / sel1..selk); every argmax
    input rounds to 4 dp exactly where the Spark plan rounds. Returns
    (doc_id, rel, mmr, pick_order)."""
    n = len(set(query_terms))
    om = 1.0 - lam
    steps = []
    for i in range(2, k + 1):
        steps.append(f""",
s{i} AS MATERIALIZED (
  SELECT c.doc_id, c.rel, c.embedding,
         round({lam} * c.rel - {om} * (
           SELECT max(round(list_cosine_similarity(
             c.embedding::DOUBLE[], s.embedding::DOUBLE[]), 4))
           FROM sel{i-1} s
         ), 4) AS mmr,
         {i}::BIGINT AS pick_order
  FROM cand c
  WHERE c.doc_id NOT IN (SELECT doc_id FROM sel{i-1})
  ORDER BY mmr DESC, c.doc_id ASC LIMIT 1
),
sel{i} AS MATERIALIZED (SELECT * FROM sel{i-1} UNION ALL SELECT * FROM s{i})""")
    return f"""
WITH {terms_cte(table)},
{bm25_scored_ctes(query_terms, k1, b, table)},
topn AS (
  SELECT doc_id, score FROM scored WHERE nt = {n}
  ORDER BY round(score, 4) DESC, doc_id ASC LIMIT {n_cand}
),
withemb AS MATERIALIZED (
  SELECT t.doc_id, round(t.score, 4) AS score4, e.embedding
  FROM topn t JOIN embeddings e ON e.vec_id = t.doc_id
),
cand AS MATERIALIZED (
  SELECT doc_id,
         round(score4 / (SELECT max(score4) FROM withemb), 4) AS rel,
         embedding
  FROM withemb
),
s1 AS MATERIALIZED (
  SELECT doc_id, rel, embedding, round({lam} * rel, 4) AS mmr,
         1::BIGINT AS pick_order
  FROM cand ORDER BY round({lam} * rel, 4) DESC, doc_id ASC LIMIT 1
),
sel1 AS MATERIALIZED (SELECT * FROM s1){''.join(steps)}
SELECT doc_id, rel, mmr, pick_order FROM sel{k}
ORDER BY pick_order
"""


def composite_buckets_sql(size: int = 10,
                          after: tuple[str, str] | None = None,
                          table: str = "documents") -> str:
    """Mirrors operators/search.py::composite_buckets — after_key keyset
    over the (site_key, term) bucket space of the site-scoped
    dictionary."""
    cursor = ""
    if after is not None:
        s, t = after
        cursor = (f"WHERE site_key > '{s}'"
                  f" OR (site_key = '{s}' AND term > '{t}')")
    return f"""
WITH {terms_cte(table, extra_cols=f"{SITE_KEY_SQL.replace('doc_id', 'd.doc_id')} AS site_key")},
buckets AS (
  SELECT site_key, term,
         count(DISTINCT doc_id)::BIGINT AS df,
         count(*)::BIGINT AS cf
  FROM terms GROUP BY site_key, term
)
SELECT site_key, term, df, cf FROM buckets
{cursor}
ORDER BY site_key ASC, term ASC
LIMIT {size}
"""


def search_rm3_sql(query_terms: list[str], fb_docs: int = 5,
                   fb_terms: int = 3, k1: float = 1.2, b: float = 0.75,
                   limit: int = 20, table: str = "documents") -> str:
    """Mirrors operators/search.py::search_rm3 — conjunctive top-fb_docs
    as pseudo-relevance set, 4-dp relevance-model weights, top-fb_terms
    expansion (w desc, term asc), weighted disjunctive re-score.
    Returns (doc_id, score)."""
    n = len(set(query_terms))
    q0_vals = ", ".join(f"('{t}')" for t in sorted(set(query_terms)))
    return f"""
WITH {terms_cte(table)},
{bm25_scored_ctes(query_terms, k1, b, table)},
fb AS (
  SELECT doc_id, round(score, 4) AS fscore FROM scored WHERE nt = {n}
  ORDER BY round(score, 4) DESC, doc_id ASC LIMIT {fb_docs}
),
stot AS (SELECT sum(fscore) AS s FROM fb),
post_fb AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms
  WHERE doc_id IN (SELECT doc_id FROM fb) GROUP BY doc_id, term
),
fbw AS (
  SELECT p.term,
         round(sum((p.tf / dl.dl) * (fb.fscore / stot.s)), 4) AS w
  FROM post_fb p
  JOIN dl USING (doc_id) JOIN fb USING (doc_id) CROSS JOIN stot
  WHERE p.term NOT IN {_terms_in(query_terms)} AND stot.s > 0
  GROUP BY p.term
),
expn AS (SELECT term, w FROM fbw ORDER BY w DESC, term ASC LIMIT {fb_terms}),
allt AS (
  SELECT term, 1.0 AS w FROM (VALUES {q0_vals}) q(term)
  UNION ALL SELECT term, w FROM expn
),
post2 AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms
  WHERE term IN (SELECT term FROM allt) GROUP BY doc_id, term
),
df2 AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM post2 GROUP BY term
),
scored2 AS (
  SELECT p.doc_id,
         sum( a.w * ln(1 + (s.n_docs - df2.df + 0.5) / (df2.df + 0.5))
              * p.tf * ({k1} + 1)
              / (p.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
  FROM post2 p
  JOIN allt a USING (term) JOIN df2 USING (term)
  JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 4) AS score FROM scored2
ORDER BY round(score, 4) DESC, doc_id ASC
LIMIT {limit}
"""


def ltr_features_sql(query_terms: list[str], k1: float = 1.2,
                     b: float = 0.75, limit: int = 50,
                     table: str = "documents") -> str:
    """Mirrors operators/search.py::ltr_features — one feature row per
    disjunctive candidate, every feature from the same single
    aggregation. Returns (doc_id, bm25, n_matched, dl, sum_tf, max_tf,
    idf_sum)."""
    return f"""
WITH {terms_cte(table)},
{bm25_scored_ctes(query_terms, k1, b, table)},
feat AS (
  SELECT p.doc_id,
         round(sum( ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                    * p.tf * ({k1} + 1)
                    / (p.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ),
               4) AS bm25,
         count(DISTINCT p.term)::BIGINT AS n_matched,
         max(dl.dl)::BIGINT AS dl,
         sum(p.tf)::BIGINT AS sum_tf,
         max(p.tf)::BIGINT AS max_tf,
         round(sum( ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) ),
               4) AS idf_sum
  FROM post p
  JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN stats s
  GROUP BY p.doc_id
)
SELECT doc_id, bm25, n_matched, dl, sum_tf, max_tf, idf_sum
FROM feat
ORDER BY bm25 DESC, doc_id ASC
LIMIT {limit}
"""


def search_vsm_sql(query_terms: list[str], limit: int = 20,
                   table: str = "documents") -> str:
    """SMART lnc.ltc vector-space cosine — mirrors
    operators/search.py::search_vsm: log-tf no-idf cosine-normalized doc
    vectors, idf on the query side only, OR semantics."""
    uniq = sorted(set(query_terms))
    return f"""
WITH {terms_cte(table)},
post AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms
  GROUP BY doc_id, term
),
norms AS (
  SELECT doc_id, sqrt(sum((1 + ln(tf)) * (1 + ln(tf)))) AS norm
  FROM post GROUP BY doc_id
),
stats AS (SELECT (SELECT count(*) FROM {table})::DOUBLE AS n_docs),
df AS (
  SELECT term, count(*)::DOUBLE AS df FROM post
  WHERE term IN {_terms_in(uniq)} GROUP BY term
),
scored AS (
  SELECT p.doc_id,
         sum( ln(s.n_docs / df.df) * (1 + ln(p.tf)) / n.norm ) AS score
  FROM post p
  JOIN df USING (term) JOIN norms n USING (doc_id) CROSS JOIN stats s
  WHERE p.term IN {_terms_in(uniq)}
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored
ORDER BY round(score, 4) DESC, doc_id ASC
LIMIT {limit}
"""


def _impact_expr(k1: float, b: float, scale: float, levels: int) -> str:
    """The quantized-impact expression over (post p, dl, df d, stats s)."""
    return (
        f"least({levels - 1}, floor(round("
        f"ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))"
        f" * p.tf * ({k1} + 1)"
        f" / (p.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl))"
        f", 6) * {scale}))"
    )


def _impact_ctes(k1: float, b: float, table: str) -> str:
    from ..operators import impact as imp

    expr = _impact_expr(k1, b, imp.QUANT_SCALE, imp.QUANT_LEVELS)
    return f"""post AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms
  GROUP BY doc_id, term
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM terms GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM {table})::DOUBLE AS n_docs,
         (SELECT sum(coalesce(dl.dl,0)) FROM {table} t LEFT JOIN dl USING (doc_id))
           / (SELECT count(*) FROM {table}) AS avgdl
),
df AS (SELECT term, count(*)::DOUBLE AS df FROM post GROUP BY term),
impacts AS (
  SELECT p.term, p.doc_id, {expr}::INT AS impact
  FROM post p
  JOIN dl USING (doc_id) JOIN df d USING (term) CROSS JOIN stats s
)"""


def impact_postings_sql(k1: float = 1.2, b: float = 0.75,
                        table: str = "documents") -> str:
    """Anh-Moffat quantized impact postings — mirrors
    operators/impact.py::quantized_impacts (8-bit saturating fixed point,
    frozen 1/16 step over the 6dp-rounded BM25 partial score)."""
    return f"""
WITH {terms_cte(table)},
{_impact_ctes(k1, b, table)}
SELECT term, doc_id, impact FROM impacts
"""


def search_impact_sql(query_terms: list[str], k: int = 20,
                      k1: float = 1.2, b: float = 0.75,
                      table: str = "documents") -> str:
    """Disjunctive top-k by summed integer impact — mirrors
    operators/impact.py::search_impact."""
    uniq = sorted(set(query_terms))
    return f"""
WITH {terms_cte(table)},
{_impact_ctes(k1, b, table)}
SELECT doc_id, sum(impact)::BIGINT AS score_q
FROM impacts WHERE term IN {_terms_in(uniq)}
GROUP BY doc_id
ORDER BY score_q DESC, doc_id ASC
LIMIT {k}
"""


def search_impact_and_sql(query_terms: list[str], k: int = 20,
                          k1: float = 1.2, b: float = 0.75,
                          table: str = "documents") -> str:
    """EXACT conjunctive top-k by summed integer impact — mirrors
    operators/impact.py::search_impact_and, and doubles as the pin for
    search_two_tier: the two-tier champion+rescope serve must produce
    exactly this ranking (its certainty algebra makes the equality
    provable, and this shared mirror makes it driver-verified)."""
    uniq = sorted(set(query_terms))
    return f"""
WITH {terms_cte(table)},
{_impact_ctes(k1, b, table)}
SELECT doc_id, sum(impact)::BIGINT AS score_q
FROM impacts WHERE term IN {_terms_in(uniq)}
GROUP BY doc_id
HAVING count(*) = {len(uniq)}
ORDER BY score_q DESC, doc_id ASC
LIMIT {int(k)}
"""


def _champion_kept_ctes(terms_in: str, budget: int, n_buckets: int) -> str:
    """The shared champion-pruning CTE chain (ranked → bound → sized →
    kept) — mirrors operators/impact.py::champion_lists' LEVEL-ALIGNED
    cut (r04-verdict #2): per (doc_bucket, term) run, v = the budget-th
    impact of an overflowing run; when the boundary level's full extent
    (n_ge rows with impact ≥ v) fits within LEVEL_CAP_FACTOR·budget the
    whole level is kept and cutoff = max(1, v−1) (0 if that exhausts the
    run); a fatter level keeps the top-budget prefix with cutoff
    max(1, v); a run that fits the budget is complete (cutoff 0)."""
    from ..operators import impact as imp

    cap = int(imp.LEVEL_CAP_FACTOR * budget)
    return f"""ranked AS (
  SELECT (doc_id % {int(n_buckets)}) AS doc_bucket, term, doc_id, impact,
         row_number() OVER (PARTITION BY doc_id % {int(n_buckets)}, term
                            ORDER BY impact DESC, doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY doc_id % {int(n_buckets)}, term) AS n_run
  FROM impacts
  WHERE term IN {terms_in}
),
bound AS (
  SELECT doc_bucket, term, max(impact) AS v
  FROM ranked WHERE rn = {int(budget)} AND n_run > {int(budget)}
  GROUP BY doc_bucket, term
),
sized AS (
  SELECT r.*, b3.v,
         sum(CASE WHEN b3.v IS NOT NULL AND r.impact >= b3.v
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY r.doc_bucket, r.term) AS n_ge
  FROM ranked r LEFT JOIN bound b3 USING (doc_bucket, term)
),
kept AS (
  SELECT doc_bucket, term, doc_id, impact,
         (CASE
            WHEN v IS NULL THEN 0
            WHEN n_ge <= {cap} AND n_ge = n_run THEN 0
            WHEN n_ge <= {cap} THEN greatest(1, v - 1)
            ELSE greatest(1, v)
          END)::INT AS cutoff
  FROM sized
  WHERE v IS NULL
     OR (n_ge <= {cap} AND impact >= v)
     OR (n_ge > {cap} AND rn <= {int(budget)})
)"""


def search_champions_sql(query_terms: list[str], k: int = 20,
                         budget: int = 8, n_buckets: int = 16,
                         k1: float = 1.2, b: float = 0.75,
                         table: str = "documents") -> str:
    """Bounded-error top-k over persisted champion lists — mirrors
    operators/impact.py::champion_lists + search_champions (Anh-Moffat
    pruned index): per (doc_bucket, term) keep the level-aligned
    champion prefix (_champion_kept_ctes), carry the tail cutoff, and
    report error_ub = Σ_q cutoffs − Σ_seen cutoffs per doc. Filtering
    to the query terms before the window is equivalent to probing the
    persisted table (runs are per-term independent)."""
    uniq = sorted(set(query_terms))
    return f"""
WITH {terms_cte(table)},
{_impact_ctes(k1, b, table)},
{_champion_kept_ctes(_terms_in(uniq), budget, n_buckets)},
btot AS (
  SELECT doc_bucket, sum(cutoff) AS tot
  FROM (SELECT DISTINCT doc_bucket, term, cutoff FROM kept)
  GROUP BY doc_bucket
),
scored AS (
  SELECT doc_id, doc_bucket, sum(impact)::BIGINT AS score_q,
         sum(cutoff) AS seen
  FROM kept GROUP BY doc_id, doc_bucket
)
SELECT s.doc_id, s.score_q,
       (coalesce(b2.tot, 0) - s.seen)::BIGINT AS error_ub
FROM scored s LEFT JOIN btot b2 USING (doc_bucket)
ORDER BY score_q DESC, doc_id ASC
LIMIT {int(k)}
"""


def search_champions_batch_sql(queries: dict[str, list[str]], k: int = 20,
                               budget: int = 8, n_buckets: int = 16,
                               k1: float = 1.2, b: float = 0.75,
                               table: str = "documents") -> str:
    """Batched champion serving — mirrors
    operators/impact.py::search_champions_batch: one champion table over
    the workload's UNION term set (runs are per-term independent), a
    (query_id, term) workload join, per-(query, bucket) cutoff census,
    per-query top-k via QUALIFY row_number."""
    qt_rows = sorted(
        (qid, t) for qid in queries for t in set(queries[qid])
    )
    union_terms = sorted({t for _, t in qt_rows})
    qt_values = ", ".join(f"('{q}', '{t}')" for q, t in qt_rows)
    return f"""
WITH {terms_cte(table)},
{_impact_ctes(k1, b, table)},
qt(query_id, qterm) AS (VALUES {qt_values}),
{_champion_kept_ctes(_terms_in(union_terms), budget, n_buckets)},
cand AS (
  SELECT q.query_id, kp.doc_bucket, kp.term, kp.doc_id, kp.impact,
         kp.cutoff
  FROM kept kp JOIN qt q ON q.qterm = kp.term
),
btot AS (
  SELECT query_id, doc_bucket, sum(cutoff) AS tot
  FROM (SELECT DISTINCT query_id, doc_bucket, term, cutoff FROM cand)
  GROUP BY query_id, doc_bucket
),
scored AS (
  SELECT query_id, doc_id, doc_bucket, sum(impact)::BIGINT AS score_q,
         sum(cutoff) AS seen
  FROM cand GROUP BY query_id, doc_id, doc_bucket
)
SELECT s.query_id, s.doc_id, s.score_q,
       (coalesce(b2.tot, 0) - s.seen)::BIGINT AS error_ub
FROM scored s LEFT JOIN btot b2 USING (query_id, doc_bucket)
QUALIFY row_number() OVER (PARTITION BY s.query_id
                           ORDER BY s.score_q DESC, s.doc_id ASC)
        <= {int(k)}
"""


def search_champions_and_sql(query_terms: list[str], k: int = 20,
                             budget: int = 8, n_buckets: int = 16,
                             k1: float = 1.2, b: float = 0.75,
                             table: str = "documents") -> str:
    """Conjunctive champion serving — mirrors
    operators/impact.py::search_champions_and: eliminate on certain
    absence (complete run not containing the doc, or a query term with
    no run in the bucket), flag certainty, bound the maybe band."""
    uniq = sorted(set(query_terms))
    n_q = len(uniq)
    return f"""
WITH {terms_cte(table)},
{_impact_ctes(k1, b, table)},
{_champion_kept_ctes(_terms_in(uniq), budget, n_buckets)},
census AS (
  SELECT doc_bucket, count(*) AS n_runs,
         sum(CASE WHEN cutoff = 0 THEN 1 ELSE 0 END) AS n_complete,
         sum(cutoff) AS bucket_cut_total
  FROM (SELECT DISTINCT doc_bucket, term, cutoff FROM kept)
  GROUP BY doc_bucket
),
scored AS (
  SELECT doc_id, doc_bucket, sum(impact)::BIGINT AS score_q,
         count(*) AS n_seen,
         sum(CASE WHEN cutoff = 0 THEN 1 ELSE 0 END) AS seen_complete,
         sum(cutoff) AS seen_cut_total
  FROM kept GROUP BY doc_id, doc_bucket
)
SELECT s.doc_id, s.score_q,
       (c.bucket_cut_total - s.seen_cut_total)::BIGINT AS error_ub,
       (s.n_seen = {n_q}) AS certain
FROM scored s JOIN census c USING (doc_bucket)
WHERE c.n_runs = {n_q} AND s.seen_complete = c.n_complete
ORDER BY certain DESC, score_q DESC, doc_id ASC
LIMIT {int(k)}
"""


def search_sdm_sql(query_terms: list[str], mu: float = 2000.0,
                   uw: int = 8, k: int = 20,
                   table: str = "documents") -> str:
    """Sequential dependence model top-k — mirrors
    operators/positional.py::search_sdm (Metzler & Croft 2005): the
    LM-Dirichlet arithmetic of search_lmd generalized to the MRF
    feature relation (unigrams λ=0.85, ordered exact-bigram windows
    λ=0.10, unordered |Δpos|<uw windows λ=0.05), features built from
    the same positional stream the Spark operator uses."""
    uniq = sorted(set(query_terms))
    pairs = list(dict.fromkeys(
        (a, b) for a, b in zip(query_terms, query_terms[1:]) if a != b
    ))
    pair_ctes, pair_unions = [], []
    for i, (a, b) in enumerate(pairs):
        pair_ctes.append(f"""op{i} AS (
  SELECT a.doc_id, 'o:{a} {b}' AS feat, count(*)::DOUBLE AS tf,
         0.10 AS weight
  FROM pos_terms a JOIN pos_terms b
    ON b.doc_id = a.doc_id AND a.term = '{a}' AND b.term = '{b}'
   AND b.pos = a.pos + 1
  GROUP BY a.doc_id
),
up{i} AS (
  SELECT a.doc_id, 'u:{a} {b}' AS feat, count(*)::DOUBLE AS tf,
         0.05 AS weight
  FROM pos_terms a JOIN pos_terms b
    ON b.doc_id = a.doc_id AND a.term = '{a}' AND b.term = '{b}'
   AND abs(b.pos - a.pos) < {int(uw)}
  GROUP BY a.doc_id
)""")
        pair_unions.append(f"SELECT * FROM op{i}")
        pair_unions.append(f"SELECT * FROM up{i}")
    pair_cte_sql = ",\n".join(pair_ctes)
    if pair_cte_sql:
        pair_cte_sql += ","
    union_sql = "".join(
        f"  UNION ALL {u}\n" for u in pair_unions
    )
    return f"""
WITH {positional_terms_cte(table)},
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM pos_terms
       GROUP BY doc_id),
stats AS (SELECT sum(dl) AS total_tokens FROM dl),
uni AS (
  SELECT doc_id, 't:' || term AS feat, count(*)::DOUBLE AS tf,
         0.85 AS weight
  FROM pos_terms WHERE term IN {_terms_in(uniq)}
  GROUP BY doc_id, term
),
{pair_cte_sql}
feats AS (
  SELECT * FROM uni
{union_sql}),
cf AS (SELECT feat, sum(tf) AS cf FROM feats GROUP BY feat),
scored AS (
  SELECT f.doc_id,
         sum(f.weight * ( ln(1 + f.tf / ({float(mu)} * c.cf / s.total_tokens))
                          + ln({float(mu)} / (d.dl + {float(mu)})) )) AS raw
  FROM feats f
  JOIN cf c USING (feat)
  JOIN dl d USING (doc_id)
  CROSS JOIN stats s
  GROUP BY f.doc_id
)
SELECT doc_id, round(raw, 4) AS score FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {int(k)}
"""


def search_prox_boost_sql(query_terms: list[str], k1: float = 1.2,
                          b: float = 0.75, prox_weight: float = 1.0,
                          alpha: float = 1.0, limit: int = 20,
                          table: str = "documents") -> str:
    """Tao-Zhai MinDist proximity-boosted conjunctive BM25 — mirrors
    operators/positional.py::search_prox_boost for ≥2 distinct query
    terms: score = round(bm25_4dp + w·ln(α + e^(−mindist)), 4), where
    mindist = min position gap between adjacent different-term
    occurrences of the query terms in the doc's retained-token stream."""
    uniq = sorted(set(query_terms))
    n = len(uniq)
    return f"""
WITH {positional_terms_cte(table)},
post AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM pos_terms
  WHERE term IN {_terms_in(uniq)} GROUP BY doc_id, term
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM pos_terms GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM {table})::DOUBLE AS n_docs,
         (SELECT sum(coalesce(dl.dl,0)) FROM {table} t LEFT JOIN dl USING (doc_id))
           / (SELECT count(*) FROM {table}) AS avgdl
),
df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM pos_terms
  WHERE term IN {_terms_in(uniq)} GROUP BY term
),
scored AS (
  SELECT p.doc_id,
         sum( ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * p.tf * ({k1} + 1)
              / (p.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score,
         count(DISTINCT p.term) AS nt
  FROM post p
  JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN stats s
  GROUP BY p.doc_id
),
conj AS (
  SELECT doc_id, round(score, 4) AS bm25 FROM scored WHERE nt = {n}
),
adj AS (
  SELECT doc_id, term, pos,
         lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS pterm,
         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS ppos
  FROM pos_terms WHERE term IN {_terms_in(uniq)}
),
md AS (
  SELECT doc_id, min(pos - ppos) AS mindist
  FROM adj WHERE pterm IS NOT NULL AND pterm <> term
  GROUP BY doc_id
)
SELECT c.doc_id, md.mindist::BIGINT AS mindist,
       round(c.bm25 + {prox_weight}
             * ln({alpha} + exp(-md.mindist)), 4) AS score
FROM conj c JOIN md USING (doc_id)
ORDER BY score DESC, c.doc_id ASC
LIMIT {limit}
"""


def search_near_unordered_sql(terms: list[str], slop: int = 0, k: int = 20,
                              table: str = "documents") -> str:
    """Unordered SpanNear — mirrors operators/positional.py::
    unordered_near_match + search_near_unordered: minimal-cover
    reduction with one running max per query term."""
    uniq = sorted(set(terms))
    window = len(uniq) - 1 + slop
    lasts = ",\n         ".join(
        f"max(CASE WHEN term = '{t}' THEN pos END) OVER w AS l{i}"
        for i, t in enumerate(uniq)
    )
    not_null = " AND ".join(f"l{i} IS NOT NULL" for i in range(len(uniq)))
    least = "least(" + ", ".join(f"l{i}" for i in range(len(uniq))) + ")"
    return f"""
WITH {positional_terms_cte(table)},
covered AS (
  SELECT doc_id, pos,
         {lasts}
  FROM pos_terms WHERE term IN {_terms_in(uniq)}
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT doc_id, count(*)::BIGINT AS near_tf
FROM covered
WHERE {not_null} AND pos - {least} <= {window}
GROUP BY doc_id
ORDER BY near_tf DESC, doc_id ASC
LIMIT {k}
"""


def terms_agg_sharded_sql(size: int = 10, shard_size: int = 15,
                          n_shards: int = 8,
                          table: str = "documents") -> str:
    """ES sharded `terms` aggregation with doc_count_error_upper_bound —
    mirrors operators/search.py::terms_agg_sharded (per-shard top
    shard_size cut, coordinator merge, per-term error = Σ eff_min over
    non-reporting shards)."""
    return f"""
WITH {terms_cte(table)},
per AS (
  SELECT (doc_id % {n_shards})::INT AS shard, term,
         count(DISTINCT doc_id)::BIGINT AS sdf
  FROM terms GROUP BY shard, term
),
tops AS (
  SELECT shard, term, sdf FROM (
    SELECT shard, term, sdf,
           row_number() OVER (PARTITION BY shard
                              ORDER BY sdf DESC, term ASC) AS rn
    FROM per
  ) WHERE rn <= {shard_size}
),
hdr AS (SELECT shard, count(*) AS n_terms FROM per GROUP BY shard),
sent AS (SELECT shard, min(sdf) AS min_sent FROM tops GROUP BY shard),
eff AS (
  SELECT hdr.shard,
         CASE WHEN hdr.n_terms <= {shard_size} THEN 0
              ELSE sent.min_sent END AS eff_min
  FROM hdr JOIN sent USING (shard)
),
tot AS (SELECT coalesce(sum(eff_min), 0) AS total_min FROM eff),
merged AS (
  SELECT t.term, sum(t.sdf)::BIGINT AS doc_count,
         sum(e.eff_min) AS reported_min
  FROM tops t JOIN eff e USING (shard)
  GROUP BY t.term
)
SELECT term, doc_count,
       (tot.total_min - reported_min)::BIGINT AS error_ub
FROM merged CROSS JOIN tot
ORDER BY doc_count DESC, term ASC
LIMIT {size}
"""


def index_stats_sql(table: str = "documents", n_buckets: int = 16) -> str:
    """Index introspection rollup — mirrors plans/statistics.py::
    index_stats over the block_meta re-derivation."""
    return f"""
WITH meta AS ({block_meta_sql(table, n_buckets)})
SELECT count(DISTINCT term)::BIGINT AS n_terms,
       count(*)::BIGINT AS n_blocks,
       sum(n_postings)::BIGINT AS n_postings,
       sum(sum_tf)::BIGINT AS total_tokens,
       max(max_tf)::BIGINT AS max_tf
FROM meta
"""


def rare_terms_sql(max_doc_count: int = 1, k: int = 50,
                   table: str = "documents") -> str:
    """ES rare_terms aggregation — mirrors operators/search.py::
    rare_terms_agg (exact long-tail df, asc order, k cap)."""
    return f"""
WITH {terms_cte(table)}
SELECT term, count(DISTINCT doc_id)::BIGINT AS doc_count
FROM terms GROUP BY term
HAVING count(DISTINCT doc_id) <= {int(max_doc_count)}
ORDER BY doc_count ASC, term ASC
LIMIT {k}
"""


def search_boosting_sql(positive: list[str], negative: list[str],
                        negative_boost: float = 0.4, k1: float = 1.2,
                        b: float = 0.75, limit: int = 20,
                        table: str = "documents") -> str:
    """ES boosting query — mirrors operators/search.py::search_boosting:
    disjunctive BM25 over the positive terms, docs matching any negative
    term demoted to score·negative_boost (never excluded)."""
    neg = sorted(set(negative))
    neg_in = "(" + ", ".join(f"'{t}'" for t in neg) + ")"
    return f"""
WITH {terms_cte(table)},
{bm25_scored_ctes(positive, k1, b, table)},
neg AS (SELECT DISTINCT doc_id FROM terms WHERE term IN {neg_in})
SELECT s.doc_id,
       CASE WHEN n.doc_id IS NOT NULL
            THEN round(round(s.score, 4) * {repr(negative_boost)}, 4)
            ELSE round(s.score, 4) END AS score
FROM scored s LEFT JOIN neg n ON n.doc_id = s.doc_id
ORDER BY score DESC, s.doc_id ASC
LIMIT {limit}
"""


def search_phrase_prefix_sql(body: list[str], prefix: str,
                             max_expansions: int = 50, k: int = 20,
                             table: str = "documents") -> str:
    """match_phrase_prefix — mirrors operators/positional.py::
    phrase_prefix_match (exact body chain + term-asc capped prefix
    expansion at the final position)."""
    n = len(body)
    sel = f"(SELECT doc_id, pos FROM pos_terms WHERE term = '{body[0]}') p0"
    for i, t in enumerate(body[1:], start=1):
        sel += (
            f"\n  JOIN (SELECT doc_id, pos FROM pos_terms WHERE term = '{t}') p{i}"
            f" ON p{i}.doc_id = p0.doc_id AND p{i}.pos = p0.pos + {i}"
        )
    sel += (
        f"\n  JOIN lastpos pl"
        f" ON pl.doc_id = p0.doc_id AND pl.pos = p0.pos + {n}"
    )
    return f"""
WITH {positional_terms_cte(table)},
exp AS (
  SELECT DISTINCT term FROM pos_terms
  WHERE term LIKE '{prefix}%' ORDER BY term ASC LIMIT {max_expansions}
),
lastpos AS (
  SELECT pt.doc_id, pt.pos FROM pos_terms pt
  WHERE pt.term IN (SELECT term FROM exp)
)
SELECT p0.doc_id, count(*)::BIGINT AS phrase_tf
FROM {sel}
GROUP BY p0.doc_id
ORDER BY phrase_tf DESC, p0.doc_id ASC
LIMIT {k}
"""


def search_span_first_sql(term: str, n: int = 10, k: int = 20,
                          table: str = "documents") -> str:
    """SpanFirstQuery — mirrors operators/positional.py::
    search_span_first (first occurrence within the first n positions)."""
    return f"""
WITH {positional_terms_cte(table)}
SELECT doc_id, min(pos)::BIGINT AS first_pos
FROM pos_terms WHERE term = '{term}'
GROUP BY doc_id
HAVING min(pos) < {int(n)}
ORDER BY first_pos ASC, doc_id ASC
LIMIT {k}
"""


def search_span_not_sql(include: str, exclude: str, pre: int = 1,
                        post: int = 1, k: int = 20,
                        table: str = "documents") -> str:
    """SpanNotQuery — mirrors operators/positional.py::search_span_not:
    include-term occurrences surviving the ±(pre, post) exclusion window
    around every exclude-term occurrence."""
    return f"""
WITH {positional_terms_cte(table)},
inc AS (SELECT doc_id, pos FROM pos_terms WHERE term = '{include}'),
exc AS (SELECT doc_id, pos AS epos FROM pos_terms WHERE term = '{exclude}')
SELECT i.doc_id, count(*)::BIGINT AS kept_tf
FROM inc i
WHERE NOT EXISTS (
  SELECT 1 FROM exc e
  WHERE e.doc_id = i.doc_id
    AND e.epos >= i.pos - {int(pre)} AND e.epos <= i.pos + {int(post)}
)
GROUP BY i.doc_id
ORDER BY kept_tf DESC, doc_id ASC
LIMIT {int(k)}
"""


def trending_terms_sql(bucket_secs: int = 3600, k: int = 5,
                       table: str = "documents") -> str:
    """Per-crawl-window top-k terms — mirrors operators/textstats.py::
    trending_terms (epoch bucketing over the frozen warc_ts derivation,
    occurrence counts, n desc / term asc cut)."""
    b = int(bucket_secs)
    return f"""
WITH {terms_cte(table, extra_cols="(1704067200 + 60 * doc_id) AS epoch_s")},
counts AS (
  SELECT (epoch_s - epoch_s % {b})::BIGINT AS bucket_epoch, term,
         count(*)::BIGINT AS n
  FROM terms GROUP BY bucket_epoch, term
),
ranked AS (
  SELECT bucket_epoch, term, n,
         row_number() OVER (PARTITION BY bucket_epoch
                            ORDER BY n DESC, term ASC) AS rn
  FROM counts
)
SELECT bucket_epoch, term, n FROM ranked WHERE rn <= {k}
"""


def search_ltr_sql(query_terms: list[str], weights: dict | None = None,
                   candidates: int = 50, limit: int = 20,
                   table: str = "documents") -> str:
    """LTR inference — mirrors operators/search.py::search_ltr (frozen
    linear model over the single-pass feature matrix, stated in the SAME
    term order so the float arithmetic is bit-identical)."""
    from ..operators.search import LTR_WEIGHTS

    w = weights or LTR_WEIGHTS
    expr = (
        f"{w['bm25']!r} * bm25"
        f" + {w['n_matched']!r} * n_matched"
        f" + {w['dl']!r} * dl"
        f" + {w['sum_tf']!r} * sum_tf"
        f" + {w['max_tf']!r} * max_tf"
        f" + {w['idf_sum']!r} * idf_sum"
    )
    return f"""
WITH f AS ({ltr_features_sql(query_terms, limit=candidates, table=table)})
SELECT doc_id, round({expr}, 4) AS ltr_score
FROM f
ORDER BY ltr_score DESC, doc_id ASC
LIMIT {limit}
"""


def search_pinned_sql(query_terms: list[str], pinned_ids: list[int],
                      limit: int = 20, k1: float = 1.2, b: float = 0.75,
                      table: str = "documents") -> str:
    """ES pinned query — mirrors operators/search.py::search_pinned
    (promoted docs first in given order, organic BM25 after, position
    explicit in the value)."""
    npin = len(pinned_ids)
    n_org = max(limit - npin, 0)
    vals = ", ".join(f"({int(d)}, {i})" for i, d in enumerate(pinned_ids))
    ids_in = "(" + ", ".join(str(int(d)) for d in pinned_ids) + ")"
    return f"""
WITH {terms_cte(table)},
{bm25_scored_ctes(query_terms, k1, b, table)},
sc AS (SELECT doc_id, round(score, 4) AS score FROM scored),
pin(doc_id, position) AS (VALUES {vals}),
pinned_rows AS (
  SELECT p.position::BIGINT AS position, p.doc_id, sc.score,
         TRUE AS pinned
  FROM pin p LEFT JOIN sc USING (doc_id)
),
organic AS (
  SELECT (row_number() OVER (ORDER BY score DESC, doc_id ASC)
          - 1 + {npin})::BIGINT AS position,
         doc_id, score, FALSE AS pinned
  FROM sc WHERE doc_id NOT IN {ids_in}
  ORDER BY score DESC, doc_id ASC
  LIMIT {n_org}
)
SELECT position, doc_id, score, pinned FROM pinned_rows
UNION ALL
SELECT position, doc_id, score, pinned FROM organic
"""


def adjacency_matrix_sql(filters: dict, table: str = "documents") -> str:
    """ES adjacency_matrix — mirrors operators/search.py::
    adjacency_matrix (named single-term filters; singles + name-sorted
    pairwise intersections)."""
    names = sorted(filters)
    cases = " ".join(
        f"WHEN '{filters[nm]}' THEN '{nm}'" for nm in names
    )
    terms_in = "(" + ", ".join(f"'{filters[nm]}'" for nm in names) + ")"
    return f"""
WITH {terms_cte(table)},
m AS (
  SELECT DISTINCT doc_id, CASE term {cases} END AS name
  FROM terms WHERE term IN {terms_in}
),
singles AS (
  SELECT name AS key, count(*)::BIGINT AS doc_count FROM m GROUP BY name
),
pairs AS (
  SELECT a.name || '&' || b.name AS key, count(*)::BIGINT AS doc_count
  FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.name < b.name
  GROUP BY a.name, b.name
)
SELECT key, doc_count FROM singles
UNION ALL
SELECT key, doc_count FROM pairs
"""


# ------------------------------------------------------ interval queries

def _ordered_intervals_ctes(terms: list[str], max_gaps: int,
                            out: str = "outer_iv") -> str:
    """CTE chain producing `out`(doc_id, istart, iend) — the MINIMAL
    ordered intervals of `terms` within max_gaps. Mirrors
    operators/intervals.py::ordered_intervals + _minimalize: greedy-
    earliest stepwise min per anchor, width filter, then the
    start-desc running-min-of-ends minimality prune (strict <)."""
    n = len(terms)
    ctes = [
        f"s0 AS (SELECT doc_id, pos AS istart, pos AS prev\n"
        f"        FROM pos_terms WHERE term = '{terms[0]}')"
    ]
    for i, t in enumerate(terms[1:], start=1):
        ctes.append(
            f"s{i} AS (SELECT s{i-1}.doc_id, s{i-1}.istart, min(p.pos) AS prev\n"
            f"        FROM s{i-1} JOIN pos_terms p\n"
            f"          ON p.doc_id = s{i-1}.doc_id AND p.term = '{t}'\n"
            f"         AND p.pos > s{i-1}.prev\n"
            f"        GROUP BY s{i-1}.doc_id, s{i-1}.istart)"
        )
    gap = (f"\n  WHERE prev - istart - {n - 1} <= {max_gaps}"
           if max_gaps >= 0 else "")
    ctes.append(
        f"cand AS (SELECT doc_id, istart, prev AS iend FROM s{n-1}{gap})"
    )
    ctes.append(f"""{out} AS (
  SELECT doc_id, istart, iend FROM (
    SELECT doc_id, istart, iend,
           min(iend) OVER (PARTITION BY doc_id
                           ORDER BY istart DESC, iend ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS mprev
    FROM cand)
  WHERE mprev IS NULL OR iend < mprev
)""")
    return ",\n".join(ctes)


def _unordered_intervals_ctes(terms: list[str], max_gaps: int,
                              out: str = "outer_iv") -> str:
    """CTE chain producing `out`(doc_id, istart, iend) — MINIMAL
    unordered covers of the distinct terms within max_gaps. Mirrors
    operators/intervals.py::unordered_intervals (running max per term
    over the merged stream, candidate cover per complete row, distinct,
    minimality prune)."""
    uniq = sorted(set(terms))
    n = len(uniq)
    lasts = ",\n         ".join(
        f"max(CASE WHEN term = '{t}' THEN pos END) OVER w AS l{i}"
        for i, t in enumerate(uniq)
    )
    not_null = " AND ".join(f"l{i} IS NOT NULL" for i in range(n))
    least = "least(" + ", ".join(f"l{i}" for i in range(n)) + ")"
    gap = (f" AND pos - {least} - {n - 1} <= {max_gaps}"
           if max_gaps >= 0 else "")
    return f"""covered AS (
  SELECT doc_id, pos,
         {lasts}
  FROM pos_terms WHERE term IN {_terms_in(uniq)}
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
cand AS (
  SELECT DISTINCT doc_id, {least} AS istart, pos AS iend
  FROM covered WHERE {not_null}{gap}
),
{out} AS (
  SELECT doc_id, istart, iend FROM (
    SELECT doc_id, istart, iend,
           min(iend) OVER (PARTITION BY doc_id
                           ORDER BY istart DESC, iend ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS mprev
    FROM cand)
  WHERE mprev IS NULL OR iend < mprev
)"""


def _rank_intervals_sql(src: str, k: int) -> str:
    return f"""
SELECT doc_id, count(*)::BIGINT AS interval_tf
FROM {src}
GROUP BY doc_id
ORDER BY interval_tf DESC, doc_id ASC
LIMIT {k}
"""


def search_intervals_sql(terms: list[str], max_gaps: int,
                         not_containing: str | None = None, k: int = 20,
                         table: str = "documents") -> str:
    """Mirrors operators/intervals.py::search_intervals: ordered minimal
    intervals within max_gaps, minus intervals containing an occurrence
    of `not_containing`, ranked by interval_tf."""
    filt = ""
    if not_containing is not None:
        filt = f"""
WHERE NOT EXISTS (
  SELECT 1 FROM pos_terms t
  WHERE t.doc_id = outer_iv.doc_id AND t.term = '{not_containing}'
    AND t.pos >= outer_iv.istart AND t.pos <= outer_iv.iend
)"""
    return f"""
WITH {positional_terms_cte(table)},
{_ordered_intervals_ctes(terms, max_gaps)},
kept AS (SELECT doc_id FROM outer_iv{filt})
{_rank_intervals_sql("kept", k)}
"""


def search_intervals_containing_sql(terms: list[str], max_gaps: int,
                                    containing: str, k: int = 20,
                                    table: str = "documents") -> str:
    """Mirrors search_intervals_containing in __spark_entry__: UNORDERED
    minimal covers within max_gaps that contain an occurrence of
    `containing`, ranked by interval_tf."""
    return f"""
WITH {positional_terms_cte(table)},
{_unordered_intervals_ctes(terms, max_gaps)},
kept AS (
  SELECT doc_id FROM outer_iv
  WHERE EXISTS (
    SELECT 1 FROM pos_terms t
    WHERE t.doc_id = outer_iv.doc_id AND t.term = '{containing}'
      AND t.pos >= outer_iv.istart AND t.pos <= outer_iv.iend
  )
)
{_rank_intervals_sql("kept", k)}
"""


# ------------------------------------------------------------- ES rescore

def search_rescore_sql(query_terms: list[str], rescore_terms: list[str],
                       window_size: int = 100, query_weight: float = 1.0,
                       rescore_weight: float = 2.0, k: int = 20,
                       k1: float = 1.2, b: float = 0.75,
                       table: str = "documents") -> str:
    """Mirrors operators/scoring_boosts.py::search_rescore: disjunctive
    BM25 window cut (rounded score desc, doc_id asc), exact-phrase
    second pass over the window, score_mode total with the two weights.
    `terms` derives from pos_terms (identical retained-lemma stream) so
    the bag-of-words and positional CTEs share one tokenizer chain."""
    sel = (f"(SELECT doc_id, pos FROM pos_terms"
           f" WHERE term = '{rescore_terms[0]}') p0")
    for i, t in enumerate(rescore_terms[1:], start=1):
        sel += (
            f"\n  JOIN (SELECT doc_id, pos FROM pos_terms"
            f" WHERE term = '{t}') p{i}"
            f" ON p{i}.doc_id = p0.doc_id AND p{i}.pos = p0.pos + {i}"
        )
    return f"""
WITH {positional_terms_cte(table)},
terms AS (SELECT doc_id, term FROM pos_terms),
{bm25_scored_ctes(query_terms, k1, b, table)},
win AS (
  SELECT doc_id, round(score, 4) AS score FROM scored
  ORDER BY round(score, 4) DESC, doc_id ASC
  LIMIT {int(window_size)}
),
ph AS (
  SELECT p0.doc_id, count(*)::BIGINT AS phrase_tf
  FROM {sel}
  GROUP BY p0.doc_id
)
SELECT w.doc_id,
       round({float(query_weight)} * w.score
             + {float(rescore_weight)} * coalesce(ph.phrase_tf, 0), 4)
         AS score
FROM win w LEFT JOIN ph ON ph.doc_id = w.doc_id
ORDER BY score DESC, w.doc_id ASC
LIMIT {int(k)}
"""


# ------------------------------------------------------------ bloom filter

def decontaminate_bloom_sql(holdout_mod: int = 97, m_words: int = 32,
                            k: int = 2, table: str = "documents") -> str:
    """Mirrors operators/bloom.py::decontaminate bit-for-bit: same h60
    re-hash family, same mod-m_bits positions, same 32-bit word packing
    — so bloom_hit INCLUDING false positives hashes identically."""
    bits_per_word = 32
    m_bits = m_words * bits_per_word
    hashes = [h60_sql(f"('b{i}:' || hk)") for i in range(k)]
    key_hashes = [h60_sql(f"('b{i}:' || key)") for i in range(k)]
    pos_union = "\n  UNION ALL\n".join(
        f"  SELECT {h} % {m_bits} AS pos FROM holdout" for h in hashes
    )
    p_cols = ",\n         ".join(
        f"{h} % {m_bits} AS p{i}" for i, h in enumerate(key_hashes)
    )
    joins = "\n".join(
        f"  LEFT JOIN words w{i} ON w{i}.widx = pr.p{i} // {bits_per_word}"
        for i in range(k)
    )
    hit = "\n    AND ".join(
        f"(((coalesce(w{i}.w, 0) >> (pr.p{i} % {bits_per_word})) & 1) = 1)"
        for i in range(k)
    )
    return f"""
WITH holdout AS (
  SELECT lower(trim(text)) AS hk FROM {table}
  WHERE doc_id % {holdout_mod} = 0
),
pos AS (
{pos_union}
),
words AS (
  SELECT pos // {bits_per_word} AS widx,
         bit_or((1::BIGINT) << (pos % {bits_per_word})) AS w
  FROM pos GROUP BY widx
),
pr AS (
  SELECT doc_id, lower(trim(text)) AS key,
         {p_cols}
  FROM {table}
),
hit AS (
  SELECT pr.doc_id, pr.key,
         ({hit}) AS bloom_hit
  FROM pr
{joins}
)
SELECT h.doc_id, h.bloom_hit,
       (hd.hk IS NOT NULL) AS exact_member
FROM hit h
LEFT JOIN (SELECT DISTINCT hk FROM holdout) hd ON hd.hk = h.key
"""


# ----------------------------------------------- multi-word synonym graph

def _variant_tf_select(variant: list[str]) -> str:
    """SELECT (doc_id, tf) for one synonym-graph variant — exact-phrase
    chain for multi-token sequences, plain term tf for singletons
    (mirrors operators/positional.py::variant_phrase_tf)."""
    if len(variant) == 1:
        return (
            f"SELECT doc_id, count(*)::BIGINT AS tf FROM pos_terms"
            f" WHERE term = '{variant[0]}' GROUP BY doc_id"
        )
    sel = f"(SELECT doc_id, pos FROM pos_terms WHERE term = '{variant[0]}') p0"
    for i, t in enumerate(variant[1:], start=1):
        sel += (
            f"\n    JOIN (SELECT doc_id, pos FROM pos_terms"
            f" WHERE term = '{t}') p{i}"
            f" ON p{i}.doc_id = p0.doc_id AND p{i}.pos = p0.pos + {i}"
        )
    return (
        f"SELECT p0.doc_id, count(*)::BIGINT AS tf\n  FROM {sel}"
        f"\n  GROUP BY p0.doc_id"
    )


def search_synonym_graph_sql(groups: list[list[list[str]]], k: int = 20,
                             table: str = "documents") -> str:
    """Mirrors operators/positional.py::search_synonym_graph: per-group
    Σ over variant phrase tfs, conjunctive across groups, ranked
    (score_abs desc, doc_id asc)."""
    ctes = []
    for gi, g in enumerate(groups):
        union = "\n  UNION ALL\n  ".join(
            f"({_variant_tf_select(v)})" for v in g
        )
        ctes.append(
            f"g{gi} AS (\n  SELECT doc_id, sum(tf)::BIGINT AS s{gi}"
            f" FROM (\n  {union}\n  ) GROUP BY doc_id\n)"
        )
    joins = "".join(
        f"\nJOIN g{gi} USING (doc_id)" for gi in range(1, len(groups))
    )
    total = " + ".join(f"s{gi}" for gi in range(len(groups)))
    cte_block = ",\n".join(ctes)
    return f"""
WITH {positional_terms_cte(table)},
{cte_block}
SELECT doc_id, ({total})::BIGINT AS score_abs
FROM g0{joins}
ORDER BY score_abs DESC, doc_id ASC
LIMIT {k}
"""


# ------------------------------------------------------------ query clarity

def clarity_score_sql(query_terms: list[str], top_terms: int = 30,
                      table: str = "documents") -> str:
    """Mirrors operators/textstats.py::clarity_score — result-set vs
    collection language-model KL contributions, conjunctive hit set,
    6-dp rounding, (contrib desc, term asc) top cut."""
    uniq = sorted(set(query_terms))
    return f"""
WITH {terms_cte(table)},
post AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms
  GROUP BY doc_id, term
),
hits AS (
  SELECT doc_id FROM post WHERE term IN {_terms_in(uniq)}
  GROUP BY doc_id HAVING count(DISTINCT term) = {len(uniq)}
),
rel AS (SELECT p.* FROM post p JOIN hits USING (doc_id)),
rel_tf AS (SELECT term, sum(tf)::BIGINT AS rtf FROM rel GROUP BY term),
rtot AS (SELECT sum(tf)::DOUBLE AS rtot FROM rel),
ctf AS (SELECT term, sum(tf)::BIGINT AS ctf FROM post GROUP BY term),
ctot AS (SELECT sum(tf)::DOUBLE AS ctot FROM post)
SELECT term,
       round((rtf / rtot) * ln((rtf / rtot) / (ctf / ctot)), 6) AS contrib
FROM rel_tf JOIN ctf USING (term)
CROSS JOIN rtot CROSS JOIN ctot
ORDER BY contrib DESC, term ASC
LIMIT {int(top_terms)}
"""


def nextword_postings_sql(table: str = "documents") -> str:
    """(w1, w2, doc_id, pair_tf) — the nextword auxiliary index (mirrors
    operators/positional.py::build_nextword): adjacent retained-token
    pairs of the SAME positional stream pos_terms numbers."""
    return f"""
WITH {positional_terms_cte(table)},
pairs AS (
  SELECT doc_id, term AS w1,
         lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM pos_terms
)
SELECT w1, w2, doc_id, count(*)::BIGINT AS pair_tf
FROM pairs WHERE w2 IS NOT NULL
GROUP BY w1, w2, doc_id
"""


def search_bm25_sharded_sql(query_terms: list[str],
                            n_shards: int | None = None,
                            k1: float = 1.2, b: float = 0.75,
                            limit: int = 20,
                            table: str = "documents") -> str:
    """Mirrors operators/search.py::search_bm25_sharded (dfs=False) — ES
    `query_then_fetch`: each shard (doc_id % n_shards) scores with its
    LOCAL (N_s, df_s, avgdl_s); coordinator merge = global top-k.
    n_shards defaults to the engine's N_SCORING_SHARDS (single source
    of truth — the pair cannot drift). Returns (doc_id, score)."""
    if n_shards is None:
        from ..operators.search import N_SCORING_SHARDS

        n_shards = N_SCORING_SHARDS
    return f"""
WITH {terms_cte(table)},
post AS (
  SELECT doc_id, doc_id % {n_shards} AS shard, term,
         count(*)::DOUBLE AS tf
  FROM terms WHERE term IN {_terms_in(query_terms)}
  GROUP BY doc_id, term
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM terms GROUP BY doc_id),
sstats AS (
  SELECT d.doc_id % {n_shards} AS shard,
         count(*)::DOUBLE AS n_s,
         sum(coalesce(dl.dl, 0)) / count(*) AS avgdl_s
  FROM {table} d LEFT JOIN dl USING (doc_id)
  GROUP BY 1
),
sdf AS (
  SELECT shard, term, count(DISTINCT doc_id)::DOUBLE AS df_s
  FROM post GROUP BY shard, term
),
scored AS (
  SELECT p.doc_id,
         sum( ln(1 + (s.n_s - sdf.df_s + 0.5) / (sdf.df_s + 0.5))
              * p.tf * ({k1} + 1)
              / (p.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl_s)) ) AS score
  FROM post p
  JOIN dl USING (doc_id)
  JOIN sdf ON sdf.shard = p.shard AND sdf.term = p.term
  JOIN sstats s ON s.shard = p.shard
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored
ORDER BY round(score, 4) DESC, doc_id ASC
LIMIT {int(limit)}
"""


def folded_cte(table: str = "documents") -> str:
    """CTE `folded(doc_id, text)` — ascii-folded text (mirrors
    textproc/folding.py: lower → multi-char expansions → translate)."""
    from ..textproc.folding import fold_sql

    return (
        f"folded AS (SELECT doc_id, {fold_sql('lower(text)')} AS text "
        f"FROM {table})"
    )


def postings_folded_sql(table: str = "documents") -> str:
    """Mirrors operators/index_build.py::build_postings_folded."""
    return f"""
WITH {folded_cte(table)},
{terms_cte('folded').lstrip()}
SELECT doc_id, term, count(*)::BIGINT AS tf
FROM terms GROUP BY doc_id, term
"""


def search_bm25_folded_sql(query_terms: list[str], k1: float = 1.2,
                           b: float = 0.75, limit: int = 20,
                           table: str = "documents") -> str:
    """Disjunctive BM25 over the folded analyzer chain; query terms are
    pre-folded by the caller. Returns (doc_id, score)."""
    return f"""
WITH {folded_cte(table)},
{terms_cte('folded').lstrip()},
{bm25_scored_ctes(query_terms, k1, b, 'folded')}
SELECT doc_id, round(score, 4) AS score
FROM scored
ORDER BY round(score, 4) DESC, doc_id ASC
LIMIT {int(limit)}
"""


def geo_centroid_sql(table: str = "documents") -> str:
    """Mirrors operators/geo.py::geo_centroid — exact integer-sum
    centroid per site. Returns (site_key, n, centroid_lat,
    centroid_lon)."""
    return f"""
WITH g AS (
  SELECT {SITE_KEY_SQL} AS site_key,
         {GEO_LAT_E4_SQL} AS lat_e4, {GEO_LON_E4_SQL} AS lon_e4
  FROM {table}
)
SELECT site_key, count(*)::BIGINT AS n,
       round(sum(lat_e4)::DOUBLE / count(*) / 10000.0, 4) AS centroid_lat,
       round(sum(lon_e4)::DOUBLE / count(*) / 10000.0, 4) AS centroid_lon
FROM g GROUP BY site_key
ORDER BY site_key
"""


def search_common_terms_sql(query_terms: list[str],
                            cutoff: float | None = None,
                            k1: float = 1.2, b: float = 0.75,
                            limit: int = 20,
                            table: str = "documents") -> str:
    """Mirrors operators/search.py::search_common_terms — Lucene
    CommonTermsQuery: low-df terms (df/N < cutoff) select conjunctively,
    high-df terms only score; all-high falls back to conjunctive; an
    absent term is low ⇒ required ⇒ empty (expressed by requiring every
    LOW term to exist: an absent term yields no selector rows and the
    doc-level nt can never reach the target). cutoff defaults from the
    engine constant. Returns (doc_id, score)."""
    if cutoff is None:
        from ..operators.search import COMMON_CUTOFF_DEFAULT

        cutoff = COMMON_CUTOFF_DEFAULT
    q = sorted(set(query_terms))
    return f"""
WITH {terms_cte(table)},
{bm25_scored_ctes(query_terms, k1, b, table)},
qterms AS (SELECT unnest({[*q]!r}::VARCHAR[]) AS term),
n_docs AS (SELECT count(*)::DOUBLE AS n FROM {table}),
classed AS (
  SELECT q.term,
         coalesce(d.df, 0) / n.n < {float(cutoff)!r} AS is_low
  FROM qterms q
  LEFT JOIN df d ON d.term = q.term
  CROSS JOIN n_docs n
),
selector AS (
  -- low terms if any exist, else every query term (all-high fallback)
  SELECT term FROM classed
  WHERE is_low OR NOT EXISTS (SELECT 1 FROM classed WHERE is_low)
),
hits AS (
  SELECT p.doc_id
  FROM post p JOIN selector s ON s.term = p.term
  GROUP BY p.doc_id
  HAVING count(DISTINCT p.term) = (SELECT count(*) FROM selector)
)
SELECT sc.doc_id, round(sc.score, 4) AS score
FROM scored sc JOIN hits h ON h.doc_id = sc.doc_id
ORDER BY round(sc.score, 4) DESC, sc.doc_id ASC
LIMIT {int(limit)}
"""


def trigram_index_sql(table: str = "documents") -> str:
    """Mirrors operators/dictionary.py::term_trigram_index — distinct
    character 3-grams per dictionary term (whole term for len < 3).
    Returns (gram, term, df)."""
    return f"""
WITH {terms_cte(table)},
dict AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM terms GROUP BY term
),
grams0 AS (
  SELECT substring(term, u.i::INT, 3) AS gram, term, df
  FROM dict, LATERAL unnest(range(1, greatest(length(term) - 1, 1))) u(i)
  WHERE length(term) >= 3
  UNION ALL
  SELECT term AS gram, term, df FROM dict WHERE length(term) < 3
)
SELECT DISTINCT gram, term, df FROM grams0
"""


def search_bool_prefix_sql(query_terms: list[str], prefix: str,
                           k1: float = 1.2, b: float = 0.75,
                           limit: int = 20, max_expansions: int = 50,
                           table: str = "documents") -> str:
    """Mirrors operators/search.py::search_bool_prefix — completed terms
    + prefix expansion of the last token, one disjunctive BM25.
    Returns (doc_id, score)."""
    pre = prefix.strip().lower()
    fixed = ", ".join(f"'{t}'" for t in sorted(set(query_terms)))
    # Empty fixed-term list: VALUES () is invalid SQL — the qset is the
    # prefix expansion alone (mirrors the engine path, which unions an
    # empty completed-terms set without a special case).
    if fixed:
        qset = (
            "qset AS (\n  SELECT term FROM wterms\n"
            f"  UNION SELECT * FROM (VALUES ({fixed.replace(', ', '), (')}))"
            " v(term)\n)"
        )
    else:
        qset = "qset AS (\n  SELECT term FROM wterms\n)"
    return f"""
WITH {terms_cte(table)},
wterms AS (
  SELECT term FROM (
    SELECT term FROM terms GROUP BY term
  ) WHERE starts_with(term, '{pre}')
  ORDER BY term ASC LIMIT {int(max_expansions)}
),
{qset},
post AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms
  WHERE term IN (SELECT term FROM qset) GROUP BY doc_id, term
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM terms GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM {table})::DOUBLE AS n_docs,
         (SELECT sum(coalesce(dl.dl,0)) FROM {table} d LEFT JOIN dl USING (doc_id))
           / (SELECT count(*) FROM {table}) AS avgdl
),
df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM terms
  WHERE term IN (SELECT term FROM qset) GROUP BY term
),
scored AS (
  SELECT p.doc_id,
         sum( ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * p.tf * ({k1} + 1)
              / (p.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
  FROM post p
  JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN stats s
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored
ORDER BY round(score, 4) DESC, doc_id ASC
LIMIT {int(limit)}
"""


def stats_bucket_sql(query_terms: list[str], bucket_secs: int = 3600,
                     table: str = "documents") -> str:
    """Mirrors operators/bucket_aggs.py::stats_bucket — one-row sibling
    stats over the hourly hit histogram.
    Returns (n_buckets, min_hits, max_hits, avg_hits, sum_hits)."""
    b = int(bucket_secs)
    return f"""
WITH {terms_cte(table)},
{_conj_hits_cte(query_terms).lstrip()},
hist AS (
  SELECT ((1704067200 + 60 * doc_id)
          - (1704067200 + 60 * doc_id) % {b})::BIGINT AS bucket_epoch,
         count(*)::BIGINT AS n_hits
  FROM hits GROUP BY 1
)
SELECT count(*)::BIGINT AS n_buckets,
       min(n_hits)::BIGINT AS min_hits,
       max(n_hits)::BIGINT AS max_hits,
       round(avg(n_hits::DOUBLE), 4) AS avg_hits,
       sum(n_hits)::BIGINT AS sum_hits
FROM hist
"""


def categorize_text_sql(k: int = 20, table: str = "documents") -> str:
    """Mirrors operators/textstats.py::categorize_text — digit runs →
    '<n>', [ \\t\\n\\r] runs → one space, top-k templates."""
    return f"""
WITH cat AS (
  SELECT trim(regexp_replace(regexp_replace(lower(text), '[0-9]+', '<n>', 'g'),
                             '[ \\t\\n\\r]+', ' ', 'g')) AS category,
         doc_id
  FROM {table}
)
SELECT category, count(*)::BIGINT AS n, min(doc_id) AS example_doc_id
FROM cat WHERE category <> ''
GROUP BY category
ORDER BY n DESC, category ASC
LIMIT {int(k)}
"""


def frequent_item_sets_sql(min_support: int = 2, k: int = 20,
                           table: str = "documents") -> str:
    """Mirrors operators/textstats.py::frequent_item_sets — pairwise
    co-occurrence support over per-doc distinct retained terms."""
    return f"""
WITH {terms_cte(table)},
dt AS (SELECT DISTINCT doc_id, term FROM terms)
SELECT a.term AS t1, b.term AS t2, count(*)::BIGINT AS support
FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
GROUP BY a.term, b.term
HAVING count(*) >= {int(min_support)}
ORDER BY support DESC, t1 ASC, t2 ASC
LIMIT {int(k)}
"""


def search_span_or_sql(anchor: str, alternatives: list[str], slop: int = 2,
                       k: int = 20, table: str = "documents") -> str:
    """SpanNear[anchor, SpanOr(alternatives)] — mirrors
    operators/positional.py::search_span_or: anchor occurrences with any
    alternative-term occurrence within ±slop positions."""
    alts = ", ".join(f"'{t}'" for t in sorted(set(alternatives)))
    return f"""
WITH {positional_terms_cte(table)},
a AS (SELECT doc_id, pos FROM pos_terms WHERE term = '{anchor}'),
b AS (SELECT doc_id, pos AS bpos FROM pos_terms WHERE term IN ({alts}))
SELECT a.doc_id, count(*)::BIGINT AS or_tf
FROM a
WHERE EXISTS (
  SELECT 1 FROM b
  WHERE b.doc_id = a.doc_id
    AND b.bpos >= a.pos - {int(slop)} AND b.bpos <= a.pos + {int(slop)}
)
GROUP BY a.doc_id
ORDER BY or_tf DESC, doc_id ASC
LIMIT {int(k)}
"""


def geohash_grid_sql(precision: int = 4, size: int = 20,
                     table: str = "documents") -> str:
    """Mirrors operators/geo.py::geohash_grid — base32 geohash cells,
    top `size` by count. The bit interleave and base32 digits are the
    same unrolled integer expressions the Spark plan builds, generated
    here from the one GEOHASH_ALPHABET/precision source of truth.
    Returns (geohash, doc_count)."""
    from ..operators import geo as g

    p = int(precision)
    total = 5 * p
    latbits = total // 2
    lonbits = total - latbits
    size = min(int(size), 32**p, 65536)
    terms = []
    for i in range(total):
        if i % 2 == 0:
            src, nb, idx = "lon_q", lonbits, i // 2
        else:
            src, nb, idx = "lat_q", latbits, i // 2
        terms.append(f"(({src} >> {nb - 1 - idx}) % 2) * {1 << (total - 1 - i)}")
    combined = " + ".join(terms)
    chars = " || ".join(
        f"substr('{g.GEOHASH_ALPHABET}',"
        f" ((combined >> {5 * (p - 1 - c)}) % 32 + 1)::INT, 1)"
        for c in range(p)
    )
    return f"""
WITH {_geo_cte(table)},
q AS (
  SELECT doc_id,
    CAST(greatest(0.0, least(floor(round((lat + 90.0) / 180.0
      * {float(1 << latbits)!r}, 9)), {float((1 << latbits) - 1)!r}))
      AS BIGINT) AS lat_q,
    CAST(greatest(0.0, least(floor(round((lon + 180.0) / 360.0
      * {float(1 << lonbits)!r}, 9)), {float((1 << lonbits) - 1)!r}))
      AS BIGINT) AS lon_q
  FROM geo
),
c AS (SELECT doc_id, ({combined})::BIGINT AS combined FROM q),
k AS (SELECT doc_id, {chars} AS geohash FROM c)
SELECT geohash, count(*)::BIGINT AS doc_count
FROM k GROUP BY geohash
ORDER BY doc_count DESC, geohash ASC
LIMIT {size}
"""


def geo_bounds_sql(table: str = "documents") -> str:
    """Mirrors operators/geo.py::geo_bounds — per-site enclosing box
    from integer micro-degree min/max (exact; the /1e4 division is the
    identical double op in both engines, no rounding needed)."""
    return f"""
WITH g AS (
  SELECT {SITE_KEY_SQL} AS site_key,
         {GEO_LAT_E4_SQL} AS lat_e4, {GEO_LON_E4_SQL} AS lon_e4
  FROM {table}
)
SELECT site_key, count(*)::BIGINT AS n,
       max(lat_e4) / 10000.0 AS top,
       min(lon_e4) / 10000.0 AS "left",
       min(lat_e4) / 10000.0 AS bottom,
       max(lon_e4) / 10000.0 AS "right"
FROM g GROUP BY site_key ORDER BY site_key
"""


def geo_line_sql(size: int = 10, table: str = "documents") -> str:
    """ES geo_line — mirrors operators/geo.py::geo_line: first `size`
    points per site ordered by (warc_ts, doc_id), exploded with seq."""
    return f"""
WITH {_geo_cte(table)},
r AS (
  SELECT {SITE_KEY_SQL} AS site_key, doc_id, lat, lon,
         row_number() OVER (PARTITION BY {SITE_KEY_SQL}
                            ORDER BY (1704067200 + 60 * doc_id) ASC,
                                     doc_id ASC) AS seq
  FROM geo
)
SELECT site_key, seq::INT AS seq, doc_id, lat, lon
FROM r WHERE seq <= {int(size)}
"""


def search_collapsed_inner_sql(query_terms: list[str], inner_size: int = 3,
                               limit: int = 20,
                               table: str = "documents") -> str:
    """Field collapse with inner_hits — mirrors operators/search.py::
    search_collapsed_inner over the full BM25 scored set: rank-1 heads
    (global top-`limit`) joined to their group's top-`inner_size`."""
    inner = search_bm25_sql(query_terms, limit=1_000_000, table=table)
    return f"""
WITH hits AS ({inner}),
g AS (SELECT doc_id, score, {SITE_KEY_SQL} AS site_key FROM hits),
r AS (
  SELECT site_key, doc_id, score,
         row_number() OVER (PARTITION BY site_key
                            ORDER BY score DESC, doc_id ASC) AS rn
  FROM g
),
heads AS (
  SELECT site_key, doc_id AS head_doc FROM r WHERE rn = 1
  ORDER BY score DESC, doc_id ASC LIMIT {int(limit)}
)
SELECT h.site_key, h.head_doc, r.rn::INT AS inner_rank,
       r.doc_id AS inner_doc, r.score AS inner_score
FROM heads h JOIN r ON r.site_key = h.site_key
WHERE r.rn <= {int(inner_size)}
"""
