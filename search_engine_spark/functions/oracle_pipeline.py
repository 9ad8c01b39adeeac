"""DuckDB oracle SQL for the training-data-pipeline operators
(operators/textstats.py, dedup.py, similarity.py, multimodal.py).

Same contract as oracle_fragments.py: every frozen constant / hash /
threshold here imports from the single Python source of truth, so Spark and
oracle cannot drift. All hashing goes through the portable h60
(md5-derived; hashing.py)."""

from __future__ import annotations

from ..hashing import h60_sql
from ..operators import curation as cu
from ..operators import graph as gr
from ..operators import dedup as dd
from ..operators import similarity as sim
from ..operators import textstats as ts
from ..textproc.stopwords import sql_not_in_list
from ..textproc.ruletier import rule_lemma_sql
from .oracle_fragments import PARSEABLE_SQL, SITE_KEY_SQL, terms_cte
from ..textproc.tokenize import WS_SPLIT

# --------------------------------------------------------------- textstats

def language_id_sql(table: str = "documents") -> str:
    c, l = ts.CYRILLIC_CLASS, ts.LATIN_CLASS
    return f"""
WITH base AS (
  SELECT doc_id,
         length(lower(text)) - length(regexp_replace(lower(text), '[{c}]', '', 'g')) AS cyr,
         length(lower(text)) - length(regexp_replace(lower(text), '[{l}]', '', 'g')) AS lat
  FROM {table}
)
SELECT doc_id, cyr::BIGINT AS cyr, lat::BIGINT AS lat,
       CASE WHEN cyr + lat = 0 THEN 'unknown'
            WHEN cyr / (cyr + lat) >= {ts.LANG_RU_MIN_RATIO} THEN 'ru'
            WHEN lat / (cyr + lat) >= {ts.LANG_EN_MIN_RATIO} THEN 'en'
            ELSE 'mixed' END AS lang_pred
FROM base
"""


def token_counts_sql(table: str = "documents") -> str:
    bpe_sql = ts.BPE_SPLIT.replace("'", "''")
    return f"""
WITH {terms_cte(table)},
t AS (
  SELECT doc_id, count(*)::BIGINT AS n_terms,
         count(DISTINCT term)::BIGINT AS n_unique_terms
  FROM terms GROUP BY doc_id
)
SELECT d.doc_id,
       (CASE WHEN trim(d.text) = '' THEN 0
             ELSE len(string_split_regex(trim(d.text), '{WS_SPLIT}')) END)::BIGINT
         AS n_ws_tokens,
       len(regexp_extract_all(d.text, '{bpe_sql}'))::BIGINT AS n_bpe_tokens,
       coalesce(t.n_terms, 0)::BIGINT AS n_terms,
       coalesce(t.n_unique_terms, 0)::BIGINT AS n_unique_terms
FROM {table} d LEFT JOIN t USING (doc_id)
"""


def quality_scores_sql(table: str = "documents") -> str:
    return f"""
WITH base AS (
  SELECT doc_id,
         lower(trim(text)) AS t,
         length(lower(trim(text))) AS n_chars,
         CASE WHEN lower(trim(text)) = '' THEN 0
              ELSE len(string_split_regex(lower(trim(text)), '{WS_SPLIT}')) END AS n_tok,
         CASE WHEN lower(trim(text)) = '' THEN 0
              ELSE len(list_filter(string_split_regex(lower(trim(text)), '{WS_SPLIT}'),
                                   x -> x IN {sql_not_in_list()})) END AS stop_hits,
         length(lower(trim(text)))
           - length(regexp_replace(lower(trim(text)), '[0-9]', '', 'g')) AS digits,
         length(regexp_replace(lower(trim(text)), '{WS_SPLIT}', '', 'g')) AS non_ws
  FROM {table}
),
ratios AS (
  SELECT doc_id, n_chars,
         CASE WHEN n_tok = 0 THEN 0.0 ELSE stop_hits / n_tok END AS stop_ratio,
         CASE WHEN n_tok = 0 THEN 0.0 ELSE non_ws / n_tok END AS mean_wl,
         CASE WHEN n_chars = 0 THEN 0.0 ELSE digits / n_chars END AS digit_ratio
  FROM base
)
SELECT doc_id, n_chars::BIGINT AS n_chars,
       round(stop_ratio, 4) AS stopword_ratio,
       round(mean_wl, 4) AS mean_word_len,
       round(digit_ratio, 4) AS digit_ratio,
       round(
         CASE WHEN n_chars = 0 THEN 0.0 ELSE
         (CASE WHEN stop_ratio >= {ts.QUALITY_STOPWORD_LO}
                AND stop_ratio <= {ts.QUALITY_STOPWORD_HI} THEN 0.4 ELSE 0.0 END)
         + (CASE WHEN mean_wl >= {ts.QUALITY_MEAN_WORD_LO}
                  AND mean_wl <= {ts.QUALITY_MEAN_WORD_HI} THEN 0.3 ELSE 0.0 END)
         + (CASE WHEN digit_ratio <= 0.2 THEN 0.2 ELSE 0.0 END)
         + (CASE WHEN n_chars > 0 THEN 0.1 ELSE 0.0 END)
         END, 4) AS quality
FROM ratios
"""


FP_SQL = f"md5(regexp_replace(lower(trim(text)), '{WS_SPLIT}', ' ', 'g'))"


def fingerprints_sql(table: str = "documents") -> str:
    return f"SELECT doc_id, {FP_SQL} AS fp FROM {table}"


def unigram_lm_scores_sql(table: str = "documents") -> str:
    """Mirrors operators/textstats.py::unigram_lm_scores."""
    return f"""
WITH {terms_cte(table)},
tc AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms GROUP BY doc_id, term),
cf AS (SELECT term, sum(tf)::DOUBLE AS cf FROM tc GROUP BY term),
tot AS (SELECT sum(cf) AS t FROM cf),
per_doc AS (
  SELECT tc.doc_id,
         sum(tc.tf)::BIGINT AS dl,
         sum(tc.tf * ln(cf.cf / tot.t)) / sum(tc.tf) AS avg
  FROM tc JOIN cf USING (term) CROSS JOIN tot
  GROUP BY tc.doc_id
)
SELECT doc_id, dl, round(avg, 4) AS avg_logp, round(exp(-avg), 4) AS lm_ppl
FROM per_doc
"""


def doc_keywords_sql(k: int = 3, table: str = "documents") -> str:
    """Mirrors operators/textstats.py::doc_keywords (rank on ROUNDED
    tfidf, ties → term asc)."""
    return f"""
WITH {terms_cte(table)},
tc AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms GROUP BY doc_id, term),
df AS (SELECT term, count(*)::BIGINT AS df FROM tc GROUP BY term),
n AS (SELECT count(*)::DOUBLE AS n_docs FROM {table}),
scored AS (
  SELECT tc.doc_id, tc.term,
         round(tc.tf::DOUBLE * ln(n.n_docs / df.df::DOUBLE), 4) AS tfidf
  FROM tc JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC)::INT AS rank
  FROM scored
)
SELECT doc_id, term, tfidf, rank FROM ranked WHERE rank <= {k}
"""


def repetition_stats_sql(table: str = "documents") -> str:
    """Mirrors operators/textstats.py::repetition_stats."""
    return f"""
WITH base AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '{WS_SPLIT}', ' ', 'g'), ' ') AS toks
  FROM {table} WHERE trim(text) <> ''
),
tc AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest(toks) AS tok FROM base) GROUP BY doc_id, tok
),
ta AS (
  SELECT doc_id, sum(c) AS n_tok, count(*) AS n_distinct, max(c) AS top_tok
  FROM tc GROUP BY doc_id
),
bc AS (
  SELECT doc_id, bg, count(*) AS c
  FROM (
    SELECT doc_id, toks[i + 1] || ' ' || toks[i + 2] AS bg
    FROM base, unnest(range(0, len(toks) - 1)) AS t(i)
    WHERE len(toks) >= 2
  ) GROUP BY doc_id, bg
),
ba AS (SELECT doc_id, sum(c) AS n_bg, max(c) AS top_bg FROM bc GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(ta.n_tok, 0)::BIGINT AS n_tok,
       round(CASE WHEN coalesce(ta.n_tok, 0) > 0
                  THEN (ta.n_tok - ta.n_distinct)::DOUBLE / ta.n_tok
                  ELSE 0.0 END, 4) AS dup_token_frac,
       round(CASE WHEN coalesce(ta.n_tok, 0) > 0
                  THEN ta.top_tok::DOUBLE / ta.n_tok
                  ELSE 0.0 END, 4) AS top_token_ratio,
       round(CASE WHEN coalesce(ba.n_bg, 0) > 0
                  THEN ba.top_bg::DOUBLE / ba.n_bg
                  ELSE 0.0 END, 4) AS top_bigram_ratio
FROM {table} d
LEFT JOIN ta ON ta.doc_id = d.doc_id
LEFT JOIN ba ON ba.doc_id = d.doc_id
"""


# ------------------------------------------------------------------- dedup

def exact_duplicates_sql(table: str = "documents") -> str:
    return f"""
WITH fp AS (SELECT doc_id, {FP_SQL} AS fp FROM {table}),
g AS (
  SELECT doc_id,
         min(doc_id) OVER (PARTITION BY fp) AS canonical_id,
         count(*) OVER (PARTITION BY fp) AS group_size
  FROM fp
)
SELECT doc_id, canonical_id, group_size::BIGINT AS group_size
FROM g WHERE group_size >= 2
"""


def _shingles_cte(table: str = "documents", k: int = dd.SHINGLE_K) -> str:
    return f"""
norm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '{WS_SPLIT}', ' ', 'g'), ' ') AS toks
  FROM {table} WHERE trim(text) <> ''
),
shingles AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(toks) <= {k} THEN array_to_string(toks, ' ')
              ELSE array_to_string(list_slice(toks, i + 1, i + {k}), ' ') END AS shingle
  FROM norm,
       unnest(CASE WHEN len(toks) <= {k} THEN [0]
                   ELSE range(0, len(toks) - {k} + 1) END) AS u(i)
)"""


def minhash_sql(table: str = "documents") -> str:
    h = h60_sql("(perm::VARCHAR || ':' || shingle)")
    return f"""
WITH {_shingles_cte(table)}
SELECT doc_id, perm::INT AS perm, min({h}) AS minhash
FROM shingles, unnest(range(0, {dd.N_PERM})) AS p(perm)
GROUP BY doc_id, perm
"""


def lsh_pairs_sql(table: str = "documents") -> str:
    h = h60_sql("(perm::VARCHAR || ':' || shingle)")
    return f"""
WITH {_shingles_cte(table)},
sig AS (
  SELECT doc_id, perm::INT AS perm, min({h}) AS minhash
  FROM shingles, unnest(range(0, {dd.N_PERM})) AS p(perm)
  GROUP BY doc_id, perm
),
banded AS (
  SELECT doc_id, (perm // {dd.PERM_BAND}) AS band,
         string_agg(minhash::VARCHAR, '-' ORDER BY perm) AS band_key
  FROM sig GROUP BY doc_id, band
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
"""


def jaccard_pairs_sql(table: str = "documents", threshold: float = 0.5,
                      lsh_candidates: bool = False) -> str:
    """lsh_candidates=True mirrors the candidate-driven default wiring:
    intersections are counted only for LSH band-collision pairs."""
    h = h60_sql("(perm::VARCHAR || ':' || shingle)")
    cand_ctes = f""",
sig AS (
  SELECT doc_id, perm::INT AS perm, min({h}) AS minhash
  FROM shingles, unnest(range(0, {dd.N_PERM})) AS p(perm)
  GROUP BY doc_id, perm
),
banded AS (
  SELECT doc_id, (perm // {dd.PERM_BAND}) AS band,
         string_agg(minhash::VARCHAR, '-' ORDER BY perm) AS band_key
  FROM sig GROUP BY doc_id, band
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)""" if lsh_candidates else ""
    inter_src = (
        """
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cand c
  JOIN shingles a ON a.doc_id = c.doc_a
  JOIN shingles b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b"""
        if lsh_candidates
        else """
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM shingles a JOIN shingles b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b"""
    )
    return f"""
WITH {_shingles_cte(table)}{cand_ctes},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS ({inter_src}
)
SELECT doc_a, doc_b,
       round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) >= {threshold}
"""


def containment_pairs_sql(table: str = "documents", threshold: float = 0.8,
                          lsh_candidates: bool = True) -> str:
    """Broder containment c(A,B) = |S(A)∩S(B)| / |S(A)| — mirrors
    operators/dedup.py::containment_pairs (both orientations of each
    candidate pair, kept at containment ≥ threshold)."""
    h = h60_sql("(perm::VARCHAR || ':' || shingle)")
    cand_ctes = f""",
sig AS (
  SELECT doc_id, perm::INT AS perm, min({h}) AS minhash
  FROM shingles, unnest(range(0, {dd.N_PERM})) AS p(perm)
  GROUP BY doc_id, perm
),
banded AS (
  SELECT doc_id, (perm // {dd.PERM_BAND}) AS band,
         string_agg(minhash::VARCHAR, '-' ORDER BY perm) AS band_key
  FROM sig GROUP BY doc_id, band
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)""" if lsh_candidates else ""
    inter_src = (
        """
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cand c
  JOIN shingles a ON a.doc_id = c.doc_a
  JOIN shingles b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b"""
        if lsh_candidates
        else """
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM shingles a JOIN shingles b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b"""
    )
    return f"""
WITH {_shingles_cte(table)}{cand_ctes},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS ({inter_src}
),
sized AS (
  SELECT doc_a, doc_b, n_inter, sa.n_sh AS na, sb.n_sh AS nb
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
),
oriented AS (
  SELECT doc_a AS contained, doc_b AS container,
         round(n_inter / na, 4) AS containment FROM sized
  UNION ALL
  SELECT doc_b AS contained, doc_a AS container,
         round(n_inter / nb, 4) AS containment FROM sized
)
SELECT contained, container, containment
FROM oriented WHERE containment >= {threshold}
"""


def simhash_sql(table: str = "documents") -> str:
    h = h60_sql("term")
    return f"""
WITH {terms_cte(table)},
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf, {h} AS h
  FROM terms GROUP BY doc_id, term
),
per_bit AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (h >> bit) & 1 = 1 THEN tf ELSE -tf END) AS s
  FROM tf, unnest(range(0, {dd.SIMHASH_BITS})) AS b(bit)
  GROUP BY doc_id, bit
)
SELECT doc_id,
       sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
FROM per_bit GROUP BY doc_id
"""


def simhash_near_pairs_sql(table: str = "documents", max_hamming: int = 8) -> str:
    band_w = dd.SIMHASH_BITS // 4
    mask = (1 << band_w) - 1
    return f"""
WITH sig AS ({simhash_sql(table)}),
banded AS (
  SELECT doc_id, simhash, band,
         (simhash >> (band * {band_w})) & {mask} AS key
  FROM sig, unnest([0, 1, 2, 3]) AS b(band)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sig_a, b.simhash AS sig_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, bit_count(xor(sig_a, sig_b))::INT AS hamming
FROM pairs WHERE bit_count(xor(sig_a, sig_b)) <= {max_hamming}
"""


def dedup_clusters_sql(table: str = "documents", threshold: float = 0.5) -> str:
    """Near-dup clustering oracle: LSH candidates → candidate-driven
    Jaccard ≥ threshold → transitive closure via recursive CTE; cluster =
    min reachable doc_id (mirrors operators/dedup.py::dedup_clusters)."""
    h = h60_sql("(perm::VARCHAR || ':' || shingle)")
    return f"""
WITH RECURSIVE {_shingles_cte(table).lstrip()},
sig AS (
  SELECT doc_id, perm::INT AS perm, min({h}) AS minhash
  FROM shingles, unnest(range(0, {dd.N_PERM})) AS p(perm)
  GROUP BY doc_id, perm
),
banded AS (
  SELECT doc_id, (perm // {dd.PERM_BAND}) AS band,
         string_agg(minhash::VARCHAR, '-' ORDER BY perm) AS band_key
  FROM sig GROUP BY doc_id, band
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cand c
  JOIN shingles a ON a.doc_id = c.doc_a
  JOIN shingles b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
),
pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) >= {threshold}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(doc_id, lab) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.doc_id
),
comp AS (SELECT doc_id, min(lab) AS cluster_id FROM reach GROUP BY doc_id)
SELECT doc_id, cluster_id,
       (count(*) OVER (PARTITION BY cluster_id))::BIGINT AS cluster_size
FROM comp
"""


# ---------------------------------------------------------------- sampling

def _sample_u_sql(seed_tag: str) -> str:
    h = h60_sql(f"('{seed_tag}:' || doc_id)")
    return f"({h} / {float(2 ** 60)!r})"


def stratified_sample_sql(fractions: dict, strata_col: str = "lang",
                          seed_tag: str = "sample",
                          table: str = "documents") -> str:
    """Mirrors operators/sampling.py::stratified_sample (identical h60
    membership bit). Returns (doc_id, <strata_col>)."""
    whens = " ".join(
        f"WHEN '{k}' THEN {float(fractions[k])!r}" for k in sorted(fractions)
    )
    case = f"(CASE {strata_col} {whens} ELSE NULL END)"
    return f"""
SELECT doc_id, {strata_col} FROM {table}
WHERE {case} IS NOT NULL AND {_sample_u_sql(seed_tag)} < {case}
"""


def split_train_holdout_sql(holdout_fraction: float = 0.1,
                            seed_tag: str = "split",
                            table: str = "documents") -> str:
    return f"""
SELECT doc_id,
       CASE WHEN {_sample_u_sql(seed_tag)} < {float(holdout_fraction)!r}
            THEN 'holdout' ELSE 'train' END AS split
FROM {table}
"""


def contamination_sql(holdout_fraction: float = dd.CONTAM_HOLDOUT,
                      k: int = dd.CONTAM_K, seed_tag: str = "split",
                      table: str = "documents") -> str:
    """Mirrors operators/dedup.py::contamination — word k-gram overlap
    between the deterministic train and holdout splits."""
    return f"""
WITH norm AS (
  SELECT doc_id,
         CASE WHEN {_sample_u_sql(seed_tag)} < {float(holdout_fraction)!r}
              THEN 'holdout' ELSE 'train' END AS split,
         string_split(regexp_replace(lower(trim(text)), '{WS_SPLIT}', ' ', 'g'), ' ') AS toks
  FROM {table} WHERE trim(text) <> ''
),
sh AS (
  SELECT DISTINCT doc_id, split,
         CASE WHEN len(toks) <= {k} THEN array_to_string(toks, ' ')
              ELSE array_to_string(list_slice(toks, i + 1, i + {k}), ' ') END AS shingle
  FROM norm, unnest(range(0, greatest(len(toks) - {k}, 0) + 1)) AS t(i)
),
hits AS (
  SELECT a.doc_id, a.shingle, b.doc_id AS holdout_id
  FROM sh a JOIN sh b ON a.shingle = b.shingle
  WHERE a.split = 'train' AND b.split = 'holdout'
)
SELECT doc_id,
       count(*)::BIGINT AS n_hits,
       count(DISTINCT shingle)::BIGINT AS n_shingles,
       count(DISTINCT holdout_id)::BIGINT AS n_holdout_docs
FROM hits GROUP BY doc_id
ORDER BY n_hits DESC, doc_id ASC
"""


# -------------------------------------------------------------- embeddings

COS_SQL = "list_cosine_similarity({a}::DOUBLE[], {b}::DOUBLE[])"


def embedding_near_pairs_sql(threshold: float = 0.95,
                             table: str = "embeddings") -> str:
    cos = COS_SQL.format(a="a.embedding", b="b.embedding")
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, round({cos}, 4) AS cos
FROM {table} a JOIN {table} b ON a.vec_id < b.vec_id
WHERE round({cos}, 4) >= {threshold}
"""


def embedding_near_pairs_lsh_sql(threshold: float = 0.95,
                                 table: str = "embeddings") -> str:
    """Banded LSH near-dup: pairs share any of the 4×4-bit sign bands."""
    cos = COS_SQL.format(a="a.embedding", b="b.embedding")
    n = dd.EMB_BANDS * dd.EMB_BAND_PLANES
    r = dd.EMB_BAND_PLANES
    return f"""
WITH sigs AS (
  SELECT vec_id, embedding, {_sig_sql('embedding', n)} AS sig FROM {table}
),
banded AS (
  SELECT vec_id, embedding, band,
         substr(sig, band * {r} + 1, {r}) AS key
  FROM sigs, unnest(range(0, {dd.EMB_BANDS})) AS b(band)
),
pairs AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
         a.embedding AS ea, b.embedding AS eb
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b,
       round({COS_SQL.format(a='ea', b='eb')}, 4) AS cos
FROM pairs
WHERE round({COS_SQL.format(a='ea', b='eb')}, 4) >= {threshold}
"""


def _ids_in(ids: list[int]) -> str:
    return "(" + ", ".join(str(i) for i in ids) + ")"


def ann_bruteforce_sql(query_ids: list[int], k: int = 5,
                       table: str = "embeddings") -> str:
    cos = COS_SQL.format(a="q.embedding", b="c.embedding")
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM {table}
           WHERE vec_id IN {_ids_in(query_ids)}),
scored AS (
  SELECT q.query_id, c.vec_id, round({cos}, 4) AS cos
  FROM q JOIN {table} c ON c.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cos, rank::INT AS rank FROM ranked WHERE rank <= {k}
"""


def ann_filtered_sql(query_ids: list[int], labels: list[int], k: int = 5,
                     table: str = "embeddings") -> str:
    """Filtered vector search — mirrors operators/similarity.py::
    ann_filtered: exact cosine top-k among label-allowed candidates
    (pre-filter semantics), queries looked up in the full table."""
    cos = COS_SQL.format(a="q.embedding", b="c.embedding")
    labels_in = "(" + ", ".join(str(x) for x in labels) + ")"
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM {table}
           WHERE vec_id IN {_ids_in(query_ids)}),
scored AS (
  SELECT q.query_id, c.vec_id, round({cos}, 4) AS cos, c.label
  FROM q JOIN {table} c ON c.vec_id <> q.query_id
  WHERE c.label IN {labels_in}
),
ranked AS (
  SELECT query_id, vec_id, cos, label,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cos, rank::INT AS rank, label
FROM ranked WHERE rank <= {k}
"""


def _sq8_cte(table: str = "embeddings") -> str:
    """Shared CTEs for int8 scalar quantization — mirrors
    similarity.py::sq8_bounds/sq8_encode (per-dim float min/max bounds,
    floor-scaled 0..255 codes, constant dims → 0)."""
    dim, lv = sim.EMB_DIM, sim.SQ_LEVELS
    return f"""
b AS (
  SELECT d.dim::INT AS dim,
         min(e.embedding[d.dim+1])::DOUBLE AS lo,
         max(e.embedding[d.dim+1])::DOUBLE AS hi
  FROM {table} e, LATERAL unnest(generate_series(0, {dim - 1})) d(dim)
  GROUP BY 1
),
sqcodes AS (
  SELECT e.vec_id, b.dim,
         CASE WHEN b.hi > b.lo THEN
           greatest(0,
                    least({lv - 1},
                          floor((e.embedding[b.dim+1]::DOUBLE - b.lo)
                                / (b.hi - b.lo) * {lv})))::INT
         ELSE 0 END AS code
  FROM {table} e, b
)"""


def sq8_codes_sql(table: str = "embeddings") -> str:
    """int8 scalar quantization codes — mirrors similarity.py::sq8_encode
    (contract query emits the exploded (vec_id, dim, code) view)."""
    return f"""
WITH {_sq8_cte(table)}
SELECT vec_id, dim, code FROM sqcodes
"""


def ann_sq8_sql(query_ids: list[int], k: int = 5,
                rerank: int | None = None,
                table: str = "embeddings") -> str:
    """Two-stage quantized ANN — mirrors similarity.py::ann_sq8: approx
    cosine on midpoint-dequantized codes picks `rerank` survivors, exact
    float cosine re-ranks to top-k."""
    rerank = rerank or sim.SQ_RERANK
    lv = sim.SQ_LEVELS
    acos = COS_SQL.format(a="q.qe", b="d.deq")
    ecos = COS_SQL.format(a="q.qe", b="e.embedding")
    return f"""
WITH {_sq8_cte(table)},
deqd AS (
  SELECT c.vec_id, c.dim,
         b.lo + (c.code + 0.5) * (b.hi - b.lo) / {lv} AS dv
  FROM sqcodes c JOIN b USING (dim)
),
deqv AS (
  SELECT vec_id, list(dv ORDER BY dim) AS deq FROM deqd GROUP BY vec_id
),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM {table}
      WHERE vec_id IN {_ids_in(query_ids)}),
approx AS (
  SELECT q.query_id, d.vec_id, round({acos}, 4) AS acos
  FROM deqv d, q WHERE d.vec_id <> q.query_id
),
surv AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY acos DESC, vec_id ASC) AS arank
    FROM approx
  ) WHERE arank <= {rerank}
),
exact AS (
  SELECT s.query_id, s.vec_id, round({ecos}, 4) AS cos
  FROM surv s
  JOIN {table} e ON e.vec_id = s.vec_id
  JOIN q ON q.query_id = s.query_id
)
SELECT query_id, vec_id, cos, rank::INT AS rank FROM (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS rank
  FROM exact
) WHERE rank <= {k}
"""


def search_hybrid_rrf_sql(query_terms: list[str], query_vec_id: int,
                          k_each: int = 20, rrf_k: int = 60,
                          limit: int = 10, k1: float = 1.2,
                          b: float = 0.75) -> str:
    """Mirrors operators/search.py::search_hybrid_rrf — lexical BM25 top-k
    and vector-cosine top-k fused by Reciprocal Rank Fusion. Absent ranks
    surface as 0 and contribute nothing; ties break by doc_id asc."""
    from .oracle_fragments import bm25_scored_ctes, terms_cte as tc

    cos = COS_SQL.format(a="c.embedding", b="q.embedding")
    return f"""
WITH {tc("documents")},
{bm25_scored_ctes(query_terms, k1, b, "documents").lstrip()},
lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY round(score, 4) DESC,
                                    doc_id ASC) AS lex_rank
  FROM scored QUALIFY lex_rank <= {int(k_each)}
),
q AS (SELECT embedding FROM embeddings WHERE vec_id = {int(query_vec_id)}),
vec0 AS (
  SELECT c.vec_id AS doc_id, round({cos}, 4) AS cos
  FROM embeddings c CROSS JOIN q WHERE c.vec_id <> {int(query_vec_id)}
),
vec AS (
  SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id ASC)
           AS vec_rank
  FROM vec0 QUALIFY vec_rank <= {int(k_each)}
),
fused AS (
  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
         coalesce(l.lex_rank, 0)::INT AS lex_rank,
         coalesce(v.vec_rank, 0)::INT AS vec_rank,
         round(coalesce(1.0 / ({int(rrf_k)} + l.lex_rank), 0)
               + coalesce(1.0 / ({int(rrf_k)} + v.vec_rank), 0), 6) AS rrf
  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
)
SELECT doc_id, lex_rank, vec_rank, rrf
FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT {int(limit)}
"""


def search_semantic_rerank_sql(query_terms: list[str], query_vec_id: int,
                               candidates: int = 50, limit: int = 10,
                               k1: float = 1.2, b: float = 0.75) -> str:
    """Mirrors operators/search.py::search_semantic_rerank — disjunctive
    BM25 top-`candidates`, rescored by embedding cosine, semantic
    top-`limit` (cos desc, doc_id asc ties)."""
    from .oracle_fragments import bm25_scored_ctes, terms_cte as tc

    cos = COS_SQL.format(a="c.embedding", b="q.embedding")
    return f"""
WITH {tc("documents")},
{bm25_scored_ctes(query_terms, k1, b, "documents").lstrip()},
lex AS (
  SELECT doc_id, round(score, 4) AS bm25,
         row_number() OVER (ORDER BY round(score, 4) DESC,
                            doc_id ASC) AS lrank
  FROM scored QUALIFY lrank <= {int(candidates)}
),
q AS (SELECT embedding FROM embeddings WHERE vec_id = {int(query_vec_id)}),
resc AS (
  SELECT l.doc_id, l.bm25, round({cos}, 4) AS cos
  FROM lex l JOIN embeddings c ON c.vec_id = l.doc_id CROSS JOIN q
)
SELECT doc_id, bm25, cos, rank::INT AS rank FROM (
  SELECT doc_id, bm25, cos,
         row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS rank
  FROM resc
) WHERE rank <= {int(limit)}
"""


def _export_ctes(n_shards: int, table: str) -> str:
    """Shared CTE chain for the export-shard oracles — the naive global
    ordered window IS the oracle here (fine in DuckDB at gate scale; the
    Spark side is the hierarchical scan, operators/export.py)."""
    from ..operators import textstats as ts

    bpe = ts.BPE_SPLIT.replace("'", "''")
    n = int(n_shards)
    return f"""
w AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{bpe}'))::BIGINT AS n_tokens
  FROM {table}
),
c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS cum_before,
         (sum(n_tokens) OVER ())::BIGINT AS total
  FROM w
),
assigned AS (
  SELECT doc_id, n_tokens,
         least(cum_before // greatest((total + {n} - 1) // {n}, 1),
               {n} - 1)::INT AS shard
  FROM c
)"""


def export_shards_sql(n_shards: int = 16, table: str = "documents") -> str:
    """Mirrors operators/export.py::token_balanced_shards (pinned spec in
    that module's docstring; integer-exact, so value-hash identical)."""
    return f"""
WITH {_export_ctes(n_shards, table)}
SELECT doc_id, n_tokens, shard FROM assigned
"""


def pack_sequences_sql(cap: int = 512, buckets: int = 64,
                       table: str = "documents") -> str:
    """Mirrors operators/export.py::pack_sequences — the greedy
    fill-with-reset recurrence replayed as a recursive CTE (breadth-first:
    every bucket advances one row per iteration)."""
    from ..operators import textstats as ts

    bpe = ts.BPE_SPLIT.replace("'", "''")
    c = int(cap)
    return f"""
WITH RECURSIVE w AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{bpe}'))::BIGINT AS n_tokens
  FROM {table}
),
b AS (
  SELECT doc_id, n_tokens,
         doc_id // ((SELECT max(doc_id) FROM {table}) // {int(buckets)} + 1)
           AS bucket
  FROM w
),
seq AS (
  SELECT doc_id, n_tokens, bucket,
         row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
  FROM b
),
r AS (
  SELECT bucket, rn, doc_id, n_tokens,
         n_tokens AS fill, 0::BIGINT AS example_id
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT n.bucket, n.rn, n.doc_id, n.n_tokens,
         CASE WHEN r.fill + n.n_tokens > {c}
              THEN n.n_tokens ELSE r.fill + n.n_tokens END,
         CASE WHEN r.fill + n.n_tokens > {c}
              THEN r.example_id + 1 ELSE r.example_id END
  FROM r JOIN seq n ON n.bucket = r.bucket AND n.rn = r.rn + 1
)
SELECT doc_id, n_tokens, bucket, example_id FROM r
"""


def export_manifest_sql(n_shards: int = 16,
                        table: str = "documents") -> str:
    """Mirrors operators/export.py::shard_manifest."""
    return f"""
WITH {_export_ctes(n_shards, table)}
SELECT shard, count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM assigned GROUP BY shard
"""


def chunk_documents_sql(chunk_size: int = 32, overlap: int = 8,
                        table: str = "documents") -> str:
    """Mirrors operators/export.py::chunk_documents — sliding token
    windows, stride = chunk_size - overlap, no pure-suffix runts."""
    stride = chunk_size - overlap
    return f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN text IS NULL OR trim(text) = '' THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '{WS_SPLIT}') END AS tk
  FROM {table}
),
n AS (SELECT doc_id, tk, len(tk) AS n_tok FROM t),
k AS (
  SELECT doc_id, tk, n_tok,
         unnest(range(0, CASE WHEN n_tok <= 0 THEN 0
                              ELSE 1 + greatest((n_tok - {overlap} - 1)
                                                // {stride}, 0) END)) AS k
  FROM n
)
SELECT doc_id, k::BIGINT AS chunk_id, (k * {stride})::BIGINT AS start_tok,
       len(tk[k * {stride} + 1 : k * {stride} + {chunk_size}])::BIGINT
         AS n_tokens,
       array_to_string(tk[k * {stride} + 1 : k * {stride} + {chunk_size}],
                       ' ') AS chunk_text
FROM k
"""


def hll_vocab_sql(table: str = "documents") -> str:
    """Mirrors operators/sketches.py::hll_distinct over per-site terms —
    the SAME h60-derived registers and fixed-point estimator, so the
    approximate count is value-hash exact across engines."""
    from ..operators import sketches as sk

    h = h60_sql("term")
    w1, m, s = sk.HLL_W1, sk.HLL_M, sk.HLL_SCALE
    num = repr(sk.HLL_ALPHA * m * m * float(s))
    return f"""
WITH {terms_cte(table)},
keys AS (
  SELECT {SITE_KEY_SQL} AS site_key, {h} AS h FROM terms
),
regs AS (
  SELECT site_key, (h & {m - 1}) AS idx,
         max(CASE WHEN (h >> 8) = 0 THEN {w1}
                  ELSE {w1} - length(bin(h >> 8)) END)::INT AS m_j
  FROM keys GROUP BY 1, 2
),
agg AS (
  SELECT site_key,
         sum(1::BIGINT << ({w1} - m_j))::BIGINT AS sum_present,
         count(*)::BIGINT AS n_present
  FROM regs GROUP BY site_key
),
raw AS (
  SELECT site_key,
         {num} / (sum_present + ({m} - n_present) * {s})::DOUBLE AS e_raw,
         ({m} - n_present)::DOUBLE AS v
  FROM agg
)
SELECT site_key,
       round(CASE WHEN e_raw <= {2.5 * m} AND v > 0
                  THEN {float(m)} * ln({float(m)} / v)
                  ELSE e_raw END, 4) AS est_distinct
FROM raw
"""


def cm_heavy_hitters_sql(k: int = 20, table: str = "documents") -> str:
    """Mirrors operators/sketches.py::cm_heavy_hitters — d×w count-min
    cells from the re-hash family h60('j:' || term), estimate = min cell."""
    from ..operators import sketches as sk

    d, w = sk.CM_D, sk.CM_W
    js = ", ".join(str(j) for j in range(d))
    h_cell = h60_sql("(r.j::VARCHAR || ':' || tf.term)")
    h_probe = h60_sql("(r.j::VARCHAR || ':' || t.term)")
    return f"""
WITH {terms_cte(table)},
tf AS (SELECT term, count(*)::BIGINT AS tf FROM terms GROUP BY term),
cells AS (
  SELECT r.j, ({h_cell} & {w - 1}) AS col, sum(tf.tf)::BIGINT AS cnt
  FROM tf CROSS JOIN (SELECT unnest([{js}]) AS j) r
  GROUP BY 1, 2
),
est AS (
  SELECT t.term, min(coalesce(c.cnt, 0))::BIGINT AS cm_est
  FROM tf t CROSS JOIN (SELECT unnest([{js}]) AS j) r
  LEFT JOIN cells c ON c.j = r.j AND c.col = ({h_probe} & {w - 1})
  GROUP BY t.term
)
SELECT term, cm_est FROM est ORDER BY cm_est DESC, term ASC LIMIT {int(k)}
"""


def _plane_literal(j: int) -> str:
    vals = ", ".join(repr(v) for v in sim.hyperplane(j))
    return f"[{vals}]::DOUBLE[]"


def _sig_sql(col: str, n_planes: int | None = None) -> str:
    bits = " || ".join(
        f"(CASE WHEN list_dot_product({col}::DOUBLE[], {_plane_literal(j)}) > 0 "
        f"THEN '1' ELSE '0' END)"
        for j in range(n_planes or sim.N_PLANES)
    )
    return f"({bits})"


def lsh_buckets_sql(table: str = "embeddings") -> str:
    return f"SELECT vec_id, {_sig_sql('embedding')} AS sig FROM {table}"


def ann_lsh_sql(query_ids: list[int], k: int = 5,
                table: str = "embeddings") -> str:
    cos = COS_SQL.format(a="q.embedding", b="c.embedding")
    return f"""
WITH sigs AS (
  SELECT vec_id, embedding, {_sig_sql('embedding')} AS sig FROM {table}
),
q AS (SELECT vec_id AS query_id, embedding, sig AS qsig FROM sigs
      WHERE vec_id IN {_ids_in(query_ids)}),
scored AS (
  SELECT q.query_id, c.vec_id, round({cos}, 4) AS cos
  FROM q JOIN sigs c ON c.sig = q.qsig AND c.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cos, rank::INT AS rank FROM ranked WHERE rank <= {k}
"""


def _centroids_cte(table: str, n_centroids: int | None) -> str:
    """n_centroids=None mirrors similarity.adaptive_n_centroids: the
    K = greatest(16, ceil(sqrt(n))) smallest vec_ids. Computed inside
    the CTE (count(*) OVER ()) so one static SQL string is correct at
    every scale the driver runs it at."""
    if n_centroids is None:
        return (
            "cent AS (SELECT vec_id AS centroid_id, embedding AS cvec FROM ("
            f"SELECT vec_id, embedding, row_number() OVER (ORDER BY vec_id) AS rn, "
            f"count(*) OVER () AS n FROM {table}) "
            "WHERE rn <= greatest(16, CAST(ceil(sqrt(n)) AS BIGINT)))"
        )
    return (f"cent AS (SELECT vec_id AS centroid_id, embedding AS cvec "
            f"FROM {table} ORDER BY vec_id LIMIT {n_centroids})")


def ivf_assign_sql(n_centroids: int | None = None, table: str = "embeddings") -> str:
    """Mirrors operators/similarity.py::ivf_assign — nearest-centroid
    assignment (cos rounded 4 dp, ties -> smallest centroid_id)."""
    cos = COS_SQL.format(a="e.embedding", b="c.cvec")
    return f"""
WITH {_centroids_cte(table, n_centroids)},
scored AS (
  SELECT e.vec_id, c.centroid_id, round({cos}, 4) AS cos,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round({cos}, 4) DESC,
                                     c.centroid_id ASC) AS rn
  FROM {table} e CROSS JOIN cent c
)
SELECT vec_id, centroid_id, cos FROM scored WHERE rn = 1
"""


def ann_ivf_sql(query_ids: list[int], k: int = 5, n_centroids: int | None = None,
                nprobe: int = 4, table: str = "embeddings") -> str:
    """Mirrors operators/similarity.py::ann_ivf — IVF-flat probe of the
    nprobe nearest inverted lists, exact-cosine re-rank."""
    cos_a = COS_SQL.format(a="e.embedding", b="c.cvec")
    cos_q = COS_SQL.format(a="q.qe", b="c.cvec")
    cos_f = COS_SQL.format(a="p.qe", b="a.embedding")
    return f"""
WITH {_centroids_cte(table, n_centroids)},
assign AS (
  SELECT vec_id, centroid_id, embedding FROM (
    SELECT e.vec_id, c.centroid_id, e.embedding,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY round({cos_a}, 4) DESC,
                                       c.centroid_id ASC) AS rn
    FROM {table} e CROSS JOIN cent c) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM {table}
      WHERE vec_id IN {_ids_in(query_ids)}),
probes AS (
  SELECT query_id, qe, centroid_id FROM (
    SELECT q.query_id, q.qe, c.centroid_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY round({cos_q}, 4) DESC,
                                       c.centroid_id ASC) AS rn
    FROM q CROSS JOIN cent c) WHERE rn <= {nprobe}
),
scored AS (
  SELECT p.query_id, a.vec_id, round({cos_f}, 4) AS cos
  FROM probes p JOIN assign a USING (centroid_id)
  WHERE a.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cos, rank::INT AS rank FROM ranked WHERE rank <= {k}
"""


def knn_graph_sql(k: int = 5, n_centroids: int | None = None,
                  table: str = "embeddings") -> str:
    """Mirrors operators/similarity.py::knn_graph — top-k cosine neighbors
    within each IVF cell (ties -> smallest nbr_id)."""
    cos_a = COS_SQL.format(a="e.embedding", b="c.cvec")
    cos_p = COS_SQL.format(a="a.embedding", b="b.embedding")
    return f"""
WITH {_centroids_cte(table, n_centroids)},
assign AS (
  SELECT vec_id, centroid_id, embedding FROM (
    SELECT e.vec_id, c.centroid_id, e.embedding,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY round({cos_a}, 4) DESC,
                                       c.centroid_id ASC) AS rn
    FROM {table} e CROSS JOIN cent c) WHERE rn = 1
),
scored AS (
  SELECT a.vec_id, b.vec_id AS nbr_id, round({cos_p}, 4) AS cos
  FROM assign a JOIN assign b USING (centroid_id)
  WHERE b.vec_id <> a.vec_id
),
ranked AS (
  SELECT vec_id, nbr_id, cos,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos DESC, nbr_id ASC) AS rank
  FROM scored
)
SELECT vec_id, nbr_id, cos, rank::INT AS rank FROM ranked WHERE rank <= {k}
"""


def semdedup_sql(threshold: float, n_centroids: int | None = None,
                 table: str = "embeddings") -> str:
    """Mirrors operators/similarity.py::semdedup — drop a vector when its
    IVF cell holds a near-duplicate (cos >= threshold) with smaller id."""
    cos_a = COS_SQL.format(a="e.embedding", b="c.cvec")
    cos_p = COS_SQL.format(a="a.embedding", b="b.embedding")
    return f"""
WITH {_centroids_cte(table, n_centroids)},
assign AS (
  SELECT vec_id, centroid_id, embedding FROM (
    SELECT e.vec_id, c.centroid_id, e.embedding,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY round({cos_a}, 4) DESC,
                                       c.centroid_id ASC) AS rn
    FROM {table} e CROSS JOIN cent c) WHERE rn = 1
),
dup AS (
  SELECT DISTINCT a.vec_id
  FROM assign a JOIN assign b USING (centroid_id)
  WHERE b.vec_id < a.vec_id AND round({cos_p}, 4) >= {threshold}
)
SELECT e.vec_id, (d.vec_id IS NULL) AS keep
FROM {table} e LEFT JOIN dup d USING (vec_id)
"""


# -------------------------------------------------------------- multimodal

HTML_SQL = (
    "('<html><head><title>Doc ' || doc_id || "
    "'</title><script>var x=1;</script></head><body><p>' || text || "
    "'</p></body></html>')"
)


def media_stats_sql(table: str = "documents") -> str:
    return f"""
WITH m AS (SELECT doc_id, {HTML_SQL} AS s FROM {table})
SELECT doc_id,
       octet_length(encode(s))::BIGINT AS n_bytes,
       lower(substr(hex(encode(s)), 1, 8)) AS magic,
       md5(s) AS content_md5
FROM m
"""


def frame_sample_sql(table: str = "documents") -> str:
    """Mirrors operators/multimodal.py::frame_sample. Byte-exact for ANY
    payload: the slice runs over hex(encode(s)) — 2 hex chars per byte,
    uppercase in both engines — and md5 hashes that ASCII string, so
    non-UTF-8 frame boundaries cannot diverge (DuckDB md5 is
    VARCHAR-only; hashing raw bytes was the adversarial-corpus bug)."""
    from ..operators import multimodal as mm

    fs, k = mm.FRAME_SIZE, mm.FRAME_SAMPLES
    return f"""
WITH m AS (SELECT doc_id, hex(encode({HTML_SQL})) AS hx FROM {table}),
base AS (
  SELECT doc_id, hx, (length(hx) // {2 * fs})::BIGINT AS nf
  FROM m WHERE length(hx) >= {2 * fs}
),
sampled AS (
  SELECT DISTINCT doc_id, hx, ((j * nf) // {k})::BIGINT AS frame_idx
  FROM base, unnest(range(0, {k})) AS u(j)
)
SELECT doc_id, frame_idx, (frame_idx * {fs})::BIGINT AS byte_offset,
       md5(substring(hx, (frame_idx * {2 * fs} + 1)::BIGINT, {2 * fs}))
         AS frame_md5
FROM sampled
"""


def media_features_sql(table: str = "documents") -> str:
    return f"""
WITH m AS (SELECT doc_id, {HTML_SQL} AS s FROM {table}),
d AS (SELECT doc_id, octet_length(encode(s)) AS n_bytes, md5(s) AS digest FROM m)
SELECT doc_id, n_bytes::BIGINT AS n_bytes, digest AS feat_hash,
       ('0x' || substr(digest, 1, 8))::BIGINT AS feat0,
       ('0x' || substr(digest, 9, 8))::BIGINT AS feat1
FROM d
"""


def image_features_sql(table: str = "documents") -> str:
    """Mirrors operators/multimodal.py::image_pixel_features over
    synth_png_images: the oracle computes the pixel statistics straight
    from the shared deterministic pixel law (doc d → (8+d%5)×(8+d%3)
    grayscale, pixel i = (d·7919 + i) mod 256) — the Spark side must
    reproduce them through a REAL PNG encode→decode round-trip (cycling
    row filters), so any codec bug breaks value-hash parity. avg over
    ≤120 int pixels is an exact integer sum / count in float64 — the
    4-dp rounding matches bit-for-bit."""
    from ..operators import multimodal as mm

    p = mm.PIXEL_PRIME
    return f"""
WITH dims AS (
  SELECT doc_id, (8 + doc_id % 5)::BIGINT AS w, (8 + doc_id % 3)::BIGINT AS h
  FROM {table}
),
px AS (
  SELECT doc_id, w, h, ((doc_id * {p} + t.i) % 256)::BIGINT AS v
  FROM dims CROSS JOIN range(0, 200) t(i)
  WHERE t.i < w * h
)
SELECT doc_id, w::INT AS width, h::INT AS height, 1::INT AS channels,
       round(sum(v)::DOUBLE / count(*), 4) AS mean_px,
       min(v)::INT AS min_px, max(v)::INT AS max_px
FROM px GROUP BY doc_id, w, h
"""


# ----------------------------------------------------------------- events

def events_windowed_sql(table: str = "events") -> str:
    """Tumbling 1-hour window = date_trunc('hour') for hour-aligned
    windows (Spark F.window('1 hour') starts align to the epoch hour)."""
    return f"""
SELECT date_trunc('hour', ts) AS win_start, event_type,
       count(*)::BIGINT AS n,
       sum(value::DECIMAL(18,2))::DECIMAL(18,2)::DOUBLE AS sum_value
FROM {table} GROUP BY 1, 2
"""


def events_sessionize_sql(gap_min: int = 30, table: str = "events") -> str:
    return f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_min * 60 * 1000000}
              THEN 1
              WHEN lag(ts) OVER w IS NULL THEN 1
              ELSE 0 END AS new_session
  FROM {table}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
ids AS (
  SELECT user_id, ts, sum(new_session) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
  FROM flagged
)
SELECT user_id, session_id::BIGINT AS session_id,
       count(*)::BIGINT AS n_events,
       min(ts) AS start_ts, max(ts) AS end_ts
FROM ids GROUP BY user_id, session_id
"""


def events_props_sql(table: str = "events") -> str:
    return f"""
SELECT event_id, json_extract(props, '$.k')::INT AS k FROM {table}
"""


def events_rollup_sql(table: str = "events") -> str:
    return f"""
SELECT date_trunc('day', ts) AS day, event_type,
       count(*)::BIGINT AS n,
       count(DISTINCT user_id)::BIGINT AS users,
       sum(value::DECIMAL(18,2))::DECIMAL(18,2)::DOUBLE AS sum_value
FROM {table} GROUP BY 1, 2
"""


# -------------------------------------------------------------- relational

DEC2 = "::DECIMAL(18,2)"


def pricing_summary_sql() -> str:
    return f"""
SELECT l_returnflag, l_linestatus,
       sum(l_quantity{DEC2}){DEC2}::DOUBLE AS sum_qty,
       sum(l_extendedprice{DEC2}){DEC2}::DOUBLE AS sum_base_price,
       count(*)::BIGINT AS count_order
FROM lineitem WHERE l_shipdate <= '2024-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def revenue_by_nation_sql() -> str:
    return f"""
SELECT n_name,
       sum((l_extendedprice{DEC2} * (1{DEC2} - l_discount{DEC2}))::DECIMAL(18,4))
         ::DECIMAL(18,4)::DOUBLE AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def customers_with_orders_sql() -> str:
    return """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
"""


def customers_without_orders_sql() -> str:
    return """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


def order_ranks_sql() -> str:
    return f"""
SELECT o_custkey, o_orderkey,
       (row_number() OVER w)::INT AS order_seq,
       (sum(o_totalprice{DEC2}) OVER w){DEC2}::DOUBLE AS running_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def status_rollup_sql() -> str:
    return """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*)::BIGINT AS n
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def top_parts_sql() -> str:
    return """
WITH ranked AS (
  SELECT p_brand, p_partkey, p_retailprice::DOUBLE AS price,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey ASC) AS rk
  FROM part
)
SELECT p_brand, p_partkey, price, rk::INT AS rk FROM ranked WHERE rk <= 3
"""

# ---------------------------------------------------------------- curation


def latest_revisions_sql(table: str = "documents") -> str:
    """Newest revision per logical page — mirrors
    operators/curation.py::latest_revisions over with_page_key. The oracle
    states the spec naively (window row_number); the engine's max_by agg
    must produce the identical winner set."""
    return f"""
WITH revs AS (
  SELECT doc_id, doc_id % {cu.PAGE_KEY_MOD} AS page_key,
         1704067200 + 60 * doc_id AS warc_epoch
  FROM {table}
),
ranked AS (
  SELECT page_key, doc_id, warc_epoch,
         count(*) OVER (PARTITION BY page_key) AS n_revisions,
         row_number() OVER (PARTITION BY page_key
                            ORDER BY warc_epoch DESC, doc_id DESC) AS rn
  FROM revs
)
SELECT page_key, n_revisions::BIGINT AS n_revisions, doc_id, warc_epoch
FROM ranked WHERE rn = 1
"""


def line_dedup_sql(width: int = cu.LINE_WIDTH, table: str = "documents") -> str:
    """CCNet-style corpus-wide duplicated-line removal, first occurrence
    (doc_id, line_no) wins — mirrors curation.py::doc_lines +
    remove_duplicated_lines bit-for-bit (same pinned WS_SPLIT class, same
    chunk slicing, first-wins on the h60 line hash)."""
    lh = h60_sql("line")
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '{cu.LINE_WS}') AS tk
  FROM {table}
),
lines0 AS (
  SELECT doc_id, r.i AS line_no,
         array_to_string(tk[(r.i*{width}+1):((r.i+1)*{width})], ' ') AS line
  FROM toks, LATERAL unnest(
    generate_series(0, CAST(ceil(len(tk)/{width}.0) AS BIGINT) - 1)) AS r(i)
),
occ AS (
  SELECT doc_id, line_no, line,
         row_number() OVER (PARTITION BY {lh}
                            ORDER BY doc_id, line_no) AS rn
  FROM lines0 WHERE line <> ''
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN rn = 1 THEN line END, chr(10)
                           ORDER BY line_no), '') AS clean_text,
       count(*) FILTER (WHERE rn = 1)::BIGINT AS n_kept,
       count(*) FILTER (WHERE rn <> 1)::BIGINT AS n_dropped
FROM occ GROUP BY doc_id
"""


def _pii_augmented_sql() -> str:
    """Mirror of curation.py::pii_augment (deterministic injected PII)."""
    return (
        "(text"
        f" || CASE WHEN doc_id % {cu.PII_EMAIL_MOD} = 0 THEN"
        " ' contact user' || doc_id || '@example.com' ELSE '' END"
        f" || CASE WHEN doc_id % {cu.PII_IP_MOD} = 0 THEN"
        " ' from 10.' || (doc_id % 250) || '.0.' || (doc_id % 200) ELSE '' END"
        f" || CASE WHEN doc_id % {cu.PII_PHONE_MOD} = 0 THEN"
        " ' call +7915' || lpad((doc_id % 10000)::VARCHAR, 6, '0') ELSE '' END)"
    )


def pii_redact_sql(table: str = "documents") -> str:
    """Counts + sequential class redaction — mirrors
    curation.py::redact_pii over pii_augment. Patterns come verbatim from
    cu.PII_PATTERNS (RE2 ∩ Java subset); 'g' flag matches Spark's
    replace-all regexp_replace."""
    red = _pii_augmented_sql()
    count_exprs = []
    for k in cu.PII_ORDER:
        # count on the text AFTER the previous classes were redacted
        # (mirrors curation.py::redact_pii exactly)
        count_exprs.append(
            f"len(regexp_extract_all({red}, '{cu.PII_PATTERNS[k]}'))::INT"
            f" AS n_{k}"
        )
        red = (
            f"regexp_replace({red}, '{cu.PII_PATTERNS[k]}',"
            f" '<{k.upper()}>', 'g')"
        )
    counts = ", ".join(count_exprs)
    return f"""
SELECT doc_id, {counts}, {red} AS redacted
FROM {table}
"""


def domain_stats_sql(table: str = "documents") -> str:
    """Per-site curation rollup — mirrors curation.py::domain_stats over
    the derived site_key/http_code/warc_ts columns."""
    ntok = (
        f"(CASE WHEN trim(text) = '' THEN 0"
        f" ELSE len(string_split_regex(trim(text), '{cu.LINE_WS}')) END)"
    )
    return f"""
SELECT {SITE_KEY_SQL} AS site_key,
       count(*)::BIGINT AS n_docs,
       sum(({PARSEABLE_SQL})::INT)::BIGINT AS n_parseable,
       sum({ntok})::BIGINT AS total_tokens,
       round(avg({ntok}), 4) AS avg_doc_tokens,
       count(DISTINCT lang)::BIGINT AS n_langs,
       max(1704067200 + 60 * doc_id)::BIGINT AS latest_crawl
FROM {table} GROUP BY 1
"""

# ------------------------------------------------------------------- graph

_EDGE_CTE = """
edges0 AS (
  SELECT doc_id AS src, t.dst
  FROM {table}, LATERAL unnest([doc_id + 1, doc_id // 2]) AS t(dst)
  WHERE t.dst <> doc_id
)"""


def link_extract_sql(table: str = "documents") -> str:
    """S3 href extraction over linked_html — mirrors
    operators/graph.py::linked_html + extract_links. The oracle derives
    the SAME links arithmetically (the fixture anchors are deterministic
    functions of doc_id), so the engine's regexp path must reproduce them
    value-for-value."""
    return f"""
WITH {_EDGE_CTE.format(table=table)}
SELECT src AS src_doc,
       'https://site-' || chr(97 + (dst % 3)::INT) || '.example/docs/' || dst
         AS dst_url,
       dst AS dst_doc
FROM edges0
"""


def pagerank_sql(
    n_iter: int = gr.PR_ITERS,
    damping: float = gr.PR_DAMPING,
    table: str = "documents",
) -> str:
    """Fixed-iteration PageRank, unrolled as a CTE chain — mirrors
    graph.py::pagerank (same float literals via repr(), same
    no-dangling-redistribution semantics, N-scaled 4 dp output)."""
    d = repr(damping)
    base = repr(1.0 - damping)
    ctes = [
        f"nodes AS (SELECT doc_id FROM {table})",
        "meta AS (SELECT count(*)::DOUBLE AS n FROM nodes)",
        _EDGE_CTE.format(table=table).strip(),
        "edges AS (SELECT src, dst FROM edges0 WHERE dst IN (SELECT doc_id FROM nodes))",
        "deg AS (SELECT src, count(*)::DOUBLE AS outdeg FROM edges GROUP BY src)",
        "e AS (SELECT edges.src, edges.dst, deg.outdeg FROM edges JOIN deg USING (src))",
        "r0 AS (SELECT doc_id, 1.0 / meta.n AS rank FROM nodes, meta)",
    ]
    for i in range(n_iter):
        ctes.append(
            f"c{i+1} AS (SELECT dst, sum(rank / outdeg) AS s"
            f" FROM e JOIN r{i} ON r{i}.doc_id = e.src GROUP BY dst)"
        )
        ctes.append(
            f"r{i+1} AS (SELECT nodes.doc_id,"
            f" {base} / meta.n + {d} * coalesce(c{i+1}.s, 0.0) AS rank"
            f" FROM nodes CROSS JOIN meta"
            f" LEFT JOIN c{i+1} ON c{i+1}.dst = nodes.doc_id)"
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT doc_id, round(rank * meta.n, 4) AS pr FROM r{n_iter}, meta
"""


def crawl_frontier_sql(per_host: int = 10, table: str = "documents") -> str:
    """Next-crawl-batch with per-host politeness budget — mirrors
    graph.py::frontier_html + extract_links + crawl_frontier (anti-join of
    the harvested outlinks against the crawled set, in-link scoring,
    per-host top-k)."""
    return f"""
WITH f AS (
  SELECT doc_id AS src, t.dst
  FROM {table}, LATERAL unnest(
    CASE WHEN doc_id % {gr.FRONTIER_MOD} = 0
         THEN [doc_id + 1, doc_id // 2,
               1000 + (doc_id * 31) % {gr.FRONTIER_SPACE - 1000}]
         ELSE [doc_id + 1, doc_id // 2] END) AS t(dst)
  WHERE t.dst <> doc_id
),
unseen AS (
  SELECT dst FROM f WHERE dst NOT IN (SELECT doc_id FROM {table})
),
scored AS (
  SELECT 'https://site-' || chr(97 + (dst % 3)::INT) || '.example/docs/' || dst
           AS dst_url,
         'site-' || chr(97 + (dst % 3)::INT) || '.example' AS host,
         count(*)::BIGINT AS n_inlinks
  FROM unseen GROUP BY dst
),
r AS (
  SELECT host, dst_url, n_inlinks,
         row_number() OVER (PARTITION BY host
                            ORDER BY n_inlinks DESC, dst_url ASC) AS rank
  FROM scored
)
SELECT host, dst_url, n_inlinks, rank::INT AS rank
FROM r WHERE rank <= {per_host}
"""


def length_quantiles_sql(table: str = "documents") -> str:
    """Exact per-language token-length quantiles — mirrors
    textstats.py::length_quantiles (quantile_cont == Spark's percentile:
    sort + linear interpolation)."""
    qlist = ", ".join(repr(q) for q in ts.LENGTH_QUANTILES)
    return f"""
WITH n AS (
  SELECT lang,
         (CASE WHEN trim(text) = '' THEN 0
               ELSE len(string_split_regex(trim(text), '{WS_SPLIT}')) END)::BIGINT
           AS n
  FROM {table}
),
p AS (
  SELECT lang, quantile_cont(n, [{qlist}]) AS ps FROM n GROUP BY lang
)
SELECT lang, u.z[1]::DOUBLE AS q, round(u.z[2]::DOUBLE, 4) AS n_tokens
FROM p, LATERAL unnest(list_zip([{qlist}], ps)) AS u(z)
"""


def dl_histogram_sql(table: str = "documents") -> str:
    """Doc-length histogram — mirrors textstats.py::dl_histogram."""
    w = ts.DL_BUCKET_WIDTH
    ntok = (
        f"(CASE WHEN trim(text) = '' THEN 0"
        f" ELSE len(string_split_regex(trim(text), '{WS_SPLIT}')) END)"
    )
    return f"""
WITH b AS (SELECT ({ntok} // {w}) * {w} AS bucket_lo FROM {table}),
t AS (SELECT count(*)::DOUBLE AS t FROM b)
SELECT bucket_lo::BIGINT AS bucket_lo, count(*)::BIGINT AS n_docs,
       round(count(*) / t.t, 4) AS pct
FROM b, t GROUP BY bucket_lo, t.t
"""


def search_authority_sql(query_terms: list[str], weight: float = 0.5,
                         limit: int = 20, table: str = "documents") -> str:
    """BM25 × PageRank blend — mirrors graph.py::blend_authority over
    search_bm25 + pagerank (both already 4 dp, so the blend rounds
    identically in both engines)."""
    from .oracle_fragments import search_bm25_sql

    w = repr(weight)
    wc = repr(1.0 - weight)
    return f"""
WITH hits AS ({search_bm25_sql(query_terms, limit=1_000_000, table=table)}),
pr AS ({pagerank_sql(table=table)})
SELECT hits.doc_id, round(hits.score * ({wc} + {w} * pr.pr), 4) AS score
FROM hits JOIN pr ON pr.doc_id = hits.doc_id
ORDER BY score DESC, hits.doc_id ASC LIMIT {limit}
"""


def crawl_frontier_robots_sql(per_host: int = 10,
                              table: str = "documents") -> str:
    """crawl_frontier with robots Disallow rules applied to the harvested
    links first — mirrors graph.py::robots_filter(extract_links(...))
    feeding crawl_frontier, with gr.ROBOTS_RULES inlined."""
    host_of = "('site-' || chr(97 + (dst % 3)::INT) || '.example')"
    path_of = "('/docs/' || dst)"
    disallow = " OR ".join(
        f"({host_of} = '{h}' AND {path_of} LIKE '{p}%')"
        for h, p in gr.ROBOTS_RULES
    )
    return f"""
WITH f AS (
  SELECT doc_id AS src, t.dst
  FROM {table}, LATERAL unnest(
    CASE WHEN doc_id % {gr.FRONTIER_MOD} = 0
         THEN [doc_id + 1, doc_id // 2,
               1000 + (doc_id * 31) % {gr.FRONTIER_SPACE - 1000}]
         ELSE [doc_id + 1, doc_id // 2] END) AS t(dst)
  WHERE t.dst <> doc_id
),
allowed AS (SELECT dst FROM f WHERE NOT ({disallow})),
unseen AS (
  SELECT dst FROM allowed WHERE dst NOT IN (SELECT doc_id FROM {table})
),
scored AS (
  SELECT 'https://site-' || chr(97 + (dst % 3)::INT) || '.example/docs/' || dst
           AS dst_url,
         'site-' || chr(97 + (dst % 3)::INT) || '.example' AS host,
         count(*)::BIGINT AS n_inlinks
  FROM unseen GROUP BY dst
),
r AS (
  SELECT host, dst_url, n_inlinks,
         row_number() OVER (PARTITION BY host
                            ORDER BY n_inlinks DESC, dst_url ASC) AS rank
  FROM scored
)
SELECT host, dst_url, n_inlinks, rank::INT AS rank
FROM r WHERE rank <= {per_host}
"""


def temperature_sample_sql(temperature: float = 2.0,
                           table: str = "documents") -> str:
    """Temperature-balanced language sampling — mirrors
    sampling.py::temperature_sample (same pow/normalize/clamp chain, same
    h60 membership)."""
    inv_t = repr(1.0 / float(temperature))
    h = h60_sql("'temp:' || doc_id")
    u = f"({h}) / 1152921504606846976.0"
    return f"""
WITH c AS (SELECT lang, count(*)::DOUBLE AS n_l FROM {table} GROUP BY lang),
tot AS (SELECT sum(n_l) AS n FROM c),
q AS (SELECT lang, n_l, pow(n_l / tot.n, {inv_t}) AS qq FROM c, tot),
z AS (SELECT sum(qq) AS z FROM q),
p AS (
  SELECT lang, least(1.0, (qq / z.z) * tot.n / n_l) AS p
  FROM q, z, tot
)
SELECT d.doc_id, d.lang
FROM {table} d JOIN p USING (lang)
WHERE {u} < p.p
"""


def _pq_cb_cte(table: str = "embeddings") -> str:
    m, k, sub = sim.PQ_M, sim.PQ_K, sim.PQ_SUB
    return f"""
cbsrc AS (
  SELECT vec_id AS code, embedding FROM {table} ORDER BY vec_id LIMIT {k}
),
cb AS (
  SELECT s.m::INT AS m, cbsrc.code::INT AS code,
         (cbsrc.embedding[(s.m*{sub}+1):((s.m+1)*{sub})])::DOUBLE[] AS csub
  FROM cbsrc, LATERAL unnest(generate_series(0, {m - 1})) s(m)
),
sv AS (
  SELECT e.vec_id, s.m::INT AS m,
         (e.embedding[(s.m*{sub}+1):((s.m+1)*{sub})])::DOUBLE[] AS sub
  FROM {table} e, LATERAL unnest(generate_series(0, {m - 1})) s(m)
),
codes AS (
  SELECT vec_id, m, code FROM (
    SELECT sv.vec_id, sv.m, cb.code,
           row_number() OVER (
             PARTITION BY sv.vec_id, sv.m
             ORDER BY round(list_distance(sv.sub, cb.csub), 4) ASC,
                      cb.code ASC) AS rn
    FROM sv JOIN cb USING (m)
  ) WHERE rn = 1
)"""


def pq_codes_sql(table: str = "embeddings") -> str:
    """PQ encoding — mirrors similarity.py::pq_encode (same deterministic
    codebook sample, same rounded-L2 argmin with code-asc ties)."""
    return f"""
WITH {_pq_cb_cte(table)}
SELECT vec_id, m, code FROM codes
"""


def ann_pq_sql(query_ids: list[int], k: int = 5,
               table: str = "embeddings") -> str:
    """ADC top-k — mirrors similarity.py::ann_pq."""
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH {_pq_cb_cte(table)},
qsub AS (
  SELECT vec_id AS qid, m, sub AS qsub FROM sv WHERE vec_id IN ({ids})
),
lut AS (
  SELECT qsub.qid, qsub.m, cb.code,
         round(list_distance(qsub.qsub, cb.csub), 4) AS dq
  FROM qsub JOIN cb USING (m)
),
scored AS (
  SELECT lut.qid, codes.vec_id, round(sum(lut.dq * lut.dq), 4) AS adc
  FROM codes JOIN lut ON lut.m = codes.m AND lut.code = codes.code
  GROUP BY lut.qid, codes.vec_id
),
ranked AS (
  SELECT qid, vec_id, adc,
         row_number() OVER (PARTITION BY qid
                            ORDER BY adc ASC, vec_id ASC) AS rank
  FROM scored WHERE vec_id <> qid
)
SELECT qid, vec_id, adc, rank::INT AS rank FROM ranked WHERE rank <= {k}
"""


def trustrank_sql(
    seed_mod: int = 50,
    n_iter: int = gr.PR_ITERS,
    damping: float = gr.PR_DAMPING,
    table: str = "documents",
) -> str:
    """TrustRank unrolled — mirrors graph.py::trustrank with seeds =
    doc_id % seed_mod = 0 (the contract query's fixture seed set)."""
    d = repr(damping)
    base = repr(1.0 - damping)
    ctes = [
        f"nodes AS (SELECT doc_id FROM {table})",
        "meta AS (SELECT count(*)::DOUBLE AS n FROM nodes)",
        f"seeds AS (SELECT doc_id FROM nodes WHERE doc_id % {seed_mod} = 0)",
        "scnt AS (SELECT count(*)::DOUBLE AS s FROM seeds)",
        "tv AS (SELECT nodes.doc_id,"
        " CASE WHEN seeds.doc_id IS NOT NULL THEN 1.0 / scnt.s ELSE 0.0 END AS tv"
        " FROM nodes CROSS JOIN scnt"
        " LEFT JOIN seeds ON seeds.doc_id = nodes.doc_id)",
        _EDGE_CTE.format(table=table).strip(),
        "edges AS (SELECT src, dst FROM edges0 WHERE dst IN (SELECT doc_id FROM nodes))",
        "deg AS (SELECT src, count(*)::DOUBLE AS outdeg FROM edges GROUP BY src)",
        "e AS (SELECT edges.src, edges.dst, deg.outdeg FROM edges JOIN deg USING (src))",
        "r0 AS (SELECT doc_id, tv AS rank FROM tv)",
    ]
    for i in range(n_iter):
        ctes.append(
            f"c{i+1} AS (SELECT dst, sum(rank / outdeg) AS c"
            f" FROM e JOIN r{i} ON r{i}.doc_id = e.src GROUP BY dst)"
        )
        ctes.append(
            f"r{i+1} AS (SELECT tv.doc_id,"
            f" {base} * tv.tv + {d} * coalesce(c{i+1}.c, 0.0) AS rank"
            f" FROM tv LEFT JOIN c{i+1} ON c{i+1}.dst = tv.doc_id)"
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT doc_id, round(rank * meta.n, 4) AS tr FROM r{n_iter}, meta
"""


def curation_funnel_sql(table: str = "documents") -> str:
    """The preprocessing funnel end to end — composes the per-stage
    oracle generators (line_dedup_sql / quality_scores_sql /
    temperature_sample_sql run as parenthesized sub-statements over the
    chained CTEs), mirroring curation.py::curation_funnel stage for
    stage."""
    h = h60_sql("clean_text")
    return f"""
WITH s1 AS (SELECT * FROM {table} WHERE {PARSEABLE_SQL}),
ld AS ({line_dedup_sql(table="s1")}),
s2 AS (SELECT doc_id, clean_text FROM ld WHERE n_kept > 0),
fpt AS (SELECT doc_id, {h} AS fp FROM s2),
w AS (SELECT fp, min(doc_id) AS keep FROM fpt GROUP BY fp),
s3 AS (
  SELECT fpt.doc_id FROM fpt JOIN w ON w.fp = fpt.fp
  WHERE fpt.doc_id = w.keep
),
q AS ({quality_scores_sql(table="s1")}),
s4 AS (
  SELECT s3.doc_id FROM s3 JOIN q ON q.doc_id = s3.doc_id
  WHERE q.quality >= {cu.QUALITY_FLOOR}
),
s5 AS (
  SELECT d.* FROM {table} d JOIN s4 ON s4.doc_id = d.doc_id
  WHERE d.lang <> '{cu.FUNNEL_DROP_LANG}'
),
tc AS (SELECT lang, count(*)::DOUBLE AS n_l FROM s5 GROUP BY lang),
ttot AS (SELECT sum(n_l) AS n FROM tc),
tq AS (SELECT lang, n_l, pow(n_l / ttot.n, {repr(0.5)}) AS qq FROM tc, ttot),
tz AS (SELECT sum(qq) AS z FROM tq),
tp AS (
  SELECT lang, least(1.0, (qq / tz.z) * ttot.n / n_l) AS p
  FROM tq, tz, ttot
),
s6 AS (
  SELECT d.doc_id FROM s5 d JOIN tp USING (lang)
  WHERE ({h60_sql("'temp:' || doc_id")}) / 1152921504606846976.0 < tp.p
)
SELECT '1_input' AS stage, (SELECT count(*) FROM {table})::BIGINT AS n_rows
UNION ALL SELECT '2_parseable', (SELECT count(*) FROM s1)::BIGINT
UNION ALL SELECT '3_line_nonempty', (SELECT count(*) FROM s2)::BIGINT
UNION ALL SELECT '4_exact_unique', (SELECT count(*) FROM s3)::BIGINT
UNION ALL SELECT '5_quality', (SELECT count(*) FROM s4)::BIGINT
UNION ALL SELECT '6_lang', (SELECT count(*) FROM s5)::BIGINT
UNION ALL SELECT '7_sampled', (SELECT count(*) FROM s6)::BIGINT
"""


def domain_authority_sql(table: str = "documents") -> str:
    """Host-level authority rollup over the PageRank oracle."""
    return f"""
WITH pr AS ({pagerank_sql(table=table)})
SELECT ('site-' || chr(97 + (doc_id % 3)::INT)) AS site_key,
       count(*)::BIGINT AS n_pages,
       round(sum(pr.pr), 4) AS authority,
       max(pr.pr) AS top_pr
FROM pr GROUP BY 1
"""


# ------------------------------------------------- anchor text + BM25F

def _anchor_terms_ctes(table: str = "documents") -> str:
    """CTE chain `edges → anchors → atoks → aterms` — the anchor-FIELD
    token stream, mirroring operators/anchors.py::anchored_html +
    harvest_anchors + the shared tokenize path. Derives the anchors
    arithmetically (frozen 7-word vocab indexed by dst%7 / src%7) exactly
    as the fixture writes them into html; reuses `lemma_dict` from a
    preceding terms_cte(...)."""
    from ..operators import anchors as an
    from ..textproc.tokenize import BOUNDARY_STRIP, WORD_PATTERN

    aw_rows = ", ".join(
        f"({i}, '{w}')" for i, w in enumerate(an.ANCHOR_WORDS)
    )
    n = len(an.ANCHOR_WORDS)
    return f"""
edges0a AS (
  SELECT doc_id AS src, t.dst
  FROM {table}, LATERAL unnest([doc_id + 1, doc_id // 2]) AS t(dst)
  WHERE t.dst <> doc_id
),
edgesa AS (
  SELECT src, dst FROM edges0a WHERE dst IN (SELECT doc_id FROM {table})
),
aw AS (SELECT * FROM (VALUES {aw_rows}) v(i, w)),
anchors AS (
  SELECT e.dst AS doc_id, wd.w || ' ' || ws.w AS text
  FROM edgesa e
  JOIN aw wd ON wd.i = (e.dst % {n})
  JOIN aw ws ON ws.i = (e.src % {n})
),
atoks AS (
  SELECT d.doc_id, regexp_replace(t.tok, '{BOUNDARY_STRIP}', '', 'g') AS term
  FROM anchors d,
       unnest(string_split_regex(lower(trim(d.text)), '{WS_SPLIT}')) AS t(tok)
),
aterms AS (
  SELECT atoks.doc_id, coalesce(ld.normal, {rule_lemma_sql('atoks.term')}) AS term
  FROM atoks LEFT JOIN lemma_dict ld ON ld.word = atoks.term
  WHERE atoks.term <> ''
    AND regexp_matches(atoks.term, '{WORD_PATTERN}')
    AND atoks.term NOT IN {sql_not_in_list()}
)"""


def anchor_postings_sql(table: str = "documents") -> str:
    """(doc_id, term, tf) — anchor-field postings oracle."""
    return f"""
WITH {terms_cte(table)},
{_anchor_terms_ctes(table).strip()}
SELECT doc_id, term, count(*)::BIGINT AS tf
FROM aterms GROUP BY doc_id, term
"""


def search_bm25f_sql(
    query_terms: list[str],
    k1: float | None = None,
    w_body: float | None = None,
    w_anchor: float | None = None,
    b_body: float | None = None,
    b_anchor: float | None = None,
    limit: int = 20,
    offset: int = 0,
    table: str = "documents",
) -> str:
    """BM25F (simple form, Zaragoza et al. 2004) over (body, anchor)
    fields — mirrors operators/anchors.py::search_bm25f: per-field
    length-normalized weighted tf summed BEFORE saturation, idf from
    union-of-fields document frequency, disjunctive OR semantics,
    deterministic (rounded score desc, doc_id asc) tiebreak."""
    from ..operators import anchors as an

    k1 = an.K1_DEFAULT if k1 is None else k1
    w_body = an.W_BODY if w_body is None else w_body
    w_anchor = an.W_ANCHOR if w_anchor is None else w_anchor
    b_body = an.B_BODY if b_body is None else b_body
    b_anchor = an.B_ANCHOR if b_anchor is None else b_anchor
    uniq = sorted(set(query_terms))
    terms_in = "(" + ", ".join(f"'{t}'" for t in uniq) + ")"
    return f"""
WITH {terms_cte(table)},
{_anchor_terms_ctes(table).strip()},
bpost AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms
  WHERE term IN {terms_in} GROUP BY doc_id, term
),
apost AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM aterms
  WHERE term IN {terms_in} GROUP BY doc_id, term
),
bdl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM terms GROUP BY doc_id),
adl AS (SELECT doc_id, count(*)::DOUBLE AS adl FROM aterms GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM {table})::DOUBLE AS n_docs,
         (SELECT sum(coalesce(bdl.dl,0))
          FROM {table} d LEFT JOIN bdl USING (doc_id))
           / (SELECT count(*) FROM {table}) AS avgdl,
         (SELECT coalesce(sum(adl.adl),0) FROM adl)
           / (SELECT count(*) FROM {table}) AS avg_adl
),
dfu AS (
  SELECT term, count(*)::DOUBLE AS df FROM (
    SELECT doc_id, term FROM bpost
    UNION
    SELECT doc_id, term FROM apost
  ) GROUP BY term
),
ntf AS (
  SELECT b.doc_id, b.term,
         {repr(w_body)} * b.tf
           / (1 - {repr(b_body)} + {repr(b_body)} * bdl.dl / s.avgdl) AS ntf
  FROM bpost b JOIN bdl USING (doc_id) CROSS JOIN stats s
  UNION ALL
  SELECT a.doc_id, a.term,
         {repr(w_anchor)} * a.tf
           / (1 - {repr(b_anchor)} + {repr(b_anchor)} * adl.adl / s.avg_adl) AS ntf
  FROM apost a JOIN adl USING (doc_id) CROSS JOIN stats s
),
wtf AS (SELECT doc_id, term, sum(ntf) AS wtf FROM ntf GROUP BY doc_id, term),
scored AS (
  SELECT w.doc_id,
         sum( ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
              * w.wtf / ({repr(k1)} + w.wtf) ) AS score
  FROM wtf w JOIN dfu d USING (term) CROSS JOIN stats s
  GROUP BY w.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored
ORDER BY round(score, 4) DESC, doc_id ASC
LIMIT {limit} OFFSET {offset}
"""


def search_dismax_sql(
    query_terms: list[str],
    k1: float | None = None,
    b_body: float | None = None,
    b_anchor: float | None = None,
    tie_breaker: float | None = None,
    limit: int = 20,
    offset: int = 0,
    table: str = "documents",
) -> str:
    """ES multi_match best_fields / Lucene DisjunctionMaxQuery over
    (body, anchor) — mirrors operators/anchors.py::search_dismax: each
    field scored as its own BM25 index (field-scoped df/dl/avgdl), then
    score = max_f + tie_breaker · (Σ_f − max_f)."""
    from ..operators import anchors as an

    k1 = an.K1_DEFAULT if k1 is None else k1
    b_body = an.B_BODY if b_body is None else b_body
    b_anchor = an.B_ANCHOR if b_anchor is None else b_anchor
    tie = an.TIE_BREAKER if tie_breaker is None else tie_breaker
    uniq = sorted(set(query_terms))
    terms_in = "(" + ", ".join(f"'{t}'" for t in uniq) + ")"
    return f"""
WITH {terms_cte(table)},
{_anchor_terms_ctes(table).strip()},
bpost AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms
  WHERE term IN {terms_in} GROUP BY doc_id, term
),
apost AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM aterms
  WHERE term IN {terms_in} GROUP BY doc_id, term
),
bdl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM terms GROUP BY doc_id),
adl AS (SELECT doc_id, sum(tf)::DOUBLE AS adl FROM (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM aterms
  GROUP BY doc_id, term
) GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM {table})::DOUBLE AS n_docs,
         (SELECT sum(coalesce(bdl.dl,0))
          FROM {table} d LEFT JOIN bdl USING (doc_id))
           / (SELECT count(*) FROM {table}) AS avgdl,
         (SELECT coalesce(sum(adl.adl),0) FROM adl)
           / (SELECT count(*) FROM {table}) AS avg_adl
),
bdf AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
        FROM bpost GROUP BY term),
adf AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
        FROM apost GROUP BY term),
sbody AS (
  SELECT p.doc_id,
         sum( ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
              * p.tf * ({repr(k1)} + 1)
              / (p.tf + {repr(k1)}
                 * (1 - {repr(b_body)}
                    + {repr(b_body)} * bdl.dl / s.avgdl)) ) AS s
  FROM bpost p JOIN bdl USING (doc_id) JOIN bdf d USING (term)
  CROSS JOIN stats s
  GROUP BY p.doc_id
),
sanchor AS (
  SELECT p.doc_id,
         sum( ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
              * p.tf * ({repr(k1)} + 1)
              / (p.tf + {repr(k1)}
                 * (1 - {repr(b_anchor)}
                    + {repr(b_anchor)} * adl.adl / s.avg_adl)) ) AS s
  FROM apost p JOIN adl USING (doc_id) JOIN adf d USING (term)
  CROSS JOIN stats s
  GROUP BY p.doc_id
),
combined AS (
  SELECT coalesce(sb.doc_id, sa.doc_id) AS doc_id,
         coalesce(sb.s, 0) AS s_body, coalesce(sa.s, 0) AS s_anchor
  FROM sbody sb FULL OUTER JOIN sanchor sa ON sb.doc_id = sa.doc_id
)
SELECT doc_id,
       round(greatest(s_body, s_anchor)
             + {repr(tie)} * (s_body + s_anchor
                              - greatest(s_body, s_anchor)), 4) AS score
FROM combined
ORDER BY round(greatest(s_body, s_anchor)
               + {repr(tie)} * (s_body + s_anchor
                                - greatest(s_body, s_anchor)), 4) DESC,
         doc_id ASC
LIMIT {limit} OFFSET {offset}
"""


def search_cross_fields_sql(
    query_terms: list[str],
    k1: float | None = None,
    b_body: float | None = None,
    b_anchor: float | None = None,
    limit: int = 20,
    offset: int = 0,
    table: str = "documents",
) -> str:
    """ES multi_match cross_fields / Lucene BlendedTermQuery — mirrors
    operators/anchors.py::search_cross_fields: per term the best field's
    saturated contribution, idf over the blended (max-of-fields) df."""
    from ..operators import anchors as an

    k1 = an.K1_DEFAULT if k1 is None else k1
    b_body = an.B_BODY if b_body is None else b_body
    b_anchor = an.B_ANCHOR if b_anchor is None else b_anchor
    uniq = sorted(set(query_terms))
    terms_in = "(" + ", ".join(f"'{t}'" for t in uniq) + ")"
    return f"""
WITH {terms_cte(table)},
{_anchor_terms_ctes(table).strip()},
bpost AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms
  WHERE term IN {terms_in} GROUP BY doc_id, term
),
apost AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM aterms
  WHERE term IN {terms_in} GROUP BY doc_id, term
),
bdl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM terms GROUP BY doc_id),
adl AS (SELECT doc_id, sum(tf)::DOUBLE AS adl FROM (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM aterms
  GROUP BY doc_id, term
) GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM {table})::DOUBLE AS n_docs,
         (SELECT sum(coalesce(bdl.dl,0))
          FROM {table} d LEFT JOIN bdl USING (doc_id))
           / (SELECT count(*) FROM {table}) AS avgdl,
         (SELECT coalesce(sum(adl.adl),0) FROM adl)
           / (SELECT count(*) FROM {table}) AS avg_adl
),
bdf AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
        FROM bpost GROUP BY term),
adf AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
        FROM apost GROUP BY term),
bl AS (
  SELECT coalesce(b.term, a.term) AS term,
         greatest(coalesce(b.df, 0), coalesce(a.df, 0)) AS df
  FROM bdf b FULL OUTER JOIN adf a ON b.term = a.term
),
pb AS (
  SELECT p.doc_id, p.term,
         p.tf * ({repr(k1)} + 1)
           / (p.tf + {repr(k1)}
              * (1 - {repr(b_body)}
                 + {repr(b_body)} * bdl.dl / s.avgdl)) AS part
  FROM bpost p JOIN bdl USING (doc_id) CROSS JOIN stats s
),
pa AS (
  SELECT p.doc_id, p.term,
         p.tf * ({repr(k1)} + 1)
           / (p.tf + {repr(k1)}
              * (1 - {repr(b_anchor)}
                 + {repr(b_anchor)} * adl.adl / s.avg_adl)) AS part
  FROM apost p JOIN adl USING (doc_id) CROSS JOIN stats s
),
mergedtf AS (
  SELECT coalesce(pb.doc_id, pa.doc_id) AS doc_id,
         coalesce(pb.term, pa.term) AS term,
         greatest(coalesce(pb.part, 0), coalesce(pa.part, 0)) AS best
  FROM pb FULL OUTER JOIN pa
    ON pb.doc_id = pa.doc_id AND pb.term = pa.term
),
scored AS (
  SELECT m.doc_id,
         sum( ln(1 + (s.n_docs - bl.df + 0.5) / (bl.df + 0.5)) * m.best
            ) AS score
  FROM mergedtf m JOIN bl USING (term) CROSS JOIN stats s
  GROUP BY m.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored
ORDER BY round(score, 4) DESC, doc_id ASC
LIMIT {limit} OFFSET {offset}
"""


def cdx_lines_sql(table: str = "documents") -> str:
    """CDXJ capture-index lines — mirrors sources/warc.py::cdx_lines
    (SURT key over raw_url, 14-digit UTC timestamp from the frozen epoch
    derivation, concat-pinned JSON block)."""
    from .oracle_fragments import HTTP_CODE_SQL, RAW_URL_SQL

    return f"""
WITH u AS (
  SELECT doc_id, lower({RAW_URL_SQL}) AS u, {HTML_SQL} AS html,
         {HTTP_CODE_SQL} AS status, {RAW_URL_SQL} AS raw_url
  FROM {table}
),
p AS (SELECT *, regexp_replace(u, '^[a-z]+://', '') AS rest FROM u),
h AS (
  SELECT doc_id, raw_url, html, status,
         regexp_replace(regexp_extract(rest, '^([^/?#]+)', 1),
                        '^www\\.', '') AS host,
         regexp_replace(regexp_replace(regexp_replace(rest, '^[^/?#]+', ''),
                        '[?#].*$', ''), '/+$', '') AS path
  FROM p
),
s AS (
  SELECT doc_id, raw_url, html, status,
         array_to_string(list_reverse(string_split(host, '.')), ',')
           || ')' || path AS surt,
         strftime(make_timestamp((1704067200 + 60 * doc_id) * 1000000),
                  '%Y%m%d%H%M%S') AS ts14
  FROM h
)
SELECT doc_id, surt, ts14,
       surt || ' ' || ts14 || ' ' ||
       '{{"url": "' || raw_url ||
       '", "mime": "text/html", "status": "' || status ||
       '", "digest": "' || md5(html) ||
       '", "length": "' || octet_length(encode(html)) || '"}}' AS cdxj
FROM s
"""


def cluster_representatives_sql(
    table: str = "documents", threshold: float = 0.5
) -> str:
    """Keep-best election per near-dup cluster — mirrors
    operators/dedup.py::cluster_representatives (longest text wins,
    tie → lowest doc_id)."""
    return f"""
WITH clus AS ({dedup_clusters_sql(table, threshold)}),
m AS (
  SELECT c.doc_id, c.cluster_id, c.cluster_size, length(d.text) AS n_chars
  FROM clus c JOIN {table} d USING (doc_id)
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM m
)
SELECT cluster_id, doc_id AS rep_doc, cluster_size,
       (cluster_size - 1)::BIGINT AS n_dropped
FROM r WHERE rn = 1
"""


def dup_spans_sql(window: int | None = None, table: str = "documents") -> str:
    """ExactSubstr duplicated-span oracle — mirrors
    operators/spans.py::dup_spans (fixed-width window md5 fingerprints
    over the retained-token stream, first occurrence canonical, islands
    merge)."""
    from ..operators import spans as sp
    from .oracle_fragments import positional_terms_cte

    w = sp.WINDOW if window is None else window
    return f"""
WITH {positional_terms_cte(table)},
win0 AS (
  SELECT doc_id, pos AS start,
         string_agg(term, ' ') OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS wtext,
         count(*) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS wlen
  FROM pos_terms
),
wins AS (SELECT doc_id, start, md5(wtext) AS whash FROM win0 WHERE wlen = {w}),
r AS (
  SELECT doc_id, start,
         row_number() OVER (PARTITION BY whash ORDER BY doc_id, start) AS rn,
         count(*) OVER (PARTITION BY whash) AS cnt
  FROM wins
),
dup AS (SELECT doc_id, start FROM r WHERE cnt > 1 AND rn > 1),
m AS (
  SELECT doc_id, start,
         max(start) OVER (PARTITION BY doc_id ORDER BY start
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM dup
),
f AS (
  SELECT doc_id, start,
         CASE WHEN prev_max IS NULL OR start > prev_max + {w - 1}
              THEN 1 ELSE 0 END AS ni
  FROM m
),
isl AS (
  SELECT doc_id, start,
         sum(ni) OVER (PARTITION BY doc_id ORDER BY start
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM f
)
SELECT doc_id, min(start)::BIGINT AS span_start,
       (max(start) + {w - 1})::BIGINT AS span_end,
       count(*)::BIGINT AS n_windows
FROM isl GROUP BY doc_id, island
"""


def search_recency_sql(
    query_terms: list[str],
    half_life_days: float = 30.0,
    weight: float = 0.5,
    rerank_window: int = 50,
    limit: int = 20,
    table: str = "documents",
) -> str:
    """Freshness-damped rerank over the BM25 top-`rerank_window` —
    mirrors operators/search.py::blend_recency (decay anchored at the
    corpus max warc_ts; warc_ts ≡ 1704067200 + 60·doc_id by fixture)."""
    import math

    from .oracle_fragments import search_bm25_sql

    rate = -math.log(2.0) / float(half_life_days)
    return f"""
WITH hits AS ({search_bm25_sql(query_terms, limit=rerank_window, table=table)}),
mx AS (SELECT max(1704067200 + 60 * doc_id) AS ep FROM {table}),
b AS (
  SELECT h.doc_id,
         round(h.score * ({repr(1.0 - weight)} + {repr(weight)}
           * exp({repr(rate)}
                 * ((mx.ep - (1704067200 + 60 * h.doc_id)) / 86400.0))), 4)
           AS score
  FROM hits h, mx
)
SELECT doc_id, score FROM b
ORDER BY score DESC, doc_id ASC
LIMIT {limit}
"""


def warc_roundtrip_sql(table: str = "documents") -> str:
    """WARC serialize→parse round-trip oracle: the recovered fields must
    equal the fixture derivations exactly (sources/warc.py never sees
    these expressions — it extracts them back out of the record bytes)."""
    from .oracle_fragments import URL_SQL

    return f"""
WITH m AS (SELECT doc_id, {HTML_SQL} AS s FROM {table})
SELECT doc_id,
       {URL_SQL} AS url,
       (1704067200 + 60 * doc_id)::BIGINT AS warc_epoch,
       md5(s) AS content_md5,
       octet_length(encode(s))::BIGINT AS n_bytes
FROM m
"""


def hits_sql(n_iter: int = gr.HITS_ITERS, table: str = "documents") -> str:
    """Fixed-iteration HITS, unrolled as a CTE chain — mirrors
    graph.py::hits (sum-normalized half-steps, N-scaled 4 dp output)."""
    ctes = [
        f"nodes AS (SELECT doc_id FROM {table})",
        "meta AS (SELECT count(*)::DOUBLE AS n FROM nodes)",
        _EDGE_CTE.format(table=table).strip(),
        "edges AS (SELECT src, dst FROM edges0"
        " WHERE dst IN (SELECT doc_id FROM nodes))",
        "h0 AS (SELECT doc_id, 1.0 AS h FROM nodes)",
    ]
    for i in range(n_iter):
        p = f"h{i}"
        ctes.append(
            f"a{i+1}r AS (SELECT nodes.doc_id, coalesce(c.s, 0.0) AS a"
            f" FROM nodes LEFT JOIN (SELECT e.dst, sum({p}.h) AS s"
            f" FROM edges e JOIN {p} ON {p}.doc_id = e.src GROUP BY e.dst) c"
            f" ON c.dst = nodes.doc_id)"
        )
        ctes.append(
            f"a{i+1} AS (SELECT doc_id, CASE WHEN"
            f" (SELECT sum(a) FROM a{i+1}r) > 0 THEN"
            f" a / (SELECT sum(a) FROM a{i+1}r) ELSE 0.0 END AS a FROM a{i+1}r)"
        )
        ctes.append(
            f"h{i+1}r AS (SELECT nodes.doc_id, coalesce(c.s, 0.0) AS h"
            f" FROM nodes LEFT JOIN (SELECT e.src, sum(a{i+1}.a) AS s"
            f" FROM edges e JOIN a{i+1} ON a{i+1}.doc_id = e.dst"
            f" GROUP BY e.src) c ON c.src = nodes.doc_id)"
        )
        ctes.append(
            f"h{i+1} AS (SELECT doc_id, CASE WHEN"
            f" (SELECT sum(h) FROM h{i+1}r) > 0 THEN"
            f" h / (SELECT sum(h) FROM h{i+1}r) ELSE 0.0 END AS h FROM h{i+1}r)"
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT a.doc_id, round(a.a * meta.n, 4) AS authority,
       round(h.h * meta.n, 4) AS hub
FROM a{n_iter} a JOIN h{n_iter} h USING (doc_id), meta
"""


def robots_rules_sql() -> str:
    """Ground-truth rules the robots.txt parser must recover from the
    fixture texts (FIXTURES pattern: robots_fixture_texts embeds exactly
    gr.ROBOTS_RULES in realistic multi-group files)."""
    rows = ", ".join(f"('{h}', '{p}')" for h, p in gr.ROBOTS_RULES)
    return f"SELECT * FROM (VALUES {rows}) v(host, path_prefix)"


def weighted_sample_sql(
    n: int = 100,
    weight_col: str = "n_chars",
    seed_tag: str = "wsample",
    table: str = "documents",
) -> str:
    """A-ES weighted sampling oracle — mirrors
    operators/sampling.py::weighted_sample (ln(u)/w key, top-n)."""
    u = _sample_u_sql(seed_tag)
    return f"""
SELECT doc_id FROM {table}
WHERE {weight_col}::DOUBLE > 0
ORDER BY ln({u}) / {weight_col}::DOUBLE DESC, doc_id ASC
LIMIT {n}
"""


def cocitation_sql(min_common: int = 1, table: str = "documents") -> str:
    """Co-citation oracle over the fixture link graph — mirrors
    graph.py::cocitation(resolved_edges(linked_html))."""
    return f"""
WITH {_EDGE_CTE.format(table=table)},
edges AS (
  SELECT src, dst FROM edges0
  WHERE dst IN (SELECT doc_id FROM {table})
),
p AS (
  SELECT a.src, a.dst AS doc_a, b.dst AS doc_b
  FROM edges a JOIN edges b USING (src)
  WHERE a.dst < b.dst
)
SELECT doc_a, doc_b, count(*)::BIGINT AS n_common
FROM p GROUP BY doc_a, doc_b
HAVING count(*) >= {min_common}
"""


def quality_model_sql(table: str = "documents") -> str:
    """Frozen logistic quality classifier oracle — mirrors
    textstats.py::quality_model_scores over the rounded feature frame."""
    w = (ts.QM_W_STOP, ts.QM_W_MWL, ts.QM_W_DIGIT, ts.QM_W_LOGLEN, ts.QM_BIAS)
    return f"""
WITH q AS ({quality_scores_sql(table)}),
z AS (
  SELECT doc_id,
         {w[0]!r} * stopword_ratio + {w[1]!r} * mean_word_len
           + {w[2]!r} * digit_ratio + {w[3]!r} * ln(1.0 + n_chars)
           + {w[4]!r} AS z
  FROM q
),
p AS (SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 4) AS p_keep FROM z)
SELECT doc_id, p_keep, (p_keep >= {ts.QM_THRESHOLD!r}) AS keep FROM p
"""


def mirror_hosts_sql(threshold: float = 0.5, table: str = "documents") -> str:
    """Mirror-host oracle — mirrors dedup.py::mirror_hosts over the
    candidate-driven Jaccard pair relation."""
    return f"""
WITH p AS ({jaccard_pairs_sql(table, threshold, lsh_candidates=True)}),
s AS (
  SELECT ('site-' || chr(97 + (doc_a % 3)::INT)) AS sa,
         ('site-' || chr(97 + (doc_b % 3)::INT)) AS sb
  FROM p
),
m AS (
  SELECT least(sa, sb) AS site_a, greatest(sa, sb) AS site_b
  FROM s WHERE sa <> sb
)
SELECT site_a, site_b, count(*)::BIGINT AS n_shared
FROM m GROUP BY site_a, site_b
"""


def web_ranking_sql(
    query_terms: list[str],
    weight: float = 0.5,
    limit: int = 20,
    table: str = "documents",
) -> str:
    """The composed web-ranking stack in one query — BM25F (body+anchor)
    × PageRank authority × one-result-per-site collapse; every stage
    4 dp-rounded in both engines (mirrors __spark_entry__::_q_web_ranking)."""
    w = repr(weight)
    wc = repr(1.0 - weight)
    return f"""
WITH hits AS ({search_bm25f_sql(query_terms, limit=1_000_000, table=table)}),
pr AS ({pagerank_sql(table=table)}),
b AS (
  SELECT hits.doc_id, round(hits.score * ({wc} + {w} * pr.pr), 4) AS score
  FROM hits JOIN pr ON pr.doc_id = hits.doc_id
),
g AS (
  SELECT doc_id, score, ('site-' || chr(97 + (doc_id % 3)::INT)) AS site_key
  FROM b
),
r AS (
  SELECT site_key, doc_id, score,
         row_number() OVER (PARTITION BY site_key
                            ORDER BY score DESC, doc_id ASC) AS rn
  FROM g
)
SELECT site_key, doc_id, score FROM r WHERE rn = 1
ORDER BY score DESC, doc_id ASC LIMIT {limit}
"""


def kmeans_assign_sql(
    n_centroids: int | None = None, table: str = "embeddings"
) -> str:
    """One Lloyd round of k-means — mirrors
    similarity.py::kmeans_refine(rounds=1): assign to the deterministic
    initial centroids, per-dim mean rounded 6 dp (empty clusters keep
    the old centroid), reassign."""
    cos0 = COS_SQL.format(a="e.embedding", b="c.cvec")
    cos1 = COS_SQL.format(a="e.embedding", b="c.vec")
    return f"""
WITH {_centroids_cte(table, n_centroids)},
a0 AS (
  SELECT vec_id, centroid_id FROM (
    SELECT e.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY round({cos0}, 4) DESC,
                                       c.centroid_id ASC) AS rn
    FROM {table} e CROSS JOIN cent c
  ) WHERE rn = 1
),
dims AS (
  SELECT a0.centroid_id,
         generate_subscripts(e.embedding, 1) AS dim,
         unnest(e.embedding) AS v
  FROM a0 JOIN {table} e USING (vec_id)
),
mu AS (
  SELECT centroid_id, dim, round(avg(v), 6) AS m
  FROM dims GROUP BY centroid_id, dim
),
upd AS (
  SELECT centroid_id, list(m ORDER BY dim) AS vec
  FROM mu GROUP BY centroid_id
),
cent1 AS (
  SELECT c.centroid_id, coalesce(u.vec, c.cvec::DOUBLE[]) AS vec
  FROM cent c LEFT JOIN upd u USING (centroid_id)
),
scored AS (
  SELECT e.vec_id, c.centroid_id, round({cos1}, 4) AS cos,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round({cos1}, 4) DESC,
                                     c.centroid_id ASC) AS rn
  FROM {table} e CROSS JOIN cent1 c
)
SELECT vec_id, centroid_id, cos FROM scored WHERE rn = 1
"""


def coupling_sql(min_common: int = 1, table: str = "documents") -> str:
    """Bibliographic-coupling oracle — mirrors graph.py::coupling over
    the fixture link graph."""
    return f"""
WITH {_EDGE_CTE.format(table=table)},
edges AS (
  SELECT src, dst FROM edges0
  WHERE dst IN (SELECT doc_id FROM {table})
),
p AS (
  SELECT a.dst, a.src AS doc_a, b.src AS doc_b
  FROM edges a JOIN edges b USING (dst)
  WHERE a.src < b.src
)
SELECT doc_a, doc_b, count(*)::BIGINT AS n_common
FROM p GROUP BY doc_a, doc_b
HAVING count(*) >= {min_common}
"""


def crawl_delays_sql() -> str:
    """Ground-truth Crawl-delay per ROBOTS host (the fixture texts
    declare 'Crawl-delay: 1' inside every wildcard group; the no-rules
    host declares none)."""
    hosts = sorted({h for h, _ in gr.ROBOTS_RULES})
    rows = ", ".join(f"('{h}', 1.0)" for h in hosts)
    return f"SELECT * FROM (VALUES {rows}) v(host, delay_s)"


def curation_funnel_v2_sql(
    jaccard_threshold: float = 0.5,
    sample_n: int = 100,
    table: str = "documents",
) -> str:
    """Mirrors operators/curation.py::curation_funnel_v2 (stage counts:
    parseable → cluster-canonical → LR-quality → weighted sample)."""
    u = _sample_u_sql("wsample")
    return f"""
WITH s2 AS (SELECT * FROM {table} WHERE {PARSEABLE_SQL}),
clus AS ({dedup_clusters_sql("s2", jaccard_threshold)}),
m AS (
  SELECT c.doc_id, c.cluster_id, length(d.text) AS n_chars
  FROM clus c JOIN s2 d USING (doc_id)
),
r AS (
  SELECT doc_id, cluster_id, row_number() OVER (
    PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM m
),
losers AS (SELECT doc_id FROM r WHERE rn > 1),
s3 AS (
  SELECT * FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM losers)
),
qm AS ({quality_model_sql("s3")}),
s4 AS (SELECT s3.* FROM s3 JOIN qm USING (doc_id) WHERE qm.keep),
s5 AS (
  SELECT doc_id FROM s4
  ORDER BY ln({u}) / n_chars::DOUBLE DESC, doc_id ASC
  LIMIT {sample_n}
)
SELECT '1_input' AS stage, (SELECT count(*) FROM {table})::BIGINT AS n_rows
UNION ALL SELECT '2_parseable', (SELECT count(*) FROM s2)::BIGINT
UNION ALL SELECT '3_canonical', (SELECT count(*) FROM s3)::BIGINT
UNION ALL SELECT '4_model_quality', (SELECT count(*) FROM s4)::BIGINT
UNION ALL SELECT '5_sampled', (SELECT count(*) FROM s5)::BIGINT
"""


def dsir_weights_sql(table: str = "documents",
                     n_buckets: int | None = None) -> str:
    """Mirrors operators/curation.py::dsir_weights — hashed unigram+bigram
    bucket counts, Laplace-smoothed target ('lang = en') vs raw bucket
    models, per-doc log importance weight. Returns (doc_id, logw)."""
    from .oracle_fragments import positional_terms_cte

    b = int(n_buckets if n_buckets is not None else cu.DSIR_BUCKETS)
    return f"""
WITH {positional_terms_cte(table)},
uni AS (SELECT doc_id, {h60_sql("term")} % {b} AS bucket FROM pos_terms),
bi AS (
  SELECT a.doc_id, {h60_sql("(a.term || ' ' || b.term)")} % {b} AS bucket
  FROM pos_terms a JOIN pos_terms b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
feats AS (
  SELECT doc_id, bucket, count(*)::DOUBLE AS cnt
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
  GROUP BY doc_id, bucket
),
flagged AS (
  SELECT f.doc_id, f.bucket, f.cnt, (d.lang = 'en') AS is_tgt
  FROM feats f JOIN {table} d USING (doc_id)
),
bstats AS (
  SELECT bucket, sum(cnt) AS raw_c,
         sum(CASE WHEN is_tgt THEN cnt ELSE 0 END) AS tgt_c
  FROM flagged GROUP BY bucket
),
tots AS (SELECT sum(raw_c) AS cr, sum(tgt_c) AS ct FROM bstats),
ratio AS (
  SELECT bucket,
         ln((tgt_c + 1) / (ct + {b})) - ln((raw_c + 1) / (cr + {b})) AS lr
  FROM bstats CROSS JOIN tots
),
per_doc AS (
  SELECT f.doc_id, sum(f.cnt * r.lr) AS logw
  FROM feats f JOIN ratio r USING (bucket) GROUP BY f.doc_id
)
SELECT d.doc_id, round(coalesce(p.logw, 0), 4) AS logw
FROM {table} d LEFT JOIN per_doc p USING (doc_id)
"""


def c4_clean_sql(table: str = "documents") -> str:
    """Mirrors operators/curation.py::c4_augment + c4_clean — C4 line
    rules (terminal punctuation + >=5 words), page-level lorem-ipsum /
    curly-brace drops, min-kept-lines gate. Returns
    (doc_id, n_lines, n_kept, keep_doc, clean_text)."""
    w, mw, mk = cu.C4_LINE_WIDTH, cu.C4_MIN_WORDS, cu.C4_MIN_KEPT_LINES
    pm = cu.C4_PUNCT_MOD
    return f"""
WITH tok0 AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text), '{cu.LINE_WS}')) AS tok,
         generate_subscripts(string_split_regex(trim(text), '{cu.LINE_WS}'), 1) AS ord
  FROM {table}
),
punct AS (
  SELECT doc_id,
         coalesce(string_agg(
           CASE WHEN ord % {pm} = 0 THEN tok || '.' ELSE tok END,
           ' ' ORDER BY ord), '') AS text
  FROM tok0 GROUP BY doc_id
),
aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % {cu.C4_LOREM_MOD} = 0 THEN ' lorem ipsum' ELSE '' END
         || CASE WHEN doc_id % {cu.C4_BRACE_MOD} = 0 THEN ' {{' ELSE '' END AS text
  FROM punct
),
toks AS (
  SELECT doc_id, string_split_regex(trim(text), '{cu.LINE_WS}') AS tk
  FROM aug
),
lines0 AS (
  SELECT doc_id, r.i AS line_no,
         array_to_string(tk[(r.i*{w}+1):((r.i+1)*{w})], ' ') AS line
  FROM toks, LATERAL unnest(
    generate_series(0, CAST(ceil(len(tk)/{w}.0) AS BIGINT) - 1)) AS r(i)
),
lines AS (
  SELECT doc_id, line_no, line,
         (regexp_matches(line, '[.!?"]$')
          AND len(string_split(line, ' ')) >= {mw}) AS kept
  FROM lines0 WHERE line <> ''
),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_lines,
         count(*) FILTER (WHERE kept)::BIGINT AS n_kept,
         coalesce(string_agg(CASE WHEN kept THEN line END, chr(10)
                             ORDER BY line_no), '') AS clean_text
  FROM lines GROUP BY doc_id
),
flags AS (
  SELECT doc_id,
         (contains(lower(text), 'lorem ipsum') OR contains(text, '{{'))
           AS poisoned
  FROM aug
)
SELECT f.doc_id,
       coalesce(a.n_lines, 0)::BIGINT AS n_lines,
       coalesce(a.n_kept, 0)::BIGINT AS n_kept,
       (coalesce(a.n_kept, 0) >= {mk} AND NOT f.poisoned) AS keep_doc,
       coalesce(a.clean_text, '') AS clean_text
FROM flags f LEFT JOIN agg a USING (doc_id)
"""


def ccnet_buckets_sql(table: str = "documents") -> str:
    """Mirrors operators/textstats.py::ccnet_buckets — per-language
    perplexity terciles on the rounded lm_ppl, doc_id-asc ties.
    Returns (doc_id, lang, lm_ppl, bucket)."""
    return f"""
WITH {terms_cte(table)},
tc AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms GROUP BY doc_id, term),
cf AS (SELECT term, sum(tf)::DOUBLE AS cf FROM tc GROUP BY term),
tot AS (SELECT sum(cf) AS t FROM cf),
per_doc AS (
  SELECT tc.doc_id,
         round(exp(-(sum(tc.tf * ln(cf.cf / tot.t)) / sum(tc.tf))), 4) AS lm_ppl
  FROM tc JOIN cf USING (term) CROSS JOIN tot
  GROUP BY tc.doc_id
),
ranked AS (
  SELECT p.doc_id, d.lang, p.lm_ppl,
         ntile(3) OVER (PARTITION BY d.lang
                        ORDER BY p.lm_ppl ASC, p.doc_id ASC) AS nt
  FROM per_doc p JOIN {table} d USING (doc_id)
)
SELECT doc_id, lang, lm_ppl,
       CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM ranked
"""


def attribution_pairs_sql(window_secs: int | None = None,
                          table: str = "events") -> str:
    """Mirrors operators/events.py::attribution_pairs — per-user
    view→click pairs within the window. Returns
    (view_id, click_id, user_id, lag_s)."""
    from ..operators import events as ev

    w = int(window_secs if window_secs is not None
            else ev.ATTRIBUTION_WINDOW_SECS)
    return f"""
WITH v AS (
  SELECT event_id AS view_id, user_id, epoch_us(ts)::BIGINT AS v_us
  FROM {table} WHERE event_type = 'view'
),
c AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts)::BIGINT AS c_us
  FROM {table} WHERE event_type = 'click'
)
SELECT v.view_id, c.click_id, v.user_id,
       ((c.c_us - v.v_us) // 1000000)::BIGINT AS lag_s
FROM v JOIN c USING (user_id)
WHERE c.c_us >= v.v_us AND c.c_us <= v.v_us + {w}::BIGINT * 1000000
"""


def last_touch_attribution_sql(window_secs: int | None = None,
                               table: str = "events") -> str:
    """Mirrors operators/events.py::last_touch_attribution — each click
    credited to its latest qualifying view (min MICROSECOND lag — not the
    truncated lag_s, which ties across views in the same whole second;
    ties → max view_id)."""
    from ..operators import events as ev

    w = int(window_secs if window_secs is not None
            else ev.ATTRIBUTION_WINDOW_SECS)
    return f"""
WITH v AS (
  SELECT event_id AS view_id, user_id, epoch_us(ts)::BIGINT AS v_us
  FROM {table} WHERE event_type = 'view'
),
c AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts)::BIGINT AS c_us
  FROM {table} WHERE event_type = 'click'
),
pairs AS (
  SELECT v.view_id, c.click_id, v.user_id,
         (c.c_us - v.v_us)::BIGINT AS lag_us,
         ((c.c_us - v.v_us) // 1000000)::BIGINT AS lag_s
  FROM v JOIN c USING (user_id)
  WHERE c.c_us >= v.v_us AND c.c_us <= v.v_us + {w}::BIGINT * 1000000
),
ranked AS (
  SELECT click_id, user_id, view_id, lag_s,
         row_number() OVER (PARTITION BY click_id
                            ORDER BY lag_us ASC, view_id DESC) AS rn
  FROM pairs
)
SELECT click_id, user_id, view_id, lag_s FROM ranked WHERE rn = 1
"""


def snapshot_delta_sql(cutoff_epoch: int | None = None,
                       table: str = "documents") -> str:
    """Mirrors operators/curation.py::snapshot_delta — newest-live-at-cut
    vs newest-overall per logical page, classified added / removed /
    changed / unchanged. Returns (page_key, status, old_doc, new_doc)."""
    from .oracle_fragments import PARSEABLE_SQL

    cut = int(cutoff_epoch if cutoff_epoch is not None
              else cu.DELTA_CUTOFF_EPOCH)
    return f"""
WITH rev AS (
  SELECT (doc_id % {cu.PAGE_KEY_MOD}) AS page_key, doc_id,
         (1704067200 + 60 * doc_id)::BIGINT AS epoch,
         {PARSEABLE_SQL} AS is_live,
         md5(text) AS fp
  FROM {table}
),
old AS (
  SELECT page_key, doc_id AS old_doc, fp AS old_fp
  FROM (
    SELECT *, row_number() OVER (PARTITION BY page_key
                                 ORDER BY epoch DESC, doc_id DESC) AS rn
    FROM rev WHERE is_live AND epoch <= {cut}
  ) WHERE rn = 1
),
new AS (
  SELECT page_key, doc_id AS new_doc_raw, is_live AS new_live, fp AS new_fp
  FROM (
    SELECT *, row_number() OVER (PARTITION BY page_key
                                 ORDER BY epoch DESC, doc_id DESC) AS rn
    FROM rev
  ) WHERE rn = 1
)
SELECT n.page_key,
       CASE
         WHEN o.old_doc IS NULL AND n.new_live THEN 'added'
         WHEN o.old_doc IS NOT NULL AND NOT n.new_live THEN 'removed'
         WHEN o.old_doc IS NOT NULL AND n.new_live
              AND o.old_fp <> n.new_fp THEN 'changed'
         WHEN o.old_doc IS NOT NULL AND n.new_live THEN 'unchanged'
       END AS status,
       o.old_doc,
       CASE WHEN n.new_live THEN n.new_doc_raw END AS new_doc
FROM new n LEFT JOIN old o USING (page_key)
WHERE NOT (o.old_doc IS NULL AND NOT n.new_live)
"""


def small_quantity_revenue_sql(brand: str = "Brand#1") -> str:
    """Mirrors operators/relational.py::small_quantity_revenue (TPC-H Q17
    shape) — the correlated scalar subquery decorrelated into a per-part
    aggregate, division-free predicate 5·n·qty < sum."""
    return f"""
WITH stats AS (
  SELECT l_partkey,
         sum(l_quantity::DECIMAL(18,2))::DECIMAL(18,2) AS sum_qty,
         count(*)::BIGINT AS n_li
  FROM lineitem GROUP BY l_partkey
)
SELECT round(sum(l.l_extendedprice::DECIMAL(18,2))::DOUBLE / 7.0, 2)
         AS avg_yearly
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = '{brand}'
JOIN stats s ON s.l_partkey = l.l_partkey
WHERE l.l_quantity::DECIMAL(18,2) * 5 * s.n_li < s.sum_qty
"""


# ----------------------------------------------- moment-based aggregations


def extended_stats_sql(table: str = "documents") -> str:
    """Mirrors operators/textstats.py::extended_stats: exact BIGINT
    moments per site, then the identical double expression
    var = sum_sq/n - avg^2 (clamped at 0), std = sqrt, bounds avg±2σ."""
    return f"""
WITH g AS (
  SELECT {SITE_KEY_SQL} AS site_key,
         count(*)::BIGINT AS n,
         min(len(text))::BIGINT AS min_chars,
         max(len(text))::BIGINT AS max_chars,
         sum(len(text)::BIGINT)::BIGINT AS sum_chars,
         sum((len(text)::BIGINT) * (len(text)::BIGINT))::BIGINT AS sum_sq
  FROM {table} GROUP BY 1
),
m AS (
  SELECT *, sum_chars::DOUBLE / n::DOUBLE AS avg_raw,
         greatest(sum_sq::DOUBLE / n::DOUBLE
                  - (sum_chars::DOUBLE / n::DOUBLE)
                    * (sum_chars::DOUBLE / n::DOUBLE), 0.0) AS var_raw
  FROM g
)
SELECT site_key, n, min_chars, max_chars, sum_chars, sum_sq,
       round(avg_raw, 4) AS avg_chars,
       round(var_raw, 4) AS variance,
       round(sqrt(var_raw), 4) AS std,
       round(avg_raw + 2.0 * sqrt(var_raw), 4) AS std_upper,
       round(avg_raw - 2.0 * sqrt(var_raw), 4) AS std_lower
FROM m
"""


def matrix_stats_sql(table: str = "documents") -> str:
    """Mirrors operators/textstats.py::matrix_stats: exact BIGINT moments
    of (n_chars, n_ws_tokens) per lang; cov = sxy/n - mx*my; corr pinned
    0.0 when either variance is 0."""
    y = (f"(CASE WHEN trim(text) = '' THEN 0 ELSE "
         f"len(string_split_regex(trim(text), '{WS_SPLIT}')) END)::BIGINT")
    return f"""
WITH g AS (
  SELECT lang,
         count(*)::BIGINT AS n,
         sum(len(text)::BIGINT)::BIGINT AS sx,
         sum({y})::BIGINT AS sy,
         sum((len(text)::BIGINT) * (len(text)::BIGINT))::BIGINT AS sxx,
         sum({y} * {y})::BIGINT AS syy,
         sum((len(text)::BIGINT) * {y})::BIGINT AS sxy
  FROM {table} GROUP BY lang
),
m AS (
  SELECT lang, n,
         sx::DOUBLE / n::DOUBLE AS mx, sy::DOUBLE / n::DOUBLE AS my,
         greatest(sxx::DOUBLE / n::DOUBLE
                  - (sx::DOUBLE / n::DOUBLE) * (sx::DOUBLE / n::DOUBLE),
                  0.0) AS vx,
         greatest(syy::DOUBLE / n::DOUBLE
                  - (sy::DOUBLE / n::DOUBLE) * (sy::DOUBLE / n::DOUBLE),
                  0.0) AS vy,
         sxy::DOUBLE / n::DOUBLE
           - (sx::DOUBLE / n::DOUBLE) * (sy::DOUBLE / n::DOUBLE) AS cov
  FROM g
)
SELECT lang, n,
       round(mx, 4) AS mean_chars, round(my, 4) AS mean_tokens,
       round(vx, 4) AS var_chars, round(vy, 4) AS var_tokens,
       round(cov, 4) AS covariance,
       round(CASE WHEN vx > 0.0 AND vy > 0.0
                  THEN cov / sqrt(vx * vy) ELSE 0.0 END, 4) AS correlation
FROM m
"""


def range_agg_sql(table: str = "documents") -> str:
    """Mirrors operators/textstats.py::range_agg: frozen RANGE_BUCKETS
    (from inclusive, to exclusive), empty buckets kept with zero-filled
    stats."""
    rows = ", ".join(
        f"({i}, '{ts._range_key(lo, hi)}')"
        for i, (lo, hi) in enumerate(ts.RANGE_BUCKETS)
    )
    case = "CASE "
    for i, (lo, hi) in enumerate(ts.RANGE_BUCKETS):
        conds = []
        if lo is not None:
            conds.append(f"len(text) >= {lo}")
        if hi is not None:
            conds.append(f"len(text) < {hi}")
        case += f"WHEN {' AND '.join(conds) or 'TRUE'} THEN {i} "
    case += "END"
    return f"""
WITH buckets(bucket_idx, range_key) AS (VALUES {rows}),
c AS (
  SELECT {case} AS bucket_idx,
         count(*)::BIGINT AS doc_count,
         min(len(text))::BIGINT AS min_chars,
         max(len(text))::BIGINT AS max_chars,
         sum(len(text)::BIGINT)::BIGINT AS sum_chars
  FROM {table} GROUP BY 1
)
SELECT b.bucket_idx::INT AS bucket_idx, b.range_key,
       coalesce(c.doc_count, 0)::BIGINT AS doc_count,
       coalesce(c.min_chars, 0)::BIGINT AS min_chars,
       coalesce(c.max_chars, 0)::BIGINT AS max_chars,
       coalesce(CASE WHEN c.doc_count > 0
                     THEN round(c.sum_chars::DOUBLE / c.doc_count::DOUBLE, 4)
                     END, 0.0) AS avg_chars
FROM buckets b LEFT JOIN c USING (bucket_idx)
"""


def gopher_rules_sql(width: int = cu.LINE_WIDTH,
                     table: str = "documents") -> str:
    """Mirrors curation.py::gopher_rules — MassiveText document-quality
    rules; raw-double comparisons, 4-dp rounded outputs, doc_lines chunk
    derivation for the two line-level ratios."""
    stops = " + ".join(
        f"(CASE WHEN list_contains(lk, '{w}') THEN 1 ELSE 0 END)"
        for w in cu.GOPHER_STOPS
    )
    ws = cu.LINE_WS
    return f"""
WITH w0 AS (
  SELECT doc_id, trim(text) AS t,
         string_split_regex(trim(text), '{ws}') AS tk,
         string_split_regex(lower(trim(text)), '{ws}') AS lk
  FROM {table}
),
w AS (
  SELECT doc_id,
         (CASE WHEN t = '' THEN 0 ELSE len(tk) END)::BIGINT AS n_words,
         CASE WHEN t = '' OR len(tk) = 0 THEN 0.0
              ELSE len(regexp_replace(t, '{ws}', '', 'g'))::DOUBLE
                   / len(tk)::DOUBLE END AS mwl,
         CASE WHEN t = '' OR len(tk) = 0 THEN 0.0
              ELSE (len(regexp_extract_all(t, '#'))
                    + len(regexp_extract_all(t, '\\.\\.\\.'))
                    + len(regexp_extract_all(t, '…')))::DOUBLE
                   / len(tk)::DOUBLE END AS sym,
         CASE WHEN t = '' OR len(tk) = 0 THEN 0.0
              ELSE len(list_filter(tk,
                       x -> regexp_matches(x, '{cu._ALPHA_CLASS}')))::DOUBLE
                   / len(tk)::DOUBLE END AS alpha,
         ({stops})::INT AS n_stop
  FROM w0
),
toks AS (
  SELECT doc_id, string_split_regex(trim(text), '{ws}') AS tk
  FROM {table}
),
lines0 AS (
  SELECT doc_id,
         array_to_string(tk[(r.i*{width}+1):((r.i+1)*{width})], ' ') AS line
  FROM toks, LATERAL unnest(
    generate_series(0, CAST(ceil(len(tk)/{width}.0) AS BIGINT) - 1)) AS r(i)
),
ln AS (
  SELECT doc_id, count(*)::DOUBLE AS nl,
         sum(CASE WHEN regexp_matches(line, '^[-*•] ') THEN 1 ELSE 0 END)::DOUBLE
           AS bullets,
         sum(CASE WHEN regexp_matches(line, '(\\.\\.\\.|…)$') THEN 1 ELSE 0 END)::DOUBLE
           AS ellipses
  FROM lines0 WHERE line <> '' GROUP BY doc_id
),
j AS (
  SELECT w.*, coalesce(ln.bullets / ln.nl, 0.0) AS bullet_ratio,
         coalesce(ln.ellipses / ln.nl, 0.0) AS ellipsis_ratio
  FROM w LEFT JOIN ln USING (doc_id)
)
SELECT doc_id, n_words,
       round(mwl, 4) AS mean_word_len,
       round(sym, 4) AS symbol_ratio,
       round(bullet_ratio, 4) AS bullet_ratio,
       round(ellipsis_ratio, 4) AS ellipsis_ratio,
       round(alpha, 4) AS alpha_ratio,
       n_stop,
       (n_words >= {cu.GOPHER_MIN_WORDS} AND n_words <= {cu.GOPHER_MAX_WORDS}
        AND mwl >= {cu.GOPHER_MWL_LO} AND mwl <= {cu.GOPHER_MWL_HI}
        AND sym <= {cu.GOPHER_MAX_SYMBOL_RATIO}
        AND bullet_ratio <= {cu.GOPHER_MAX_BULLET_RATIO}
        AND ellipsis_ratio <= {cu.GOPHER_MAX_ELLIPSIS_RATIO}
        AND alpha >= {cu.GOPHER_MIN_ALPHA_RATIO}
        AND n_stop >= {cu.GOPHER_MIN_STOPS}) AS keep_doc
FROM j
"""


def string_stats_sql(table: str = "documents") -> str:
    """Mirrors textstats.py::string_stats — exact length stats + Shannon
    entropy (bits) of the corpus character distribution from exact BIGINT
    counts."""
    return f"""
WITH lens AS (
  SELECT count(*)::BIGINT AS n_docs,
         min(len(text))::BIGINT AS min_len,
         max(len(text))::BIGINT AS max_len,
         sum(len(text)::BIGINT)::BIGINT AS sum_len
  FROM {table}
),
chars AS (
  SELECT c.ch AS c, count(*)::BIGINT AS cnt
  FROM {table}, unnest(string_split(text, '')) AS c(ch)
  WHERE c.ch <> ''
  GROUP BY c.ch
),
tot AS (SELECT sum(cnt)::BIGINT AS total FROM chars),
ent AS (
  SELECT round(-sum((cnt::DOUBLE / total::DOUBLE)
                    * log2(cnt::DOUBLE / total::DOUBLE)), 4) AS entropy
  FROM chars CROSS JOIN tot
)
SELECT n_docs, min_len, max_len,
       round(sum_len::DOUBLE / n_docs::DOUBLE, 4) AS avg_len,
       entropy
FROM lens CROSS JOIN ent
"""


def weighted_avg_quality_sql(table: str = "documents") -> str:
    """Mirrors textstats.py::weighted_avg_quality — length-weighted mean
    of the 4-dp quality score per lang, zero-weight docs excluded."""
    return f"""
WITH q AS ({quality_scores_sql(table).strip()})
SELECT d.lang, count(*)::BIGINT AS n,
       round(sum(q.quality * q.n_chars::DOUBLE)
             / sum(q.n_chars::DOUBLE), 4) AS w_avg_quality
FROM {table} d JOIN q USING (doc_id)
WHERE q.n_chars > 0
GROUP BY d.lang
"""


# ------------------------------------------------------ function_score family

def search_decay_sql(
    query_terms: list[str],
    mode: str = "gauss",
    scale_days: float | None = None,
    offset_days: float | None = None,
    decay: float | None = None,
    rerank_window: int = 50,
    limit: int = 20,
    table: str = "documents",
) -> str:
    """Mirrors operators/scoring_boosts.py::decay_function_score — the ES
    function_score date-decay trio over the BM25 top-`rerank_window`
    (origin = corpus max warc_ts; warc_ts ≡ 1704067200 + 60·doc_id by
    fixture). Decay constants are computed once in Python from the SAME
    module constants the Spark plan uses, so the two engines share one
    parameterization."""
    import math

    from ..operators import scoring_boosts as sb
    from .oracle_fragments import search_bm25_sql

    scale = float(sb.DECAY_SCALE_DAYS if scale_days is None else scale_days)
    offset = float(
        sb.DECAY_OFFSET_DAYS if offset_days is None else offset_days
    )
    dec = float(sb.DECAY_VALUE if decay is None else decay)
    dist = f"greatest(0.0, ((mx.ep - (1704067200 + 60 * h.doc_id)) / 86400.0) - {repr(offset)})"
    if mode == "gauss":
        sigma2 = -(scale * scale) / (2.0 * math.log(dec))
        mult = f"exp(-({dist} * {dist}) / {repr(2.0 * sigma2)})"
    elif mode == "exp":
        lam = math.log(dec) / scale
        mult = f"exp({repr(lam)} * {dist})"
    elif mode == "linear":
        s = scale / (1.0 - dec)
        mult = f"greatest(0.0, ({repr(s)} - {dist}) / {repr(s)})"
    else:
        raise ValueError(f"unknown decay mode: {mode}")
    return f"""
WITH hits AS ({search_bm25_sql(query_terms, limit=rerank_window, table=table)}),
mx AS (SELECT max(1704067200 + 60 * doc_id) AS ep FROM {table}),
b AS (
  SELECT h.doc_id, round(h.score * {mult}, 4) AS score
  FROM hits h, mx
)
SELECT doc_id, score FROM b
ORDER BY score DESC, doc_id ASC
LIMIT {limit}
"""


def search_rank_feature_sql(
    query_terms: list[str],
    fn: str = "saturation",
    rerank_window: int = 50,
    limit: int = 20,
    table: str = "documents",
) -> str:
    """Mirrors operators/scoring_boosts.py::rank_feature_boost — additive
    saturating boost from the frozen 4-dp quality score over the BM25
    top-`rerank_window`."""
    from ..operators import scoring_boosts as sb
    from .oracle_fragments import search_bm25_sql

    pivot, weight = repr(float(sb.RF_PIVOT)), repr(float(sb.RF_WEIGHT))
    if fn == "saturation":
        s = f"(f.quality / (f.quality + {pivot}))"
    elif fn == "log":
        s = f"ln({repr(float(sb.RF_LOG_SCALING))} + f.quality)"
    elif fn == "sigmoid":
        e = float(sb.RF_SIGMOID_EXP)
        s = (
            f"(pow(f.quality, {repr(e)})"
            f" / (pow(f.quality, {repr(e)}) + {repr(float(sb.RF_PIVOT) ** e)}))"
        )
    else:
        raise ValueError(f"unknown rank_feature function: {fn}")
    return f"""
WITH hits AS ({search_bm25_sql(query_terms, limit=rerank_window, table=table)}),
feat AS (SELECT doc_id, quality FROM ({quality_scores_sql(table).strip()})),
b AS (
  SELECT h.doc_id, round(h.score + {weight} * {s}, 4) AS score
  FROM hits h JOIN feat f USING (doc_id)
)
SELECT doc_id, score FROM b
ORDER BY score DESC, doc_id ASC
LIMIT {limit}
"""


def random_score_sql(
    seed: int | None = None, limit: int = 20, table: str = "documents"
) -> str:
    """Mirrors operators/scoring_boosts.py::random_score — deterministic
    seeded uniform draw via the portable h60 hash."""
    from ..operators import scoring_boosts as sb

    sd = int(sb.RANDOM_SEED if seed is None else seed)
    rng = repr(float(1 << 60))
    key = f"('rs{sd}:' || doc_id::VARCHAR)"
    return f"""
SELECT doc_id, round({h60_sql(key)} / {rng}, 4) AS rscore
FROM {table}
ORDER BY rscore DESC, doc_id ASC
LIMIT {limit}
"""


# ------------------------------------------------------- bucket aggregations

def multi_terms_sql(size: int = 10, table: str = "documents") -> str:
    """Mirrors operators/bucket_aggs.py::multi_terms_agg — compound-key
    terms aggregation ranked by combined doc_count."""
    return f"""
SELECT {SITE_KEY_SQL} AS site_key, lang,
       count(*)::BIGINT AS doc_count, sum(n_chars)::BIGINT AS sum_chars
FROM {table}
GROUP BY 1, 2
ORDER BY doc_count DESC, site_key ASC, lang ASC
LIMIT {size}
"""


def filters_agg_sql(table: str = "documents") -> str:
    """Mirrors operators/bucket_aggs.py::filters_agg — non-exclusive named
    predicate buckets via conditional sums + UNPIVOT-style union."""
    from ..operators.bucket_aggs import FILTERS_SPEC

    parts = [
        f"""SELECT '{key}' AS bucket,
       count(*) FILTER ({pred})::BIGINT AS doc_count,
       coalesce(sum(n_chars) FILTER ({pred}), 0)::BIGINT AS sum_chars
FROM {table}"""
        for key, pred in FILTERS_SPEC
    ]
    return "\nUNION ALL\n".join(parts)


def date_range_agg_sql(table: str = "documents") -> str:
    """Mirrors operators/bucket_aggs.py::date_range_agg — overlapping
    half-open [from, to) buckets over warc_ts (fixture: epoch+60·doc_id)."""
    from ..operators.bucket_aggs import DATE_RANGES, _EPOCH

    parts = []
    for key, lo, hi in DATE_RANGES:
        conds = []
        if lo is not None:
            conds.append(f"({_EPOCH} + 60 * doc_id) >= {_EPOCH + 60 * lo}")
        if hi is not None:
            conds.append(f"({_EPOCH} + 60 * doc_id) < {_EPOCH + 60 * hi}")
        where = " AND ".join(conds) if conds else "TRUE"
        f_ts = "CAST(NULL AS BIGINT)" if lo is None else str(_EPOCH + 60 * lo)
        t_ts = "CAST(NULL AS BIGINT)" if hi is None else str(_EPOCH + 60 * hi)
        parts.append(
            f"""SELECT '{key}' AS bucket, {f_ts} AS from_ts, {t_ts} AS to_ts,
       count(*) FILTER ({where})::BIGINT AS doc_count
FROM {table}"""
        )
    return "\nUNION ALL\n".join(parts)


def percentile_ranks_sql(
    values: tuple[float, ...] | None = None, table: str = "documents"
) -> str:
    """Mirrors operators/bucket_aggs.py::percentile_ranks — exact inverse
    quantiles of the whitespace token count, one conditional sum per
    probe value."""
    from ..operators import bucket_aggs as ba

    vals = ba.PR_VALUES if values is None else values
    ntok = (
        f"(CASE WHEN trim(text) = '' THEN 0"
        f" ELSE len(string_split_regex(trim(text), '{WS_SPLIT}')) END)"
    )
    blocks = []
    for v in vals:
        blocks.append(
            f"SELECT {repr(float(v))}::DOUBLE AS value,\n"
            f"  round(CASE WHEN t.t > 0 THEN"
            f" (SELECT sum(CASE WHEN n <= {repr(float(v))} THEN 1 ELSE 0 END)"
            f" FROM n) / t.t * 100.0 ELSE 0.0 END, 4) AS rank_pct FROM t"
        )
    union = "\nUNION ALL\n".join(blocks)
    return f"""
WITH n AS (SELECT {ntok}::DOUBLE AS n FROM {table}),
t AS (SELECT count(*)::DOUBLE AS t FROM n)
{union}
"""


def dl_histogram_dense_sql(width: int = 50, table: str = "documents") -> str:
    """Mirrors operators/bucket_aggs.py::dl_histogram_dense — min_doc_count=0
    histogram: zero-filled buckets between the observed min and max."""
    ntok = (
        f"(CASE WHEN trim(text) = '' THEN 0"
        f" ELSE len(string_split_regex(trim(text), '{WS_SPLIT}')) END)"
    )
    return f"""
WITH b AS (SELECT ({ntok} // {width}) * {width} AS bucket_lo FROM {table}),
bounds AS (SELECT min(bucket_lo) AS lo, max(bucket_lo) AS hi FROM b),
spine AS (
  SELECT unnest(generate_series(lo, hi, {width})) AS bucket_lo FROM bounds
),
c AS (SELECT bucket_lo, count(*)::BIGINT AS cnt FROM b GROUP BY bucket_lo)
SELECT s.bucket_lo::BIGINT AS bucket_lo,
       coalesce(c.cnt, 0)::BIGINT AS n_docs
FROM spine s LEFT JOIN c USING (bucket_lo)
ORDER BY bucket_lo
"""


def sampler_agg_sql(
    query_terms: list[str],
    sample_size: int | None = None,
    table: str = "documents",
) -> str:
    """Mirrors operators/bucket_aggs.py::sampler_agg — sub-aggregation over
    only the `sample_size` best-scoring hits (pinned total order)."""
    from ..operators import bucket_aggs as ba
    from .oracle_fragments import search_bm25_sql

    k = int(ba.SAMPLER_SIZE if sample_size is None else sample_size)
    return f"""
WITH hits AS ({search_bm25_sql(query_terms, limit=k, table=table)})
SELECT d.lang, count(*)::BIGINT AS doc_count
FROM hits h JOIN {table} d USING (doc_id)
GROUP BY d.lang
ORDER BY doc_count DESC, lang ASC
"""


def diversified_sampler_sql(
    query_terms: list[str],
    sample_size: int | None = None,
    max_per_site: int | None = None,
    rerank_window: int = 200,
    table: str = "documents",
) -> str:
    """Mirrors operators/bucket_aggs.py::diversified_sampler_agg — at most
    `max_per_site` docs per site admitted to the sample before the size
    cut."""
    from ..operators import bucket_aggs as ba
    from .oracle_fragments import search_bm25_sql

    k = int(ba.SAMPLER_SIZE if sample_size is None else sample_size)
    m = int(
        ba.DIVERSIFIED_MAX_PER_SITE if max_per_site is None else max_per_site
    )
    return f"""
WITH hits AS ({search_bm25_sql(query_terms, limit=rerank_window, table=table)}),
r AS (
  SELECT h.doc_id, h.score, {SITE_KEY_SQL} AS site_key
  FROM hits h JOIN {table} USING (doc_id)
),
rn AS (
  SELECT doc_id, score,
         row_number() OVER (PARTITION BY site_key
                            ORDER BY score DESC, doc_id ASC) AS rn
  FROM r
),
samp AS (
  SELECT doc_id FROM rn WHERE rn <= {m}
  ORDER BY score DESC, doc_id ASC LIMIT {k}
)
SELECT d.lang, count(*)::BIGINT AS doc_count
FROM samp JOIN {table} d USING (doc_id)
GROUP BY d.lang
ORDER BY doc_count DESC, lang ASC
"""


def search_combined_fields_bm25_sql(
    query_terms: list[str],
    k1: float | None = None,
    b: float = 0.75,
    w_body: float | None = None,
    w_anchor: float | None = None,
    limit: int = 20,
    offset: int = 0,
    table: str = "documents",
) -> str:
    """ES combined_fields / Lucene CombinedFieldQuery — mirrors
    operators/anchors.py::search_combined_fields: weighted term freqs
    and field lengths ADD into one synthetic field, ONE BM25 with a
    single (k1, b) over the merged statistics, idf from
    union-of-fields df."""
    from ..operators import anchors as an

    k1 = an.K1_DEFAULT if k1 is None else k1
    w_body = an.W_BODY if w_body is None else w_body
    w_anchor = an.W_ANCHOR if w_anchor is None else w_anchor
    uniq = sorted(set(query_terms))
    terms_in = "(" + ", ".join(f"'{t}'" for t in uniq) + ")"
    return f"""
WITH {terms_cte(table)},
{_anchor_terms_ctes(table).strip()},
bpost AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms
  WHERE term IN {terms_in} GROUP BY doc_id, term
),
apost AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM aterms
  WHERE term IN {terms_in} GROUP BY doc_id, term
),
bdl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM terms GROUP BY doc_id),
adl AS (SELECT doc_id, count(*)::DOUBLE AS adl FROM aterms GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM {table})::DOUBLE AS n_docs,
         (SELECT sum(coalesce(bdl.dl,0))
          FROM {table} d LEFT JOIN bdl USING (doc_id))
           / (SELECT count(*) FROM {table}) AS avgdl,
         (SELECT coalesce(sum(adl.adl),0) FROM adl)
           / (SELECT count(*) FROM {table}) AS avg_adl
),
dfu AS (
  SELECT term, count(*)::DOUBLE AS df FROM (
    SELECT doc_id, term FROM bpost
    UNION
    SELECT doc_id, term FROM apost
  ) GROUP BY term
),
merged AS (
  SELECT coalesce(b.doc_id, a.doc_id) AS doc_id,
         coalesce(b.term, a.term) AS term,
         {repr(w_body)} * coalesce(b.tf, 0)
           + {repr(w_anchor)} * coalesce(a.tf, 0) AS tf_c
  FROM bpost b FULL OUTER JOIN apost a
    ON a.doc_id = b.doc_id AND a.term = b.term
),
scored AS (
  SELECT m.doc_id,
         sum( ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
              * m.tf_c * ({repr(k1)} + 1)
              / (m.tf_c + {repr(k1)} * (1 - {repr(b)} + {repr(b)}
                  * ({repr(w_body)} * coalesce(bdl.dl, 0)
                     + {repr(w_anchor)} * coalesce(adl.adl, 0))
                  / ({repr(w_body)} * s.avgdl
                     + {repr(w_anchor)} * s.avg_adl))) ) AS score
  FROM merged m
  JOIN dfu d USING (term)
  LEFT JOIN bdl ON bdl.doc_id = m.doc_id
  LEFT JOIN adl ON adl.doc_id = m.doc_id
  CROSS JOIN stats s
  GROUP BY m.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored
ORDER BY round(score, 4) DESC, doc_id ASC
LIMIT {limit} OFFSET {offset}
"""


def coec_sql(n_positions: int = 10, min_views: int = 1,
             table: str = "events") -> str:
    """Mirrors operators/events.py::coec_scores — position priors from
    the same derived (item = props.k, pos = event_id % n + 1) log,
    EC = Σ view-event priors, COEC = clicks / EC."""
    return f"""
WITH base AS (
  SELECT json_extract(props, '$.k')::INT AS k,
         (event_id % {n_positions}) + 1 AS pos,
         (event_type = 'click')::BIGINT AS is_click,
         (event_type = 'view')::BIGINT AS is_view
  FROM {table} WHERE event_type IN ('view', 'click')
),
prior AS (
  SELECT pos, sum(is_click)::DOUBLE / sum(is_view) AS prior
  FROM base GROUP BY pos HAVING sum(is_view) > 0
),
per AS (
  SELECT k, sum(is_view)::BIGINT AS views,
         sum(is_click)::BIGINT AS clicks,
         sum(is_view * coalesce(prior, 0)) AS ec
  FROM base LEFT JOIN prior USING (pos)
  GROUP BY k HAVING sum(is_view) >= {int(min_views)}
)
SELECT k, views, clicks, round(ec, 4) AS expected_clicks,
       round(clicks / ec, 4) AS coec
FROM per
ORDER BY coec DESC, k ASC
"""


def ngram_contamination_sql(holdout_mod: int = 97, m_words: int = 64,
                            k_hashes: int = 2,
                            table: str = "documents") -> str:
    """Mirrors operators/bloom.py::ngram_contamination bit-for-bit: the
    holdout's word-shingle Bloom filter (same h60 re-hashes, 32-bit
    word packing) probed by every document's shingles, per-doc overlap
    ratio."""
    bits_per_word = 32
    m_bits = m_words * bits_per_word
    build_hashes = [h60_sql(f"('b{i}:' || shingle)") for i in range(k_hashes)]
    pos_union = "\n  UNION ALL\n".join(
        f"  SELECT {h} % {m_bits} AS pos FROM hsh" for h in build_hashes
    )
    p_cols = ",\n         ".join(
        f"{h} % {m_bits} AS p{i}" for i, h in enumerate(build_hashes)
    )
    joins = "\n".join(
        f"  LEFT JOIN words w{i} ON w{i}.widx = pr.p{i} // {bits_per_word}"
        for i in range(k_hashes)
    )
    hit = "\n    AND ".join(
        f"(((coalesce(w{i}.w, 0) >> (pr.p{i} % {bits_per_word})) & 1) = 1)"
        for i in range(k_hashes)
    )
    return f"""
WITH {_shingles_cte(table)},
hsh AS (SELECT shingle FROM shingles WHERE doc_id % {holdout_mod} = 0),
pos AS (
{pos_union}
),
words AS (
  SELECT pos // {bits_per_word} AS widx,
         bit_or((1::BIGINT) << (pos % {bits_per_word})) AS w
  FROM pos GROUP BY widx
),
pr AS (
  SELECT doc_id, shingle,
         {p_cols}
  FROM shingles
),
hit AS (
  SELECT pr.doc_id,
         ({hit})::BIGINT AS flagged
  FROM pr
{joins}
)
SELECT doc_id, count(*)::BIGINT AS n_shingles,
       sum(flagged)::BIGINT AS n_flagged,
       round(sum(flagged)::DOUBLE / count(*), 4) AS overlap_ratio
FROM hit
GROUP BY doc_id
"""


def dedup_incremental_sql(table: str = "documents", threshold: float = 0.5,
                          new_mod: int = 13) -> str:
    """Mirrors operators/dedup.py::dedup_incremental — the NEW batch
    (doc_id % new_mod == 0) probes the corpus band table; collisions
    verify with candidate-driven exact Jaccard."""
    h = h60_sql("(perm::VARCHAR || ':' || shingle)")
    return f"""
WITH {_shingles_cte(table)},
sig AS (
  SELECT doc_id, perm::INT AS perm, min({h}) AS minhash
  FROM shingles, unnest(range(0, {dd.N_PERM})) AS p(perm)
  GROUP BY doc_id, perm
),
banded AS (
  SELECT doc_id, (perm // {dd.PERM_BAND}) AS band,
         string_agg(minhash::VARCHAR, '-' ORDER BY perm) AS band_key
  FROM sig GROUP BY doc_id, band
),
cand AS (
  SELECT DISTINCT n.doc_id AS doc_a, c.doc_id AS doc_b
  FROM banded n JOIN banded c
    ON n.band = c.band AND n.band_key = c.band_key
  WHERE n.doc_id % {new_mod} = 0 AND c.doc_id % {new_mod} <> 0
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cand c
  JOIN shingles a ON a.doc_id = c.doc_a
  JOIN shingles b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b,
       round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) >= {threshold}
"""


def item_transitions_sql(
    gap_min: int = 30, limit: int = 50, table: str = "events"
) -> str:
    """Mirrors operators/events.py::item_transitions — query-flow-graph
    edges over consecutive same-user views within the gap, self-loops
    dropped. Returns (prev_k, next_k, n)."""
    return f"""
WITH views AS (
  SELECT user_id, ts, event_id,
         json_extract(props, '$.k')::INT AS k
  FROM {table} WHERE event_type = 'view'
),
lagged AS (
  SELECT user_id, k,
         lag(k) OVER w AS prev_k,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
  FROM views
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT prev_k, k AS next_k, count(*)::BIGINT AS n
FROM lagged
WHERE prev_k IS NOT NULL AND gap_us <= {gap_min * 60 * 1000000}
  AND prev_k != k
GROUP BY prev_k, k
ORDER BY n DESC, prev_k ASC, next_k ASC
LIMIT {int(limit)}
"""


def session_abandonment_sql(gap_min: int = 30, table: str = "events") -> str:
    """Mirrors operators/events.py::session_abandonment — per day of
    session start: sessions / engaged (≥1 click) / abandoned (≥1 view,
    0 clicks) / rate. Shares the sessionize window logic."""
    return f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_min * 60 * 1000000}
              THEN 1
              WHEN lag(ts) OVER w IS NULL THEN 1
              ELSE 0 END AS new_session
  FROM {table}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
ids AS (
  SELECT user_id, ts, event_type, sum(new_session) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
  FROM flagged
),
per_session AS (
  SELECT user_id, session_id,
         min(ts) AS start_ts,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS has_view,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_click
  FROM ids GROUP BY user_id, session_id
)
SELECT date_trunc('day', start_ts) AS day,
       count(*)::BIGINT AS sessions,
       sum(has_click)::BIGINT AS engaged,
       sum(CASE WHEN has_view = 1 AND has_click = 0 THEN 1 ELSE 0 END)::BIGINT
         AS abandoned,
       round(sum(CASE WHEN has_view = 1 AND has_click = 0 THEN 1 ELSE 0 END)
             / count(*)::DOUBLE, 4) AS abandonment_rate
FROM per_session
GROUP BY 1
ORDER BY day
"""


def _nested_terms_ctes(chunk_size: int, table: str = "documents") -> str:
    """Shared CTE chain: non-overlapping chunks → analyzed terms keyed
    (doc_id, chunk_id). Mirrors operators/nested.py's chunk+analyze."""
    return f"""chunks AS ({chunk_documents_sql(chunk_size, 0, table)}),
cdocs AS (SELECT doc_id, chunk_id, chunk_text AS text FROM chunks),
{terms_cte('cdocs', extra_cols='d.chunk_id AS chunk_id').lstrip()}"""


def nested_match_sql(query_terms: list[str], chunk_size: int | None = None,
                     limit: int = 20, table: str = "documents") -> str:
    """Mirrors operators/nested.py::nested_match (score_mode=avg);
    chunk_size defaults to the operator's NESTED_CHUNK_SIZE (single
    source of truth). Returns (doc_id, n_chunks, score)."""
    from ..operators.nested import NESTED_CHUNK_SIZE
    from .oracle_fragments import _terms_in

    if chunk_size is None:
        chunk_size = NESTED_CHUNK_SIZE
    q = sorted(set(query_terms))
    in_pred = f"term IN {_terms_in(q)}" if q else "FALSE"
    return f"""
WITH {_nested_terms_ctes(chunk_size, table)},
per_chunk AS (
  SELECT doc_id, chunk_id, count(DISTINCT term) AS nt,
         count(*)::DOUBLE AS chunk_score
  FROM terms WHERE {in_pred}
  GROUP BY doc_id, chunk_id
)
SELECT doc_id, count(*)::BIGINT AS n_chunks,
       round(avg(chunk_score), 4) AS score
FROM per_chunk WHERE nt = {len(q)}
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {int(limit)}
"""


def flat_vs_nested_sql(query_terms: list[str], chunk_size: int | None = None,
                       table: str = "documents") -> str:
    """Mirrors operators/nested.py::flat_vs_nested; chunk_size defaults
    to the operator's NESTED_CHUNK_SIZE.
    Returns (doc_id, flat_match, nested_match)."""
    from ..operators.nested import NESTED_CHUNK_SIZE
    from .oracle_fragments import _terms_in

    if chunk_size is None:
        chunk_size = NESTED_CHUNK_SIZE
    q = sorted(set(query_terms))
    in_pred = f"term IN {_terms_in(q)}" if q else "FALSE"
    return f"""
WITH {_nested_terms_ctes(chunk_size, table)},
hits AS (SELECT doc_id, chunk_id, term FROM terms WHERE {in_pred}),
per_chunk AS (
  SELECT doc_id, chunk_id, count(DISTINCT term) AS nt
  FROM hits GROUP BY doc_id, chunk_id
),
flat AS (
  SELECT doc_id FROM hits GROUP BY doc_id
  HAVING count(DISTINCT term) = {len(q)}
),
nested AS (
  SELECT DISTINCT doc_id FROM per_chunk WHERE nt = {len(q)}
)
SELECT f.doc_id, TRUE AS flat_match,
       (n.doc_id IS NOT NULL) AS nested_match
FROM flat f LEFT JOIN nested n ON n.doc_id = f.doc_id
ORDER BY f.doc_id
"""


def _anchor_edges_cte(table: str = "documents") -> str:
    """CTE chain `edges0c → edgesc` — the bare resolved anchor-edge
    relation (fixture derivation: chain + tree back-edge), shared by the
    parent-child oracles."""
    return f"""
edges0c AS (
  SELECT doc_id AS src, t.dst
  FROM {table}, LATERAL unnest([doc_id + 1, doc_id // 2]) AS t(dst)
  WHERE t.dst <> doc_id
),
edgesc AS (
  SELECT src, dst FROM edges0c WHERE dst IN (SELECT doc_id FROM {table})
)"""


def _anchor_child_ctes(table: str = "documents") -> str:
    """CTE chain `edgesc → canchors → ctoks → cterms` — like
    _anchor_terms_ctes but KEEPING the (src, dst) child key, for the
    parent-child join-field oracles. Requires `lemma_dict` in scope
    (has_child_sql emits it directly)."""
    from ..operators import anchors as an
    from ..textproc.tokenize import BOUNDARY_STRIP, WORD_PATTERN

    aw_rows = ", ".join(
        f"({i}, '{w}')" for i, w in enumerate(an.ANCHOR_WORDS)
    )
    n = len(an.ANCHOR_WORDS)
    return f"""
{_anchor_edges_cte(table).strip()},
awc AS (SELECT * FROM (VALUES {aw_rows}) v(i, w)),
canchors AS (
  SELECT e.src, e.dst, wd.w || ' ' || ws.w AS text
  FROM edgesc e
  JOIN awc wd ON wd.i = (e.dst % {n})
  JOIN awc ws ON ws.i = (e.src % {n})
),
ctoks AS (
  SELECT d.src, d.dst,
         regexp_replace(t.tok, '{BOUNDARY_STRIP}', '', 'g') AS term
  FROM canchors d,
       unnest(string_split_regex(lower(trim(d.text)), '{WS_SPLIT}')) AS t(tok)
),
cterms AS (
  SELECT ctoks.src, ctoks.dst, coalesce(ld.normal, {rule_lemma_sql('ctoks.term')}) AS term
  FROM ctoks LEFT JOIN lemma_dict ld ON ld.word = ctoks.term
  WHERE ctoks.term <> ''
    AND regexp_matches(ctoks.term, '{WORD_PATTERN}')
    AND ctoks.term NOT IN {sql_not_in_list()}
)"""


def has_child_sql(query_terms: list[str], min_children: int = 1,
                  limit: int = 20, table: str = "documents") -> str:
    """Mirrors operators/anchors.py::has_child (score_mode=sum).
    Returns (doc_id, n_children, score)."""
    from .oracle_fragments import _terms_in, lemma_dict_values

    q = sorted(set(query_terms))
    in_pred = f"term IN {_terms_in(q)}" if q else "FALSE"
    return f"""
WITH lemma_dict AS ({lemma_dict_values()}),
{_anchor_child_ctes(table).strip()},
child AS (
  SELECT src, dst, count(*)::DOUBLE AS child_score
  FROM cterms WHERE {in_pred}
  GROUP BY src, dst
)
SELECT dst AS doc_id, count(*)::BIGINT AS n_children,
       round(sum(child_score), 4) AS score
FROM child GROUP BY dst
HAVING count(*) >= {int(min_children)}
ORDER BY score DESC, n_children DESC, doc_id ASC
LIMIT {int(limit)}
"""


def has_parent_sql(query_terms: list[str],
                   table: str = "documents") -> str:
    """Mirrors operators/anchors.py::has_parent — body terms for the
    parent predicate + the bare edge relation (the child analyzer chain
    is not a dependency here). Returns (src_doc, dst_doc)."""
    from .oracle_fragments import _terms_in

    q = sorted(set(query_terms))
    in_pred = f"term IN {_terms_in(q)}" if q else "FALSE"
    return f"""
WITH {terms_cte(table)},
{_anchor_edges_cte(table).strip()},
parents AS (
  SELECT doc_id FROM terms WHERE {in_pred}
  GROUP BY doc_id HAVING count(DISTINCT term) = {len(q)}
)
SELECT e.src AS src_doc, e.dst AS dst_doc
FROM edgesc e JOIN parents p ON p.doc_id = e.dst
ORDER BY src_doc, dst_doc
"""


def boxplot_sql(table: str = "documents") -> str:
    """Mirrors operators/bucket_aggs.py::boxplot_agg — exact
    linear-interpolated quartiles of the whitespace token count
    (quantile_cont == Spark `percentile` on integer inputs)."""
    ntok = (
        f"(CASE WHEN trim(text) = '' THEN 0"
        f" ELSE len(string_split_regex(trim(text), '{WS_SPLIT}')) END)"
    )
    return f"""
WITH n AS (SELECT {ntok}::BIGINT AS v FROM {table})
SELECT min(v)::BIGINT AS min_v,
       round(quantile_cont(v, 0.25), 4) AS q1,
       round(quantile_cont(v, 0.5), 4) AS q2,
       round(quantile_cont(v, 0.75), 4) AS q3,
       max(v)::BIGINT AS max_v,
       count(*)::BIGINT AS n
FROM n
"""


def t_test_sql(lang: str = "en", table: str = "documents") -> str:
    """Mirrors operators/bucket_aggs.py::t_test_agg — Welch t statistic
    between lang==X docs and the rest over token counts, exact integer
    moments, identical operation order."""
    ntok = (
        f"(CASE WHEN trim(text) = '' THEN 0"
        f" ELSE len(string_split_regex(trim(text), '{WS_SPLIT}')) END)"
    )
    return f"""
WITH x AS (SELECT {ntok}::BIGINT AS v, (lang = '{lang}') AS a FROM {table}),
m AS (
  SELECT sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS n_a,
         sum(CASE WHEN NOT a THEN 1 ELSE 0 END)::BIGINT AS n_b,
         sum(CASE WHEN a THEN v ELSE 0 END)::BIGINT AS s_a,
         sum(CASE WHEN NOT a THEN v ELSE 0 END)::BIGINT AS s_b,
         sum(CASE WHEN a THEN v * v ELSE 0 END)::BIGINT AS q_a,
         sum(CASE WHEN NOT a THEN v * v ELSE 0 END)::BIGINT AS q_b
  FROM x
)
SELECT round((s_a::DOUBLE / n_a - s_b::DOUBLE / n_b)
             / sqrt(((q_a::DOUBLE - s_a::DOUBLE * s_a / n_a) / (n_a - 1.0)) / n_a
                    + ((q_b::DOUBLE - s_b::DOUBLE * s_b / n_b) / (n_b - 1.0)) / n_b),
             4) AS t_value,
       n_a, n_b,
       round(s_a::DOUBLE / n_a, 4) AS mean_a,
       round(s_b::DOUBLE / n_b, 4) AS mean_b
FROM m
"""


def rate_agg_sql(table: str = "events") -> str:
    """Mirrors operators/events.py::rate_agg — daily buckets normalized
    to the per-hour unit, DECIMAL-exact value sums, 4-dp rates in the
    same operation order."""
    return f"""
SELECT date_trunc('day', ts) AS day,
       count(*)::BIGINT AS n,
       round(count(*)::DOUBLE / 24.0, 4) AS rate_per_hour,
       sum(value::DECIMAL(18,2))::DECIMAL(18,2)::DOUBLE AS value_per_day
FROM {table} GROUP BY 1
"""


def variable_width_histogram_sql(buckets: int = 4,
                                 table: str = "events") -> str:
    """Mirrors operators/events.py::variable_width_histogram —
    equal-frequency clusters split at exact interpolated quantiles of
    the integer-CENTS values (quantile_cont == Spark percentile on
    ints), bucket id = 1 + Σ (cents > cut_i)."""
    qs = [i / buckets for i in range(1, buckets)]
    cut_cols = ", ".join(
        f"quantile_cont(v, {q!r}) AS c{i}" for i, q in enumerate(qs)
    )
    bucket_expr = "1" + "".join(
        f" + (n.v > c.c{i})::INT" for i in range(len(qs))
    )
    # buckets=1: no cuts — drop the (otherwise empty-select) c CTE and
    # assign everything to cluster 1, the operator's degenerate form
    c_cte = f"c AS (SELECT {cut_cols} FROM n),\n" if qs else ""
    joined = "n CROSS JOIN c" if qs else "n"
    return f"""
WITH n AS (
  SELECT round(value * 100)::BIGINT AS v FROM {table}
),
{c_cte}assigned AS (
  SELECT ({bucket_expr})::INT AS bucket, n.v FROM {joined}
)
SELECT bucket, count(*)::BIGINT AS n,
       (min(v)::DOUBLE / 100.0) AS min_v,
       (max(v)::DOUBLE / 100.0) AS max_v,
       round(sum(v)::DOUBLE / count(*)::DOUBLE / 100.0, 4) AS avg_v
FROM assigned GROUP BY bucket
"""


def change_point_sql(table: str = "events") -> str:
    """Mirrors operators/events.py::change_point — argmax mean-shift
    split of the daily count series; windows run over the bounded daily
    series only."""
    return f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, count(*)::BIGINT AS n
  FROM {table} GROUP BY 1
),
cum AS (
  SELECT day,
         sum(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum_n,
         row_number() OVER (ORDER BY day) AS i,
         sum(n) OVER () AS tot,
         count(*) OVER () AS m,
         lead(day, 1) OVER (ORDER BY day) AS change_day
  FROM daily
)
SELECT change_day,
       round(abs(cum_n::DOUBLE / i::DOUBLE
                 - (tot - cum_n)::DOUBLE / (m - i)::DOUBLE), 4) AS diff
FROM cum
WHERE i < m
ORDER BY diff DESC, day ASC
LIMIT 1
"""


def cumulative_cardinality_sql(table: str = "events") -> str:
    """Mirrors operators/events.py::cumulative_cardinality — exact
    distinct-users-to-date via per-user first-seen day; every histogram
    day emits a row (new_users 0 where none)."""
    return f"""
WITH fs AS (
  SELECT user_id, min(date_trunc('day', ts)) AS day
  FROM {table} GROUP BY user_id
),
nu AS (SELECT day, count(*)::BIGINT AS nu FROM fs GROUP BY day),
days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM {table})
SELECT d.day,
       coalesce(nu.nu, 0)::BIGINT AS new_users,
       sum(coalesce(nu.nu, 0)) OVER (ORDER BY d.day
           ROWS UNBOUNDED PRECEDING)::BIGINT AS total_users
FROM days d LEFT JOIN nu USING (day)
"""


def events_retention_sql(table: str = "events") -> str:
    """Mirrors operators/events.py::events_retention — cohort = per-user
    min activity day; activity distinct (user, day); sparse (cohort_day,
    day_offset, n_users) triangle."""
    return f"""
WITH activity AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM {table}
),
cohorts AS (
  SELECT user_id, min(day) AS cohort_day FROM activity GROUP BY user_id
)
SELECT c.cohort_day,
       date_diff('day', c.cohort_day, a.day)::INT AS day_offset,
       count(*)::BIGINT AS n_users
FROM activity a JOIN cohorts c USING (user_id)
GROUP BY 1, 2
"""


def normalize_agg_sql(table: str = "events") -> str:
    """Mirrors operators/events.py::normalize_agg — ES `normalize`
    pipeline agg: percent_of_sum and rescale_0_100 over the daily
    count histogram, 4-dp rounds in the Spark expression's operation
    order, flat series rescales to 0."""
    return f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, count(*)::BIGINT AS n
  FROM {table} GROUP BY 1
),
st AS (
  SELECT sum(n)::BIGINT AS tot, min(n)::BIGINT AS mn, max(n)::BIGINT AS mx
  FROM daily
)
SELECT day, n,
       round(n::DOUBLE / tot::DOUBLE, 4) AS pct_of_sum,
       CASE WHEN mx = mn THEN 0.0
            ELSE round((n - mn)::DOUBLE / (mx - mn)::DOUBLE * 100.0, 4)
       END AS rescaled
FROM daily CROSS JOIN st
"""


def mojibake_stats_sql(table: str = "documents") -> str:
    """Mirrors operators/curation.py::mojibake_stats — marker-char
    counts from the frozen MOJIBAKE_CLASS, per-1k-chars rate 4 dp,
    char-based length semantics on both engines."""
    t = "coalesce(text, '')"
    cls = cu.MOJIBAKE_CLASS
    marks = (
        f"(length({t}) - length(regexp_replace({t}, '{cls}', '', 'g')))"
    )
    return f"""
SELECT doc_id,
       length({t})::BIGINT AS n_chars,
       {marks}::BIGINT AS n_marks,
       CASE WHEN length({t}) = 0 THEN 0.0
            ELSE round({marks}::DOUBLE * 1000.0 / length({t})::DOUBLE, 4)
       END AS marks_per_kchar,
       ({marks} = 0) AS clean
FROM {table}
"""


def _lines_with_site_cte(width: int, table: str) -> str:
    """doc_lines + the derived site_key, shared by the boilerplate
    mirrors (same pinned WS_SPLIT class and chunk slicing as
    line_dedup_sql)."""
    return f"""toks AS (
  SELECT doc_id, {SITE_KEY_SQL} AS site_key,
         string_split_regex(trim(text), '{cu.LINE_WS}') AS tk
  FROM {table}
),
lines0 AS (
  SELECT doc_id, site_key, r.i AS line_no,
         array_to_string(tk[(r.i*{width}+1):((r.i+1)*{width})], ' ') AS line
  FROM toks, LATERAL unnest(
    generate_series(0, CAST(ceil(len(tk)/{width}.0) AS BIGINT) - 1)) AS r(i)
),
occ AS (
  SELECT doc_id, site_key, line_no, line FROM lines0 WHERE line <> ''
)"""


def boilerplate_lines_sql(min_pages: int = 2, min_frac: float = 0.5,
                          width: int = cu.LINE_WIDTH,
                          table: str = "documents") -> str:
    """Mirrors curation.py::boilerplate_lines — per-site lines on
    >= min_pages pages and >= min_frac of the site's pages."""
    lh = h60_sql("line")
    return f"""
WITH {_lines_with_site_cte(width, table)},
per_line AS (
  SELECT site_key, {lh} AS lh,
         count(DISTINCT doc_id)::BIGINT AS n_pages,
         min(line) AS line
  FROM occ GROUP BY site_key, {lh}
  HAVING count(DISTINCT doc_id) >= {int(min_pages)}
),
sp AS (
  SELECT {SITE_KEY_SQL} AS site_key,
         count(DISTINCT doc_id)::BIGINT AS site_n
  FROM {table} GROUP BY 1
)
SELECT p.site_key, p.lh, p.line, p.n_pages,
       round(p.n_pages::DOUBLE / sp.site_n::DOUBLE, 4) AS frac
FROM per_line p JOIN sp USING (site_key)
WHERE p.n_pages::DOUBLE >= {float(min_frac)!r} * sp.site_n::DOUBLE
"""


def remove_boilerplate_sql(min_pages: int = 2, min_frac: float = 0.5,
                           width: int = cu.LINE_WIDTH,
                           table: str = "documents") -> str:
    """Mirrors curation.py::remove_boilerplate — per-page reassembly
    with the site's boilerplate lines dropped."""
    lh = h60_sql("line")
    return f"""
WITH {_lines_with_site_cte(width, table)},
per_line AS (
  SELECT site_key, {lh} AS lh,
         count(DISTINCT doc_id)::BIGINT AS n_pages
  FROM occ GROUP BY site_key, {lh}
  HAVING count(DISTINCT doc_id) >= {int(min_pages)}
),
sp AS (
  SELECT {SITE_KEY_SQL} AS site_key,
         count(DISTINCT doc_id)::BIGINT AS site_n
  FROM {table} GROUP BY 1
),
bp AS (
  SELECT p.site_key, p.lh FROM per_line p JOIN sp USING (site_key)
  WHERE p.n_pages::DOUBLE >= {float(min_frac)!r} * sp.site_n::DOUBLE
),
marked AS (
  SELECT o.doc_id, o.line_no, o.line,
         (bp.lh IS NULL) AS is_kept
  FROM occ o LEFT JOIN bp
    ON o.site_key = bp.site_key AND {h60_sql('o.line')} = bp.lh
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN is_kept THEN line END, chr(10)
                           ORDER BY line_no), '') AS clean_text,
       count(*) FILTER (WHERE is_kept)::BIGINT AS n_kept,
       count(*) FILTER (WHERE NOT is_kept)::BIGINT AS n_dropped
FROM marked GROUP BY doc_id
"""


def winnowing_sql(table: str = "documents") -> str:
    """Winnowing fingerprints — mirrors textstats.py::
    winnowing_fingerprints. The Spark side selects the leftmost minimal
    shingle hash per sliding window with array expressions; this mirror
    is the RELATIONAL formulation: expand (shingle i → the windows p
    that contain it), take min(h) per window, leftmost i among the
    minima, distinct. Same pinned window maths: n_win = max(n_sh−W+1,1),
    short docs form one truncated window."""
    k, w = ts.WINNOW_K, ts.WINNOW_W
    shingle = f"array_to_string(toks[t.i + 1 : t.i + {k}], ' ')"
    return f"""
WITH base AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '{WS_SPLIT}') AS toks
  FROM {table} WHERE trim(text) <> ''
),
sh AS (
  SELECT doc_id, t.i::BIGINT AS i, {h60_sql(shingle)} AS h,
         (len(toks) - {k} + 1)::BIGINT AS n_sh
  FROM base, LATERAL unnest(range(0, len(toks) - {k} + 1)) AS t(i)
  WHERE len(toks) >= {k}
),
w AS (
  SELECT s.doc_id, p.p, s.i, s.h
  FROM sh s, LATERAL unnest(range(greatest(s.i - {w} + 1, 0),
                    least(s.i, greatest(s.n_sh - {w}, 0)) + 1)) AS p(p)
),
mh AS (SELECT doc_id, p, min(h) AS fp FROM w GROUP BY doc_id, p),
sel AS (
  SELECT w.doc_id, w.p, min(w.i) AS pos, mh.fp
  FROM w JOIN mh ON mh.doc_id = w.doc_id AND mh.p = w.p AND w.h = mh.fp
  GROUP BY w.doc_id, w.p, mh.fp
)
SELECT DISTINCT doc_id, pos::BIGINT AS pos, fp FROM sel
"""


def mad_agg_sql(table: str = "documents") -> str:
    """Exact per-language median + MAD of token counts — mirrors
    textstats.py::mad_agg (quantile_cont == Spark percentile)."""
    ntok = (
        f"(CASE WHEN trim(text) = '' THEN 0"
        f" ELSE len(string_split_regex(trim(text), '{WS_SPLIT}')) END)"
    )
    return f"""
WITH n AS (SELECT lang, {ntok}::BIGINT AS n FROM {table}),
med AS (SELECT lang, quantile_cont(n, 0.5) AS median_n FROM n GROUP BY lang)
SELECT n.lang, round(med.median_n, 4) AS median_n,
       round(quantile_cont(abs(n.n - med.median_n), 0.5), 4) AS mad
FROM n JOIN med USING (lang) GROUP BY n.lang, med.median_n
"""


def ip_prefix_sql(table: str = "events") -> str:
    """ES ip_prefix aggregation — mirrors events.py::ip_prefix_agg
    (identical h60-derived synthetic IPv4 per user)."""
    from ..operators import events as ev

    bits = ev.IP_PREFIX_BITS
    shift = 32 - bits
    ip_str = f"'{ev.IP_SALT}' || user_id::VARCHAR"
    ip = f"({h60_sql(ip_str)} % 4294967296)"
    return f"""
WITH net AS (
  SELECT (({ip} >> {shift}) << {shift}) AS net, user_id FROM {table}
)
SELECT (net >> 24)::VARCHAR || '.' || ((net >> 16) % 256)::VARCHAR || '.'
         || ((net >> 8) % 256)::VARCHAR || '.' || (net % 256)::VARCHAR
         || '/{bits}' AS prefix,
       count(*)::BIGINT AS n_events,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM net GROUP BY net
"""


def redirect_resolve_sql(table: str = "documents") -> str:
    """Redirect-chain resolution — mirrors graph.py::redirect_resolve.
    The oracle walks the chain with a recursive CTE (safe: the fixture
    successor map steps strictly downward, so it is acyclic); the Spark
    side reaches the identical fixpoint by pointer doubling."""
    mod = gr.REDIR_MOD
    return f"""
WITH RECURSIVE redir AS (
  SELECT doc_id AS src, {gr.redirect_tgt_sql("doc_id")}::BIGINT AS tgt
  FROM {table} WHERE doc_id % {mod} = 1 AND doc_id > 0
),
walk AS (
  SELECT src AS src_doc, tgt AS cur, 1::BIGINT AS hops FROM redir
  UNION ALL
  SELECT w.src_doc, r.tgt, w.hops + 1
  FROM walk w JOIN redir r ON r.src = w.cur
)
SELECT src_doc, cur AS final_doc, hops FROM walk w
WHERE NOT EXISTS (SELECT 1 FROM redir r WHERE r.src = w.cur)
"""


def meta_robots_sql(table: str = "documents") -> str:
    """Robots-meta directive — mirrors graph.py::meta_robots. The Spark
    side regex-parses the head-injected tag out of the html bytes; this
    mirror re-derives the directive from the fixture arithmetic, so a
    lossy or spoofable parse cannot hash-match."""
    mod = gr.META_ROBOTS_MOD
    ninf, ni, nf = (
        gr.META_NOINDEX_NOFOLLOW,
        gr.META_NOINDEX,
        gr.META_NOFOLLOW,
    )
    return f"""
SELECT doc_id,
       (doc_id % {mod} = {ninf} OR doc_id % {mod} = {ni}) AS noindex,
       (doc_id % {mod} = {ninf} OR doc_id % {mod} = {nf}) AS nofollow
FROM {table}
"""


def sitemap_extract_sql(table: str = "documents") -> str:
    """Sitemap roundtrip — mirrors graph.py::sitemap_extract. The Spark
    side BUILDS the per-site sitemap XML and regex-parses it back; the
    oracle derives the expected (site, url, lastmod) relation directly
    from the doc arithmetic, pinning the parse losslessly."""
    from .oracle_fragments import URL_SQL

    return f"""
SELECT 'site-' || chr(97 + (doc_id % 3)::INT) || '.example' AS site,
       {URL_SQL} AS url,
       (DATE '{gr.SITEMAP_EPOCH}'
        + ((doc_id % {gr.SITEMAP_DAY_MOD})::INT))::VARCHAR AS lastmod
FROM {table}
"""


def moving_percentiles_sql(table: str = "events") -> str:
    """ES moving_percentiles — mirrors events.py::moving_percentiles.
    DuckDB's quantile_cont over a trailing ROWS window IS the pinned
    sort-plus-linear-interpolation definition the Spark side spells out
    as element arithmetic."""
    from ..operators import events as ev

    w = ev.MOVPCT_WINDOW
    cols = ",\n       ".join(
        f"round(quantile_cont(n, {q!r}) OVER (ORDER BY day ROWS BETWEEN "
        f"{w - 1} PRECEDING AND CURRENT ROW), 4) AS p{int(q * 100)}"
        for q in ev.MOVPCT_QS
    )
    return f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, count(*)::BIGINT AS n
  FROM {table} GROUP BY 1
)
SELECT day, n,
       {cols}
FROM daily
"""


def ip_range_sql(table: str = "events") -> str:
    """ES ip_range — mirrors events.py::ip_range_agg. The bounds/label
    assembly is imported from the operator (single source of truth);
    the hash-derived address computes ONCE in a CTE (the ip_prefix_sql
    precedent), not per CASE arm."""
    from ..operators import events as ev

    ip_str = f"'{ev.IP_SALT}' || user_id::VARCHAR"
    ip = f"({h60_sql(ip_str)} % 4294967296)"
    cases = []
    for lo, hi, key in ev.ip_range_bounds():
        conds = []
        if lo is not None:
            conds.append(f"ip >= {lo}")
        if hi is not None:
            conds.append(f"ip < {hi}")
        pred = " AND ".join(conds) if conds else "TRUE"
        cases.append(f"WHEN {pred} THEN '{key}'")
    case = "CASE " + " ".join(cases) + " END"
    return f"""
WITH i AS (SELECT {ip} AS ip, user_id FROM {table})
SELECT {case} AS range,
       count(*)::BIGINT AS n_events,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM i GROUP BY 1
"""


def percentiles_bucket_sql(table: str = "events") -> str:
    """ES percentiles_bucket — mirrors events.py::percentiles_bucket
    (quantile_cont over the bounded daily-count series)."""
    from ..operators import events as ev

    cols = ", ".join(
        f"round(quantile_cont(n, {q!r}), 4) AS p{int(q * 100)}"
        for q in ev.PCT_BUCKET_QS
    )
    return f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, count(*)::BIGINT AS n
  FROM {table} GROUP BY 1
)
SELECT count(*)::BIGINT AS n_buckets, {cols} FROM daily
"""


def reverse_nested_sql(query_terms: list[str],
                       chunk_size: int | None = None,
                       table: str = "documents") -> str:
    """ES reverse_nested — mirrors operators/nested.py::
    reverse_nested_agg: matching chunks stepped back to parent scope,
    bucketed by site, chunk count beside the parent count."""
    from ..operators.nested import NESTED_CHUNK_SIZE
    from .oracle_fragments import SITE_KEY_SQL, _terms_in

    if chunk_size is None:
        chunk_size = NESTED_CHUNK_SIZE
    q = sorted(set(query_terms))
    in_pred = f"term IN {_terms_in(q)}" if q else "FALSE"
    return f"""
WITH {_nested_terms_ctes(chunk_size, table)},
per_chunk AS (
  SELECT doc_id, chunk_id, count(DISTINCT term) AS nt
  FROM terms WHERE {in_pred}
  GROUP BY doc_id, chunk_id
),
matched AS (SELECT doc_id, chunk_id FROM per_chunk WHERE nt = {len(q)})
SELECT {SITE_KEY_SQL} AS site_key,
       count(DISTINCT doc_id)::BIGINT AS n_parents,
       count(*)::BIGINT AS n_chunks
FROM matched GROUP BY 1
"""
