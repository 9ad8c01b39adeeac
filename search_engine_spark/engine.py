"""Engine facade — the reference's service surface (A2) as a Python API.

    eng = SearchEngine(spark, sf_dir)
    eng.build()                      # index build (blocks + dict + norms)
    eng.search("fast data")         # BM25 top-k over compressed blocks
    eng.search("fast data", mode="compat")   # reference-identical ranking
    eng.statistics()

Build is one job with a single shuffle into document-sharded compressed
blocks; queries are shuffle-free block scans (operators/wand.py). The
DataFrame reference path (operators/search.py) remains available via
mode='*_df' for cross-checking.
"""

from __future__ import annotations

import copy
from collections import OrderedDict
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _round4(x: float) -> float:
    """HALF_UP 4-dp rounding of the double's exact binary value — the
    same contract as Spark's ``F.round`` (java BigDecimal(double)
    .setScale(4, HALF_UP)) and DuckDB's ``round``; Python's builtin
    ``round`` is banker's and would diverge on exact 4-dp ties (e.g.
    1/32 = 0.03125 → 0.0312 vs 0.0313)."""
    return float(Decimal(x).quantize(Decimal("0.0001"),
                                     rounding=ROUND_HALF_UP))

from .operators import index_build as ib
from .operators import search as se
from .operators import wand
from .operators.blocks import N_BUCKETS_DEFAULT, build_posting_blocks, write_blocks
from .sources.documents import load_documents


# dictionaries up to this many terms are collected to the driver once per
# build/open, making the per-query df probe a dict lookup instead of a
# Spark job; beyond it (a 10^12-doc corpus has more terms than a driver
# should hold) queries fall back to the filtered cached-scan probe
DICT_CACHE_MAX_TERMS = 1_000_000

# bounded response LRU for search_page (ES request-cache layer): entries
# are whole rendered envelopes — small (≤ limit rows of strings) — and the
# cache resets whenever engine state is (re)installed, so no TTL is needed
PAGE_CACHE_MAX = 128


class SearchEngine:
    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str | None = None,
        docs: DataFrame | None = None,
        n_buckets: int = N_BUCKETS_DEFAULT,
        index_dir: str | None = None,
        extractor: str = "column",
    ):
        """``extractor`` selects the T1 html→text path (r03-verdict #8):

          * "column" (default) — trust the docs' ``text`` column (the
            corpus contract: text == extract_text(html), golden-pinned);
          * "regex"  — recompute text from ``html`` with the frozen
            regex extractor (textproc/extract.py);
          * "dom"    — recompute with the DOM parser
            (textproc/extract_dom.py) — Jsoup-parity on malformed
            real-web HTML, equal to the frozen spec on well-formed
            corpora (pinned by tests/test_extract_dom.py).

        The recompute runs as an Arrow-batched pandas UDF over html —
        extraction is inherently per-document, and it happens once per
        build, upstream of the tokenizer."""
        if docs is None:
            if sf_dir is None:
                raise ValueError("need sf_dir or docs")
            docs = load_documents(spark, sf_dir)
        if extractor not in ("column", "regex", "dom"):
            raise ValueError(f"unknown extractor {extractor!r}")
        if extractor != "column":
            from pyspark.sql import types as T

            if extractor == "regex":
                from .textproc.extract import extract_text as _fn
            else:
                from .textproc.extract_dom import extract_text_dom as _fn

            # lambda form: engine.py's `from __future__ import
            # annotations` turns hints into strings, which pandas_udf's
            # signature inference rejects
            _extract = F.pandas_udf(
                lambda h: h.map(lambda x: _fn(x) if x is not None else ""),
                T.StringType(),
            )
            docs = docs.withColumn("text", _extract(F.col("html")))
        self.extractor = extractor
        self.spark = spark
        self.docs = docs
        self.n_buckets = n_buckets
        self.index_dir = index_dir
        self._built = False
        self._df_map: dict[str, int] | None = None
        self._cf_map: dict[str, int] | None = None
        self._index_thread = None
        self._page_cache: "OrderedDict" = OrderedDict()

    # ------------------------------------------------------------- build
    @classmethod
    def open(
        cls,
        spark: SparkSession,
        index_dir: str,
        docs: DataFrame | None = None,
        sf_dir: str | None = None,
    ) -> "SearchEngine":
        """Attach to a persisted index (catalog.IndexStore layout) without
        rebuilding. ``docs`` (or sf_dir) is only needed for presentation /
        statistics paths."""
        from .catalog import IndexStore

        probe = IndexStore(spark, index_dir)
        stats = probe.read_corpus_stats()
        store = IndexStore(spark, index_dir, n_buckets=stats["n_buckets"])
        if docs is None and sf_dir is not None:
            docs = load_documents(spark, sf_dir)
        eng = cls.__new__(cls)
        eng.spark = spark
        eng.docs = docs
        eng.n_buckets = store.n_buckets
        eng.index_dir = index_dir
        eng.store = store
        # same co-partitioned cache layout as build() (lazy — first query
        # materializes)
        eng.blocks = (
            store.read_blocks()
            .repartition(store.n_buckets, "doc_bucket")
            .cache()
        )
        eng.term_dict = store.read_term_dict()
        eng.doc_stats = (
            store.read_doc_stats()
            .repartition(store.n_buckets, "doc_bucket")
            .cache()
        )
        eng.n_docs = stats["n_docs"]
        eng.avgdl = stats["avgdl"]
        # older corpus_stats.json lacks sum_dl; n·avgdl is a FLOAT
        # product that need not equal the exact integer Σdl (LM-family
        # scores can flip at the 4-dp rounding boundary), so recompute
        # it exactly with one aggregate over the persisted doc_stats
        if "sum_dl" in stats:
            eng.sum_dl = float(stats["sum_dl"])
        else:
            row = eng.doc_stats.agg(F.sum("dl")).collect()[0]
            eng.sum_dl = float(row[0] or 0)
        eng._built = True
        eng._df_map = None
        eng._cf_map = None
        eng._index_thread = None
        eng._page_cache = OrderedDict()
        eng._maybe_cache_dictionary()
        return eng

    def build_persistent(self, index_dir: str | None = None,
                         groups: int = 1) -> "SearchEngine":
        """Checkpoint-resumable build through the persistent store
        (catalog.build_persistent); reopens the committed index."""
        from . import catalog

        index_dir = index_dir or self.index_dir
        if not index_dir:
            raise ValueError("need index_dir")
        store = catalog.IndexStore(self.spark, index_dir, self.n_buckets)
        catalog.build_persistent(self.docs, store, groups=groups)
        fresh = SearchEngine.open(self.spark, index_dir, docs=self.docs)
        self.__dict__.update(fresh.__dict__)
        return self

    # ------------------------------------------- A2 indexing envelopes
    def start_indexing(self, groups: int = 4) -> dict:
        """Reference GET /api/startIndexing (ApiController.java:28-39,
        IndexingServiceImpl.java:40-95): kick off the full build
        ASYNCHRONOUSLY and return the envelope immediately; a second call
        while one runs is rejected with the reference's error string."""
        import threading

        from . import catalog

        if self._index_thread is not None and self._index_thread.is_alive():
            return {"result": False, "error": "Индексация уже запущена"}
        if not self.index_dir:
            raise ValueError("need index_dir for persistent indexing")
        store = catalog.IndexStore(self.spark, self.index_dir, self.n_buckets)

        def _run():
            try:
                catalog.build_persistent(self.docs, store, groups=groups)
            except catalog.BuildCancelled:
                pass  # recorded in the manifest (phase='cancelled')

        self._index_thread = threading.Thread(
            target=_run, name="index-build", daemon=True
        )
        self._index_thread.start()
        return {"result": True}

    def stop_indexing(self) -> dict:
        """Reference GET /api/stopIndexing (ApiController.java:41-54):
        cancel the running build; rejected when none runs."""
        if self._index_thread is None or not self._index_thread.is_alive():
            return {"result": False, "error": "Индексация не запущена"}
        self.cancel_build()
        return {"result": True}

    def wait_indexing(self, timeout: float | None = None) -> bool:
        """Join the async build (test/ops helper; the reference exposes no
        join — callers poll /api/statistics). True when finished."""
        if self._index_thread is None:
            return True
        self._index_thread.join(timeout)
        return not self._index_thread.is_alive()

    def index_page(self, url: str) -> dict:
        """Reference POST /api/indexPage (ApiController.java:56-68,
        IndexingServiceImpl.java:145-210): re-index ONE url into the
        persisted store — old contributions retracted, fresh postings
        merged (operators/incremental.py), engine caches refreshed. URLs
        outside the configured sites are rejected with the reference's
        error string."""
        from .operators.incremental import reindex_docs
        from .sources.documents import SITES

        roots = tuple(f"https://{s}.example" for s in SITES)
        if not url.startswith(roots):
            return {
                "result": False,
                "error": "Данная страница находится за пределами сайтов, "
                         "указанных в конфигурационном файле",
            }
        if not self.index_dir:
            raise ValueError("need index_dir (persisted store) for index_page")
        changed = self.docs.filter(F.col("url") == url)
        if changed.limit(1).count() == 0:
            return {"result": False, "error": "Страница не найдена"}
        from . import catalog

        store = catalog.IndexStore(self.spark, self.index_dir, self.n_buckets)
        reindex_docs(store, changed)
        fresh = SearchEngine.open(self.spark, self.index_dir, docs=self.docs)
        self.__dict__.update(fresh.__dict__)
        return {"result": True}

    def cancel_build(self) -> None:
        """Reference GET /api/stopIndexing (IndexingServiceImpl.java:98-142):
        ask a running persistent build on this index_dir to stop. The build
        observes the request at its next group boundary (cooperative, like
        the reference's isCancelled() polls), records phase='cancelled' in
        the manifest, and raises catalog.BuildCancelled; committed groups
        remain valid checkpoints for the next resume."""
        from . import catalog

        if not self.index_dir:
            raise ValueError("no index_dir — nothing to cancel")
        catalog.request_cancel(
            catalog.IndexStore(self.spark, self.index_dir, self.n_buckets)
        )

    def build(self, persist: bool = False) -> "SearchEngine":
        """Full index build (reference startIndexing, I9 — but a pure batch
        job: no locks, no mutable status rows).

        Pipeline = the fused two-phase pack/merge build
        (operators/fused_build.py): one python stage tokenizes + packs each
        input partition's postings into binary runs (shuffle moves ~100×
        fewer rows than row-per-posting), a second merges runs per
        (doc_bucket, term) into compressed blocks. The dictionary
        re-derives from block METADATA (term_dict_from_blocks) and norms
        unpack from the same packed rows — the corpus is read exactly
        once."""
        from .operators import fused_build as fb
        from .operators.blocks import term_dict_from_blocks

        packed = fb.pack_documents(self.docs, self.n_buckets).cache()
        packed.count()
        blocks = fb.blocks_from_packed(packed)
        if persist and self.index_dir:
            write_blocks(blocks, f"{self.index_dir}/postings_blocks")
            blocks = self.spark.read.parquet(f"{self.index_dir}/postings_blocks")
        # cache blocks and norms ALREADY hash-partitioned on doc_bucket:
        # the per-query cogroup requires ClusteredDistribution(doc_bucket),
        # so a matching cached partitioning removes both per-query
        # exchanges — queries become shuffle-free scans of the cached
        # index (the whole point of the document-sharded layout)
        self.blocks = blocks.repartition(self.n_buckets, "doc_bucket").cache()
        self.blocks.count()
        self.term_dict = term_dict_from_blocks(self.blocks).cache()
        self.term_dict.count()
        self._maybe_cache_dictionary()
        self.doc_stats = (
            fb.doc_stats_from_packed(packed)
            .repartition(self.n_buckets, "doc_bucket")
            .cache()
        )
        # corpus stats: avgdl counts term-less docs as dl=0 (same value the
        # relational build_doc_stats join produces). Both numbers come from
        # the pack stage's per-partition stat rows — one tiny JVM agg over
        # the cached packed frame, no raw-corpus re-scan.
        self.n_docs, sum_dl = fb.corpus_stats_from_packed(packed)
        self.avgdl = float(sum_dl) / self.n_docs if self.n_docs else 0.0
        self.sum_dl = float(sum_dl)
        packed.unpersist()
        self._built = True
        self._page_cache = OrderedDict()  # a new index invalidates pages
        return self

    def _require_built(self):
        if not self._built:
            self.build()

    def _maybe_cache_dictionary(self) -> None:
        """Collect (term → df, cf) to the driver when the dictionary is
        small enough — the per-query probe becomes a dict lookup (no
        Spark job). One count + one collect at build/open time."""
        self._df_map = None
        self._cf_map = None
        if self.term_dict.count() <= DICT_CACHE_MAX_TERMS:
            rows = self.term_dict.select("term", "df", "cf").collect()
            self._df_map = {r["term"]: r["df"] for r in rows}
            self._cf_map = {r["term"]: int(r["cf"]) for r in rows}

    def corpus_stat_maps(
        self, terms: list[str]
    ) -> tuple[dict[str, float], dict[str, float], float]:
        """(cf_map, df_map, total_tokens) for a served similarity query
        (search_lmd/lmjm/dfr/ib's optional precomputed-stat params).
        cf/df come from the term DICTIONARY (driver-cached → pure dict
        lookup; else one term-pruned probe of the small dict table —
        never a postings or doc_stats scan), total_tokens from the
        build-time Σdl persisted in corpus_stats.json. With the
        dictionary cached, constructing a similarity query plan launches
        ZERO Spark jobs — pinned by tests/test_served_stats.py."""
        self._require_built()
        uniq = sorted(set(terms))
        if self._cf_map is not None and self._df_map is not None:
            cf = {t: float(self._cf_map[t]) for t in uniq if t in self._cf_map}
            df = {t: float(self._df_map[t]) for t in uniq if t in self._df_map}
        else:
            rows = (
                self.term_dict.filter(F.col("term").isin(uniq))
                .select("term", "df", "cf")
                .collect()
            )
            cf = {r["term"]: float(r["cf"]) for r in rows}
            df = {r["term"]: float(r["df"]) for r in rows}
        return cf, df, float(self.sum_dl)

    def _dict_probe(self, terms: list[str]) -> dict[str, int]:
        """Q2 dictionary probe: df per query term (absent terms omitted)."""
        if self._df_map is not None:
            return {t: self._df_map[t] for t in terms if t in self._df_map}
        rows = (
            self.term_dict.filter(F.col("term").isin(terms))
            .select("term", "df")
            .collect()
        )
        return {r["term"]: int(r["df"]) for r in rows}

    def _resolve_fuzzy(self, uniq: list[str]) -> list[str]:
        """Replace dictionary-absent terms with their top distance-1
        suggestion (ONE batched deletion-neighborhood probe); returns the
        resolved sorted term set (uncorrectable terms drop out)."""
        dfs = self._dict_probe(uniq)
        unknown = [t for t in uniq if t not in dfs]
        if not unknown:
            return uniq
        corr = se.spell_suggest_batch(self.term_dict, unknown)
        return sorted(set(dfs) | set(corr.values()))

    # ------------------------------------------------------------- query
    def search(
        self,
        query: str,
        mode: str = "bm25",
        site_key: str | None = None,
        limit: int = 20,
        offset: int = 0,
        op: str = "and",
        fuzzy: bool = False,
        recency: bool = False,
        half_life_days: float = 30.0,
        recency_weight: float = 0.5,
    ) -> DataFrame:
        """Top-k search over compressed blocks. Returns (doc_id, score[,rel]).

        op='and' (default) = the reference's conjunctive semantics; a query
        term absent from the corpus empties the result (Q2 gate).
        op='or' = disjunctive BM25 top-k; absent terms just drop out.
        fuzzy=True replaces dictionary-absent terms with their top
        distance-1 suggestion before the gate (operators/search.py::
        spell_suggest_batch — one batched probe), instead of the
        reference's empty-page dead end.
        recency=True (bm25 mode, input docs required) reranks an
        oversampled candidate window with the exponential crawl-age decay
        (operators/search.py::blend_recency)."""
        self._require_built()
        if recency:
            if mode.startswith("compat"):
                raise ValueError("recency is a bm25-mode feature")
            if self.docs is None:
                raise ValueError("recency requires input documents")
        conjunctive = op != "or"
        empty_schema = (
            "doc_id long, score_abs long, rel double"
            if mode.startswith("compat")
            else "doc_id long, score double"
        )
        terms = se.analyze_query(query)
        if not terms:
            return self.spark.createDataFrame([], empty_schema)
        uniq = sorted(set(terms))
        if fuzzy:
            uniq = self._resolve_fuzzy(uniq)
            if not uniq:
                return self.spark.createDataFrame([], empty_schema)
        dfs = self._dict_probe(uniq)
        if conjunctive and len(dfs) < len(uniq):
            return self.spark.createDataFrame([], empty_schema)
        if not dfs:
            return self.spark.createDataFrame([], empty_schema)
        uniq = sorted(dfs)
        idf = {
            t: se.bm25_idf(float(self.n_docs), float(df))
            for t, df in dfs.items()
        }
        # BM25 norms live inside the posting blocks (per-posting dl payload,
        # operators/codec.py) — the unfiltered path passes NO second frame.
        # Site-filtered search cogroups just the site's doc_ids: norms are
        # co-partitioned with blocks, so pre-filtering them to the site and
        # restricting candidates inside the scorer implements per-site
        # search without a second shuffle, shipping bytes proportional to
        # the site rather than the corpus.
        norms = None
        restrict = site_key is not None
        if restrict:
            from .sources.documents import site_key_col

            norms = (
                self.doc_stats.select("doc_bucket", "doc_id")
                .withColumn("site_key", site_key_col())
                .filter(F.col("site_key") == site_key)
                .drop("site_key")
            )
        compat = mode.startswith("compat")
        # fetch top (offset+limit) so compat normalization sees the global
        # max (the reference normalizes BEFORE pagination, Q5 then Q6);
        # limit=None = all hits (pre-pagination count path)
        out = wand.topk_blocks(
            self.blocks,
            norms,
            uniq,
            mode="compat" if compat else "bm25",
            idf=idf,
            avgdl=self.avgdl,
            limit=None if limit is None else limit + offset,
            offset=0,
            restrict_to_norms=restrict,
            conjunctive=conjunctive,
        )
        if compat:
            # Normalize via scalar agg + broadcast crossJoin (never
            # Window.partitionBy() — an empty window spec moves the whole
            # hit set through ONE partition). The reference normalizes by
            # the max over ALL hits BEFORE pagination (Q5 then Q6); the
            # scorer frame already holds the global top, so its max IS
            # that normalizer.
            if limit is not None:
                # limit path: the scorer frame holds ≤ offset+limit rows
                # ORDERED score desc, and the normalizer equals row 0's
                # score. Collect the tiny frame ONCE and finish the page
                # IN PYTHON: one scorer execution (a lazy agg(max) branch
                # re-runs the whole cogroup subtree — measured 2× query
                # latency at 2.56M docs; a cache shared between the
                # branches loses too — the final orderBy's range-sampling
                # pass re-executes the subtree, measured 1.8× here), and
                # the returned LocalRelation carries PRE-computed rel so
                # the caller's collect does no Catalyst work beyond the
                # fixed ~0.1 s round-trip.
                rows = out.collect()
                if not rows:
                    return self.spark.createDataFrame([], empty_schema)
                max_abs = float(rows[0]["score"])
                page = [
                    (r["doc_id"], int(r["score"]),
                     _round4(int(r["score"]) / max_abs))
                    for r in rows[offset : offset + limit]
                ]
                # rows are already ordered (score desc, doc_id asc); the
                # LocalRelation preserves it — no orderBy
                return self.spark.createDataFrame(page, empty_schema)
            # limit=None (pre-pagination count path): the hit set is
            # unbounded, so normalize via scalar agg + broadcast crossJoin
            # (never Window.partitionBy() — an empty window spec moves the
            # whole hit set through ONE partition); callers cache the frame
            # (search_page) so the agg branch is absorbed by the cache
            scored = out.select(
                "doc_id", F.col("score").cast("long").alias("score_abs")
            )
            mx = scored.agg(F.max("score_abs").alias("_max_abs"))
            out = (
                scored.crossJoin(F.broadcast(mx))
                .withColumn(
                    "rel",
                    F.round(F.col("score_abs") / F.col("_max_abs"), 4),
                )
                .drop("_max_abs")
                .orderBy(F.col("score_abs").desc(), F.col("doc_id").asc())
            )
        if limit is None:
            return out
        if recency:
            window = max(50, offset + limit)
            hits = wand.topk_blocks(
                self.blocks,
                norms,
                uniq,
                mode="bm25",
                idf=idf,
                avgdl=self.avgdl,
                limit=window,
                offset=0,
                restrict_to_norms=restrict,
                conjunctive=conjunctive,
            )
            blended = se.blend_recency(
                hits,
                self.docs,
                half_life_days=half_life_days,
                weight=recency_weight,
                limit=offset + limit,
            )
            return blended.offset(offset)
        return out.offset(offset).limit(limit)

    def search_results(
        self,
        query: str,
        mode: str = "bm25",
        site_key: str | None = None,
        limit: int = 20,
        offset: int = 0,
        hits: DataFrame | None = None,
    ) -> DataFrame:
        """Top-k with presentation columns (reference SearchData rows:
        site, site_name, uri, title, snippet, relevance — Q7/Q8).
        ``hits`` lets a caller reuse an already-computed hit frame."""
        from .operators.presentation import present_results
        from .operators.search import analyze_query

        if hits is None:
            hits = self.search(query, mode=mode, site_key=site_key,
                               limit=limit, offset=offset)
        rel_col = "rel" if mode.startswith("compat") else "score"
        lemmas = set(analyze_query(query))
        out = present_results(self.docs, hits, lemmas, relevance_col=rel_col)
        return out.orderBy(F.col("relevance").desc(), F.col("doc_id").asc())

    def search_page(
        self,
        query: str,
        mode: str = "bm25",
        site_key: str | None = None,
        limit: int = 20,
        offset: int = 0,
        fuzzy: bool = False,
        collapse: bool = False,
    ) -> dict:
        """Reference GET /api/search envelope (A2, README.md:244-270):
        {result, count, data[]} — count is the PRE-pagination match total
        (SearchServiceImpl.java:105).

        Responses are served from a bounded per-engine LRU (Elasticsearch's
        request cache, at the same layer: the rendered response, keyed by
        the full request). Invalidation is structural, not TTL: build(),
        build_persistent() and index_page() all install fresh engine state
        (the latter two via open()), and every path starts with an empty
        cache — a stale page can never survive an index change. Deep
        copies in and out so callers can't mutate cached entries."""
        ck = (query, mode, site_key, limit, offset, fuzzy, collapse)
        hit = self._page_cache.get(ck)
        if hit is not None:
            self._page_cache.move_to_end(ck)
            return copy.deepcopy(hit)
        terms = se.analyze_query(query)
        if not terms:
            return {"result": False, "error": "Задан пустой поисковый запрос",
                    "count": 0, "data": []}
        if fuzzy:
            # resolve corrections ONCE and rewrite the query, so scoring,
            # counting AND snippet highlighting all see the corrected
            # terms (a hit should highlight the term it matched on)
            resolved = self._resolve_fuzzy(sorted(set(terms)))
            if not resolved:
                return {"result": True, "count": 0, "data": []}
            query = " ".join(resolved)
        # one scorer pass: the ordered full hit frame serves both the
        # pre-pagination count and the presented page slice
        base = self.search(
            query, mode=mode, site_key=site_key, limit=None
        ).cache()
        full = base
        if collapse:
            # one-result-per-domain SERP rule over the full candidate set
            if mode.startswith("compat"):
                raise ValueError("collapse is a bm25-mode feature")
            from .sources.documents import site_key_col

            full = se.collapse_hits(
                base.withColumn("site_key", site_key_col()), limit=None
            ).select("doc_id", "score").cache()
        count = full.count()
        page_hits = full.offset(offset).limit(limit)
        rows = self.search_results(
            query, mode=mode, site_key=site_key, limit=limit, offset=offset,
            hits=page_hits,
        ).collect()
        full.unpersist()
        if full is not base:
            base.unpersist()  # the pre-collapse frame must not stay pinned
        data = [
            {
                "site": r["site"],
                "siteName": r["site_name"],
                "uri": r["uri"],
                "title": r["title"],
                "snippet": r["snippet"],
                "relevance": r["relevance"],
            }
            for r in rows
        ]
        resp = {"result": True, "count": count, "data": data}
        self._page_cache[ck] = copy.deepcopy(resp)
        while len(self._page_cache) > PAGE_CACHE_MAX:
            self._page_cache.popitem(last=False)
        return resp

    # --------------------------------------------------------------- admin
    def suggest(self, text: str, k: int = 10) -> dict:
        """Search-box typeahead envelope: complete the TRAILING (partial)
        word of ``text`` against the index dictionary —
        {result, mode, suggestions: [{term, df}]}.

        Routing (same decision tree a search UI wants):
          * trailing prefix has dictionary completions → mode='prefix'
            (sargable startswith scan, prefix_suggest);
          * no completions but a distance-1 correction exists →
            mode='spell' ("did you mean", SymSpell deletion probe);
          * neither → mode='none', empty list.
        The context-aware bigram ranker (operators/search.py::
        next_word_suggest) needs the positional relation and stays an
        operator-level surface; this facade serves the dictionary-only
        paths any opened store can answer."""
        self._require_built()
        parts = [w for w in text.strip().lower().split() if w]
        if not parts:
            return {"result": True, "mode": "none", "suggestions": []}
        prefix = parts[-1]
        rows = se.prefix_suggest(self.term_dict, prefix, k=k).collect()
        if rows:
            return {
                "result": True,
                "mode": "prefix",
                "suggestions": [
                    {"term": r["term"], "df": int(r["df"])} for r in rows
                ],
            }
        fixed = se.spell_suggest_batch(self.term_dict, [prefix])
        if fixed.get(prefix):
            term = fixed[prefix]
            df = self._dict_probe([term]).get(term, 0)
            return {
                "result": True,
                "mode": "spell",
                "suggestions": [{"term": term, "df": int(df)}],
            }
        return {"result": True, "mode": "none", "suggestions": []}

    def search_two_tier(
        self, query: str, k: int = 20, budget_per_bucket: int = 128,
        op: str = "and",
    ) -> DataFrame:
        """Integer-impact two-tier serve (r03-verdict #1, engine facade):
        champion tier first, exact-path rescope of only the maybe band —
        value-identical to the exact conjunctive impact ranking
        (operators/impact.py::search_two_tier, oracle-pinned). Returns
        (doc_id, score_q).

        First call per budget builds and session-caches the champion
        table (one pass over the cached blocks via champion_lists_fused
        — no corpus re-scan) and the impact relation the exact tier
        rescopes through (decoded from the same blocks); both share the
        engine's doc_bucket sharding."""
        self._require_built()
        from .operators import impact as imp

        terms = se.analyze_query(query)
        impacts = self._cached_impacts()
        champs = self._cached_champions(budget_per_bucket)
        fn = imp.search_two_tier if op != "or" else imp.search_two_tier_or
        return fn(impacts, champs, terms, k=k, n_buckets=self.n_buckets)

    CHAMPION_CACHE_MAX = 4

    def _cached_impacts(self) -> DataFrame:
        """The corpus-scale quantized-impact relation, session-cached.
        Budget-INDEPENDENT (one relation serves every champion budget —
        r04 review finding), decoded from the cached blocks so no corpus
        re-scan; exempt from the LRU cap below."""
        from .operators import impact as imp
        from .operators.blocks import decode_blocks

        if not hasattr(self, "_impact_cache"):
            self._impact_cache: dict = {}
        if "impacts" not in self._impact_cache:
            self._impact_cache["impacts"] = imp.quantized_impacts(
                decode_blocks(self.blocks).select("term", "doc_id", "tf"),
                self.term_dict,
                self.doc_stats.select("doc_id", "dl"),
                self.n_docs,
                self.avgdl,
            ).persist()
        return self._impact_cache["impacts"]

    def _cached_champions(self, budget_per_bucket: int) -> DataFrame:
        """The vocabulary-bound champion table for one budget, session-
        cached under an LRU cap (r04 ADVICE): a session sweeping budgets
        would otherwise accumulate pinned frames without bound — the
        leak class evict_ctx was added to close in the driver context
        cache. Built in one pass over the cached blocks
        (champion_lists_fused), sharing the engine's doc_bucket
        sharding."""
        from .operators import impact as imp

        if not hasattr(self, "_impact_cache"):
            self._impact_cache = {}
        key = ("champs", int(budget_per_bucket))
        if key not in self._impact_cache:
            self._impact_cache[key] = imp.champion_lists_fused(
                self.blocks,
                self.term_dict,
                self.n_docs,
                self.avgdl,
                budget_per_bucket=int(budget_per_bucket),
                n_buckets=self.n_buckets,
                store_n_buckets=self.n_buckets,
            ).persist()
        order = self._impact_cache.setdefault("_lru", [])
        if key in order:
            order.remove(key)
        order.append(key)
        while len(order) > self.CHAMPION_CACHE_MAX:
            old = order.pop(0)
            self._impact_cache.pop(old).unpersist()
        return self._impact_cache[key]

    def search_batch(
        self,
        queries: dict[str, str],
        k: int = 20,
        serving: str = "champions",
        budget_per_bucket: int = 128,
    ) -> DataFrame:
        """Serve a whole query WORKLOAD in one pass (r04-verdict #8, the
        dashboard facade over the batch operators). ``queries`` maps
        query_id → raw query string; each is analyzed by the same
        pipeline as `search` (tokenize → stop-POS filter → lemmatize).

        serving="champions" (default): one scan of the session-cached
        vocabulary-bound champion table for ALL queries
        (operators/impact.py::search_champions_batch) — returns
        (query_id, doc_id, score_q, error_ub) with the bounded-error
        semantics of `search_champions`, top-k per query via a
        query-keyed WindowGroupLimit (never a global sort).

        serving="exact": one pass over the decoded postings scoring
        every query's union term set together
        (operators/search.py::search_bm25_batch) — returns (query_id,
        doc_id, score), exact conjunctive BM25, value-identical per
        query to `search_bm25` (pinned by test).

        Queries whose analyzed term set is empty (stopword-only) are
        dropped before the plan is built, matching the per-query
        facade's empty-result contract."""
        self._require_built()
        from .operators import impact as imp
        from .operators.blocks import decode_blocks

        if serving not in ("champions", "exact"):
            raise ValueError(f"unknown serving tier: {serving!r}")
        analyzed = {
            qid: terms
            for qid, terms in (
                (qid, se.analyze_query(q)) for qid, q in queries.items()
            )
            if terms
        }
        if not analyzed:
            # an all-stopword workload must not trigger a champion
            # build / block decode just to return nothing (r05 review)
            schema = (
                "query_id string, doc_id long, score_q bigint, "
                "error_ub bigint"
                if serving == "champions"
                else "query_id string, doc_id long, score double"
            )
            return self.spark.createDataFrame([], schema)
        if serving == "champions":
            champs = self._cached_champions(budget_per_bucket)
            return imp.search_champions_batch(
                self.spark, champs, analyzed, k=k
            )
        return se.search_bm25_batch(
            self.spark,
            decode_blocks(self.blocks).select("term", "doc_id", "tf"),
            self.term_dict,
            self.doc_stats.select("doc_id", "dl"),
            self.n_docs,
            self.avgdl,
            analyzed,
            limit=k,
        )

    def evict_impact_cache(self) -> None:
        """Unpersist and drop every frame `search_two_tier` session-
        cached (the corpus-scale impacts relation + all champion
        tables). Mirrors `__spark_entry__.evict_ctx` — call between
        corpora or to release executor storage in a long-lived
        session; the next serve rebuilds from the block store."""
        cache = getattr(self, "_impact_cache", None)
        if not cache:
            return
        for key, val in list(cache.items()):
            if key != "_lru":
                val.unpersist()
        cache.clear()

    def percolate(self, queries=None) -> DataFrame:
        """Reverse search over the engine's corpus: match the stored
        conjunctive query set against every document (query_id, doc_id).
        Runs on the logical postings of the input docs (an alerting
        pipeline runs the same call per incoming micro-batch —
        streaming/stream_percolate.py is the stream twin)."""
        if self.docs is None:
            raise ValueError("percolate requires input documents")
        from .operators.index_build import build_postings

        return se.percolate(build_postings(self.docs), queries)

    def statistics(self) -> dict:
        """Reference GET /api/statistics envelope (A1/A2)."""
        from .plans.statistics import per_site_statistics

        rows = per_site_statistics(self.docs).collect()
        total_pages = sum(r["pages"] for r in rows)
        total_lemmas = sum(r["lemmas"] for r in rows)
        return {
            "result": True,
            "statistics": {
                "total": {
                    "sites": len(rows),
                    "pages": total_pages,
                    "lemmas": total_lemmas,
                    "indexing": False,
                },
                "detailed": [
                    {
                        "url": f"https://{r['site_key']}.example",
                        "name": r["site_key"],
                        "status": "INDEXED" if self._built else "FAILED",
                        "pages": r["pages"],
                        "lemmas": r["lemmas"],
                        "error": None,
                    }
                    for r in rows
                ],
            },
        }
