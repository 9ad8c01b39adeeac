"""Unit tests for the pure-Python text pipeline (reference T1-T6, S4)."""

from search_engine_spark.textproc.extract import (
    extract_block_text,
    extract_text,
    extract_title,
)
from search_engine_spark.textproc.tokenize import (
    clean_token,
    term_frequencies,
    tokenize,
)
from search_engine_spark.textproc.urls import normalize_path


class TestTokenize:
    def test_basic(self):
        assert tokenize("Fast data FAST") == ["fast", "data", "fast"]

    def test_stopwords_dropped(self):
        # reference drops particles/conjunctions/prepositions (T4)
        assert tokenize("the data of a table") == ["data", "table"]

    def test_digits_rejected(self):
        # README.md:5 — words containing digits are ignored
        assert tokenize("abc123 123 x2y data") == ["data"]

    def test_boundary_cleanup(self):
        # T3: strip leading/trailing non-letters
        assert tokenize('«слово», (word). -data-') == ["слово", "word", "data"]

    def test_hyphenated_russian_kept(self):
        assert tokenize("кто-то пришел") == ["кто-то", "пришел"]

    def test_lone_hyphen_dropped(self):
        assert tokenize("- -- a-") == ["a"] or tokenize("- -- x-") == ["x"]

    def test_empty(self):
        assert tokenize("") == []
        assert tokenize("   ") == []

    def test_clean_token(self):
        assert clean_token("...data!!") == "data"
        # digits are not strippable (reference excludes them from boundary
        # classes) — digit tokens survive cleaning and fail validation whole
        assert clean_token("123") == "123"
        assert clean_token("abc123!") == "abc123"

    def test_term_frequencies(self):
        assert term_frequencies("data fast data") == {"data": 2, "fast": 1}


class TestExtract:
    HTML = (
        b"<html><head><title>My Page</title>"
        b"<script>var x = '<p>no</p>';</script>"
        b"<style>p { color: red; }</style></head>"
        b"<body><p>Hello &amp; welcome</p><p>Second  line</p>"
        b"<!-- comment --><div>Third</div></body></html>"
    )

    def test_text(self):
        # head content (title) is excluded from body text by the frozen
        # spec (title has its own extractor)
        assert extract_text(self.HTML) == "Hello & welcome Second line Third"

    def test_block_text(self):
        assert extract_block_text(self.HTML).split("\n") == [
            "Hello & welcome",
            "Second line",
            "Third",
        ]

    def test_title(self):
        assert extract_title(self.HTML) == "My Page"

    def test_script_not_leaked(self):
        assert "no" not in extract_text(self.HTML)

    def test_deterministic(self):
        assert extract_text(self.HTML) == extract_text(self.HTML)


class TestUrlNormalize:
    ROOT = "https://site-a.example"

    def test_strip_query(self):
        assert normalize_path(self.ROOT, f"{self.ROOT}/Docs/5?ref=x") == "/docs/5"

    def test_trailing_slash(self):
        assert normalize_path(self.ROOT, f"{self.ROOT}/docs/5/") == "/docs/5"

    def test_root(self):
        assert normalize_path(self.ROOT, self.ROOT) == "/"
        assert normalize_path(self.ROOT, f"{self.ROOT}/") == "/"

    def test_fragment(self):
        assert normalize_path(self.ROOT, f"{self.ROOT}/a#sec") == "/a"

    def test_cross_site(self):
        assert normalize_path(self.ROOT, "https://other.example/x") is None


class TestUnicodeWhitespace:
    """The shared WS_SPLIT class must make every emitter split identically
    on non-ASCII whitespace (NBSP, thin space, ideographic space, NEL) —
    Java \\s and RE2 \\s are ASCII-only, Python's is not (ADVICE r01)."""

    TEXTS = [
        (1, "fast data joins merge　scan"),
        (2, "plain data fast"),
        (3, "weird\x85nel line sep"),
    ]

    def test_ws_chars_is_python_s(self):
        import re

        from search_engine_spark.textproc.tokenize import WS_CHARS

        py_ws = {chr(c) for c in range(0x11000) if re.match(r"\s", chr(c))}
        assert set(WS_CHARS) == py_ws

    def test_all_emitters_agree(self, spark):
        import duckdb

        from search_engine_spark.functions import oracle_fragments as ora
        from search_engine_spark.operators import index_build as ib

        df = spark.createDataFrame(self.TEXTS, "doc_id long, text string")
        arrow = sorted(map(tuple, ib.build_postings(df).collect()))
        sql = sorted(map(tuple, ib.build_postings_sql(df).collect()))
        py = sorted(
            (d, t, n)
            for d, txt in self.TEXTS
            for t, n in term_frequencies(txt).items()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM (VALUES "
            + ",".join(f"({d}, '{t}')" for d, t in self.TEXTS)
            + ") v(doc_id, text)"
        )
        duck = sorted(map(tuple, con.sql(ora.postings_sql()).fetchall()))
        con.close()
        assert arrow == sql == py == duck
        assert (1, "scan", 1) in arrow  # ideographic space actually split


class TestFastTokenizeParity:
    """textproc/fast_tokenize.py (Arrow split + unique-token analysis +
    integer-key counting) must reproduce the pure-Python reference
    tokenizer exactly on arbitrary input, including Unicode whitespace,
    mixed scripts, digits, hyphens and empty/NA text."""

    @staticmethod
    def _run(texts):
        import numpy as np
        import pandas as pd

        from search_engine_spark.textproc.fast_tokenize import tokenize_tf

        pdf = pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
        got = tokenize_tf(pdf, with_dl=True)
        want = sorted(
            (d, t, n)
            for d, txt in enumerate(texts)
            for t, n in term_frequencies(txt or "").items()
        )
        rows = sorted(zip(got["doc_id"], got["term"], got["tf"]))
        assert [(int(d), t, int(n)) for d, t, n in rows] == want
        # dl invariant: Σtf per doc, repeated on every posting of the doc
        for d, g in got.groupby("doc_id"):
            assert (g["dl"] == g["tf"].sum()).all()

    def test_property_random_text(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        tok = st.text(
            alphabet=st.sampled_from(
                list("abz ярё-09\t\xa0 　.!«»<>___") + ["ß", "Ａ"]
            ),
            max_size=40,
        )

        @given(st.lists(tok, min_size=0, max_size=20))
        @settings(max_examples=200, deadline=None)
        def check(texts):
            self._run(texts)

        check()

    def test_none_text(self):
        self._run(["data fast", None, "", "   ", "data data"])


class TestExtractScriptInHead:
    def test_script_containing_head_close_does_not_leak(self):
        """A <script> inside <head> whose SOURCE contains the literal
        '</head>' must not truncate head removal and leak JS into the
        text (scripts are stripped before the head now, like comments)."""
        from search_engine_spark.textproc.extract import extract_text

        html = (
            b'<head><script>var s="</head>";</script></head>'
            b"<body>hello</body>"
        )
        assert extract_text(html) == "hello"


class TestNormalizedPathColumnTwin:
    def test_matches_python_reference_on_edge_cases(self, spark):
        """The column expression must be the exact twin of
        urls.normalize_path — cross-site and relative URLs included
        (the old blind root-chop produced garbage suffixes, never NULL)."""
        from pyspark.sql import functions as F

        from search_engine_spark.functions.text_columns import (
            normalized_path_col,
        )
        from search_engine_spark.textproc.urls import normalize_path

        site = "https://a.example"
        urls = [
            "https://a.example/Docs/5/?x=1",
            "https://a.example",
            "https://a.example/",
            "https://other.org/x",       # cross-site -> NULL
            "/docs/7/",                  # site-relative passes through
            "https://a.exampleX/y",      # prefix trap -> NULL
            "HTTPS://A.EXAMPLE/UP/",
        ]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        got = {
            r["url"]: r["p"]
            for r in df.select(
                "url",
                normalized_path_col(F.lit(site), F.col("url")).alias("p"),
            ).collect()
        }
        for u in urls:
            assert got[u] == normalize_path(site, u), u


def test_surt_key_collapses_repeated_trailing_slashes(spark):
    from pyspark.sql import functions as F

    from search_engine_spark.functions.text_columns import surt_key_col

    df = spark.createDataFrame(
        [("https://www.a.example/docs/",), ("https://a.example/docs//",)],
        "raw_url string",
    )
    keys = {r["k"] for r in df.select(surt_key_col().alias("k")).collect()}
    assert keys == {"example,a)/docs"}


# ---------------------------------------------------------- ascii folding

def test_fold_py_spec():
    from search_engine_spark.textproc.folding import fold_py

    assert fold_py("café crème brûlée") == "cafe creme brulee"
    assert fold_py("straße œuvre ærø") == "strasse oeuvre aero"
    assert fold_py("łódź žižek ñandú") == "lodz zizek nandu"
    assert fold_py("plain ascii") == "plain ascii"


def test_fold_col_matches_fold_py(spark):
    from pyspark.sql import functions as F

    from search_engine_spark.textproc.folding import fold_col, fold_py

    samples = [
        "café crème brûlée", "straße œuvre ærø", "łódź žižek ñandú",
        "mixed CAFÉ keeps case-insensitivity via lower()", "",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r["f"] for r in df.select(
        fold_col(F.lower(F.col("s"))).alias("f")).collect()]
    assert got == [fold_py(s.lower()) for s in samples]


def test_folded_postings_index_accented_words(spark):
    """The base analyzer DROPS accented Latin words; the folded chain
    indexes them as ASCII base forms — the recall fix the surface is
    for."""
    from search_engine_spark.operators.index_build import (
        build_postings,
        build_postings_folded,
    )

    docs = spark.createDataFrame(
        [(0, "u0", "café société"), (1, "u1", "plain cafe")],
        "doc_id long, url string, text string",
    )
    base = {
        (r["doc_id"], r["term"]) for r in build_postings(docs).collect()
    }
    folded = {
        (r["doc_id"], r["term"])
        for r in build_postings_folded(docs).collect()
    }
    # base analyzer: doc 0's accented words are DROPPED (neither the
    # accented nor the folded spelling indexes)
    assert (0, "café") not in base and (0, "cafe") not in base
    assert (0, "société") not in base and (0, "societe") not in base
    # folded chain: both docs co-index under the ASCII base forms
    assert (0, "cafe") in folded and (0, "societe") in folded
    assert (1, "cafe") in folded
