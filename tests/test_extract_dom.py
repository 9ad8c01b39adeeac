"""DOM extraction path (textproc/extract_dom.py) — the Jsoup-parity
alternative to the frozen regex extractor.

The load-bearing pin: on WELL-FORMED HTML (the entire fixture corpus)
the DOM path equals the frozen path byte-for-byte, so it can stand in
per-deployment without moving the ``documents.text`` invariant. The
malformed-input tests then show exactly where the DOM parse is more
faithful to Jsoup than regexes can be.
"""

import duckdb
import pytest

from search_engine_spark.textproc.extract import (
    extract_block_text,
    extract_text,
)
from search_engine_spark.textproc.extract_dom import (
    extract_block_text_dom,
    extract_text_dom,
    extract_title_dom,
)
from tests.conftest import SF_TEST


def _corpus_htmls():
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_TEST}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    # the same synthesis law the engine's html_col / oracle HTML_SQL use
    return [
        (
            doc_id,
            f"<html><head><title>Doc {doc_id}</title><script>var x=1;"
            f"</script></head><body><p>{text or ''}</p></body></html>",
        )
        for doc_id, text in rows
    ]


def test_dom_equals_frozen_on_entire_wellformed_corpus():
    for doc_id, html in _corpus_htmls():
        assert extract_text_dom(html) == extract_text(html), doc_id
        assert extract_block_text_dom(html) == extract_block_text(html), doc_id


def test_dom_include_head_matches_jsoup_document_text():
    """Jsoup Document.text() traverses the whole document — title text
    included, body appended after (the faithful mode)."""
    html = "<html><head><title>T1 T2</title></head><body><p>body here</p></body></html>"
    assert extract_text_dom(html, include_head=True) == "T1 T2 body here"
    assert extract_text_dom(html) == "body here"  # engine's frozen spec


def test_dom_title_extraction():
    html = "<html><head><title>  A   Title </title></head><body>x</body></html>"
    assert extract_title_dom(html) == "A Title"


# ------------------------- malformed-input superiority over the regex path


def test_attribute_containing_gt_is_not_split():
    """<a title="x > y"> — the regex tag-stripper ends the tag at the
    first '>', leaking ' y\"' into text; the DOM tokenizer parses the
    attribute correctly."""
    html = '<body><p>before <a title="x > y">link</a> after</p></body>'
    assert extract_text_dom(html) == "before link after"


def test_script_containing_literal_end_head_tag():
    """Script source containing '</head>' inside a STRING: handled by
    the raw-text element tokenizer; body text survives untouched."""
    html = (
        "<html><head><script>var s = \"</head>\";</script></head>"
        "<body><p>visible</p></body></html>"
    )
    assert extract_text_dom(html) == "visible"


def test_unclosed_tags_still_extract():
    """Real-web tag soup: unclosed <p>/<li>, no </body>. The lenient
    parser extracts every text run with line structure preserved."""
    html = "<body><ul><li>one<li>two<p>three"
    assert extract_block_text_dom(html) == "one\ntwo\nthree"


def test_entities_decoded_everywhere():
    """convert_charrefs decodes the FULL entity set (the frozen path
    carries a deliberate 7-entity subset)."""
    html = "<body><p>caf&eacute; &amp; r&#233;sum&#xe9;</p></body>"
    assert extract_text_dom(html) == "café & résumé"


def test_unclosed_script_never_leaks_source():
    """An unterminated <script> swallows the rest of the document in
    both Jsoup and browsers — the DOM path must yield the text BEFORE
    it and never the script source."""
    html = "<body><p>seen</p><script>var hidden = 1;"
    out = extract_text_dom(html)
    assert "seen" in out and "hidden" not in out


def test_bytes_input_with_replacement():
    html = "<body><p>ok\xc3\xa9</p></body>".encode("latin-1")
    assert "ok" in extract_text_dom(html)


def test_engine_extractor_seam(spark):
    """SearchEngine(extractor=...) routes T1 through the selected
    extractor (r03-verdict #8): on the well-formed corpus all three
    paths build identical indexes, so search results agree with the
    default engine exactly; unknown names are rejected."""
    import pytest

    from search_engine_spark.engine import SearchEngine
    from tests.conftest import SF_TEST

    base = SearchEngine(spark, sf_dir=SF_TEST, n_buckets=8).build()
    want = [
        (r["doc_id"], r["score"])
        for r in base.search("data fast join").collect()
    ]
    assert want
    for extractor in ("regex", "dom"):
        eng = SearchEngine(
            spark, sf_dir=SF_TEST, n_buckets=8, extractor=extractor
        ).build()
        got = [
            (r["doc_id"], r["score"])
            for r in eng.search("data fast join").collect()
        ]
        assert got == want, extractor
    with pytest.raises(ValueError):
        SearchEngine(spark, sf_dir=SF_TEST, extractor="jsoup")
