"""Unit tests for operators/curation.py on crafted micro-corpora.

Oracle parity at fixture scale is covered by tests/test_oracle_parity.py
(latest_revisions / line_dedup / pii_redact / domain_stats); these pin the
semantics on hand-built cases where the expected output is derivable by
inspection: tie-breaks, first-occurrence-wins ordering, pattern edges.
"""

import pytest

from search_engine_spark.operators.curation import (
    LINE_WIDTH,
    doc_lines,
    latest_revisions,
    redact_pii,
    remove_duplicated_lines,
)


def _docs(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------- latest


def test_latest_revisions_picks_newest_and_breaks_ties(spark):
    rows = [
        # page 1: distinct timestamps — newest wins regardless of doc_id
        (10, "p1", "2024-01-02 00:00:00"),
        (99, "p1", "2024-01-01 00:00:00"),
        # page 2: timestamp tie — higher doc_id wins (pinned tiebreak)
        (20, "p2", "2024-01-03 00:00:00"),
        (21, "p2", "2024-01-03 00:00:00"),
    ]
    revs = spark.createDataFrame(
        rows, "doc_id long, page_key string, ts string"
    ).selectExpr("doc_id", "page_key", "cast(ts as timestamp) AS warc_ts")
    out = {
        r["page_key"]: (r["doc_id"], r["n_revisions"])
        for r in latest_revisions(revs, key="page_key").collect()
    }
    assert out == {"p1": (10, 2), "p2": (21, 2)}


# -------------------------------------------------------------- line dedup


def test_doc_lines_chunking(spark):
    docs = _docs(spark, [(1, "a b c d e f g h i j")])
    lines = {
        (r["line_no"], r["line"]) for r in doc_lines(docs, width=4).collect()
    }
    assert lines == {(0, "a b c d"), (1, "e f g h"), (2, "i j")}


def test_doc_lines_empty_text_dropped(spark):
    docs = _docs(spark, [(1, "   "), (2, "x y")])
    rows = doc_lines(docs, width=4).collect()
    assert {(r["doc_id"], r["line"]) for r in rows} == {(2, "x y")}


def test_remove_duplicated_lines_first_wins(spark):
    # "a b c d" appears in docs 1, 2, 3; only doc 1 (lowest doc_id) keeps it.
    # Doc 3 also repeats it internally — the later in-doc copy drops too.
    docs = _docs(
        spark,
        [
            (1, "a b c d w x y z"),
            (2, "a b c d q r s t"),
            (3, "m n o p a b c d a b c d"),
        ],
    )
    out = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
        for r in remove_duplicated_lines(doc_lines(docs, width=4)).collect()
    }
    assert out[1] == ("a b c d\nw x y z", 2, 0)
    assert out[2] == ("q r s t", 1, 1)
    assert out[3] == ("m n o p", 1, 2)


def test_remove_duplicated_lines_all_dropped_keeps_doc(spark):
    docs = _docs(spark, [(1, "a b c d"), (2, "a b c d")])
    out = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
        for r in remove_duplicated_lines(doc_lines(docs, width=4)).collect()
    }
    assert out[1] == ("a b c d", 1, 0)
    assert out[2] == ("", 0, 1)  # doc survives with empty clean_text


def test_line_dedup_append_stable(spark):
    """Adding new docs never changes which lines EXISTING docs keep
    (new doc_ids sort after, so they can't steal a first occurrence)."""
    base = [(1, "a b c d w x y z"), (2, "a b c d q r s t")]
    before = {
        r["doc_id"]: r["clean_text"]
        for r in remove_duplicated_lines(
            doc_lines(_docs(spark, base), width=4)
        ).collect()
    }
    after = {
        r["doc_id"]: r["clean_text"]
        for r in remove_duplicated_lines(
            doc_lines(_docs(spark, base + [(9, "w x y z n e w w")]), width=4)
        ).collect()
    }
    assert {k: after[k] for k in before} == before


# ---------------------------------------------------------------- PII scrub


@pytest.mark.parametrize(
    "text,expect",
    [
        (
            "mail me at jo.doe+x@sub.example.org today",
            (1, 0, 0, "mail me at <EMAIL> today"),
        ),
        ("server 192.168.0.1 down", (0, 1, 0, "server <IP> down")),
        ("call +791500012 now", (0, 0, 1, "call <PHONE> now")),
        # email is scrubbed first, so its domain never half-matches as IP
        (
            "a@b.co 1.2.3.4 +12345678",
            (1, 1, 1, "<EMAIL> <IP> <PHONE>"),
        ),
        # version strings (2 octets) and short +digits are NOT PII
        ("v1.2 build +123", (0, 0, 0, "v1.2 build +123")),
        # E.164 goes up to 15 digits — a 14-digit number must redact
        # (regression: a {7,12} bound with trailing \b matched NOTHING
        # for 13-15 digit numbers, leaving them fully unredacted)
        ("call +4915123456789 now", (0, 0, 1, "call <PHONE> now")),
        # 16 digits exceeds E.164 — documented as not-a-phone
        ("id +1234567890123456 x", (0, 0, 0, "id +1234567890123456 x")),
        # an IP inside an email's host is consumed by the email redaction
        # first — counts equal the placeholders actually emitted
        (
            "contact admin@10.0.0.1.example.com now",
            (1, 0, 0, "contact <EMAIL> now"),
        ),
    ],
)
def test_redact_pii_patterns(spark, text, expect):
    row = redact_pii(_docs(spark, [(1, text)])).collect()[0]
    assert (
        row["n_email"],
        row["n_ip"],
        row["n_phone"],
        row["redacted"],
    ) == expect


def test_default_line_width_matches_oracle_constant():
    # the contract query and line_dedup_sql must agree on the chunk width
    from search_engine_spark.functions.oracle_pipeline import line_dedup_sql

    assert f"*{LINE_WIDTH}+1" in line_dedup_sql()


def test_warc_epoch_independent_of_session_timezone(spark):
    """warc_ts is built from epoch seconds, so the oracle's
    1704067200 + 60*doc_id arithmetic must hold under ANY
    spark.sql.session.timeZone (the driver's session need not be UTC)."""
    from pyspark.sql import functions as F

    from search_engine_spark.sources.documents import load_documents

    from tests.conftest import SF_TEST

    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        rows = (
            load_documents(spark, SF_TEST)
            .filter("doc_id < 3")
            .select("doc_id", F.unix_timestamp("warc_ts").alias("ep"))
            .collect()
        )
        assert {r["doc_id"]: r["ep"] for r in rows} == {
            i: 1704067200 + 60 * i for i in range(3)
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_curation_funnel_monotone(spark):
    from search_engine_spark.operators.curation import curation_funnel
    from search_engine_spark.sources.documents import load_documents

    from tests.conftest import SF_TEST

    out = {
        r["stage"]: r["n_rows"]
        for r in curation_funnel(load_documents(spark, SF_TEST)).collect()
    }
    order = sorted(out)  # stage names are 1_..7_ prefixed
    assert len(order) == 7 and order[0] == "1_input"
    counts = [out[s] for s in order]
    assert counts == sorted(counts, reverse=True)  # never grows
    assert counts[0] > counts[-1] > 0  # funnel actually filters


# ------------------------------------------------------------------ DSIR


def test_dsir_all_target_collapses_to_zero(spark):
    """If every doc is in-domain, target and raw models coincide exactly
    (same counts, same totals) so every log-ratio — and hence every
    weight — is exactly 0."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.curation import dsir_weights

    rows = [
        (1, "fast data table join", "en"),
        (2, "slow scan of the table", "en"),
        (3, "data data data", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = dsir_weights(docs, target_pred=F.lit(True)).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 2, 3]
    assert all(r["logw"] == 0.0 for r in out)


def test_dsir_feature_mass_is_2dl_minus_1(spark):
    """Unigrams contribute dl features, adjacent bigrams dl-1 — total
    hashed-feature mass per doc is 2·dl−1 (dl ≥ 1), 0 for empty docs."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.curation import dsir_features
    from search_engine_spark.operators.positional import build_positional

    rows = [
        (1, "fast data table join"),   # 4 retained → 7
        (2, "data"),                   # 1 retained → 1
        (3, ""),                       # 0 retained → absent
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pos = build_positional(docs)
    mass = {
        r["doc_id"]: r["m"]
        for r in dsir_features(pos)
        .groupBy("doc_id")
        .agg(F.sum("cnt").alias("m"))
        .collect()
    }
    assert mass == {1: 7.0, 2: 1.0}


def test_dsir_separates_target_like_docs(spark):
    """Docs sharing the target's vocabulary must outweigh docs that
    don't: ngram overlap with the in-domain exemplars is the signal."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.curation import dsir_weights

    rows = (
        [(i, "quality curated reference corpus text", "en") for i in range(5)]
        + [(10, "quality curated reference corpus text", "xx"),
           (11, "zebra quagga okapi tapir wombat", "xx")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    w = {r["doc_id"]: r["logw"] for r in dsir_weights(docs).collect()}
    assert w[10] > w[11]


# -------------------------------------------------------------------- C4


def test_c4_line_rules_and_page_gates(spark):
    """Pin the C4 rules on inspectable docs: terminal punctuation AND
    >=5 words keeps a line; lorem-ipsum/curly-brace or <3 kept lines
    drops the page."""
    from search_engine_spark.operators.curation import c4_clean

    good_line = "alpha beta gamma delta epsilon zeta eta theta."
    rows = [
        # 3 kept lines (8 words each, '.'-terminated) → kept doc
        (1, " ".join([good_line] * 3)),
        # lines long enough but unpunctuated → 0 kept → dropped
        (2, "alpha beta gamma delta epsilon zeta eta theta " * 3),
        # poisoned by brace despite 3 good lines → dropped
        (3, " ".join([good_line] * 3) + " {"),
        # poisoned by lorem ipsum (case-folded) → dropped
        (4, " ".join([good_line] * 3) + " Lorem IPSUM"),
        # only 2 kept lines → below min_kept → dropped
        (5, " ".join([good_line] * 2)),
        (6, ""),  # empty doc
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_clean(docs).collect()}
    assert out[1]["keep_doc"] and out[1]["n_kept"] == 3
    assert out[1]["clean_text"] == "\n".join([good_line] * 3)
    assert not out[2]["keep_doc"] and out[2]["n_kept"] == 0
    assert not out[3]["keep_doc"] and out[3]["n_kept"] >= 3
    assert not out[4]["keep_doc"]
    assert not out[5]["keep_doc"] and out[5]["n_kept"] == 2
    assert not out[6]["keep_doc"] and out[6]["n_lines"] == 0


def test_c4_short_final_line_is_counted_but_not_kept(spark):
    """A trailing partial chunk below min_words never survives even if
    punctuated."""
    from search_engine_spark.operators.curation import c4_clean

    docs = spark.createDataFrame(
        [(1, "one two three.")], "doc_id long, text string"
    )
    row = c4_clean(docs).collect()[0]
    assert row["n_lines"] == 1 and row["n_kept"] == 0


# ---------------------------------------------------------- CCNet buckets


def test_ccnet_terciles_are_per_language_and_ordered(spark):
    """Buckets split each language independently into near-equal thirds,
    and every head doc has perplexity <= every tail doc of its lang."""
    from search_engine_spark.operators.index_build import build_postings
    from search_engine_spark.operators.textstats import ccnet_buckets

    rows = [
        (i, "common words " * 3 + f"rare{i} " * (i % 4), "en") for i in range(9)
    ] + [
        (100 + i, "mots communs " * 3 + f"rare{i} " * (i % 3), "fr")
        for i in range(6)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = ccnet_buckets(docs, build_postings(docs)).toPandas()
    for lang, grp in out.groupby("lang"):
        sizes = grp.bucket.value_counts()
        assert max(sizes) - min(sizes) <= 1
        assert grp[grp.bucket == "head"].lm_ppl.max() <= \
            grp[grp.bucket == "tail"].lm_ppl.min()


def test_ccnet_excludes_empty_docs(spark):
    from search_engine_spark.operators.index_build import build_postings
    from search_engine_spark.operators.textstats import ccnet_buckets

    rows = [(1, "some data here", "en"), (2, "", "en"), (3, "more data", "en")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = ccnet_buckets(docs, build_postings(docs)).toPandas()
    assert sorted(out.doc_id) == [1, 3]


# --------------------------------------------------------- snapshot delta


def test_snapshot_delta_all_four_classes(spark):
    """Crafted revision sets hit every class (the fixture only produces
    changed/removed): http_code liveness derives from doc_id % 53 == 13
    (404), so doc_ids are chosen around that rule."""
    from search_engine_spark.operators.curation import snapshot_delta

    EPOCH = 1704067200
    # page_key = doc_id % 101; epoch = EPOCH + 60*doc_id; cutoff below
    # splits doc_id <= 10 (old) from doc_id > 10 (new)
    rows = [
        # page 1: old live (doc 1), new live different text → changed
        (1, "old text one"), (102, "new text one"),
        # page 2: old live (doc 2), new live SAME text → unchanged
        # (204 % 101 = 2; 204 % 53 = 45 → http 200, unlike 103 whose
        # %53 = 50 lands on the in-flight-102 slice)
        (2, "same text"), (204, "same text"),
        # page 3: no old revision, new live → added
        (104, "fresh page"),
        # page 4: old live (doc 4), newest revision dead (404) → removed
        (4, "will die"), (318, "dead fetch"),  # 318 % 53 == 0? no: 318%53=0→200!
    ]
    # doc 318 % 53 = 0 → live; need a dead newest: 13 % 53 == 13 is dead but
    # 13 <= cutoff... use 225: 225 % 53 = 13 → 404, 225 % 101 = 23
    rows[-1] = (4 + 101, "dead fetch")  # placeholder replaced below
    rows = rows[:-2] + [(23, "will die"), (225, "dead fetch")]  # page 23
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        rows, "doc_id long, text string"
    ).withColumn(
        "warc_ts", F.timestamp_seconds(EPOCH + 60 * F.col("doc_id"))
    )
    cutoff = EPOCH + 60 * 100  # doc_id <= 100 is "old"
    out = {r["page_key"]: r for r in snapshot_delta(docs, cutoff).collect()}
    assert out[1]["status"] == "changed" and out[1]["old_doc"] == 1 \
        and out[1]["new_doc"] == 102
    assert out[2]["status"] == "unchanged"
    assert out[3]["status"] == "added" and out[3]["old_doc"] is None \
        and out[3]["new_doc"] == 104
    assert out[23]["status"] == "removed" and out[23]["old_doc"] == 23 \
        and out[23]["new_doc"] is None


def test_snapshot_delta_drops_pages_dead_in_both(spark):
    from search_engine_spark.operators.curation import snapshot_delta

    from pyspark.sql import functions as F

    # doc 13 (404, old side) and doc 225 (404, new side): pages never live
    # → absent (13 % 101 = 13 and 225 % 101 = 23 are different pages, each
    # with only dead revisions)
    docs = spark.createDataFrame(
        [(13, "dead old"), (225, "dead new")], "doc_id long, text string"
    ).withColumn(
        "warc_ts", F.timestamp_seconds(1704067200 + 60 * F.col("doc_id"))
    )
    out = snapshot_delta(docs, 1704067200 + 60 * 100).collect()
    assert out == []


# ------------------------------------------------- Gopher quality rules

def test_gopher_rules_each_signal(spark):
    from search_engine_spark.operators import curation as cu

    good = " ".join(
        ["the quick brown fox jumps over the lazy dog and that have with be to of"] * 5
    )  # 70 words, stopword-rich, alphabetic, mean wl ~3.5
    rows = [
        (0, good, "en"),                                     # passes all
        (1, "tiny doc", "en"),                               # n_words < 50
        (2, " ".join(["supercalifragilistic"] * 60), "en"),  # mean wl > 10
        (3, good + " " + "# " * 20, "en"),                   # symbol ratio
        (4, " ".join(["12345 678 90 11"] * 20), "en"),       # alpha < 0.8
        (5, " ".join(["plain words without stopwords here"] * 15), "en"),  # stops < 2
        (6, "", "en"),                                       # empty
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["doc_id"]: r for r in cu.gopher_rules(docs).collect()}
    assert got[0]["keep_doc"] is True
    assert got[1]["keep_doc"] is False and got[1]["n_words"] < 50
    assert got[2]["keep_doc"] is False and got[2]["mean_word_len"] > 10
    assert got[3]["keep_doc"] is False and got[3]["symbol_ratio"] > 0.1
    assert got[4]["keep_doc"] is False and got[4]["alpha_ratio"] < 0.8
    assert got[5]["keep_doc"] is False and got[5]["n_stop"] < 2
    assert got[6]["keep_doc"] is False and got[6]["n_words"] == 0


def test_gopher_rules_line_signals(spark):
    from search_engine_spark.operators import curation as cu

    stop_pad = "the and that have with be to of the and that have with be to of"
    bullets = " ".join(["- item aa bb"] * 6)  # every width-4 line bullet-led
    dots = " ".join(["aa bb cc dd..."] * 6)   # every line ellipsis-ended
    rows = [
        (0, bullets + " " + stop_pad + " " + stop_pad + " " + stop_pad, "en"),
        (1, dots + " " + stop_pad + " " + stop_pad + " " + stop_pad, "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["doc_id"]: r for r in cu.gopher_rules(docs).collect()}
    # 6 of 18 lines bullet-led (ratio 1/3 <= 0.9 passes); ellipsis 6/18 > 0.3 fails
    assert got[0]["bullet_ratio"] == pytest.approx(6 / 18, abs=1e-3)
    assert got[1]["ellipsis_ratio"] == pytest.approx(6 / 18, abs=1e-3)
    assert got[1]["keep_doc"] is False


def test_dedup_incremental_probes_only_new_vs_corpus(spark):
    """The incremental gate emits (new, existing) pairs only: two
    near-identical CORPUS docs never pair, a new doc pairs with its
    corpus near-duplicate, and an unrelated new doc stays silent."""
    import pandas as pd

    from search_engine_spark.operators.dedup import dedup_incremental

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),                       # corpus
        (2, base + " lambda"),           # corpus near-dup of 1 (no pair: both old)
        (13, base + " mu"),              # NEW (13 % 13 == 0) near-dup of corpus
        (26, "one two three four five"), # NEW, unrelated
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_incremental(docs, threshold=0.5).collect()
    }
    assert got == {(13, 1), (13, 2)}


def test_ccnet_window_is_language_keyed(spark):
    """Plan pin (r03-verdict #7): the CCNet tercile ntile windows
    partition on lang (bounded key set); a refactor widening them to a
    global sort fails here."""
    import re

    from search_engine_spark.operators.index_build import build_postings
    from search_engine_spark.operators.textstats import ccnet_buckets

    docs = spark.createDataFrame(
        [(1, "some data here", "en"), (2, "more data", "fr")],
        "doc_id long, text string, lang string",
    )
    plan = (
        ccnet_buckets(docs, build_postings(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "lang" in spec, spec


class TestRound5Curation:
    def _site_docs(self, spark, rows):
        """rows: (doc_id, text) — site_key derived like load_documents
        (doc_id % 3), so crafted docs land on controllable sites."""
        from pyspark.sql import functions as F

        return spark.createDataFrame(
            rows, "doc_id long, text string"
        ).withColumn(
            "site_key",
            F.concat(F.lit("site-"), F.char(F.col("doc_id") % 3 + 97)),
        )

    def test_mojibake_stats_crafted(self, spark):
        from search_engine_spark.operators.curation import mojibake_stats

        rows = [
            (0, "clean ascii text"),
            (1, "bad Ã© decode â€™ here"),      # Ã, €, ™ markers
            (2, ""),
            (3, "привет мир"),                   # Cyrillic is NOT mojibake
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_marks"], r["clean"])
            for r in mojibake_stats(docs).collect()
        }
        assert got[0] == (0, True)
        assert got[1][0] == 3 and got[1][1] is False
        assert got[2] == (0, True)
        assert got[3] == (0, True)
        row1 = {r["doc_id"]: r for r in mojibake_stats(docs).collect()}[1]
        assert row1["marks_per_kchar"] == round(
            3 * 1000.0 / row1["n_chars"], 4
        )

    def test_boilerplate_detected_per_site_only(self, spark):
        """A 4-token chunk repeated on every page of site-a is flagged
        for site-a only; the same chunk on ONE page of site-b is not."""
        from search_engine_spark.operators.curation import (
            boilerplate_lines,
        )

        nav = "home about contact login"
        # doc_ids 0,3,6,9 -> site-a; 1 -> site-b
        rows = [
            (0, f"{nav} alpha beta gamma delta"),
            (3, f"{nav} epsilon zeta eta theta"),
            (6, f"{nav} iota kappa lam mu"),
            (9, f"{nav} nu xi omicron pi"),
            (1, f"{nav} rho sigma tau upsilon"),
            (4, "phi chi psi omega unique words here now"),
        ]
        docs = self._site_docs(spark, rows)
        got = boilerplate_lines(docs, min_pages=2, min_frac=0.5).collect()
        assert len(got) == 1
        r = got[0]
        assert r["site_key"] == "site-a" and r["line"] == nav
        assert r["n_pages"] == 4 and r["frac"] == 1.0

    def test_remove_boilerplate_strips_only_flagged_site(self, spark):
        from search_engine_spark.operators.curation import (
            remove_boilerplate,
        )

        nav = "home about contact login"
        rows = [
            (0, f"{nav} alpha beta gamma delta"),
            (3, f"{nav} epsilon zeta eta theta"),
            (1, f"{nav} rho sigma tau upsilon"),
        ]
        docs = self._site_docs(spark, rows)
        got = {
            r["doc_id"]: r
            for r in remove_boilerplate(
                docs, min_pages=2, min_frac=0.5
            ).collect()
        }
        # site-a docs lose the nav chunk, keep their content chunk
        assert got[0]["clean_text"] == "alpha beta gamma delta"
        assert got[0]["n_dropped"] == 1 and got[0]["n_kept"] == 1
        assert got[3]["clean_text"] == "epsilon zeta eta theta"
        # site-b's single page keeps everything (nav not boilerplate
        # THERE: one page is below min_pages)
        assert got[1]["n_dropped"] == 0
        assert got[1]["clean_text"].startswith(nav)
