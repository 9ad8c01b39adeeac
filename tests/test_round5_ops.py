"""Unit tests for the round-5 session-2 operators: winnowing
fingerprints, median-absolute-deviation, ip_prefix, redirect-chain
resolution, and SpanOr proximity. Oracle parity at fixture scale is
covered by the sweep (oracle_sweep.py); these pin the semantics on
crafted inputs with hand-derivable expectations.
"""

import pytest

from search_engine_spark.hashing import h60_py
from search_engine_spark.operators.events import (
    IP_PREFIX_BITS,
    IP_SALT,
    ip_prefix_agg,
)
from search_engine_spark.operators.graph import (
    REDIR_MOD,
    redirect_edges,
    redirect_resolve,
)
from search_engine_spark.operators.positional import search_span_or
from search_engine_spark.operators.textstats import (
    WINNOW_K,
    WINNOW_W,
    mad_agg,
    winnowing_fingerprints,
)

# ------------------------------------------------------------- winnowing


def _doc(spark, text, doc_id=1, lang="en"):
    return spark.createDataFrame(
        [(doc_id, text, lang)], "doc_id long, text string, lang string"
    )


def _winnow_py(tokens, k=WINNOW_K, w=WINNOW_W):
    """Reference winnowing: leftmost minimal shingle hash per window."""
    shingles = [
        " ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)
    ]
    hs = [h60_py(s) for s in shingles]
    n_win = max(len(hs) - w + 1, 1)
    picks = set()
    for p in range(n_win):
        win = hs[p : p + w]
        mh = min(win)
        picks.add((p + win.index(mh), mh))
    return picks


def test_winnowing_matches_python_reference(spark):
    text = "the quick brown fox jumps over the lazy dog again and again"
    got = {
        (r["pos"], r["fp"])
        for r in winnowing_fingerprints(_doc(spark, text)).collect()
    }
    assert got == _winnow_py(text.lower().split())


def test_winnowing_window_guarantee(spark):
    """Every w consecutive shingles contain >= 1 selected fingerprint."""
    text = " ".join(f"tok{(i * 7) % 13}" for i in range(40))
    rows = winnowing_fingerprints(_doc(spark, text)).collect()
    positions = sorted(r["pos"] for r in rows)
    n_sh = 40 - WINNOW_K + 1
    for p in range(max(n_sh - WINNOW_W + 1, 1)):
        assert any(p <= q < p + WINNOW_W for q in positions), p


def test_winnowing_short_doc_single_window(spark):
    # k tokens -> exactly one shingle -> one truncated window, one pick
    rows = winnowing_fingerprints(_doc(spark, "alpha beta gamma")).collect()
    assert len(rows) == 1 and rows[0]["pos"] == 0
    # fewer than k tokens -> nothing
    assert winnowing_fingerprints(_doc(spark, "alpha beta")).count() == 0


def test_winnowing_shared_fingerprint_on_overlap(spark):
    """Two docs sharing a long token run share >= 1 fingerprint —
    the winnowing detection guarantee (match len >= w+k-1 is caught)."""
    shared = "one two three four five six seven eight"
    a = _doc(spark, "xx yy " + shared, doc_id=1)
    b = _doc(spark, shared + " zz ww", doc_id=2)
    docs = a.unionByName(b)
    rows = winnowing_fingerprints(docs).collect()
    fps = {}
    for r in rows:
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[1] & fps[2]


# --------------------------------------------------------------- mad_agg


def test_mad_agg_hand_example(spark):
    # en: lengths 1,3,5,9 -> median 4.0; devs 3,1,1,5 -> MAD 2.0
    rows = [
        (1, "a", "en"),
        (2, "a b c", "en"),
        (3, "a b c d e", "en"),
        (4, "a b c d e f g h i", "en"),
        (5, "x y z", "ru"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["lang"]: (r["median_n"], r["mad"]) for r in mad_agg(df).collect()}
    assert got["en"] == (4.0, 2.0)
    assert got["ru"] == (3.0, 0.0)


def test_mad_agg_interpolated_median(spark):
    # lengths 1,2 -> median 1.5; devs 0.5,0.5 -> MAD 0.5
    df = spark.createDataFrame(
        [(1, "a", "en"), (2, "a b", "en")],
        "doc_id long, text string, lang string",
    )
    r = mad_agg(df).collect()[0]
    assert (r["median_n"], r["mad"]) == (1.5, 0.5)


# ------------------------------------------------------------- ip_prefix


def test_ip_prefix_agg_deterministic_and_conserving(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = ip_prefix_agg(events).collect()
    total = events.count()
    assert sum(r["n_events"] for r in out) == total
    for r in out:
        assert r["prefix"].endswith(f"/{IP_PREFIX_BITS}")
        a, b, c, d = r["prefix"].split("/")[0].split(".")
        # /16 network: low octets zero, high octets in range
        assert (c, d) == ("0", "0")
        assert 0 <= int(a) <= 255 and 0 <= int(b) <= 255
        assert 1 <= r["n_users"] <= r["n_events"]


def test_ip_prefix_matches_python_hash(spark):
    events = spark.createDataFrame(
        [(1, 42), (2, 42)], "event_id long, user_id long"
    )
    r = ip_prefix_agg(events).collect()[0]
    ip = h60_py(f"{IP_SALT}42") % 2**32
    net = (ip >> 16) << 16
    want = f"{net >> 24}.{(net >> 16) % 256}.0.0/16"
    assert r["prefix"] == want
    assert (r["n_events"], r["n_users"]) == (2, 1)


# ------------------------------------------------------ redirect_resolve


def _py_resolve(n):
    """Reference chain walk over the fixture successor map."""

    def tgt(s):
        return max(s - 4, 0) if s % 3 else max(s - 1 - (s % 7), 0)

    srcs = {s for s in range(n) if s % REDIR_MOD == 1 and s > 0}
    out = {}
    for s in srcs:
        cur, hops = tgt(s), 1
        while cur in srcs:
            cur, hops = tgt(cur), hops + 1
        out[s] = (cur, hops)
    return out


def test_redirect_resolve_matches_python_walk(spark):
    from search_engine_spark.sources.documents import load_documents

    docs = load_documents(spark, "/root/testdata/sf0.001")
    n = docs.count()
    got = {
        r["src_doc"]: (r["final_doc"], r["hops"])
        for r in redirect_resolve(docs).collect()
    }
    assert got == _py_resolve(n)
    # multi-hop chains exist and terminate off the redirect set
    assert max(h for _, h in got.values()) >= 3
    srcs = {r["src"] for r in redirect_edges(docs).collect()}
    for final, _ in got.values():
        assert final not in srcs


def test_redirect_resolve_deep_chain(spark):
    # 53 -> 49 -> 45 -> 41 -> 37 -> 33 -> 27: six hops
    docs = spark.createDataFrame(
        [(i,) for i in range(60)], "doc_id long"
    ).selectExpr("doc_id", "'' as text", "'en' as lang")
    got = {
        r["src_doc"]: (r["final_doc"], r["hops"])
        for r in redirect_resolve(docs).collect()
    }
    assert got[53] == (27, 6)


# --------------------------------------------------------- search_span_or


def test_span_or_semantics(spark):
    rows = [
        (1, "data is fast here", "en"),  # data adjacent to fast
        (2, "data x x x x merge", "en"),  # merge 5 away > slop 3
        (3, "merge near data data", "en"),  # both occurrences within 3
        (4, "data only appears alone", "en"),  # no alternative
        (5, "fast merge no anchor", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: r["or_tf"]
        for r in search_span_or(
            docs, "data", ["fast", "merge"], slop=3
        ).collect()
    }
    assert got == {1: 1, 3: 2}


def test_span_or_requires_single_term_clauses(spark):
    docs = _doc(spark, "data fast")
    with pytest.raises(ValueError):
        search_span_or(docs, "data fast", ["merge"])
    with pytest.raises(ValueError):
        search_span_or(docs, "data", ["fast merge"])


# ---------------------------------------------------------- geohash_grid


def _geohash_py(lat, lon, p=4):
    """Reference base32 geohash (textbook interleave, lon first)."""
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    total = 5 * p
    latbits, lonbits = total // 2, total - total // 2
    import math

    lat_q = min(
        max(int(math.floor(round((lat + 90.0) / 180.0 * (1 << latbits), 9))), 0),
        (1 << latbits) - 1,
    )
    lon_q = min(
        max(int(math.floor(round((lon + 180.0) / 360.0 * (1 << lonbits), 9))), 0),
        (1 << lonbits) - 1,
    )
    combined = 0
    for i in range(total):
        if i % 2 == 0:
            bit = (lon_q >> (lonbits - 1 - i // 2)) & 1
        else:
            bit = (lat_q >> (latbits - 1 - i // 2)) & 1
        combined = (combined << 1) | bit
    return "".join(
        alpha[(combined >> (5 * (p - 1 - c))) & 31] for c in range(p)
    )


def test_geohash_grid_matches_python_reference(spark):
    from search_engine_spark.operators.geo import geohash_grid, with_geo
    from search_engine_spark.sources.documents import load_documents

    docs = load_documents(spark, "/root/testdata/sf0.001")
    got = {
        r["geohash"]: r["doc_count"]
        for r in geohash_grid(docs, size=10_000).collect()
    }
    from collections import Counter

    pts = with_geo(docs).select("doc_id", "lat", "lon").collect()
    want = Counter(_geohash_py(r["lat"], r["lon"]) for r in pts)
    assert got == dict(want)
    # sanity vs the canonical algorithm: every cell is 4 base32 chars
    assert all(len(k) == 4 for k in got)


def test_geohash_known_point(spark):
    # 57.64911,10.40744 -> 'u4pr...' (the classic geohash.org example)
    assert _geohash_py(57.64911, 10.40744, 4) == "u4pr"


# ----------------------------------------------------------- meta_robots


def test_meta_robots_directives(spark):
    from search_engine_spark.operators.graph import (
        META_NOFOLLOW,
        META_NOINDEX,
        META_NOINDEX_NOFOLLOW,
        META_ROBOTS_MOD,
        meta_robots,
    )
    from search_engine_spark.sources.documents import load_documents

    docs = load_documents(spark, "/root/testdata/sf0.001")
    for r in meta_robots(docs).collect():
        m = r["doc_id"] % META_ROBOTS_MOD
        assert r["noindex"] == (m in (META_NOINDEX_NOFOLLOW, META_NOINDEX))
        assert r["nofollow"] == (m in (META_NOINDEX_NOFOLLOW, META_NOFOLLOW))


def test_meta_robots_not_spoofable_from_text(spark):
    """Body text containing a meta-tag string must not flip the
    directive: the parse is anchored at the head insertion point."""
    from search_engine_spark.operators.graph import meta_robots
    from search_engine_spark.sources.documents import html_col

    evil = 'x <meta name="robots" content="noindex,nofollow"> y'
    docs = spark.createDataFrame(
        [(2, evil, "en")], "doc_id long, text string, lang string"
    ).withColumn("html", html_col())
    r = meta_robots(docs).collect()[0]
    assert (r["noindex"], r["nofollow"]) == (False, False)


# ------------------------------------------------------- sitemap roundtrip


def test_sitemap_roundtrip(spark):
    from search_engine_spark.operators.graph import (
        sitemap_extract,
        sitemap_xml,
    )
    from search_engine_spark.sources.documents import load_documents

    docs = load_documents(spark, "/root/testdata/sf0.001")
    n = docs.count()
    out = sitemap_extract(docs).collect()
    assert len(out) == n  # lossless parse: one row per doc
    by_site = {}
    for r in out:
        by_site.setdefault(r["site"], []).append(r)
        assert r["url"].startswith(f"https://{r['site']}/docs/")
        assert len(r["lastmod"]) == 10 and r["lastmod"][:3] == "202"
    assert set(by_site) == {
        "site-a.example", "site-b.example", "site-c.example"
    }
    xml_rows = sitemap_xml(docs).collect()
    assert len(xml_rows) == 3
    for r in xml_rows:
        assert r["xml"].startswith("<urlset")
        assert r["xml"].endswith("</urlset>")


# -------------------------------------------------- property-based suites

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_TOKS = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_TEXT = st.lists(_TOKS, min_size=0, max_size=24).map(" ".join)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_TEXT, min_size=1, max_size=4))
def test_winnowing_properties(spark, texts):
    """Random corpora: Spark output == the Python reference selector,
    and the per-window coverage guarantee holds."""
    docs = spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string",
    )
    rows = winnowing_fingerprints(docs).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for i, t in enumerate(texts):
        toks = t.lower().split() if t.strip() else []
        if len(toks) < WINNOW_K:
            assert i not in got
            continue
        assert got.get(i, set()) == _winnow_py(toks)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ids=st.lists(st.integers(min_value=0, max_value=400),
                    min_size=1, max_size=60, unique=True))
def test_redirect_resolve_arbitrary_id_sets(spark, ids):
    """The corpus need not be contiguous: resolve on an arbitrary doc_id
    subset must equal the Python walk restricted to the SAME subset
    (redirect membership is per-doc arithmetic; targets may fall outside
    the corpus and then count as terminal)."""
    docs = spark.createDataFrame(
        [(i,) for i in ids], "doc_id long"
    ).selectExpr("doc_id", "'' as text", "'en' as lang")

    def tgt(s):
        return max(s - 4, 0) if s % 3 else max(s - 1 - (s % 7), 0)

    srcs = {s for s in ids if s % REDIR_MOD == 1 and s > 0}
    want = {}
    for s in srcs:
        cur, hops = tgt(s), 1
        while cur in srcs:
            cur, hops = tgt(cur), hops + 1
        want[s] = (cur, hops)
    got = {
        r["src_doc"]: (r["final_doc"], r["hops"])
        for r in redirect_resolve(docs).collect()
    }
    assert got == want


# ------------------------------------------------- geo_bounds / moving pct


def test_geo_bounds_envelope(spark):
    from search_engine_spark.operators.geo import geo_bounds, with_geo
    from search_engine_spark.sources.documents import load_documents

    docs = load_documents(spark, "/root/testdata/sf0.001")
    pts = with_geo(docs).selectExpr(
        "concat('site-', char(doc_id % 3 + 97)) AS site_key", "lat", "lon"
    ).collect()
    want = {}
    for r in pts:
        t = want.setdefault(
            r["site_key"], [-1e9, 1e9, 1e9, -1e9, 0]
        )  # top, left, bottom, right, n
        t[0] = max(t[0], r["lat"]); t[1] = min(t[1], r["lon"])
        t[2] = min(t[2], r["lat"]); t[3] = max(t[3], r["lon"])
        t[4] += 1
    got = geo_bounds(docs).collect()
    assert len(got) == len(want)
    for r in got:
        t = want[r["site_key"]]
        assert (r["top"], r["left"], r["bottom"], r["right"], r["n"]) == (
            t[0], t[1], t[2], t[3], t[4],
        )
        assert r["top"] >= r["bottom"] and r["right"] >= r["left"]


def test_moving_percentiles_hand_example(spark):
    import datetime

    from search_engine_spark.operators.events import moving_percentiles

    # daily counts: d1=1, d2=2, d3=3, d4=10 (one event per unit)
    rows = []
    eid = 0
    for day, cnt in [(1, 1), (2, 2), (3, 3), (4, 10)]:
        for _ in range(cnt):
            rows.append(
                (eid, datetime.datetime(2025, 3, day, 12, 0, 0), 1, "view", 1.0)
            )
            eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    got = {r["day"].day: (r["n"], r["p50"], r["p90"]) for r in
           moving_percentiles(events).collect()}

    def pct(xs, q):
        xs = sorted(xs)
        idx = (len(xs) - 1) * q
        lo, hi = int(idx // 1), -(-idx // 1)
        lo, hi = int(lo), int(hi)
        return round(xs[lo] + (xs[hi] - xs[lo]) * (idx - lo), 4)

    series = {1: [1], 2: [1, 2], 3: [1, 2, 3], 4: [1, 2, 3, 10]}
    for d, xs in series.items():
        n = {1: 1, 2: 2, 3: 3, 4: 10}[d]
        assert got[d] == (n, pct(xs, 0.5), pct(xs, 0.9)), d


# ------------------------------- ip_range / geo_line / collapse inner_hits


def test_ip_range_partitions_events(spark):
    from search_engine_spark.operators.events import ip_range_agg

    from collections import defaultdict

    from search_engine_spark.operators.events import ip_range_bounds

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = {
        r["range"]: (r["n_events"], r["n_users"])
        for r in ip_range_agg(events).collect()
    }
    # full Python mirror of the aggregation (r05 review: the previous
    # hand-check never consulted the operator's output)
    ev_counts = defaultdict(int)
    users = defaultdict(set)
    for r in events.select("user_id").collect():
        ip = h60_py(f"{IP_SALT}{r['user_id']}") % 2**32
        lab = next(
            key for lo, hi, key in ip_range_bounds()
            if (lo is None or ip >= lo) and (hi is None or ip < hi)
        )
        ev_counts[lab] += 1
        users[lab].add(r["user_id"])
    want = {lab: (ev_counts[lab], len(users[lab])) for lab in ev_counts}
    assert out == want
    assert sum(n for n, _ in out.values()) == events.count()


def test_geo_line_ordering(spark):
    from search_engine_spark.operators.geo import GEO_LINE_SIZE, geo_line
    from search_engine_spark.sources.documents import load_documents

    docs = load_documents(spark, "/root/testdata/sf0.001")
    out = geo_line(docs).collect()
    by_site = {}
    for r in out:
        by_site.setdefault(r["site_key"], []).append((r["seq"], r["doc_id"]))
    assert set(by_site) == {"site-a", "site-b", "site-c"}
    for site, pts in by_site.items():
        pts.sort()
        assert len(pts) <= GEO_LINE_SIZE
        assert [s for s, _ in pts] == list(range(1, len(pts) + 1))
        # warc_ts is monotone in doc_id, so the track is the site's
        # lowest doc_ids in ascending order
        ds = [d for _, d in pts]
        assert ds == sorted(ds)
        site_docs = sorted(
            r["doc_id"] for r in docs.collect()
            if f"site-{chr(97 + r['doc_id'] % 3)}" == site
        )
        assert ds == site_docs[: len(ds)]


def test_search_collapsed_inner_semantics(spark):
    from search_engine_spark.operators.search import search_collapsed_inner

    hits = spark.createDataFrame(
        [
            (1, 9.0, "a"), (2, 8.0, "a"), (3, 7.0, "a"), (4, 6.0, "a"),
            (5, 9.0, "b"), (6, 5.0, "b"),
            (7, 3.0, "c"),
        ],
        "doc_id long, score double, site_key string",
    )
    out = search_collapsed_inner(hits, inner_size=3, limit=2).collect()
    rows = {(r["site_key"], r["inner_rank"]): (r["head_doc"], r["inner_doc"])
            for r in out}
    # limit=2 heads: a (doc 1, score 9, tie with b's doc 5 broken by
    # doc_id asc) and b — group c's head is cut by the global limit
    assert {s for s, _ in rows} == {"a", "b"}
    assert rows[("a", 1)] == (1, 1)      # head is inner_rank 1
    assert rows[("a", 2)] == (1, 2)
    assert rows[("a", 3)] == (1, 3)      # doc 4 cut by inner_size
    assert ("a", 4) not in rows
    assert rows[("b", 1)] == (5, 5)
    assert rows[("b", 2)] == (5, 6)


# -------------------------------- percentiles_bucket / reverse_nested


def test_percentiles_bucket_hand_example(spark):
    import datetime

    from search_engine_spark.operators.events import percentiles_bucket

    rows, eid = [], 0
    for day, cnt in [(1, 1), (2, 2), (3, 3), (4, 4)]:
        for _ in range(cnt):
            rows.append(
                (eid, datetime.datetime(2025, 4, day), 1, "view", 1.0)
            )
            eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    r = percentiles_bucket(events).collect()[0]
    # series [1,2,3,4]: p25 = 1.75, p50 = 2.5, p75 = 3.25
    assert (r["n_buckets"], r["p25"], r["p50"], r["p75"]) == (
        4, 1.75, 2.5, 3.25,
    )


def test_reverse_nested_parent_vs_chunk_scope(spark):
    from search_engine_spark.operators.nested import reverse_nested_agg

    # doc 0 (site-a): TWO chunks each containing both terms -> 1 parent,
    # 2 chunks; doc 3 (site-a): terms split across chunks -> no match;
    # doc 1 (site-b): one matching chunk
    filler = " ".join(["pad"] * 32)  # > chunk_size gap splits the terms
    rows = [
        (0, f"data fast {filler} data fast", "en"),
        (3, f"data {filler} fast", "en"),
        (1, "fast data", "en"),
        (2, "nothing here", "en"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    got = {
        r["site_key"]: (r["n_parents"], r["n_chunks"])
        for r in reverse_nested_agg(docs, ["data", "fast"]).collect()
    }
    assert got == {"site-a": (1, 2), "site-b": (1, 1)}
