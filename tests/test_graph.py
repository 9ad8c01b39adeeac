"""Unit tests for operators/graph.py and search.collapse_hits.

Oracle parity at fixture scale is covered by test_oracle_parity.py
(link_extract / pagerank / search_collapsed); these pin the semantics on
crafted inputs with hand-derivable expectations.
"""

import pytest

from search_engine_spark.operators.graph import (
    extract_links,
    linked_html,
    pagerank,
    resolved_edges,
)
from search_engine_spark.operators.search import collapse_hits


def _docs(spark, n=6):
    from search_engine_spark.sources.documents import load_documents

    return load_documents(spark, "/root/testdata/sf0.001").filter(
        f"doc_id < {n}"
    )


def test_linked_html_preserves_extraction(spark):
    """The appended anchors are empty-text: the byte-identity invariant
    extract_text(html) == text must survive linked_html."""
    from search_engine_spark.textproc.extract import extract_text

    rows = linked_html(_docs(spark)).select("doc_id", "text", "html").collect()
    assert rows
    for r in rows:
        assert extract_text(bytes(r["html"]).decode("utf-8")) == r["text"]


def test_extract_links_shape(spark):
    links = extract_links(linked_html(_docs(spark, n=4))).collect()
    got = {(r["src_doc"], r["dst_doc"]) for r in links}
    # doc v links to v+1 and v//2; doc 0's self-link is dropped
    assert got == {(0, 1), (1, 2), (1, 0), (2, 3), (2, 1), (3, 4), (3, 1)}
    for r in links:
        assert r["dst_url"].endswith(f"/docs/{r['dst_doc']}")


def test_extract_links_external_url_unresolved(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b'<a href="https://other.example/page">x</a>'))],
        "doc_id long, html binary",
    )
    rows = extract_links(df).collect()
    assert len(rows) == 1
    assert rows[0]["dst_url"] == "https://other.example/page"
    assert rows[0]["dst_doc"] is None


def test_resolved_edges_drops_dangling(spark):
    docs = _docs(spark, n=4)  # nodes 0..3; doc 3 links to 4 (dangling)
    edges = {
        (r["src"], r["dst"])
        for r in resolved_edges(docs, extract_links(linked_html(docs))).collect()
    }
    assert edges == {(0, 1), (1, 2), (1, 0), (2, 3), (2, 1), (3, 1)}


def test_pagerank_matches_reference_power_iteration(spark):
    """3-iteration PageRank on the crafted 4-node graph above equals a
    hand-run power iteration (no dangling redistribution, N-scaled)."""
    docs = _docs(spark, n=4)
    edges = resolved_edges(docs, extract_links(linked_html(docs)))
    got = {r["doc_id"]: r["pr"] for r in pagerank(docs, edges).collect()}

    # reference computation in plain Python
    adj = {0: [1], 1: [2, 0], 2: [3, 1], 3: [1]}  # src -> dsts (after resolve)
    n, d = 4, 0.85
    rank = {v: 1.0 / n for v in range(n)}
    for _ in range(3):
        nxt = {v: (1.0 - d) / n for v in range(n)}
        for u, dsts in adj.items():
            for v in dsts:
                nxt[v] += d * rank[u] / len(dsts)
        rank = nxt
    expect = {v: round(rank[v] * n, 4) for v in range(n)}
    assert got == expect


def test_pagerank_mass_bounded(spark):
    docs = _docs(spark, n=50)
    edges = resolved_edges(docs, extract_links(linked_html(docs)))
    prs = [r["pr"] for r in pagerank(docs, edges).collect()]
    assert all(p > 0 for p in prs)
    # dangling mass leaks (not redistributed): total < N, but most retained
    assert 0.5 * 50 < sum(prs) <= 50.0 + 1e-6


# ---------------------------------------------------------------- collapse


@pytest.fixture()
def hits(spark):
    rows = [
        ("s1", 1, 5.0),
        ("s1", 2, 9.0),
        ("s1", 3, 9.0),  # tie with doc 2 — lower doc_id must win
        ("s2", 4, 7.0),
        ("s3", 5, 1.0),
    ]
    return spark.createDataFrame(
        rows, "site_key string, doc_id long, score double"
    )


def test_collapse_hits_one_per_site(spark, hits):
    out = [
        (r["site_key"], r["doc_id"], r["score"])
        for r in collapse_hits(hits).collect()
    ]
    assert out == [("s1", 2, 9.0), ("s2", 4, 7.0), ("s3", 5, 1.0)]


def test_collapse_hits_per_group_window_path(spark, hits):
    out = [
        (r["site_key"], r["doc_id"]) for r in collapse_hits(hits, per_group=2).collect()
    ]
    assert out == [("s1", 2), ("s1", 3), ("s2", 4), ("s3", 5)]


def test_collapse_hits_limit(spark, hits):
    assert collapse_hits(hits, limit=2).count() == 2


# ---------------------------------------------------------------- frontier


def test_crawl_frontier_budget_and_ranking(spark):
    from search_engine_spark.operators.graph import crawl_frontier

    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    links = spark.createDataFrame(
        [
            # dst 9 has 3 in-links, dst 8 has 1 → 9 ranks first
            (1, "https://h1.example/docs/9", 9),
            (2, "https://h1.example/docs/9", 9),
            (1, "https://h1.example/docs/9", 9),
            (2, "https://h1.example/docs/8", 8),
            (1, "https://h1.example/docs/7", 7),
            # already crawled → excluded by the anti-join
            (1, "https://h1.example/docs/2", 2),
            # other host, below budget
            (2, "https://h2.example/docs/5", 5),
            # external (unresolved) links don't enter the frontier
            (1, "https://elsewhere.example/x", None),
        ],
        "src_doc long, dst_url string, dst_doc long",
    )
    out = [
        (r["host"], r["dst_url"], r["n_inlinks"], r["rank"])
        for r in crawl_frontier(docs, links, per_host=2).collect()
    ]
    # in-link count ranks first; ties break on dst_url asc, so docs/7
    # beats docs/8 and the per_host=2 budget cuts docs/8 on h1
    assert sorted(out) == [
        ("h1.example", "https://h1.example/docs/7", 1, 2),
        ("h1.example", "https://h1.example/docs/9", 3, 1),
        ("h2.example", "https://h2.example/docs/5", 1, 1),
    ]
    assert all(rank <= 2 for (_, _, _, rank) in out)


def test_robots_filter_per_host_prefix(spark):
    from search_engine_spark.operators.graph import robots_filter

    links = spark.createDataFrame(
        [
            (1, "https://h1.example/docs/10", 10),     # disallowed on h1
            (1, "https://h1.example/docs/100", 100),   # prefix match → out
            (1, "https://h1.example/docs/2", 2),       # allowed
            (1, "https://h2.example/docs/10", 10),     # other host → allowed
        ],
        "src_doc long, dst_url string, dst_doc long",
    )
    rules = spark.createDataFrame(
        [("h1.example", "/docs/10")], "host string, path_prefix string"
    )
    kept = {r["dst_url"] for r in robots_filter(links, rules).collect()}
    assert kept == {
        "https://h1.example/docs/2",
        "https://h2.example/docs/10",
    }


def test_trustrank_concentrates_on_seed_neighborhood(spark):
    from search_engine_spark.operators.graph import trustrank

    docs = _docs(spark, n=30)
    edges = resolved_edges(docs, extract_links(linked_html(docs)))
    seeds = docs.filter("doc_id in (0, 10)").select("doc_id")
    tr = {r["doc_id"]: r["tr"] for r in trustrank(docs, edges, seeds).collect()}
    pr_all = sum(tr.values())
    # teleport mass only enters at seeds: total is bounded by N, positive
    # (+0.01 headroom: each of 30 values is independently 4 dp-rounded)
    assert 0 < pr_all <= 30.01
    # a page only reachable far from any seed gets (almost) nothing;
    # the direct successor of a seed outranks it
    assert tr[1] > tr[29]
    # non-reachable-from-seed pages score EXACTLY 0 (no uniform teleport
    # term — the distinguishing property vs pagerank)
    assert tr[29] == 0.0


def test_trustrank_ignores_seeds_outside_nodes(spark):
    """Seeds not present in docs carry no teleport mass and must not
    deflate everyone else's score (|S| counts surviving seeds only)."""
    from search_engine_spark.operators.graph import trustrank

    docs = _docs(spark, n=20)
    edges = resolved_edges(docs, extract_links(linked_html(docs)))
    seeds_in = docs.filter("doc_id in (0, 10)").select("doc_id")
    seeds_extra = spark.createDataFrame(
        [(0,), (10,), (999,), (1234,)], "doc_id long"
    )
    a = {r["doc_id"]: r["tr"] for r in trustrank(docs, edges, seeds_in).collect()}
    b = {r["doc_id"]: r["tr"] for r in trustrank(docs, edges, seeds_extra).collect()}
    assert a == b


def test_hits_matches_hand_power_iteration(spark):
    """Crafted 4-node graph; compare against a literal numpy HITS run."""
    import numpy as np

    from search_engine_spark.operators.graph import hits

    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    edge_list = [(0, 1), (0, 2), (1, 2), (3, 2), (2, 0)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")

    a = np.ones(4)
    h = np.ones(4)
    for _ in range(2):
        a = np.zeros(4)
        for s, d in edge_list:
            a[d] += h[s]
        a /= a.sum()
        h = np.zeros(4)
        for s, d in edge_list:
            h[s] += a[d]
        h /= h.sum()

    got = {r["doc_id"]: r for r in hits(docs, edges).collect()}
    for i in range(4):
        assert got[i]["authority"] == round(float(a[i] * 4), 4)
        assert got[i]["hub"] == round(float(h[i] * 4), 4)
    # node 2 receives from three distinct hubs → top authority
    assert max(range(4), key=lambda i: got[i]["authority"]) == 2


def test_parse_robots_group_semantics(spark):
    """Decoy agent groups ignored, consecutive UA lines share a group,
    comments stripped, empty Disallow dropped, case-insensitive keys."""
    from search_engine_spark.operators.graph import parse_robots

    txt = (
        "User-agent: evilbot\n"
        "Disallow: /everything\n"
        "\n"
        "User-agent: goodbot\n"
        "USER-AGENT: *\n"          # consecutive UA lines → same group
        "disallow: /private  # inline comment\n"
        "Disallow:\n"              # allow-all sentinel → dropped
        "Crawl-delay: 5\n"
        "Disallow: /tmp\n"
        "\n"
        "User-agent: otherbot\n"
        "Disallow: /other\n"
    )
    robots = spark.createDataFrame(
        [("h.example", txt)], "host string, robots_txt string"
    )
    got = {
        (r["host"], r["path_prefix"]) for r in parse_robots(robots).collect()
    }
    assert got == {("h.example", "/private"), ("h.example", "/tmp")}


def test_parse_robots_feeds_robots_filter(spark):
    """End-to-end: parsed fixture rules filter links identically to the
    frozen ROBOTS_RULES literal."""
    from search_engine_spark.operators.graph import (
        ROBOTS_RULES,
        extract_links,
        linked_html,
        parse_robots,
        robots_filter,
        robots_fixture_texts,
    )
    from search_engine_spark.sources.documents import load_documents

    docs = load_documents(spark, "/root/testdata/sf0.001").filter(
        "doc_id < 30"
    )
    links = extract_links(linked_html(docs))
    via_literal = robots_filter(
        links,
        spark.createDataFrame(ROBOTS_RULES, "host string, path_prefix string"),
    )
    via_parse = robots_filter(links, parse_robots(robots_fixture_texts(spark)))
    a = sorted(map(tuple, via_literal.collect()))
    b = sorted(map(tuple, via_parse.collect()))
    assert a == b and a  # same survivors, non-empty


def test_cocitation_counts_shared_in_neighbors(spark):
    from search_engine_spark.operators.graph import cocitation

    # sources 10,11,12 all cite both 1 and 2; source 13 cites 1 and 3
    edges = spark.createDataFrame(
        [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 2),
         (13, 1), (13, 3)],
        "src long, dst long",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["n_common"]
        for r in cocitation(edges, min_common=2).collect()
    }
    assert got == {(1, 2): 3}  # (1,3) has n_common=1 → thresholded out


def test_coupling_counts_shared_out_neighbors(spark):
    from search_engine_spark.operators.graph import coupling

    # 1 and 2 both cite {10, 11}; 3 cites only 10
    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10)], "src long, dst long"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["n_common"]
        for r in coupling(edges, min_common=2).collect()
    }
    assert got == {(1, 2): 2}


def test_crawl_delays_wildcard_group_only(spark):
    from search_engine_spark.operators.graph import crawl_delays

    txt = (
        "User-agent: evilbot\n"
        "Crawl-delay: 99\n"
        "\n"
        "User-agent: *\n"
        "Crawl-delay: 2.5\n"
        "Disallow: /x\n"
        "Crawl-delay: 7\n"      # repeated → smallest wins
    )
    robots = spark.createDataFrame(
        [("h.example", txt), ("bare.example", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )
    got = {
        r["host"]: r["delay_s"] for r in crawl_delays(robots).collect()
    }
    assert got == {"h.example": 2.5}  # decoy group ignored; no-delay host absent


def test_resolve_doc_url_rejects_foreign_and_spoofed_hosts(spark):
    """A URL that merely ENDS in /docs/<id> must not mint an internal
    edge: external hosts and host-letter/doc_id mismatches resolve to
    NULL (link-spam guard), and the no-match path must not crash under
    ANSI mode ('' cast to long)."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.graph import resolve_doc_url

    cases = spark.createDataFrame(
        [
            ("https://site-b.example/docs/7", 7),     # 7 % 3 = 1 -> 'b'
            ("https://site-a.example/docs/7", None),  # spoofed host letter
            ("https://evil.example/docs/7", None),    # foreign host
            ("https://other.example/page", None),     # no doc path at all
            ("https://site-a.example/docs/6", 6),     # 6 % 3 = 0 -> 'a'
        ],
        "url string, want long",
    )
    got = cases.select("want", resolve_doc_url(F.col("url")).alias("dst"))
    for r in got.collect():
        assert r["dst"] == r["want"]


def test_extract_links_survives_external_anchor(spark):
    from search_engine_spark.operators.graph import extract_links

    docs = spark.createDataFrame(
        [(1, bytearray(b'<a href="https://other.example/page">x</a>'))],
        "doc_id long, html binary",
    )
    got = extract_links(docs).collect()
    assert len(got) == 1 and got[0]["dst_doc"] is None


def test_trustrank_empty_seed_intersection_returns_zeros(spark):
    """Seeds entirely outside the corpus carry no teleport mass — every
    score is 0, not a DIVIDE_BY_ZERO abort."""
    from search_engine_spark.operators.graph import trustrank

    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(999,)], "doc_id long")
    got = {r["doc_id"]: r["tr"] for r in trustrank(docs, edges, seeds).collect()}
    assert got == {0: 0.0, 1: 0.0, 2: 0.0, 3: 0.0}


def test_parse_robots_window_is_host_keyed(spark):
    """Plan pin (r03-verdict #7): the robots group-segmentation windows
    partition on host (bounded: one tiny file per host) — a refactor
    that widens them to a global window fails here."""
    from search_engine_spark.operators.graph import parse_robots

    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /x")],
        "host string, robots_txt string",
    )
    plan = (
        parse_robots(robots)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "host" in spec, spec
