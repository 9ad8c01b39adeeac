"""Link graph operators: href extraction (SURVEY §2 S3) and PageRank.

The reference's crawler extracts anchors to drive the crawl frontier
(reference: dto/indexing/PageAnalyzer — link discovery feeds the recursive
fan-out; SURVEY §2 S3 scoped it out of round 1 as "batch build, no
crawl"). Here the *extraction* is implemented as a data-parallel operator
— the batch-engine use of links is not crawling but **link analysis**: the
classic web-scale authority signal (Page et al., "The PageRank Citation
Ranking", 1999), which a Common-Crawl training pipeline uses as a
document-quality prior.

Scale notes:

- ``extract_links`` is a pure codegen map (decode + regexp_extract_all +
  posexplode) — no shuffle, no UDF; at 100 TB it is scan-bound.
- ``pagerank`` is synchronous power iteration with a FIXED iteration
  count, expressed as a chained DataFrame plan (edges ⋈ ranks → groupBy dst
  → left join the node spine). Each iteration is one shuffle on dst plus
  one doc-keyed join; the edge table is re-read per iteration (at real
  scale: persist the resolved edge list once, bucket it by src, and let
  AQE handle the rank side — ranks are 16 bytes/node). Dangling-node mass
  is NOT redistributed (the web-graph convention of Common Crawl's own
  rank releases is configurable; we pin the simpler semantics and
  document it) — scores still converge, they just sum to < 1.

Fixture derivation (FIXTURES pattern, mirrored in
functions/oracle_pipeline.py): ``linked_html`` appends two EMPTY-TEXT
anchors per page — to ``doc_id + 1`` and ``doc_id // 2`` — so the
extraction invariant ``extract_text(html) == text`` still holds (anchors
contribute no text) while giving the corpus a deterministic, connected link graph (each node
v receives from v-1 via the chain and from 2v, 2v+1 via the tree
back-edges, so rank flows toward low doc_ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RE2 ∩ java.util.regex subset (oracle runs the same pattern in DuckDB).
HREF_RE = 'href="([^"]+)"'
# host AND path must both match: every corpus doc lives on exactly one
# host (site-<chr(97 + id%3)>.example), so a URL that merely ENDS in
# /docs/<id> from some other host must NOT resolve to an internal doc —
# otherwise an off-site page could mint authority edges into
# pagerank/trustrank/cocitation (the classic link-spam vector).
DOC_URL_RE = "^https://site-([a-c])\\.example/docs/([0-9]+)$"


def resolve_doc_url(url_col):
    """doc_id of an internal doc URL, NULL for anything else (external
    host, mismatched host letter, or non-doc path). nullif before the
    cast: regexp_extract returns '' on no-match and ''::long is a hard
    error under ANSI mode."""
    sid = F.nullif(F.regexp_extract(url_col, DOC_URL_RE, 2), F.lit("")).cast(
        "long"
    )
    letter = F.regexp_extract(url_col, DOC_URL_RE, 1)
    return F.when(F.char(sid % 3 + 97) == letter, sid)

PR_DAMPING = 0.85
PR_ITERS = 3


def _url_of(target):
    """URL of a doc_id column expression (mirrors sources/documents.py)."""
    return F.concat(
        F.lit("https://site-"),
        F.char(target % 3 + 97),
        F.lit(".example/docs/"),
        target.cast("string"),
    )


def linked_html(docs: DataFrame) -> DataFrame:
    """Append two empty-anchor links to each page's html (fixture
    derivation): doc_id+1 (chain; dangles at the corpus edge) and
    doc_id//2 (binary-tree back-edge; self-link at doc 0, which
    extract_links drops)."""
    d = F.col("doc_id")
    anchors = F.concat(
        F.lit('<a href="'),
        _url_of(d + 1),
        F.lit('"></a><a href="'),
        _url_of(F.floor(d / 2).cast("long")),
        F.lit('"></a>'),
    )
    return docs.withColumn(
        "html",
        F.encode(
            F.concat(F.decode(F.col("html"), "utf-8"), anchors), "utf-8"
        ),
    )


def extract_links(docs: DataFrame, drop_self: bool = True) -> DataFrame:
    """S3 link extraction → (src_doc, dst_url, dst_doc).

    Pure codegen: decode the html bytes, pull every href value
    (regexp_extract_all), explode, resolve same-engine doc URLs back to a
    doc_id via the frozen '/docs/<id>' path pattern (dst_doc is null for
    external URLs). Self-links are dropped by default.
    """
    out = (
        docs.select(
            F.col("doc_id").alias("src_doc"),
            F.explode(
                F.regexp_extract_all(
                    F.decode(F.col("html"), "utf-8"), F.lit(HREF_RE), F.lit(1)
                )
            ).alias("dst_url"),
        )
        .withColumn("dst_doc", resolve_doc_url(F.col("dst_url")))
    )
    if drop_self:
        out = out.filter(
            F.col("dst_doc").isNull() | (F.col("dst_doc") != F.col("src_doc"))
        )
    return out


FRONTIER_MOD = 4  # every 4th fixture doc advertises one uncrawled URL
FRONTIER_SPACE = 2000  # uncrawled doc-id space starts at 1000


def frontier_html(docs: DataFrame) -> DataFrame:
    """Fixture derivation for the frontier query: like linked_html but
    every FRONTIER_MOD-th doc also advertises one URL OUTSIDE the crawled
    id space (1000 + (doc_id*31 mod 1000)) — deterministic 'new page'
    discoveries for the frontier anti-join to find."""
    d = F.col("doc_id")
    extra = F.when(
        d % FRONTIER_MOD == 0,
        F.concat(
            F.lit('<a href="'),
            _url_of((d * 31) % (FRONTIER_SPACE - 1000) + 1000),
            F.lit('"></a>'),
        ),
    ).otherwise(F.lit(""))
    base = linked_html(docs)
    return base.withColumn(
        "html",
        F.encode(F.concat(F.decode(F.col("html"), "utf-8"), extra), "utf-8"),
    )


def crawl_frontier(
    docs: DataFrame, links: DataFrame, per_host: int = 10
) -> DataFrame:
    """I1/I2 re-expressed data-parallel: the next crawl batch.

    The reference crawls recursively with in-process politeness waits
    (ForkJoin fan-out + per-request delays; SURVEY §2 I1-I2). A batch
    engine inverts that: each round, harvest all outlinks, anti-join the
    already-crawled set (the same new-page dedup as S5), score each unseen
    URL by in-link count, and emit at most ``per_host`` URLs per host —
    the politeness budget becomes a per-host top-k instead of a sleep.

    → (host, dst_url, n_inlinks, rank): rank 1..per_host within host,
    ordered (n_inlinks desc, dst_url asc). The per-host window shows
    WindowGroupLimit (map-side partial top-k) above a host-keyed
    exchange — hosts are numerous at web scale, so no skew; the anti-join
    is a broadcast of nothing-but-doc_ids when the crawled set fits, else
    sort-merge on dst_doc.
    """
    from pyspark.sql import Window

    seen = docs.select(F.col("doc_id").alias("dst_doc"))
    unseen = links.filter(F.col("dst_doc").isNotNull()).join(
        seen, "dst_doc", "left_anti"
    )
    scored = unseen.groupBy("dst_url").agg(
        F.count(F.lit(1)).alias("n_inlinks")
    )
    host = F.regexp_extract(F.col("dst_url"), "^https://([^/]+)/", 1)
    w = Window.partitionBy("host").orderBy(
        F.col("n_inlinks").desc(), F.col("dst_url").asc()
    )
    return (
        scored.withColumn("host", host)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_host)
        .select("host", "dst_url", "n_inlinks", "rank")
    )


def resolved_edges(docs: DataFrame, links: DataFrame) -> DataFrame:
    """(src, dst) restricted to dst docs that exist (semi-join against the
    node spine — frontier edges to not-yet-crawled pages drop out)."""
    nodes = docs.select(F.col("doc_id").alias("dst"))
    return (
        links.filter(F.col("dst_doc").isNotNull())
        .select(F.col("src_doc").alias("src"), F.col("dst_doc").alias("dst"))
        .join(nodes, "dst", "left_semi")
    )


def pagerank(
    docs: DataFrame,
    edges: DataFrame,
    n_iter: int = PR_ITERS,
    damping: float = PR_DAMPING,
) -> DataFrame:
    """Fixed-iteration synchronous PageRank → (doc_id, pr) with pr scaled
    by N (so a page of average authority scores ~1.0) and rounded to 4 dp.

    rank_{i+1}(v) = (1-d)/N + d · Σ_{u→v} rank_i(u)/outdeg(u)

    The node count enters the plan as a broadcast scalar (one-row agg
    cross-joined in), keeping the whole computation declarative — no
    driver-side collect of data rows.
    """
    nodes = docs.select("doc_id")
    n = F.broadcast(nodes.agg(F.count(F.lit(1)).cast("double").alias("n")))
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("outdeg")
    )
    e = edges.join(deg, "src")
    ranks = nodes.crossJoin(n).select(
        "doc_id", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(n_iter):
        contrib = (
            e.join(ranks.withColumnRenamed("doc_id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("s"))
        )
        ranks = (
            nodes.crossJoin(n)
            .join(contrib.withColumnRenamed("dst", "doc_id"), "doc_id", "left")
            .select(
                "doc_id",
                (
                    (1.0 - damping) / F.col("n")
                    + damping * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.crossJoin(n).select(
        "doc_id", F.round(F.col("rank") * F.col("n"), 4).alias("pr")
    )


def blend_authority(
    hits: DataFrame,
    pr: DataFrame,
    weight: float = 0.5,
    limit: int = 20,
    offset: int = 0,
) -> DataFrame:
    """Web-search ranking: blend textual relevance with link authority —
    score' = round(bm25 · ((1-w) + w·pr), 4), pr being the N-scaled
    PageRank (avg ≈ 1.0, so ``weight`` interpolates between pure BM25 and
    authority-weighted ranking).

    ``hits`` is the scorer's candidate set (doc_id, score); the pr join is
    doc-keyed on that bounded set (AQE broadcast when top-K'). Both inputs
    arrive 4 dp-rounded, so the blend is bit-reproducible across engines.
    """
    blended = hits.join(pr, "doc_id").select(
        "doc_id",
        F.round(
            F.col("score") * ((1.0 - weight) + weight * F.col("pr")), 4
        ).alias("score"),
    )
    return (
        blended.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .offset(offset)
        .limit(limit)
    )


ROBOTS_RULES = [("site-" + c + ".example", "/docs/10") for c in "abc"]
# fixture disallow rules (FIXTURES pattern): every host disallows the
# /docs/10* subtree — mirrored literally in the oracle SQL.


def robots_filter(links: DataFrame, rules: DataFrame) -> DataFrame:
    """Drop links whose target path is disallowed by a robots rule.

    ``rules``: (host, path_prefix) Disallow entries. The join is a
    broadcast LEFT ANTI on host + prefix match — robots tables are
    dimension-shaped (one small row set per host, ~10^7 hosts at web
    scale, a few hundred MB: broadcastable; if a crawl ever exceeds that,
    drop the hint and let AQE shuffle on host). Keeps every column of
    ``links``; works on any frame with a ``dst_url`` column.
    """
    path = F.regexp_replace(F.col("dst_url"), "^https://[^/]+", "")
    host = F.regexp_extract(F.col("dst_url"), "^https://([^/]+)/", 1)
    l = links.withColumn("_path", path).withColumn("_host", host)
    r = rules.select(
        F.col("host").alias("_rhost"), F.col("path_prefix").alias("_rpfx")
    )
    out = l.join(
        F.broadcast(r),
        (l["_host"] == r["_rhost"]) & l["_path"].startswith(r["_rpfx"]),
        "left_anti",
    )
    return out.drop("_path", "_host")


def trustrank(
    docs: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = PR_ITERS,
    damping: float = PR_DAMPING,
) -> DataFrame:
    """Personalized PageRank with the teleport vector concentrated on a
    trusted seed set (TrustRank, Gyöngyi et al. 2004 — the standard
    spam-demotion prior: authority flows outward from hand-vetted pages
    instead of raining uniformly).

    rank_{i+1}(v) = (1-d)·t_v + d·Σ_{u→v} rank_i(u)/outdeg(u),
    t_v = 1/|S| for seeds, 0 elsewhere; rank_0 = t. Same plan shape as
    pagerank (one shuffle per iteration + spine join); the seed marker
    joins once up front. Output (doc_id, tr) scaled by N, 4 dp.
    """
    nodes = docs.select("doc_id")
    n = F.broadcast(nodes.agg(F.count(F.lit(1)).cast("double").alias("n")))
    # seeds outside the node set carry no teleport mass — drop them BEFORE
    # counting |S|, or the tv vector sums to |S∩nodes|/|S| < 1 and every
    # score silently deflates vs the TrustRank definition (and the oracle,
    # which derives seeds from nodes).
    s = seeds.select("doc_id").distinct().join(nodes, "doc_id", "left_semi")
    s_cnt = F.broadcast(s.agg(F.count(F.lit(1)).cast("double").alias("s")))
    marked = (
        nodes.join(s.withColumn("_seed", F.lit(1.0)), "doc_id", "left")
        .crossJoin(s_cnt)
        .select(
            "doc_id",
            # |S∩nodes| = 0 (empty or fully-out-of-corpus seed set) means
            # NO teleport mass anywhere — emit zeros rather than dividing
            # by zero (hard error under ANSI; NULL-poisoned ranks without)
            F.when(
                F.col("s") > 0.0,
                F.coalesce(F.col("_seed"), F.lit(0.0)) / F.col("s"),
            )
            .otherwise(F.lit(0.0))
            .alias("tv"),
        )
    )
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("outdeg")
    )
    e = edges.join(deg, "src")
    ranks = marked.select("doc_id", F.col("tv").alias("rank"))
    for _ in range(n_iter):
        contrib = (
            e.join(ranks.withColumnRenamed("doc_id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("c"))
        )
        ranks = (
            marked.join(
                contrib.withColumnRenamed("dst", "doc_id"), "doc_id", "left"
            )
            .select(
                "doc_id",
                (
                    (1.0 - damping) * F.col("tv")
                    + damping * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.crossJoin(n).select(
        "doc_id", F.round(F.col("rank") * F.col("n"), 4).alias("tr")
    )


def domain_authority(pr: DataFrame) -> DataFrame:
    """(site_key, n_pages, authority, top_pr) — host-level authority: the
    domain-granularity aggregate web pipelines threshold on (Common
    Crawl's own host-level rank releases are exactly this rollup). One
    map-side-combining hash agg over the page-rank table; at 10^12 pages
    the output is ~10^7 hosts. Input: pagerank()/trustrank() output (the
    4 dp-rounded N-scaled pr), site derived from doc_id."""
    from ..sources.documents import site_key_col

    return (
        pr.withColumn("site_key", site_key_col())
        .groupBy("site_key")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.round(F.sum("pr"), 4).alias("authority"),
            F.max("pr").alias("top_pr"),
        )
    )


HITS_ITERS = 2


def hits(
    docs: DataFrame, edges: DataFrame, n_iter: int = HITS_ITERS
) -> DataFrame:
    """(doc_id, authority, hub) — Kleinberg's HITS (Hubs & Authorities,
    JACM 1999) by fixed-iteration power method, the companion authority
    signal to PageRank: authority(v) = Σ_{u→v} hub(u), hub(u) = Σ_{u→v}
    authority(v), each vector sum-normalized per half-step. Scores are
    N-scaled before the 4 dp rounding (like pagerank: mean-1.0 scale
    keeps small-corpus values above the rounding floor).

    Same execution shape as pagerank: each half-step is one shuffle on
    the receiving key plus a left join onto the node spine; the
    normalizer is a 1-row agg crossJoined back (broadcast — NEVER a
    global window, and no driver-side action inside the loop). Edges are
    re-read per step; at real scale persist the resolved edge list once,
    bucketed by src (hub side) — the rank frames are 16 bytes/node."""
    nodes = docs.select("doc_id")
    e = edges.select("src", "dst")
    h = nodes.select("doc_id", F.lit(1.0).alias("h"))
    a = nodes.select("doc_id", F.lit(1.0).alias("a"))

    def _half(rank, rank_col, join_key, group_key, out_col):
        contrib = (
            e.join(
                rank.withColumnRenamed("doc_id", join_key), join_key
            )
            .groupBy(group_key)
            .agg(F.sum(rank_col).alias("s"))
            .withColumnRenamed(group_key, "doc_id")
        )
        # cache: `raw` is referenced twice (normalizer agg + normalize
        # select), so without it each half-step EMBEDS the previous plan
        # twice and the uncached edge-join subtree reappears ~2^(2·n_iter)
        # times — exponential analysis+execution cost in n_iter. The
        # cached frame is 16 bytes/node.
        raw = (
            nodes.join(contrib, "doc_id", "left")
            .select("doc_id", F.coalesce("s", F.lit(0.0)).alias(out_col))
            .cache()
        )
        tot = raw.agg(F.sum(out_col).alias("t"))
        # t = 0 when no edge delivered any mass this half-step (e.g. every
        # link is external) — emit zeros rather than NULL-poisoning both
        # vectors (x/0 is NULL in Spark SQL, and NULL propagates)
        return raw.crossJoin(F.broadcast(tot)).select(
            "doc_id",
            F.when(F.col("t") > 0.0, F.col(out_col) / F.col("t"))
            .otherwise(F.lit(0.0))
            .alias(out_col),
        )

    for _ in range(n_iter):
        a = _half(h, "h", "src", "dst", "a")
        h = _half(a, "a", "dst", "src", "h")

    n = F.lit(float(docs.count()))
    return a.join(h, "doc_id").select(
        "doc_id",
        F.round(F.col("a") * n, 4).alias("authority"),
        F.round(F.col("h") * n, 4).alias("hub"),
    )


def robots_fixture_texts(spark) -> DataFrame:
    """(host, robots_txt) fixture — realistic multi-group robots.txt per
    ROBOTS_RULES host: a decoy non-wildcard group (must be ignored), a
    comment, the wildcard group carrying the host's Disallow prefixes, an
    EMPTY Disallow (allow-all sentinel — must be dropped) and a
    Crawl-delay line (not a rule). parse_robots must recover exactly
    ROBOTS_RULES from these."""
    by_host: dict[str, list[str]] = {}
    for h, p in ROBOTS_RULES:
        by_host.setdefault(h, []).append(p)
    rows = []
    for h, prefixes in sorted(by_host.items()):
        txt = (
            "# robots fixture\n"
            "User-agent: evilbot\n"
            "Disallow: /\n"
            "\n"
            "User-agent: *\n"
            + "".join(f"Disallow: {p}\n" for p in prefixes)
            + "Disallow:\n"
            "Crawl-delay: 1\n"
        )
        rows.append((h, txt))
    rows.append(("no-rules.example", "User-agent: evilbot\nDisallow: /\n"))
    return spark.createDataFrame(rows, "host string, robots_txt string")


def _robots_star_groups(robots: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Shared robots.txt group tagging for parse_robots / crawl_delays →
    (tagged lines, star groups). Comments stripped; groups delimited by
    User-agent runs — a directive attaches to the most recent preceding
    agent run, consecutive agent lines share one group; ``star`` is the
    (host, grp) set of wildcard (``User-agent: *``) groups.

    Execution: posexplode lines, two host-keyed window passes (lag + a
    running sum assigning group ids) — robots files are tiny, so the
    per-host window partitions are bounded. At web scale this runs over
    ~10^7 small files: one shuffle on host."""
    from pyspark.sql import Window

    lines = robots.select(
        "host",
        F.posexplode(F.split(F.col("robots_txt"), "\n")).alias("ln", "raw"),
    )
    line = F.trim(F.regexp_replace(F.col("raw"), "#.*$", ""))
    norm = lines.withColumn("line", line).withColumn(
        "is_ua", F.lower(line).startswith("user-agent:")
    )
    w = Window.partitionBy("host").orderBy("ln")
    tagged = (
        norm.withColumn("prev_ua", F.lag("is_ua", 1, False).over(w))
        .withColumn(
            "grp",
            F.sum(
                F.when(F.col("is_ua") & ~F.col("prev_ua"), 1).otherwise(0)
            ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    star = (
        tagged.filter(
            F.col("is_ua")
            & (
                F.trim(F.regexp_extract("line", r"(?i)^user-agent:\s*(.*)$", 1))
                == "*"
            )
        )
        .select("host", "grp")
        .distinct()
    )
    return tagged, star


def parse_robots(robots: DataFrame) -> DataFrame:
    """(host, robots_txt) → (host, path_prefix): the Disallow rules of
    the wildcard (``User-agent: *``) group(s) — the parse step in front
    of robots_filter (REP per RFC 9309, pinned subset: see
    _robots_star_groups; empty Disallow = allow-all sentinel, dropped;
    non-rule directives ignored)."""
    tagged, star = _robots_star_groups(robots)
    return (
        tagged.filter(F.lower("line").startswith("disallow:"))
        .withColumn(
            "path_prefix",
            F.trim(F.regexp_extract("line", r"(?i)^disallow:\s*(.*)$", 1)),
        )
        .join(star, ["host", "grp"])
        .filter(F.col("path_prefix") != "")
        .select("host", "path_prefix")
    )


def cocitation(edges: DataFrame, min_common: int = 2) -> DataFrame:
    """(doc_a, doc_b, n_common) — co-citation similarity (Small 1973):
    pages cited together by the same sources are related; n_common =
    number of shared IN-neighbors, doc_a < doc_b, thresholded at
    min_common. The link-structure "related pages" signal (Dean &
    Henzinger 1999 build exactly this over the web graph).

    Plan: one self-join of the edge list on src (pairs every two targets
    a source cites — bounded by out-degree², and web out-degrees are
    bounded by page size) + one (a,b) count aggregate. Skew guard at
    scale: cap per-source fan-out upstream (outdegree cap) — the fixture
    graph's out-degree is 2, so the join is linear here."""
    a = edges.select(F.col("src"), F.col("dst").alias("doc_a"))
    b = edges.select(F.col("src"), F.col("dst").alias("doc_b"))
    pairs = a.join(b, "src").filter(F.col("doc_a") < F.col("doc_b"))
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def coupling(edges: DataFrame, min_common: int = 1) -> DataFrame:
    """(doc_a, doc_b, n_common) — bibliographic coupling (Kessler 1963),
    the dual of cocitation: pages CITING the same targets are related;
    n_common = number of shared OUT-neighbors, doc_a < doc_b. Same
    execution shape as cocitation with the join key flipped to dst —
    in-degree bounds the per-key fan-out, so the skew guard at web scale
    is an in-degree cap on hub targets (the dual of the out-degree cap)."""
    a = edges.select(F.col("dst"), F.col("src").alias("doc_a"))
    b = edges.select(F.col("dst"), F.col("src").alias("doc_b"))
    pairs = a.join(b, "dst").filter(F.col("doc_a") < F.col("doc_b"))
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def crawl_delays(robots: DataFrame) -> DataFrame:
    """(host, delay_s) — Crawl-delay of the wildcard agent group(s),
    the politeness knob next to parse_robots' Disallow rules (REP
    extension honored by most crawlers; feeds crawl_frontier's per-host
    budget as budget ~ window/delay). Group tagging shared with
    parse_robots (_robots_star_groups); smallest declared delay wins
    when repeated."""
    tagged, star = _robots_star_groups(robots)
    return (
        tagged.filter(F.lower("line").startswith("crawl-delay:"))
        .withColumn(
            "delay_s",
            F.trim(
                F.regexp_extract("line", r"(?i)^crawl-delay:\s*(.*)$", 1)
            ).cast("double"),
        )
        .filter(F.col("delay_s").isNotNull())
        .join(star, ["host", "grp"])
        .groupBy("host")
        .agg(F.min("delay_s").alias("delay_s"))
    )


# Redirect fixture (FIXTURES pattern, mirrored in oracle_pipeline):
# every doc_id ≡ 1 (mod REDIR_MOD) is a 301 source; its target steps
# strictly DOWNWARD (so the functional graph is acyclic by
# construction) and lands on another redirect often enough to produce
# multi-hop chains (the %3 branch re-enters the ≡1 class: e.g.
# 53→49→45→41→37→33→27, six hops).
REDIR_MOD = 4
REDIR_ROUNDS_MAX = 20  # pointer doubling: resolves chains ≤ 2^20 hops


def redirect_edges(docs: DataFrame) -> DataFrame:
    """(src, tgt) — the synthetic one-hop redirect map."""
    s = F.col("doc_id")
    tgt = F.when(
        s % 3 != 0, F.greatest(s - 4, F.lit(0).cast("long"))
    ).otherwise(F.greatest(s - 1 - (s % 7), F.lit(0).cast("long")))
    return docs.filter((s % REDIR_MOD == 1) & (s > 0)).select(
        s.alias("src"), tgt.cast("long").alias("tgt")
    )


def redirect_tgt_sql(d: str = "doc_id") -> str:
    """DuckDB fragment of the fixture successor map — kept HERE next to
    the Spark expression it mirrors so the two copies sit in one diff
    hunk (the oracle imports this; the unit test keeps an independent
    hand-written walk on purpose, as its reference)."""
    return (
        f"(CASE WHEN {d} % 3 <> 0 THEN greatest({d} - 4, 0)"
        f" ELSE greatest({d} - 1 - ({d} % 7), 0) END)"
    )


def redirect_resolve(docs: DataFrame) -> DataFrame:
    """(src_doc, final_doc, hops) — resolve every redirect chain to its
    terminal document. The web-crawl canonicalization step: 3xx chains
    must collapse to their final landing page before indexing and link
    analysis, else the link graph credits intermediate hops and the
    index stores duplicates under pre-redirect URLs (Common Crawl ships
    this as its redirect-resolution pass over the WARC request logs).

    Algorithm: pointer doubling (path halving) over the functional
    successor map — each round composes the jump table with itself
    (jump[src] → jump[jump[src]], hop counts add), so a chain of length
    L resolves in ⌈log2 L⌉ rounds. Each round is ONE equi-join of the
    jump table against itself on the target key plus a bounded driver
    count for early exit — at web scale that is log-many hash joins on
    a table with one row per redirect, never a row-at-a-time walk (the
    recursive-CTE oracle mirror does the naive walk; the result is
    identical because the fixture graph is acyclic).

    Each round's result is localCheckpoint-ed (the bpe.py merge-loop
    pattern): the self-join embeds the prior round's plan TWICE and the
    per-round early-exit action would otherwise re-execute the whole
    uncached lineage — 2^rounds embedded scans by round r, the exact
    hazard the HITS iteration documents. Raises if the chains have not
    converged after REDIR_ROUNDS_MAX doublings (> 2^20 hops): a
    silently partial resolution would surface only as an opaque oracle
    hash mismatch, or worse, index an intermediate hop.
    """
    edges = redirect_edges(docs)
    jump = edges.select(
        "src",
        F.col("tgt").alias("dst"),
        F.lit(1).cast("long").alias("hops"),
    )
    # redirect source set, reused every round to test for terminality
    srcs = edges.select(F.col("src").alias("dst")).distinct()
    for _ in range(REDIR_ROUNDS_MAX):
        if jump.join(srcs, "dst", "left_semi").isEmpty():
            break
        nxt = jump.select(
            F.col("src").alias("j_src"),
            F.col("dst").alias("j_dst"),
            F.col("hops").alias("j_hops"),
        )
        jump = (
            jump.join(nxt, jump["dst"] == nxt["j_src"], "left")
            .select(
                "src",
                F.coalesce("j_dst", "dst").alias("dst"),
                (
                    F.col("hops") + F.coalesce("j_hops", F.lit(0))
                ).alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
    else:
        if not jump.join(srcs, "dst", "left_semi").isEmpty():
            raise RuntimeError(
                "redirect_resolve: chains unresolved after "
                f"{REDIR_ROUNDS_MAX} doubling rounds (> 2^"
                f"{REDIR_ROUNDS_MAX} hops — cycle or fixture change?)"
            )
    return jump.select(
        F.col("src").alias("src_doc"),
        F.col("dst").alias("final_doc"),
        F.col("hops"),
    )


# Robots-meta fixture: selected pages carry a <meta name="robots"> tag
# in their head (inserted AFTER <head> so the empty-text extraction
# invariant holds — meta contributes no visible text). Membership is
# doc_id arithmetic, the FIXTURES pattern (http_code / geo / redirects).
META_ROBOTS_MOD = 17
META_NOINDEX_NOFOLLOW = 5
META_NOINDEX = 9
META_NOFOLLOW = 12


def _robots_tagged_html_str():
    """Decoded html STRING with the fixture tag spliced in — shared so
    meta_robots parses the string directly without an encode→decode
    roundtrip per page (r05 review), while robots_meta_html encodes it
    once for callers that need the binary html column."""
    d = F.col("doc_id")
    content = (
        F.when(d % META_ROBOTS_MOD == META_NOINDEX_NOFOLLOW,
               F.lit("noindex,nofollow"))
        .when(d % META_ROBOTS_MOD == META_NOINDEX, F.lit("noindex"))
        .when(d % META_ROBOTS_MOD == META_NOFOLLOW, F.lit("nofollow"))
    )
    tag = F.when(
        content.isNotNull(),
        F.concat(
            F.lit('<meta name="robots" content="'), content, F.lit('">')
        ),
    ).otherwise(F.lit(""))
    html = F.decode(F.col("html"), "utf-8")
    return F.concat(
        F.lit("<html><head>"),
        tag,
        F.regexp_replace(html, "^<html><head>", ""),
    )


def robots_meta_html(docs: DataFrame) -> DataFrame:
    """documents with the fixture <meta name="robots"> tag spliced into
    the head of the selected pages."""
    return docs.withColumn(
        "html", F.encode(_robots_tagged_html_str(), "utf-8")
    )


def meta_robots(docs: DataFrame) -> DataFrame:
    """(doc_id, noindex, nofollow) — parse the robots META directive out
    of each page's html: the crawl-compliance gate every indexer must
    honor (a `noindex` page is fetched and its links may still be
    followed, but it must NOT enter the index; `nofollow` cuts its
    outlinks from the frontier and the link graph). Complements the
    host-level robots.txt operators (parse_robots / crawl_delays) with
    the page-level directive.

    The DIRECTIVE is genuinely parsed from the html (codegen
    lower+regexp — no UDF, no shuffle; at 100 TB this rides the same
    scan as extraction); the oracle mirror re-derives the expected
    directive from the fixture arithmetic, pinning the parse."""
    html = F.lower(_robots_tagged_html_str())
    # anchored at the exact insertion point so body TEXT that happens to
    # contain a meta-tag string (adversarial corpora do) cannot spoof
    # the directive — only the head-injected tag parses
    content = F.regexp_extract(
        html, '^<html><head><meta name="robots" content="([^"]*)"', 1
    )
    toks = F.split(content, ",")
    return docs.select(
        "doc_id",
        F.array_contains(toks, "noindex").alias("noindex"),
        F.array_contains(toks, "nofollow").alias("nofollow"),
    )


# Sitemap fixture: each site publishes a sitemap listing its pages with
# a deterministic lastmod date; the operator builds the XML and parses
# it back (roundtrip — the oracle derives the expected relation from
# the doc arithmetic directly, so a lossy parse cannot hash-match).
SITEMAP_EPOCH = "2025-01-01"
SITEMAP_DAY_MOD = 365


def _lastmod_col(d):
    return F.date_add(
        F.lit(SITEMAP_EPOCH).cast("date"), (d % SITEMAP_DAY_MOD).cast("int")
    ).cast("string")


def sitemap_xml(docs: DataFrame) -> DataFrame:
    """(site, xml) — one sitemap-protocol document per site, url entries
    in doc_id order. One groupBy(site); per-site entry lists are
    array-built JVM-side (collect_list of structs → sort → join), never
    a driver collect. Reuses the site_key/url columns load_documents
    already attaches (r05 review: no third copy of the url layout)."""
    d = F.col("doc_id")
    entry = F.concat(
        F.lit("<url><loc>"),
        F.col("url"),
        F.lit("</loc><lastmod>"),
        _lastmod_col(d),
        F.lit("</lastmod></url>"),
    )
    site = F.concat(F.col("site_key"), F.lit(".example"))
    per_site = (
        docs.select(site.alias("site"), F.struct(d.alias("doc_id"), entry.alias("e")).alias("z"))
        .groupBy("site")
        .agg(F.array_sort(F.collect_list("z")).alias("zs"))
    )
    xml = F.concat(
        F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
        F.array_join(F.transform("zs", lambda z: z.getField("e")), ""),
        F.lit("</urlset>"),
    )
    return per_site.select("site", xml.alias("xml"))


def sitemap_extract(docs: DataFrame) -> DataFrame:
    """(site, url, lastmod) — parse the per-site sitemap XML back into
    the url relation: the crawl-seed source that complements anchor-
    based discovery (extract_links) — production frontiers merge both.
    The parse is two codegen regex stages (entry split → field extract),
    exploding one row per <url> entry; no UDF, no XML library."""
    sm = sitemap_xml(docs)
    entries = F.regexp_extract_all(
        F.col("xml"), F.lit("(<url>.*?</url>)"), 1
    )
    one = sm.select("site", F.explode(entries).alias("e"))
    return one.select(
        "site",
        F.regexp_extract("e", "<loc>([^<]*)</loc>", 1).alias("url"),
        F.regexp_extract("e", "<lastmod>([^<]*)</lastmod>", 1).alias(
            "lastmod"
        ),
    )
