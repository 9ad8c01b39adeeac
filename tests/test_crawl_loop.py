"""End-to-end crawl loop: frontier → fetch → incremental index, repeated.

Integration of the crawl-side operators (S3 extract_links, S5 new-page
anti-join via crawl_frontier, I1/I2 per-host budget) with the persistent
incremental index (I5-I8 reindex_docs): each round the frontier is
computed from the pages crawled so far, the discovered pages are
"fetched" (looked up in the full fixture — the fixture IS the web here),
and upserted into the store. Invariants per round: the store's logical
postings equal a from-scratch rebuild over exactly the crawled set, and
the crawled set grows monotonically until the reachable component is
exhausted.
"""

from __future__ import annotations

import pytest

from search_engine_spark import catalog
from search_engine_spark.operators.blocks import decode_blocks
from search_engine_spark.operators.graph import (
    crawl_frontier,
    extract_links,
    linked_html,
)
from search_engine_spark.operators.incremental import reindex_docs
from search_engine_spark.sources.documents import load_documents

from tests.conftest import SF_TEST

N_BUCKETS = 4
WEB_SIZE = 12  # the reachable "web": docs 0..11


@pytest.fixture(scope="module")
def web(spark):
    """The full corpus plays the web; crawling discovers it via links."""
    return load_documents(spark, SF_TEST).filter(f"doc_id < {WEB_SIZE}").cache()


def _postings(store):
    return {
        (r["term"], r["doc_id"], r["tf"])
        for r in decode_blocks(store.read_blocks()).collect()
    }


def test_crawl_loop_converges(spark, web, tmp_path):
    # seeds: the 0-3 chain head plus 8 (whose tree link reaches back to 4,
    # giving multi-URL frontiers: the chain advances from 3 and from 8/9)
    crawled_ids = {0, 1, 2, 3, 8}
    crawled = web.filter(f"doc_id in ({','.join(map(str, crawled_ids))})")

    store = catalog.IndexStore(spark, str(tmp_path / "ix"), n_buckets=N_BUCKETS)
    catalog.build_persistent(crawled, store)

    for round_no in range(1, 10):
        frontier = crawl_frontier(
            crawled, extract_links(linked_html(crawled)), per_host=5
        )
        new_ids = sorted(
            int(r["dst_url"].rsplit("/", 1)[1]) for r in frontier.collect()
        )
        # politeness budget respected
        assert frontier.groupBy("host").count().agg({"count": "max"}).first()[0] <= 5
        # the frontier never re-proposes a crawled page (S5 anti-join)
        assert not (set(new_ids) & crawled_ids)
        fetched_ids = [i for i in new_ids if i < WEB_SIZE]  # 404s drop out
        if not fetched_ids:
            break
        fetched = web.filter(f"doc_id in ({','.join(map(str, fetched_ids))})")
        reindex_docs(store, fetched)
        crawled_ids |= set(fetched_ids)
        crawled = web.filter(f"doc_id in ({','.join(map(str, crawled_ids))})")

    # the chain link (v -> v+1) makes every doc reachable from the seeds
    assert crawled_ids == set(range(WEB_SIZE))

    # incremental store == from-scratch rebuild over the final crawled set
    ref = catalog.IndexStore(spark, str(tmp_path / "ref"), n_buckets=N_BUCKETS)
    catalog.build_persistent(crawled, ref)
    assert _postings(store) == _postings(ref)
