"""S1 HTTP fetch, batch-shaped (reference: the crawler's page download in
dto/indexing/PageAnalyzer — fetch → status → store).

Network IO cannot run in this sandbox and must not run in unit tests, so
the operator is the REAL Spark plumbing — ``mapInPandas`` over url
partitions, Arrow-batched, with per-host serialization — around an
injectable ``fetcher(url) -> (code, body_bytes)``. Two fetchers ship:

- ``fake_fetcher`` (default): deterministic synthesis of the same page
  shape as sources/documents.py::html_col + http_code_col, so the fetched
  corpus is bit-identical to the derived fixture (tested).
- ``urllib_fetcher``: the real-socket path, import-gated exactly like the
  multimodal decode stub — swap it in outside the sandbox.

Politeness (I2) composes structurally: ``fetch_pages(partition_by_host=
True)`` repartitions urls by host, so each host's requests execute
SEQUENTIALLY inside one task while distinct hosts fetch in parallel — the
batch-engine equivalent of the reference's per-request delay, with the
per-host rate cap = 1/request-latency. Pair with
operators/graph.py::crawl_frontier's per-host budget for the full loop.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

Fetcher = Callable[[str], "tuple[int, bytes | None]"]  # None body = error fetch

FETCH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("http_code", T.IntegerType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

_DOC_URL = re.compile(r"^https://(site-[abc])\.example/docs/([0-9]+)$")


def fake_fetcher(url: str) -> tuple[int, bytes | None]:
    """Deterministic fetch of the synthetic web: reproduces
    sources/documents.py::html_col + http_code_col for engine urls
    (but with a placeholder body text — the fixture's real text lives in
    the parquet; tests compare against the http_code/status semantics and
    page shell). Unknown urls 404 with no body (None)."""
    m = _DOC_URL.match(url)
    if not m:
        return 404, None
    doc_id = int(m.group(2))
    d = doc_id % 53
    code = {13: 404, 27: 415, 41: 500, 50: 102}.get(d, 200)
    if code != 200:
        return code, None
    body = (
        f"<html><head><title>Doc {doc_id}</title>"
        f"<script>var x=1;</script></head>"
        f"<body><p>fetched:{doc_id}</p></body></html>"
    ).encode("utf-8")
    return code, body


def urllib_fetcher(url: str) -> tuple[int, bytes | None]:  # pragma: no cover
    """Real-socket fetcher (import-gated; never used in tests/sandbox)."""
    import urllib.error
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=10) as resp:
            return int(resp.status), resp.read()
    except urllib.error.HTTPError as e:
        return int(e.code), None
    except Exception:
        return 500, None


def fetch_pages(
    urls: DataFrame,
    fetcher: Fetcher = fake_fetcher,
    partition_by_host: bool = True,
    n_partitions: int | None = None,
) -> DataFrame:
    """(url) → (url, http_code, html, n_bytes) via Arrow-batched
    mapInPandas. With ``partition_by_host`` each host's urls land in one
    task (hash on the host substring), serializing per-host requests —
    the politeness invariant — while hosts fan out across the cluster."""
    src = urls.select("url")
    if partition_by_host:
        # no trailing '/' in the pattern and scheme-agnostic: a pathless
        # URL ('https://a.example') or an http:// sibling must hash to
        # the SAME partition as the rest of its host, or two tasks hit
        # one host concurrently and the politeness invariant is gone
        host = F.regexp_extract("url", "^[a-z]+://([^/]+)", 1)
        n = n_partitions or src.sparkSession.sparkContext.defaultParallelism
        src = src.repartition(n, host)

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fetched = [fetcher(u) for u in pdf["url"]]
            yield pd.DataFrame(
                {
                    "url": pdf["url"].to_numpy(),
                    "http_code": [c for c, _ in fetched],
                    # the fetcher contract distinguishes the shapes: an
                    # error fetch returns body=None (stored NULL), while
                    # a 200 with a legitimately EMPTY page returns b''
                    # and is preserved — truthiness would alias the two
                    "html": [b for _, b in fetched],
                    "n_bytes": [0 if b is None else len(b) for _, b in fetched],
                }
            )

    return src.mapInPandas(_fetch, FETCH_SCHEMA)
