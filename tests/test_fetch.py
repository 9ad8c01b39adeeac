"""S1 fetch operator: Spark plumbing real, network injectable."""

from search_engine_spark.sources.documents import load_documents
from search_engine_spark.sources.fetch import fake_fetcher, fetch_pages

from tests.conftest import SF_TEST


def test_fetch_matches_status_derivation(spark):
    """Fetching the synthetic web reproduces the S2 http_code derivation
    for every engine url (same %53 slices)."""
    docs = load_documents(spark, SF_TEST).filter("doc_id < 120")
    fetched = fetch_pages(docs.select("url"))
    derived = docs.selectExpr(
        "url", "http_code AS derived_code", "doc_id"
    )
    joined = fetched.join(derived, "url").collect()
    assert len(joined) == 120
    for r in joined:
        assert r["http_code"] == r["derived_code"], r
        if r["http_code"] == 200:
            body = bytes(r["html"]).decode("utf-8")
            assert f"<title>Doc {r['doc_id']}</title>" in body
            assert r["n_bytes"] == len(bytes(r["html"]))
        else:
            assert r["html"] is None and r["n_bytes"] == 0


def test_fetch_unknown_url_404(spark):
    urls = spark.createDataFrame(
        [("https://elsewhere.example/x",)], "url string"
    )
    row = fetch_pages(urls).collect()[0]
    assert (row["http_code"], row["html"], row["n_bytes"]) == (404, None, 0)


def test_fetch_partitions_by_host(spark):
    """Politeness: all urls of one host land in the same partition."""
    docs = load_documents(spark, SF_TEST).filter("doc_id < 60")
    src = fetch_pages(docs.select("url"))  # plan smoke (already tested)
    from pyspark.sql import functions as F

    host = F.regexp_extract("url", "^https://([^/]+)/", 1)
    parts = (
        docs.select("url")
        .repartition(8, host)
        .select(host.alias("h"), F.spark_partition_id().alias("p"))
        .distinct()
        .groupBy("h")
        .count()
        .collect()
    )
    assert all(r["count"] == 1 for r in parts)


def test_custom_fetcher_injection(spark):
    urls = spark.createDataFrame([("u1",), ("u2",)], "url string")
    out = fetch_pages(
        urls, fetcher=lambda u: (200, f"body-{u}".encode()), partition_by_host=False
    ).collect()
    assert {bytes(r["html"]).decode() for r in out} == {"body-u1", "body-u2"}
