"""Unit tests for sources/warc.py — WARC serialize/parse round-trip on
crafted inputs (oracle parity at fixture scale: warc_roundtrip)."""

from pyspark.sql import functions as F

from search_engine_spark.sources.warc import (
    parse_warc,
    to_warc_files,
    warc_record_col,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, u, 1704067200 + 60 * i, h.encode()) for i, u, h in rows],
        "doc_id long, url string, ep long, html binary",
    ).withColumn("warc_ts", F.timestamp_seconds(F.col("ep")))


def test_roundtrip_preserves_fields(spark):
    docs = _docs(
        spark,
        [
            (1, "https://a.example/x", "<html>one</html>"),
            (2, "https://b.example/y", "<html>two</html>"),
            (130, "https://c.example/z", "<html>three</html>"),
        ],
    )
    got = {
        r["url"]: r
        for r in parse_warc(to_warc_files(docs)).collect()
    }
    assert set(got) == {
        "https://a.example/x",
        "https://b.example/y",
        "https://c.example/z",
    }
    r = got["https://a.example/x"]
    assert r["html"] == "<html>one</html>"
    assert r["n_bytes"] == len("<html>one</html>")
    assert int(r["warc_ts"].timestamp()) == 1704067200 + 60


def test_payload_with_interior_crlf_pairs(spark):
    body = "line1\r\n\r\nline2\r\n\r\nline3"
    docs = _docs(spark, [(7, "https://a.example/crlf", body)])
    (r,) = parse_warc(to_warc_files(docs)).collect()
    assert r["html"] == body
    assert r["n_bytes"] == len(body.encode())


def test_files_group_by_doc_id_and_are_deterministic(spark):
    docs = _docs(
        spark,
        [(i, f"https://a.example/{i}", f"<p>{chr(97 + i)}</p>") for i in range(5)]
        + [(64, "https://a.example/far", "<p>far</p>")],
    )
    files = {r["file_id"]: r["blob"] for r in to_warc_files(docs).collect()}
    assert set(files) == {0, 1}
    # doc order inside a blob is doc_id-ascending regardless of partitioning
    blob0 = files[0]
    offsets = [blob0.index(f"<urn:uuid:doc-{i}>") for i in range(5)]
    assert offsets == sorted(offsets)
    again = {r["file_id"]: r["blob"] for r in to_warc_files(docs).collect()}
    assert again == files


def test_record_col_is_single_header_block(spark):
    docs = _docs(spark, [(3, "https://a.example/h", "<p>x</p>")])
    (rec,) = docs.select(warc_record_col().alias("r")).collect()
    head, _, rest = rec["r"].partition("\r\n\r\n")
    assert head.startswith("WARC/1.0\r\n")
    assert "WARC-Target-URI: https://a.example/h" in head
    assert "Content-Length: 8" in head
    assert rest == "<p>x</p>\r\n\r\n"


# ---------------------------------------------------------------- CDX lines

def test_cdx_lines_shape_digest_and_ts(spark):
    import datetime
    import hashlib
    import re

    from search_engine_spark.sources.documents import load_documents
    from search_engine_spark.sources.warc import cdx_lines

    docs = load_documents(spark, "/root/testdata/sf0.001").filter(
        "doc_id < 40"
    )
    raw = {
        r["doc_id"]: (r["raw_url"], bytes(r["html"]), r["http_code"])
        for r in docs.select("doc_id", "raw_url", "html", "http_code")
        .collect()
    }
    rows = cdx_lines(docs).collect()
    assert len(rows) == len(raw)
    pat = re.compile(r'^(\S+) (\d{14}) (\{.*\})$')
    for r in rows:
        m = pat.match(r["cdxj"])
        assert m, r["cdxj"]
        assert m.group(1) == r["surt"]
        assert m.group(2) == r["ts14"]
        url, html, code = raw[r["doc_id"]]
        want_ts = datetime.datetime.fromtimestamp(
            1704067200 + 60 * r["doc_id"], datetime.timezone.utc
        ).strftime("%Y%m%d%H%M%S")
        assert r["ts14"] == want_ts
        assert f'"status": "{code}"' in r["cdxj"]
        assert f'"url": "{url}"' in r["cdxj"]
        assert hashlib.md5(html).hexdigest() in r["cdxj"]
        assert f'"length": "{len(html)}"' in r["cdxj"]


def test_cdx_surt_keys_are_domain_contiguous(spark):
    """The SURT property the key exists for: sorting by (surt, ts14)
    groups every site's captures into one contiguous run."""
    from search_engine_spark.sources.documents import load_documents
    from search_engine_spark.sources.warc import cdx_lines

    docs = load_documents(spark, "/root/testdata/sf0.001").filter(
        "doc_id < 30"
    )
    rows = sorted(
        cdx_lines(docs).collect(), key=lambda r: (r["surt"], r["ts14"])
    )
    hosts = [r["surt"].split(")")[0] for r in rows]
    seen, prev = set(), None
    for h in hosts:
        if h != prev:
            assert h not in seen, f"host {h} split into two runs"
            seen.add(h)
            prev = h
