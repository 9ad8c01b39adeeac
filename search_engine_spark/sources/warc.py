"""WARC source — serialize/parse the Web ARChive format (ISO 28500),
the actual interchange format of Common Crawl (the corpus the north rule
targets: "Common-Crawl-style web pages").

A real ingestion job reads concatenated-record WARC files and recovers
(url, warc_ts, html) — exactly the engine's input_hint columns. Both
directions are pure codegen column expressions (split / regexp_extract /
locate / substring / to_timestamp) — no UDF, so the parse runs inside
whole-stage codegen over the file scan, and at 100 TB the job is
scan-bound: each WARC blob is one row, records explode in-task, and the
only data movement is whatever the downstream pipeline shuffles.

Record layout written and understood here (response records only):

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Record-ID: <urn:uuid:doc-{doc_id}>\r\n
    WARC-Target-URI: {url}\r\n
    WARC-Date: {ISO-8601 with explicit offset}\r\n
    Content-Type: text/html\r\n
    Content-Length: {payload octets}\r\n
    \r\n
    {payload}\r\n\r\n

WARC-Date carries an EXPLICIT zone offset (pattern XXX — prints ``Z``
under the engine's pinned-UTC session, a numeric offset elsewhere), so
format→parse recovers the exact instant in any session timezone (a
zoneless pattern would be ambiguous across DST folds). Precision is
WHOLE SECONDS — WARC/1.0 (ISO 28500:2009 §5.4) mandates second-precision
``YYYY-MM-DDThh:mm:ssZ`` dates, so sub-second warc_ts input is truncated
at serialization BY DESIGN; round-tripping is exact for whole-second
instants (all crawl fixtures) and floor-to-second otherwise. Emitting
WARC/1.1 fractional dates would break WARC/1.0 consumers. The payload is
sliced from the first blank line to the record's trailing CRLF pair, so
payloads containing interior CRLF pairs parse correctly; a payload
containing a literal WARC version line would need the spec's
Content-Length OCTET slicing over the raw bytes instead — that
refinement belongs at the binary-file reader seam (the fixture blobs
are in-memory strings; Content-Length is still written, and returned,
per record).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DATE_FMT = "yyyy-MM-dd'T'HH:mm:ssXXX"
_REC_DELIM = "WARC/1.0\r\n"
DOCS_PER_FILE = 64


def warc_record_col(
    doc_id="doc_id", url="url", warc_ts="warc_ts", html="html"
):
    """One serialized WARC response record as a string column."""
    payload = F.decode(F.col(html), "utf-8")
    return F.concat(
        F.lit(_REC_DELIM),
        F.lit("WARC-Type: response\r\n"),
        F.lit("WARC-Record-ID: <urn:uuid:doc-"),
        F.col(doc_id).cast("string"),
        F.lit(">\r\n"),
        F.lit("WARC-Target-URI: "),
        F.col(url),
        F.lit("\r\n"),
        F.lit("WARC-Date: "),
        F.date_format(F.col(warc_ts), _DATE_FMT),
        F.lit("\r\n"),
        F.lit("Content-Type: text/html\r\n"),
        F.lit("Content-Length: "),
        F.octet_length(F.col(html)).cast("string"),
        F.lit("\r\n\r\n"),
        payload,
        F.lit("\r\n\r\n"),
    )


def to_warc_files(
    docs: DataFrame, docs_per_file: int = DOCS_PER_FILE
) -> DataFrame:
    """(file_id, blob) — documents serialized into concatenated-record
    WARC blobs, doc_id-ascending within each file (deterministic bytes).

    One groupBy(file_id) shuffle of the serialized records; file sizing
    is the docs_per_file knob (real jobs target ~1 GiB per WARC)."""
    recs = docs.select(
        (F.col("doc_id") / docs_per_file).cast("long").alias("file_id"),
        F.struct("doc_id", warc_record_col().alias("rec")).alias("s"),
    )
    return recs.groupBy("file_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("s")), lambda s: s["rec"]
            ),
            "",
        ).alias("blob")
    )


def parse_warc(files: DataFrame, blob_col: str = "blob") -> DataFrame:
    """WARC blobs → (url, warc_ts, html, n_bytes): split each blob into
    records on the version line, extract the headers, slice the payload
    from the first blank line to the trailing CRLF pair."""
    rec = F.col("rec")
    body_off = F.locate("\r\n\r\n", rec) + 4
    n_bytes = F.regexp_extract(
        rec, r"Content-Length: ([0-9]+)\r\n", 1
    ).cast("long")
    return (
        files.select(
            # split pattern is a REGEX — escape the version line's dot
            F.explode(
                F.split(F.col(blob_col), r"WARC/1\.0\r\n")
            ).alias("rec")
        )
        .filter(F.col("rec") != "")
        .select(
            F.regexp_extract(rec, r"WARC-Target-URI: ([^\r]+)\r\n", 1).alias(
                "url"
            ),
            F.to_timestamp(
                F.regexp_extract(rec, r"WARC-Date: ([^\r]+)\r\n", 1),
                _DATE_FMT,
            ).alias("warc_ts"),
            rec.substr(body_off, F.length(rec) - body_off - 3).alias("html"),
            n_bytes.alias("n_bytes"),
        )
    )


def cdx_lines(docs: DataFrame) -> DataFrame:
    """(doc_id, surt, ts14, cdxj) — a CDXJ capture-index line per page,
    the lookup sidecar every WARC collection ships (Common Crawl's
    `cc-index`, IA's OpenWayback CDX server): SURT key + 14-digit UTC
    timestamp + a JSON block with the original url, mime, fetch status,
    content digest, and stored length. Sorting by (surt, ts14) gives the
    CDX property the key was designed for: all captures of a domain are
    one contiguous range, binary-searchable without touching the WARCs.

    Digest is the engine's md5 content fingerprint (the spec's default is
    SHA1-Base32; md5 keeps the digest shared with warc_roundtrip /
    exact-dedup so one fingerprint column serves all three). The JSON is
    assembled with concat — not to_json — so the byte layout is pinned
    for the DuckDB oracle twin. Pure codegen over the documents scan;
    writing the sorted file is a sortWithinPartitions on a
    range-partitioned (surt, ts14) write, no global sort needed."""
    ts14 = F.date_format(F.col("warc_ts"), "yyyyMMddHHmmss")
    digest = F.md5(F.col("html"))
    cdxj = F.concat(
        F.lit('{"url": "'),
        F.col("raw_url"),
        F.lit('", "mime": "text/html", "status": "'),
        F.col("http_code").cast("string"),
        F.lit('", "digest": "'),
        digest,
        F.lit('", "length": "'),
        F.octet_length(F.col("html")).cast("string"),
        F.lit('"}'),
    )
    from ..functions.text_columns import surt_key_col

    return docs.select(
        "doc_id",
        surt_key_col("raw_url").alias("surt"),
        ts14.alias("ts14"),
        F.concat(
            surt_key_col("raw_url"), F.lit(" "), ts14, F.lit(" "), cdxj
        ).alias("cdxj"),
    )
