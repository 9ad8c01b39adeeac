"""search_engine_spark — a PySpark-native inverted-index + BM25 analytics engine.

A brand-new implementation (not a port) of the query and data-processing
capabilities of the reference engine ``karvli/search-engine`` (a Spring Boot /
MySQL inverted-index web-search app), re-expressed Spark-first:

* documents live in columnar Parquet tables (Iceberg-style layout) instead of
  MySQL rows (reference: ``model/Page.java``),
* the text pipeline (reference: ``services/LemmasFinder.java``) runs as
  whole-stage-codegen column expressions with an Arrow pandas-UDF path for
  morphology,
* the inverted index (reference: ``model/Lemma.java`` + ``model/Index.java``)
  is built with ``groupBy`` aggregations and compressed posting blocks built
  via ``applyInPandas``,
* query evaluation (reference: ``services/SearchServiceImpl.java``) is a
  broadcast-terms posting scan with BM25 / reference-compatible scoring and a
  block-max WAND fast path.

Everything here derives from public knowledge only: the Apache Spark / PySpark
API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
