"""arlas_proc_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch rebuild of the *semantics* of gisaia/ARLAS-proc (reference at
/root/reference: a Scala/Spark batch library that ingests keyed, time-ordered
observation streams, sessionizes them, summarizes them and upserts them into
keyed sinks) re-expressed as an idiomatic PySpark engine:

- ordered keyed change-feed ingestion (binlog/WAL tail) over source-code
  repository tables ``(repo, path, commit, lang, content)``;
- dedup by (key, commit) — reference analog
  ``tools/DataFrameFormatter.scala:47-49`` (``withNoDuplicates``);
- deterministic last-writer-wins resolution per key — reference analog
  ``fragments/FragmentSummaryTransformer.scala:211-325`` (conditional group
  collapse) made deterministic;
- schema evolution (add / widen) against the live table — reference analog
  the additive ``transformSchema`` contract
  (``transform/ArlasTransformer.scala:27-50``);
- exactly-once keyed MERGE upsert into an Iceberg-style snapshot table —
  reference analog the idempotent Elasticsearch doc-id upsert
  (``sql/WritableDataFrame.scala:83-86``);
- all row-level transforms via vectorized pandas/Arrow UDFs — reference
  analog the JVM UDF layer (``utils/GeoTool.scala``).

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
