"""External enrichment — conditional, batched, keep-existing-on-no-match.

Reference analog: ``WithGeoData`` / ``WithRoutingData`` + ``RestTool``
(``/root/reference/src/main/scala/io/arlas/data/transform/features/WithGeoData.scala:71-126``,
``/root/reference/src/main/scala/io/arlas/data/utils/RestTool.scala:40-83``):
rows matching a condition column are enriched from an external service;
rows failing the condition keep their existing values; a lookup MISS
leaves the row unenriched; an UNAVAILABLE service fails the job loudly
(the reference throws out of the UDF on timeout/unknown-host).

Spark-first re-expression, two variants by lookup shape:

- ``enrich_with_table``: the lookup is a (small) dimension DataFrame —
  a broadcast LEFT join gated by the condition, entirely Catalyst
  (predicate pushdown, codegen; zero Python). Use whenever the service's
  content can be snapshotted to a table — at 10^10 rows a broadcast join
  beats any RPC pattern by orders of magnitude.
- ``enrich_rows``: the lookup is a CALLABLE (service client). Batched via
  ``mapInPandas``: ONE call per Arrow batch with the batch's DISTINCT
  cond-true keys (the bulk-request shape every real enrichment service
  wants; the reference's row-at-a-time ``getGeoDataUDF`` with the
  explode(array(udf)) single-evaluation workaround is the anti-pattern
  this replaces). The callable is a plain function — mock it in tests
  the way the reference uses WireMock (``ArlasMockServer``).

Unavailability contract: the lookup callable raises
``EnrichmentUnavailableError`` → the job fails (matching
``RestTool.getOrFailOnNotAvailable``). Any per-key miss (key absent from
the returned frame, or null value) keeps the existing value.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arlas_proc_spark.operators.base import require_columns


class EnrichmentUnavailableError(RuntimeError):
    """The enrichment service cannot be reached at all — fail the job
    (a silent skip would produce a silently-unenriched table)."""


def enrich_with_table(df: DataFrame, lookup_df: DataFrame,
                      key_cols: list[str], out_cols: list[str],
                      cond_col: str | None = None) -> DataFrame:
    """Dimension-table enrichment: broadcast LEFT join + condition gate.

    Output columns that already exist on ``df`` keep their value whenever
    the condition is false OR the join missed; otherwise they take the
    looked-up value. Missing output columns are created (null where not
    enriched)."""
    require_columns(df, *key_cols)
    looked = F.broadcast(
        lookup_df.select(*key_cols,
                         *[F.col(c).alias(f"_lk_{c}") for c in out_cols],
                         F.lit(True).alias("_lk_hit")))
    joined = df.join(looked, on=key_cols, how="left")
    gate = F.coalesce(F.col("_lk_hit"), F.lit(False))
    if cond_col is not None:
        gate = gate & (F.col(cond_col) == F.lit(True))
    out = joined
    for c in out_cols:
        existing = F.col(c) if c in df.columns else F.lit(None)
        out = out.withColumn(c, F.when(gate, F.col(f"_lk_{c}"))
                             .otherwise(existing))
    return out.drop("_lk_hit", *[f"_lk_{c}" for c in out_cols])


def enrich_rows(df: DataFrame,
                lookup: Callable[[pd.DataFrame], pd.DataFrame],
                key_cols: list[str], out_schema: dict[str, str],
                cond_col: str | None = None) -> DataFrame:
    """Callable-service enrichment via batched ``mapInPandas``.

    ``lookup`` receives ONE pandas frame per Arrow batch holding the
    batch's DISTINCT keys (only from rows passing ``cond_col``) and
    returns a frame with ``key_cols`` plus any of ``out_schema``'s
    columns; keys it omits (or returns null for) are misses and keep the
    row's existing value. It may raise ``EnrichmentUnavailableError`` to
    abort the job. ``out_schema`` maps new/updated column name → Spark
    DDL type (e.g. ``{"category": "string"}``)."""
    require_columns(df, *key_cols)
    out_fields = list(df.schema.fields)
    have = {f.name for f in df.schema.fields}
    for name, ddl in out_schema.items():
        if name not in have:
            out_fields.append(
                T.StructField(name, T._parse_datatype_string(ddl), True))
    result_schema = T.StructType(out_fields)
    out_names = list(out_schema)
    col_order = [f.name for f in result_schema.fields]

    def _apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for name in out_names:
                if name not in pdf.columns:
                    pdf[name] = None
            mask = (pdf[cond_col].fillna(False).astype(bool)
                    if cond_col is not None
                    else pd.Series(True, index=pdf.index))
            keys = pdf.loc[mask, key_cols].drop_duplicates()
            if len(keys):
                res = lookup(keys.reset_index(drop=True))
                if res is not None and len(res):
                    res = res.drop_duplicates(subset=key_cols)
                    merged = pdf[key_cols].merge(
                        res, on=key_cols, how="left", sort=False)
                    merged.index = pdf.index
                    for name in out_names:
                        if name in res.columns:
                            new = merged[name]
                            take = mask & new.notna()
                            pdf.loc[take, name] = new[take]
            yield pdf[col_order]

    return df.mapInPandas(_apply, schema=result_schema)
