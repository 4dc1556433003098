"""Sink-side operators.

Reference analogs (``sql/WritableDataFrame.scala``):
- S4 writeToParquet (:68-76): repartition by partition column, partitioned
  snappy parquet — kept for plain-parquet export; the engine's primary sink
  is the LakeTable MERGE.
- S7 writeToCsv (:109-127): array columns stringified '[a,b]', optional
  single file.
- S8 asArlasEsData (:78-81): deterministic document key synthesis id#ts.
- S9 withColumnsNested (:35-62, spec types sql/package.scala:69-87):
  recursive struct() building from a nested column-group spec; refuses to
  overwrite existing columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType


def write_partitioned_parquet(df: DataFrame, target: str, partition_col: str,
                              mode: str = "append") -> None:
    """Repartition-by-partition-value then partitionBy write: one file per
    partition per job, no small-file spray (WritableDataFrame.scala:68-76)."""
    (df.repartition(F.col(partition_col))
       .write.partitionBy(partition_col).mode(mode).parquet(target))


def write_csv(df: DataFrame, target: str, delimiter: str = ",",
              single_file: bool = False, mode: str = "overwrite") -> None:
    """CSV sink; ArrayType columns become '[a,b]' strings
    (WritableDataFrame.scala:109-127, concat_ws at :117). A NULL array
    stays NULL (empty CSV cell) — unguarded concat_ws would render it as
    the same '[]' as a present-but-empty array."""
    out = df
    for f in df.schema.fields:
        if isinstance(f.dataType, ArrayType):
            out = out.withColumn(
                f.name,
                F.when(F.col(f.name).isNotNull(),
                       F.concat(F.lit("["), F.concat_ws(",", F.col(f.name)),
                                F.lit("]"))))
    if single_file:
        out = out.coalesce(1)
    (out.write.option("header", "true").option("delimiter", delimiter)
        .mode(mode).csv(target))


def write_routed(df: DataFrame, target_pattern: str, route_col: Column | str,
                 fmt: str = "parquet", mode: str = "overwrite",
                 route_name: str = "_route") -> dict[str, str]:
    """Dynamic routed sink (S6): route each row to a per-value target —
    the reference's ``writeToElasticsearch(target="my_index_{}/doc",
    dynamicIndexColumn=...)`` pattern (WritableDataFrame.scala:98-107),
    re-targeted to filesystem sinks.

    ``target_pattern`` contains ``{}``, replaced by each distinct value
    of ``route_col``. ONE Spark job: repartition by the route column,
    ``partitionBy`` write to a staging dir, then rename each
    ``_route=<v>`` directory to its target — never a per-value filter
    loop (N full scans) and never a collect of distinct values up front.
    The route column itself is not written into the payload files
    (mirroring the reference's es.mapping.exclude of dynamicIndex).
    Returns {route_value: target_path}."""
    import glob as _glob
    import os as _os
    import shutil as _shutil
    import uuid as _uuid
    if "{}" not in target_pattern:
        raise ValueError("target_pattern must contain '{}'")
    col = F.col(route_col) if isinstance(route_col, str) else route_col
    stage = _os.path.join(_os.path.dirname(target_pattern) or ".",
                          f".route-stage-{_uuid.uuid4().hex}")
    routed = df.withColumn(route_name, col.cast("string"))
    writer = (routed.repartition(F.col(route_name))
              .write.partitionBy(route_name).mode("overwrite"))
    getattr(writer, fmt)(stage)
    out: dict[str, str] = {}
    for vdir in _glob.glob(_os.path.join(stage, f"{route_name}=*")):
        value = vdir.rsplit("=", 1)[1]
        target = target_pattern.replace("{}", value)
        if mode == "overwrite" and _os.path.exists(target):
            _shutil.rmtree(target)
        _os.makedirs(_os.path.dirname(target) or ".", exist_ok=True)
        _os.replace(vdir, target)
        out[value] = target
    _shutil.rmtree(stage, ignore_errors=True)
    return out


def with_keyed_doc_id(df: DataFrame, id_col: str, ts_col: str,
                      out_col: str = "doc_id") -> DataFrame:
    """Deterministic sink document id ``id#ts`` — the idempotent-upsert key
    (WritableDataFrame.scala:78-86: replays overwrite instead of duplicate)."""
    return df.withColumn(
        out_col, F.concat_ws("#", F.col(id_col), F.col(ts_col).cast("string")))


class ColumnOverwriteError(ValueError):
    pass


def with_columns_nested(df: DataFrame, spec: dict) -> DataFrame:
    """Build nested struct columns from a recursive spec
    (WritableDataFrame.scala:35-62).

    ``spec``: {out_col: group} where group is {field: 'source_col' | group}.
    Refuses to overwrite an existing column (reference behavior).
    """
    def build(group: dict) -> Column:
        fields = []
        for name, v in group.items():
            fields.append((build(v) if isinstance(v, dict) else F.col(v)).alias(name))
        return F.struct(*fields)

    out = df
    for out_col, group in spec.items():
        if out_col in df.columns:
            raise ColumnOverwriteError(f"column {out_col} already exists")
        out = out.withColumn(out_col, build(group))
    return out
