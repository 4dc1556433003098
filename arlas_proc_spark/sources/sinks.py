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
