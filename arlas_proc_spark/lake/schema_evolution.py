"""Schema evolution: add columns, widen types — never rewrite data.

This is the Iceberg evolution contract rebuilt over plain parquet + JSON
snapshots, and the engine analog of the reference's additive
``transformSchema`` contract (``transform/ArlasTransformer.scala:27-50``:
every stage declares an additive schema delta; nullability may loosen,
columns are only ever added — ``fragments/FragmentSummaryTransformer.scala:
232-234,300-324`` re-asserts the widened schema after aggregation).

Allowed promotions (Iceberg's rules plus integer→floating, which Spark
reads losslessly for our value ranges):
    byte → short → int → long → double, float → double.
Anything else (e.g. string vs long) is an incompatible evolution and raises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, StructField, StructType

# widening chains: a type may evolve to any type in its chain set
_CHAIN = {
    "byte": {"short", "integer", "long", "double"},
    "short": {"integer", "long", "double"},
    "integer": {"long", "double"},
    "long": {"double"},
    "float": {"double"},
}


class SchemaEvolutionError(ValueError):
    pass


def _widen(a: DataType, b: DataType) -> DataType:
    """Least common widened type of a and b, or raise."""
    if a == b:
        return a
    an, bn = a.typeName(), b.typeName()
    if bn in _CHAIN.get(an, set()):
        return b
    if an in _CHAIN.get(bn, set()):
        return a
    raise SchemaEvolutionError(f"incompatible type evolution: {an} vs {bn}")


def evolve_schema(table: StructType, batch: StructType) -> tuple[StructType, bool]:
    """Resolve a batch schema against the live table schema.

    Returns (new_schema, changed). New columns append (nullable — old rows
    read as null); common columns widen per the lattice; columns missing
    from the batch stay (the batch just won't populate them). Column drop
    is not an evolution (Iceberg keeps the column; readers null-fill).
    """
    by_name = {f.name: f for f in batch.fields}
    out: list[StructField] = []
    changed = False
    for f in table.fields:
        if f.name in by_name:
            w = _widen(f.dataType, by_name[f.name].dataType)
            nullable = f.nullable or by_name[f.name].nullable
            if w != f.dataType or nullable != f.nullable:
                changed = True
            out.append(StructField(f.name, w, nullable))
        else:
            out.append(f)
    known = {f.name for f in table.fields}
    for f in batch.fields:
        if f.name not in known:
            out.append(StructField(f.name, f.dataType, True))  # new cols nullable
            changed = True
    return StructType(out), changed


def align_to_schema(df: DataFrame, schema: StructType) -> DataFrame:
    """Project df to exactly `schema`: cast common columns (widening),
    null-fill missing ones. One `select` — stays inside whole-stage codegen."""
    cols = []
    have = set(df.columns)
    for f in schema.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
