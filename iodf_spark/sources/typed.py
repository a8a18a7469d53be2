"""Typed dataframe surface — the Spark rendition of TypedDf
(TypedDf.scala:9-18: case-class schema in, row materialization out;
SURVEY.md §1.1, P3).

The reference derives the schema from a Scala case class by reflection with
fields **sorted alphabetically** (TypedDf.scala:38-42, Dfs.scala:417-423);
here the schema comes from a Python dataclass, same sorted-field invariant.
Row access `apply(i)` becomes a row_id filter + dataclass reconstruction.
"""

from __future__ import annotations

import dataclasses

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PY_TO_SPARK = {
    bool: T.BooleanType(),
    int: T.LongType(),
    float: T.DoubleType(),
    str: T.StringType(),
}


def schema_for(cls) -> T.StructType:
    """StructType from a dataclass; fields sorted by name (the reference's
    sorted-column invariant, Dfs.scala:250)."""
    if not dataclasses.is_dataclass(cls):
        raise TypeError(f"{cls} is not a dataclass")
    by_name = {c.__name__: c for c in _PY_TO_SPARK}
    out = []
    for f in sorted(dataclasses.fields(cls), key=lambda f: f.name):
        t = f.type if isinstance(f.type, type) else by_name.get(str(f.type))
        if t not in _PY_TO_SPARK:
            raise TypeError(f"unsupported field type {f.type!r} for {f.name}")
        out.append(T.StructField(f.name, _PY_TO_SPARK[t]))
    return T.StructType(out)


def create_typed_df(spark: SparkSession, items: list) -> DataFrame:
    """createTypedDf (Dfs.scala:439-452): columnarize a list of dataclass
    instances, attach row_id = input position (ingest order, exactly the
    reference's row addressing)."""
    if not items:
        raise ValueError("empty input — pass at least one item")
    cls = type(items[0])
    schema = schema_for(cls)
    names = [f.name for f in schema.fields]
    rows = [tuple(getattr(it, n) for n in names) + (i,) for i, it in enumerate(items)]
    full = T.StructType(list(schema.fields) + [T.StructField("row_id", T.LongType())])
    return spark.createDataFrame(rows, full)


def typed_row(df: DataFrame, cls, i: int):
    """TypedDf.apply(i) (TypedDf.scala:66-68): materialize row i as a
    dataclass instance."""
    names = [f.name for f in sorted(dataclasses.fields(cls), key=lambda f: f.name)]
    rows = df.filter(F.col("row_id") == i).select(*names).collect()
    if not rows:
        raise IndexError(i)
    return cls(**rows[0].asDict())


def collect_typed(df: DataFrame, cls) -> list:
    """Materialize all rows (ordered by row_id) as dataclass instances."""
    names = [f.name for f in sorted(dataclasses.fields(cls), key=lambda f: f.name)]
    return [cls(**r.asDict()) for r in df.orderBy("row_id").select(*names).collect()]
