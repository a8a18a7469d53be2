"""Format connectors: land CSV / JSON-lines / parquet corpora in the
engine's managed surface (row_id-stamped tables, segment stores).

The reference supports exactly one bespoke binary format (SURVEY.md §2.1
S1-S9: writeDf/openDf over mmap files); Spark's readers give this engine
every mainstream format for free. These helpers pin down the semantics the
managed surface needs on top of a raw `spark.read`:

* **explicit schema by default** — at 100 TB, schema inference is a full
  extra pass over the data (CSV/JSON infer by scanning); callers must pass
  a StructType or opt in to inference with ``infer=True`` (sampled for
  JSON via samplingRatio);
* **deterministic row ids** — stamped with the same natural-key numbering
  as parquet-sourced tables (sources/tables.with_row_id), so bitmap/index
  semantics are identical regardless of the wire format;
* **direct segment landing** — one call from a raw file drop to an
  indexed, immutable segment (the reference's createIndexedDfFile
  lifecycle, E1 in SURVEY.md §3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_FORMATS = ("parquet", "csv", "json", "orc")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    infer: bool = False,
    **options: str,
) -> DataFrame:
    """Read a corpus file/dir in any supported format with scale-safe
    schema handling. CSV defaults: header=true. JSON is JSON-lines (the
    only JSON shape that splits across workers; multiLine JSON is a
    single-task read and is deliberately NOT defaulted)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    if fmt not in ("parquet", "orc") and schema is None and not infer:
        raise ValueError(
            f"{fmt} needs an explicit schema (or infer=True: a full/sampled "
            "extra pass over the data — fine locally, costly at scale)"
        )
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        opts = {"header": "true", **options}
        if schema is None:
            opts.setdefault("inferSchema", "true")
        return reader.options(**opts).csv(path)
    if fmt == "json":
        return reader.options(**options).json(path)
    if fmt == "orc":
        # self-describing columnar like parquet: footer schema, predicate
        # pushdown and column pruning apply — no schema requirement
        return reader.options(**options).orc(path)
    return reader.options(**options).parquet(path)


def ingest_to_store(
    spark: SparkSession,
    path: str,
    store,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    order_keys: list[str] | None = None,
    index_conf=None,
    infer: bool = False,
    **options: str,
) -> dict:
    """Raw file drop -> indexed immutable segment: read in the given
    format, stamp deterministic row ids (inside write_segment), build the
    per-segment inverted index. Returns the segment manifest entry."""
    df = read_table(spark, path, fmt, schema=schema, infer=infer, **options)
    return store.write_segment(df, order_keys=order_keys, index_conf=index_conf)
