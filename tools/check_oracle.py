"""Local mimic of the driver's correctness gate — TYPE-STRICT edition.

Runs each queries() entry on Spark and its oracle_sql() on DuckDB at sf0.01
and compares at three levels, all of which must pass:

  1. sorted column names
  2. Arrow type KIND per column (int vs float vs decimal vs string vs ...)
     — DuckDB's windowed sum of integers returns HUGEINT which surfaces
     through Arrow as decimal128(38,0); a BIGINT on the Spark side is a
     DIFFERENT type and the driver's hash is type-strict about it. Round 4
     shipped exactly that bug because this gate used to collapse every
     value through str(). Integer WIDTHS are treated as equivalent
     (int32 == int64) because the driver's 48/50-green history shows width
     is normalized; KIND is not.
  3. exact values (order-insensitive). The ONLY tolerated difference is a
     float epsilon (rel 1e-9) on float-kind columns, documented here.

Usage:
    python tools/check_oracle.py [sf_dir] [query ...]
    python tools/check_oracle.py --schema-only [sf_dir] [query ...]

--schema-only runs every oracle under LIMIT 0 and the Spark query under
.limit(0) — a fast one-shot schema sweep across all oracles.
"""

from __future__ import annotations

import math
import sys

import duckdb
import pyarrow as pa

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from iodf_spark.sources.tables import TABLES  # noqa: E402


def vanilla_spark():
    """Build the session the way the DRIVER gate does — vanilla, none of the
    repo's session.py confs — so conf-dependence bugs reproduce locally
    (CORRECTNESS_r01: 4 queries failed only under the driver's session)."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[8]")
        .appName("oracle_check_vanilla")
        .getOrCreate()
    )


def type_kind(t: pa.DataType) -> str:
    """Collapse an Arrow type to the KIND the comparison is strict about.

    int widths/signedness are one kind (the driver normalizes width);
    decimal, float, bool, string, binary, temporal, and nested types are
    each their own kind. decimal128(38,0) vs int64 => MISMATCH — that is
    the class this gate exists to catch.
    """
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"list<{type_kind(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{t.field(i).name}:{type_kind(t.field(i).type)}" for i in range(t.num_fields))
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{type_kind(t.key_type)},{type_kind(t.item_type)}>"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def schema_kinds(tbl: pa.Table) -> dict[str, str]:
    return {f.name: type_kind(f.type) for f in tbl.schema}


FLOAT_REL_EPS = 1e-9  # the ONE documented tolerance


def norm_cell(v, kind: str):
    """Exact typed comparison value. Floats get a documented epsilon via
    9-sig-digit rounding; everything else is compared exactly (type tag
    included so 1 != '1' != Decimal(1))."""
    if v is None:
        return ("null",)
    if kind == "float":
        f = float(v)
        if math.isnan(f):
            return ("float", "NaN")
        if math.isinf(f):
            return ("float", "Inf" if f > 0 else "-Inf")
        return ("float", f"{f:.9g}")
    if kind == "int":
        return ("int", int(v))
    if kind == "decimal":
        import decimal

        return ("decimal", str(decimal.Decimal(v)))
    if kind == "bool":
        return ("bool", bool(v))
    if kind.startswith("list<"):
        inner = kind[5:-1]
        return ("list", tuple(norm_cell(x, inner) for x in v))
    return (kind, str(v))


def arrow_rows(tbl: pa.Table, col_order: list[str], kinds: dict[str, str]):
    cols = [tbl.column(c).to_pylist() for c in col_order]
    n = tbl.num_rows
    return sorted(
        tuple(norm_cell(cols[j][i], kinds[col_order[j]]) for j in range(len(col_order)))
        for i in range(n)
    )


def spark_to_arrow(sdf) -> pa.Table:
    try:
        return sdf.toArrow()
    except Exception:
        import pandas as pd  # noqa: F401

        return pa.Table.from_pandas(sdf.toPandas(), preserve_index=False)


def main():
    args = [a for a in sys.argv[1:]]
    schema_only = "--schema-only" in args
    if schema_only:
        args.remove("--schema-only")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = vanilla_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            if schema_only:
                sdf = sdf.limit(0)
            stbl = spark_to_arrow(sdf)
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: no oracle (rows-only) -> {stbl.num_rows} rows")
            continue
        try:
            osql = oracles[name]
            if schema_only:
                osql = f"SELECT * FROM ({osql}) LIMIT 0"
            dtbl = con.execute(osql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        scols, dcols = sorted(stbl.column_names), sorted(dtbl.column_names)
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} != {dcols}")
            failures += 1
            continue
        skinds, dkinds = schema_kinds(stbl), schema_kinds(dtbl)
        kind_diffs = [
            (c, skinds[c], dkinds[c]) for c in scols if skinds[c] != dkinds[c]
        ]
        if kind_diffs:
            print(f"FAIL {name}: type-kind mismatch (spark vs oracle): {kind_diffs}")
            failures += 1
            continue
        if schema_only:
            print(f"PASS {name}: schema ok ({len(scols)} cols)")
            continue
        if stbl.num_rows != dtbl.num_rows:
            print(f"FAIL {name}: rowcount {stbl.num_rows} != {dtbl.num_rows}")
            failures += 1
            continue
        sn = arrow_rows(stbl, scols, skinds)
        dn = arrow_rows(dtbl, dcols, dkinds)
        if sn != dn:
            diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            failures += 1
            continue
        print(f"PASS {name}: {stbl.num_rows} rows")
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
