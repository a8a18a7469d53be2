"""Pins the TYPE-STRICT local oracle gate (tools/check_oracle.py).

Round 4's only driver failure (sessionize/stream_sessionize) shipped
because the old gate collapsed every value through str(): DuckDB's windowed
sum of integers returns HUGEINT -> Arrow decimal128(38,0), the Spark side
was int64, the driver's type-strict hash failed — and the local gate
printed "50/50 PASS". These tests make that class impossible to ship
again, mirroring the reference's exact-repr golden transcripts (testtoys
diffs the full typed printout, io/test/df/index_exp.txt renders typed
keys).
"""

import sys

import duckdb
import pyarrow as pa

sys.path.insert(0, "/root/repo/tools")

from check_oracle import schema_kinds, type_kind  # noqa: E402


def test_type_kind_separates_decimal_from_int():
    # THE round-4 failure shape: decimal128(38,0) is NOT an int
    assert type_kind(pa.decimal128(38, 0)) == "decimal"
    assert type_kind(pa.int64()) == "int"
    assert type_kind(pa.decimal128(38, 0)) != type_kind(pa.int64())
    # but integer WIDTH is normalized (driver history: int32 vs int64 pass)
    assert type_kind(pa.int32()) == type_kind(pa.int64()) == type_kind(pa.int8())
    # float is neither int nor decimal
    assert len({type_kind(pa.float64()), type_kind(pa.int64()), type_kind(pa.decimal128(10, 2))}) == 3
    # strings and large_strings are one kind; binary is separate
    assert type_kind(pa.string()) == type_kind(pa.large_string())
    assert type_kind(pa.binary()) != type_kind(pa.string())
    # nested types recurse
    assert type_kind(pa.list_(pa.decimal128(38, 0))) != type_kind(pa.list_(pa.int64()))
    assert type_kind(pa.list_(pa.int32())) == type_kind(pa.large_list(pa.int64()))


def test_gate_flags_duckdb_windowed_sum_hugeint():
    """The exact regression, end-to-end through real DuckDB Arrow output:
    an uncast windowed sum surfaces as decimal; the ::BIGINT cast fixes
    it. No Spark needed — the Spark side of a cumulative session counter
    is always int64."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES (1, 0), (1, 1), (2, 0)) v(u, n)")
    uncast = con.execute(
        "SELECT u, sum(n) OVER (PARTITION BY u ORDER BY n) AS session_id FROM t"
    ).fetch_arrow_table()
    cast = con.execute(
        "SELECT u, (sum(n) OVER (PARTITION BY u ORDER BY n))::BIGINT AS session_id FROM t"
    ).fetch_arrow_table()
    spark_side = pa.table({"u": pa.array([1], pa.int32()), "session_id": pa.array([0], pa.int64())})
    sk = schema_kinds(spark_side)
    assert schema_kinds(uncast)["session_id"] == "decimal"  # the bug class
    assert schema_kinds(uncast)["session_id"] != sk["session_id"]
    assert schema_kinds(cast) == sk  # the fix


def test_sessionize_oracle_session_id_is_bigint():
    """Directly pins the fixed oracle SQL: session_id reaches Arrow as an
    int kind, not decimal (iodf_spark/operators/sessions.py)."""
    from iodf_spark.operators.sessions import sessionize_oracle

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT 'u1' AS user_id, "
        "TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (i) HOUR AS ts, "
        "i::DOUBLE AS value FROM range(5) t(i)"
    )
    tbl = con.execute(sessionize_oracle("events")).fetch_arrow_table()
    assert type_kind(tbl.schema.field("session_id").type) == "int"
    assert type_kind(tbl.schema.field("n_events").type) == "int"


def test_schema_sweep_all_oracles(spark, sf_dir):
    """One-shot Arrow-schema sweep across EVERY oracle at sf0.001: Spark
    result schema (limit 0) vs DuckDB result schema (LIMIT 0), compared at
    type-KIND strictness. Any future oracle whose types drift from the
    Spark side fails here before it ever reaches the driver."""
    import __spark_entry__ as entrymod
    from check_oracle import spark_to_arrow
    from iodf_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if name not in oracles:
            continue
        stbl = spark_to_arrow(fn(spark, sf_dir).limit(0))
        dtbl = con.execute(f"SELECT * FROM ({oracles[name]}) LIMIT 0").fetch_arrow_table()
        if sorted(stbl.column_names) != sorted(dtbl.column_names):
            bad.append((name, "columns", sorted(stbl.column_names), sorted(dtbl.column_names)))
            continue
        sk, dk = schema_kinds(stbl), schema_kinds(dtbl)
        diffs = [(c, sk[c], dk[c]) for c in sk if sk[c] != dk[c]]
        if diffs:
            bad.append((name, "kinds", diffs))
    assert not bad, f"oracle type drift: {bad}"
