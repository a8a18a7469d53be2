"""Index build/probe correctness vs DuckDB ground truth on lineitem
(sf0.001). Mirrors the reference's index golden tests (DfTest.scala:152-202):
key inventory, typed-key lookup, posting lists, selectivities."""

import duckdb
import pytest
from pyspark.sql import functions as F

from iodf_spark.operators import index as idx
from iodf_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem", row_id=True).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def li_index(spark, li):
    ix = idx.build_index(
        li, idx.IndexConf(include=["l_returnflag", "l_linestatus", "l_quantity"]),
        bucket_size=1024,
    ).cache()
    ix.count()
    yield ix
    ix.unpersist()


def _duck(sf_dir, sql):
    return duckdb.sql(sql.replace("LINEITEM", f"read_parquet('{sf_dir}/lineitem.parquet')"))


def test_selectivity_matches(sf_dir, li_index):
    for col, val in [("l_returnflag", "R"), ("l_linestatus", "F"), ("l_quantity", 4.0)]:
        expected = _duck(
            sf_dir, f"SELECT count(*) FROM LINEITEM WHERE {col} = '{val}'"
            if isinstance(val, str)
            else f"SELECT count(*) FROM LINEITEM WHERE {col} = {val}",
        ).fetchone()[0]
        assert idx.f(li_index, col, val) == expected, (col, val)


def test_missing_key_is_empty(spark, li_index):
    # IndexedDf.scala:79 — miss -> empty bits
    assert idx.f(li_index, "l_returnflag", "ZZZ") == 0
    assert idx.probe(li_index, "l_returnflag", "ZZZ", 6000).f() == 0


def test_posting_lists_match_row_ids(sf_dir, li, li_index):
    n = li.count()
    got = idx.probe(li_index, "l_returnflag", "R", n, bucket_size=1024).to_list()
    expected = [
        r[0]
        for r in _duck(
            sf_dir,
            """SELECT rid FROM (
                 SELECT row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_extendedprice) - 1 AS rid,
                        l_returnflag
                 FROM LINEITEM) WHERE l_returnflag = 'R' ORDER BY rid""",
        ).fetchall()
    ]
    assert got == expected


def test_col_values_sorted_distinct(sf_dir, li_index):
    vals = [r["value_str"] for r in idx.col_values(li_index, "l_returnflag").collect()]
    expected = [
        r[0]
        for r in _duck(
            sf_dir, "SELECT DISTINCT l_returnflag FROM LINEITEM ORDER BY 1"
        ).fetchall()
    ]
    assert vals == expected
    # numeric keys sort numerically, not lexically (io/test/df/index_exp.txt)
    qvals = [r["value_double"] for r in idx.col_values(li_index, "l_quantity").collect()]
    assert qvals == sorted(qvals)


def test_text_analyzer_tokenizes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents", row_id=True)
    n = docs.count()
    ix = idx.build_index(
        docs, idx.IndexConf(include=["text"], analyzers={"text": idx.text_analyzer})
    )
    # every token posting list is within range and selectivities are sane
    stats = idx.key_stats(ix)
    assert stats.agg(F.max("f")).collect()[0][0] <= n
    total_tokens = stats.agg(F.sum("f")).collect()[0][0]
    expected = duckdb.sql(
        f"""SELECT count(*) FROM (
              SELECT DISTINCT doc_id, unnest(string_split_regex(text, '\\s+')) t
              FROM read_parquet('{sf_dir}/documents.parquet')) WHERE t <> ''"""
    ).fetchone()[0]
    assert total_tokens == expected


def test_udtf_analyzer_equals_expression_analyzer(spark, sf_dir):
    """§2.12 UDTF surface: the Python-UDTF tokenizer (lateral join fan-out)
    must produce exactly the expression analyzer's (row_id, token) rows —
    swapping a Python tokenizer in changes speed, never index semantics."""
    from pyspark.sql import functions as F

    from iodf_spark.operators.index import text_analyzer
    from iodf_spark.operators.pyanalyzers import py_tokenize
    from iodf_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents", row_id=True).limit(50)
    via_expr = docs.select(
        "row_id", F.explode(text_analyzer(F.col("text"))).alias("token")
    )
    via_udtf = py_tokenize(docs, "row_id", "text")
    a = sorted(map(tuple, via_expr.collect()))
    b = sorted(map(tuple, via_udtf.collect()))
    assert a == b and len(a) > 0
