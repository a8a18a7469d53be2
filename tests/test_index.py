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


def test_stamped_auto_probe_specialized_and_validated(spark):
    """stamp_key_encodings: auto probes on a stamped index resolve each
    key's exact stored encoding JOB-FREE (specialized kernels, no
    per-probe discovery aggregation), keys absent from the dense map are
    provably all-sparse, mixed keys keep the dual kernels, and a stale
    stamp fails LOUD at execution (the validated-hint raise) instead of
    silently dropping rows."""
    from pyspark.sql import functions as F

    from iodf_spark.plans.rowset import PostingSet

    n = 70_000
    df = spark.range(n).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") < 60_000, "hot")
        .when(F.col("id") < 60_005, "cold")
        .otherwise("mid")
        .alias("k"),
    )
    ix = idx.build_index(df, idx.IndexConf(include=["k"]), n_rows=n).cache()
    try:
        idx.stamp_key_encodings(ix)
        stamped = {r["value_str"] for r in ix._iodf_dense_keys}
        # density rule f*256 > n: hot (60000) and mid (9995) dense, cold (5) sparse
        assert stamped == {"hot", "mid"}
        assert not any(r["_has_sparse"] for r in ix._iodf_dense_keys)

        hot = idx.probe(ix, "k", "hot", n, encoding_hint="auto")
        cold = idx.probe(ix, "k", "cold", n, encoding_hint="auto")
        miss = idx.probe(ix, "k", "zzz", n, encoding_hint="auto")
        assert hot.encodings == frozenset({"dense"})
        assert cold.encodings == frozenset({"sparse"})
        assert miss.encodings == frozenset({"sparse"})
        assert hot.f() == 60_000 and cold.f() == 5 and miss.f() == 0
        assert (hot & cold).f() == 0 and (hot | cold).f() == 60_005
        assert cold.to_list() == list(range(60_000, 60_005))

        # unstamped frame (fresh read of the same rows): dual-kernel
        # fallback, identical results
        ix2 = ix.filter(F.lit(True))
        dual = idx.probe(ix2, "k", "hot", n, encoding_hint="auto")
        assert dual.encodings == PostingSet.BOTH
        assert dual.f() == hot.f()

        # stale/wrong stamp (claims 'hot' is all-sparse): the validated
        # hint path must raise on the dense bucket rows, never return
        ix3 = ix.filter(F.lit(True))
        ix3._iodf_dense_keys = []
        bad = idx.probe(ix3, "k", "hot", n, encoding_hint="auto")
        with pytest.raises(Exception, match="other encoding"):
            bad.f()
    finally:
        ix.unpersist()


def test_stamped_mixed_key_keeps_dual_kernels(spark):
    """A key dense in one segment and sparse in another (multi-segment
    union) must resolve to the dual kernels — claiming either single
    encoding would raise at execution."""
    from pyspark.sql import functions as F

    n = 70_000
    d1 = spark.range(n).select(
        F.col("id").alias("row_id"), F.lit("dup").alias("k")
    )
    ix_dense = idx.build_index(d1, idx.IndexConf(include=["k"]), n_rows=n)
    d2 = spark.range(5).select(F.col("id").alias("row_id"), F.lit("dup").alias("k"))
    ix_sparse = idx.build_index(d2, idx.IndexConf(include=["k"]), n_rows=n, adaptive=False)
    union = ix_dense.unionByName(ix_sparse).cache()
    try:
        idx.stamp_key_encodings(union)
        assert [
            (r["value_str"], bool(r["_has_sparse"])) for r in union._iodf_dense_keys
        ] == [("dup", True)]
        ps = idx.probe(union, "k", "dup", n, encoding_hint="auto")
        from iodf_spark.plans.rowset import PostingSet

        assert ps.encodings == PostingSet.BOTH
        assert ps.f() == n + 5  # duplicate ids counted per posting row (union of spaces)
    finally:
        union.unpersist()
