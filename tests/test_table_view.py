"""Data-table row-range views (Df.view, Df.scala:96-114) — mirrors the
DfTest view invariants: slice length, content binding preserved, views of
views compose, empty/clipped ranges."""

from pyspark.sql import functions as F

from iodf_spark.sources.tables import load_table, view


def test_view_invariants(spark, sf_dir):
    od = load_table(spark, sf_dir, "orders", row_id=True).cache()
    n = od.count()

    v = view(od, 10, 60)
    assert v.count() == 50
    # re-based ids are contiguous 0..49
    ids = [r["row_id"] for r in v.orderBy("row_id").collect()]
    assert ids == list(range(50))
    # (row_id, row) binding preserved: row 0 of the view is row 10 of od
    orig = od.filter(F.col("row_id") == 12).select("o_orderkey").first()
    got = v.filter(F.col("row_id") == 2).select("o_orderkey").first()
    assert got["o_orderkey"] == orig["o_orderkey"]

    # composition: view(view(df, a, b), c, d) == view(df, a+c, a+d)
    vv = view(view(od, 10, 60), 5, 20)
    direct = view(od, 15, 30)
    assert sorted(map(tuple, vv.collect())) == sorted(map(tuple, direct.collect()))

    # clipping: until beyond n yields only existing rows; empty view is empty
    assert view(od, n - 5, n + 100).count() == 5
    assert view(od, 30, 30).count() == 0
