"""Physical-plan shape regressions — the scale contract, pinned as tests.

Correctness tests prove the operators compute the right answer at sf0.001;
these prove the PLANS are the ones that survive a 100 TB scale-up:
broadcast joins stay broadcast (no sort-merge shuffle of the fact side),
scans prune columns and push filters, the segment index prunes partitions
on col_name. A regression here is a performance bug even when results stay
correct.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from iodf_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_star_join_is_broadcast_not_sort_merge(spark):
    import __spark_entry__ as m

    plan = plan_of(m.q_join_agg(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q1_scan_prunes_columns(spark):
    import __spark_entry__ as m

    plan = plan_of(m.q1_pricing_summary(spark, SF))
    # ReadSchema keeps only the 5 referenced columns — no full-row scan
    assert "l_extendedprice" in plan
    assert "l_shipdate" not in plan
    assert "l_comment" not in plan
    # partial + final hash aggregation (map-side combine before the shuffle)
    assert plan.count("HashAggregate") >= 2


def test_filter_pushdown_reaches_parquet(spark):
    li = load_table(spark, SF, "lineitem")
    plan = plan_of(li.filter(F.col("l_returnflag") == "R").select("l_orderkey"))
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]" in plan


def test_segment_index_probe_prunes_col_name_partition(spark, tmp_path):
    from iodf_spark.operators.index import IndexConf, probe
    from iodf_spark.sources.segments import SegmentStore

    store = SegmentStore(str(tmp_path / "store"))
    orders = load_table(spark, SF, "orders")
    store.write_segment(
        orders,
        order_keys=["o_orderkey"],
        index_conf=IndexConf(include=["o_orderstatus", "o_orderpriority"]),
    )
    ix = store.open_index(spark)
    rows = probe(ix, "o_orderpriority", "1-URGENT", store.total_rows()).to_rows()
    plan = plan_of(rows)
    # partitionBy(col_name) on write + equality probe -> partition pruning
    assert "PartitionFilters" in plan
    assert "col_name" in plan.split("PartitionFilters", 1)[1][:400]


def test_topk_uses_take_ordered(spark):
    import __spark_entry__ as m

    plan = plan_of(m.q_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan  # no full global sort for LIMIT k


def test_asof_join_has_no_cross_product(spark):
    import __spark_entry__ as m

    plan = plan_of(m.q_asof_join(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_open_index_aligned_is_union_without_shuffle(spark, tmp_path):
    """Bucket-aligned segment offsets make the multi-segment index view a
    pure union (bucket renumber + id shift are narrow): any Exchange in
    the plan is a regression to the explode+regroup path."""
    from iodf_spark.operators.index import IndexConf
    from iodf_spark.sources.segments import SegmentStore

    bs = 1 << 8  # small buckets so alignment is reachable with test rows
    store = SegmentStore(str(tmp_path / "aligned"), bucket_size=bs)
    orders = load_table(spark, SF, "orders", row_id=True)
    conf = IndexConf(include=["o_orderstatus"])
    # two segments of exactly 2*bs rows each -> offsets 0 and 2*bs: aligned
    seg = orders.filter(F.col("row_id") < 2 * bs).drop("row_id")
    store.write_segment(seg, order_keys=["o_orderkey"], index_conf=conf)
    store.write_segment(seg, order_keys=["o_orderkey"], index_conf=conf)
    assert all(e["row_id_offset"] % bs == 0 for e in store.manifest())
    plan = plan_of(store.open_index(spark))
    assert "Exchange" not in plan


def test_ivf_assignment_aggregates_scalars_only(spark):
    """Cell assignment, BOTH kernels (round-13 optimization):

    * small quantizers take the NARROW literal-argmax projection — zero
      Exchange, zero Aggregate between the corpus projection and the
      (cid, neighbor_id, _cv, _cvn) output (the previous plan's
      agg + re-attach self-join replanned the corpus twice);
    * the fallback (any quantizer size) must stay an argmax AGGREGATION
      over scalar columns — not a row_number window over the centroid
      expansion, and not an aggregate whose buffer carries the corpus
      vector (an array in a max/max_by buffer demotes to SortAggregate
      over the expansion WITH its arrays — the measured 10x regression
      this pin guards).

    Both kernels must return IDENTICAL rows (same floats, same cells) —
    the narrow literals are collected from the same centroid frame the
    broadcast path shipped, so this equality is bit-exact, and it is what
    lets every store build/append switch kernels freely."""
    from iodf_spark.operators.similarity import _ivf_assign, _ivf_centroids

    emb = load_table(spark, SF, "embeddings")
    cent = _ivf_centroids(emb, "vec_id", "embedding", 4, 64)
    narrow = _ivf_assign(emb, "vec_id", "embedding", 4, 64, cent=cent)
    nplan = plan_of(narrow)
    assert "hashpartitioning" not in nplan, nplan  # no shuffle at all
    assert "Aggregate" not in nplan, nplan
    fallback = _ivf_assign(
        emb, "vec_id", "embedding", 4, 64, cent=cent, allow_narrow=False
    )
    fplan = plan_of(fallback)
    agg_lines = [
        ln for ln in fplan.splitlines()
        if "Aggregate" in ln or ln.strip().startswith("Functions")
    ]
    assert agg_lines, fplan
    # no aggregate buffer may mention the vector columns
    assert not any("_cv" in ln or "_ce" in ln for ln in agg_lines), agg_lines
    # kernel parity: identical rows, identical floats
    cols = ["cid", "neighbor_id", "_cv", "_cvn"]
    a = sorted(narrow.select(*cols).collect(), key=lambda r: r["neighbor_id"])
    b = sorted(fallback.select(*cols).collect(), key=lambda r: r["neighbor_id"])
    assert a == b


def test_ivf_narrow_assign_parity_on_computed_vectors(spark):
    """Kernel parity where it is hardest: the corpus vector is a COMPUTED
    column (hash_embed output), so the narrow projection's unrolled
    subscripts reference a derived expression, not a scan attribute —
    exactly the shape the chunk-store builds feed the assign. Rows must
    be bit-identical to the aggregate kernel's."""
    from iodf_spark.operators.similarity import (
        _ivf_assign,
        _ivf_centroids,
        hash_embed,
    )

    docs = load_table(spark, SF, "documents").limit(200)
    emb = hash_embed(docs, "doc_id", "text", dim=16)
    cent = _ivf_centroids(emb, "doc_id", "vec", 4, 16)
    cols = ["cid", "neighbor_id", "_cv", "_cvn"]
    a = sorted(
        _ivf_assign(emb, "doc_id", "vec", 4, 16, cent=cent)
        .select(*cols).collect(),
        key=lambda r: r["neighbor_id"],
    )
    b = sorted(
        _ivf_assign(emb, "doc_id", "vec", 4, 16, cent=cent, allow_narrow=False)
        .select(*cols).collect(),
        key=lambda r: r["neighbor_id"],
    )
    assert a == b


def test_cosine_pairs_is_distributed(spark):
    """The exact-pair path must stay a grid join: its plan ends in
    FlatMapGroupsInPandas over the grid keys — never a driver collect
    (which would not appear in the plan at all, hence also assert the
    full input scan is present under the pandas node)."""
    from iodf_spark.operators.similarity import cosine_pairs

    emb = load_table(spark, SF, "embeddings")
    plan = plan_of(cosine_pairs(emb, "vec_id", "embedding"))
    assert "FlatMapGroupsInPandas" in plan
    assert "Scan parquet" in plan


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Co-bucketed tables equi-join with ZERO Exchange: the write-time
    layout replaces the per-join shuffle of the fact side — the 100 TB
    contract of iodf_spark.sources.bucketed."""
    from iodf_spark.sources.bucketed import open_bucketed, write_bucketed

    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer")
    write_bucketed(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "t_orders_b", ["o_custkey"], 4, path=str(tmp_path / "ob"),
    )
    write_bucketed(
        customer.select("c_custkey", "c_name"),
        "t_customer_b", ["c_custkey"], 4, path=str(tmp_path / "cb"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ob = open_bucketed(spark, "t_orders_b")
        cb = open_bucketed(spark, "t_customer_b")
        joined = ob.join(cb, ob.o_custkey == cb.c_custkey)
        plan = plan_of(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == orders.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_customer_b")


def test_salted_join_equals_plain_join_under_skew(spark):
    """salted_join must be row-for-row equal to the plain join on skewed
    data (one key holding half the rows), and the physical join key must
    include the salt so hot keys spread over n_salts reducers."""
    from iodf_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(1 if i % 2 == 0 else i % 50, i) for i in range(2000)], "k long, v long"
    )
    right = spark.createDataFrame([(k, k * 100) for k in range(50)], "k long, w long")
    plain = sorted(tuple(r) for r in left.join(right, ["k"]).collect())
    salted = salted_join(left, right, ["k"], n_salts=8)
    assert sorted(tuple(r) for r in salted.collect()) == plain
    assert "_salt" not in salted.columns
    plan = plan_of(salted)
    assert "_salt" in plan  # the join really is keyed by (k, _salt)
    # left join preserves unmatched left rows exactly once
    lonly = left.withColumn("k", F.col("k") + 1000)
    lj = salted_join(lonly, right, ["k"], n_salts=4, how="left")
    assert lj.count() == 2000
    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_join(left, right, ["k"], how="full")


def test_resample_scans_events_once(spark):
    """resample_ffill's grain aggregate is checkpointed: the span branch
    and the grid join must share ONE raw-table scan (without it the plan
    re-scans events for each branch — doubled cost at 100 TB)."""
    import __spark_entry__ as m

    df = m.queries()["resample_ffill"](spark, SF)
    plan = plan_of(df)
    # the raw table lives only inside the checkpointed grain subtree
    # (computed once); every outer branch reads the shared RDD instead of
    # re-scanning parquet
    assert plan.count("Scan parquet") == 0, plan
    assert "Scan ExistingRDD" in plan


def test_pivot_is_two_phase_hash_agg(spark):
    """pivot compiles to partial+final hash aggregation with the explicit
    value list — no extra distinct-values job, no sort-based fallback."""
    import __spark_entry__ as m

    plan = plan_of(m.queries()["pivot"](spark, SF))
    assert plan.count("HashAggregate") >= 2
    assert "SortAggregate" not in plan


def test_smart_filter_picks_path_by_selectivity(spark):
    """Access-path selection (operators/access.py): the probe-vs-scan
    decision comes from the index's stored selectivity, the scan path keeps
    its Parquet pushdown, and both physical paths return identical rows."""
    from iodf_spark.operators import index as idx
    from iodf_spark.operators.access import smart_filter
    from iodf_spark.sources.tables import load_table

    li = load_table(spark, SF, "lineitem", row_id=True).cache()
    n = li.count()
    ix = idx.build_index(
        li, idx.IndexConf(include=["l_returnflag", "l_quantity"]), n_rows=n
    ).cache()
    via_index, p1 = smart_filter(li, ix, "l_quantity", 1, n)
    via_scan, p2 = smart_filter(li, ix, "l_returnflag", "R", n)
    assert (p1, p2) == ("index", "scan")
    # scan path: predicate pushed into the Parquet scan (or evaluated over
    # the cached relation); index path: a semi join against posting rows
    assert "LeftSemi" in plan_of(via_index)
    scan_rows = {r["row_id"] for r in via_scan.select("row_id").collect()}
    want_scan = {
        r["row_id"]
        for r in li.filter(F.col("l_returnflag") == "R").select("row_id").collect()
    }
    assert scan_rows == want_scan
    index_rows = {r["row_id"] for r in via_index.select("row_id").collect()}
    want_index = {
        r["row_id"]
        for r in li.filter(F.col("l_quantity") == 1).select("row_id").collect()
    }
    assert index_rows == want_index


LAZY_QUERIES = [
    # every queries() entry whose function builds a plan without driving
    # streams or building segment stores (those are exercised elsewhere);
    # first-touch index caches at sf0.001 are cheap
    "index_distinct_values", "index_stats", "index_probe_rows",
    "bitmap_ops", "rowset_ops", "point_lookup", "costats",
    "q1_pricing_summary", "knn_weights", "knn_topk", "table_view",
    "join_agg", "window_funcs", "topk", "grouping_sets", "pivot",
    "approx_aggregates", "asof_join", "range_join", "events_windowed",
    "resample_ffill", "sessionize", "dedup_exact", "dedup_jaccard",
    "dedup_minhash", "dedup_simhash", "quality_filter", "vocab_topk",
    "text_stats", "profile", "embedding_pairs", "ann_topk",
    "multimodal_meta", "text_search", "contamination", "sequence_pack",
    "stratified_sample", "semi_anti_join", "set_ops",
]


def test_no_cartesian_product_in_any_query_plan(spark):
    """Sweep the lazily-planned driver queries: no plan may contain a
    CartesianProduct (an unbroadcast cross join — the classic silent
    scale-killer). Intended tiny-side conditional joins compile to
    BroadcastNestedLoopJoin, which is allowed; a CartesianProduct of two
    big sides is never."""
    import __spark_entry__ as m

    qs = m.queries()
    bad = {}
    for name in LAZY_QUERIES:
        plan = plan_of(qs[name](spark, SF))
        if "CartesianProduct" in plan:
            bad[name] = True
    assert not bad, f"cartesian products in: {sorted(bad)}"


def test_lsh_candidate_pairs_is_grid_not_join(spark):
    """The LSH scale path must contain NO join operator at all: candidates
    are generated and scored inside per-(bucket, cell) pandas kernels — a
    bucket equi-join would cap parallelism at #buckets and re-evaluate
    interpreted array exprs per pair (the measured 37 s draft)."""
    from iodf_spark.operators.similarity import lsh_candidate_pairs

    emb = load_table(spark, SF, "embeddings")
    plan = plan_of(lsh_candidate_pairs(emb, "vec_id", "embedding", dim=64))
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_trues_after_is_take_ordered(spark):
    """The seek cursor must compile to TakeOrderedAndProject (per-partition
    top-k + k-row driver merge), never a global Sort."""
    from iodf_spark.plans.rowset import PostingSet

    ps = PostingSet.from_positions(spark, [3, 40, 77, 150], 200, 32)
    plan = plan_of(ps.trues_after(41, 2))
    assert "TakeOrderedAndProject" in plan


def test_contamination_broadcasts_benchmark(spark):
    """The corpus side must never shuffle against the benchmark: the
    shingle-membership join is a BroadcastHashJoin with the benchmark's
    distinct hashes on the build side."""
    from iodf_spark.operators.dedup import contamination

    docs = load_table(spark, SF, "documents")
    plan = plan_of(
        contamination(
            docs.filter(F.col("doc_id") % 20 != 0),
            "doc_id",
            "text",
            docs.filter(F.col("doc_id") % 20 == 0),
        )
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sequence_pack_shuffles_counts_not_text(spark):
    """Packing's shuffle must carry token counts, never document text: no
    Exchange node's output may include the text column (it is pruned at
    the scan projection)."""
    import re

    from iodf_spark.operators.packing import sequence_pack

    docs = load_table(spark, SF, "documents")
    plan = plan_of(sequence_pack(docs, "doc_id", "text"))
    assert "Window" in plan
    exchanges = [
        s
        for s in re.split(r"\n(?=\(\d+\) )", plan)
        if s.startswith("(") and "Exchange" in s.split("\n")[0]
    ]
    assert exchanges, "expected at least one Exchange in the packing plan"
    for s in exchanges:
        inp = next(line for line in s.split("\n") if line.startswith("Input"))
        assert "text" not in inp, f"shuffle carries document text: {inp}"


def test_ivf_store_prunes_cell_partitions_and_matches_inflight(spark, tmp_path):
    """The materialized IVF store is partitioned by cell; a probe's scan
    must carry the static cid filter as PartitionFilters (file-level
    pruning — the 100 TB serving layout) and return bit-identical rows to
    the in-flight ann_ivf on the same corpus/params."""
    from iodf_spark.operators.similarity import ann_ivf, ann_ivf_store, ivf_build_store

    emb = load_table(spark, SF, "embeddings")
    path = str(tmp_path / "ivf_store")
    ivf_build_store(emb, "vec_id", "embedding", path, n_centroids=4)
    store_res = ann_ivf_store(
        emb, "vec_id", "embedding", path, [0, 1, 2], n_centroids=4, n_probe=2
    )
    plan = plan_of(store_res)
    assert "PartitionFilters" in plan
    assert "cid" in plan.split("PartitionFilters", 1)[1][:400]
    inflight = ann_ivf(emb, "vec_id", "embedding", [0, 1, 2])
    assert sorted(map(tuple, store_res.collect())) == sorted(
        map(tuple, inflight.collect())
    )
    # file hygiene: the build clusters by cell before the partitioned
    # write, so each inverted-list directory holds ONE data file — not a
    # fragment per assign partition (fan_out would otherwise fan each
    # cell dir 32-ways)
    import glob
    import os

    for cell_dir in glob.glob(os.path.join(path, "cid=*")):
        files = [f for f in os.listdir(cell_dir) if f.endswith(".parquet")]
        assert len(files) == 1, (cell_dir, files)


def test_ivf_append_equals_one_shot_build(spark, tmp_path):
    """Incremental IVF maintenance: build the store from the first half of
    the corpus, ivf_append the second half — cell assignments and probe
    results must be identical to a one-shot build over the full corpus
    (frozen centroids => identical cells), with no rewrite of existing
    rows (append-only delivery)."""
    from pyspark.sql import functions as F

    from iodf_spark.operators.similarity import (
        ann_ivf_store,
        ivf_append,
        ivf_build_store,
    )

    emb = load_table(spark, SF, "embeddings")
    mid = emb.agg(F.expr("percentile_approx(vec_id, 0.5)")).collect()[0][0]
    first, rest = emb.filter(F.col("vec_id") <= mid), emb.filter(F.col("vec_id") > mid)
    inc_path, full_path = str(tmp_path / "ivf_inc"), str(tmp_path / "ivf_full")
    ivf_build_store(first, "vec_id", "embedding", inc_path, n_centroids=4)
    ivf_append(spark, inc_path, rest, "vec_id", "embedding", n_centroids=4)
    ivf_build_store(emb, "vec_id", "embedding", full_path, n_centroids=4)
    inc = sorted(map(tuple, spark.read.parquet(inc_path).collect()))
    full = sorted(map(tuple, spark.read.parquet(full_path).collect()))
    assert inc == full
    q_inc = ann_ivf_store(
        emb, "vec_id", "embedding", inc_path, [0, 1, 2], n_centroids=4, n_probe=2
    )
    q_full = ann_ivf_store(
        emb, "vec_id", "embedding", full_path, [0, 1, 2], n_centroids=4, n_probe=2
    )
    assert sorted(map(tuple, q_inc.collect())) == sorted(map(tuple, q_full.collect()))


def test_ivfpq_append_equals_one_shot_build(spark, tmp_path):
    """Incremental IVF-PQ maintenance: build the codes store from the
    first half of the corpus, ivfpq_append the second half against the
    frozen samples — stored codes, cells, and probe results must be
    identical to a one-shot build over the full corpus."""
    from pyspark.sql import functions as F

    from iodf_spark.operators.similarity import (
        ann_ivfpq_store,
        ivfpq_append,
        ivfpq_build_store,
    )

    emb = load_table(spark, SF, "embeddings")
    mid = emb.agg(F.expr("percentile_approx(vec_id, 0.5)")).collect()[0][0]
    first, rest = emb.filter(F.col("vec_id") <= mid), emb.filter(F.col("vec_id") > mid)
    inc_path, full_path = str(tmp_path / "pq_inc"), str(tmp_path / "pq_full")
    ivfpq_build_store(first, "vec_id", "embedding", inc_path, n_centroids=4, dim=64)
    ivfpq_append(
        spark, inc_path, rest, emb, "vec_id", "embedding", n_centroids=4, dim=64
    )
    ivfpq_build_store(emb, "vec_id", "embedding", full_path, n_centroids=4, dim=64)
    inc = sorted(map(tuple, spark.read.parquet(inc_path).collect()))
    full = sorted(map(tuple, spark.read.parquet(full_path).collect()))
    assert inc == full
    q_inc = ann_ivfpq_store(
        emb, "vec_id", "embedding", inc_path, [0, 1, 2],
        n_centroids=4, n_probe=2, dim=64, rerank=50,
    )
    q_full = ann_ivfpq_store(
        emb, "vec_id", "embedding", full_path, [0, 1, 2],
        n_centroids=4, n_probe=2, dim=64, rerank=50,
    )
    assert sorted(map(tuple, q_inc.collect())) == sorted(map(tuple, q_full.collect()))


def test_ivfpq_residual_parity_and_append(spark, tmp_path):
    """Residual IVF-PQ (IVFADC): the residual-encoded store's probe is
    bit-equal to its DuckDB twin (centroid dot + residual distance table
    + cross terms, fixed-order sums), its store is still codes-only, and
    residual append == residual rebuild."""
    import duckdb

    from pyspark.sql import functions as F

    from iodf_spark.operators.similarity import (
        ann_ivfpq_oracle,
        ann_ivfpq_store,
        ivfpq_append,
        ivfpq_build_store,
    )

    emb = load_table(spark, SF, "embeddings")
    path = str(tmp_path / "rpq")
    ivfpq_build_store(
        emb, "vec_id", "embedding", path, n_centroids=4, dim=64, residual=True
    )
    assert set(spark.read.parquet(path).columns) == {
        "neighbor_id", "code0", "code1", "code2", "code3", "cid"
    }
    got = [
        (r["query_id"], r["rank"], r["neighbor_id"], r["cos"])
        for r in ann_ivfpq_store(
            emb, "vec_id", "embedding", path, [0, 1, 2],
            n_centroids=4, n_probe=2, dim=64, rerank=50, residual=True,
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    exp = con.execute(
        ann_ivfpq_oracle(
            "vec_id", "embedding", "embeddings", [0, 1, 2],
            n_centroids=4, n_probe=2, dim=64, rerank=50, residual=True,
        )
    ).fetchall()
    assert got == [tuple(r) for r in exp]

    mid = emb.agg(F.expr("percentile_approx(vec_id, 0.5)")).collect()[0][0]
    inc_path = str(tmp_path / "rpq_inc")
    ivfpq_build_store(
        emb.filter(F.col("vec_id") <= mid), "vec_id", "embedding", inc_path,
        n_centroids=4, dim=64, residual=True,
    )
    ivfpq_append(
        spark, inc_path, emb.filter(F.col("vec_id") > mid), emb,
        "vec_id", "embedding", n_centroids=4, dim=64, residual=True,
    )
    inc = sorted(map(tuple, spark.read.parquet(inc_path).collect()))
    full = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert inc == full


def test_ivfpq_store_prunes_cells_and_scans_codes_only(spark, tmp_path):
    """The composed IVF-PQ store compounds BOTH prunes: the probe's codes
    scan must carry the static cid filter as PartitionFilters (file-level
    pruning) AND its ReadSchema must be the codes columns only — the
    store holds no float vectors, so the scan width is m_subspaces ints,
    not dim floats. The rerank stage is the only float reader. Results
    must be bit-identical to the DuckDB oracle (attested at sf0.01 by the
    driver; pinned here at sf0.001 for the suite)."""
    import duckdb

    from iodf_spark.operators.similarity import (
        ann_ivfpq_oracle,
        ann_ivfpq_store,
        ivfpq_build_store,
    )

    emb = load_table(spark, SF, "embeddings")
    path = str(tmp_path / "ivfpq_store")
    ivfpq_build_store(emb, "vec_id", "embedding", path, n_centroids=4, dim=64)
    # store schema: codes only, no float vectors
    store_cols = set(spark.read.parquet(path).columns)
    assert store_cols == {"neighbor_id", "code0", "code1", "code2", "code3", "cid"}

    res = ann_ivfpq_store(
        emb, "vec_id", "embedding", path, [0, 1, 2],
        n_centroids=4, n_probe=2, dim=64, rerank=50,
    )
    plan = plan_of(res)
    assert "PartitionFilters" in plan
    assert "cid" in plan.split("PartitionFilters", 1)[1][:400]
    # the pruned store scan reads codes, never an embedding column (the
    # scan is located by its PartitionFilters — the corpus scans have none)
    store_scan = next(
        seg for seg in plan.split("FileScan") if "PartitionFilters: [" in seg
        and "cid" in seg.split("PartitionFilters", 1)[1][:200]
    )
    schema = store_scan.split("ReadSchema:", 1)[1].split("\n", 1)[0]
    assert "code0" in schema and "embedding" not in schema

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    exp = con.execute(
        ann_ivfpq_oracle(
            "vec_id", "embedding", "embeddings", [0, 1, 2],
            n_centroids=4, n_probe=2, dim=64, rerank=50,
        )
    ).fetchall()
    got = [
        (r["query_id"], r["rank"], r["neighbor_id"], r["cos"]) for r in res.collect()
    ]
    assert got == [tuple(r) for r in exp]


def test_tombstone_anti_join_broadcasts_small_dead_set(spark, tmp_path):
    """A takedown's read-side anti join must BROADCAST the (small) dead-id
    set — a shuffled anti join would re-partition the 100 TB corpus to
    subtract a few thousand ids. The shuffled path is reserved for dead
    sets past the broadcast budget (threshold in _apply_tombstones)."""
    from iodf_spark.sources.segments import SegmentStore

    store = SegmentStore(str(tmp_path / "s"))
    store.write_segment(
        spark.createDataFrame([(i,) for i in range(500)], "k long"),
        order_keys=["k"],
    )
    store.delete_where(spark, "k % 7 = 0")
    plan = plan_of(store.open(spark))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_store_planner_index_path_semi_joins_posting_ids(spark, tmp_path):
    """smart_filter's index route: the data side is row_id-semi-joined
    against posting ids (LeftSemi), never filtered by a Python-side id
    collection; the pushed scan route keeps the predicate in the Parquet
    scan's PushedFilters."""
    from iodf_spark.operators.index import IndexConf
    from iodf_spark.sources.segments import SegmentStore

    store = SegmentStore(str(tmp_path / "s2"), bucket_size=1024)
    store.write_segment(
        spark.createDataFrame(
            [(i, f"t{i % 50}") for i in range(2000)], "k long, tag string"
        ),
        order_keys=["k"],
        index_conf=IndexConf(include=["tag"]),
    )
    rows, plan_report = store.smart_filter(spark, "tag", "t3", threshold=0.5)
    assert plan_report["path"] == "index"
    plan = plan_of(rows)
    assert "LeftSemi" in plan
    rows_scan, report_scan = store.smart_filter(spark, "tag", "t3", threshold=0.001)
    assert report_scan["path"] == "scan"
    scan_plan = plan_of(rows_scan)
    assert "PushedFilters" in scan_plan and "t3" in scan_plan


def test_ann_ranking_uses_window_group_limit(spark, sf_dir):
    """Round-9 verdict #7 (bounded-state top-k): the per-query
    `row_number() <= k` ranking must NOT materialize a full per-query
    sort across the shuffle. Catalyst's WindowGroupLimit rewrite gives
    the bounded shape for free — a PARTIAL group-limit before the
    exchange caps each map partition's contribution at k rows per query
    (so the shuffle carries Q*k*partitions rows, not all candidates) and
    a FINAL group-limit after it; per-partition sorts are spill-safe.
    This pin turns a silent Catalyst regression (e.g. a filter shape the
    rewrite stops recognizing) into a red test."""
    from iodf_spark.operators.similarity import (
        ann_brute_force,
        ann_ivf,
        ann_pq,
    )
    from iodf_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    for df in (
        ann_brute_force(emb, "vec_id", "embedding", [0, 1, 2], dim=64),
        ann_ivf(emb, "vec_id", "embedding", [0, 1, 2], dim=64),
        # the ADC rank window (and through it the store probes, which
        # share _pq_adc_rank) — all four ranking sites the round-8
        # verdict named must carry the group limit
        ann_pq(emb, "vec_id", "embedding", [0, 1, 2], dim=64),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("WindowGroupLimit") >= 2, (
            "expected two-phase (Partial+Final) WindowGroupLimit in the "
            "top-k ranking plan:\n" + plan[:2000]
        )
        assert "Partial" in plan.split("WindowGroupLimit")[2][:200] or \
               "Partial" in plan, "partial (map-side) group limit missing"


def test_delete_aware_probe_keeps_pruned_codes_only_plan(spark, tmp_path):
    """Round 9: a PENDING deletion list must not cost the probe its two
    plan-pinned properties — the codes scan keeps its cid
    PartitionFilters and codes-only ReadSchema, and the deletion list
    joins as a BROADCAST LeftAnti (never a shuffle of the codes). Also
    pins that the deletes-side scan reads only neighbor_id+cid."""
    from iodf_spark.operators.ann_maintenance import ann_apply_deletes
    from iodf_spark.operators.similarity import ann_ivfpq_store, ivfpq_build_store

    emb = load_table(spark, SF, "embeddings")
    path = str(tmp_path / "ivfpq_store")
    ivfpq_build_store(emb, "vec_id", "embedding", path, n_centroids=4, dim=64)
    ids = spark.createDataFrame([(101,), (102,)], "vec_id long")
    assert ann_apply_deletes(spark, path, ids) == 2

    res = ann_ivfpq_store(
        emb, "vec_id", "embedding", path, [0, 1, 2],
        n_centroids=4, n_probe=2, dim=64, rerank=50,
    )
    plan = plan_of(res)
    # the deleted ids are really gone from the results
    got = {r["neighbor_id"] for r in res.collect()}
    assert got.isdisjoint({101, 102})
    # pruned codes scan survives, codes-only width
    store_scan = next(
        seg for seg in plan.split("FileScan") if "PartitionFilters: [" in seg
        and "cid" in seg.split("PartitionFilters", 1)[1][:200]
        and "code0" in seg.split("ReadSchema:", 1)[1].split("\n", 1)[0]
    )
    assert "embedding" not in store_scan.split("ReadSchema:", 1)[1].split("\n", 1)[0]
    # the anti-join is broadcast — the codes never shuffle to meet the list
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_substring_dedup_stream_never_shuffles_text(spark):
    """Round 10 (ExactSubstr): the duplicated-window detector's shuffles
    must carry only (_id, _pos, hash) — token/document TEXT stays in the
    map stage that hashed it. Also pins the dup-window filter as a
    LeftSemi join (never an inner join materializing occurrence pairs,
    which is quadratic in hot-window frequency)."""
    from iodf_spark.operators.dedup import duplicated_spans, substring_dedup_clean

    docs = load_table(spark, SF, "documents")
    plan = plan_of(duplicated_spans(docs, "doc_id", "text", k=16))
    assert "LeftSemi" in plan, "dup-window filter must be a semi join"
    for seg in plan.split("Exchange hashpartitioning(")[1:]:
        keys = seg.split(")", 1)[0]
        assert "_txt" not in keys and "text" not in keys and "_t#" not in keys, (
            "text column leaked into a shuffle key:\n" + keys
        )
    # clean variant: text may travel ONCE (the reassembly contains it) but
    # the window/keeper/island shuffles stay hash-only
    plan2 = plan_of(substring_dedup_clean(docs, "doc_id", "text", k=16))
    n_text_exch = sum(
        1
        for seg in plan2.split("Exchange hashpartitioning(")[1:]
        if "_toks" in seg.split("\n", 1)[0]
    )
    assert n_text_exch <= 1, "token arrays shuffled more than once"


def test_contaminated_spans_broadcasts_benchmark(spark):
    """Substring-grain decon: the benchmark's window identities must meet
    the corpus stream as a BROADCAST LeftSemi — a shuffled semi join
    would move the 100 TB corpus stream to meet a MB-scale benchmark."""
    from iodf_spark.operators.dedup import contaminated_spans

    docs = load_table(spark, SF, "documents")
    plan = plan_of(
        contaminated_spans(
            docs.filter(F.col("doc_id") % 20 != 0),
            "doc_id",
            "text",
            docs.filter(F.col("doc_id") % 20 == 0),
            k=8,
        )
    )
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan, "benchmark side must broadcast"
    # and no text column in any shuffle key (inherited detector property)
    for seg in plan.split("Exchange hashpartitioning(")[1:]:
        keys = seg.split(")", 1)[0]
        assert "text" not in keys and "_txt" not in keys


def test_chunkvec_chain_never_shuffles_chunk_text(spark):
    """Round 11 (chunk-grain retrieval): chunk -> hash_embed -> cosine ->
    doc-grain top-k must keep chunk TEXT out of every shuffle key (the
    embed explodes to (id, token-hash) pairs — narrow by design; chunking
    itself is shuffle-free), and the final doc ranking must be a
    TakeOrdered, never a global sort."""
    from iodf_spark.operators.packing import chunk_documents
    from iodf_spark.operators.similarity import ann_brute_force, hash_embed

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    ch = chunk_documents(docs, "doc_id", "text", chunk_toks=64, overlap=8)
    cids = ch.select(
        (F.col("doc_id") * F.lit(1_000_000) + F.col("chunk_idx")).alias("cid"),
        "chunk_text",
    )
    emb = hash_embed(cids, "cid", "chunk_text", dim=8)
    hits = ann_brute_force(
        emb, "cid", "vec", [], k=1_000_000_000, dim=8,
        query_vecs={-1: [1.0] + [0.0] * 7},
    )
    ranked = (
        hits.select(
            F.expr("cast(neighbor_id div 1000000 as bigint)").alias("row_id"),
            "cos",
        )
        .groupBy("row_id")
        .agg(F.max("cos").alias("score"))
        .orderBy(F.col("score").desc(), F.col("row_id"))
        .limit(15)
    )
    plan = plan_of(ranked)
    for seg in plan.split("Exchange hashpartitioning(")[1:]:
        keys = seg.split(")", 1)[0]
        assert "chunk_text" not in keys and "text" not in keys and "_toks" not in keys, (
            "chunk text leaked into a shuffle key:\n" + keys
        )
    assert "TakeOrderedAndProject" in plan, "doc top-k must be TakeOrdered"
