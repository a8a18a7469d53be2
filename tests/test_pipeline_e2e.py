"""End-to-end composition: the operators chained into the actual
training-data pipeline shape this engine exists for —

    near-dup clusters -> canonical survivors -> quality gate ->
    language-stratified sampling -> indexed segment-store ingest ->
    BM25 retrieval over the curated corpus

Each stage consumes the previous stage's DataFrame lazily (one logical
graph until the segment write materializes it), which is exactly how the
100 TB deployment composes: no intermediate collects, every boundary a
semi join on ids.
"""

from pyspark.sql import functions as F

from iodf_spark.operators import index as idx
from iodf_spark.operators.dedup import dedup_clusters
from iodf_spark.operators.sampling import stratified_sample
from iodf_spark.operators.search import bm25_topk
from iodf_spark.operators.textstats import quality_filter, text_stats
from iodf_spark.sources.segments import SegmentStore
from iodf_spark.sources.tables import load_table


def test_training_pipeline_composition(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    # 1. near-duplicate clusters; keep one canonical doc per cluster
    survivors = dedup_clusters(docs, "doc_id", "text").filter("keep")
    deduped = docs.join(survivors.select("doc_id"), "doc_id", "left_semi")
    n_dedup = deduped.count()
    assert 0 < n_dedup <= n_docs

    # 2. quality gate (token floor, punctuation ceiling, composite score)
    passed = quality_filter(deduped, "doc_id", "text").filter("keep")
    curated = deduped.join(passed.select("doc_id"), "doc_id", "left_semi")
    n_curated = curated.count()
    assert 0 < n_curated <= n_dedup

    # 3. deterministic language-stratified downsampling
    stats = text_stats(curated, "doc_id", "text")
    kept = stratified_sample(
        stats, "doc_id", "lang_pred", {"en": 0.5, "de": 0.5}, default_rate=1.0
    )
    final = curated.join(kept.select("doc_id"), "doc_id", "left_semi")
    n_final = final.count()
    assert 0 < n_final <= n_curated
    # determinism: the same pipeline selects the same rows again
    kept2 = stratified_sample(
        stats, "doc_id", "lang_pred", {"en": 0.5, "de": 0.5}, default_rate=1.0
    )
    assert sorted(r["doc_id"] for r in kept.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in kept2.select("doc_id").collect()
    )

    # 4. land the curated corpus as an indexed segment store
    store = SegmentStore(str(tmp_path / "curated"), bucket_size=1024)
    store.write_segment(
        final,
        order_keys=["doc_id"],
        index_conf=idx.IndexConf(
            include=["text"], analyzers={"text": idx.text_analyzer}
        ),
    )
    opened = store.open(spark)
    assert opened.count() == n_final == store.total_rows()
    assert opened.filter("row_id < 0 OR row_id >= " + str(n_final)).count() == 0

    # 5. ranked retrieval over the curated store via its own index
    ix = store.open_index(spark)
    hits = bm25_topk(
        opened, ix, "text", ["spark", "query"], n_final, k=5,
        bucket_size=store.bucket_size,
    )
    got = hits.collect()
    assert 0 < len(got) <= 5
    assert all(r["score"] > 0 for r in got)
    valid_ids = {r["row_id"] for r in opened.select("row_id").collect()}
    assert {r["row_id"] for r in got} <= valid_ids
    # every hit really contains a query term
    hit_docs = opened.join(
        hits.select("row_id"), "row_id", "left_semi"
    ).select("text").collect()
    assert all(
        ("spark" in r["text"].split()) or ("query" in r["text"].split())
        for r in hit_docs
    )


def test_bm25_dense_term_nondefault_bucket(spark, tmp_path):
    """A query term present in MOST documents stores DENSE posting words;
    dense decode is the one path that depends on bucket size (position =
    bucket*bucket_size + word*64 + bit). A default-bucket decode against
    this 256-bucket store silently yields garbage candidate ids — low-df
    terms mask it (sparse arrays carry literal ids), so pin the dense
    case explicitly."""
    from iodf_spark.operators.search import bm25_topk
    from iodf_spark.sources.segments import SegmentStore

    docs = spark.createDataFrame(
        [
            (i, "common " * 3 + (f"needle{i % 7} " if i % 2 else "hay "))
            for i in range(600)
        ],
        "doc_id long, text string",
    )
    store = SegmentStore(str(tmp_path / "s"), bucket_size=256)
    store.write_segment(
        docs,
        order_keys=["doc_id"],
        index_conf=idx.IndexConf(
            include=["text"], analyzers={"text": idx.text_analyzer}
        ),
    )
    opened = store.open(spark)
    n = store.total_rows()
    ix = store.open_index(spark)
    # 'common' appears in every doc -> dense words; candidates must be
    # REAL row ids (the join keeps them in [0, n))
    hits = bm25_topk(
        opened, ix, "text", ["common", "needle3"], n, k=10,
        bucket_size=store.bucket_size,
    ).collect()
    assert hits, "dense-term candidates vanished"
    assert all(0 <= r["row_id"] < n for r in hits)
    # needle3 docs dominate the ranking (higher idf term present)
    top = {r["row_id"] for r in hits}
    needled = {
        r["row_id"] for r in opened.filter("text like '%needle3%'").collect()
    }
    assert top <= needled
