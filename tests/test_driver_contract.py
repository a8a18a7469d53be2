"""Driver-contract pins: the shape rules of __spark_entry__ that past
rounds broke silently.

* The correctness gate attests only the FIRST 50 queries() entries —
  round 2 shipped 60 and the tail was dropped without any error. The cap
  test turns the next accidental overflow into a red test instead.
* Every query must have an oracle (the round-4 state: zero rows-only
  checks); an orphan oracle means a renamed query lost its attestation.
"""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod

ATTESTATION_CAP = 50


def test_queries_within_attestation_cap():
    q = entrymod.queries()
    assert len(q) <= ATTESTATION_CAP, (
        f"{len(q)} queries() entries — the driver attests only the first "
        f"{ATTESTATION_CAP}; consolidate into tagged unions (see round-2/4 "
        "history) instead of exceeding the cap"
    )


def test_every_query_has_an_oracle_and_vice_versa():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(q) == set(o), (
        f"missing oracles: {sorted(set(q) - set(o))}; "
        f"orphan oracles: {sorted(set(o) - set(q))}"
    )


def test_all_queries_are_callables():
    for name, fn in entrymod.queries().items():
        assert callable(fn), name


def test_segments_compact_arm_inventory_is_stable():
    """segments_compact is the consolidation vehicle for the store's
    attested lifecycle (the 50-entry cap forces arms, not new queries —
    see round-4/5 history): every arm must stay present in BOTH the
    Spark query source and its oracle SQL, or a capability silently
    loses its attestation."""
    import inspect

    arms = [
        "compact", "have", "snapshot", "pruned", "tiered", "sketch",
        "zorder", "delete", "del_snap", "cdf", "cdf_stream", "mirror",
        "store_point", "store_all", "store_any", "merge", "purge",
    ]
    src = inspect.getsource(entrymod._segments_compact_arms)
    osql = entrymod.oracle_sql()["segments_compact"]
    for arm in arms:
        assert f'"{arm}"' in src or f"'{arm}'" in src, f"arm {arm} gone from query"
        assert f"'{arm}'" in osql, f"arm {arm} gone from oracle"
    # the bench arm factory must expose exactly these arms, in lifecycle
    # order (delete before cdf before purge — the thunks share state)
    assert [a for a, _ in _arm_names("segments_compact")] == arms


def _arm_names(qname):
    """(name, thunk) pairs from the bench_arms factory WITHOUT running
    the thunks (no SparkSession in this pure-contract test)."""
    factory = entrymod.bench_arms()[qname]
    return factory(None, "/nonexistent")


def test_bench_arm_factories_cover_their_query_variants():
    """Every consolidated bench cell's arm list stays in sync with its
    query's tagged union — a renamed/dropped arm must fail here, not
    silently vanish from the bench sub-timings. Factories are
    side-effect-free (lazy table/index access), so enumerating arm names
    needs no SparkSession."""
    # round 9: ivf4/pq16 retired (bit-identical to ivf4_store / subsumed
    # by pq16_rr, both pytest-pinned); del_sync/del_compact/rebuilt added
    # (the delete-propagation lifecycle — ordered, thunks share state)
    assert [a for a, _ in _arm_names("ann_topk")] == [
        "brute", "lsh_single", "lsh_multi", "ivf64_t", "ivf4_store",
        "pq16t_rr", "ivfpq_rr", "extq", "ivfpq_res",
        "del_sync", "del_compact", "rebuilt",
    ]
    assert [a for a, _ in _arm_names("index_probe_rows")] == [
        "probe", "auto_index", "auto_scan", "auto_multi", "auto_any",
        "auto_any_range", "seek0", "mid", "tail",
    ]
    # round-8 additions: the multi-variant pipeline cells (every round one
    # grew an arm and false-tripped the cell-level gate)
    # round 10: substring granularity (ExactSubstr) joins the exact-dedup
    # cell — spans (duplicated-run detection), sstream (the incremental
    # stream == batch path), sclean (materialized cut)
    assert [a for a, _ in _arm_names("dedup_exact")] == [
        "doc", "line", "clean", "spans", "sstream", "sclean",
    ]
    assert [a for a, _ in _arm_names("dedup_jaccard")] == [
        "shingle", "winnow", "capped",
    ]
    assert [a for a, _ in _arm_names("dedup_minhash")] == [
        "batch", "stream", "capped",
    ]
    assert [a for a, _ in _arm_names("embedding_pairs")] == ["vec", "hashdoc"]
    assert [a for a, _ in _arm_names("embedding_clusters")] == [
        "ann", "exact", "semdedup", "semdedup2", "semdedup_t",
    ]
    # round 11: the decon cell gains its streaming twin — sdecon (the
    # stateless stream-static broadcast path, stream == batch per doc)
    assert [a for a, _ in _arm_names("contamination")] == [
        "ngram", "spans", "clean", "sdecon",
    ]
    # round 12: chunk retrieval routed through the cell-partitioned IVF
    # store (chunkivf) joins the retrieval cell next to its brute-force
    # exact twin (chunkvec) — same doc-grain best-chunk semantics,
    # cell-pruned file-level reads. Round 13: the MAINTAINED store
    # (chunksync — seed half, change-feed sync half; delta == rebuild
    # exact, so the one-shot build's oracle is its twin too)
    assert [a for a, _ in _arm_names("text_search")] == [
        "probe", "bm25", "phrase", "prefix", "rrf", "semvec",
        "chunkvec", "chunkivf", "chunksync",
    ]


def test_segments_compact_arm_budget():
    """Pinned arm budget for the consolidated store-lifecycle cell
    (round-7 VERDICT: 17 arms ≈ 20 s, 22% of the bench, 'still growing').
    The 50-entry attestation cap forces consolidation INTO this cell, so
    growth must stay deliberate: adding an arm past the budget requires
    either retiring one (compaction-era arms that a newer arm subsumes)
    or consciously raising this number WITH a bench-weight justification
    in the commit. 18 = the current 17 + one slot of headroom."""
    assert len(_arm_names("segments_compact")) <= 18, (
        "segments_compact arm budget exceeded — retire an arm or raise "
        "the budget with a bench-weight rationale (the cell is already "
        "the most expensive in bench.py)"
    )


def test_ann_topk_arm_budget():
    """Pinned arm budget for the consolidated ANN cell — the most
    expensive bench cell (the segments_compact lesson, round-7 VERDICT).
    Round 9 spent the budget deliberately: ivf4 and pq16 retired
    (bit-identical / subsumed — pytest parity pins keep their coverage),
    and the three delete-propagation lifecycle arms added
    (del_sync/del_compact/rebuilt — a SegmentStore corpus, its change
    feed, and an IVF store maintained off it; ~15 s of genuinely new
    attested lifecycle work, the same weight class as segments_compact's
    17 lifecycle arms). Growth past the budget requires retiring a
    subsumed arm or raising this number with a bench-weight rationale.
    Note the cell ALSO has a hard external ceiling: every arm's plan is
    localCheckpointed inside q_ann_topk because the driver's vanilla 1g
    session OOMs on the lazy many-arm union (see q_ann_topk) — arms are
    cheap to run but NOT free to stack."""
    assert len(_arm_names("ann_topk")) <= 12, (
        "ann_topk arm budget exceeded — retire a subsumed arm (the "
        "ivf4/pq16 retirement analysis in round 9 is the template) "
        "or raise the budget with a bench-weight rationale"
    )
