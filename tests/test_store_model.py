"""Model-based store check: random WRITE-PATH op sequences (append,
delete, compact, compact_tiered, purge, vacuum) run against both the
real SegmentStore and a trivial Python model (a list of (key, live)
pairs). After every op the store must agree with the model on the live
relation, the id space, and the metadata counters — the lifecycle
interleavings (delete-then-compact, purge-then-append,
vacuum-mid-history, ...) are exactly where LSM stores corrupt, and
enumerating them by hand misses the tail (the reference pins its own
lifecycle edges the same way: BitsTest/store tests sweep generated op
grids).

Hypothesis drives the sequence; examples are kept short because every op
is a real Spark job. Determinism: derandomized profile, fixed seeds.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from iodf_spark.sources.segments import SegmentStore

# op vocabulary: (name, arg-strategy)
OPS = st.one_of(
    st.tuples(st.just("append"), st.integers(1, 25)),
    st.tuples(st.just("delete_mod"), st.integers(2, 5)),
    st.tuples(st.just("delete_ids"), st.integers(1, 8)),
    st.tuples(st.just("compact"), st.just(None)),
    st.tuples(st.just("tiered"), st.integers(2, 3)),
    st.tuples(st.just("purge"), st.just(None)),
    st.tuples(st.just("vacuum"), st.just(None)),
)


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(st.lists(OPS, min_size=3, max_size=7))
def test_store_matches_model_after_every_op(spark, tmp_path_factory, ops):
    store = SegmentStore(str(tmp_path_factory.mktemp("model") / "s"))
    model = []  # [(k, live)] in row_id order; purge drops dead entries
    next_k = 0
    epoch = 0  # expected renumber epoch: bumped only by an effective purge

    for op, arg in ops:
        if op == "append":
            rows = [(next_k + i,) for i in range(arg)]
            store.write_segment(
                spark.createDataFrame(rows, "k long"), order_keys=["k"]
            )
            model += [(k, True) for (k,) in rows]
            next_k += arg
        elif op == "delete_mod":
            if not model:  # predicate column doesn't exist in an empty store
                continue
            store.delete_where(spark, f"k % {arg} = 0")
            model = [(k, live and k % arg != 0) for k, live in model]
        elif op == "delete_ids":
            if not model:
                continue
            # the SET-driven twin: first `arg` live keys via delete_rows
            victims = [k for k, live in model if live][:arg]
            store.delete_rows(
                spark,
                spark.createDataFrame([(k,) for k in victims] or [(-1,)], "k long"),
                on="k",
            )
            model = [(k, live and k not in victims) for k, live in model]
        elif op == "compact":
            store.compact(spark)  # ids invariant, tombstones carried
        elif op == "tiered":
            store.compact_tiered(spark, fanout=arg)
        elif op == "purge":
            if any(not live for _, live in model):
                epoch += 1  # an effective purge renumbers; a no-op doesn't
            store.purge(spark)
            model = [(k, True) for k, live in model if live]
        elif op == "vacuum":
            store.vacuum(keep_last=1)

        got = (
            sorted(
                (r["row_id"], r["k"])
                for r in store.open(spark).select("row_id", "k").collect()
            )
            if store.manifest()
            else []
        )
        want = sorted(
            (i, k)
            for i, (k, live) in enumerate(model)
            if live
        )
        assert got == want, f"after {op}({arg}): store != model"
        assert store.live_rows() == len(want)
        assert store.total_rows() == len(model)
        d = store.describe()
        assert d["live_rows"] == len(want)
        assert d["n_rows"] == len(model)
        assert d["renumber_epoch"] == epoch
