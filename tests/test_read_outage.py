"""READ-outage crash sweeps (round-13 verdict #2): the round-12 crash
model injected failures on PUT/DELETE only, so a service failure mid-PLAN
— GET/HEAD/LIST dying while a store loads manifests, plans a probe, or
ages retention windows — was unproven. These sweeps kill the strict
in-memory service at EVERY read index of each read path and require LOUD
propagation: an operation either raises (the outage surfaces) or returns
the exact correct result (it finished its reads before the injected
index). The failure class being hunted is empty-on-error — a swallowed
read that masquerades as no-data (the `_read_sink_or_empty` bug ADVICE
caught in round 11), whose maintenance-side twin is worse: an UNKNOWN age
or an UNREADABLE history file silently aging retained state into
deletion. The narrow-catch fixes these sweeps pinned:

* segments.SegmentStore.reconcile's ``aged()`` returned True (sweep it!)
  on ANY OSError — a read outage bypassed the grace window;
* segments.SegmentStore.vacuum's retention suppressed OSError — an
  outage dropped in-window versions from the keep set;
* ann_maintenance._manifest_commit's history pruning deleted files whose
  committed_at could not be read;
* ann_maintenance.ann_vacuum's spare-set scan treated any OSError as
  'nothing to spare', shrinking the concurrent-reader safety net.

All four now propagate non-not-found read errors; only genuinely
vanished files (FileNotFoundError — pruned between LIST and GET) stay
silent, because removing the already-gone is a no-op, not data loss.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from iodf_spark.operators.ann_maintenance import ann_apply_deletes
from iodf_spark.sources import fsio
from iodf_spark.sources.segments import SegmentStore


class FaultyReadStrictService(fsio.StrictObjectStore):
    """Strict in-memory service whose READ surface (GET/HEAD/LIST/exists)
    dies after N read operations. Mutations always succeed — this models
    the read-degraded outage (throttled LIST, GET 503s) that the
    mutation-side FaultyStrictService cannot reach. ``fail_after=None``
    counts without failing (the dry run that learns a path's read
    schedule); the injected error is a plain OSError, deliberately NOT
    FileNotFoundError, so narrow not-found catches pass it through and
    anything broader is caught by the sweep."""

    def __init__(self, fail_after=None):
        super().__init__()
        self.fail_after = fail_after
        self.reads = 0

    def _tick(self):
        self.reads += 1
        if self.fail_after is not None and self.reads > self.fail_after:
            raise OSError("injected read outage")

    def get(self, key):
        self._tick()
        return super().get(key)

    def head(self, key):
        self._tick()
        return super().head(key)

    def list_keys(self, prefix_dir):
        self._tick()
        return super().list_keys(prefix_dir)

    def exists(self, key):
        self._tick()
        return super().exists(key)


def _sweep(svc, op, expected, label):
    """Run ``op`` once per read index: at every k < R (the dry-run read
    count) the op must either raise or produce the exact correct result —
    never a silently wrong/empty one."""
    svc.fail_after, svc.reads = None, 0
    assert op() == expected  # dry run, also learns the read schedule
    n_reads = svc.reads
    assert n_reads >= 1, f"{label}: no seam reads at all?"
    for k in range(n_reads):
        svc.fail_after, svc.reads = k, 0
        try:
            got = op()
        except Exception:
            continue  # loud propagation: the contract
        assert got == expected, (
            f"{label}: silent wrong answer with reads failing after {k}"
        )
    svc.fail_after = None


@pytest.fixture()
def strict(tmp_path):
    svc = FaultyReadStrictService()
    with fsio.using_backend(fsio.StrictObjectStoreBackend(svc)):
        yield svc, str(tmp_path)


def test_corpus_read_paths_raise_loudly_under_read_outage(spark, strict):
    """SegmentStore manifest loads (pointer + doc + versions + live-row
    math) under a read outage: loud or exactly right, never a torn or
    empty snapshot."""
    svc, root = strict
    path = os.path.join(root, "corpus")
    store = SegmentStore(path)
    for lo, hi in [(0, 10), (10, 25)]:
        store.write_segment(
            spark.createDataFrame(
                [(i, i * 3) for i in range(lo, hi)], "k long, v long"
            ),
            order_keys=["k"],
        )
    store.delete_where(spark, "k >= 20")

    def op():
        s = SegmentStore(path)  # fresh instance: no memoized metadata
        rows = tuple(sorted(r["k"] for r in s.open(spark).collect()))
        return (rows, s.versions()[-1], s.live_rows())

    expected = (tuple(list(range(20))), 3, 20)
    _sweep(svc, op, expected, "corpus-open")


def test_ann_probe_and_describe_raise_loudly_under_read_outage(spark, strict):
    """The ANN serving path (manifest snapshot resolve, deletion-list
    read, centroid + serving sidecar loads, describe's metadata sweep)
    under a read outage: loud or exactly right."""
    from iodf_spark.operators.ann_maintenance import (
        ann_manifest_init,
        ann_store_describe,
        ann_tune_n_probe,
    )
    from iodf_spark.operators.similarity import ann_ivf_store, ivf_build_store

    svc, root = strict
    path = os.path.join(root, "ann")
    vecs = spark.createDataFrame(
        [(i, [1.0 * (i % 4 == j) + 0.1 * i for j in range(4)]) for i in range(16)],
        "vid bigint, vec array<double>",
    )
    ivf_build_store(vecs, "vid", "vec", path, n_centroids=4, dim=4)
    ann_manifest_init(path)
    ann_apply_deletes(
        spark, path, spark.createDataFrame([(15,)], "vid bigint")
    )
    ann_tune_n_probe(spark, path, k=3, recall_target=0.8)

    def op():
        probe = ann_ivf_store(
            vecs, "vid", "vec", path, [4, 5], k=3, n_centroids=4,
            n_probe="auto", dim=4,
        )
        desc = ann_store_describe(spark, path)
        return (
            tuple(sorted((r["query_id"], r["rank"], r["neighbor_id"])
                         for r in probe.collect())),
            desc["n_rows"], desc["pending_deletes"],
            desc["serving"]["n_probe"],
            desc["serving_staleness"]["versions_since_tune"],
        )

    svc.fail_after = None
    expected = op()
    assert expected[1] == 16 and expected[2] == 1
    _sweep(svc, op, expected, "ann-probe+describe")


def test_reconcile_grace_window_survives_read_outage(spark, strict):
    """The pinned fix: reconcile's orphan-age check must NEVER treat an
    unreadable age as 'aged'. Under a full read-index sweep, a FRESH
    orphan inside the grace window survives every outage point — the op
    either raises or sweeps nothing."""
    svc, root = strict
    path = os.path.join(root, "corpus")
    store = SegmentStore(path)
    store.write_segment(
        spark.createDataFrame([(1, 1)], "k long, v long"), order_keys=["k"]
    )
    # a fresh orphan: claimed dir + a data file, referenced by no manifest
    orphan = os.path.join(path, "seg-00099")
    fsio.claim_dir(orphan)
    fsio.atomic_write_text(os.path.join(orphan, "data.parquet"), "x")

    svc.fail_after, svc.reads = None, 0
    assert SegmentStore(path).reconcile(grace_seconds=3600) == []
    n_reads = svc.reads
    for k in range(n_reads):
        svc.fail_after, svc.reads = k, 0
        try:
            removed = SegmentStore(path).reconcile(grace_seconds=3600)
            assert removed == []
        except Exception:
            pass  # loud is fine
        svc.fail_after = None
        assert fsio.exists(os.path.join(orphan, "data.parquet")), (
            f"grace-window orphan swept under read outage at read {k}"
        )


def test_vacuum_retention_survives_read_outage(spark, strict):
    """The pinned fix: vacuum(min_age_seconds) must never drop an
    in-window version because its age could not be read. Every version is
    in-window here, so across the full read sweep the version set must
    be intact afterwards — raise or no-op, never a silent drop."""
    svc, root = strict
    path = os.path.join(root, "corpus")
    store = SegmentStore(path)
    for lo, hi in [(0, 5), (5, 10), (10, 15)]:
        store.write_segment(
            spark.createDataFrame(
                [(i, i) for i in range(lo, hi)], "k long, v long"
            ),
            order_keys=["k"],
        )
    svc.fail_after, svc.reads = None, 0
    all_vs = SegmentStore(path).versions()
    assert SegmentStore(path).vacuum(keep_last=1, min_age_seconds=3600) == []
    n_reads = svc.reads
    for k in range(n_reads):
        svc.fail_after, svc.reads = k, 0
        try:
            SegmentStore(path).vacuum(keep_last=1, min_age_seconds=3600)
        except Exception:
            pass
        svc.fail_after = None
        assert SegmentStore(path).versions() == all_vs, (
            f"in-window version dropped under read outage at read {k}"
        )
        assert sorted(
            r["k"] for r in SegmentStore(path).open(spark).collect()
        ) == list(range(15))


def test_ann_vacuum_spare_set_survives_read_outage(spark, strict):
    """The pinned fix: ann_vacuum's concurrent-reader spare set is
    derived from manifest history reads — an outage there must abort the
    vacuum, never shrink the set. With every manifest version in-window,
    no file referenced by ANY version may be reclaimed at any outage
    point (compaction first creates real stale files to tempt it)."""
    from iodf_spark.operators.ann_maintenance import (
        ann_compact_deletes,
        ann_manifest_init,
        ann_manifest_read,
        ann_vacuum,
    )
    from iodf_spark.operators.similarity import ivf_build_store

    svc, root = strict
    path = os.path.join(root, "ann")
    vecs = spark.createDataFrame(
        [(i, [1.0 * (i % 4 == j) + 0.1 * i for j in range(4)]) for i in range(16)],
        "vid bigint, vec array<double>",
    )
    ivf_build_store(vecs, "vid", "vec", path, n_centroids=4, dim=4)
    ann_manifest_init(path)
    ann_apply_deletes(
        spark, path, spark.createDataFrame([(4,), (5,)], "vid bigint")
    )
    # vacuum=False: replaced files stay in 'stale' — the bait the
    # outage-shrunk spare set would wrongly reclaim
    ann_compact_deletes(spark, path, vacuum=False)
    doc = ann_manifest_read(path)
    assert doc["stale"], "fixture must have reclaimable stale files"
    # every file ANY in-window history version references must survive
    protected = set()
    mdir = os.path.join(path, "_ann_manifest")
    import json

    for name in fsio.list_files(mdir, ".json"):
        vdoc = json.loads(fsio.read_text(os.path.join(mdir, name)))
        protected |= set(vdoc.get("deletes", []))
        for fs in vdoc.get("cells", {}).values():
            protected |= set(fs)

    svc.fail_after, svc.reads = None, 0
    ann_vacuum(path, min_age_seconds=3600)  # dry: everything in-window
    n_reads = svc.reads
    for k in range(n_reads):
        svc.fail_after, svc.reads = k, 0
        try:
            ann_vacuum(path, min_age_seconds=3600)
        except Exception:
            pass
        svc.fail_after = None
        missing = [
            rel for rel in protected
            if not fsio.exists(os.path.join(path, rel))
        ]
        assert not missing, (
            f"spare-set files reclaimed under read outage at read {k}: "
            f"{missing}"
        )


def test_sync_window_read_outage_then_recovery_converges(spark, strict):
    """The standing maintainer's window under a read outage: at every
    swept index the sync either raises or applies exactly; after the
    outage clears, ONE retry converges the store to the same final state
    a fault-free sync produces (the ledger's torn-window fallback does
    the exact-once repair). Unlike the pure-read sweeps above (every
    index — cheap trials), each sync trial rebuilds corpus + seeded
    store, so this sweeps a boundary + spread SAMPLE of the read
    schedule; the loud-or-exact property of the underlying read
    primitives is already exhaustively swept by the other five tests,
    and this adds the convergence-after-outage claim on top."""
    from iodf_spark.operators.ann_maintenance import (
        ann_store_seed,
        ann_store_sync,
    )
    from iodf_spark.operators.similarity import ann_ivf_store

    svc, root = strict

    def build(tag):
        cpath = os.path.join(root, f"corpus_{tag}")
        apath = os.path.join(root, f"ann_{tag}")
        cstore = SegmentStore(cpath)
        base = spark.createDataFrame(
            [(i, [1.0 * (i % 4 == j) + 0.1 * i for j in range(4)])
             for i in range(12)],
            "vid long, vec array<double>",
        )
        cstore.write_segment(base, order_keys=["vid"])
        ann_store_seed(spark, cstore, apath, "vid", "vec", kind="ivf",
                       n_centroids=4, dim=4)
        # the outstanding delta: an append + a takedown
        cstore.write_segment(
            spark.createDataFrame(
                [(i, [0.5 * (i % 4 == j) + 0.01 * i for j in range(4)])
                 for i in range(12, 16)],
                "vid long, vec array<double>",
            ),
            order_keys=["vid"],
        )
        cstore.delete_where(spark, "vid = 3")
        return cstore, apath

    def probe(apath):
        return tuple(sorted(
            (r["query_id"], r["rank"], r["neighbor_id"])
            for r in ann_ivf_store(
                spark.createDataFrame(
                    [(0, [1.0, 0.0, 0.0, 0.0])], "vid long, vec array<double>"
                ),
                "vid", "vec", apath, [], k=6, n_centroids=4, n_probe=4,
                dim=4, query_vecs={-1: [1.0, 0.3, 0.2, 0.1]},
            ).collect()
        ))

    # fault-free reference run
    svc.fail_after = None
    cstore, apath = build("ref")
    ann_store_sync(spark, cstore, apath, "vid", "vec", kind="ivf",
                   n_centroids=4, dim=4)
    expected = probe(apath)
    ids = {nid for _q, _r, nid in expected}
    assert 3 not in ids and ids & {12, 13, 14, 15}

    # dry-count the sync's reads on a fresh twin
    svc.fail_after, svc.reads = None, 0
    cstore, apath = build("dry")
    ann_store_sync(spark, cstore, apath, "vid", "vec", kind="ivf",
                   n_centroids=4, dim=4)
    n_reads = svc.reads
    sample = sorted({0, 1, 2, n_reads // 3, n_reads // 2,
                     2 * n_reads // 3, n_reads - 2, n_reads - 1}
                    & set(range(n_reads)))
    for k in sample:
        svc.fail_after = None
        cstore, apath = build(f"k{k}")
        svc.fail_after, svc.reads = k, 0
        try:
            ann_store_sync(spark, cstore, apath, "vid", "vec", kind="ivf",
                           n_centroids=4, dim=4)
        except Exception:
            pass  # loud propagation mid-window
        svc.fail_after = None  # outage over
        ann_store_sync(spark, cstore, apath, "vid", "vec", kind="ivf",
                       n_centroids=4, dim=4)  # the retry
        assert probe(apath) == expected, (
            f"sync did not converge after read outage at read {k}"
        )
        shutil.rmtree(os.path.join(root, f"corpus_k{k}"), ignore_errors=True)
        shutil.rmtree(os.path.join(root, f"ann_k{k}"), ignore_errors=True)
