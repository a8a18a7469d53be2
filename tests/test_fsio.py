"""sources/fsio — the filesystem seam both stores route their driver-side
metadata I/O through (the round-9 'object-store' design-debt note's fix
shape). Pins the contracts the stores' correctness builds on, against
BOTH backends: POSIX (rename/link atomicity) and the object-store one
(conditional-put claims, whole-object PUTs, copy-list-delete) — plus a
mechanical audit that the object-store backend never reaches for the
POSIX primitives it exists to avoid."""

import inspect
import os
import threading

import pytest

from iodf_spark.sources import fsio


@pytest.fixture(params=["posix", "objectstore", "strictobjectstore"])
def backend(request):
    b = {
        "posix": fsio.PosixBackend,
        "objectstore": fsio.ObjectStoreBackend,
        "strictobjectstore": fsio.StrictObjectStoreBackend,
    }[request.param]()
    with fsio.using_backend(b):
        yield b


def test_atomic_write_never_exposes_torn_content(backend, tmp_path):
    p = str(tmp_path / "doc.json")
    fsio.atomic_write_text(p, "A" * 64)
    # replace over existing: readers see old-complete or new-complete
    fsio.atomic_write_text(p, "B" * 128)
    assert fsio.read_text(p) == "B" * 128
    assert not fsio.exists(p + ".tmp")  # buffer never lingers


def test_link_claim_single_winner(backend, tmp_path):
    tmp1, tmp2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    dst = str(tmp_path / "manifest-v1.json")
    fsio.atomic_write_text(tmp1, "w1")
    fsio.atomic_write_text(tmp2, "w2")
    wins = [fsio.link_claim(tmp1, dst), fsio.link_claim(tmp2, dst)]
    assert wins == [True, False]
    assert fsio.read_text(dst) == "w1"  # the winner's content, untouched
    # tmp SURVIVES the claim on every backend: callers re-use it for the
    # CURRENT-pointer flip (segments._publish choreography)
    assert fsio.exists(tmp1) and fsio.exists(tmp2)
    fsio.atomic_replace(tmp1, str(tmp_path / "CURRENT"))
    assert fsio.read_text(str(tmp_path / "CURRENT")) == "w1"
    assert not fsio.exists(tmp1)  # replace consumes


def test_claim_dir_races_one_winner(backend, tmp_path):
    target = str(tmp_path / "seg-00001")
    results = []
    barrier = threading.Barrier(8)

    def go():
        barrier.wait()
        results.append(fsio.claim_dir(target))

    ts = [threading.Thread(target=go) for _ in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert sorted(results) == [False] * 7 + [True]
    # a claimed dir is claimed for EVERY later arrival too
    assert fsio.claim_dir(target) is False


def test_claim_dir_respects_foreign_unmarked_dir(backend, tmp_path):
    # a dir created outside the claim protocol (another writer's in-flight
    # mkdir, a Spark task dir) must read as claimed on both backends
    target = str(tmp_path / "seg-00007")
    os.makedirs(target)
    assert fsio.claim_dir(target) is False


def test_rename_dir_moves_nested_content(backend, tmp_path):
    src = tmp_path / "staging"
    (src / "a").mkdir(parents=True)
    (src / "part-0.parquet").write_text("p0")
    (src / "a" / "part-1.parquet").write_text("p1")
    dst = str(tmp_path / "seg-00001" / "data")
    os.makedirs(str(tmp_path / "seg-00001"))
    fsio.rename_dir(str(src), dst)
    assert open(os.path.join(dst, "part-0.parquet")).read() == "p0"
    assert open(os.path.join(dst, "a", "part-1.parquet")).read() == "p1"
    assert not os.path.exists(str(src))  # src prefix fully gone


def test_listings_absent_prefix_is_empty_not_error(backend, tmp_path):
    missing = str(tmp_path / "nope")
    assert fsio.list_dir(missing) == []
    assert fsio.list_files(missing, ".parquet") == []
    assert fsio.list_subdirs(missing, "cid=") == []
    assert fsio.walk_has_suffix(missing, ".parquet") is False
    # and the real thing filters precisely
    d = tmp_path / "store"
    (d / "cid=3").mkdir(parents=True)
    (d / "cid=3" / "a.parquet").write_text("x")
    (d / "cid=3" / "_meta").write_text("x")
    (d / "_deletes").mkdir()
    assert fsio.list_subdirs(str(d), "cid=") == ["cid=3"]
    assert fsio.list_files(str(d / "cid=3"), ".parquet") == ["a.parquet"]
    assert fsio.walk_has_suffix(str(d), ".parquet") is True
    assert fsio.walk_has_suffix(str(d / "_deletes"), ".parquet") is False


def test_remove_helpers_are_idempotent(backend, tmp_path):
    f = tmp_path / "f"
    f.write_text("x")
    fsio.remove_file(str(f))
    fsio.remove_file(str(f))  # second call: missing_ok default
    with pytest.raises(FileNotFoundError):
        fsio.remove_file(str(f), missing_ok=False)
    d = tmp_path / "d"
    d.mkdir()
    fsio.remove_tree(str(d))
    fsio.remove_tree(str(d))  # ignore_errors default
    with pytest.raises(FileNotFoundError):
        fsio.remove_tree(str(d), ignore_errors=False)


def test_objectstore_claim_marker_is_invisible(tmp_path):
    """The conditional-put claim marker must not leak into any listing the
    stores interpret (it is layout bookkeeping, not data)."""
    with fsio.using_backend(fsio.ObjectStoreBackend()):
        target = str(tmp_path / "seg-00002")
        assert fsio.claim_dir(target) is True
        assert os.path.exists(os.path.join(target, fsio.CLAIM_MARKER))
        assert fsio.list_dir(target) == []
        assert fsio.list_files(target) == []
        assert fsio.walk_has_suffix(target, "") is False
        # marker name is dot-prefixed so Spark/Hadoop readers skip it too
        assert fsio.CLAIM_MARKER.startswith(".")
        # remove_tree reclaims marker + skeleton; the name is claimable again
        fsio.remove_tree(target)
        assert not os.path.exists(target)
        assert fsio.claim_dir(target) is True


def test_objectstore_backend_uses_no_posix_atomicity():
    """Mechanical audit: the object-store backend's own choreography never
    reaches for rename(2)/link(2)/exclusive-mkdir/os.replace — all
    atomicity rides the service API (put/copy with If-None-Match). The
    FakeObjectStore SERVICE may use them internally (that is S3's job,
    not the protocol's)."""
    src = inspect.getsource(fsio.ObjectStoreBackend)
    for forbidden in ("os.replace", "os.link", "os.rename", "exist_ok=False"):
        assert forbidden not in src, forbidden


def test_objectstore_conditional_put_is_a_real_cas(tmp_path):
    svc = fsio.FakeObjectStore()
    key = str(tmp_path / "v1.json")
    results = []
    barrier = threading.Barrier(8)

    def go(i):
        barrier.wait()
        results.append(svc.put(key, f"w{i}".encode(), if_none_match=True))

    ts = [threading.Thread(target=go, args=(i,)) for i in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert sorted(results) == [False] * 7 + [True]
    # the object carries exactly one winner's complete content
    assert svc.get(key).decode() in {f"w{i}" for i in range(8)}


class FaultyService(fsio.FakeObjectStore):
    """Service emulator that dies after N mutating operations (PUT /
    DELETE — COPY routes through PUT): the object-store outage /
    process-crash model. Counting only mutations keeps the index space
    the protocol's write schedule, not its read chatter."""

    def __init__(self, fail_after=None):
        super().__init__()
        self.fail_after = fail_after
        self.mutations = 0

    def _tick(self):
        self.mutations += 1
        if self.fail_after is not None and self.mutations > self.fail_after:
            raise OSError("injected object-store outage")

    def put(self, key, data, if_none_match=False):
        self._tick()
        return super().put(key, data, if_none_match=if_none_match)

    def delete(self, key):
        self._tick()
        return super().delete(key)


def test_read_text_and_mtime_contract(backend, tmp_path):
    """Round 12: the READ half of the seam. read_text returns exactly the
    written content; a missing path raises FileNotFoundError (never an
    empty string); mtime on a file is its last write, on a directory the
    NEWEST write under it (prefix semantics — object stores have no
    directory inodes)."""
    import time

    p = str(tmp_path / "store" / "manifest.json")
    fsio.makedirs(str(tmp_path / "store"))
    with pytest.raises(FileNotFoundError):
        fsio.read_text(p)
    fsio.atomic_write_text(p, '{"v": 1}')
    assert fsio.read_text(p) == '{"v": 1}'
    t1 = fsio.mtime(p)
    time.sleep(0.02)
    fsio.atomic_write_text(p, '{"v": 2}')
    assert fsio.mtime(p) >= t1
    # dir mtime = newest object under the prefix: a fresh write anywhere
    # below advances it (the orphan-grace signal reconcile needs)
    d = str(tmp_path / "store")
    before = fsio.mtime(d)
    time.sleep(0.02)
    fsio.makedirs(os.path.join(d, "sub"))
    fsio.atomic_write_text(os.path.join(d, "sub", "late.json"), "x")
    assert fsio.mtime(d) >= before
    assert fsio.mtime(d) >= fsio.mtime(p) - 1e-6


def test_strict_backend_metadata_never_touches_local_fs(tmp_path):
    """THE strict-mode property (round-11 verdict What's-wrong #1): seam
    writes land only in the in-memory service, so a bare open()/os.path.*
    on a metadata path — the passthrough class the round-11 emulator made
    silently work — fails loudly, while the seam's own reads see
    everything."""
    with fsio.using_backend(fsio.StrictObjectStoreBackend()):
        p = str(tmp_path / "m" / "manifest-v000001.json")
        fsio.atomic_write_text(p, '{"segments": []}')
        assert fsio.read_text(p) == '{"segments": []}'
        assert fsio.exists(p)
        assert fsio.mtime(p) > 0
        # nothing local, anywhere under the metadata dir
        assert not os.path.exists(p)
        assert not os.path.exists(str(tmp_path / "m"))
        with pytest.raises(FileNotFoundError):
            open(p)
        with pytest.raises(OSError):
            os.path.getmtime(p)
        # claims too: the marker is a service object, not a local file
        seg = str(tmp_path / "seg-00001")
        assert fsio.claim_dir(seg) is True
        assert fsio.is_dir(seg)
        assert not os.path.exists(seg)


def test_strict_backend_merges_data_plane_files(tmp_path):
    """Connector-written bytes (Spark's parquet commits — the data plane,
    outside the seam by design) and service-held metadata present as ONE
    merged listing, exactly a real adapter's view of one bucket."""
    with fsio.using_backend(fsio.StrictObjectStoreBackend()):
        root = str(tmp_path / "store")
        # 'Spark' writes a segment's data files locally
        os.makedirs(os.path.join(root, "seg-00001", "data"))
        with open(os.path.join(root, "seg-00001", "data", "part-0.parquet"), "wb") as fh:
            fh.write(b"pq")
        # the driver commits metadata through the seam
        fsio.atomic_write_text(os.path.join(root, "manifest-v000001.json"), "{}")
        names = fsio.list_dir(root)
        assert "seg-00001" in names and "manifest-v000001.json" in names
        assert fsio.walk_has_suffix(os.path.join(root, "seg-00001"), ".parquet")
        assert fsio.list_files(
            os.path.join(root, "seg-00001", "data"), ".parquet"
        ) == ["part-0.parquet"]
        # remove_tree reclaims both planes
        fsio.remove_tree(root)
        assert not fsio.exists(root)
        assert not os.path.exists(root)


def test_stores_route_all_metadata_io_through_the_seam():
    """Mechanical audit (round-12 twin of the no-POSIX-atomicity audit):
    the stores' driver-side metadata I/O — manifest/pointer/ledger/cursor
    reads, tmp-buffer writes, age checks — must ride fsio, never bare
    open()/getmtime/mkstemp. The strict backend makes a violation fail
    loudly at runtime; this pins it at the source level so a bypass can't
    even land on the POSIX-only paths."""
    import iodf_spark.operators.ann_maintenance as ann
    import iodf_spark.sources.segments as seg
    import iodf_spark.streaming.ingest as ing

    for mod in (seg, ann, ing):
        src = inspect.getsource(mod)
        for forbidden in (
            "os.path.getmtime",
            "mkstemp",
            "os.fdopen",
            "with open(",
            "json.load(fh",
        ):
            assert forbidden not in src, (mod.__name__, forbidden)


def test_strict_copy_gets_fresh_lastmodified(tmp_path):
    """S3 COPY does NOT preserve LastModified — the reason retention
    windows key on the manifest doc's committed_at, never on file mtime.
    The strict service pins that semantic so a backend can never lean on
    copy-preserved timestamps."""
    import time

    svc = fsio.StrictObjectStore()
    src, dst = str(tmp_path / "a"), str(tmp_path / "b")
    svc.put(src, b"x")
    t0 = svc.head(src)
    time.sleep(0.02)
    assert svc.copy(src, dst) is True
    assert svc.head(dst) > t0


class FaultyStrictService(fsio.StrictObjectStore):
    """The strict (in-memory) twin of FaultyService: dies after N
    mutating operations (PUT / COPY / DELETE — COPY is its own service
    call here, unlike FakeObjectStore where it routes through PUT, so
    the two backends' mutation schedules differ and each sweep dry-runs
    its own count)."""

    def __init__(self, fail_after=None):
        super().__init__()
        self.fail_after = fail_after
        self.mutations = 0

    def _tick(self):
        self.mutations += 1
        if self.fail_after is not None and self.mutations > self.fail_after:
            raise OSError("injected object-store outage")

    def put(self, key, data, if_none_match=False):
        self._tick()
        return super().put(key, data, if_none_match=if_none_match)

    def copy(self, src, dst, if_none_match=False):
        self._tick()
        return super().copy(src, dst, if_none_match=if_none_match)

    def delete(self, key):
        self._tick()
        return super().delete(key)


def test_strictobjectstore_compaction_survives_crash_at_every_mutation(
    spark, tmp_path_factory
):
    """The crash sweep on the STRICT backend: metadata exists only in the
    in-memory service, so this proves the commit choreography's crash
    safety does not lean on any local-file shadow of the manifests —
    recovery reads exactly the objects that survived the outage. The
    outage 'ends' by clearing fail_after on the SAME service (an object
    store outage loses no durable objects)."""
    import shutil

    from iodf_spark.sources.segments import SegmentStore

    tpl_root = str(tmp_path_factory.mktemp("sfaulty") / "template")
    tpl_svc = fsio.StrictObjectStore()
    with fsio.using_backend(fsio.StrictObjectStoreBackend(tpl_svc)):
        store = SegmentStore(tpl_root)
        for lo, hi in [(0, 10), (10, 25), (25, 30)]:
            store.write_segment(
                spark.createDataFrame(
                    [(i, i * 3) for i in range(lo, hi)], "k long, v long"
                ),
                order_keys=["k"],
            )
    expected = list(range(30))

    def clone(tag, fail_after):
        # both planes: data files via copytree, metadata via a key-remapped
        # copy of the template service's dict into a fresh faulty service
        dst = str(tmp_path_factory.mktemp(f"sfaulty_{tag}") / "store")
        shutil.copytree(tpl_root, dst)
        svc = FaultyStrictService(fail_after)
        with tpl_svc._lock:
            for key, val in tpl_svc._objs.items():
                if key.startswith(tpl_root + os.sep):
                    svc._objs[key.replace(tpl_root, dst, 1)] = val
        return dst, svc

    dry, svc = clone("dry", None)
    with fsio.using_backend(fsio.StrictObjectStoreBackend(svc)):
        SegmentStore(dry).compact(spark)
    n_ops = svc.mutations
    assert n_ops >= 3  # claim marker + version claim + pointer at minimum

    for k in range(n_ops):
        dst, svc = clone(k, k)
        with fsio.using_backend(fsio.StrictObjectStoreBackend(svc)):
            try:
                SegmentStore(dst).compact(spark)
            except Exception:
                pass  # the injected outage (or Spark's wrapping of it)
        svc.fail_after = None  # outage over; durable objects all survive
        with fsio.using_backend(fsio.StrictObjectStoreBackend(svc)):
            store = SegmentStore(dst)
            got = sorted(r["k"] for r in store.open(spark).collect())
            assert got == expected, f"torn snapshot after crash at op {k}"
            if len(store.manifest()) > 1:
                store.compact(spark)  # the retry
            assert len(SegmentStore(dst).manifest()) == 1
            store.vacuum(keep_last=1)
            store.reconcile(grace_seconds=0)
            got2 = sorted(r["k"] for r in SegmentStore(dst).open(spark).collect())
            assert got2 == expected, f"post-recovery drift at op {k}"
        shutil.rmtree(dst, ignore_errors=True)


def test_objectstore_compaction_survives_crash_at_every_mutation(
    spark, tmp_path_factory
):
    """EXHAUSTIVE crash sweep on the object-store backend: kill the
    service at EVERY mutating-operation index of a compaction's commit
    choreography and require, at each index, that (1) the store still
    reads a complete OLD-or-NEW snapshot — exactly the original rows,
    never a torn mix, (2) a retried compaction completes, and
    (3) vacuum + reconcile converge without breaking reads. This is the
    generative complement to the deterministic OCC races: those pick the
    interesting interleavings, this covers every crash point of the
    happy path."""
    import shutil

    from iodf_spark.sources.segments import SegmentStore

    template = str(tmp_path_factory.mktemp("faulty") / "template")
    with fsio.using_backend(fsio.ObjectStoreBackend()):
        store = SegmentStore(template)
        for lo, hi in [(0, 10), (10, 25), (25, 30)]:
            store.write_segment(
                spark.createDataFrame(
                    [(i, i * 3) for i in range(lo, hi)], "k long, v long"
                ),
                order_keys=["k"],
            )
    expected = list(range(30))

    def copy_of(tag):
        dst = str(tmp_path_factory.mktemp(f"faulty_{tag}") / "store")
        shutil.copytree(template, dst)
        return dst

    # dry run: learn the compaction's mutation count on this backend
    probe_svc = FaultyService(fail_after=None)
    dry = copy_of("dry")
    with fsio.using_backend(fsio.ObjectStoreBackend(probe_svc)):
        SegmentStore(dry).compact(spark)
    n_ops = probe_svc.mutations
    assert n_ops >= 3  # claim marker + version claim + pointer at minimum

    for k in range(n_ops):
        dst = copy_of(k)
        with fsio.using_backend(fsio.ObjectStoreBackend(FaultyService(k))):
            try:
                SegmentStore(dst).compact(spark)
            except Exception:
                pass  # the injected outage (or Spark's wrapping of it)
        with fsio.using_backend(fsio.ObjectStoreBackend()):
            store = SegmentStore(dst)
            got = sorted(r["k"] for r in store.open(spark).collect())
            assert got == expected, f"torn snapshot after crash at op {k}"
            if len(store.manifest()) > 1:
                store.compact(spark)  # the retry
            assert len(SegmentStore(dst).manifest()) == 1
            store.vacuum(keep_last=1)
            store.reconcile(grace_seconds=0)
            got2 = sorted(r["k"] for r in SegmentStore(dst).open(spark).collect())
            assert got2 == expected, f"post-recovery drift at op {k}"
        shutil.rmtree(dst, ignore_errors=True)
