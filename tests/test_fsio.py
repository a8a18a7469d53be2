"""sources/fsio — the filesystem seam both stores route their driver-side
metadata I/O through (the round-9 'object-store' design-debt note's fix
shape). Pins the three CONTRACTS the stores' correctness builds on."""

import os
import threading

from iodf_spark.sources import fsio


def test_atomic_write_never_exposes_torn_content(tmp_path):
    p = str(tmp_path / "doc.json")
    fsio.atomic_write_text(p, "A" * 64)
    # replace over existing: readers see old-complete or new-complete
    fsio.atomic_write_text(p, "B" * 128)
    assert open(p).read() == "B" * 128
    assert not os.path.exists(p + ".tmp")  # buffer never lingers


def test_link_claim_single_winner(tmp_path):
    tmp1, tmp2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    dst = str(tmp_path / "manifest-v1.json")
    open(tmp1, "w").write("w1")
    open(tmp2, "w").write("w2")
    wins = [fsio.link_claim(tmp1, dst), fsio.link_claim(tmp2, dst)]
    assert wins == [True, False]
    assert open(dst).read() == "w1"  # the winner's content, untouched


def test_claim_dir_races_one_winner(tmp_path):
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


def test_listings_absent_prefix_is_empty_not_error(tmp_path):
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


def test_remove_helpers_are_idempotent(tmp_path):
    f = tmp_path / "f"
    f.write_text("x")
    fsio.remove_file(str(f))
    fsio.remove_file(str(f))  # second call: missing_ok default
    d = tmp_path / "d"
    d.mkdir()
    fsio.remove_tree(str(d))
    fsio.remove_tree(str(d))  # ignore_errors default
