"""Filesystem seam for driver-side store metadata I/O — manifests,
sidecars, deletion lists, segment directories.

Every direct filesystem touch in the SegmentStore (sources/segments.py)
and the ANN maintenance layer (operators/ann_maintenance.py) routes
through this module, so porting the pair off POSIX is ONE file: swap
these bodies for the object-store protocol (atomic_replace -> a
conditional PUT of the pointer object or a DynamoDB/etcd CAS, list_dir /
walk_has_suffix -> prefix LIST, remove_tree -> batch delete, rename_dir
-> server-side copy + delete or, better, indirection through the
manifest's file SET — which both stores already carry for exactly this
reason). The round-9 verdict called the POSIX assumption the pair's one
shared design-debt note; this seam is the agreed shape of the fix.

Contract notes (the store's CORRECTNESS dependencies, not details):

* atomic_replace(tmp, dst): readers observe the OLD complete content or
  the NEW complete content, never a torn mix, and two concurrent
  replacers serialize arbitrarily (last wins) — the OCC publish and the
  versioned-manifest commit both build on this single primitive.
* link_claim(tmp, dst): succeeds for AT MOST ONE claimer per dst
  (fails if dst exists) — the manifest version-claim CAS. POSIX gives
  this via link(2); object stores via If-None-Match puts.
* list_dir / walk_has_suffix: eventually-consistent listings are NOT
  acceptable for manifest discovery — on stores with async LIST, route
  discovery through the manifest pointer instead (both stores already
  read the pointer first and treat listings as advisory cleanup input).
"""

from __future__ import annotations

import os
import shutil


def list_dir(path: str) -> list[str]:
    """Names in a directory (unsorted; callers sort when order matters).
    Missing directory -> empty list, matching LIST-on-absent-prefix."""
    try:
        return os.listdir(path)
    except FileNotFoundError:
        return []


def exists(path: str) -> bool:
    return os.path.exists(path)


def is_dir(path: str) -> bool:
    return os.path.isdir(path)


def makedirs(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def walk_has_suffix(path: str, suffix: str) -> bool:
    """Does any file under `path` (recursive) carry `suffix`? Prefix LIST
    with early exit on an object store."""
    return any(
        f.endswith(suffix) for _, _, fs in os.walk(path) for f in fs
    )


def atomic_replace(tmp: str, dst: str) -> None:
    """Atomically make `dst` point at `tmp`'s content (see module
    contract). POSIX: rename(2) within one filesystem."""
    os.replace(tmp, dst)


def link_claim(tmp: str, dst: str) -> bool:
    """Create-if-absent CAS: make `dst` carry `tmp`'s (already fully
    written) content iff no `dst` exists; True on the win, False when a
    concurrent claimer got there first. The version-claim primitive."""
    try:
        os.link(tmp, dst)
    except FileExistsError:
        return False
    return True


def atomic_write_text(path: str, content: str) -> None:
    """Full-content text write with torn-write invisibility: buffer
    beside the target, then atomic_replace into place."""
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(content)
    atomic_replace(tmp, path)


def remove_file(path: str, missing_ok: bool = True) -> None:
    try:
        os.remove(path)
    except FileNotFoundError:
        if not missing_ok:
            raise


def rename_dir(src: str, dst: str) -> None:
    """Move a directory into place. Object stores lack this — the two
    call sites (segment-data adoption) are inside a claimed private
    directory, so copy+delete is a valid swap there."""
    os.rename(src, dst)


def remove_tree(path: str, ignore_errors: bool = True) -> None:
    shutil.rmtree(path, ignore_errors=ignore_errors)


def list_files(path: str, suffix: str = "") -> list[str]:
    """Plain-file names directly under `path` carrying `suffix`
    (non-recursive; missing dir -> empty)."""
    try:
        with os.scandir(path) as it:
            return [e.name for e in it if e.is_file() and e.name.endswith(suffix)]
    except FileNotFoundError:
        return []


def list_subdirs(path: str, prefix: str = "") -> list[str]:
    """Directory names directly under `path` starting with `prefix`
    (missing dir -> empty)."""
    try:
        with os.scandir(path) as it:
            return [e.name for e in it if e.is_dir() and e.name.startswith(prefix)]
    except FileNotFoundError:
        return []


def claim_dir(path: str) -> bool:
    """Create-if-absent CAS on a DIRECTORY name: True iff this caller
    created it (the segment-id / private-workdir claim). Object stores
    have no directories — swap for a zero-byte marker object put with
    If-None-Match."""
    try:
        os.makedirs(path, exist_ok=False)
    except FileExistsError:
        return False
    return True
