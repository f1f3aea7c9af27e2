"""Snapshots + index replication — SnapshotDeletionPolicy and the
lucene/replicator module, re-expressed over the table-format index.

References:
- lucene/core/src/java/org/apache/lucene/index/SnapshotDeletionPolicy
  .java:38-60 — ``snapshot()`` pins a commit point so its files cannot
  be deleted while the snapshot is held; ``release()`` un-pins it.
- lucene/replicator/src/java/org/apache/lucene/replicator/
  IndexRevision.java:60-90 — a revision = the commit's file list with
  per-file sizes (the replication unit), and
  IndexReplicationHandler.java — the client copies only files missing
  from its local directory and removes files not referenced by the
  new revision (incremental sync).

Spark/table-format mapping: the engine's index is a directory of
parquet tables whose mutations are APPEND-ONLY (a delete commit
appends new files under ``deletes/`` and bumps the generation counter;
build/merge write whole new table dirs) — exactly the immutable-file
discipline Lucene's commit points rely on, so a snapshot is a manifest
of relative paths with sizes + sha256 (CodecUtil-checksum analog).
Restoring an OLD revision onto a replica therefore reproduces the
pre-mutation index bit-for-bit: the newer delete files simply are not
in the pinned list.  On a cluster the same manifest discipline is an
Iceberg snapshot id; here the files are local and the sync is a
driver-side copy (the replicator is control-plane, never data-plane —
file payloads stream node-to-node, nothing flows through Spark jobs).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

__all__ = [
    "take_snapshot", "list_snapshots", "release_snapshot", "replicate",
]

_SNAPDIR = "snapshots"


def _iter_files(index_dir: str):
    for root, dirs, files in os.walk(index_dir):
        rel_root = os.path.relpath(root, index_dir)
        if rel_root.split(os.sep)[0] == _SNAPDIR:
            continue
        for f in files:
            if f.endswith(".crc"):  # local-fs shadow checksums
                continue
            yield os.path.normpath(os.path.join(rel_root, f))


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def take_snapshot(index_dir: str) -> dict:
    """Pin the current commit: record every index file with size +
    sha256 under ``index_dir/snapshots/rev_<n>.json`` and return the
    revision dict (SnapshotDeletionPolicy.snapshot + IndexRevision)."""
    from .deletes import read_generation

    snapdir = os.path.join(index_dir, _SNAPDIR)
    os.makedirs(snapdir, exist_ok=True)
    existing = list_snapshots(index_dir)
    rev_id = (max(existing) + 1) if existing else 1
    files = {}
    for rel in sorted(_iter_files(index_dir)):
        p = os.path.join(index_dir, rel)
        files[rel] = {"size": os.path.getsize(p), "sha256": _sha256(p)}
    rev = {
        "rev": rev_id,
        "generation": read_generation(index_dir),
        "files": files,
    }
    with open(os.path.join(snapdir, f"rev_{rev_id}.json"), "w") as f:
        json.dump(rev, f, sort_keys=True)
    return rev


def list_snapshots(index_dir: str) -> list[int]:
    snapdir = os.path.join(index_dir, _SNAPDIR)
    if not os.path.isdir(snapdir):
        return []
    out = []
    for f in os.listdir(snapdir):
        if f.startswith("rev_") and f.endswith(".json"):
            out.append(int(f[4:-5]))
    return sorted(out)


def _load(index_dir: str, rev_id: int) -> dict:
    with open(os.path.join(index_dir, _SNAPDIR, f"rev_{rev_id}.json")) as f:
        return json.load(f)


def release_snapshot(index_dir: str, rev_id: int) -> None:
    """SnapshotDeletionPolicy.release — un-pin the revision."""
    os.remove(os.path.join(index_dir, _SNAPDIR, f"rev_{rev_id}.json"))


def replicate(src_dir: str, dst_dir: str, rev_id: int | None = None) -> dict:
    """Sync ``dst_dir`` to the given (default: latest) revision of
    ``src_dir``: copy only files whose size or checksum differ, delete
    local files the revision does not reference
    (IndexReplicationHandler's incremental copy + old-file cleanup).
    Returns {"copied": n, "skipped": n, "deleted": n, "rev": id}."""
    revs = list_snapshots(src_dir)
    if not revs:
        raise ValueError(f"no snapshots in {src_dir}")
    rev_id = rev_id if rev_id is not None else revs[-1]
    rev = _load(src_dir, rev_id)
    copied = skipped = 0
    for rel, meta in sorted(rev["files"].items()):
        src = os.path.join(src_dir, rel)
        dst = os.path.join(dst_dir, rel)
        if (
            os.path.exists(dst)
            and os.path.getsize(dst) == meta["size"]
            and _sha256(dst) == meta["sha256"]
        ):
            skipped += 1
            continue
        if _sha256(src) != meta["sha256"]:
            raise IOError(
                f"source file {rel} changed since snapshot {rev_id} "
                "(pinned files must be immutable)"
            )
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(src, dst)
        # drop any stale Hadoop local-fs shadow checksum for the
        # overwritten file — a leftover .crc would fail the next read
        crc = os.path.join(
            os.path.dirname(dst), f".{os.path.basename(dst)}.crc"
        )
        if os.path.exists(crc):
            os.remove(crc)
        copied += 1
    deleted = 0
    if os.path.isdir(dst_dir):
        wanted = set(rev["files"])
        for rel in list(_iter_files(dst_dir)):
            if rel not in wanted:
                os.remove(os.path.join(dst_dir, rel))
                deleted += 1
    return {"copied": copied, "skipped": skipped, "deleted": deleted,
            "rev": rev_id}
