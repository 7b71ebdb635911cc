"""Minimal manifest commit log — transactional visibility for the
file-based continuous aggregates.

The reference's loader gets atomicity for free from Postgres
transactions (transform_data.py's INSERT batches — SURVEY §2.2 K2);
the Spark-side incremental rollup/CMS/HLL partials (streaming/
pipeline.py) instead live as plain ``batch_id=<id>/`` parquet
directories, which leaves three documented gaps: a reader can observe
a partial directory while it is being (over)written, a crash can leave
a torn directory that readers then merge, and compaction's
multi-directory swap is not atomic (its docstring says "use a
transactional table format"). This module is that table format, pared
to exactly what the partials need — the Delta/Iceberg core idea
(an append-only log of manifests; the current snapshot is the fold of
the log; data files are immutable and invisible until a manifest
names them) without the format's schema/stats machinery:

    table_root/
      batch_id=0/  batch_id=1/ ...     (parquet dirs, written first)
      _commits/
        00000000.json   {"add": ["batch_id=0"], "remove": []}
        00000001.json   {"add": ["batch_id=1"], "remove": []}
        00000002.json   {"add": ["batch_id=-1"],
                         "remove": ["batch_id=0", "batch_id=1"]}

- WRITE protocol: write the data directory fully, then `commit(root,
  add=[dir])`. A crash between the two leaves an orphan directory that
  no reader ever merges (vacuum sweeps it later).
- COMMIT protocol (optimistic, multi-writer-safe on a POSIX fs): the
  manifest body is written to a hidden temp file, fsynced, then
  `os.link`ed to the next sequential slot ``NNNNNNNN.json`` — link is
  atomic and fails with EEXIST if another writer claimed the slot, in
  which case the writer re-reads the log and retries the next slot
  (compare-and-swap on the file name; same device-local guarantee
  Delta relies on for `_delta_log/N.json`).
- READ protocol: `snapshot(root)` folds the ordered manifests into the
  live-directory set; readers load exactly those paths. A concurrent
  commit lands either wholly before or wholly after the listing —
  snapshot isolation at directory granularity.
- REPLAY idempotence: foreachBatch re-delivery re-writes the same
  directory content and re-commits the same `add`; the fold is
  set-valued, so a duplicate add is harmless (and `commit` skips the
  manifest entirely when the adds are already live and nothing is
  removed).
- COMPACTION: write the folded directory, then ONE manifest
  {add: [compacted], remove: [inputs]} — the reader-visible swap is a
  single atomic link, so compaction may now run concurrently with
  readers (the restriction compact_rollup documents is lifted in
  compact_rollup_committed). Removed/orphan directories are deleted by
  `vacuum`, which never touches live ones.

Scale notes: manifests are O(changed directories) — bytes, not data;
the fold is a driver-side listing of one small directory (Delta does
exactly this plus periodic checkpoints, unnecessary at the partial
counts a rollup accumulates between compactions). Data never moves
through the log.
"""

from __future__ import annotations

import json
import os


_COMMITS = "_commits"


def _commits_dir(root: str) -> str:
    return os.path.join(root.rstrip("/"), _COMMITS)


def _manifest_name(idx: int) -> str:
    return f"{idx:08d}.json"


def log_entries(root: str) -> list[tuple[int, dict]]:
    """Ordered (index, manifest) pairs; empty when no log exists."""
    cd = _commits_dir(root)
    if not os.path.isdir(cd):
        return []
    out = []
    for entry in sorted(os.listdir(cd)):
        if not entry.endswith(".json") or entry.startswith("."):
            continue
        stem = entry[: -len(".json")]
        if not stem.isdigit():
            continue
        with open(os.path.join(cd, entry)) as f:
            out.append((int(stem), json.load(f)))
    return out


def snapshot(root: str) -> list[str]:
    """The live relative directory names: fold of add/remove over the
    ordered log. Sorted for deterministic plans."""
    live: set[str] = set()
    for _, manifest in log_entries(root):
        live.difference_update(manifest.get("remove", ()))
        live.update(manifest.get("add", ()))
    return sorted(live)


def snapshot_paths(root: str) -> list[str]:
    """Absolute paths of the live directories (reader input)."""
    r = root.rstrip("/")
    return [f"{r}/{d}" for d in snapshot(root)]


def commit(root: str, add: list[str] | None = None,
           remove: list[str] | None = None) -> int | None:
    """Atomically append a manifest; returns its index, or None when
    the commit would be a no-op (every `add` already live, nothing to
    remove) — the foreachBatch replay path.

    Claims the next slot with write-temp + fsync + os.link (EEXIST on
    a lost race → re-read, retry next slot)."""
    add = list(add or [])
    remove = list(remove or [])
    if not add and not remove:
        return None
    cd = _commits_dir(root)
    os.makedirs(cd, exist_ok=True)
    body = json.dumps({"add": add, "remove": remove}).encode()
    while True:
        entries = log_entries(root)
        if not remove:
            live = set()
            for _, m in entries:
                live.difference_update(m.get("remove", ()))
                live.update(m.get("add", ()))
            if set(add) <= live:
                return None  # replayed batch: already visible
        idx = entries[-1][0] + 1 if entries else 0
        tmp = os.path.join(cd, f".tmp-{idx}-{os.getpid()}.json")
        with open(tmp, "wb") as f:
            f.write(body)
            f.flush()
            os.fsync(f.fileno())
        target = os.path.join(cd, _manifest_name(idx))
        try:
            os.link(tmp, target)  # atomic CAS on the slot name
            return idx
        except FileExistsError:
            continue  # another writer claimed the slot; retry
        finally:
            os.unlink(tmp)


def read_committed(spark, root: str):
    """Reader-side helper shared by the rollup/CMS/HLL sinks: a
    DataFrame over exactly the live directories (snapshot isolation),
    erroring — not cold-starting — when nothing is committed."""
    paths = snapshot_paths(root)
    if not paths:
        raise FileNotFoundError(f"no committed partials under {root}")
    return spark.read.option("basePath", root).parquet(*paths)


def vacuum(root: str) -> list[str]:
    """Delete data directories that are NOT in the current snapshot
    (compaction leftovers, torn/uncommitted writes). Never touches a
    live directory or the log itself. Returns what it removed."""
    import shutil

    r = root.rstrip("/")
    if not os.path.isdir(r):
        return []
    live = set(snapshot(root))
    removed = []
    for entry in os.listdir(r):
        if entry == _COMMITS or entry in live:
            continue
        p = os.path.join(r, entry)
        if os.path.isdir(p):
            shutil.rmtree(p)
            removed.append(entry)
    return sorted(removed)
