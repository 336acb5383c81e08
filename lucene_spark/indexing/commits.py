"""Commit points — SnapshotDeletionPolicy + IndexCommit analogues.

The reference keeps every commit as a ``segments_N`` file and lets a
``SnapshotDeletionPolicy`` (``core/index/SnapshotDeletionPolicy.java``) pin
the files a commit references so deletion policies / merges cannot remove
them; ``DirectoryReader.open(IndexCommit)`` opens a point-in-time reader on
any pinned commit, and ``IndexWriter.rollback`` abandons changes after one.

Here a commit IS the manifest (one atomic JSON replace per mutation), so a
snapshot is simply a retained copy of ``manifest.json`` under
``commits/<tag>.json``. Everything a manifest references is immutable on
disk (segment parquet dirs, stats generations, live-docs generations), so
pinning = excluding those paths from the post-commit GC passes:

- stats-generation GC (`IndexBuilder._gc_stats_generations`),
- live-docs-generation GC (`IndexMaintenance._gc_live_generations`),
- compaction's merged-segment removal (`IndexMaintenance.compact`).

A FULL in-place rebuild (``IndexBuilder.build``) is authoritative and clears
snapshots along with live-docs state — the ``OpenMode.CREATE`` semantics.

Scale note: snapshots cost zero data copies (a few-KB JSON file each); the
price is retained disk for pinned generations, exactly like the reference.
"""

from __future__ import annotations

import glob
import json
import os

COMMITS_DIR = "commits"


def _path(index_dir: str, tag: str) -> str:
    if not tag or "/" in tag or tag.startswith("."):
        raise ValueError(f"bad snapshot tag {tag!r}")
    return f"{index_dir}/{COMMITS_DIR}/{tag}.json"


def snapshot(index_dir: str, tag: str) -> dict:
    """Pin the CURRENT commit under ``tag`` (SnapshotDeletionPolicy.snapshot).
    Atomic (tmp + rename); refuses to overwrite an existing tag."""
    p = _path(index_dir, tag)
    if os.path.exists(p):
        raise ValueError(f"snapshot {tag!r} already exists")
    with open(f"{index_dir}/manifest.json", encoding="utf-8") as f:
        m = json.load(f)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    tmp = f"{p}.tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(m, f, indent=1)
    os.replace(tmp, p)
    return m


def release(index_dir: str, tag: str) -> None:
    """Unpin (SnapshotDeletionPolicy.release). The next GC/compaction pass
    may then remove generations only this snapshot referenced."""
    os.remove(_path(index_dir, tag))


def list_snapshots(index_dir: str) -> dict[str, dict]:
    out = {}
    for p in sorted(glob.glob(f"{index_dir}/{COMMITS_DIR}/*.json")):
        with open(p, encoding="utf-8") as f:
            out[os.path.basename(p)[:-5]] = json.load(f)
    return out


def load(index_dir: str, tag: str) -> dict:
    with open(_path(index_dir, tag), encoding="utf-8") as f:
        return json.load(f)


def clear(index_dir: str) -> None:
    """Drop every snapshot (full-rebuild / OpenMode.CREATE semantics)."""
    import shutil

    shutil.rmtree(f"{index_dir}/{COMMITS_DIR}", ignore_errors=True)


def next_segment_base(index_dir: str, manifest: dict | None) -> int:
    """First free segment id: 1 + the max over the live manifest's segments
    AND every ``seg=N`` dir on disk. After :func:`rollback` the live
    manifest's max can sit BELOW segment dirs written by rolled-back
    commits — dirs another snapshot may still pin — so allocating from the
    manifest alone would assign a colliding id and overwrite pinned data.
    The reference never reuses segment numbers for the same reason
    (``SegmentInfos.counter`` is monotone; ``core/index/SegmentInfos.java``).
    Driver-side metadata scan only — O(#segment dirs), no data reads."""
    mx = -1
    if manifest and manifest.get("offsets"):
        mx = max(int(s) for s in manifest["offsets"])
    for table in ("postings", "docs"):
        base = f"{index_dir}/{table}"
        if os.path.isdir(base):
            for n in os.listdir(base):
                if n.startswith("seg="):
                    try:
                        mx = max(mx, int(n[4:]))
                    except ValueError:
                        pass
    return mx + 1


def next_generation(index_dir: str, manifest: dict | None,
                    prefixes: tuple[str, ...], counter_key: str) -> int:
    """First free generation number for dirs named ``<prefix>.gN`` (a bare
    ``<prefix>`` dir counts as generation 0): 1 + the max over the live
    manifest's counter and every matching dir on disk. Same post-rollback
    never-reuse rule as :func:`next_segment_base` — a rolled-back commit's
    stats / live-docs / doc-values generations may still be pinned by other
    snapshots, and reusing their names would overwrite pinned data."""
    mx = int(manifest.get(counter_key, 0)) if manifest else 0
    for prefix in prefixes:
        for p in glob.glob(f"{index_dir}/{prefix}*"):
            n = os.path.basename(p)
            if n == prefix:
                continue  # generation 0, already ≤ mx
            if n.startswith(prefix + ".g"):
                try:
                    mx = max(mx, int(n[len(prefix) + 2:]))
                except ValueError:
                    pass
    return mx + 1


def protected(index_dir: str) -> dict:
    """Everything any snapshot still references:
    ``{"segs": set[int], "stats": set[str], "live": set[str]}``."""
    segs: set[int] = set()
    stats: set[str] = set()
    live: set[str] = set()
    for m in list_snapshots(index_dir).values():
        segs |= {int(s) for s in m.get("offsets", {})}
        sd = m.get("stats_dirs", {})
        stats |= {sd.get("term_stats", "term_stats"),
                  sd.get("field_stats", "field_stats")}
        live.add(m.get("live_dir", "live_docs"))
    return {"segs": segs, "stats": stats, "live": live}
