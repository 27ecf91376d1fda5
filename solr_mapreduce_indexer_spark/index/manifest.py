"""Segment manifests: checkpoint/resume + per-partition lineage & metrics.

Replaces the reference's MR-level fault tolerance (rerun the whole job,
MapReduceIndexerToolArgumentParser.java:100-102) and its commit-data stamping
(TreeMergeOutputFormat.java:187-235) with segment-granularity checkpoints:
each pipeline phase writes its outputs write-once, then atomically commits a
JSON checkpoint (tmp + rename). Resume = skip phases whose checkpoint exists
and is complete.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict
from typing import Any

from .. import fsutil


def _ckpt_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "checkpoints")


def checkpoint_path(index_dir: str, phase: str) -> str:
    return os.path.join(_ckpt_dir(index_dir), f"{phase}.json")


def _relativize(index_dir: str, payload: dict[str, Any]) -> dict[str, Any]:
    """Record segment paths relative to the index dir so the whole index is
    relocatable (copy/rename the dir, readers rebase on read). Scheme'd
    index dirs (hdfs://…) relativize by string prefix — same outcome, no
    os.path URI mangling."""
    p = payload.get("path")
    if not p:
        return payload
    if fsutil.has_scheme(index_dir) or fsutil.has_scheme(p):
        base = index_dir.rstrip("/") + "/"
        if p.startswith(base):
            payload = dict(payload, path_rel=p[len(base):])
        return payload
    if os.path.isabs(p):
        rel = os.path.relpath(p, os.path.abspath(index_dir))
        if not rel.startswith(".."):
            payload = dict(payload, path_rel=rel)
    return payload


def _rebase(index_dir: str, payload: dict[str, Any]) -> dict[str, Any]:
    rel = payload.get("path_rel")
    if rel:
        base = (index_dir.rstrip("/") if fsutil.has_scheme(index_dir)
                else os.path.abspath(index_dir))
        payload = dict(payload, path=f"{base}/{rel}"
                       if fsutil.has_scheme(index_dir)
                       else os.path.join(base, rel))
    return payload


def write_checkpoint(index_dir: str, phase: str, payload: dict[str, Any]) -> None:
    """Atomic write-then-rename commit of one phase checkpoint (Hadoop
    FileSystem create-overwrite for scheme'd index dirs)."""
    fsutil.mkdirs(_ckpt_dir(index_dir))
    payload = dict(_relativize(index_dir, payload), phase=phase, complete=True)
    fsutil.write_text_atomic(checkpoint_path(index_dir, phase),
                             json.dumps(payload, indent=1, default=str))


def read_checkpoint(index_dir: str, phase: str) -> dict[str, Any] | None:
    p = checkpoint_path(index_dir, phase)
    if not fsutil.exists(p):
        return None
    payload = json.loads(fsutil.read_text(p))
    return _rebase(index_dir, payload) if payload.get("complete") else None


def write_manifest(index_dir: str, cfg, stats: dict[str, Any],
                   levels: list[dict[str, Any]], input_path: str,
                   tombstones: dict[str, Any] | None = None) -> dict[str, Any]:
    """Final manifest = the index's commit point (analog of the Lucene
    segments_N file + the reference's commitTimeMSec commit data).

    `tombstones` ({path, n}) marks doc ids that lost a duplicate-key
    resolution at merge/finalize time and must be subtracted by readers —
    the Lucene live-docs analog: postings keep the bytes until a compaction
    rewrites them (reference resolves every collision before serving,
    SolrReducer.java:80-108)."""
    manifest = {
        "format_version": 1,
        "input": input_path,
        "config": asdict(cfg) if not isinstance(cfg, dict) else cfg,
        "stats": stats,
        "levels": [_relativize(index_dir, lv) for lv in levels],
        "final_level": levels[-1]["level"] if levels else 0,
        "shards": (cfg["shards"] if isinstance(cfg, dict) else cfg.shards),
    }
    if tombstones:
        manifest["tombstones"] = _relativize(index_dir, tombstones)
    fsutil.write_text_atomic(os.path.join(index_dir, "manifest.json"),
                             json.dumps(manifest, indent=1, default=str))
    return manifest


def read_manifest(index_dir: str) -> dict[str, Any]:
    p = os.path.join(index_dir, "manifest.json")
    if not fsutil.exists(p):
        raise FileNotFoundError(p)
    m = json.loads(fsutil.read_text(p))
    m["levels"] = [_rebase(index_dir, lv) for lv in m.get("levels", [])]
    if m.get("tombstones"):
        m["tombstones"] = _rebase(index_dir, m["tombstones"])
    return m


def publish_index(index_dir: str, serving_dir: str) -> dict[str, Any]:
    """Go-live analog (reference GoLiveTool.java:63-192): atomically move a
    committed index into a serving location.

    Layout: serving_dir/snapshots/snap_NNNNNN holds immutable snapshots
    (hardlink trees of the built index — cheap and copy-free on one
    filesystem, falling back to copies across devices); serving_dir/current
    is a symlink to the live snapshot, swapped with an atomic rename so
    readers always see a complete index. Old snapshots are kept for rollback
    (callers prune). Requires a committed manifest — publishing a half-built
    dir fails up front, mirroring the reference's go-live-after-job-success
    gate.

    Snapshot names are max(existing numeric suffix)+1, NOT a count of
    existing dirs: counting would collide with the newest snapshot after a
    caller prunes older ones, silently discarding the fresh snapshot while
    'current' kept serving stale data. Publishing the same manifest twice is
    detected by content (manifest.json byte equality with the live snapshot)
    and returns without creating a new snapshot; an unexpected name collision
    fails loudly instead of deleting anything."""
    import filecmp
    import shutil

    manifest = read_manifest(index_dir)  # raises if not committed
    if fsutil.has_scheme(index_dir) or fsutil.has_scheme(serving_dir):
        return _publish_remote(index_dir, serving_dir, manifest)
    snaps = os.path.join(serving_dir, "snapshots")
    os.makedirs(snaps, exist_ok=True)

    # idempotent rerun: current already serves a snapshot of this exact index
    current = os.path.join(serving_dir, "current")
    if os.path.islink(current):
        live_manifest = os.path.join(os.path.realpath(current), "manifest.json")
        if os.path.isfile(live_manifest) and filecmp.cmp(
                os.path.join(index_dir, "manifest.json"), live_manifest,
                shallow=False):
            return {"serving": current,
                    "snapshot": os.path.realpath(current),
                    "shards": manifest["shards"],
                    "n_docs": manifest["stats"]["n_docs"],
                    "rerun": True}

    nums = [int(e.name[5:]) for e in os.scandir(snaps)
            if e.name.startswith("snap_") and e.name[5:].isdigit()]
    name = f"snap_{(max(nums) + 1 if nums else 0):06d}"
    dst = os.path.join(snaps, name)

    def _link_or_copy(src: str, d: str) -> None:
        try:
            os.link(src, d)
        except OSError:
            shutil.copy2(src, d)

    tmp = dst + ".inprogress"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(index_dir, tmp, copy_function=_link_or_copy)
    if os.path.exists(dst):  # max+1 naming makes this unreachable except
        shutil.rmtree(tmp)   # under a concurrent publisher — fail loudly
        raise FileExistsError(
            f"snapshot {dst} appeared concurrently; retry publish")
    os.replace(tmp, dst)
    # atomic symlink swap: create-then-rename (rename of a symlink is atomic)
    current = os.path.join(serving_dir, "current")
    tmp_link = os.path.join(serving_dir, f".current.{os.getpid()}.tmp")
    if os.path.islink(tmp_link) or os.path.exists(tmp_link):
        os.unlink(tmp_link)
    os.symlink(os.path.join("snapshots", name), tmp_link)
    os.replace(tmp_link, current)
    return {"serving": current, "snapshot": dst,
            "shards": manifest["shards"],
            "n_docs": manifest["stats"]["n_docs"]}


def _publish_remote(index_dir: str, serving_dir: str,
                    manifest: dict[str, Any]) -> dict[str, Any]:
    """publish_index for scheme'd paths (hdfs://, s3a://, file: test double).

    HDFS/S3 have no symlinks, so the live pointer is a ``CURRENT`` file in
    serving_dir containing the snapshot name — the Lucene segments.gen /
    HBase hbase.version pattern. Committed with create(overwrite=True):
    visible-at-close on HDFS, atomic PUT on S3. Readers resolve via
    resolve_current(). Same max+1 naming, same content idempotence, same
    inprogress-then-rename snapshot commit as the local path — but rename
    uses Hadoop FileSystem (atomic dir rename on HDFS).

    Concurrency contract: SINGLE PUBLISHER. The snapshot-dir collision is
    detected (FileExistsError below), but two concurrent publishers could
    still interleave the CURRENT pointer write last-writer-wins — run
    publish from one coordinator, as the reference's go-live does."""
    snaps = serving_dir.rstrip("/") + "/snapshots"
    fsutil.mkdirs(snaps)
    current = serving_dir.rstrip("/") + "/CURRENT"

    my_manifest = fsutil.read_text(
        index_dir.rstrip("/") + "/manifest.json")
    if fsutil.exists(current):
        live = snaps + "/" + fsutil.read_text(current).strip()
        live_mf = live + "/manifest.json"
        if fsutil.exists(live_mf) and fsutil.read_text(live_mf) == my_manifest:
            return {"serving": current, "snapshot": live,
                    "shards": manifest["shards"],
                    "n_docs": manifest["stats"]["n_docs"],
                    "rerun": True}

    nums = [int(n[5:]) for n in fsutil.listdir(snaps)
            if n.startswith("snap_") and n[5:].isdigit()]
    name = f"snap_{(max(nums) + 1 if nums else 0):06d}"
    dst = snaps + "/" + name
    tmp = dst + ".inprogress"
    fsutil.delete(tmp, ignore_missing=True)
    fsutil.copy_dir(index_dir, tmp)
    if fsutil.exists(dst):
        fsutil.delete(tmp, ignore_missing=True)
        raise FileExistsError(
            f"snapshot {dst} appeared concurrently; retry publish")
    fsutil.rename(tmp, dst)
    fsutil.write_text_atomic(current, name + "\n")
    return {"serving": current, "snapshot": dst,
            "shards": manifest["shards"],
            "n_docs": manifest["stats"]["n_docs"]}


def resolve_current(serving_dir: str) -> str:
    """Path of the live snapshot under a serving dir, for either layout:
    local symlink (``current``) or remote pointer file (``CURRENT``)."""
    if not fsutil.has_scheme(serving_dir):
        cur = os.path.join(serving_dir, "current")
        if os.path.islink(cur):
            return os.path.realpath(cur)
    pointer = serving_dir.rstrip("/") + "/CURRENT"
    if fsutil.exists(pointer):
        name = fsutil.read_text(pointer).strip()
        if not name:
            # mid-commit on a filesystem whose pointer swap isn't atomic:
            # fail with a clear retryable error, never resolve 'snapshots/'
            raise RuntimeError(
                f"CURRENT pointer at {pointer} is empty (commit in flight "
                "or torn); retry")
        return serving_dir.rstrip("/") + "/snapshots/" + name
    raise FileNotFoundError(f"no live snapshot under {serving_dir}")
