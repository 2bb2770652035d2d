"""Point-in-time snapshots of an encoded store — O(metadata) hard links.

``container_files(max_generation=...)`` gives GENERATION-level snapshots that
see through appends but not through in-place rewrites (delete/repair/upsert
fold generations into fresh base containers and stamp ``snapshot_watermark``).
This module is the delete-proof complement its docstring points at: a
snapshot HARD-LINKS every recorded container into
``<store>/_snapshots/<name>/`` and copies the (small) manifest + run record,
so the snapshot directory IS a fully valid, self-contained store — decode,
scan, lookup, fsck, and family queries all work on it unchanged.

Why links survive rewrites: every container write in this engine is
atomic-by-rename (``write_container_atomic``: tmp + ``os.replace``), so an
in-place rewrite never mutates the old inode — it unlinks the NAME and points
it at a new file, while the snapshot's link keeps the old bytes alive. Cost
is therefore one directory entry per container at snapshot time and, after a
rewrite, only the storage delta between versions — the classic copy-on-write
table-format trick (Iceberg/Delta snapshot semantics) expressed with nothing
but POSIX links, which also makes it work per-node on any shared POSIX mount
a multi-node store would sit on. On filesystems without hard-link support
(or cross-device ``_snapshots`` symlinks) the link falls back to a byte copy,
trading space for the same semantics.

Restore is the inverse: re-link the snapshot's containers over the store's
current names (atomic per container via the same tmp + ``os.replace``),
restore the manifest records and run record, then drop files the snapshot
doesn't know. A crash mid-restore leaves some partitions new and some old,
but every manifest record carries its container's crc32, so ``fsck`` flags
the mix loudly and re-running the restore finishes it — the same
"untouched, loudly invalid, or finished" contract the delete path keeps.

The snapshot registry is the directory listing itself — no extra index file
to corrupt; ``snapshot.json`` inside each snapshot carries provenance only.

Reference parity note: the reference (sami5001/parquet-converter) has no
store lifecycle at all (one-shot file conversion, converter.py); snapshots
are part of the beyond-reference store lifecycle this engine adds
(append/delete/upsert/compact/fsck/snapshot/restore).
"""

from __future__ import annotations

import json
import os
import re
import shutil

from . import manifest as mf

_SNAPDIR = "_snapshots"
_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,63}$")


def snapshots_root(out_dir: str) -> str:
    return os.path.join(out_dir, _SNAPDIR)


def snapshot_path(out_dir: str, name: str) -> str:
    return os.path.join(snapshots_root(out_dir), name)


def _link_or_copy(src: str, dst: str) -> bool:
    """Hard-link src to dst, falling back to a byte copy (cross-device or
    linkless filesystems). Returns True when a link was made."""
    try:
        os.link(src, dst)
        return True
    except OSError:
        shutil.copy2(src, dst)
        return False


def snapshot_store(out_dir: str, name: str | None = None) -> dict:
    """Create a named point-in-time snapshot of the store (see module doc).

    The snapshot is built in a temp directory and PUBLISHED by one atomic
    rename, so a crashed snapshot never leaves a half-readable name — only a
    ``.tmp`` directory a later snapshot call sweeps."""
    recs = mf.load_records(out_dir)
    if not recs:
        raise ValueError(f"no manifest records in {out_dir} — nothing to snapshot")
    prior = mf.load_run_record(out_dir)
    if prior is None:
        raise ValueError(f"no run record in {out_dir} — snapshot needs an encoded store")

    root = snapshots_root(out_dir)
    os.makedirs(root, exist_ok=True)
    # sweep debris from crashed snapshot builds (never a published snapshot)
    for d in os.listdir(root):
        if d.endswith(".tmp"):
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    if name is None:
        taken = {d for d in os.listdir(root)}
        i = 1
        while f"s{i:04d}" in taken:
            i += 1
        name = f"s{i:04d}"
    if not _NAME_RE.match(name):
        raise ValueError(f"snapshot name {name!r} must match {_NAME_RE.pattern}")
    snap = snapshot_path(out_dir, name)
    if os.path.exists(snap):
        raise ValueError(f"snapshot {name!r} already exists in {out_dir}")

    from .decode import resolve_container_path

    tmp = snap + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "_manifest"))
    linked = 0
    for r in recs:
        src = resolve_container_path(out_dir, r)
        linked += _link_or_copy(src, os.path.join(tmp, os.path.basename(r["path"])))
        rp = mf.record_path(out_dir, int(r["part_id"]), int(r.get("generation", 0)))
        shutil.copy2(rp, os.path.join(tmp, "_manifest", os.path.basename(rp)))
    shutil.copy2(mf.run_record_path(out_dir), mf.run_record_path(tmp))
    summary = mf.consolidate(tmp)
    meta = {
        "name": name,
        "source": os.path.abspath(out_dir),
        "containers": len(recs),
        "hard_linked": linked,
        "rows": summary["rows"],
        "bytes_out": summary["bytes_out"],
    }
    with open(os.path.join(tmp, "snapshot.json"), "w") as f:
        json.dump(meta, f, indent=2)
    os.rename(tmp, snap)  # atomic publish
    return {**meta, "path": snap}


def list_snapshots(out_dir: str) -> list[dict]:
    """Published snapshots of a store, oldest-name first."""
    root = snapshots_root(out_dir)
    out = []
    if not os.path.isdir(root):
        return out
    for d in sorted(os.listdir(root)):
        meta_p = os.path.join(root, d, "snapshot.json")
        if d.endswith(".tmp") or not os.path.isfile(meta_p):
            continue
        with open(meta_p) as f:
            meta = json.load(f)
        out.append({**meta, "path": os.path.join(root, d)})
    return out


def drop_snapshot(out_dir: str, name: str) -> dict:
    """Delete a snapshot; container bytes shared with the live store (or
    other snapshots) survive — only this snapshot's links go."""
    snap = snapshot_path(out_dir, name)
    if not os.path.isfile(os.path.join(snap, "snapshot.json")):
        raise ValueError(f"no snapshot {name!r} in {out_dir}")
    shutil.rmtree(snap)
    return {"name": name, "dropped": True}


def restore_snapshot(out_dir: str, name: str) -> dict:
    """Roll the live store back to a snapshot (see module doc for the
    crash contract). The snapshot itself is left untouched, so a restore can
    be re-run or itself rolled forward again later."""
    snap = snapshot_path(out_dir, name)
    srecs = mf.load_records(snap)
    if not srecs:
        raise ValueError(f"no snapshot {name!r} in {out_dir} (or it has no records)")

    want = set()
    for r in srecs:
        base = os.path.basename(r["path"])
        want.add(base)
        src = os.path.join(snap, base)
        tmp = os.path.join(out_dir, base + ".restoretmp")
        try:
            os.remove(tmp)
        except OSError:
            pass
        _link_or_copy(src, tmp)
        os.replace(tmp, os.path.join(out_dir, base))
    shutil.copy2(mf.run_record_path(snap), mf.run_record_path(out_dir))
    # manifest records: drop everything current, copy the snapshot's set
    mdir = mf.manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    for f_ in os.listdir(mdir):
        os.remove(os.path.join(mdir, f_))
    for f_ in os.listdir(mf.manifest_dir(snap)):
        shutil.copy2(os.path.join(mf.manifest_dir(snap), f_), os.path.join(mdir, f_))
    # drop live containers the snapshot doesn't know (post-snapshot appends,
    # rewrites the replace above already superseded keep their new inode
    # only via the snapshot names — stale extras would trip the stray guard)
    import glob as _glob

    removed = 0
    for p in _glob.glob(os.path.join(out_dir, "part-*.pcc")):
        if os.path.basename(p) not in want:
            os.remove(p)
            removed += 1
    summary = mf.consolidate(out_dir)
    return {
        "name": name,
        "restored_containers": len(want),
        "removed_containers": removed,
        "rows": summary["rows"],
    }
