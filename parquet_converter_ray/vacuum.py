"""Space reclamation for an encoded store: ``vacuum`` sweeps the debris the
crash-safe lifecycle can leave behind and applies snapshot retention.

What it removes, and why each removal is safe:

* ``part-*.pcc.tmp`` — a crashed ``write_container_atomic`` (tmp write +
  ``os.replace``). The tmp name is never referenced by any manifest record
  and never read; the publish either happened (the real name exists) or the
  write never landed anywhere. Always safe.
* record-less generation containers — a delete/upsert crash between the
  contract's record-drop and file-removal steps. These may hold rows that
  exist NOWHERE else, so vacuum does NOT delete them directly: it runs
  ``repair_store`` first (the step-1 fold decides keep-vs-drop exactly via
  the base record's content-addressed ``folded`` map), which merges any
  surviving rows into fresh base containers and unlinks the leftovers
  itself. A no-op on a healthy store.
* remaining strays — ``part-*.pcc`` files the manifest does not reference
  even after repair (typically a previous, larger run's partitions in a
  reused out_dir). They hold data with no lineage, so vacuum only REPORTS
  them unless ``force_strays=True`` — the same refuse-by-default posture as
  the stray-container read guard.
* old snapshots — ``keep_snapshots=N`` drops all but the N most recently
  published (publish order = directory mtime of the atomic rename).
  Container bytes shared with the live store or other snapshots survive:
  dropping a snapshot only removes its hard links.

Everything is O(directory listing) except the repair, which touches only
partitions with leftovers. ``dry_run=True`` reports without removing.

Reference parity note: the reference (sami5001/parquet-converter) is a
one-shot converter with no store lifecycle; vacuum belongs to the
beyond-reference lifecycle surface (append/delete/upsert/compact/snapshot/
fsck) this engine adds.
"""

from __future__ import annotations

import glob
import os

from . import manifest as mf


def vacuum_store(
    out_dir: str,
    *,
    keep_snapshots: int | None = None,
    force_strays: bool = False,
    dry_run: bool = False,
) -> dict:
    """Sweep tmp debris, fold crash leftovers (via ``repair_store``), apply
    snapshot retention, and report what was reclaimed. See module doc for
    the safety argument per class of file."""
    if not os.path.isdir(out_dir):
        raise ValueError(f"{out_dir}: not a directory")
    report: dict = {
        "tmp_removed": 0,
        "repair": None,
        "strays": [],
        "strays_removed": 0,
        "snapshots_dropped": [],
        "bytes_reclaimed": 0,
        "dry_run": bool(dry_run),
    }

    # 1. crashed atomic writes: never referenced, never needed
    for p in sorted(glob.glob(os.path.join(out_dir, "part-*.pcc.tmp"))):
        report["bytes_reclaimed"] += os.path.getsize(p)
        report["tmp_removed"] += 1
        if not dry_run:
            os.remove(p)

    # 2. record-less generation leftovers: recovered by the repair fold,
    #    which removes the files itself once their rows are safe in a base
    recs = mf.load_records(out_dir)
    if recs and not dry_run:
        from .encode import repair_store

        report["repair"] = repair_store(out_dir)

    # 3. strays the manifest (still) does not reference: report, remove only
    #    on explicit request — they hold data with no lineage
    if recs:
        referenced = set()
        for r in mf.load_records(out_dir):
            from .decode import resolve_container_path

            referenced.add(os.path.abspath(resolve_container_path(out_dir, r)))
        for p in sorted(glob.glob(os.path.join(out_dir, "part-*.pcc"))):
            if os.path.abspath(p) in referenced:
                continue
            report["strays"].append(os.path.basename(p))
            if force_strays:
                report["bytes_reclaimed"] += os.path.getsize(p)
                report["strays_removed"] += 1
                if not dry_run:
                    os.remove(p)

    # 4. snapshot retention: keep the N most recently published
    if keep_snapshots is not None:
        if keep_snapshots < 0:
            raise ValueError("keep_snapshots must be >= 0")
        from .snapshot import drop_snapshot, list_snapshots

        snaps = list_snapshots(out_dir)
        snaps.sort(key=lambda s: os.path.getmtime(s["path"]))  # oldest first
        excess = snaps[: max(0, len(snaps) - keep_snapshots)]
        for s in excess:
            report["snapshots_dropped"].append(s["name"])
            # reclaimed bytes = this snapshot's links whose inode is not
            # shared with anything else (nlink == 1)
            for p in glob.glob(os.path.join(s["path"], "part-*.pcc")):
                try:
                    if os.stat(p).st_nlink == 1:
                        report["bytes_reclaimed"] += os.path.getsize(p)
                except OSError:
                    pass
            if not dry_run:
                drop_snapshot(out_dir, s["name"])
    return report
