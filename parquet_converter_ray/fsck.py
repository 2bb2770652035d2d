"""Store integrity check (``pcr fsck``): manifest <-> containers <-> bytes.

Two levels, both manifest-driven:

* **meta** (default) — driver-side metadata pass, no data bytes read: run
  record present and sane, every lineage record resolves to a container of
  the recorded size, footers parse (tail seek only) and agree with their
  record (part_id, generation, rows) and with each other (one store schema),
  no stray ``part-*.pcc`` the manifest doesn't know.
* **deep** — a Ray stage over the containers (one task per file, scales with
  the cluster, never loops file bytes on the driver): whole-payload crc32 vs
  the lineage record, per-buffer crc32s vs the footer, full decode, decoded
  row count vs the record.

A clean report means ``decode_dataset`` / ``lookup_conversation`` /
``append_dataset`` can trust the store; any error pinpoints the partition.
The reference has no integrity surface at all (a torn parquet write is
discovered at read time, reference converter.py writes directly to the
final path).
"""

from __future__ import annotations

import glob
import os
import zlib

import pyarrow as pa

from . import manifest as mf
from .container import read_footer_file
from .decode import resolve_container_path


def fsck_store(out_dir: str, deep: bool = False) -> dict:
    """Check an encoded store; returns ``{ok, parts, errors, deep_checked}``.

    ``errors`` is a list of human-readable strings, each naming the partition
    or file it concerns; ``ok`` is True only when the list is empty."""
    errors: list[str] = []
    recs = mf.load_records(out_dir)
    if not recs:
        return {
            "ok": False,
            "parts": 0,
            "errors": [f"no manifest records under {out_dir} — not an encoded store?"],
            "deep_checked": 0,
        }
    run = mf.load_run_record(out_dir)
    if run is None:
        errors.append(f"missing run record {mf.run_record_path(out_dir)}")
    else:
        for key in mf.RUN_PARAM_KEYS:
            if key not in run:
                errors.append(f"run record lacks parameter {key!r}")

    resolved: list[tuple[dict, str]] = []
    schema_sig: tuple | None = None
    for r in recs:
        tag = f"part {r.get('part_id')} gen {r.get('generation', 0)}"
        try:
            path = resolve_container_path(out_dir, r)
        except FileNotFoundError:
            errors.append(f"{tag}: container file missing ({r.get('path')})")
            continue
        try:
            size = os.path.getsize(path)
        except OSError as e:
            errors.append(f"{tag}: cannot stat {path}: {e}")
            continue
        if size != r.get("bytes_out"):
            errors.append(f"{tag}: size {size} != recorded bytes_out {r.get('bytes_out')}")
            continue
        try:
            footer = read_footer_file(path)
        except (ValueError, OSError) as e:
            errors.append(f"{tag}: unreadable footer in {path}: {e}")
            continue
        if footer.get("part_id") != r.get("part_id"):
            errors.append(f"{tag}: footer part_id {footer.get('part_id')} != record")
        if footer.get("generation", 0) != r.get("generation", 0):
            errors.append(f"{tag}: footer generation {footer.get('generation', 0)} != record")
        if footer.get("rows") != r.get("rows"):
            errors.append(f"{tag}: footer rows {footer.get('rows')} != recorded {r.get('rows')}")
        sig = tuple((c["name"], c["type"]) for c in footer["columns"])
        if schema_sig is None:
            schema_sig = sig
        elif sig != schema_sig:
            errors.append(f"{tag}: schema {sig} differs from the store schema {schema_sig}")
        resolved.append((r, path))

    stray = set(glob.glob(os.path.join(out_dir, "part-*.pcc"))) - {p for _, p in resolved} - {
        r.get("path") for r in recs
    }
    for s in sorted(stray):
        errors.append(f"stray container not in manifest: {s}")

    deep_checked = 0
    if deep and resolved:
        import ray.data

        items = [
            {"path": p, "part_id": int(r["part_id"]), "generation": int(r.get("generation", 0)),
             "rows": int(r["rows"]), "crc32": int(r.get("crc32", 0))}
            for r, p in resolved
        ]

        def _check(batch: pa.Table) -> pa.Table:
            from .container import decode_table
            from .encode import pin_arrow_threads

            pin_arrow_threads(1)
            msgs, parts = [], []
            for row in batch.to_pylist():
                tag = f"part {row['part_id']} gen {row['generation']}"
                msg = ""
                try:
                    with open(row["path"], "rb") as f:
                        data = f.read()
                    if row["crc32"] and (zlib.crc32(data) & 0xFFFFFFFF) != row["crc32"]:
                        msg = f"{tag}: payload crc32 mismatch (bit rot?)"
                    else:
                        t = decode_table(data, verify_crc=True)
                        if t.num_rows != row["rows"]:
                            msg = f"{tag}: decoded {t.num_rows} rows != recorded {row['rows']}"
                except (OSError, ValueError, KeyError) as e:
                    msg = f"{tag}: deep check failed: {e}"
                msgs.append(msg)
                parts.append(row["part_id"])
            return pa.table({"part_id": pa.array(parts, type=pa.int32()),
                             "error": pa.array(msgs, type=pa.string())})

        results = (
            ray.data.from_items(items)
            .map_batches(_check, batch_format="pyarrow", batch_size=1)
            .take_all()
        )
        deep_checked = len(results)
        errors.extend(r["error"] for r in results if r["error"])

    return {"ok": not errors, "parts": len(recs), "errors": errors, "deep_checked": deep_checked}
