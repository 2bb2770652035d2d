"""Encode pipeline: Dataset -> hash-partition -> per-partition sort -> codec -> containers.

Ray-Data-first shape (SURVEY.md §7.2 step 5-7):

    read_parquet(input)
      -> map_batches(assign_part_id)            # vectorized stable hash + salt
      -> [resume filter]                        # broadcast done-set, vectorized is_in
      -> groupby("part_id").map_groups(encode)  # THE one all-to-all shuffle;
                                                #   each partition encoded atomically:
                                                #   sort by (conv_id, turn_idx),
                                                #   per-column sampled cost model,
                                                #   per-partition FSST tables/dicts,
                                                #   atomic container write + lineage
      -> tiny lineage dataset -> manifest.jsonl

The group step holds per-partition encoder state (FSST symbol table, dictionary)
for exactly one partition at a time, which is the memory-bounded alternative to
fighting batch->actor affinity (SURVEY.md §7.5). Partition size is bounded by
``salt_rows`` chunking of mega-conversations, so the 10^12-turn scale story is:
more partitions, same per-partition working set.
"""

from __future__ import annotations

import os
import time
import zlib
from typing import Callable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from . import manifest as mf
from .container import encode_table, pack_container, write_container_atomic
from .partition import assign_part_id
from .pipelines._util import read_parquet_clean

TARGET_PART_BYTES = 96 << 20  # in-memory arrow bytes per partition (upper bound)

_ARROW_PINNED = False


def _default_n_parts(est_bytes: int, cpus: int) -> int:
    """Partition count: 2 waves per CPU for scheduling slack, but never let a
    partition exceed TARGET_PART_BYTES (the per-encoder working-set bound that
    governs at 100 TB). Measured on the 9.6M-turn bench at 32 CPUs: 64-96
    parts ~13s, 136 parts 17-22s, 320 parts 85s — the push-based sort shuffle
    degrades sharply with reduce-partition count, so use the FEWEST partitions
    that pack the CPUs and bound memory."""
    return max(2 * cpus, -(-est_bytes // TARGET_PART_BYTES))


def _clean_output_dir(out_dir: str) -> None:
    """Remove stale encode outputs (containers, manifests, run record) so a
    fresh run never mixes with a previous one's leftovers."""
    import glob
    import shutil

    for f in glob.glob(os.path.join(out_dir, "part-*.pcc")):
        os.remove(f)
    shutil.rmtree(mf.manifest_dir(out_dir), ignore_errors=True)
    for name in ("manifest.jsonl", "_run.json"):
        p = os.path.join(out_dir, name)
        if os.path.exists(p):
            os.remove(p)


def pin_arrow_threads(n: int = 1) -> None:
    """Pin pyarrow's per-process thread pools inside Ray workers.

    Every worker process otherwise sizes Arrow's pool to ALL machine cores, so
    32 concurrent tasks spawn ~32x32 compute threads and the encode stage runs
    SLOWER at higher parallelism (measured 2x). Ray already provides the
    process-level parallelism; Arrow kernels should stay single-threaded."""
    global _ARROW_PINNED
    if not _ARROW_PINNED:
        pa.set_cpu_count(n)
        pa.set_io_thread_count(max(n, 1))
        _ARROW_PINNED = True


class EncodePartition:
    """Per-partition encoder: sort, pick codecs (sampled cost model), write container.

    Called by ``groupby("part_id").map_groups`` with the full partition as one
    Arrow table. Returns a one-row lineage table.
    """

    def __init__(
        self,
        out_dir: str,
        codec: str | dict = "auto",
        sort_key: Sequence[str] = ("conv_id", "turn_idx"),
        fault_hook: Callable[[int], None] | None = None,
        generation: int = 0,
        bound_cols: "frozenset[str]" = frozenset(),
        bloom_cols: "frozenset[str]" = frozenset(),
        text_bloom_cols: "frozenset[str]" = frozenset(),
    ):
        self.out_dir = out_dir
        self.codec = codec
        self.sort_key = list(sort_key)
        self.fault_hook = fault_hook
        self.generation = int(generation)
        self.bound_cols = frozenset(bound_cols)  # force zone-map bounds (range-cluster string cols)
        self.bloom_cols = frozenset(bloom_cols)  # per-container Bloom filters (point-lookup pruning)
        self.text_bloom_cols = frozenset(text_bloom_cols)  # token blooms (hastok full-text pruning)

    def __call__(self, group: pa.Table) -> pa.Table:
        pin_arrow_threads(1)
        # the sort-exchange delivers groups as hundreds of tiny chunks; every
        # downstream kernel crawls on chunked input — flatten ONCE up front
        n_chunks = group.column(0).num_chunks
        group = group.combine_chunks()
        part_id = int(group["part_id"][0].as_py())
        return self.encode_one(part_id, group.drop_columns(["part_id"]), n_chunks)

    def encode_one(
        self, part_id: int, table: pa.Table, n_chunks: int = 1, folded: dict | None = None
    ) -> pa.Table:
        t0 = time.monotonic()
        t_comb = time.monotonic()
        if self.fault_hook is not None:
            self.fault_hook(part_id)
        sort_cols = [c for c in self.sort_key if c in table.column_names]
        if sort_cols:
            table = table.sort_by([(c, "ascending") for c in sort_cols])
        t_sort = time.monotonic()
        blobs = encode_table(table, codec=self.codec)
        t_enc = time.monotonic()
        from .zonemap import column_stats

        stats = column_stats(
            table, {name: blob.codec for name, blob in blobs.items()}, bound_cols=self.bound_cols
        )
        from .zonemap import page_stats

        pages = page_stats(table)
        blooms = None
        if self.bloom_cols:
            from .bloom import build_blooms

            blooms = build_blooms(table, self.bloom_cols)
        if self.text_bloom_cols:
            from .bloom import build_token_blooms

            blooms = {**(blooms or {}), **build_token_blooms(table, self.text_bloom_cols)}
        payload = pack_container(
            blobs,
            extra={"part_id": part_id, "rows": table.num_rows, "sort_key": sort_cols,
                   "generation": self.generation, "stats": stats,
                   **({"pages": pages} if pages else {})},
            blooms=blooms,
        )
        gsuf = f"-g{self.generation:04d}" if self.generation else ""
        path = os.path.join(self.out_dir, f"part-{part_id:05d}{gsuf}.pcc")
        write_container_atomic(path, payload)
        timings = {
            "in_chunks": n_chunks,
            "combine": round(t_comb - t0, 2),
            "sort": round(t_sort - t_comb, 2),
            "encode": round(t_enc - t_sort, 2),
            "write": round(time.monotonic() - t_enc, 2),
        }
        rec = mf.LineageRecord(
            part_id=part_id,
            rows=table.num_rows,
            bytes_in=table.nbytes,
            bytes_out=len(payload),
            codecs={name: blob.codec for name, blob in blobs.items()},
            crc32=zlib.crc32(payload) & 0xFFFFFFFF,
            wall_s=time.monotonic() - t0,
            path=path,
            timings=timings,
            generation=self.generation,
            stats=stats,
            folded=folded or {},
        )
        mf.write_record(self.out_dir, rec)
        import json

        return pa.table(
            {
                "part_id": pa.array([rec.part_id], type=pa.int32()),
                "rows": pa.array([rec.rows], type=pa.int64()),
                "bytes_in": pa.array([rec.bytes_in], type=pa.int64()),
                "bytes_out": pa.array([rec.bytes_out], type=pa.int64()),
                "codecs": pa.array([json.dumps(rec.codecs)], type=pa.string()),
                "wall_s": pa.array([rec.wall_s], type=pa.float64()),
            }
        )


class EncodePages(EncodePartition):
    """Reduce side of the page shuffle: unpack the partition's pages (plain +
    zstd-transport mini-containers), concat, then encode like EncodePartition."""

    def __call__(self, group: pa.Table) -> pa.Table:
        pin_arrow_threads(1)
        from .container import decode_table

        part_id = int(group["part_id"][0].as_py())
        pages = group["page"]
        if isinstance(pages, pa.ChunkedArray):
            pages = pages.combine_chunks()
        tables = [decode_table(p.as_py()) for p in pages]
        table = pa.concat_tables(tables).combine_chunks()
        return self.encode_one(part_id, table, n_chunks=len(tables))


def make_page_packer(
    n_parts: int, conv_col: str, order_col: str, salt_rows: int
) -> Callable[[pa.Table], pa.Table]:
    """Map-side page packer: split each batch by part_id and pack every slice
    as a plain+zstd mini-container ("page"). Shuffle compression: the exchange
    then moves ~3x fewer bytes for text-heavy tables at ~2 CPU-s/GB (zstd-3),
    which is what keeps the all-to-all off the single-node memcpy ceiling."""
    import numpy as np
    import pyarrow.compute as pc

    def pack(batch: pa.Table) -> pa.Table:
        pin_arrow_threads(1)
        batch = assign_part_id(
            batch, n_parts, conv_col=conv_col, order_col=order_col, salt_rows=salt_rows
        )
        pid = batch["part_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(pid, kind="stable")
        batch = batch.take(pa.array(order))
        pid = pid[order]
        change = np.nonzero(pid[1:] != pid[:-1])[0] + 1
        starts = np.concatenate(([0], change, [len(pid)]))
        part_ids, pages, rows = [], [], []
        for i in range(len(starts) - 1):
            a, b = int(starts[i]), int(starts[i + 1])
            slice_tbl = batch.slice(a, b - a).combine_chunks().drop_columns(["part_id"])
            payload = pack_container(encode_table(slice_tbl, codec="plain"))
            part_ids.append(int(pid[a]))
            pages.append(payload)
            rows.append(b - a)
        return pa.table(
            {
                "part_id": pa.array(part_ids, type=pa.int32()),
                "page": pa.array(pages, type=pa.large_binary()),
                "rows": pa.array(rows, type=pa.int64()),
            }
        )

    return pack


def _range_cuts(
    ds, cluster_by: list[str], n_parts: int, per_batch: int = 512
) -> tuple[list, dict | None]:
    """Deterministic layout parameters for range clustering: every batch
    contributes an evenly-strided sample of its rows' cluster values (bounded
    at ``per_batch`` rows), the driver merges them and takes the n_parts-1
    evenly-spaced order statistics of the cluster KEY — the raw comparable
    value for one numeric column, the Z-order key for several (per-column
    [min, max] spans come from the same sample and are returned as ``norm`` —
    the recorded layout contract ``assign_part_id_range`` replays). A
    string/binary cluster column samples fixed 32-byte prefixes; the driver
    computes the sample's common-prefix length (``skip``) and keys on the 6
    bytes after it (48 bits — float64-exact through the JSON round trip),
    recording ``{"skip", "span"}`` in ``norm`` so assignment and appends
    replay the identical layout. Driver state is batches x per_batch rows —
    bounded, independent of row count. Ties in a skewed domain collapse to
    fewer distinct cuts (recorded as-is: some buckets simply stay empty)."""
    from .partition import (
        STR_KEY_BYTES,
        STR_SAMPLE_BYTES,
        cluster_key_array,
        is_strlike,
        matrix_keys,
        prefix_matrix,
        zorder_keys,
    )

    def sample(batch: pa.Table) -> pa.Table:
        arrs, mask = [], None
        sort0 = None
        for i, name in enumerate(cluster_by):
            col = batch[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if is_strlike(col.type):
                m = prefix_matrix(col, STR_SAMPLE_BYTES)
                arrs.append(("str", m))
                if i == 0:
                    sort0 = matrix_keys(m[:, :STR_KEY_BYTES])
            else:
                a = cluster_key_array(col)
                arrs.append(("num", a))
                if i == 0:
                    sort0 = a
            if col.null_count:
                nm = pc.is_null(col).to_numpy(zero_copy_only=False)
                mask = nm if mask is None else (mask | nm)
        keep = ~mask if mask is not None else np.ones(batch.num_rows, bool)
        order = np.argsort(sort0[keep], kind="stable")
        stride = max(1, int(keep.sum()) // per_batch)
        take = order[::stride]
        cols = {}
        for i, (kind, a) in enumerate(arrs):
            picked = a[keep][take]
            if kind == "str":
                cols[f"v{i}"] = pa.Array.from_buffers(
                    pa.binary(STR_SAMPLE_BYTES),
                    len(picked),
                    [None, pa.py_buffer(np.ascontiguousarray(picked).tobytes())],
                )
            else:
                cols[f"v{i}"] = pa.array(picked)
        return pa.table(cols)

    def _fsb_matrix(arr) -> np.ndarray:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        buf = arr.buffers()[1]
        w = STR_SAMPLE_BYTES
        return np.frombuffer(buf, dtype=np.uint8)[arr.offset * w : (arr.offset + len(arr)) * w].reshape(-1, w)

    parts = list(
        ds.select_columns(list(cluster_by))
        .map_batches(sample, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    str_col = [bool(parts) and pa.types.is_fixed_size_binary(parts[0][f"v{i}"].type) for i in range(len(cluster_by))]
    merged: list[np.ndarray] = []
    if parts:
        for i in range(len(cluster_by)):
            if str_col[i]:
                merged.append(np.concatenate([_fsb_matrix(t[f"v{i}"]) for t in parts]))
            else:
                merged.append(np.concatenate([t[f"v{i}"].to_numpy(zero_copy_only=False) for t in parts]))
    if not parts or not len(merged[0]):
        merged = [
            np.zeros((1, STR_SAMPLE_BYTES), np.uint8) if s else np.zeros(1)
            for s in str_col or [False for _ in cluster_by]
        ]

    # string columns: common-prefix skip + 48-bit keys from the sample
    norm: dict = {}
    keyed: list[np.ndarray] = []
    for c, s, v in zip(cluster_by, str_col, merged):
        if s:
            diffs = (v != v[0]).any(axis=0)
            skip = int(np.argmax(diffs)) if diffs.any() else STR_SAMPLE_BYTES
            skip = min(skip, STR_SAMPLE_BYTES - STR_KEY_BYTES)
            k = matrix_keys(v[:, skip : skip + STR_KEY_BYTES])
            norm[c] = {"skip": skip, "span": [float(k.min()), float(k.max())]}
            keyed.append(k)
        else:
            keyed.append(v)

    if len(cluster_by) == 1:
        keys = keyed[0]
    else:
        for c, s, v in zip(cluster_by, str_col, keyed):
            if not s:
                norm[c] = [float(v.min()), float(v.max())]
        keys = zorder_keys(
            keyed,
            [tuple(norm[c]["span"]) if isinstance(norm[c], dict) else tuple(norm[c]) for c in cluster_by],
        )
    keys = np.sort(keys)
    idx = np.clip((len(keys) * np.arange(1, n_parts)) // n_parts, 0, len(keys) - 1)
    return [x.item() for x in np.unique(keys[idx])], (norm or None)


def encode_dataset(
    source: "ray.data.Dataset | str | list[str]",
    out_dir: str,
    *,
    n_parts: int | None = None,
    codec: str | dict = "auto",
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    sort_key: Sequence[str] = ("conv_id", "turn_idx"),
    salt_rows: int = 100_000,
    resume: bool = False,
    page_shuffle: bool = False,
    shuffle_strategy: str | None = None,
    cluster_by: str | None = None,
    bloom_cols: "Sequence[str] | None" = None,
    text_bloom_cols: "Sequence[str] | None" = None,
    fault_hook: Callable[[int], None] | None = None,
) -> dict:
    """Run the encode pipeline; returns the consolidated manifest summary.

    ``resume=True`` skips partitions already recorded in ``out_dir/_manifest``
    (partition assignment is a pure function of row content, so a resumed run
    reproduces the remaining partitions byte-for-byte).

    ``cluster_by=COL`` switches partition assignment from conv-hash to RANGE
    clustering on a numeric/temporal column: cut points are sampled once
    (order statistics of a bounded per-batch sample), recorded in
    ``_run.json`` (``partition_mode: "range"``, ``range_cuts``), and every
    partition then covers a disjoint value range — so the zone maps written
    per container actually PRUNE range predicates on that column
    (``scan_store`` level 1), which a hash layout never can (every hash
    partition spans the full domain). The layout trade: conv-key point
    lookup loses its hash route (``lookup_conversation`` refuses; use
    ``scan_store``), while delete/append stay correct (delete probes all
    partitions, append reuses the recorded cuts). Resume reuses the recorded
    cuts — never resamples.

    ``page_shuffle=True`` compresses the exchange: the map side packs each
    (block, partition) slice into a plain+zstd mini-container so the all-to-all
    moves ~3x fewer bytes, and the reduce side unpacks before the final encode
    — byte-identical output (tested). On a NETWORK-bound multi-node cluster
    this is the right trade; on this single-node sandbox the push-based local
    exchange is already cheap, so the extra pack/unpack CPU loses (measured)
    and the default stays row-wise.
    """
    os.makedirs(out_dir, exist_ok=True)
    from .partition import HASH_VERSION

    prior = mf.load_run_record(out_dir)
    if not resume and (prior is not None or mf.completed_parts(out_dir)):
        # a fresh (non-resume) encode into a previously used out_dir would
        # otherwise leave stale containers that decode silently mixes in
        _clean_output_dir(out_dir)
        prior = None
    if resume and prior is None and mf.completed_parts(out_dir):
        # completed containers exist but no _run.json (a run interrupted
        # before the run record was introduced, or a corrupted out_dir): the
        # completed parts' partitioning is unknowable, so re-deriving n_parts /
        # the row hash here would silently reassign rows while skipping
        # "completed" ones — exactly the duplication/loss the run record guards
        raise ValueError(
            f"resume=True but {out_dir} has completed partitions and no run "
            f"record ({mf.run_record_path(out_dir)}); the original "
            f"partitioning parameters are unknowable. Start fresh with "
            f"resume=False (cleans the output dir)."
        )
    if resume and prior is not None and n_parts is None:
        # the default n_parts is a function of cluster size + size estimate;
        # a resume MUST reuse the original partitioning or rows silently move
        n_parts = int(prior["n_parts"])
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    if isinstance(source, (str, list)):
        est = read_parquet_clean(source).size_bytes() or (64 << 20)
        if n_parts is None:
            n_parts = _default_n_parts(est, cpus)
        # the sort-shuffle's map-side parallelism follows the upstream block
        # count: coarse input files serialize the exchange (measured ~8x
        # slower), so split at the READ (a driver-side repartition would cost
        # a second exchange); 3 blocks/CPU measured best vs 1.5/2/4
        ds = read_parquet_clean(source, override_num_blocks=max(3 * cpus, n_parts))
    else:
        ds = source
        if n_parts is None:
            est = ds.size_bytes() or (64 << 20)
            n_parts = _default_n_parts(est, cpus)

    schema_names = ds.schema().names
    if conv_col not in schema_names:
        raise ValueError(
            f"partition key column {conv_col!r} not in schema {schema_names}; "
            "pass conv_col= (string or integer column)"
        )
    if cluster_by is not None:
        cluster_by = [cluster_by] if isinstance(cluster_by, str) else list(cluster_by)
        if page_shuffle:
            raise ValueError("cluster_by and page_shuffle are mutually exclusive")
        missing_cluster = [c for c in cluster_by if c not in schema_names]
        if missing_cluster:
            raise ValueError(
                f"cluster_by column(s) {missing_cluster} not in schema {schema_names}"
            )
        # a range-clustered partition sorts by its cluster column(s) FIRST
        # (caller keys stay as tie-breakers): per-container zone-map bounds
        # tighten from partition-wide to row-range, and scan_store's
        # sorted-lead binary search engages on range predicates instead of
        # full-decoding every candidate container. Recorded in _run.json as
        # the effective sort key, so append/delete rewrites replay it.
        sort_key = list(cluster_by) + [c for c in sort_key if c not in cluster_by]

    range_cuts: list | None = None
    cluster_norm: dict | None = None
    if cluster_by is not None:
        if resume and prior is not None:
            # resampling on resume would silently reassign rows — the cuts
            # (and multi-column spans) recorded by the original run ARE the
            # layout
            range_cuts = list(prior.get("range_cuts") or [])
            cluster_norm = prior.get("cluster_norm")
        else:
            range_cuts, cluster_norm = _range_cuts(ds, cluster_by, n_parts)

    if bloom_cols:
        bloom_cols = [bloom_cols] if isinstance(bloom_cols, str) else list(bloom_cols)
        missing_bloom = [c for c in bloom_cols if c not in schema_names]
        if missing_bloom:
            raise ValueError(f"bloom_cols {missing_bloom} not in schema {schema_names}")
        from .bloom import bloom_supported

        base = ds.schema().base_schema
        bad = [c for c in bloom_cols if not bloom_supported(base.field(c).type)]
        if bad:
            raise ValueError(
                f"bloom_cols {bad} are not integer/string/binary — Bloom filters "
                "serve equality lookups; range predicates already prune via zone maps"
            )
    if text_bloom_cols:
        import pyarrow as _pa

        text_bloom_cols = (
            [text_bloom_cols] if isinstance(text_bloom_cols, str) else list(text_bloom_cols)
        )
        missing_tok = [c for c in text_bloom_cols if c not in schema_names]
        if missing_tok:
            raise ValueError(f"text_bloom_cols {missing_tok} not in schema {schema_names}")
        base = ds.schema().base_schema
        bad = [
            c for c in text_bloom_cols
            if not (_pa.types.is_string(base.field(c).type)
                    or _pa.types.is_large_string(base.field(c).type))
        ]
        if bad:
            raise ValueError(
                f"text_bloom_cols {bad} are not text columns — token blooms "
                "serve the hastok full-text predicate over string columns"
            )
    run_params = {
        "n_parts": int(n_parts),
        "salt_rows": int(salt_rows),
        "conv_col": conv_col,
        "order_col": order_col,
        "sort_key": list(sort_key),
        "hash_version": HASH_VERSION,
        "partition_mode": "range" if cluster_by else "hash",
        "cluster_by": cluster_by,
        "range_cuts": range_cuts,
        "cluster_norm": cluster_norm,
        # not a partitioning parameter (not in RUN_PARAM_KEYS): a resume or
        # append under different bloom_cols yields mixed containers, which
        # the probe handles (absent filter = no pruning) — recorded so
        # append reuses it by default
        "bloom_cols": list(bloom_cols or []),
        "text_bloom_cols": list(text_bloom_cols or []),
    }
    if resume and prior is not None:
        # stores written before range clustering existed have no
        # partition_mode key — they are hash stores
        prior = {
            "partition_mode": "hash",
            "cluster_by": None,
            "range_cuts": None,
            "cluster_norm": None,
            **prior,
        }
        mismatch = {
            k: (prior.get(k), run_params[k])
            for k in mf.RUN_PARAM_KEYS
            if prior.get(k) != run_params[k]
        }
        if mismatch:
            raise ValueError(
                f"resume=True but partitioning parameters differ from the "
                f"original run recorded in {mf.run_record_path(out_dir)}: "
                f"{mismatch} — resuming would reassign rows to different "
                f"partitions while skipping 'completed' ones (silent row "
                f"duplication/loss). Re-run with the recorded parameters or "
                f"start fresh with resume=False."
            )
    mf.write_run_record(out_dir, run_params)

    if page_shuffle:
        ds = ds.map_batches(
            make_page_packer(n_parts, conv_col, order_col, salt_rows),
            batch_format="pyarrow",
        )
    elif cluster_by is not None:
        from .partition import assign_part_id_range

        cuts = list(range_cuts or [])
        _norm = cluster_norm

        def _assign_range(batch: pa.Table) -> pa.Table:
            return assign_part_id_range(batch, cuts, cluster_by, norm=_norm)

        ds = ds.map_batches(_assign_range, batch_format="pyarrow")
    else:

        def _assign(batch: pa.Table) -> pa.Table:
            return assign_part_id(
                batch, n_parts, conv_col=conv_col, order_col=order_col, salt_rows=salt_rows
            )

        ds = ds.map_batches(_assign, batch_format="pyarrow")

    if resume:
        done = mf.completed_parts(out_dir)
        if done:
            done_arr = pa.array(sorted(done), type=pa.int32())

            def _skip_done(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                return batch.filter(
                    pc.invert(pc.is_in(batch["part_id"], value_set=done_arr))
                )

            ds = ds.map_batches(_skip_done, batch_format="pyarrow")

    cls = EncodePages if page_shuffle else EncodePartition
    enc_kw = {} if page_shuffle else {
        "bloom_cols": frozenset(bloom_cols or ()),
        "text_bloom_cols": frozenset(text_bloom_cols or ()),
    }
    encoder = cls(
        out_dir, codec=codec, sort_key=sort_key, fault_hook=fault_hook,
        bound_cols=frozenset(cluster_by or ()), **enc_kw,
    )

    def encode_partition(group: pa.Table) -> pa.Table:
        return encoder(group)

    lineage = ds.groupby("part_id").map_groups(encode_partition, batch_format="pyarrow")
    # the exchange only needs GROUPING by part_id, not a global sort:
    # hash_shuffle (actor-aggregator exchange, no sort-merge) beat the
    # push-based sort shuffle in every interleaved rep on the 3GB exchange
    # (13.6 vs 16.6s min-of-3 at 32 CPUs; sort-push itself was 7x over the
    # pull-based default, ROUND1_NOTES). ``shuffle_strategy`` overrides.
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    prev_strategy = ctx.shuffle_strategy
    ctx.shuffle_strategy = shuffle_strategy or ShuffleStrategy.HASH_SHUFFLE
    try:
        lineage.take_all()  # trigger execution; one tiny row per partition
    finally:
        ctx.shuffle_strategy = prev_strategy
    summary = mf.consolidate(out_dir)
    summary["n_parts"] = n_parts
    return summary


def compact_dataset(
    in_dir: str,
    out_dir: str,
    target_part_bytes: int = TARGET_PART_BYTES,
    drop_columns: Sequence[str] | None = None,
    add_columns: dict | None = None,
    **kw,
) -> dict:
    """Compact an encoded store: decode -> re-encode with a partition count
    sized to the data that is actually THERE.

    The lifecycle op every long-lived store needs: after curation/dedup drops
    a large fraction of rows (or after many small incremental deliveries),
    the original n_parts leaves skewed, undersized containers — per-container
    codec tables stop paying for themselves and the decode fans out over
    mostly-empty files. Compaction re-derives n_parts from the manifest's
    recorded in-memory bytes, reuses the ORIGINAL partitioning parameters
    (conv/order columns, salt) from ``_run.json`` so the output is the same
    logical layout, and re-encodes through the normal partition-atomic path —
    the result decodes bit-identically (tested).

    Compaction is also the SCHEMA-EVOLUTION point (append deliberately
    conforms deliveries to the store schema, so widening/narrowing must go
    through a rewrite): ``drop_columns`` removes retired columns;
    ``add_columns`` maps new name -> pyarrow type (typed-null fill) or
    -> (type, constant) for a backfill default. Partition/order columns
    cannot be dropped."""
    from . import manifest as mf
    from .decode import decode_dataset

    prior = mf.load_run_record(in_dir)
    if prior is None:
        raise ValueError(f"no run record in {in_dir} — not an encoded store?")
    recs = mf.load_records(in_dir)
    bytes_in = sum(r["bytes_in"] for r in recs) or (64 << 20)
    n_parts = kw.pop("n_parts", None) or max(1, -(-bytes_in // target_part_bytes))
    ds = _evolve_columns(decode_dataset(in_dir), prior, drop_columns, add_columns)
    return encode_dataset(
        ds,
        out_dir,
        n_parts=int(n_parts),
        conv_col=kw.pop("conv_col", prior["conv_col"]),
        order_col=kw.pop("order_col", prior["order_col"]),
        # carry the recorded within-partition sort through the rewrite — the
        # default key's columns may not even exist in a non-transcript store
        sort_key=kw.pop(
            "sort_key",
            tuple(prior.get("sort_key") or (prior["conv_col"], prior["order_col"])),
        ),
        salt_rows=kw.pop("salt_rows", int(prior.get("salt_rows") or 0)),
        # a range-clustered store stays range-clustered through compaction
        # (cuts are resampled for the new n_parts); pass cluster_by=None to
        # convert back to the hash layout
        cluster_by=kw.pop("cluster_by", prior.get("cluster_by")),
        # Bloom columns likewise carry through (minus any dropped columns)
        bloom_cols=kw.pop(
            "bloom_cols",
            [c for c in (prior.get("bloom_cols") or []) if c not in set(drop_columns or ())],
        ),
        text_bloom_cols=kw.pop(
            "text_bloom_cols",
            [c for c in (prior.get("text_bloom_cols") or []) if c not in set(drop_columns or ())],
        ),
        **kw,
    )


def _evolve_columns(ds, prior: dict, drop_columns, add_columns):
    """Schema-evolution step shared by compact paths: drop retired columns
    (partition/order columns refused — they define the layout), then append
    new ones as typed nulls or a backfill constant."""
    if drop_columns:
        protected = {prior["conv_col"], prior.get("order_col")} & set(drop_columns)
        if protected:
            raise ValueError(
                f"cannot drop partition/order column(s) {sorted(protected)} — "
                "they define the store layout"
            )
        ds = ds.drop_columns(list(drop_columns))
    if add_columns:
        existing = set(ds.schema().names)
        dup = existing & set(add_columns)
        if dup:
            raise ValueError(f"add_columns would shadow existing column(s) {sorted(dup)}")

        def _widen(batch: pa.Table) -> pa.Table:
            for name, spec in add_columns.items():
                if isinstance(spec, tuple):
                    typ, const = spec
                    col = pa.array([const] * batch.num_rows, type=typ)
                else:
                    col = pa.nulls(batch.num_rows, spec)
                batch = batch.append_column(name, col)
            return batch

        ds = ds.map_batches(_widen, batch_format="pyarrow")
    return ds


def compact_family(
    in_dirs: "Sequence[str]",
    out_dir: str,
    target_part_bytes: int = TARGET_PART_BYTES,
    drop_columns: Sequence[str] | None = None,
    add_columns: dict | None = None,
    **kw,
) -> dict:
    """Compact a FAMILY of delivery stores into ONE conformed store.

    The other half of the store-family lifecycle (``zonemap.scan_store_multi``
    is the query half): incremental deliveries each encode on arrival into
    their own store, and when the family grows unwieldy — too many undersized
    containers, or schema drift to resolve — this rewrites them as a single
    store with n_parts re-derived from the TOTAL recorded bytes. Each member
    decodes as a stream and the members union (metadata-only in Ray Data)
    before one partition-atomic encode, so peak memory is one partition's
    working set regardless of family size.

    Layout parameters must agree across members on (conv_col, order_col) —
    refused loudly otherwise, since rows from differently-keyed stores cannot
    share a hash route. Other parameters (salt, cluster_by, bloom_cols)
    follow the FIRST member's run record exactly like ``compact_dataset``
    follows its single input, overridable via kwargs. ``drop_columns`` /
    ``add_columns`` apply uniformly to every member, which is how a drifted
    family conforms: drop the retired column from the members that still
    carry it — drops of columns absent from a member are skipped for that
    member — and/or add the new column with a typed-null/constant backfill.
    After evolution the member schemas must agree on (name, type); any
    residual drift is refused with per-store detail. No cross-delivery key
    dedup happens here (deliveries are disjoint by contract; dedup is its
    own operator family)."""
    from . import manifest as mf
    from .decode import decode_dataset

    if not in_dirs:
        raise ValueError("compact_family needs at least one store directory")
    priors = []
    for d in in_dirs:
        prior = mf.load_run_record(d)
        if prior is None:
            raise ValueError(f"no run record in {d} — not an encoded store?")
        priors.append(prior)
    keys = {(p["conv_col"], p.get("order_col")) for p in priors}
    if len(keys) > 1:
        detail = "; ".join(
            f"{d}: ({p['conv_col']}, {p.get('order_col')})"
            for d, p in zip(in_dirs, priors)
        )
        raise ValueError(
            f"family members disagree on (conv_col, order_col): {detail}"
        )

    bytes_in = sum(
        r["bytes_in"] for d in in_dirs for r in mf.load_records(d)
    ) or (64 << 20)
    n_parts = kw.pop("n_parts", None) or max(1, -(-bytes_in // target_part_bytes))

    members = []
    schemas = []
    for d, prior in zip(in_dirs, priors):
        ds = decode_dataset(d)
        present = set(ds.schema().names)
        member_drops = [c for c in (drop_columns or ()) if c in present]
        ds = _evolve_columns(ds, prior, member_drops, add_columns)
        s = ds.schema()
        schemas.append(list(zip(s.names, s.types)))
        members.append(ds)
    if any(s != schemas[0] for s in schemas[1:]):
        detail = "; ".join(
            f"{d}: {[(n, str(t)) for n, t in s]}" for d, s in zip(in_dirs, schemas)
        )
        raise ValueError(
            "family schemas still differ after drop/add evolution — resolve "
            f"the residual drift explicitly: {detail}"
        )
    union_ds = members[0]
    for m in members[1:]:
        union_ds = union_ds.union(m)

    first = priors[0]
    return encode_dataset(
        union_ds,
        out_dir,
        n_parts=int(n_parts),
        conv_col=kw.pop("conv_col", first["conv_col"]),
        order_col=kw.pop("order_col", first["order_col"]),
        sort_key=kw.pop(
            "sort_key",
            tuple(first.get("sort_key") or (first["conv_col"], first["order_col"])),
        ),
        salt_rows=kw.pop("salt_rows", int(first.get("salt_rows") or 0)),
        cluster_by=kw.pop("cluster_by", first.get("cluster_by")),
        bloom_cols=kw.pop(
            "bloom_cols",
            [c for c in (first.get("bloom_cols") or []) if c not in set(drop_columns or ())],
        ),
        text_bloom_cols=kw.pop(
            "text_bloom_cols",
            [c for c in (first.get("text_bloom_cols") or []) if c not in set(drop_columns or ())],
        ),
        **kw,
    )


def rebucket_dataset(
    in_dir: str,
    out_dir: str,
    *,
    on: str | None = None,
    like: str | None = None,
    n_parts: int | None = None,
    **kw,
) -> dict:
    """Re-route an encoded store into a bucketed-JOIN-able layout: hash-
    partitioned on ``on`` (default: the store's current partition column),
    UNSALTED and UN-CLUSTERED, with the target partition count taken from
    ``like``'s run record — so the result provably co-buckets with that
    store for ``storejoin.store_join`` — or given directly as ``n_parts``.

    This is the repair path for the bucketed join's loud refusals: two
    stores encoded at different times with mismatched n_parts (or one
    salted / range-clustered / keyed on another column) cannot co-locate
    keys, and ``store_join`` refuses them. Rebucketing pays the partition
    exchange ONCE — the same price ingest would have paid — after which
    every join against the ``like`` store is map-only over matched buckets.
    All other layout parameters (order column, within-partition sort, codec
    choice, Bloom sidecars) carry through from the source store exactly as
    in ``compact_dataset``, which this routes through.

    When matching ``like``, the TARGET side must itself satisfy the
    bucketed-join layout (current hash version, hash mode, unsalted) —
    matching a non-joinable store's n_parts buys nothing, so that is
    refused with the real reason instead of succeeding uselessly."""
    from .partition import HASH_VERSION

    if (like is None) == (n_parts is None):
        raise ValueError("rebucket needs exactly one of like= / n_parts=")
    prior = mf.load_run_record(in_dir)
    if prior is None:
        raise ValueError(f"no run record in {in_dir} — not an encoded store?")
    if like is not None:
        target = mf.load_run_record(like)
        if target is None:
            raise ValueError(f"no run record in {like} — not an encoded store?")
        if target.get("hash_version") != HASH_VERSION:
            raise ValueError(
                f"{like}: hash_version {target.get('hash_version')!r} != current "
                f"{HASH_VERSION!r} — rebucketing against it cannot co-locate keys"
            )
        if (target.get("partition_mode") or "hash") != "hash":
            raise ValueError(
                f"{like}: partition_mode {target.get('partition_mode')!r} — a "
                "range-clustered store routes by value range; rebucket against "
                "a hash-partitioned store (or pass n_parts= directly)"
            )
        if int(target.get("salt_rows") or 0) != 0:
            raise ValueError(
                f"{like}: salt_rows={target.get('salt_rows')} — a salted store "
                "splits keys across chunk partitions and never bucketed-joins"
            )
        n_parts = int(target["n_parts"])
    return compact_dataset(
        in_dir,
        out_dir,
        n_parts=int(n_parts),
        conv_col=kw.pop("conv_col", on or prior["conv_col"]),
        order_col=kw.pop("order_col", prior.get("order_col")),
        salt_rows=0,
        cluster_by=None,
        **kw,
    )


def _row_keys(conv, order) -> "pa.ChunkedArray":
    """(conv, order) composed into one binary key, vectorized (0x1f separator
    — cannot occur inside the decimal order rendering)."""
    import pyarrow.compute as pc

    return pc.binary_join_element_wise(
        pc.cast(conv, pa.string()), pc.cast(order, pa.string()), "\x1f"
    )


def _existing_part_keys(out_dir: str, part_id: int, conv_col: str, order_col: str):
    """All (conv, order) keys already stored in ONE partition (base container
    + every appended generation) — a partition-local pruned decode, never a
    store scan: re-delivered rows hash to the same part_id, so idempotence
    only needs the keys of the partition being written."""
    from .container import decode_table
    from .decode import resolve_container_path

    chunks = []
    for r in mf.load_records(out_dir):
        if int(r["part_id"]) != part_id:
            continue
        with open(resolve_container_path(out_dir, r), "rb") as f:
            t = decode_table(f.read(), columns=[conv_col, order_col])
        k = _row_keys(t[conv_col], t[order_col])
        chunks.extend(k.chunks if isinstance(k, pa.ChunkedArray) else [k])
    return pa.chunked_array(chunks) if chunks else None


_LINEAGE_SCHEMA = pa.schema(
    [
        ("part_id", pa.int32()),
        ("rows", pa.int64()),
        ("bytes_in", pa.int64()),
        ("bytes_out", pa.int64()),
        ("codecs", pa.string()),
        ("wall_s", pa.float64()),
    ]
)


def _conform_delivery(ds, out_dir: str, prior: dict, conv_col: str, order_col: str):
    """Schema-conform a delivery to the STORE schema (footer of any base
    container — a tail seek, no column bytes). Reordered columns are
    harmless; columns the store has but the delivery lacks are filled with
    typed nulls (additive drift over months of ingest); extra or
    type-changed columns would silently corrupt decode, so they raise.
    Shared by ``append_dataset`` and ``upsert_dataset``."""
    from .codecs import str_to_type
    from .container import read_footer_file
    from .decode import container_files

    footer = read_footer_file(container_files(out_dir)[0])
    store_schema = [(c["name"], str_to_type(c["type"])) for c in footer["columns"]]
    store_names = [n for n, _ in store_schema]
    del_schema = ds.schema()
    del_names = list(del_schema.names)
    extra = [n for n in del_names if n not in store_names]
    if extra:
        raise ValueError(
            f"delivery has columns {extra} the store {out_dir} does not; "
            "schema evolution is additive on the STORE side only — compact "
            "into a new store to add columns"
        )
    missing = [n for n in store_names if n not in del_names]
    if conv_col in missing or order_col in missing:
        raise ValueError(
            f"delivery lacks the partition/order column(s) "
            f"{[c for c in (conv_col, order_col) if c in missing]} — cannot append"
        )
    if (prior.get("partition_mode") or "hash") == "range":
        cl = prior.get("cluster_by") or []
        cl = [cl] if isinstance(cl, str) else list(cl)
        lacking = [c for c in cl if c in missing]
        if lacking:
            raise ValueError(
                f"delivery lacks the range-cluster column(s) {lacking} "
                "— cannot assign partitions"
            )
    for n, t in store_schema:
        if n in del_names:
            dt = del_schema.base_schema.field(n).type
            if dt != t:
                raise ValueError(
                    f"column {n!r}: delivery type {dt} != store type {t} — "
                    "appending would mix physical encodings"
                )

    def _conform(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                n: batch[n] if n in batch.column_names else pa.nulls(batch.num_rows, t)
                for n, t in store_schema
            }
        )

    if missing or del_names != store_names:
        ds = ds.map_batches(_conform, batch_format="pyarrow")
    return ds


def append_dataset(
    source,
    out_dir: str,
    codec: str | dict = "auto",
    skip_existing: bool = False,
) -> dict:
    """Append a NEW delivery of rows to an EXISTING encoded store without
    touching its base containers — the continuous-ingestion path.

    The delivery is partitioned with the store's RECORDED parameters
    (``_run.json``: n_parts, salt, conv/order columns, hash version), so each
    partition gains one extra container ``part-{id}-g{gen:04d}.pcc`` and every
    reader (decode, verify, lookup) sees base + deliveries transparently via
    the manifest. Generations are monotone per delivery; run
    ``compact_dataset`` periodically to fold fragmented deliveries back into
    right-sized containers. Base-run resume semantics are untouched
    (``completed_parts`` ignores appended generations).

    ``skip_existing=True`` makes deliveries IDEMPOTENT at row granularity:
    inside each partition group, rows whose (conv, order) key already exists
    in that partition (any generation) are dropped before encoding, and a
    partition whose delivery rows are all duplicates writes no container at
    all. The check is partition-LOCAL by construction — a re-delivered row
    hashes to the same part_id — so a retried or overlapping delivery costs
    one pruned two-column decode per touched partition, never a store scan."""
    from ray.data.context import DataContext, ShuffleStrategy

    from . import manifest as mf
    from .partition import HASH_VERSION

    prior = mf.load_run_record(out_dir)
    if prior is None:
        raise ValueError(f"no run record in {out_dir} — append needs an existing store")
    if prior.get("hash_version") != HASH_VERSION:
        raise ValueError(
            f"store {out_dir} was partitioned with hash {prior.get('hash_version')!r}; "
            f"this build uses {HASH_VERSION!r} — appending would mispartition rows"
        )
    n_parts = int(prior["n_parts"])
    conv_col, order_col = prior["conv_col"], prior["order_col"]
    salt_rows = int(prior.get("salt_rows") or 0)
    sort_key = tuple(prior.get("sort_key") or (conv_col, order_col))
    gen = max((int(r.get("generation", 0)) for r in mf.load_records(out_dir)), default=0) + 1

    if isinstance(source, (str, list)):
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        ds = read_parquet_clean(source, override_num_blocks=max(3 * cpus, n_parts))
    else:
        ds = source

    ds = _conform_delivery(ds, out_dir, prior, conv_col, order_col)

    if (prior.get("partition_mode") or "hash") == "range":
        # a range-clustered store appends with the RECORDED cuts + spans (the
        # layout contract), so delivered rows land in the bucket readers expect
        from .partition import assign_part_id_range

        _r_cuts = list(prior.get("range_cuts") or [])
        _r_cols = prior["cluster_by"]
        _r_norm = prior.get("cluster_norm")

        def _assign(batch: pa.Table) -> pa.Table:
            return assign_part_id_range(batch, _r_cuts, _r_cols, norm=_r_norm)

    else:

        def _assign(batch: pa.Table) -> pa.Table:
            return assign_part_id(
                batch, n_parts, conv_col=conv_col, order_col=order_col, salt_rows=salt_rows
            )

    encoder = EncodePartition(
        out_dir, codec=codec, sort_key=sort_key, generation=gen,
        bound_cols=frozenset(prior.get("cluster_by") or ()),
        bloom_cols=frozenset(prior.get("bloom_cols") or ()),
        text_bloom_cols=frozenset(prior.get("text_bloom_cols") or ()),
    )

    def _encode_group(g: pa.Table) -> pa.Table:
        if skip_existing and g.num_rows:
            import pyarrow.compute as pc

            pid = int(g["part_id"][0].as_py())
            existing = _existing_part_keys(out_dir, pid, conv_col, order_col)
            if existing is not None:
                keys = _row_keys(g[conv_col], g[order_col])
                g = g.filter(pc.invert(pc.is_in(keys, value_set=existing)))
            if g.num_rows == 0:
                return _LINEAGE_SCHEMA.empty_table()
        return encoder(g)

    lineage = (
        ds.map_batches(_assign, batch_format="pyarrow")
        .groupby("part_id")
        .map_groups(_encode_group, batch_format="pyarrow")
    )
    ctx = DataContext.get_current()
    prev_strategy = ctx.shuffle_strategy
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    try:
        taken = lineage.take_all()
    finally:
        ctx.shuffle_strategy = prev_strategy
    summary = mf.consolidate(out_dir)
    summary["n_parts"] = n_parts
    summary["generation"] = gen
    summary["rows_appended"] = int(sum(r["rows"] for r in taken))
    return summary


_UPSERT_SCHEMA = pa.schema(
    [
        ("part_id", pa.int32()),
        ("rows", pa.int64()),
        ("updated", pa.int64()),
        ("inserted", pa.int64()),
        ("folded_gen", pa.int32()),
    ]
)


def upsert_dataset(source, out_dir: str, codec: str | dict = "auto") -> dict:
    """MERGE a delivery into an existing store by row key ``(conv, order)``:
    delivery rows REPLACE stored rows with the same key, keys the store has
    never seen INSERT — the standard upsert/merge primitive a long-lived
    store needs for late-arriving corrections (re-scored turns, redacted
    text, fixed tool labels) without the delete-list round trip.

    Partition-local by construction, even under mega-conversation salting:
    ``part_id`` is a pure function of (hash(conv), order-chunk), so a
    delivery row and every stored version of its key land in the same
    partition — one fused rewrite per TOUCHED partition, never a store scan,
    untouched partitions keep their exact bytes. Each rewrite folds the
    partition's appended generations into a fresh base container under the
    same crash-safety contract as ``delete_conversations`` (records dropped
    → atomic base write with ``folded`` map → generation files removed), so
    a crashed upsert leaves the store untouched, loudly invalid, or
    finished — never silently duplicated.

    Key-level replace is the semantics that stays partition-local; replacing
    a WHOLE conversation (old turns the delivery doesn't re-deliver must
    die) is ``delete_conversations`` + ``append_dataset``, because under
    salting the old turns' chunks live in other partitions. Range-clustered
    stores refuse for the same reason: their partition is a function of
    cluster-column VALUES, so an updated row whose cluster value changed
    would leave its old version alive in another bucket.

    A delivery carrying two rows with the same key is ambiguous (which one
    wins?) and raises rather than picking silently."""
    import glob as _glob

    from ray.data.context import DataContext, ShuffleStrategy

    from . import manifest as mf
    from .decode import resolve_container_path
    from .partition import HASH_VERSION

    prior = mf.load_run_record(out_dir)
    if prior is None:
        raise ValueError(f"no run record in {out_dir} — upsert needs an existing store")
    if prior.get("hash_version") != HASH_VERSION:
        raise ValueError(
            f"store {out_dir} was partitioned with hash {prior.get('hash_version')!r}; "
            f"this build uses {HASH_VERSION!r} — upserting would mispartition rows"
        )
    if (prior.get("partition_mode") or "hash") == "range":
        raise ValueError(
            "upsert_dataset requires a hash-partitioned store: a range-"
            "clustered partition is a function of cluster-column VALUES, so "
            "an update that changes them strands the old row in another "
            "bucket — use delete_conversations + append_dataset instead"
        )
    n_parts = int(prior["n_parts"])
    conv_col, order_col = prior["conv_col"], prior["order_col"]
    if not order_col:
        raise ValueError(
            "upsert_dataset merges by (conv, order) row key; this store has "
            "no order column — use delete_conversations + append_dataset"
        )
    salt_rows = int(prior.get("salt_rows") or 0)
    sort_key = tuple(prior.get("sort_key") or (conv_col, order_col))
    bound_cols = frozenset(prior.get("cluster_by") or ())
    bloom_cols = frozenset(prior.get("bloom_cols") or ())
    text_bloom_cols = frozenset(prior.get("text_bloom_cols") or ())

    if isinstance(source, (str, list)):
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        ds = read_parquet_clean(source, override_num_blocks=max(3 * cpus, n_parts))
    else:
        ds = source
    ds = _conform_delivery(ds, out_dir, prior, conv_col, order_col)
    store_names = list(ds.schema().names)

    def _assign(batch: pa.Table) -> pa.Table:
        return assign_part_id(
            batch, n_parts, conv_col=conv_col, order_col=order_col, salt_rows=salt_rows
        )

    # manifest snapshot broadcast once (metadata-scale), not re-read per group
    recs = mf.load_records(out_dir)
    by_part: dict[int, list[dict]] = {}
    for r in recs:
        by_part.setdefault(int(r["part_id"]), []).append(r)
    by_part_ref = ray.put(by_part)

    def _merge_group(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pin_arrow_threads(1)
        if not g.num_rows:
            return _UPSERT_SCHEMA.empty_table()
        pid = int(g["part_id"][0].as_py())
        delivery = g.select(store_names)
        dkeys = _row_keys(delivery[conv_col], delivery[order_col]).combine_chunks()
        n_dup = delivery.num_rows - pc.count_distinct(dkeys).as_py()
        if n_dup:
            raise ValueError(
                f"delivery carries {n_dup} duplicate ({conv_col}, {order_col}) "
                f"key(s) in partition {pid} — which row wins is ambiguous; "
                "dedup the delivery first"
            )
        parts = ray.get(by_part_ref)
        precs = parts.get(pid, [])
        paths = [resolve_container_path(out_dir, r) for r in precs]
        leftovers = sorted(
            set(_glob.glob(os.path.join(out_dir, f"part-{pid:05d}-g*.pcc"))) - set(paths)
        )
        if not precs and os.path.exists(os.path.join(out_dir, f"part-{pid:05d}.pcc")):
            raise ValueError(
                f"partition {pid} in {out_dir} has a base container but no "
                "lineage record — run fsck/repair before upserting into it"
            )
        base_rec = next((r for r in precs if not int(r.get("generation", 0))), None)
        existing, folded = _fold_partition(
            pid, paths, leftovers,
            (base_rec or {}).get("folded") or {},
            (base_rec or {}).get("crc32"),
        )
        folded_gen = max(
            [int(r.get("generation", 0)) for r in precs]
            + [_generation_of(p) for p in leftovers]
            + [0]
        )
        updated = 0
        if existing is not None and existing.num_rows:
            keys = _row_keys(existing[conv_col], existing[order_col])
            before = existing.num_rows
            existing = existing.filter(pc.invert(pc.is_in(keys, value_set=dkeys)))
            updated = before - existing.num_rows
            merged = pa.concat_tables([existing.select(store_names), delivery])
        else:
            merged = delivery
        # crash contract step 2: generation records drop first (readers fail
        # loudly on the manifest-stray guard until the new base lands)
        for r in precs:
            if int(r.get("generation", 0)):
                try:
                    os.remove(mf.record_path(out_dir, pid, int(r["generation"])))
                except OSError:
                    pass
        enc = EncodePartition(
            out_dir, codec=codec, sort_key=sort_key, generation=0,
            bound_cols=bound_cols, bloom_cols=bloom_cols,
            text_bloom_cols=text_bloom_cols,
        )
        enc.encode_one(pid, merged, folded=folded)
        base = os.path.join(out_dir, f"part-{pid:05d}.pcc")
        for p in paths + leftovers:
            if os.path.abspath(p) != os.path.abspath(base):
                try:
                    os.remove(p)
                except OSError:
                    pass
        return pa.table(
            {
                "part_id": pa.array([pid], type=pa.int32()),
                "rows": pa.array([merged.num_rows], type=pa.int64()),
                "updated": pa.array([updated], type=pa.int64()),
                "inserted": pa.array([delivery.num_rows - updated], type=pa.int64()),
                "folded_gen": pa.array([folded_gen], type=pa.int32()),
            }
        )

    lineage = (
        ds.map_batches(_assign, batch_format="pyarrow")
        .groupby("part_id")
        .map_groups(_merge_group, batch_format="pyarrow")
    )
    ctx = DataContext.get_current()
    prev_strategy = ctx.shuffle_strategy
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    try:
        taken = lineage.take_all()
    finally:
        ctx.shuffle_strategy = prev_strategy
    # snapshot watermark: same rule as delete — folding generations into
    # rewritten bases invalidates generation-level snapshots below that point
    folded_gen = max((int(r["folded_gen"]) for r in taken), default=0)
    if folded_gen > int(prior.get("snapshot_watermark") or 0):
        prior["snapshot_watermark"] = folded_gen
        mf.write_run_record(out_dir, prior)
    summary = mf.consolidate(out_dir)
    summary["n_parts"] = n_parts
    summary["rows_updated"] = int(sum(r["updated"] for r in taken))
    summary["rows_inserted"] = int(sum(r["inserted"] for r in taken))
    summary["parts_rewritten"] = len(taken)
    return summary


def _generation_of(path: str) -> int:
    """part-NNNNN-gKKKK.pcc -> KKKK (0 on anything unexpected)."""
    try:
        return int(os.path.basename(path).rsplit("-g", 1)[1].split(".")[0])
    except (IndexError, ValueError):
        return 0

def _fold_partition(
    pid: int,
    container_paths: list[str],
    leftover_paths: list[str],
    prior_folded: dict,
    base_crc: int | None,
) -> "tuple[pa.Table | None, dict[str, int]]":
    """Decode ONE partition's recorded containers plus crash leftovers into a
    single table, returning ``(table, folded)`` — the shared step 1 of the
    in-place rewrite crash-safety contract (see ``_rewrite_partition``). A
    leftover generation file is included only if the base record's ``folded``
    map does not already carry its (basename, crc32); a base container whose
    crc differs from its record proves a previous rewrite's rename landed and
    already holds every leftover's surviving rows. Returns ``(None, folded)``
    when the partition has no containers at all (pure-insert upsert)."""
    from .container import decode_table

    tabs = []
    folded: dict[str, int] = {}
    base_name = f"part-{pid:05d}.pcc"
    base_is_newer = False
    for p in container_paths:
        with open(p, "rb") as f:
            raw = f.read()
        tabs.append(decode_table(raw))
        name = os.path.basename(p)
        if name != base_name:
            folded[name] = zlib.crc32(raw) & 0xFFFFFFFF
        elif base_crc is not None:
            base_is_newer = (zlib.crc32(raw) & 0xFFFFFFFF) != base_crc
    for p in leftover_paths:
        with open(p, "rb") as f:
            raw = f.read()
        crc = zlib.crc32(raw) & 0xFFFFFFFF
        name = os.path.basename(p)
        if not base_is_newer and prior_folded.get(name) != crc:
            tabs.append(decode_table(raw))
        folded[name] = crc
    if not tabs:
        return None, folded
    return pa.concat_tables(tabs).combine_chunks(), folded


def _rewrite_partition(
    pid: int,
    container_paths: list[str],
    leftover_paths: list[str],
    gen_record_files: list[str],
    prior_folded: dict,
    base_crc: int | None,
    out_dir: str,
    conv_col: str,
    sort_key: Sequence[str],
    codec: str | dict,
    victims: list,
    bound_cols: "frozenset[str]" = frozenset(),
    bloom_cols: "frozenset[str]" = frozenset(),
    text_bloom_cols: "frozenset[str]" = frozenset(),
    where_dnf=None,
) -> tuple[int, int]:
    """Rewrite ONE partition without the victim conversations (delete worker)
    — or, with ``where_dnf``, without the rows MATCHING that predicate
    (``delete_rows``: the retention path).

    Inputs are the partition's RECORDED containers (base + appended
    generations) plus any record-less generation files (``leftover_paths``) a
    previously crashed delete left behind. Step order is the crash-safety
    contract:

      1. decode everything. A leftover file is included only if the base
         record's ``folded`` map does NOT carry its (basename, crc32): a
         match proves the previous rewrite already merged exactly these bytes
         into the base (crash between steps 3 and 4 — drop the file), a miss
         means the rows exist nowhere else (crash between steps 2 and 3 — or
         a newer append whose record a later crash removed — keep every row).
         Content-addressing makes this exact even when generation filenames
         are reused across append/delete cycles or when appends carry
         duplicate (conv, order) keys,
      2. drop the generation RECORDS (from here until step 3 lands, readers
         fail loudly: the generation containers become manifest-strays),
      3. write the new base container atomically + its fresh lineage record,
         whose ``folded`` map names every generation container merged here,
      4. remove the generation container files.

    A crash at any point leaves the store either untouched, loudly invalid
    (stray-container guard), or finished — never silently duplicated or
    silently missing rows; re-running any delete on the partition repairs the
    middle states.
    """
    import pyarrow.compute as pc

    t, folded = _fold_partition(pid, container_paths, leftover_paths, prior_folded, base_crc)
    if t is None:  # unreachable from delete: probes only select partitions with containers
        return 0, 0
    before = t.num_rows
    if where_dnf is not None:
        # predicate delete (retention): drop rows MATCHING the DNF; SQL
        # semantics — a null comparison never matches, so null rows stay,
        # exactly like DELETE ... WHERE in the oracle
        from .zonemap import dnf_mask

        m = dnf_mask(t, where_dnf)
        if m is not None:
            t = t.filter(pc.invert(pc.fill_null(m, False)))
    else:
        vict = pa.array(victims).cast(t[conv_col].type)
        t = t.filter(pc.invert(pc.is_in(t[conv_col], value_set=vict)))
    deleted = before - t.num_rows

    for rf in gen_record_files:
        try:
            os.remove(rf)
        except OSError:
            pass
    enc = EncodePartition(
        out_dir, codec=codec, sort_key=sort_key, generation=0,
        bound_cols=bound_cols, bloom_cols=bloom_cols,
        text_bloom_cols=text_bloom_cols,
    )
    enc.encode_one(pid, t, folded=folded)
    base = os.path.join(out_dir, f"part-{pid:05d}.pcc")
    for p in container_paths + leftover_paths:
        if os.path.abspath(p) != os.path.abspath(base):
            try:
                os.remove(p)
            except OSError:
                pass
    return deleted, t.num_rows


def _probe_partition_victims(paths: list[str], conv_col: str, victims: list) -> list:
    """Which victim keys have rows in this partition? One pruned key-column
    decode over the partition's containers (delete probe worker — runs as a
    Ray task so a long delete list probes its candidate partitions in
    parallel, never driver-serially)."""
    import pyarrow.compute as pc

    from .container import decode_table

    tabs = []
    for p in paths:
        with open(p, "rb") as f:
            tabs.append(decode_table(f.read(), columns=[conv_col]))
    if not tabs:
        return []
    col = pa.concat_tables(tabs)[conv_col].combine_chunks()
    vict = pa.array(victims).cast(col.type)
    mask = pc.is_in(vict, value_set=col)
    return [v for v, m in zip(victims, mask.to_pylist()) if m]


def delete_conversations(out_dir: str, conv_values: list, codec: str | dict = "auto") -> dict:
    """Delete whole conversations from an encoded store IN PLACE, rewriting
    only the partitions that can contain them — the retention / right-to-be-
    forgotten path a long-lived 100 TB store needs.

    ``part_id`` is a pure function of (conv hash, salt chunk) recorded in
    ``_run.json``, so the touched-partition set is computed driver-side for
    every (victim, salt chunk 0..k_max) pair — k_max bounded by the order
    column's zone-map max, the same arithmetic ``scan_store`` routing uses —
    at the cost of one pruned key-column decode per CANDIDATE partition
    (fanned out as parallel Ray tasks), never a store scan. No density
    assumption on turn indices: sparse appended turn ranges are still found.
    Each touched partition is then rewritten in parallel (base + appended
    generations fold into a fresh base container; see ``_rewrite_partition``
    for the crash-safety contract). Untouched partitions keep their exact
    bytes, so resume/fsck/zonemap state stays valid everywhere else.
    """
    import glob as _glob

    import numpy as np

    from .decode import _part_for, resolve_container_path
    from .partition import HASH_VERSION, hash_conv_values

    prior = mf.load_run_record(out_dir)
    if prior is None:
        raise ValueError(f"no run record in {out_dir} — delete needs an encoded store")
    if prior.get("hash_version") != HASH_VERSION:
        raise ValueError(
            f"store {out_dir} was partitioned with hash {prior.get('hash_version')!r}; "
            f"this build uses {HASH_VERSION!r} — cannot locate conversations"
        )
    n_parts = int(prior["n_parts"])
    conv_col, order_col = prior["conv_col"], prior.get("order_col")
    salt_rows = int(prior.get("salt_rows") or 0)
    sort_key = tuple(prior.get("sort_key") or ([conv_col] + ([order_col] if order_col else [])))
    salted = bool(salt_rows) and order_col is not None

    conv_values = list(dict.fromkeys(conv_values))
    summary_base = {"convs_requested": len(conv_values)}
    # an EMPTY victim list is repair-only mode (repair_store / fsck --repair):
    # skip the candidate probe, run just the orphan sweep + rewrite
    if conv_values:
        hashes = hash_conv_values(conv_values)
        if hashes is None:
            raise TypeError(
                "delete_conversations: conversation keys must be uniformly "
                "int, str, or bytes (matching the encoded key column) — got "
                f"{sorted({type(v).__name__ for v in conv_values})}"
            )

    recs = mf.load_records(out_dir)
    by_part: dict[int, list[dict]] = {}
    for r in recs:
        by_part.setdefault(int(r["part_id"]), []).append(r)

    touched: set[int] = set()
    found_vals: set = set()
    if conv_values:
        # Candidate partitions: every (victim hash, salt chunk 0..k_max) pair,
        # with k_max bounded by the ORDER column's zone-map max — NOT by
        # walking chunks until the first partial one, which silently
        # under-deletes when turn indices aren't dense (e.g. an append of
        # turns 300..319 after 0..99 with salt_rows=300 lands in chunk 1,
        # which a stop-at-partial walk never visits).
        if (prior.get("partition_mode") or "hash") == "range":
            # range-clustered layout: conv keys have no hash route, so every
            # partition is a candidate — the parallel key-column probe below
            # still prunes the rewrite set to partitions with actual victims
            cand = set(by_part)
        elif salted:
            k_max = mf.order_chunk_bound(recs, order_col, salt_rows)
            if k_max is None:
                cand = set(by_part)  # pre-zonemap store: probe everything — sound
            else:
                cand = {
                    _part_for(np.uint64(h), k, n_parts)
                    for h in hashes
                    for k in range(k_max + 1)
                }
        else:
            cand = {_part_for(np.uint64(h), 0, n_parts) for h in hashes}
        cand &= set(by_part)
        # One pruned key-column decode per candidate partition, fanned out as
        # Ray tasks (a 1000-conversation delete list must not probe
        # driver-serially).
        probe = ray.remote(num_cpus=1)(_probe_partition_victims)
        vict_ref = ray.put(conv_values)
        pids = sorted(cand)
        present = ray.get(
            [
                probe.remote(
                    [resolve_container_path(out_dir, r) for r in by_part[pid]],
                    conv_col,
                    vict_ref,
                )
                for pid in pids
            ]
        )
        for pid, hit in zip(pids, present):
            if hit:
                touched.add(pid)
                found_vals.update(hit)

    # sweep crash leftovers: a previous delete that died between writing the
    # new base and removing a generation file leaves a record-less
    # part-NNNNN-gNNNN.pcc that keeps the store loudly invalid (stray guard)
    # — and its partition may no longer contain any victim row, so the
    # escalation alone would never revisit it. Force those partitions into
    # the rewrite set; the leftover fold in _rewrite_partition finishes the
    # interrupted delete.
    recorded_names = {os.path.basename(r["path"]) for r in recs}
    for f in _glob.glob(os.path.join(out_dir, "part-*-g*.pcc")):
        if os.path.basename(f) not in recorded_names:
            try:
                touched.add(int(os.path.basename(f)[5:10]))
            except ValueError:
                pass

    if not touched:
        return {**summary_base, "convs_found": 0, "rows_deleted": 0, "parts_rewritten": 0}

    victims = conv_values
    rewrite = ray.remote(num_cpus=1)(_rewrite_partition)
    def _gen_of(path: str) -> int:
        # part-NNNNN-gKKKK.pcc -> KKKK (0 on anything unexpected)
        try:
            return int(os.path.basename(path).rsplit("-g", 1)[1].split(".")[0])
        except (IndexError, ValueError):
            return 0

    folded_gen = 0
    futures = []
    for pid in sorted(touched):
        if pid not in by_part:
            # A generation-ONLY partition (base encode emitted no rows for
            # this pid, an append did) whose sole gen record a crashed rewrite
            # removed in step 2 before the new base landed: no base container
            # means nothing could have folded the leftover rows — keep all.
            # If a BASE container exists without any record, the crash split
            # step 3 (container rename landed, record write didn't) AND the
            # folded map that disambiguates it is gone — genuinely ambiguous.
            if os.path.exists(os.path.join(out_dir, f"part-{pid:05d}.pcc")):
                raise ValueError(
                    f"partition {pid} in {out_dir} has a base container and "
                    "generation file(s) but no lineage records at all — the "
                    "folded map needed to separate already-merged rows from "
                    "unmerged ones is gone; refusing to guess"
                )
            leftovers = sorted(_glob.glob(os.path.join(out_dir, f"part-{pid:05d}-g*.pcc")))
            folded_gen = max([folded_gen] + [_gen_of(p) for p in leftovers])
            futures.append(
                rewrite.remote(
                    pid, [], leftovers, [], {}, None,
                    out_dir, conv_col, sort_key, codec, victims,
                    frozenset(prior.get("cluster_by") or ()),
                    frozenset(prior.get("bloom_cols") or ()),
                    frozenset(prior.get("text_bloom_cols") or ()),
                )
            )
            continue
        paths = [resolve_container_path(out_dir, r) for r in by_part[pid]]
        # crash leftovers: generation containers whose record is already gone
        leftovers = sorted(
            set(_glob.glob(os.path.join(out_dir, f"part-{pid:05d}-g*.pcc"))) - set(paths)
        )
        folded_gen = max(
            [folded_gen]
            + [int(r.get("generation", 0)) for r in by_part[pid]]
            + [_gen_of(p) for p in leftovers]
        )
        gen_recs = [
            mf.record_path(out_dir, pid, int(r.get("generation", 0)))
            for r in by_part[pid]
            if int(r.get("generation", 0))
        ]
        base_rec = next(
            (r for r in by_part[pid] if not int(r.get("generation", 0))), None
        )
        futures.append(
            rewrite.remote(
                pid, paths, leftovers, gen_recs,
                (base_rec or {}).get("folded") or {},
                (base_rec or {}).get("crc32"),
                out_dir, conv_col, sort_key, codec, victims,
                frozenset(prior.get("cluster_by") or ()),
                frozenset(prior.get("bloom_cols") or ()),
                frozenset(prior.get("text_bloom_cols") or ()),
            )
        )
    results = ray.get(futures)
    # Stamp the snapshot watermark: snapshots at max_generation < the highest
    # generation folded here would mix rewritten (folded-at-g=0) partitions
    # with untouched ones — a state that never existed. Touched-partition max
    # only, so deleting from never-appended partitions keeps old snapshots.
    if folded_gen > int(prior.get("snapshot_watermark") or 0):
        prior["snapshot_watermark"] = folded_gen
        mf.write_run_record(out_dir, prior)
    summary = mf.consolidate(out_dir)
    summary.update(summary_base)
    summary["convs_found"] = len(found_vals)
    summary["rows_deleted"] = int(sum(d for d, _ in results))
    summary["parts_rewritten"] = len(results)
    return summary

def delete_rows(out_dir: str, predicate, codec: str | dict = "auto") -> dict:
    """Delete the ROWS matching a predicate from an encoded store IN PLACE —
    the retention / TTL path (``DELETE FROM store WHERE ...``), rewriting
    only the partitions that can contain matches.

    The touched set comes from the same pruning stack ``scan_store`` reads
    with, inverted into a write plan: per-container zone maps rule out
    containers where NO row can match (``record_may_match`` per DNF branch),
    then the batched dictionary/Bloom footer probe refines membership-style
    predicates — a partition is rewritten only if some container survives
    both. On a range-clustered store a TTL delete ("ts < horizon") therefore
    rewrites only the horizon's boundary and interior containers; the rest
    of the store keeps its exact bytes (resume/fsck/zonemap state stays
    valid). Each touched partition folds base + generations + crash
    leftovers and rewrites atomically under the same crash contract as
    ``delete_conversations`` (shared ``_rewrite_partition`` worker; SQL null
    semantics — null comparisons never match, so null rows survive, same as
    the oracle's DELETE). Works on hash-routed, salted, and range-clustered
    layouts alike: candidates come from statistics, not key routing."""
    import glob as _glob

    from .decode import resolve_container_path
    from .zonemap import (
        _normalize_dnf,
        _probe_applies,
        probe_verdicts,
        record_may_match,
    )

    prior = mf.load_run_record(out_dir)
    if prior is None:
        raise ValueError(f"no run record in {out_dir} — delete needs an encoded store")
    conv_col, order_col = prior["conv_col"], prior.get("order_col")
    sort_key = tuple(prior.get("sort_key") or ([conv_col] + ([order_col] if order_col else [])))
    dnf = _normalize_dnf(predicate)
    if not any(br for br in dnf):
        raise ValueError("delete_rows needs a non-empty predicate — an empty "
                         "one would delete the whole store; use a fresh encode instead")

    recs = mf.load_records(out_dir)
    by_part: dict[int, list[dict]] = {}
    for r in recs:
        by_part.setdefault(int(r["part_id"]), []).append(r)

    # pruning stack, inverted into a write plan: container may hold a match
    # if ANY DNF branch may match its zone maps
    may: dict[int, list[dict]] = {}
    for pid, rs in by_part.items():
        keep = [
            r for r in rs
            if any(record_may_match(r.get("stats") or {}, int(r.get("rows", 0)), br)
                   for br in dnf)
        ]
        if keep:
            may[pid] = keep
    plan = {"parts_total": len(by_part), "pruned_stats": len(by_part) - len(may),
            "pruned_probe": 0}
    if may and _probe_applies(dnf):
        paths = [resolve_container_path(out_dir, r) for rs in may.values() for r in rs]
        verdicts = probe_verdicts(paths, dnf)
        refined: dict[int, list[dict]] = {}
        for pid, rs in may.items():
            keep = [r for r in rs
                    if verdicts.get(resolve_container_path(out_dir, r)) == "keep"]
            if keep:
                refined[pid] = keep
        plan["pruned_probe"] = len(may) - len(refined)
        may = refined
    touched = set(may)

    # sweep crash leftovers exactly like delete_conversations: record-less
    # generation files force their partitions into the rewrite set
    recorded_names = {os.path.basename(r["path"]) for r in recs}
    for f in _glob.glob(os.path.join(out_dir, "part-*-g*.pcc")):
        if os.path.basename(f) not in recorded_names:
            try:
                touched.add(int(os.path.basename(f)[5:10]))
            except ValueError:
                pass

    if not touched:
        return {"rows_deleted": 0, "parts_rewritten": 0, "plan": plan,
                **{k: v for k, v in mf.consolidate(out_dir).items()}}

    rewrite = ray.remote(num_cpus=1)(_rewrite_partition)

    def _gen_of(path: str) -> int:
        try:
            return int(os.path.basename(path).rsplit("-g", 1)[1].split(".")[0])
        except (IndexError, ValueError):
            return 0

    folded_gen = 0
    futures = []
    for pid in sorted(touched):
        if pid not in by_part:
            if os.path.exists(os.path.join(out_dir, f"part-{pid:05d}.pcc")):
                raise ValueError(
                    f"partition {pid} in {out_dir} has a base container and "
                    "generation file(s) but no lineage records at all — "
                    "refusing to guess; run fsck --repair"
                )
            leftovers = sorted(_glob.glob(os.path.join(out_dir, f"part-{pid:05d}-g*.pcc")))
            folded_gen = max([folded_gen] + [_gen_of(p) for p in leftovers])
            futures.append(rewrite.remote(
                pid, [], leftovers, [], {}, None,
                out_dir, conv_col, sort_key, codec, [],
                frozenset(prior.get("cluster_by") or ()),
                frozenset(prior.get("bloom_cols") or ()),
                frozenset(prior.get("text_bloom_cols") or ()),
                where_dnf=dnf,
            ))
            continue
        paths = [resolve_container_path(out_dir, r) for r in by_part[pid]]
        leftovers = sorted(
            set(_glob.glob(os.path.join(out_dir, f"part-{pid:05d}-g*.pcc"))) - set(paths)
        )
        folded_gen = max(
            [folded_gen]
            + [int(r.get("generation", 0)) for r in by_part[pid]]
            + [_gen_of(p) for p in leftovers]
        )
        gen_recs = [
            mf.record_path(out_dir, pid, int(r.get("generation", 0)))
            for r in by_part[pid]
            if int(r.get("generation", 0))
        ]
        base_rec = next((r for r in by_part[pid] if not int(r.get("generation", 0))), None)
        futures.append(rewrite.remote(
            pid, paths, leftovers, gen_recs,
            (base_rec or {}).get("folded") or {},
            (base_rec or {}).get("crc32"),
            out_dir, conv_col, sort_key, codec, [],
            frozenset(prior.get("cluster_by") or ()),
            frozenset(prior.get("bloom_cols") or ()),
            frozenset(prior.get("text_bloom_cols") or ()),
            where_dnf=dnf,
        ))
    results = ray.get(futures)
    if folded_gen > int(prior.get("snapshot_watermark") or 0):
        prior["snapshot_watermark"] = folded_gen
        mf.write_run_record(out_dir, prior)
    summary = mf.consolidate(out_dir)
    summary["rows_deleted"] = int(sum(d for d, _ in results))
    summary["parts_rewritten"] = len(results)
    summary["plan"] = plan
    return summary


def repair_store(out_dir: str) -> dict:
    """Finish any interrupted ``delete_conversations``: sweep record-less
    generation containers into their partitions' rewrite (the step-1 fold
    decides keep-vs-drop exactly via the base record's content-addressed
    ``folded`` map) and restore manifest/container consistency. A no-op on a
    healthy store. Exposed as ``fsck --repair``."""
    return delete_conversations(out_dir, [])
