"""Numeric column codecs: plain, bit-pack, frame-of-reference, delta, RLE, dictionary, shuffle.

Each codec is a pair of pure functions over numpy arrays:

    encode(vals: np.ndarray) -> (meta: dict, bufs: list[bytes])
    decode(meta: dict, bufs: list[bytes], n: int) -> np.ndarray

``vals`` carries the physical values with nulls already stripped/filled by the
top-level ``encode_array`` (codecs never see nulls). Integer codecs normalise to
int64 internally; the original dtype is recorded in ``meta["dtype"]``.

These are the lightweight encodings of the north-star spec (BASELINE.json):
bit-packing and frame-of-reference for ints, delta(+zigzag) for
monotone-ish sequences such as per-conversation timestamps, RLE for runs,
dictionary for low cardinality. The reference has no analogue — it delegates
compression to the Parquet codec (reference converter.py:577).
"""

from __future__ import annotations

import numpy as np

from .util import (
    bit_width,
    bitpack,
    bitunpack,
    bitunpack_at,
    bitunpack_range,
    rle_join,
    rle_split,
    unzigzag,
    zigzag,
)

# --- plain -----------------------------------------------------------------


def enc_plain(vals: np.ndarray):
    v = np.ascontiguousarray(vals)
    return {"dtype": v.dtype.str}, [v.tobytes()]


def dec_plain(meta, bufs, n):
    return np.frombuffer(bufs[0], dtype=np.dtype(meta["dtype"]))


# --- byte shuffle (for floats; transport zstd exploits the regularity) -----


def enc_shuffle(vals: np.ndarray):
    v = np.ascontiguousarray(vals)
    raw = v.view(np.uint8).reshape(len(v), v.dtype.itemsize)
    return {"dtype": v.dtype.str}, [np.ascontiguousarray(raw.T).tobytes()]


def dec_shuffle(meta, bufs, n):
    dt = np.dtype(meta["dtype"])
    raw = np.frombuffer(bufs[0], dtype=np.uint8).reshape(dt.itemsize, n)
    return np.ascontiguousarray(raw.T).reshape(-1).view(dt)[:n]


# --- frame-of-reference (subtract min, bit-pack) ---------------------------


def enc_for(vals: np.ndarray):
    v = vals.astype(np.int64, copy=False)
    if len(v) == 0:
        return {"dtype": vals.dtype.str, "ref": 0, "w": 0}, [b""]
    ref = int(v.min())
    if int(v.max()) - ref >= 2**63:
        raise ValueError("value range exceeds int64; use plain")
    d = (v - ref).view(np.uint64)
    w = bit_width(int(d.max()))
    return {"dtype": vals.dtype.str, "ref": ref, "w": w}, [bitpack(d, w)]


def dec_for(meta, bufs, n):
    d = bitunpack(bufs[0], meta["w"], n).view(np.int64) + meta["ref"]
    return d.astype(np.dtype(meta["dtype"]))


# --- bit-pack (FOR with ref pinned to zero; requires non-negative input) ----


def enc_bitpack(vals: np.ndarray):
    v = vals.astype(np.int64, copy=False)
    if len(v) and int(v.min()) < 0:
        raise ValueError("bitpack requires non-negative values; use 'for'")
    w = bit_width(int(v.max())) if len(v) else 0
    return {"dtype": vals.dtype.str, "w": w}, [bitpack(v.view(np.uint64), w)]


def dec_bitpack(meta, bufs, n):
    return bitunpack(bufs[0], meta["w"], n).view(np.int64).astype(np.dtype(meta["dtype"]))


# --- delta (+zigzag +FOR): sorted-ish sequences, timestamps ----------------


DELTA_BLOCK = 4096  # anchor spacing: random access decodes one block, not a prefix


def enc_delta(vals: np.ndarray):
    v = vals.astype(np.int64, copy=False)
    if len(v) == 0:
        return {"dtype": vals.dtype.str, "first": 0, "ref": 0, "w": 0}, [b""]
    if int(v.max()) - int(v.min()) >= 2**62:
        raise ValueError("delta range exceeds zigzag headroom; use plain")
    d = np.diff(v)
    z = zigzag(d)
    if len(z):
        ref = int(z.min())
        zz = (z - np.uint64(ref)) if ref >= 0 else z
        w = bit_width(int(zz.max()))
    else:
        ref, w, zz = 0, 0, z
    # block anchors: the raw value at every DELTA_BLOCK-th row (8 bytes per
    # 4096 rows, <1% of any real delta stream) buy O(block) random access —
    # without them every selective decode prefix-sums from row 0
    anchors = np.ascontiguousarray(v[DELTA_BLOCK::DELTA_BLOCK])
    return (
        {"dtype": vals.dtype.str, "first": int(v[0]), "ref": ref, "w": w, "B": DELTA_BLOCK},
        [bitpack(zz, w), anchors.tobytes()],
    )


def dec_delta(meta, bufs, n):
    dt = np.dtype(meta["dtype"])
    if n == 0:
        return np.zeros(0, dtype=dt)
    z = bitunpack(bufs[0], meta["w"], n - 1) + np.uint64(meta["ref"])
    d = unzigzag(z)
    out = np.empty(n, dtype=np.int64)
    out[0] = meta["first"]
    np.cumsum(d, out=out[1:])
    out[1:] += meta["first"]
    return out.astype(dt)


# --- RLE (run values FOR-packed for ints, raw for floats) ------------------


def enc_rle(vals: np.ndarray):
    values, lengths = rle_split(vals)
    n_runs = len(values)
    meta: dict = {"dtype": vals.dtype.str, "n_runs": n_runs}
    if vals.dtype.kind in "iu":
        vmeta, vbufs = enc_for(values)
        meta["vmeta"] = vmeta
        vbuf = vbufs[0]
    else:
        vbuf = np.ascontiguousarray(values).tobytes()
    lmeta, lbufs = enc_for(lengths)
    meta["lmeta"] = lmeta
    return meta, [vbuf, lbufs[0]]


def dec_rle(meta, bufs, n):
    dt = np.dtype(meta["dtype"])
    n_runs = meta["n_runs"]
    if dt.kind in "iu":
        values = dec_for(meta["vmeta"], [bufs[0]], n_runs)
    else:
        values = np.frombuffer(bufs[0], dtype=dt)
    lengths = dec_for(meta["lmeta"], [bufs[1]], n_runs)
    return rle_join(values, lengths)[:n]


# --- dictionary (low-cardinality numerics, incl. floats without NaN) -------


def enc_dictnum(vals: np.ndarray):
    uniq = np.unique(vals)  # sorted
    codes = np.searchsorted(uniq, vals).astype(np.int64)
    # sub-encode codes: whichever of bitpack / RLE is smaller
    bp_meta, bp_bufs = enc_bitpack(codes)
    rl_meta, rl_bufs = enc_rle(codes)
    if sum(map(len, rl_bufs)) < len(bp_bufs[0]):
        cmeta, cbufs = {"sub": "rle", **rl_meta}, rl_bufs
    else:
        cmeta, cbufs = {"sub": "bitpack", **bp_meta}, bp_bufs
    meta = {
        "dtype": vals.dtype.str,
        "card": len(uniq),
        "codes": cmeta,
    }
    return meta, [np.ascontiguousarray(uniq).tobytes(), *cbufs]


def dec_dictnum(meta, bufs, n):
    dt = np.dtype(meta["dtype"])
    uniq = np.frombuffer(bufs[0], dtype=dt)
    cmeta = meta["codes"]
    if cmeta["sub"] == "rle":
        codes = dec_rle(cmeta, bufs[1:], n)
    else:
        codes = dec_bitpack(cmeta, bufs[1:], n)
    return uniq[codes.astype(np.int64)]


# --- selective-row decode (late materialization) ----------------------------
#
# Each ``dec_*_rows(meta, bufs, n, idx)`` returns exactly the rows at sorted
# indices ``idx`` — equal to ``dec_*(meta, bufs, n)[idx]`` — while touching as
# little of the encoded stream as the codec's structure allows: plain/shuffle
# gather directly, FOR/bitpack extract single bit-fields, RLE binary-searches
# run boundaries, dict gathers codes then probes the (already tiny) uniq
# buffer. Delta is the one prefix-dependent codec: it decodes the prefix up to
# max(idx) (cumsum can't skip) and gathers from it.


def dec_plain_rows(meta, bufs, n, idx):
    return np.frombuffer(bufs[0], dtype=np.dtype(meta["dtype"]))[idx]


def dec_shuffle_rows(meta, bufs, n, idx):
    dt = np.dtype(meta["dtype"])
    raw = np.frombuffer(bufs[0], dtype=np.uint8).reshape(dt.itemsize, n)
    return np.ascontiguousarray(raw[:, idx].T).reshape(-1).view(dt)[: len(idx)]


def dec_for_rows(meta, bufs, n, idx):
    d = bitunpack_at(bufs[0], meta["w"], idx).view(np.int64) + meta["ref"]
    return d.astype(np.dtype(meta["dtype"]))


def dec_bitpack_rows(meta, bufs, n, idx):
    return bitunpack_at(bufs[0], meta["w"], idx).view(np.int64).astype(np.dtype(meta["dtype"]))


def dec_delta_rows(meta, bufs, n, idx):
    dt = np.dtype(meta["dtype"])
    idx = np.asarray(idx, dtype=np.int64)
    if len(idx) == 0 or n == 0:
        return np.zeros(0, dtype=dt)
    B = meta.get("B")
    m = int(idx[-1]) + 1  # idx is sorted by contract
    if B and len(bufs) > 1:
        blocks = np.unique(idx // B)
        # dense selections: one vectorized prefix decode beats a block loop
        if len(blocks) * B < m // 2:
            anchors = np.frombuffer(bufs[1], dtype=np.int64)
            w, ref, first = meta["w"], np.uint64(meta["ref"]), meta["first"]
            out = np.empty(len(idx), dtype=np.int64)
            pos = 0
            for b in blocks:
                start = int(b) * B
                end = min(start + B, n)
                base = first if b == 0 else int(anchors[b - 1])
                d = unzigzag(bitunpack_range(bufs[0], w, start, end - 1 - start) + ref)
                vals = np.empty(end - start, dtype=np.int64)
                vals[0] = base
                np.cumsum(d, out=vals[1:])
                vals[1:] += base
                k = np.searchsorted(idx, end, side="left")
                out[pos:k] = vals[idx[pos:k] - start]
                pos = k
            return out.astype(dt)
    z = bitunpack(bufs[0], meta["w"], m - 1) + np.uint64(meta["ref"])
    d = unzigzag(z)
    out = np.empty(m, dtype=np.int64)
    out[0] = meta["first"]
    np.cumsum(d, out=out[1:])
    out[1:] += meta["first"]
    return out[idx].astype(dt)


def dec_rle_rows(meta, bufs, n, idx):
    dt = np.dtype(meta["dtype"])
    n_runs = meta["n_runs"]
    if dt.kind in "iu":
        values = dec_for(meta["vmeta"], [bufs[0]], n_runs)
    else:
        values = np.frombuffer(bufs[0], dtype=dt)
    lengths = dec_for(meta["lmeta"], [bufs[1]], n_runs)
    ends = np.cumsum(lengths)
    return values[np.searchsorted(ends, np.asarray(idx, dtype=np.int64), side="right")]


def dec_codes_rows(cmeta, cbufs, n, idx) -> np.ndarray:
    """Selected dictionary codes (int64) under the dict sub-encoding."""
    if cmeta["sub"] == "rle":
        return dec_rle_rows(cmeta, cbufs, n, idx).astype(np.int64)
    return dec_bitpack_rows(cmeta, cbufs, n, idx).astype(np.int64)


def dec_dictnum_rows(meta, bufs, n, idx):
    uniq = np.frombuffer(bufs[0], dtype=np.dtype(meta["dtype"]))
    return uniq[dec_codes_rows(meta["codes"], bufs[1:], n, idx)]
