"""Low-level codec primitives: bit-packing, RLE split/join, zigzag, transport compression.

All functions are pure numpy/pyarrow — no Ray. These are the building blocks the
column codecs (numeric.py / strings.py / fsst.py) compose.

Transport compression wraps every encoded buffer with an optional zstd layer
(general-purpose entropy stage after the lightweight encoding), mirroring how
Parquet applies snappy/zstd after dictionary/RLE. The reference delegates all
compression to the Parquet codec (/root/reference/parquet_converter/converter.py:577);
here the lightweight codecs do the structural work and zstd only mops up.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_ZSTD = pa.Codec("zstd", compression_level=3)

# --- transport compression -------------------------------------------------

RAW_FLAG = b"\x00"
ZSTD_FLAG = b"\x01"


def wrap_buf(buf: bytes, min_gain: float = 0.96) -> bytes:
    """Optionally zstd-compress a buffer. Layout: flag(1) [+ orig_len(8)] + payload."""
    if len(buf) >= 64:
        comp = _ZSTD.compress(buf, asbytes=True)
        if len(comp) + 9 < len(buf) * min_gain:
            return ZSTD_FLAG + len(buf).to_bytes(8, "little") + comp
    return RAW_FLAG + buf


def unwrap_buf(buf: bytes) -> bytes:
    flag = buf[:1]
    if flag == RAW_FLAG:
        return buf[1:]
    orig_len = int.from_bytes(buf[1:9], "little")
    return _ZSTD.decompress(buf[9:], decompressed_size=orig_len, asbytes=True)


# --- bit packing (MSB-first per value) -------------------------------------


def bit_width(max_val: int) -> int:
    """Bits needed to represent max_val (0 -> 0 bits).

    Examples
    --------
    >>> bit_width(0), bit_width(1), bit_width(255), bit_width(256)
    (0, 1, 8, 9)
    """
    return int(max_val).bit_length()


def bitpack(vals: np.ndarray, width: int) -> bytes:
    """Pack non-negative uint64 values into `width` bits each, MSB-first."""
    n = len(vals)
    if width == 0 or n == 0:
        return b""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def bitunpack(buf: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of bitpack -> uint64 array of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=n * width)
    bits = bits.reshape(n, width).astype(np.uint64)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    return (bits << shifts).sum(axis=1)


def bitunpack_range(buf: bytes, width: int, start: int, n: int) -> np.ndarray:
    """Unpack the ``n`` values at stream positions [start, start+n) — i.e.
    ``bitunpack(buf, width, start + n)[start:]`` — touching only the bytes
    that hold those bits. The block-anchored delta decoder uses this to
    expand one 4096-row block instead of the whole prefix."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    bit0 = start * width
    byte0 = bit0 >> 3
    nbytes = (bit0 + n * width + 7) // 8 - byte0
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8)[byte0 : byte0 + nbytes])
    off = bit0 & 7
    bits = bits[off : off + n * width].reshape(n, width).astype(np.uint64)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    return (bits << shifts).sum(axis=1)


def bitunpack_at(buf: bytes, width: int, idx: np.ndarray) -> np.ndarray:
    """Random-access bitunpack: extract ONLY the values at row indices ``idx``
    from a bit-packed stream -> uint64 array of len(idx).

    Value i occupies stream bits [i*width, (i+1)*width) MSB-first (matching
    ``bitpack``'s np.packbits layout). Cost is O(len(idx) * width) gathers —
    the same per-row work as a full unpack, paid only for selected rows.
    """
    k = len(idx)
    if width == 0 or k == 0:
        return np.zeros(k, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    pos = np.asarray(idx, dtype=np.int64)[:, None] * width + np.arange(width, dtype=np.int64)
    bits = (b[pos >> 3] >> (7 - (pos & 7)).astype(np.uint8)) & np.uint8(1)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    return (bits.astype(np.uint64) << shifts).sum(axis=1)


def gather_slices(data: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> bytes:
    """Concatenate ``data[starts[i] : starts[i]+lens[i]]`` for every i, fully
    vectorized (the scatter+cumsum source-index trick from the FSST decoder:
    within a slice src advances by 1, at each slice boundary it jumps to the
    next slice's start). Zero-length slices contribute nothing."""
    nz = lens > 0
    s = starts[nz].astype(np.int64)
    l = lens[nz].astype(np.int64)
    if len(s) == 0:
        return b""
    total = int(l.sum())
    ends = np.cumsum(l)
    delta = np.ones(total, dtype=np.int64)
    delta[0] = s[0]
    if len(s) > 1:
        delta[ends[:-1]] = s[1:] - (s[:-1] + l[:-1] - 1)
    return data[np.cumsum(delta)].tobytes()


# --- run-length ------------------------------------------------------------


def rle_split(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Split array into (run_values, run_lengths). Works for any comparable dtype.

    Examples
    --------
    >>> v, l = rle_split(np.array([7, 7, 7, 2, 2, 9]))
    >>> v.tolist(), l.tolist()
    ([7, 2, 9], [3, 2, 1])
    """
    n = len(a)
    if n == 0:
        return a[:0], np.zeros(0, dtype=np.int64)
    change = np.nonzero(a[1:] != a[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    return a[starts], (ends - starts).astype(np.int64)


def rle_join(values: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    return np.repeat(values, lengths)


# --- zigzag (signed -> unsigned for bit-packing deltas) --------------------


def zigzag(a: np.ndarray) -> np.ndarray:
    """int64 -> uint64 zigzag: 0,-1,1,-2,2 ... -> 0,1,2,3,4.

    Examples
    --------
    >>> zigzag(np.array([0, -1, 1, -2, 2])).tolist()
    [0, 1, 2, 3, 4]
    """
    v = a.astype(np.int64)
    return ((v << 1) ^ (v >> 63)).view(np.uint64)


def unzigzag(u: np.ndarray) -> np.ndarray:
    v = np.ascontiguousarray(u, dtype=np.uint64)
    return ((v >> np.uint64(1)).view(np.int64)) ^ -((v & np.uint64(1)).view(np.int64))


# --- validity bitmaps ------------------------------------------------------


def pack_validity(valid: np.ndarray) -> bytes:
    return np.packbits(valid.astype(np.uint8)).tobytes()


def unpack_validity(buf: bytes, n: int) -> np.ndarray:
    return np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=n).astype(bool)
