"""FSST-style string compression, from scratch, fully vectorized with numpy.

Fast Static Symbol Table compression (Boncz, Neumann, Leis — "FSST: Fast Random
Access String Compression", VLDB 2020, public paper): replace frequent substrings
(symbols of 1..8 bytes) with 1-byte codes; code 255 is an escape prefix for bytes
not covered by the 255-entry symbol table.

This implementation trains the table with a byte-pair-merge scheme (BPE-like
greedy merging on a bounded sample, which naturally grows 2..8-byte symbols
from frequent pairs), then applies ALL merges to the full payload with
generation-parallel vectorized numpy pair replacement — no per-byte Python
loops anywhere:

  train:   sample bytes -> uint16 working array; repeatedly bincount adjacent
           pairs, merge the most frequent pair into a new code (256+i), cap
           symbol length at 8, stop at <=128 merges (leaves >=127 codes for
           frequent single bytes).
  encode:  slab-wise (256 KB — cache-resident working set): one uint16-key
           pass applies every first-generation merge simultaneously, then up
           to 8 full-pairmap passes apply deeper generations (any greedy
           segmentation decodes correctly, so replay order is free); map
           working values to output codes; uncovered literals get
           escape(255)+byte.
  decode:  slab-wise; parse escapes via run-parity over runs of 255-bytes (a
           255 run's even offsets are escape controls), then expand codes to
           symbol bytes with a flat-buffer gather (np.repeat + arange).

The column payload is one concatenated byte stream of slab streams (symbols may span string
boundaries); original string lengths are stored FOR-bit-packed so offsets are
reconstructed exactly. Strings round-trip bit-identical, including empty strings
(nulls are handled above the codec layer; see codecs/__init__.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .numeric import dec_for, enc_for
from .strings import str_build, str_parts
from .util import gather_slices

_MAX_SYMBOL_LEN = 8
_MAX_MERGES = 128
_ESCAPE = 255
_ALPHA = 512  # working alphabet: 0..255 literals, 256..511 merge codes


def _replace_pair(seq: np.ndarray, l: int, r: int, code: int) -> tuple[np.ndarray, int]:
    """Replace non-overlapping occurrences of adjacent pair (l, r) with `code`."""
    if len(seq) < 2:
        return seq, 0
    m = (seq[:-1] == l) & (seq[1:] == r)
    p = np.nonzero(m)[0]
    if len(p) == 0:
        return seq, 0
    if l == r and len(p) > 1:
        # overlapping matches only possible when l == r (e.g. "aa" in "aaaa");
        # within each run of consecutive match positions keep offsets 0,2,4...
        starts_mask = np.empty(len(p), dtype=bool)
        starts_mask[0] = True
        np.not_equal(np.diff(p), 1, out=starts_mask[1:])
        run_id = np.cumsum(starts_mask) - 1
        run_start = p[starts_mask][run_id]
        p = p[((p - run_start) & 1) == 0]
    keep = np.ones(len(seq), dtype=bool)
    keep[p + 1] = False
    seq[p] = code
    return seq[keep], len(p)


class FsstTable:
    """Trained symbol table: ordered merge list + output-code assignment."""

    __slots__ = ("merges", "code_map", "code_syms")

    def __init__(self, merges: list[tuple[int, int]], code_map: np.ndarray, code_syms: list[bytes]):
        self.merges = merges
        self.code_map = code_map  # int16[512]: working value -> output code, -1 = escape
        self.code_syms = code_syms  # output code -> expansion bytes


def train(
    data: bytes, max_merges: int = _MAX_MERGES, sample_cap: int = 1 << 17, round_size: int = 8
) -> FsstTable:
    """Train a symbol table by byte-pair merging on a bounded sample.

    Merges are committed in ROUNDS of up to ``round_size`` pairs per
    pair-count pass: the full count histogram + top-k selection is the
    expensive step (bincount over the 512x512 pair space + argpartition), so
    amortising it over several merges cuts training ~3x. Within a round the
    counts go slightly stale (an earlier replace can shrink a later pair's
    true count), costing <1% compression vs strictly-greedy BPE (measured)."""
    sample = _sample_bytes(data, sample_cap)
    seq = np.frombuffer(sample, dtype=np.uint8).astype(np.uint16)
    sym_len = np.ones(_ALPHA, dtype=np.int64)  # working value -> symbol byte length
    merges: list[tuple[int, int]] = []
    min_count = max(4, len(seq) // (1 << 16))
    while len(merges) < max_merges and len(seq) >= 2:
        key = seq[:-1].astype(np.int32) * _ALPHA + seq[1:]
        counts = np.bincount(key, minlength=_ALPHA * _ALPHA)
        # best pairs whose merged symbols stay within 8 bytes
        top = np.argpartition(counts, -64)[-64:]
        top = top[np.argsort(counts[top])[::-1]]
        round_pairs: list[tuple[int, int]] = []
        used: set[int] = set()
        for k in top:
            if counts[k] < min_count or len(round_pairs) >= round_size:
                break
            l, r = divmod(int(k), _ALPHA)
            if l in used or r in used:
                continue  # symbol-disjoint rounds keep the stale counts honest
            if sym_len[l] + sym_len[r] <= _MAX_SYMBOL_LEN:
                round_pairs.append((l, r))
                used.update((l, r))
        if not round_pairs:
            break
        any_rep = False
        for l, r in round_pairs:
            if len(merges) >= max_merges:
                break
            code = 256 + len(merges)
            seq, n_rep = _replace_pair(seq, l, r, code)
            if n_rep == 0:
                continue
            sym_len[code] = sym_len[l] + sym_len[r]
            merges.append((l, r))
            any_rep = True
        if not any_rep:
            break
    # expansions for every working value
    exp: list[bytes] = [bytes([v]) for v in range(256)] + [b""] * 256
    for i, (l, r) in enumerate(merges):
        exp[256 + i] = exp[l] + exp[r]
    # output-code assignment: all merge codes, then most frequent literals
    freqs = np.bincount(seq, minlength=_ALPHA)
    m = len(merges)
    lit_vals = np.nonzero(freqs[:256] > 0)[0]
    slots = 255 - m
    if len(lit_vals) > slots:
        order = np.argsort(freqs[lit_vals], kind="stable")[::-1]
        lit_vals = np.sort(lit_vals[order[:slots]])
    code_map = np.full(_ALPHA, -1, dtype=np.int16)
    code_syms: list[bytes] = []
    for i in range(m):
        code_map[256 + i] = i
        code_syms.append(exp[256 + i])
    for j, v in enumerate(lit_vals):
        code_map[v] = m + j
        code_syms.append(exp[v])
    return FsstTable(merges, code_map, code_syms)


def _sample_bytes(data: bytes, cap: int) -> bytes:
    if len(data) <= cap:
        return data
    n_chunks = 8
    chunk = cap // n_chunks
    stride = (len(data) - chunk) // max(1, n_chunks - 1)
    return b"".join(data[i * stride : i * stride + chunk] for i in range(n_chunks))


def _pairmap(merges: list[tuple[int, int]]) -> np.ndarray:
    pm = np.full(_ALPHA * _ALPHA, -1, dtype=np.int32)
    for i, (l, r) in enumerate(merges):
        pm[l * _ALPHA + r] = 256 + i
    return pm


def _lit_table(pm: np.ndarray) -> np.ndarray:
    """Literal-literal sub-table of the pairmap: key = l*256+r (256 KB)."""
    lit = np.full(1 << 16, -1, dtype=np.int32)
    src = np.nonzero(pm >= 0)[0]
    l, r = src // _ALPHA, src % _ALPHA
    m = (l < 256) & (r < 256)
    lit[l[m] * 256 + r[m]] = pm[src[m]]
    return lit


def _replace_pass0(seq: np.ndarray, lit: np.ndarray) -> np.ndarray:
    """First generation fast path: all values are literals (<256), so the pair
    key fits uint16 and the lookup table is cache-resident."""
    if len(seq) < 2:
        return seq
    key = (seq[:-1] << np.uint16(8)) | seq[1:]
    codes = lit[key]
    p = np.nonzero(codes >= 0)[0]
    if len(p) == 0:
        return seq
    if len(p) > 1:
        starts_mask = np.empty(len(p), dtype=bool)
        starts_mask[0] = True
        np.not_equal(np.diff(p), 1, out=starts_mask[1:])
        run_id = np.cumsum(starts_mask) - 1
        run_start = p[starts_mask][run_id]
        p = p[((p - run_start) & 1) == 0]
    keep = np.ones(len(seq), dtype=bool)
    keep[p + 1] = False
    seq[p] = codes[p].astype(np.uint16)
    return seq[keep]


def _replace_all(seq: np.ndarray, pm: np.ndarray, max_passes: int = 8) -> np.ndarray:
    """Apply ALL pair merges simultaneously, a generation per pass.

    Each pass: one pair-key lookup finds every replaceable adjacent pair at
    once; conflicts between adjacent matches are resolved greedily-left with
    the run-parity trick. Any greedy segmentation is decodable, so the replay
    does not need to replicate the training's sequential merge order — this is
    what makes encode O(passes * n) instead of O(merges * n)."""
    for _ in range(max_passes):
        if len(seq) < 2:
            break
        key = seq[:-1].astype(np.int32) * _ALPHA + seq[1:]
        codes = pm[key]
        p = np.nonzero(codes >= 0)[0]
        # early stop: late generations replace a vanishing fraction — the
        # memory traffic of another full pass isn't worth <1% extra matches
        if len(p) < max(64, len(seq) // 100):
            break
        if len(p) > 1:
            # drop matches adjacent to a kept match (greedy left-to-right)
            starts_mask = np.empty(len(p), dtype=bool)
            starts_mask[0] = True
            np.not_equal(np.diff(p), 1, out=starts_mask[1:])
            run_id = np.cumsum(starts_mask) - 1
            run_start = p[starts_mask][run_id]
            p = p[((p - run_start) & 1) == 0]
        keep = np.ones(len(seq), dtype=bool)
        keep[p + 1] = False
        seq[p] = codes[p].astype(np.uint16)
        seq = seq[keep]
    return seq


_SLAB = 256 << 10  # compress in ~256 KB slabs: intermediates stay cache-resident


def compress(data: bytes, table: FsstTable, slab_size: int = _SLAB) -> bytes:
    """Slab-wise FSST encode.

    Examples
    --------
    >>> data = b"the quick brown fox " * 100
    >>> t = train(data)
    >>> enc = compress(data, t)
    >>> len(enc) < len(data) // 2
    True
    >>> decompress(enc, t.code_syms) == data
    True
    

    The pair-replacement passes amplify memory traffic ~25x (uint16 working
    array, int32 keys/codes, masks, compaction). Processed whole, a 20 MB
    column streams ~500 MB through DRAM and concurrent encoders saturate the
    node's memory bandwidth — measured on this sandbox as encode running
    SLOWER at 32 CPUs than at 8. Slabbing keeps the whole working set in
    cache, so DRAM sees roughly input+output only and the stage scales with
    cores. Cost: pair matches cannot span slab boundaries (<0.2% size).
    Concatenated slab streams decode as one stream (escape pairs never span
    a boundary)."""
    if len(data) == 0:
        return b""
    payload, _ = compress_slabbed(data, table, slab_size)
    return payload


def compress_slabbed(
    data: bytes, table: FsstTable, slab_size: int = _SLAB
) -> tuple[bytes, list[list[int]]]:
    """Slab-wise encode returning (payload, [[enc_len, dec_len], ...]) so
    decode can also work slab-by-slab (cache-resident both ways)."""
    if len(data) == 0:
        return b"", []
    pm = _pairmap(table.merges)
    lit = _lit_table(pm)
    raw = np.frombuffer(data, dtype=np.uint8)
    parts = []
    slabs: list[list[int]] = []
    for off in range(0, len(raw), slab_size):
        chunk = raw[off : off + slab_size]
        seq = chunk.astype(np.uint16)
        seq = _replace_pass0(seq, lit)
        seq = _replace_all(seq, pm)
        codes = table.code_map[seq]
        esc = codes < 0
        widths = np.where(esc, 2, 1).astype(np.int64)
        ends = np.cumsum(widths)
        starts = ends - widths
        out = np.empty(int(ends[-1]), dtype=np.uint8)
        out[starts] = np.where(esc, _ESCAPE, codes).astype(np.uint8)
        out[starts[esc] + 1] = seq[esc].astype(np.uint8)
        parts.append(out.tobytes())
        slabs.append([len(parts[-1]), len(chunk)])
    return b"".join(parts), slabs


def decompress(payload: bytes, code_syms: list[bytes], slabs: list[list[int]] | None = None) -> bytes:
    """Decode a payload; with ``slabs`` metadata, decode slab-by-slab so the
    unit/gather working set stays cache-resident (same scaling rationale as
    ``compress_slabbed``)."""
    if slabs:
        tables = _expansion_tables(code_syms)
        parts = []
        off = 0
        for enc_len, _dec_len in slabs:
            parts.append(_decompress_one(payload[off : off + enc_len], tables))
            off += enc_len
        return b"".join(parts)
    return _decompress_one(payload, _expansion_tables(code_syms))


def _expansion_tables(code_syms: list[bytes]):
    flat = b"".join(code_syms) + bytes(range(256))
    lens = np.zeros(511, dtype=np.int64)
    starts = np.zeros(511, dtype=np.int64)
    off = 0
    for i, s in enumerate(code_syms):
        starts[i] = off
        lens[i] = len(s)
        off += len(s)
    starts[255:511] = off + np.arange(256)
    lens[255:511] = 1
    return np.frombuffer(flat, dtype=np.uint8), starts, lens


def _decompress_one(payload: bytes, tables) -> bytes:
    flat_np, starts, lens = tables
    b = np.frombuffer(payload, dtype=np.uint8)
    if len(b) == 0:
        return b""
    pos255 = np.nonzero(b == _ESCAPE)[0]
    if len(pos255):
        starts_mask = np.empty(len(pos255), dtype=bool)
        starts_mask[0] = True
        np.not_equal(np.diff(pos255), 1, out=starts_mask[1:])
        run_id = np.cumsum(starts_mask) - 1
        run_start = pos255[starts_mask][run_id]
        ctrl = pos255[((pos255 - run_start) & 1) == 0]
        lit_pos = ctrl + 1
        consumed = np.zeros(len(b), dtype=bool)
        consumed[pos255] = True
        consumed[lit_pos] = True
        coded_pos = np.nonzero(~consumed)[0]
        allpos = np.concatenate([ctrl, coded_pos])
        ids = np.concatenate(
            [b[lit_pos].astype(np.int32) + 255, b[coded_pos].astype(np.int32)]
        )
        ids = ids[np.argsort(allpos, kind="stable")]
    else:
        ids = b.astype(np.int32)
    # expansion: ids 0..254 -> code_syms, ids 255..510 -> literal byte (id-255)
    # src index built by scatter+cumsum instead of two total-length
    # np.repeat passes (repeat dominated the decode profile):
    #   within a symbol src increments by 1; at each symbol boundary it jumps
    #   to the next symbol's start
    l = lens[ids]
    total = int(l.sum())
    if total == 0:
        return b""
    out_ends = np.cumsum(l)
    sym_starts = starts[ids]
    delta = np.ones(total, dtype=np.int64)
    delta[0] = sym_starts[0]
    if len(ids) > 1:
        delta[out_ends[:-1]] = sym_starts[1:] - (sym_starts[:-1] + l[:-1] - 1)
    src = np.cumsum(delta)
    return flat_np[src].tobytes()


# --- column codec interface -------------------------------------------------


def enc_fsst(arr: pa.Array, table: FsstTable | None = None):
    """``table`` lets the cost model's sample-trained table be reused for the
    full encode (training twice per partition was the dominant fixed cost)."""
    lens, data = str_parts(arr)
    if table is None:
        table = train(data)
    payload, slabs = compress_slabbed(data, table)
    lmeta, lbufs = enc_for(lens)
    sym_lens = [len(s) for s in table.code_syms]
    meta = {"lmeta": lmeta, "sym_lens": sym_lens, "slabs": slabs}
    sym_flat = b"".join(table.code_syms)
    return meta, [lbufs[0], sym_flat, payload]


def dec_fsst(meta, bufs, n):
    lens = dec_for(meta["lmeta"], [bufs[0]], n)
    code_syms = _split_syms(meta, bufs[1])
    data = decompress(bufs[2], code_syms, slabs=meta.get("slabs"))
    return str_build(lens, data)


def _split_syms(meta, sym_flat: bytes) -> list[bytes]:
    code_syms: list[bytes] = []
    off = 0
    for sl in meta["sym_lens"]:
        code_syms.append(sym_flat[off : off + sl])
        off += sl
    return code_syms


def dec_fsst_rows(meta, bufs, n, idx):
    """Rows ``idx`` decoded via FSST's random-access property (the paper's
    headline capability): string byte ranges map to 256 KB slabs through the
    recorded per-slab (enc_len, dec_len) pairs, and ONLY the slabs a selected
    string touches are decompressed. A sparse selection over a large container
    decodes a handful of slabs instead of the whole payload."""
    lens = dec_for(meta["lmeta"], [bufs[0]], n)
    if len(idx) == 0:
        return str_build(np.zeros(0, dtype=np.int64), b"")
    slabs = meta.get("slabs")
    if not slabs:
        data = decompress(bufs[2], _split_syms(meta, bufs[1]), slabs=slabs)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        ls = lens[idx]
        return str_build(ls, gather_slices(np.frombuffer(data, dtype=np.uint8), offs[idx], ls))
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    starts, ls = offs[idx], lens[idx]
    enc_lens = np.array([s[0] for s in slabs], dtype=np.int64)
    dec_lens = np.array([s[1] for s in slabs], dtype=np.int64)
    dec_ends = np.cumsum(dec_lens)
    dec_starts = dec_ends - dec_lens
    enc_ends = np.cumsum(enc_lens)
    enc_starts = enc_ends - enc_lens
    n_slabs = len(slabs)
    nz = ls > 0
    s_lo = np.searchsorted(dec_ends, starts[nz], side="right")
    s_hi = np.searchsorted(dec_ends, starts[nz] + ls[nz] - 1, side="right")
    # keep every slab each selected string spans (ranges merge into runs, so a
    # spanning string stays contiguous in the concatenated decode below)
    mark = np.zeros(n_slabs + 1, dtype=np.int64)
    np.add.at(mark, s_lo, 1)
    np.add.at(mark, s_hi + 1, -1)
    kept = np.nonzero(np.cumsum(mark[:n_slabs]) > 0)[0]
    tables = _expansion_tables(_split_syms(meta, bufs[1]))
    parts = []
    shift = np.zeros(n_slabs, dtype=np.int64)  # orig dec offset -> concat offset
    off = 0
    for si in kept:
        parts.append(_decompress_one(bufs[2][enc_starts[si] : enc_ends[si]], tables))
        shift[si] = off - dec_starts[si]
        off += dec_lens[si]
    concat = np.frombuffer(b"".join(parts), dtype=np.uint8)
    tr_starts = np.zeros(len(idx), dtype=np.int64)
    tr_starts[nz] = starts[nz] + shift[s_lo]
    return str_build(ls, gather_slices(concat, tr_starts, ls))
