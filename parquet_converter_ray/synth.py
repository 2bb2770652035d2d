"""Deterministic synthetic conversation-transcript table (north-star input).

Schema per BASELINE.json ``input_hint`` / FIXTURES.md F6:

    conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
    ts:timestamp[us]

Properties engineered to exercise the codec layer and the shuffle:
 - Zipf-skewed conversation lengths, with one mega-conversation (>=100x the
   median) to exercise salted-key splitting;
 - ``text`` is seeded token soup with repeated phrases (FSST-friendly), and
   contains BOTH empty strings and nulls (distinct — validity must round-trip);
 - ``tool`` is ~90% null, sparse categorical (RLE/dict-friendly);
 - ``ts`` is monotone increasing within each conversation with jittered deltas
   (delta/frame-of-reference-friendly);
 - rows are emitted SHUFFLED across conversations so the engine's
   hash(conv_id) partition + within-partition sort is actually exercised.

Everything is vectorized (numpy + pyarrow binary_join); generating ~1M turns
takes a few seconds. Seeded: same (n_turns, seed) -> bit-identical table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

ROLES = np.array(["system", "user", "assistant", "tool"])
TOOLS = np.array(["search", "python", "browser", "calculator", "filesystem"])

_PHRASES = [
    "let me check that for you",
    "here is the result of the computation",
    "could you clarify what you mean by",
    "the function returns the following output",
    "i will now run the test suite",
    "this approach has a few tradeoffs",
    "the error message indicates that",
    "according to the documentation",
]


def _vocab(rng: np.random.Generator, size: int = 800) -> np.ndarray:
    syll = np.array(
        ["ta", "ko", "mi", "ra", "su", "ne", "lo", "ve", "da", "pi",
         "sha", "tru", "ble", "gon", "fer", "wix", "zam", "qui", "hel", "por"]
    )
    n_syll = rng.integers(2, 5, size)
    words = []
    for k in n_syll:
        words.append("".join(rng.choice(syll, k)))
    return np.array(words)


def make_transcripts(n_turns: int, seed: int = 42, conv_offset: int = 0) -> pa.Table:
    """Build a deterministic transcript table with exactly ``n_turns`` rows.

    ``conv_offset`` shifts the conversation-id numbering so independently
    generated chunks (write_transcripts at >2M rows) never collide."""
    rng = np.random.default_rng(seed)

    # --- conversation lengths: Zipf-ish tail + one mega-conversation ---
    lengths = []
    total = 0
    median_guess = 16
    mega = min(max(100 * median_guess, n_turns // 20), max(n_turns // 2, 1))
    lengths.append(mega)
    total += mega
    while total < n_turns:
        chunk = np.minimum((rng.pareto(1.8, 4096) * 10 + 2).astype(np.int64), 5000)
        lengths.append(chunk)
        total += int(chunk.sum())
    lens = np.concatenate([np.atleast_1d(np.asarray(x, dtype=np.int64)) for x in lengths])
    # trim to exactly n_turns
    cum = np.cumsum(lens)
    cut = int(np.searchsorted(cum, n_turns))
    lens = lens[: cut + 1].copy()
    lens[-1] -= int(cum[cut]) - n_turns
    lens = lens[lens > 0]
    n_conv = len(lens)

    # --- per-row conv ids and turn indexes ---
    conv_idx = np.repeat(np.arange(n_conv), lens)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    turn_idx = (np.arange(n_turns) - np.repeat(starts, lens)).astype(np.int32)
    conv_names = np.array([f"conv-{conv_offset + i:08d}" for i in range(n_conv)])
    conv_id = conv_names[conv_idx]

    # --- roles: system at turn 0, then user/assistant alternation + tool turns ---
    role = np.where(turn_idx == 0, 0, np.where(turn_idx % 2 == 1, 1, 2))
    tool_turn = (role == 2) & (rng.random(n_turns) < 0.12)
    role = np.where(tool_turn, 3, role)
    role_arr = ROLES[role]

    # --- tool column: set on tool turns (+ a few assistant turns), else null ---
    tool_vals = rng.choice(TOOLS, n_turns)
    tool_mask = tool_turn | ((role == 2) & (rng.random(n_turns) < 0.05))
    tool = np.where(tool_mask, tool_vals, None)

    # --- text: token soup with phrase injection, empty strings, nulls ---
    vocab = _vocab(rng)
    zipf_w = 1.0 / np.arange(1, len(vocab) + 1) ** 1.1
    zipf_w /= zipf_w.sum()
    words_per = rng.integers(4, 60, n_turns)
    text_kind = rng.random(n_turns)
    words_per = np.where(text_kind < 0.01, 0, words_per)  # some zero-word rows
    flat_n = int(words_per.sum())
    flat_words = rng.choice(vocab, flat_n, p=zipf_w)
    offsets = np.zeros(n_turns + 1, dtype=np.int64)
    offsets[1:] = np.cumsum(words_per)
    flat_arr = pa.array(flat_words)
    if isinstance(flat_arr, pa.ChunkedArray):
        flat_arr = flat_arr.combine_chunks()
    wl = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int64()).cast(pa.int32()), flat_arr)
    text = pc.binary_join(wl, " ").to_numpy(zero_copy_only=False).astype(object)
    phrase_mask = rng.random(n_turns) < 0.25
    phrases = rng.choice(_PHRASES, n_turns).astype(object)
    text = np.where(phrase_mask, phrases + " " + text, text)
    null_mask = (text_kind >= 0.01) & (text_kind < 0.02)  # 1% nulls (distinct from empties)
    text = np.where(null_mask, None, text)

    # --- ts: per-conversation monotone with jittered deltas ---
    base = np.int64(1_700_000_000_000_000)  # 2023-11-14 in us
    conv_start = base + rng.integers(0, 90 * 86_400_000_000, n_conv)
    deltas = rng.integers(100_000, 60_000_000, n_turns)
    csum = np.cumsum(deltas)
    group_base = csum[starts] - deltas[starts]
    ts = np.repeat(conv_start, lens) + (csum - np.repeat(group_base, lens))

    # --- shuffle rows across conversations ---
    perm = rng.permutation(n_turns)
    return pa.table(
        {
            "conv_id": pa.array(conv_id[perm], type=pa.string()),
            "turn_idx": pa.array(turn_idx[perm], type=pa.int32()),
            "role": pa.array(role_arr[perm], type=pa.string()),
            "text": pa.array(text[perm], type=pa.string()),
            "tool": pa.array(tool[perm], type=pa.string()),
            "ts": pa.array(ts[perm], type=pa.timestamp("us")),
        }
    )


def write_transcripts(path: str, n_turns: int, seed: int = 42, rows_per_file: int = 250_000) -> str:
    """Write the transcript table as a directory of parquet files; returns path.

    Cached: if the directory already holds the expected row count, it is reused
    (generation is deterministic, so cache hits are exact).
    """
    import os

    import pyarrow.parquet as pq

    meta_file = os.path.join(path, "_SYNTH.json")
    if os.path.exists(meta_file):
        import json

        with open(meta_file) as f:
            m = json.load(f)
        if m.get("n_turns") == n_turns and m.get("seed") == seed:
            return path
    os.makedirs(path, exist_ok=True)
    # generate in <=2M-row chunks (Arrow 2 GB string-array limit) with
    # disjoint conversation-id ranges; deterministic per (n_turns, seed)
    chunk_rows = 2_000_000
    file_idx = 0
    for c, start in enumerate(range(0, n_turns, chunk_rows)):
        n = min(chunk_rows, n_turns - start)
        t = make_transcripts(n, seed + c, conv_offset=c * 10_000_000)
        for i in range(0, max(t.num_rows, 1), rows_per_file):
            pq.write_table(
                t.slice(i, rows_per_file), os.path.join(path, f"input-{file_idx:05d}.parquet")
            )
            file_idx += 1
    import json

    with open(meta_file, "w") as f:
        json.dump({"n_turns": n_turns, "seed": seed}, f)
    return path
