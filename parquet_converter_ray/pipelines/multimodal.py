"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The image/audio decode libraries are NOT available in this container, so the
decode kernel is a clearly-marked deterministic STUB — but the Ray-side
plumbing is real and tested: binary columns flow as Arrow ``binary`` (kept in
``batch_format="pyarrow"`` — binary round-trips poorly through pandas), the
feature extractor is an actor-pool stage with per-actor setup, batch sizes are
small because payload rows are wide, and outputs are fixed-width feature
vectors + metadata columns.

Swap ``_StubDecoder.decode`` for a real PIL/libvips/ffmpeg call and nothing
else changes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def synth_binary_dataset(n: int = 512, seed: int = 9) -> "ray.data.Dataset":
    """Deterministic fake media table: (item_id, payload: binary, media_type,
    width, height) — payload layout: 4-byte magic, 2x uint16 dims, raw bytes."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
        body = rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
        payload = b"FAKE" + int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little") + body
        rows.append(
            {
                "item_id": i,
                "payload": payload,
                "media_type": ["image/fake", "audio/fake"][i % 2],
            }
        )
    return ray.data.from_items(rows)


class _StubDecoder:
    """STUB for the media decode library (not installed in this container).

    Real implementation would: PIL.Image.open(BytesIO(payload)) / soundfile /
    pyav frame sampling. The stub parses the deterministic fake header and
    produces a 16-bin byte histogram as the "feature vector"."""

    def decode(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        if payload[:4] != b"FAKE":
            raise NotImplementedError(
                "real media decoding requires PIL/ffmpeg — not available in this container"
            )
        w = int.from_bytes(payload[4:6], "little")
        h = int.from_bytes(payload[6:8], "little")
        body = np.frombuffer(payload[8:], dtype=np.uint8)
        hist = np.bincount(body >> 4, minlength=16).astype(np.float64)
        hist /= max(hist.sum(), 1)
        return w, h, hist


class FeatureExtractor:
    """Actor-pool stage: per-actor decoder setup in __init__, vectorized-ish
    per-batch feature extraction in __call__ (arrow in / arrow out)."""

    def __init__(self):
        self.decoder = _StubDecoder()  # model/codec load happens ONCE per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, feats = [], [], []
        for payload in batch["payload"]:
            w, h, f = self.decoder.decode(payload.as_py())
            widths.append(w)
            heights.append(h)
            feats.append(f.round(6).tolist())
        return pa.table(
            {
                "item_id": batch["item_id"],
                "media_type": batch["media_type"],
                "width": pa.array(widths, type=pa.int32()),
                "height": pa.array(heights, type=pa.int32()),
                "features": pa.array(feats, type=pa.list_(pa.float64())),
            }
        )


def multimodal_features(sf_dir: str | None = None) -> pa.Table:
    """Flagship multimodal pipeline: synth binary table -> actor-pool decode ->
    feature table. ``sf_dir`` is unused (payloads are synthesized; testdata has
    no binary column) but kept for the queries() signature."""
    ds = synth_binary_dataset()
    out = ds.map_batches(
        FeatureExtractor,
        batch_format="pyarrow",
        batch_size=64,  # wide rows -> small batches
        concurrency=2,
        num_cpus=1,
    )
    return pa.concat_tables(list(out.iter_batches(batch_format="pyarrow"))).sort_by("item_id")
