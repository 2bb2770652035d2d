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


class Resizer:
    """Actor-pool resize stage — REAL kernel (nearest-neighbour on the raw
    raster; numpy index arithmetic), not a stub: the fake payload format IS a
    raster. Swapping in JPEG/PNG sources only changes the decode call."""

    def __init__(self, target: int = 16):
        self.target = target
        self.decoder = _StubDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.target
        out_payloads = []
        for payload in batch["payload"]:
            b = payload.as_py()
            w = int.from_bytes(b[4:6], "little")
            h = int.from_bytes(b[6:8], "little")
            img = np.frombuffer(b[8:], dtype=np.uint8).reshape(h, w)
            yi = (np.arange(t) * h) // t
            xi = (np.arange(t) * w) // t
            small = img[yi][:, xi]
            out_payloads.append(
                b"FAKE" + t.to_bytes(2, "little") + t.to_bytes(2, "little") + small.tobytes()
            )
        return pa.table(
            {
                "item_id": batch["item_id"],
                "media_type": batch["media_type"],
                "payload": pa.array(out_payloads, type=pa.binary()),
                "width": pa.array([t] * batch.num_rows, type=pa.int32()),
                "height": pa.array([t] * batch.num_rows, type=pa.int32()),
            }
        )


def multimodal_resize(sf_dir: str | None = None, target: int = 16) -> pa.Table:
    """Resize pipeline: binary rasters -> actor-pool nearest-neighbour resize
    -> fixed-size rasters (the thumbnail/embedding-prep stage)."""
    ds = synth_binary_dataset()
    out = ds.map_batches(
        Resizer, fn_constructor_kwargs={"target": target},
        batch_format="pyarrow", batch_size=64, concurrency=2, num_cpus=1,
    )
    tbl = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow"))).sort_by("item_id")
    return tbl.combine_chunks()


def synth_video_dataset(n: int = 64, seed: int = 21) -> "ray.data.Dataset":
    """Deterministic fake video table: payload = frame-count header + K
    concatenated fixed-size (8x8) frames."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        k = int(rng.integers(4, 33))
        frames = rng.integers(0, 256, k * 64, dtype=np.uint8).tobytes()
        rows.append(
            {
                "item_id": i,
                "payload": b"FVID" + int(k).to_bytes(2, "little") + frames,
                "media_type": "video/fake",
            }
        )
    return ray.data.from_items(rows)


class FrameSampler:
    """Actor-pool frame-sampling stage: keep every ``stride``-th frame (the
    video preprocessing shape — real slicing over the concatenated frame
    buffer; a real container format only changes the demux call)."""

    def __init__(self, stride: int = 4):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, counts, kept, payloads = [], [], [], []
        for item_id, payload in zip(batch["item_id"], batch["payload"]):
            b = payload.as_py()
            if b[:4] != b"FVID":
                raise NotImplementedError("real video demux requires ffmpeg/pyav")
            k = int.from_bytes(b[4:6], "little")
            frames = np.frombuffer(b[6:], dtype=np.uint8).reshape(k, 64)
            sub = frames[:: self.stride]
            ids.append(item_id.as_py())
            counts.append(k)
            kept.append(len(sub))
            payloads.append(b"FVID" + len(sub).to_bytes(2, "little") + sub.tobytes())
        return pa.table(
            {
                "item_id": pa.array(ids, type=pa.int64()),
                "n_frames": pa.array(counts, type=pa.int32()),
                "n_sampled": pa.array(kept, type=pa.int32()),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )


def video_frame_sample(sf_dir: str | None = None, stride: int = 4) -> pa.Table:
    """Frame-sampling pipeline over fake videos (every ``stride``-th frame)."""
    ds = synth_video_dataset()
    out = ds.map_batches(
        FrameSampler, fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow", batch_size=32, concurrency=2, num_cpus=1,
    )
    tbl = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow"))).sort_by("item_id")
    return tbl.combine_chunks()


def synth_pcm_dataset(n: int = 256, seed: int = 17, sr: int = 16_000) -> "ray.data.Dataset":
    """Deterministic raw-PCM audio table: (item_id, payload: binary of
    little-endian int16 mono samples, sample_rate). Raw PCM is a REAL format
    (the data segment of a WAV file) that needs no codec library, so unlike
    the image/video stubs this path exercises genuine signal DSP end to end:
    each clip is a frequency sweep + noise burst with per-item parameters."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        dur = float(rng.uniform(0.25, 1.5))
        t = np.arange(int(sr * dur)) / sr
        f0 = float(rng.uniform(80, 2000))
        sig = 0.6 * np.sin(2 * np.pi * f0 * t * (1 + 0.3 * t))
        sig += 0.1 * rng.standard_normal(len(t))
        # amplitude envelope so windowed RMS actually varies within a clip
        sig *= np.interp(t, [0, dur * 0.3, dur], [0.2, 1.0, 0.4])
        pcm = np.clip(sig * 32767, -32768, 32767).astype("<i2")
        rows.append({"item_id": i, "payload": pcm.tobytes(), "sample_rate": sr})
    return ray.data.from_items(rows)


def pcm_rms_reference(payload: bytes, sr: int, window_ms: int) -> tuple[int, float, float, int]:
    """Per-clip reference kernel (shared by the batch stage and the test
    oracle): windowed RMS over non-overlapping ``window_ms`` frames of
    normalized float samples; trailing partial window dropped."""
    x = np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0
    win = max(1, sr * window_ms // 1000)
    nwin = len(x) // win
    peak = int(np.abs(np.frombuffer(payload, dtype="<i2")).max()) if len(x) else 0
    if nwin == 0:
        return 0, 0.0, 0.0, peak
    r = np.sqrt(np.mean(x[: nwin * win].reshape(nwin, win) ** 2, axis=1))
    return nwin, float(r.mean()), float(r.max()), peak


def audio_rms_windows(sf_dir: str | None = None, window_ms: int = 50) -> pa.Table:
    """Windowed loudness profile per audio clip: non-overlapping RMS frames
    plus the sample peak — the feature-extraction shape of an audio curation
    stage (silence trimming, clipping detection, loudness bucketing), with
    REAL math on a real wire format. Batch stage over Arrow binary; the
    per-payload loop is inherent for ragged blobs, the per-clip kernel is
    one vectorized reshape+reduction."""

    def stage(batch: pa.Table) -> pa.Table:
        ids, nws, means, maxes, peaks = [], [], [], [], []
        for item_id, payload, sr in zip(batch["item_id"], batch["payload"], batch["sample_rate"]):
            nw, m, mx, pk = pcm_rms_reference(payload.as_py(), sr.as_py(), window_ms)
            ids.append(item_id.as_py())
            nws.append(nw)
            means.append(round(m, 6))
            maxes.append(round(mx, 6))
            peaks.append(pk)
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "n_windows": pa.array(nws, pa.int32()),
                "rms_mean": pa.array(means, pa.float64()),
                "rms_max": pa.array(maxes, pa.float64()),
                "peak": pa.array(peaks, pa.int32()),
            }
        )

    out = synth_pcm_dataset().map_batches(
        stage, batch_format="pyarrow", batch_size=64
    )
    tbl = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow"))).sort_by("item_id")
    return tbl.combine_chunks()
