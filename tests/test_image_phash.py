"""Perceptual-hash image near-dup: resize/hash kernel units + end-to-end
recall on planted cross-format duplicates (image content dedup below the
byte level — exact hashing cannot see these)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from parquet_converter_ray.pipelines.multimodal import (
    area_mean_resize,
    dhash64,
    image_dedup_phash,
    synth_near_dup_images,
)


def test_area_mean_resize_matches_naive():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (23, 37), dtype=np.uint8)
    th, tw = 8, 9
    got = area_mean_resize(img, th, tw)
    ri = (np.arange(th) * 23) // th
    ci = (np.arange(tw) * 37) // tw
    re = np.append(ri, 23)
    ce = np.append(ci, 37)
    want = np.array(
        [
            [img[re[r]: re[r + 1], ce[c]: ce[c + 1]].mean() for c in range(tw)]
            for r in range(th)
        ]
    )
    assert np.allclose(got, want)


def test_area_mean_resize_upscale_is_finite():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = area_mean_resize(img, 8, 9)  # tw > w duplicates a column boundary
    assert np.isfinite(out).all()


def test_dhash_stable_under_small_noise_distinct_otherwise():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (40, 52), dtype=np.uint8)
    noisy = np.clip(img.astype(np.int16) + rng.integers(-1, 2, img.shape), 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, (40, 52), dtype=np.uint8)
    ham = lambda a, b: bin(int(a ^ b)).count("1")
    assert ham(dhash64(img), dhash64(noisy)) <= 6
    assert ham(dhash64(img), dhash64(other)) > 10


def test_image_dedup_finds_all_planted_cross_format_dups(ray_session):
    t = image_dedup_phash()
    _, truth = synth_near_dup_images()
    got = set(zip(t["id_a"].to_pylist(), t["id_b"].to_pylist()))
    assert got == set(truth)  # exact recall, zero false positives
    assert max(t["hamming"].to_pylist()) <= 6
    # determinism across runs (the queries() rows-only gate re-runs this)
    t2 = image_dedup_phash()
    assert t.equals(t2)


def test_image_phash_clusters_ground_truth(ray_session):
    from parquet_converter_ray.pipelines.multimodal import image_phash_clusters

    t = image_phash_clusters()
    _, truth = synth_near_dup_images()
    cl = dict(zip(t["item_id"].to_pylist(), t["cluster_id"].to_pylist()))
    for base, dup in truth:
        assert cl[dup] == cl[base] == base  # canonical = min id = the base
    # non-planted images stay singletons
    planted = {i for pair in truth for i in pair}
    for i, c in cl.items():
        if i not in planted:
            assert c == i


def test_popcount64_matches_python_bitcount():
    from parquet_converter_ray.pipelines._util import popcount64

    rng = np.random.default_rng(7)
    x = rng.integers(0, 2**63, size=(37, 5), dtype=np.int64).astype(np.uint64)
    x[0, 0] = 0
    x[0, 1] = np.uint64(0xFFFFFFFFFFFFFFFF)
    got = popcount64(x)
    want = np.vectorize(lambda v: bin(int(v)).count("1"))(x)
    assert got.shape == x.shape
    assert (got == want).all()


def test_image_dedup_phash_store_identical_to_raw(ray_session):
    """VERDICT r4 item 6: the container-store-backed variant (binary payload
    column, metadata never decoded) must be byte-identical to the raw-file
    pipeline on the same synth table."""
    import shutil

    from parquet_converter_ray.pipelines.multimodal import image_dedup_phash_store

    shutil.rmtree("/tmp/pcr_cache/encoded-media-synth", ignore_errors=True)
    raw = image_dedup_phash()
    store = image_dedup_phash_store()
    assert raw.equals(store)
    assert store.num_rows > 0
