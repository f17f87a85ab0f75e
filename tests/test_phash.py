"""Perceptual image hash + image near-dup pair tests (decoders are the
repo's own BMP/PNG implementations; no image libraries)."""

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sift_ray.functions.multimodal import make_bmp, make_png
from sift_ray.functions.phash import (decode_image_pixels, image_phashes,
                                      phash64, phash_pairs)


def _photo(seed: int, h: int = 40, w: int = 56) -> np.ndarray:
    """Smooth pseudo-photo (low-frequency random field)."""
    rng = np.random.RandomState(seed)
    coarse = rng.randint(0, 256, (5, 7, 3)).astype(np.float64)
    img = np.zeros((h, w, 3))
    for c in range(3):
        rows = np.interp(np.linspace(0, 4, h), np.arange(5),
                         np.arange(5))  # identity helper
        # bilinear upsample via two 1-D interps
        tmp = np.array([np.interp(np.linspace(0, 6, w), np.arange(7),
                                  coarse[i, :, c]) for i in range(5)])
        img[:, :, c] = np.array(
            [np.interp(np.linspace(0, 4, h), np.arange(5), tmp[:, j])
             for j in range(w)]).T
    return np.clip(img, 0, 255).astype(np.uint8)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_invariance_properties():
    img = _photo(3)
    h0 = phash64(img)
    # identical content, different container -> identical hash
    assert phash64(decode_image_pixels(make_png(img))[0]) == h0
    # light noise -> hamming-close
    noisy = np.clip(img.astype(np.int16) + np.random.RandomState(0)
                    .randint(-3, 4, img.shape), 0, 255).astype(np.uint8)
    assert _ham(h0, phash64(noisy)) <= 3
    # box-downscale to half size (same content) -> hamming-close
    h, w = img.shape[:2]
    half = img[:h - h % 2, :w - w % 2].reshape(
        h // 2, 2, w // 2, 2, 3).mean(axis=(1, 3)).astype(np.uint8)
    assert _ham(h0, phash64(half)) <= 8
    # different content -> far
    assert _ham(h0, phash64(_photo(99))) > 12


def test_decode_dispatch_and_quarantine():
    assert decode_image_pixels(b"")[0] is None
    assert decode_image_pixels(b"GIF89a notsupported")[1] == \
        "unknown_format"
    rgb, err = decode_image_pixels(make_bmp(6, 4, (9, 8, 7)))
    assert err == "" and rgb.shape == (4, 6, 3)
    assert (rgb[0, 0] == np.array([9, 8, 7])).all()


def test_image_phashes_and_pairs(ray_session):
    import ray.data as rd
    rows = []
    img_a = _photo(1)
    img_b = _photo(2)
    noisy_a = np.clip(img_a.astype(np.int16) + np.random.RandomState(5)
                      .randint(-2, 3, img_a.shape), 0, 255).astype(np.uint8)
    rows.append({"doc_id": 0, "payload": make_png(img_a)})
    rows.append({"doc_id": 1, "payload": make_png(noisy_a)})   # near-dup of 0
    rows.append({"doc_id": 2, "payload": make_png(img_a)})     # exact dup of 0
    rows.append({"doc_id": 3, "payload": make_png(img_b)})     # distinct
    rows.append({"doc_id": 4, "payload": b"corrupt bytes"})    # quarantine
    t = pa.table({"doc_id": pa.array([r["doc_id"] for r in rows],
                                     pa.int64()),
                  "payload": pa.array([r["payload"] for r in rows],
                                      pa.binary())})
    ds = rd.from_arrow(t).repartition(3)

    hashes = image_phashes(ds).to_pandas().sort_values("doc_id")
    assert list(hashes["status"]) == ["ok", "ok", "ok", "ok",
                                      "unknown_format"]
    assert hashes["phash"].iloc[0] == hashes["phash"].iloc[2]

    pairs = phash_pairs(ds, max_hamming=3).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["doc_a"],
                                            pairs["doc_b"])}
    assert (0, 2) in got                    # exact duplicate found
    assert (0, 1) in got or (1, 2) in got   # noisy near-dup found
    for a, b in got:
        assert 3 not in (a, b) and 4 not in (a, b)
    # partition invariance
    pairs2 = phash_pairs(rd.from_arrow(t).repartition(5), max_hamming=3,
                         num_parts=7).to_pandas()
    got2 = {(int(a), int(b)) for a, b in zip(pairs2["doc_a"],
                                             pairs2["doc_b"])}
    assert got == got2
