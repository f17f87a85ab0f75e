"""Perceptual image hashing (pHash) and image near-duplicate pairs.

Web-corpus image dedup: the classic DCT perceptual hash (average-pool
the luma plane to 32x32, 2D DCT-II, threshold the 8x8 low-frequency
block at its median -> 64 bits) is robust to re-encoding, resizing and
mild noise, so hamming-close hashes flag near-duplicate images across
formats. Built entirely on the repo's own decoders (BMP/PNG from
multimodal.py — no image libraries) and the existing SimHash banding
exchange: a pair within hamming distance 3 must collide on one of four
16-bit bands (pigeonhole), so candidates come from band buckets, pairs
verify per partition, and cross-band duplicates dedupe distributively.
No reference analog (SURVEY.md §2.8) — this closes the multimodal loop:
decode -> fingerprint -> dedup, same shape as the text side.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II matrix (the JPEG/pHash transform)."""
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n, dtype=np.float64)
        m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
        m[0] *= np.sqrt(1.0 / n)
        m[1:] *= np.sqrt(2.0 / n)
        _DCT32 = m
    return _DCT32


def _area_weights(src: int, dst: int = 32) -> np.ndarray:
    """(dst, src) row-stochastic matrix of fractional cell overlaps — a
    true area (antialiased) resize along one axis. Phase-exact: a target
    cell averages exactly the source span it covers, so downscaled or
    re-gridded versions of the same image pool to near-identical planes
    (integer binning is phase-sensitive and flips ~10 hash bits on a
    clean 2x downscale)."""
    w = np.zeros((dst, src), dtype=np.float64)
    scale = src / dst
    for i in range(dst):
        lo, hi = i * scale, (i + 1) * scale
        j0, j1 = int(np.floor(lo)), int(np.ceil(hi))
        for j in range(j0, min(j1, src)):
            w[i, j] = min(hi, j + 1) - max(lo, j)
    return w / w.sum(axis=1, keepdims=True)


def _pool32(gray: np.ndarray) -> np.ndarray:
    """Area-resize an (h, w) float array to 32x32: Wy @ gray @ Wx.T."""
    h, w = gray.shape
    return _area_weights(h) @ gray @ _area_weights(w).T


def phash64(rgb: np.ndarray) -> int:
    """64-bit DCT perceptual hash of an (h, w, 3) uint8 RGB image."""
    px = rgb.astype(np.float64)
    # BT.601 luma (same weights as the repo's JPEG codec)
    gray = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    small = _pool32(gray)
    t = _dct_matrix(32)
    freq = t @ small @ t.T
    block = freq[:8, :8]
    med = np.median(block)
    bits = (block > med).astype(np.uint8).ravel()
    return int.from_bytes(np.packbits(bits).tobytes(), "big")


def decode_image_pixels(payload: bytes):
    """(rgb uint8 (h,w,3), "") or (None, quarantine status) — magic-sniffed
    dispatch over the repo's own BMP/PNG decoders."""
    from .multimodal import BmpDecodeStage, PngDecodeStage

    if payload is None or len(payload) < 8:
        return None, "empty"
    if payload[:2] == b"BM":
        m = BmpDecodeStage.decode(payload, with_pixels=True)
    elif payload[:8] == b"\x89PNG\r\n\x1a\n":
        m = PngDecodeStage.decode(payload, with_pixels=True)
    else:
        return None, "unknown_format"
    if m.get("status") != "ok":
        return None, m.get("status", "error")
    return m["px"], ""


class PhashBandStage:
    """Per-image pHash, exploded to (band_id, band_val, doc_id, simhash)
    rows — the exact input shape of the SimHash banding exchange, so the
    pair machinery is shared. Undecodable payloads emit nothing (they
    cannot be near-duplicates of anything)."""

    def __init__(self, payload_col: str = "payload",
                 id_col: str = "doc_id"):
        self.payload_col = payload_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        payloads = batch.column(self.payload_col).to_pylist()
        out_doc, out_band, out_val, out_hash = [], [], [], []
        for doc_id, payload in zip(ids, payloads):
            try:
                rgb, err = decode_image_pixels(payload)
            except Exception:   # defensive: no row kills the task
                continue
            if rgb is None:
                continue
            h = phash64(rgb)
            h64 = h - (1 << 64) if h >= (1 << 63) else h
            for b in range(4):
                out_doc.append(doc_id)
                out_band.append(b)
                out_val.append((h >> (16 * b)) & 0xFFFF)
                out_hash.append(h64)
        return pa.table({
            "band_id": pa.array(out_band, pa.int64()),
            "band_val": pa.array(out_val, pa.int64()),
            "doc_id": pa.array(out_doc, pa.int64()),
            "simhash": pa.array(out_hash, pa.int64()),
        })


class PhashStage:
    """Per-image (doc_id, phash, status) — the fingerprint table."""

    def __init__(self, payload_col: str = "payload",
                 id_col: str = "doc_id"):
        self.payload_col = payload_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        payloads = batch.column(self.payload_col).to_pylist()
        hashes, statuses = [], []
        for payload in payloads:
            try:
                rgb, err = decode_image_pixels(payload)
            except Exception as exc:
                rgb, err = None, f"error: {type(exc).__name__}"
            if rgb is None:
                hashes.append(0)
                statuses.append(err)
                continue
            h = phash64(rgb)
            hashes.append(h - (1 << 64) if h >= (1 << 63) else h)
            statuses.append("ok")
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "phash": pa.array(hashes, pa.int64()),
            "status": pa.array(statuses, pa.string()),
        })


def image_phashes(ds, payload_col: str = "payload", id_col: str = "doc_id"):
    """Fingerprint table (doc_id, phash, status); zero shuffle."""
    from .shuffle import TaskStage

    return ds.map_batches(
        TaskStage(PhashStage, payload_col=payload_col, id_col=id_col),
        batch_format="pyarrow")


def phash_pairs(ds, max_hamming: int = 3,
                payload_col: str = "payload", id_col: str = "doc_id",
                num_parts: Optional[int] = None, max_bucket: int = 200):
    """Near-duplicate IMAGE pairs with pHash hamming <= max_hamming:
    decode + hash map-side (only ints leave the stage), then the shared
    SimHash banding exchange / partition-verify / distributed pair
    dedupe. Returns a Dataset (doc_a, doc_b, hamming)."""
    from .dedup import _distinct_pairs, _simhash_partition_pairs
    from .shuffle import TaskStage, add_hash_partition, default_num_parts

    P = num_parts or default_num_parts()
    bands = ds.map_batches(
        TaskStage(PhashBandStage, payload_col=payload_col, id_col=id_col),
        batch_format="pyarrow")
    partials = (add_hash_partition(bands, ["band_id", "band_val"], P)
                .groupby("part")
                .map_groups(_simhash_partition_pairs(max_hamming,
                                                     max_bucket),
                            batch_format="pandas"))
    return _distinct_pairs(partials,
                           extra_agg=("hamming", "min", "hamming"))
