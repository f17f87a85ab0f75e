"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are NOT present in this container, so the
decode kernel is a clearly-marked stub: ``DecodeStage(real=True)`` raises
NotImplementedError; the default deterministic fake derives metadata from the
payload bytes. Everything Ray-side — schema (binary column + struct-ish
metadata), actor-pool signature, batch sizing for large payloads, output
layout — is real and tested.

At scale: binary payloads make row count a poor proxy for batch memory; run
this stage with small ``batch_size`` (or rely on block-byte-bounded default
batches) exactly like the HTML extract stage.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa


class DecodeStage:
    """Actor-pool 'decode' of a binary payload column.

    real=True is the integration point for an actual decoder (PIL/ffmpeg):
    it raises NotImplementedError in this environment. The deterministic
    fake emits plausible typed metadata derived only from the bytes.
    """

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id",
                 real: bool = False):
        if real:
            raise NotImplementedError(
                "real image/audio decode requires PIL/ffmpeg, absent in this "
                "container — wire the decoder here; the Ray plumbing is ready")
        self.payload_col = payload_col
        self.id_col = id_col

    @staticmethod
    def fake_decode(payload: bytes) -> dict:
        n = len(payload)
        return {
            "n_bytes": n,
            "width": n % 640 + 1,
            "height": (n // 640) % 480 + 1,
            "n_frames": n % 7 + 1,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        metas = [self.fake_decode(p or b"") for p in payloads]
        return pa.table({
            "doc_id": batch.column(self.id_col),
            "n_bytes": pa.array([m["n_bytes"] for m in metas], pa.int64()),
            "width": pa.array([m["width"] for m in metas], pa.int64()),
            "height": pa.array([m["height"] for m in metas], pa.int64()),
            "n_frames": pa.array([m["n_frames"] for m in metas], pa.int64()),
        })


class BmpDecodeStage:
    """REAL image decode for uncompressed 24/32-bit BMP payloads — stdlib
    struct + numpy only, no image libraries. Emits (id, width, height,
    bit_depth, mean_r, mean_g, mean_b, status); non-BMP or compressed
    payloads are quarantined with status rows, never task failures.

    This is the working end of the multimodal plumbing: the same actor-pool
    shape as DecodeStage, exercised with self-generated BMPs in tests
    (make_bmp below writes spec-valid BITMAPINFOHEADER files).
    """

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id"):
        self.payload_col = payload_col
        self.id_col = id_col

    @staticmethod
    def decode(payload: bytes) -> dict:
        import struct

        import numpy as np
        if len(payload) < 54 or payload[:2] != b"BM":
            return {"status": "not_bmp"}
        off, = struct.unpack_from("<I", payload, 10)
        hdr_size, = struct.unpack_from("<I", payload, 14)
        if hdr_size < 40:
            return {"status": "unsupported"}
        w, h = struct.unpack_from("<ii", payload, 18)
        planes, depth = struct.unpack_from("<HH", payload, 26)
        compression, = struct.unpack_from("<I", payload, 30)
        if compression != 0 or depth not in (24, 32) or w <= 0 or h == 0:
            return {"status": "unsupported"}
        flip = h > 0
        h_abs = abs(h)
        bpp = depth // 8
        stride = (w * bpp + 3) & ~3
        need = off + stride * h_abs
        if len(payload) < need:
            return {"status": "truncated"}
        rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h_abs,
                             offset=off).reshape(h_abs, stride)
        px = rows[:, :w * bpp].reshape(h_abs, w, bpp)
        if flip:
            px = px[::-1]
        # BMP stores BGR(A)
        means = px[:, :, :3].reshape(-1, 3).mean(axis=0)
        return {"status": "ok", "width": w, "height": h_abs,
                "bit_depth": depth, "mean_b": float(means[0]),
                "mean_g": float(means[1]), "mean_r": float(means[2])}

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        out = {"width": [], "height": [], "bit_depth": [],
               "mean_r": [], "mean_g": [], "mean_b": [], "status": []}
        for p in payloads:
            try:
                m = self.decode(p or b"")
            except Exception as exc:  # defensive: no row kills the task
                m = {"status": f"error: {type(exc).__name__}"}
            out["status"].append(m.get("status", "error"))
            out["width"].append(m.get("width", 0))
            out["height"].append(m.get("height", 0))
            out["bit_depth"].append(m.get("bit_depth", 0))
            out["mean_r"].append(m.get("mean_r", 0.0))
            out["mean_g"].append(m.get("mean_g", 0.0))
            out["mean_b"].append(m.get("mean_b", 0.0))
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "width": pa.array(out["width"], pa.int64()),
            "height": pa.array(out["height"], pa.int64()),
            "bit_depth": pa.array(out["bit_depth"], pa.int64()),
            "mean_r": pa.array(out["mean_r"], pa.float64()),
            "mean_g": pa.array(out["mean_g"], pa.float64()),
            "mean_b": pa.array(out["mean_b"], pa.float64()),
            "status": pa.array(out["status"], pa.string()),
        })


def make_bmp(width: int, height: int, rgb=(255, 0, 0)) -> bytes:
    """Write a minimal valid 24-bit uncompressed BMP (for tests/corpora)."""
    import struct
    stride = (width * 3 + 3) & ~3
    img_size = stride * height
    off = 54
    header = (b"BM" + struct.pack("<IHHI", off + img_size, 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                            img_size, 2835, 2835, 0, 0))
    row = (bytes((rgb[2], rgb[1], rgb[0])) * width
           + b"\x00" * (stride - width * 3))
    return header + row * height


def decode_bmps(ds, payload_col: str = "payload", id_col: str = "doc_id",
                concurrency: int = 2, batch_size: int = 64):
    """Dataset with a BMP binary column -> decoded metadata + channel means."""
    return ds.map_batches(
        BmpDecodeStage,
        fn_constructor_kwargs={"payload_col": payload_col, "id_col": id_col},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


def text_as_payload(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized: materialize a binary payload column from text (stand-in
    for stored image/audio bytes in the synthetic tables)."""
    import pyarrow.compute as pc
    payload = pc.cast(batch.column(text_col), pa.binary())
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "payload": payload,
    })


def multimodal_features(ds, concurrency: int = 2, batch_size: int = 64):
    """documents -> fake-decoded metadata (small batches: binary payloads)."""
    payloads = ds.map_batches(text_as_payload, batch_format="pyarrow")
    return payloads.map_batches(DecodeStage, batch_format="pyarrow",
                                batch_size=batch_size, concurrency=concurrency)
