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
