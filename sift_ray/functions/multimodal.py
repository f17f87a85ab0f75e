"""Multimodal column plumbing: opaque binary payloads + typed metadata.

General image/audio/video decode libraries are NOT present in this
container — and are no longer needed: ``DecodeStage(real=True)`` sniffs
each payload's magic bytes and routes to the repo's own from-scratch
decoders (BMP / PNG / GIF / baseline JPEG / PCM WAV), emitting unified
(width, height, n_frames, status) metadata; the default
deterministic fake derives metadata from the payload bytes. Two REAL
decoders ship alongside it — uncompressed 24/32-bit BMP
(``BmpDecodeStage``) and 8-bit PNG with full scanline unfiltering
(``PngDecodeStage``, stdlib zlib) — so the plumbing (schema, batch
sizing for large payloads, quarantine statuses, output layout) is
exercised end-to-end with spec-valid files, not only fakes.

At scale: binary payloads make row count a poor proxy for batch memory; run
this stage with small ``batch_size`` (or rely on block-byte-bounded default
batches) exactly like the HTML extract stage.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa


def _stage_map(ds, cls, kw: dict, concurrency, batch_size: int):
    """Run a decode stage as plain tasks with per-process cached state
    (``shuffle.TaskStage``) when no explicit pool size is requested —
    these stages' ``__init__`` costs microseconds, so a 2-actor pool's
    spawn (~4 s) dominated short queries. Pass ``concurrency=N`` for a
    real actor pool (a production decoder holding codec/model state)."""
    from .shuffle import TaskStage
    if concurrency is None:
        return ds.map_batches(TaskStage(cls, **kw),
                              batch_format="pyarrow",
                              batch_size=batch_size)
    return ds.map_batches(cls, fn_constructor_kwargs=kw,
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)


class DecodeStage:
    """Actor-pool 'decode' of a binary payload column.

    real=True routes each payload by magic bytes to the repo's OWN
    from-scratch decoders (BMP / PNG / GIF / baseline JPEG / PCM WAV —
    no image libraries exist in this container, and none are needed) and
    emits unified metadata: width/height for images (null for audio),
    n_frames (GIF frame count, WAV sample-frame count, 1 for stills),
    and a status column (unknown magic -> "unknown_format", decoder
    rejects -> that decoder's quarantine status; never a task failure).
    The deterministic fake (default) emits metadata derived only from
    the byte length — kept for plumbing tests that want no decode cost.
    """

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id",
                 real: bool = False):
        self.payload_col = payload_col
        self.id_col = id_col
        self.real = real

    @staticmethod
    def fake_decode(payload: bytes) -> dict:
        n = len(payload)
        return {
            "status": "ok",
            "n_bytes": n,
            "width": n % 640 + 1,
            "height": (n // 640) % 480 + 1,
            "n_frames": n % 7 + 1,
        }

    @staticmethod
    def real_decode(payload: bytes) -> dict:
        out = {"status": "unknown_format", "n_bytes": len(payload),
               "width": None, "height": None, "n_frames": None}
        if len(payload) < 8:
            return out
        if payload[:2] == b"BM":
            m = BmpDecodeStage.decode(payload)
            frames = 1
        elif payload[:8] == PngDecodeStage._SIG:
            m = PngDecodeStage.decode(payload)
            frames = 1
        elif payload[:6] in (b"GIF87a", b"GIF89a"):
            m = GifDecodeStage.decode(payload)
            frames = m.get("n_frames")
        elif payload[:2] == b"\xff\xd8":
            from .jpeg import decode_jpeg
            m = decode_jpeg(payload)
            frames = 1
        elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            m = WavDecodeStage.decode(payload)
            frames = m.get("n_frames")
        else:
            return out
        out["status"] = m.get("status", "error")
        if out["status"] == "ok":
            out["width"] = m.get("width")
            out["height"] = m.get("height")
            out["n_frames"] = frames if frames is not None else 1
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        fn = self.real_decode if self.real else self.fake_decode
        metas = []
        for p in payloads:
            try:
                metas.append(fn(p or b""))
            except Exception:
                metas.append({"status": "error", "n_bytes": len(p or b""),
                              "width": None, "height": None,
                              "n_frames": None})
        return pa.table({
            "doc_id": batch.column(self.id_col),
            "n_bytes": pa.array([m["n_bytes"] for m in metas], pa.int64()),
            "width": pa.array([m.get("width") for m in metas], pa.int64()),
            "height": pa.array([m.get("height") for m in metas],
                               pa.int64()),
            "n_frames": pa.array([m.get("n_frames") for m in metas],
                                 pa.int64()),
            "status": pa.array([m["status"] for m in metas], pa.string()),
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
    def decode(payload: bytes, with_pixels: bool = False) -> dict:
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
        out = {"status": "ok", "width": w, "height": h_abs,
               "bit_depth": depth, "mean_b": float(means[0]),
               "mean_g": float(means[1]), "mean_r": float(means[2])}
        if with_pixels:
            out["px"] = px[:, :, :3][:, :, ::-1]  # -> RGB
        return out

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


class PngDecodeStage:
    """REAL image decode for PNG payloads — stdlib zlib + struct + numpy,
    no image libraries (RFC 2083 / PNG spec). Supports 8-bit depth,
    color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
    6 (RGBA), non-interlaced; everything else (16-bit, Adam7) is
    quarantined with a status row, never a task failure. All five
    scanline filters (None/Sub/Up/Average/Paeth) are unfiltered — Sub as
    a vectorized per-lane cumulative sum, Up vectorized, Average/Paeth
    as the spec's sequential recurrences.

    Emits the same (id, width, height, bit_depth, mean_r/g/b, status)
    layout as BmpDecodeStage; bit_depth reports bits per PIXEL."""

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id"):
        self.payload_col = payload_col
        self.id_col = id_col

    _SIG = b"\x89PNG\r\n\x1a\n"
    _CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

    @classmethod
    def _unfilter(cls, raw, h: int, stride: int, bpp: int):
        import numpy as np
        lines = raw.reshape(h, stride + 1)
        filters = lines[:, 0]
        data = lines[:, 1:].astype(np.int64)
        recon = np.zeros((h, stride), dtype=np.int64)
        prev = np.zeros(stride, dtype=np.int64)
        for y in range(h):
            f = filters[y]
            row = data[y]
            if f == 0:
                r = row
            elif f == 1:  # Sub: per-lane cumulative sum mod 256
                r = row.copy()
                for lane in range(bpp):
                    r[lane::bpp] = np.cumsum(row[lane::bpp]) % 256
            elif f == 2:  # Up
                r = (row + prev) % 256
            elif f == 3:  # Average: sequential in x by spec
                r = np.zeros(stride, dtype=np.int64)
                for x in range(stride):
                    a = r[x - bpp] if x >= bpp else 0
                    r[x] = (row[x] + (a + prev[x]) // 2) % 256
            elif f == 4:  # Paeth: sequential in x by spec
                r = np.zeros(stride, dtype=np.int64)
                for x in range(stride):
                    a = r[x - bpp] if x >= bpp else 0
                    b = prev[x]
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc_) else (
                        b if pb <= pc_ else c)
                    r[x] = (row[x] + pred) % 256
            else:
                return None
            recon[y] = r
            prev = r
        return recon.astype(np.uint8)

    @classmethod
    def decode(cls, payload: bytes, with_pixels: bool = False) -> dict:
        import struct
        import zlib

        import numpy as np
        if len(payload) < 8 or payload[:8] != cls._SIG:
            return {"status": "not_png"}
        pos = 8
        ihdr = None
        plte = b""
        idat = []
        while pos + 8 <= len(payload):
            length, = struct.unpack_from(">I", payload, pos)
            ctype = payload[pos + 4:pos + 8]
            body = payload[pos + 8:pos + 8 + length]
            if len(body) < length:
                return {"status": "truncated"}
            if ctype == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", body)
            elif ctype == b"PLTE":
                plte = body
            elif ctype == b"IDAT":
                idat.append(body)
            elif ctype == b"IEND":
                break
            pos += 12 + length  # length + type + data + crc
        if ihdr is None or not idat:
            return {"status": "truncated"}
        w, h, depth, color_type, comp, filt, interlace = ihdr
        if (depth != 8 or color_type not in cls._CHANNELS
                or comp != 0 or filt != 0 or interlace != 0
                or w <= 0 or h <= 0):
            return {"status": "unsupported"}
        try:
            raw = np.frombuffer(zlib.decompress(b"".join(idat)),
                                dtype=np.uint8)
        except zlib.error:
            return {"status": "corrupt"}
        ch = cls._CHANNELS[color_type]
        stride = w * ch
        if len(raw) != h * (stride + 1):
            return {"status": "truncated"}
        recon = cls._unfilter(raw, h, stride, ch)
        if recon is None:
            return {"status": "corrupt"}
        px = recon.reshape(h, w, ch)
        if color_type == 3:
            if len(plte) < 3:
                return {"status": "corrupt"}
            pal = np.frombuffer(plte, dtype=np.uint8)
            pal = pal[:len(pal) - len(pal) % 3].reshape(-1, 3)
            idx = px[:, :, 0]
            if idx.max(initial=0) >= len(pal):
                return {"status": "corrupt"}
            rgb = pal[idx]
        elif color_type in (0, 4):
            rgb = np.repeat(px[:, :, :1], 3, axis=2)
        else:
            rgb = px[:, :, :3]
        means = rgb.reshape(-1, 3).mean(axis=0)
        out = {"status": "ok", "width": int(w), "height": int(h),
               "bit_depth": depth * ch,
               "mean_r": float(means[0]), "mean_g": float(means[1]),
               "mean_b": float(means[2])}
        if with_pixels:
            out["px"] = rgb
        return out

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


def make_png(pixels, color_type: int = 2, filter_type: int = 0,
             palette=None) -> bytes:
    """Write a spec-valid PNG from an (h, w, ch) uint8 array (for
    tests/corpora): 8-bit, non-interlaced, one filter type for all rows
    (the encoder computes the matching residuals, so every decoder filter
    path is exercisable)."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = px.shape
    flat = px.reshape(h, w * ch).astype(np.int64)
    stride = w * ch
    lines = []
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            res = cur
        elif filter_type == 1:
            a = np.zeros(stride, dtype=np.int64)
            a[ch:] = cur[:-ch]
            res = (cur - a) % 256
        elif filter_type == 2:
            res = (cur - prev) % 256
        elif filter_type == 3:
            a = np.zeros(stride, dtype=np.int64)
            a[ch:] = cur[:-ch]
            res = (cur - (a + prev) // 2) % 256
        elif filter_type == 4:
            res = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (
                    b if pb <= pc_ else c)
                res[x] = (cur[x] - pred) % 256
        else:
            raise ValueError(f"bad filter {filter_type}")
        lines.append(bytes([filter_type]) + bytes(res.astype(np.uint8)))
        prev = cur
    raw = b"".join(lines)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    parts = [PngDecodeStage._SIG, chunk(b"IHDR", ihdr)]
    if color_type == 3:
        parts.append(chunk(b"PLTE", bytes(palette or b"")))
    parts.append(chunk(b"IDAT", zlib.compress(raw)))
    parts.append(chunk(b"IEND", b""))
    return b"".join(parts)


def decode_pngs(ds, payload_col: str = "payload", id_col: str = "doc_id",
                concurrency=None, batch_size: int = 64):
    """Dataset with a PNG binary column -> decoded metadata + channel means."""
    return _stage_map(ds, PngDecodeStage,
                      {"payload_col": payload_col, "id_col": id_col},
                      concurrency, batch_size)


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
                concurrency=None, batch_size: int = 64):
    """Dataset with a BMP binary column -> decoded metadata + channel means."""
    return _stage_map(ds, BmpDecodeStage,
                      {"payload_col": payload_col, "id_col": id_col},
                      concurrency, batch_size)


def text_as_payload(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized: materialize a binary payload column from text (stand-in
    for stored image/audio bytes in the synthetic tables)."""
    import pyarrow.compute as pc
    payload = pc.cast(batch.column(text_col), pa.binary())
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "payload": payload,
    })


def multimodal_features(ds, concurrency=None, batch_size: int = 64):
    """documents -> fake-decoded metadata (small batches: binary payloads)."""
    payloads = ds.map_batches(text_as_payload, batch_format="pyarrow")
    return _stage_map(payloads, DecodeStage, {}, concurrency, batch_size)


class WavDecodeStage:
    """REAL audio decode for PCM WAV payloads (RIFF chunk walk, 8/16-bit,
    any channel count) — stdlib struct + numpy only. Emits (id,
    sample_rate, channels, bit_depth, n_frames, duration_s, mean_abs,
    peak, status); non-WAV, compressed, or cut-short payloads are
    quarantined with status rows, never task failures. Completes the
    multimodal family alongside BMP/PNG (image) and PDF (document)."""

    def __init__(self, payload_col: str = "payload",
                 id_col: str = "doc_id"):
        self.payload_col = payload_col
        self.id_col = id_col

    @staticmethod
    def decode(payload: bytes) -> dict:
        import struct

        import numpy as np
        if (len(payload) < 12 or payload[:4] != b"RIFF"
                or payload[8:12] != b"WAVE"):
            return {"status": "not_wav"}
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos:pos + 4]
            size, = struct.unpack_from("<I", payload, pos + 4)
            if pos + 8 + size > len(payload):
                return {"status": "truncated"}
            if cid == b"fmt ":
                fmt = payload[pos + 8:pos + 8 + size]
            elif cid == b"data":
                data = payload[pos + 8:pos + 8 + size]
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt is None or len(fmt) < 16 or data is None:
            return {"status": "unsupported"}
        audio_fmt, ch, sr, _br, _ba, bits = struct.unpack_from(
            "<HHIIHH", fmt, 0)
        if audio_fmt != 1 or bits not in (8, 16) or ch < 1 or sr == 0:
            return {"status": "unsupported"}  # PCM only, no ADPCM/float
        if bits == 16:
            n = len(data) // 2 * 2
            x = (np.frombuffer(data, dtype="<i2", count=n // 2)
                 .astype(np.float64) / 32768.0)
        else:
            x = ((np.frombuffer(data, dtype=np.uint8)
                  .astype(np.float64) - 128.0) / 128.0)
        frames = len(x) // ch
        return {"status": "ok", "sample_rate": int(sr),
                "channels": int(ch), "bit_depth": int(bits),
                "n_frames": int(frames),
                "duration_s": frames / sr,
                "mean_abs": float(np.abs(x).mean()) if len(x) else 0.0,
                "peak": float(np.abs(x).max()) if len(x) else 0.0}

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        metas = [self.decode(p or b"") for p in payloads]

        def col(name, default, typ):
            return pa.array([m.get(name, default) for m in metas], typ)

        return pa.table({
            "doc_id": batch.column(self.id_col),
            "status": col("status", "error", pa.string()),
            "sample_rate": col("sample_rate", 0, pa.int64()),
            "channels": col("channels", 0, pa.int64()),
            "bit_depth": col("bit_depth", 0, pa.int64()),
            "n_frames": col("n_frames", 0, pa.int64()),
            "duration_s": col("duration_s", 0.0, pa.float64()),
            "mean_abs": col("mean_abs", 0.0, pa.float64()),
            "peak": col("peak", 0.0, pa.float64()),
        })


def make_wav(freq_hz: float = 440.0, duration_s: float = 0.05,
             sample_rate: int = 8000, channels: int = 1,
             bits: int = 16, amplitude: float = 0.5) -> bytes:
    """Write a minimal valid PCM WAV (sine tone) for tests/corpora."""
    import struct

    import numpy as np
    n = int(duration_s * sample_rate)
    t = np.arange(n, dtype=np.float64) / sample_rate
    x = amplitude * np.sin(2 * np.pi * freq_hz * t)
    frames = np.repeat(x[:, None], channels, axis=1).ravel()
    if bits == 16:
        data = (frames * 32767.0).astype("<i2").tobytes()
    else:
        data = ((frames * 127.0) + 128.0).astype(np.uint8).tobytes()
    ba = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * ba, ba, bits)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def decode_wavs(ds, payload_col: str = "payload", id_col: str = "doc_id",
                concurrency=None, batch_size: int = 64):
    """Dataset with a WAV binary column -> decoded audio metadata."""
    return _stage_map(ds, WavDecodeStage,
                      {"payload_col": payload_col, "id_col": id_col},
                      concurrency, batch_size)


def _lzw_decode(min_size: int, data: bytes, expected: int):
    """GIF-variant LZW (LSB-first bit packing, growing code width,
    clear/EOI codes). Returns a list of palette indices or None on a
    corrupt stream. Inherently sequential — fine for frame-sample
    decode; a production video path would batch frames per actor."""
    clear = 1 << min_size
    eoi = clear + 1
    size = min_size + 1
    table = {i: (i,) for i in range(clear)}
    next_code = eoi + 1
    out: list = []
    prev = None
    bitpos, nbits = 0, len(data) * 8
    while bitpos + size <= nbits and len(out) < expected:
        byte = bitpos >> 3
        chunk = int.from_bytes(data[byte:byte + 4], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << size) - 1)
        bitpos += size
        if code == clear:
            size = min_size + 1
            table = {i: (i,) for i in range(clear)}
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                return None
        elif code in table:
            entry = table[code]
            table[next_code] = prev + (entry[0],)
            next_code += 1
        elif code == next_code:
            entry = prev + (prev[0],)
            table[next_code] = entry
            next_code += 1
        else:
            return None
        if next_code == (1 << size) and size < 12:
            size += 1
        out.extend(entry)
        prev = entry
    return out[:expected]


class GifDecodeStage:
    """REAL GIF decode (87a/89a): frame COUNT across the whole file (the
    frame-sample path for animated payloads) plus a full LZW decode of
    the FIRST frame with palette-resolved channel means. Interlaced or
    corrupt payloads are quarantined with status rows."""

    def __init__(self, payload_col: str = "payload",
                 id_col: str = "doc_id"):
        self.payload_col = payload_col
        self.id_col = id_col

    @staticmethod
    def decode(payload: bytes) -> dict:
        import struct

        import numpy as np
        if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
            return {"status": "not_gif"}
        w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
        pos = 13
        gct = None
        if flags & 0x80:
            n = 3 * (2 << (flags & 7))
            gct = payload[pos:pos + n]
            pos += n
        n_frames = 0
        first = None  # (indices, palette, fw, fh)
        try:
            while pos < len(payload):
                b0 = payload[pos]
                if b0 == 0x3B:  # trailer
                    break
                if b0 == 0x21:  # extension: skip sub-blocks
                    pos += 2
                    while payload[pos] != 0:
                        pos += 1 + payload[pos]
                    pos += 1
                elif b0 == 0x2C:  # image descriptor
                    _l, _t, fw, fh, lflags = struct.unpack_from(
                        "<HHHHB", payload, pos + 1)
                    pos += 10
                    pal = gct
                    if lflags & 0x80:
                        n = 3 * (2 << (lflags & 7))
                        pal = payload[pos:pos + n]
                        pos += n
                    if lflags & 0x40:
                        return {"status": "unsupported"}  # interlaced
                    min_size = payload[pos]
                    pos += 1
                    chunks = []
                    while payload[pos] != 0:
                        ln = payload[pos]
                        chunks.append(payload[pos + 1:pos + 1 + ln])
                        pos += 1 + ln
                    pos += 1
                    n_frames += 1
                    if first is None:
                        idx = _lzw_decode(min_size, b"".join(chunks),
                                          fw * fh)
                        if idx is None or len(idx) < fw * fh or pal is None:
                            return {"status": "corrupt"}
                        first = (idx, pal, fw, fh)
                else:
                    return {"status": "corrupt"}
        except (IndexError, struct.error):
            return {"status": "truncated"}
        if first is None:
            return {"status": "corrupt"}
        idx, pal, fw, fh = first
        p = np.frombuffer(pal, dtype=np.uint8)
        rgb = p[:len(p) // 3 * 3].reshape(-1, 3)
        px = rgb[np.minimum(np.asarray(idx), len(rgb) - 1)]
        means = px.mean(axis=0)
        return {"status": "ok", "width": int(w), "height": int(h),
                "n_frames": int(n_frames),
                "palette_size": int(len(rgb)),
                "mean_r": float(means[0]), "mean_g": float(means[1]),
                "mean_b": float(means[2])}

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        metas = [self.decode(p or b"") for p in payloads]

        def col(name, default, typ):
            return pa.array([m.get(name, default) for m in metas], typ)

        return pa.table({
            "doc_id": batch.column(self.id_col),
            "status": col("status", "error", pa.string()),
            "width": col("width", 0, pa.int64()),
            "height": col("height", 0, pa.int64()),
            "n_frames": col("n_frames", 0, pa.int64()),
            "palette_size": col("palette_size", 0, pa.int64()),
            "mean_r": col("mean_r", 0.0, pa.float64()),
            "mean_g": col("mean_g", 0.0, pa.float64()),
            "mean_b": col("mean_b", 0.0, pa.float64()),
        })


def make_gif(frames, palette) -> bytes:
    """Write a minimal valid (multi-frame) GIF89a for tests/corpora:
    ``frames`` = list of 2-D lists/arrays of palette indices, ``palette``
    = list of (r, g, b). The LZW stream emits a clear code before every
    pixel so the code table never grows — spec-valid and trivially
    correct, if bulky (fine for fixtures)."""
    import struct

    import numpy as np
    np_frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = np_frames[0].shape
    ncol = max(2, 1 << int(np.ceil(np.log2(max(len(palette), 2)))))
    gct_bits = int(np.log2(ncol))
    pal = bytearray()
    for i in range(ncol):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        pal += bytes((r, g, b))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (gct_bits - 1), 0, 0)
    out += pal
    min_size = max(2, gct_bits)
    clear, eoi = 1 << min_size, (1 << min_size) + 1
    width = min_size + 1
    for f in np_frames:
        fh, fw = f.shape
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, fw, fh, 0)
        out += bytes((min_size,))
        codes = [clear]
        for v in f.ravel():
            codes.extend((int(v), clear))
        codes[-1] = eoi  # replace the trailing clear
        acc = bitlen = 0
        data = bytearray()
        for c in codes:
            acc |= c << bitlen
            bitlen += width
            while bitlen >= 8:
                data.append(acc & 0xFF)
                acc >>= 8
                bitlen -= 8
        if bitlen:
            data.append(acc & 0xFF)
        for i in range(0, len(data), 255):
            block = data[i:i + 255]
            out += bytes((len(block),)) + block
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


def decode_gifs(ds, payload_col: str = "payload", id_col: str = "doc_id",
                concurrency=None, batch_size: int = 64):
    """Dataset with a GIF binary column -> frame count + first-frame
    palette-resolved channel means."""
    return _stage_map(ds, GifDecodeStage,
                      {"payload_col": payload_col, "id_col": id_col},
                      concurrency, batch_size)


def encode_bmp(rgb) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit BMP (BI_RGB,
    bottom-up, rows padded to 4 bytes) — round-trips exactly through
    ``BmpDecodeStage.decode``."""
    import struct

    import numpy as np
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    bgr = rgb[:, :, ::-1]
    zeros = b"\x00" * pad
    for y in range(h - 1, -1, -1):
        body += bgr[y].tobytes() + zeros
    size = 14 + 40 + len(body)
    return (b"BM" + struct.pack("<IHHI", size, 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                          2835, 2835, 0, 0)
            + bytes(body))


class ResizeStage:
    """REAL image resize as an actor-pool batch stage: magic-sniffed
    decode (repo BMP/PNG decoders), exact area-average (antialiased)
    resample to (out_w, out_h) via the phash row-stochastic overlap
    matrices, re-encode as BMP. Undecodable payloads become quarantine
    status rows, never task failures. Weight matrices are cached per
    (src, dst) pair per actor."""

    def __init__(self, out_w: int = 32, out_h: int = 32,
                 payload_col: str = "payload", id_col: str = "doc_id"):
        self.out_w = out_w
        self.out_h = out_h
        self.payload_col = payload_col
        self.id_col = id_col
        self._wcache: dict = {}

    def _weights(self, src: int, dst: int):
        key = (src, dst)
        if key not in self._wcache:
            from .phash import _area_weights
            self._wcache[key] = _area_weights(src, dst)
        return self._wcache[key]

    def resize(self, rgb):
        import numpy as np
        h, w, _ = rgb.shape
        wy = self._weights(h, self.out_h)
        wx = self._weights(w, self.out_w)
        out = np.einsum("oh,hwc,pw->opc", wy, rgb.astype(np.float64), wx,
                        optimize=True)
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .phash import decode_image_pixels
        ids = batch.column(self.id_col)
        out_status, out_iw, out_ih, out_payload = [], [], [], []
        for p in batch.column(self.payload_col).to_pylist():
            px, err = decode_image_pixels(p)
            if px is None:
                out_status.append(err)
                out_iw.append(0)
                out_ih.append(0)
                out_payload.append(b"")
                continue
            small = self.resize(px)
            out_status.append("ok")
            out_ih.append(px.shape[0])
            out_iw.append(px.shape[1])
            out_payload.append(encode_bmp(small))
        n = batch.num_rows
        return pa.table({
            "doc_id": ids,
            "status": pa.array(out_status, pa.string()),
            "in_w": pa.array(out_iw, pa.int64()),
            "in_h": pa.array(out_ih, pa.int64()),
            "out_w": pa.array([self.out_w] * n, pa.int64()),
            "out_h": pa.array([self.out_h] * n, pa.int64()),
            "payload": pa.array(out_payload, pa.binary()),
        })


def resize_images(ds, out_w: int = 32, out_h: int = 32,
                  payload_col: str = "payload", id_col: str = "doc_id",
                  concurrency=None, batch_size: int = 64):
    """Dataset with an image binary column -> area-resampled BMP thumbnails
    (doc_id, status, in_w, in_h, out_w, out_h, payload). Small batches
    bound heap for large payloads (the multimodal rule)."""
    return _stage_map(ds, ResizeStage,
                      {"out_w": out_w, "out_h": out_h,
                       "payload_col": payload_col, "id_col": id_col},
                      concurrency, batch_size)


def decode_gif_frames(payload: bytes, every_n: int = 1,
                      max_frames: int = 64):
    """Full multi-frame GIF decode: list of (frame_idx, (h, w, 3) uint8
    RGB) for every ``every_n``-th frame (up to ``max_frames`` sampled),
    or (None, status). Palette-composited per frame; frames keep their
    own local palette when present. No disposal compositing (each frame
    rendered standalone) — documented divergence, fine for sampling."""
    import struct

    import numpy as np
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None, "not_gif"
    _w, _h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 3 * (2 << (flags & 7))
        gct = payload[pos:pos + n]
        pos += n
    frames = []
    idx_no = 0
    try:
        while pos < len(payload):
            b0 = payload[pos]
            if b0 == 0x3B:
                break
            if b0 == 0x21:
                pos += 2
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
            elif b0 == 0x2C:
                _l, _t, fw, fh, lflags = struct.unpack_from(
                    "<HHHHB", payload, pos + 1)
                pos += 10
                pal = gct
                if lflags & 0x80:
                    n = 3 * (2 << (lflags & 7))
                    pal = payload[pos:pos + n]
                    pos += n
                if lflags & 0x40:
                    return None, "unsupported"
                min_size = payload[pos]
                pos += 1
                chunks = []
                while payload[pos] != 0:
                    ln = payload[pos]
                    chunks.append(payload[pos + 1:pos + 1 + ln])
                    pos += 1 + ln
                pos += 1
                take = (idx_no % every_n == 0
                        and len(frames) < max_frames)
                if take:
                    idx = _lzw_decode(min_size, b"".join(chunks), fw * fh)
                    if idx is None or len(idx) < fw * fh or pal is None:
                        return None, "corrupt"
                    p = np.frombuffer(pal, dtype=np.uint8)
                    rgb = p[:len(p) // 3 * 3].reshape(-1, 3)
                    px = rgb[np.minimum(np.asarray(idx[:fw * fh]),
                                        len(rgb) - 1)]
                    frames.append((idx_no, px.reshape(fh, fw, 3)))
                idx_no += 1
            else:
                return None, "corrupt"
    except (IndexError, struct.error):
        return None, "truncated"
    if not frames:
        return None, "corrupt"
    return frames, ""


class FrameSampleStage:
    """Video-style frame sampling over animated GIF payloads: decode,
    keep every ``every_n``-th frame, emit ONE ROW PER SAMPLED FRAME with
    per-frame channel means and the frame re-encoded as BMP — the
    flat_map-shaped stage a video pipeline plugs a real codec into.
    Undecodable payloads emit one quarantine row."""

    def __init__(self, every_n: int = 2, max_frames: int = 16,
                 payload_col: str = "payload", id_col: str = "doc_id"):
        self.every_n = max(1, every_n)
        self.max_frames = max_frames
        self.payload_col = payload_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        ids = batch.column(self.id_col).to_pylist()
        cols = {"doc_id": [], "frame_idx": [], "status": [],
                "w": [], "h": [], "mean_r": [], "mean_g": [],
                "mean_b": [], "payload": []}
        for doc_id, p in zip(ids, batch.column(self.payload_col)
                             .to_pylist()):
            frames, err = decode_gif_frames(p or b"", self.every_n,
                                            self.max_frames)
            if frames is None:
                cols["doc_id"].append(doc_id)
                cols["frame_idx"].append(-1)
                cols["status"].append(err)
                cols["w"].append(0)
                cols["h"].append(0)
                cols["mean_r"].append(0.0)
                cols["mean_g"].append(0.0)
                cols["mean_b"].append(0.0)
                cols["payload"].append(b"")
                continue
            for fi, rgb in frames:
                m = rgb.reshape(-1, 3).mean(axis=0)
                cols["doc_id"].append(doc_id)
                cols["frame_idx"].append(fi)
                cols["status"].append("ok")
                cols["h"].append(rgb.shape[0])
                cols["w"].append(rgb.shape[1])
                cols["mean_r"].append(float(m[0]))
                cols["mean_g"].append(float(m[1]))
                cols["mean_b"].append(float(m[2]))
                cols["payload"].append(encode_bmp(rgb))
        return pa.table({
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "frame_idx": pa.array(cols["frame_idx"], pa.int64()),
            "status": pa.array(cols["status"], pa.string()),
            "w": pa.array(cols["w"], pa.int64()),
            "h": pa.array(cols["h"], pa.int64()),
            "mean_r": pa.array(cols["mean_r"], pa.float64()),
            "mean_g": pa.array(cols["mean_g"], pa.float64()),
            "mean_b": pa.array(cols["mean_b"], pa.float64()),
            "payload": pa.array(cols["payload"], pa.binary()),
        })


def sample_frames(ds, every_n: int = 2, max_frames: int = 16,
                  payload_col: str = "payload", id_col: str = "doc_id",
                  concurrency=None, batch_size: int = 32):
    """Dataset with an animated-GIF binary column -> one row per sampled
    frame (every_n-th, capped). The video frame-sample plumbing with a
    real in-repo decoder standing in for the codec."""
    return _stage_map(ds, FrameSampleStage,
                      {"every_n": every_n, "max_frames": max_frames,
                       "payload_col": payload_col, "id_col": id_col},
                      concurrency, batch_size)


def _wav_mono_samples(payload: bytes):
    """(mono float64 samples in [-1, 1], sample_rate) or (None, status) —
    same RIFF walk as ``WavDecodeStage.decode`` but returning the channel-
    averaged sample stream for feature extraction."""
    import struct

    import numpy as np
    if (len(payload) < 12 or payload[:4] != b"RIFF"
            or payload[8:12] != b"WAVE"):
        return None, "not_wav"
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size, = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + size > len(payload):
            return None, "truncated"
        if cid == b"fmt ":
            fmt = payload[pos + 8:pos + 8 + size]
        elif cid == b"data":
            data = payload[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    if fmt is None or len(fmt) < 16 or data is None:
        return None, "unsupported"
    audio_fmt, ch, sr, _br, _ba, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_fmt != 1 or bits not in (8, 16) or ch < 1 or sr == 0:
        return None, "unsupported"
    if bits == 16:
        n = len(data) // 2 * 2
        x = (np.frombuffer(data, dtype="<i2", count=n // 2)
             .astype(np.float64) / 32768.0)
    else:
        x = ((np.frombuffer(data, dtype=np.uint8).astype(np.float64)
              - 128.0) / 128.0)
    frames = len(x) // ch
    if frames == 0:
        return None, "empty"
    mono = x[:frames * ch].reshape(frames, ch).mean(axis=1)
    return (mono, int(sr))


class AudioFeatureStage:
    """REAL audio feature extraction (numpy-only DSP) as an actor-pool
    batch stage: windowed RMS energy, zero-crossing rate, and spectral
    centroid (vectorized rfft over all windows at once) per document.
    On a pure sine tone the centroid recovers the tone frequency and
    ZCR ~ 2f/sr — pinned by tests. Undecodable payloads quarantine."""

    def __init__(self, frame_len: int = 256,
                 payload_col: str = "payload", id_col: str = "doc_id"):
        self.frame_len = frame_len
        self.payload_col = payload_col
        self.id_col = id_col

    def features(self, payload: bytes) -> dict:
        import numpy as np
        res = _wav_mono_samples(payload)
        if res[0] is None:
            return {"status": res[1]}
        mono, sr = res
        L = self.frame_len
        nwin = len(mono) // L
        if nwin == 0:
            return {"status": "too_short"}
        w = mono[:nwin * L].reshape(nwin, L)
        rms = np.sqrt((w * w).mean(axis=1))
        zcr = (np.signbit(w[:, 1:]) != np.signbit(w[:, :-1])) \
            .mean(axis=1) * sr
        # Hann window + power-spectrum weighting: a rectangular window's
        # sidelobe leakage drags a pure tone's centroid far upward
        hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(L) / L)
        spec = np.abs(np.fft.rfft(w * hann, axis=1)) ** 2
        freqs = np.fft.rfftfreq(L, d=1.0 / sr)
        power = spec.sum(axis=1)
        centroid = (spec @ freqs) / np.where(power > 0, power, 1.0)
        return {"status": "ok", "sample_rate": sr, "n_windows": int(nwin),
                "rms_mean": float(rms.mean()),
                "rms_max": float(rms.max()),
                "zcr_hz_mean": float(zcr.mean()),
                "centroid_hz_mean": float(centroid.mean())}

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = [self.features(p or b"")
                 for p in batch.column(self.payload_col).to_pylist()]

        def col(name, default, typ):
            return pa.array([m.get(name, default) for m in metas], typ)

        return pa.table({
            "doc_id": batch.column(self.id_col),
            "status": col("status", "error", pa.string()),
            "sample_rate": col("sample_rate", 0, pa.int64()),
            "n_windows": col("n_windows", 0, pa.int64()),
            "rms_mean": col("rms_mean", 0.0, pa.float64()),
            "rms_max": col("rms_max", 0.0, pa.float64()),
            "zcr_hz_mean": col("zcr_hz_mean", 0.0, pa.float64()),
            "centroid_hz_mean": col("centroid_hz_mean", 0.0, pa.float64()),
        })


def audio_features(ds, frame_len: int = 256,
                   payload_col: str = "payload", id_col: str = "doc_id",
                   concurrency=None, batch_size: int = 64):
    """Dataset with a PCM-WAV binary column -> windowed RMS / zero-crossing
    / spectral-centroid features per document (numpy rfft, vectorized
    across windows)."""
    return _stage_map(ds, AudioFeatureStage,
                      {"frame_len": frame_len,
                       "payload_col": payload_col, "id_col": id_col},
                      concurrency, batch_size)
