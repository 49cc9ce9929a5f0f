"""Multimodal binary-payload kernels — REAL decode for codec-free
formats, explicit NotImplementedError for formats that need external
codec libraries (none are installed in this container).

The media pipeline treats image/audio as opaque ``binary`` columns with
typed metadata (the 100-TB layout), and decodes inside an actor-pool
``map_batches`` stage. Binary PGM (P5) is an uncompressed raster format
parseable with pure numpy, so the decode path here is genuinely real:
header parse → raster view → vectorized features. JPEG/PNG/WEBP raise —
swap in pillow/libvips on a cluster that has them.
"""

from __future__ import annotations

import numpy as np

_MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PN": "png",
    b"RIF": "webp/riff",
}


def encode_pgm(raster: np.ndarray) -> bytes:
    """uint8 (h, w) raster → binary PGM (P5) payload."""
    h, w = raster.shape
    return b"P5\n%d %d\n255\n" % (w, h) + raster.astype(np.uint8).tobytes()


def synth_pgm_from_bytes(data: bytes, width: int = 64) -> bytes:
    """Deterministic grayscale 'image' from arbitrary bytes: rows of
    ``width`` pixels, zero-padded to a full rectangle. Stands in for real
    image payloads in the testdata (which has no media column) while
    keeping every byte of the decode path real."""
    n = max(1, len(data))
    h = max(1, -(-n // width))
    raster = np.zeros(h * width, dtype=np.uint8)
    raster[: len(data)] = np.frombuffer(data, dtype=np.uint8)
    return encode_pgm(raster.reshape(h, width))


def decode_image(payload: bytes) -> tuple[int, int, np.ndarray]:
    """payload → (width, height, uint8 raster). Real parse for binary
    PGM; NotImplementedError (with the codec name) otherwise."""
    if payload[:2] == b"P5":
        # header: "P5\n<w> <h>\n<maxval>\n" then raw bytes
        parts = payload.split(b"\n", 3)
        if len(parts) < 4:
            raise ValueError("truncated PGM header")
        w, h = (int(x) for x in parts[1].split())
        maxval = int(parts[2])
        if maxval > 255:
            raise NotImplementedError("16-bit PGM not supported")
        raster = np.frombuffer(parts[3], dtype=np.uint8, count=w * h).reshape(h, w)
        return w, h, raster
    for magic, codec in _MAGIC.items():
        if payload.startswith(magic):
            raise NotImplementedError(
                f"{codec} decode requires an image codec library "
                "(pillow/libvips) — not available in this container"
            )
    raise ValueError("unrecognized image payload")


def synth_video_from_bytes(
    data: bytes, n_frames: int = 12, width: int = 32, height: int = 32
) -> bytes:
    """Deterministic multi-frame payload ("video"): ``n_frames``
    concatenated binary-PGM frames derived from the byte stream, frame i
    phase-shifted by i bytes — stands in for real video containers while
    keeping the frame-parse path real."""
    n = width * height
    src = np.frombuffer(data, dtype=np.uint8) if data else np.zeros(1, np.uint8)
    reps = -(-(n + n_frames) // max(1, len(src)))
    tiled = np.tile(src, reps)
    return b"".join(
        encode_pgm(tiled[i : i + n].reshape(height, width))
        for i in range(n_frames)
    )


def iter_video_frames(payload: bytes):
    """Parse a concatenated-PGM payload frame by frame (streaming — no
    whole-video raster materialization)."""
    off = 0
    while off < len(payload):
        if payload[off : off + 2] != b"P5":
            raise ValueError(f"bad frame magic at offset {off}")
        parts = payload[off:].split(b"\n", 3)
        w, h = (int(x) for x in parts[1].split())
        header_len = len(parts[0]) + len(parts[1]) + len(parts[2]) + 3
        frame_end = off + header_len + w * h
        yield decode_image(payload[off:frame_end])
        off = frame_end


def raster_features(raster: np.ndarray) -> dict:
    """Vectorized per-image features (ints only → robust comparison):
    mean/std gray (1e4-scaled), nonzero-pixel count, horizontal edge
    energy (mean |∂x| · 1e4)."""
    r = raster.astype(np.float64)
    edge = np.abs(np.diff(r, axis=1)).mean() if raster.shape[1] > 1 else 0.0
    return {
        "mean_gray_1e4": int(np.floor(r.mean() * 1e4)),
        "std_gray_1e4": int(np.floor(r.std() * 1e4)),
        "nonzero_px": int((raster != 0).sum()),
        "edge_energy_1e4": int(np.floor(edge * 1e4)),
    }
