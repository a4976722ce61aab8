"""Pure-numpy image codec for the multimodal operators: Netpbm PPM (P6).

The container has no PIL/ffmpeg, so the heavyweight codecs stay injection
points (multimodal.decode_images / resize_images take ``decode_fn`` /
``resize_fn``). PPM, however, is a trivial public format — an ASCII
header (``P6``, width, height, maxval, ``#`` comments allowed) followed
by raw interleaved RGB bytes — decodable with numpy alone. This module
provides real encode/decode/resize functions in exactly the injectable
signatures, so the Arrow-batched media pipeline is exercised end-to-end
with REAL pixel data for at least one codec instead of only the
deterministic fake.

At scale these functions run inside mapInPandas Python workers: numpy
slicing for nearest-neighbor resize is vectorized per image, and nothing
here touches the driver.
"""

from __future__ import annotations

import numpy as np

_MAXVAL = 255


def ppm_encode(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 array as binary PPM (P6)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) array, got shape {a.shape}")
    h, w = a.shape[:2]
    return f"P6\n{w} {h}\n{_MAXVAL}\n".encode("ascii") + a.tobytes()


def _parse_header(data: bytes) -> tuple[int, int, int, int]:
    """(width, height, maxval, data_offset). Tolerates arbitrary
    whitespace and '#' comments between header tokens, per the spec."""
    if data[:2] != b"P6":
        raise ValueError("not a binary PPM (missing P6 magic)")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and comments
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(data[start:pos]))
    pos += 1  # exactly one whitespace byte separates maxval from raster
    w, h, maxval = fields
    return w, h, maxval, pos


def ppm_decode(data: bytes) -> np.ndarray:
    """Decode binary PPM bytes to an (H, W, 3) uint8 array."""
    w, h, maxval, off = _parse_header(data)
    if maxval != _MAXVAL:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    raster = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=off)
    return raster.reshape(h, w, 3)


def ppm_decode_info(data: bytes) -> dict:
    """``decode_fn`` for :func:`multimodal.decode_images`: real header
    parse, no raster copy."""
    if not data:
        return {"width": 0, "height": 0, "channels": 0, "format": "empty"}
    w, h, _, _ = _parse_header(data)
    return {"width": w, "height": h, "channels": 3, "format": "ppm"}


def ppm_resize(data: bytes, width: int, height: int) -> bytes:
    """``resize_fn`` for :func:`multimodal.resize_images`:
    nearest-neighbor via numpy index slicing, PPM in → PPM out."""
    img = ppm_decode(data)
    h, w = img.shape[:2]
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return ppm_encode(img[rows][:, cols])


def ppm_channel_stats(data: bytes) -> dict:
    """Per-channel mean/std — the feature-extraction stage with real
    pixels (shape: one dict per image, Arrow-batched by the caller)."""
    img = ppm_decode(data).astype(np.float64)
    return {
        "mean_r": float(img[:, :, 0].mean()),
        "mean_g": float(img[:, :, 1].mean()),
        "mean_b": float(img[:, :, 2].mean()),
        "std": float(img.std()),
    }


# ---------------------------------------------------------------------------
# WAV (RIFF PCM) — the audio counterpart to the PPM image codec: a fully
# public container with an ASCII/LE-integer header, decodable with numpy
# alone, so the audio pipeline stages run with REAL samples too.
# ---------------------------------------------------------------------------

import struct as _struct


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 PCM samples ((n,) mono or (n, channels)) as WAV."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.tobytes()
    byte_rate = sample_rate * ch * 2
    hdr = b"RIFF" + _struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + _struct.pack(
        "<IHHIIHH", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16
    )
    hdr += b"data" + _struct.pack("<I", len(data))
    return hdr + data


def _wav_chunks(data: bytes):
    """Yield (chunk_id, payload_offset, payload_size) for every RIFF
    chunk; tolerates the odd-size padding byte the spec requires."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = _struct.unpack_from("<I", data, pos + 4)[0]
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM16 WAV bytes to ((n, channels) int16 array, rate)."""
    fmt = raw = None
    for cid, off, size in _wav_chunks(data):
        if cid == b"fmt ":
            fmt = _struct.unpack_from("<HHIIHH", data, off)
        elif cid == b"data":
            raw = data[off : off + size]
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (format={audio_format}, bits={bits})")
    samples = np.frombuffer(raw, dtype=np.int16)
    return samples.reshape(-1, ch), rate


def wav_decode_info(data: bytes) -> dict:
    """``decode_fn`` for :func:`multimodal.decode_audio`: real header
    parse, no sample copy."""
    if not data:
        return {"sample_rate": 0, "n_samples": 0, "channels": 0, "format": "empty"}
    fmt = data_size = None
    for cid, off, size in _wav_chunks(data):
        if cid == b"fmt ":
            fmt = _struct.unpack_from("<HHIIHH", data, off)
        elif cid == b"data":
            data_size = size
    if fmt is None or data_size is None:
        raise ValueError("WAV missing fmt/data chunk")
    _, ch, rate, _, block_align, _ = fmt
    return {
        "sample_rate": rate,
        "n_samples": data_size // block_align if block_align else 0,
        "channels": ch,
        "format": "wav",
    }


def wav_rms(data: bytes) -> float:
    """Root-mean-square amplitude over all channels — the
    feature-extraction stage with real samples."""
    samples, _ = wav_decode(data)
    return float(np.sqrt((samples.astype(np.float64) ** 2).mean()))
