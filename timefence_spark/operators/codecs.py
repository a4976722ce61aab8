"""Dependency-free media codecs for the multimodal operators: Netpbm PPM
(P6), PNG (8-bit RGB, stdlib zlib), and PCM WAV.

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


# ---------------------------------------------------------------------------
# PNG (8-bit RGB, non-interlaced) — the COMPRESSED image format: pure
# stdlib zlib for inflate/deflate + numpy for per-scanline (un)filtering,
# so a real production container (not just headers-plus-raster Netpbm)
# runs through decode/resize/channel-stats with real pixels. Scope is
# deliberately bit-depth 8 / color type 2 (truecolor RGB) / no
# interlace — the shape synthetic training-data imagery is written in;
# palette/alpha/16-bit stay on the PIL injection point.
#
# Scale notes: these run inside mapInPandas Python workers. Filters
# 0 (None), 1 (Sub) and 2 (Up) encode AND decode fully vectorized
# (Sub's inverse is a per-stride cumulative sum mod 256); filters
# 3 (Average) and 4 (Paeth) decode with a per-pixel loop (vectorized
# across the pixel's 3 bytes) because each pixel's reconstruction feeds
# the next — prefer filter 0/1/2 when *encoding* at volume.
# ---------------------------------------------------------------------------

import zlib as _zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/px


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        _struct.pack(">I", len(payload))
        + ctype
        + payload
        + _struct.pack(">I", _zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor over int arrays (left, up, up-left)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _png_filter_line(ft: int, cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Filter one reconstructed scanline (uint8, length w*bpp) for
    encoding. Fully vectorized: filtering reads RECONSTRUCTED (original)
    bytes, so there is no sequential dependency on the encode side."""
    if ft == 0:
        return cur
    left = np.zeros_like(cur)
    left[bpp:] = cur[:-bpp]
    if ft == 1:
        return cur - left  # uint8 arithmetic wraps mod 256 by design
    if ft == 2:
        return cur - prev
    if ft == 3:
        return cur - ((left.astype(np.int16) + prev.astype(np.int16)) // 2).astype(np.uint8)
    if ft == 4:
        upleft = np.zeros_like(prev)
        upleft[bpp:] = prev[:-bpp]
        pred = _paeth(
            left.astype(np.int16), prev.astype(np.int16), upleft.astype(np.int16)
        )
        return cur - pred.astype(np.uint8)
    raise ValueError(f"unknown PNG filter type {ft}")


def _png_unfilter_line(ft: int, cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Reconstruct one filtered scanline. Filters 0/1/2 are vectorized
    (Sub = cumulative sum mod 256 per byte-position stride); 3/4 loop
    per pixel because reconstruction is sequentially dependent."""
    if ft == 0:
        return cur
    if ft == 2:
        return cur + prev  # wraps mod 256
    w = cur.size // bpp
    if ft == 1:
        return (
            np.cumsum(cur.reshape(w, bpp).astype(np.int64), axis=0) % 256
        ).astype(np.uint8).reshape(-1)
    cur2 = cur.reshape(w, bpp).astype(np.int64)
    prev2 = prev.reshape(w, bpp).astype(np.int64)
    out = np.zeros((w, bpp), np.int64)
    left = np.zeros(bpp, np.int64)
    if ft == 3:
        for x in range(w):
            left = (cur2[x] + (left + prev2[x]) // 2) % 256
            out[x] = left
        return out.astype(np.uint8).reshape(-1)
    if ft == 4:
        upleft = np.zeros(bpp, np.int64)
        for x in range(w):
            left = (cur2[x] + _paeth(left, prev2[x], upleft)) % 256
            out[x] = left
            upleft = prev2[x]
        return out.astype(np.uint8).reshape(-1)
    raise ValueError(f"unknown PNG filter type {ft}")


def png_encode(arr: np.ndarray, *, filter_type: int = 0, level: int = 6) -> bytes:
    """Encode an (H, W, 3) uint8 array as an 8-bit RGB PNG, every
    scanline filtered with ``filter_type`` (0=None 1=Sub 2=Up 3=Average
    4=Paeth) then deflated with stdlib zlib."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) array, got shape {a.shape}")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"unknown PNG filter type {filter_type}")
    h, w = a.shape[:2]
    bpp, stride = 3, w * 3
    raw = bytearray()
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        line = a[y].reshape(-1)
        raw.append(filter_type)
        raw += _png_filter_line(filter_type, line, prev, bpp).tobytes()
        prev = line
    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _zlib.compress(bytes(raw), level))
        + _png_chunk(b"IEND", b"")
    )


def _png_chunks(data: bytes):
    """Yield (type, payload) for every chunk, CRC-verified."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    while pos + 12 <= len(data):
        (length,) = _struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = _struct.unpack_from(">I", data, pos + 8 + length)
        if _zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} failed CRC")
        yield ctype, payload
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("truncated PNG (no IEND)")


def _png_ihdr(data: bytes) -> tuple[int, int, int, int, int]:
    """(width, height, bit_depth, color_type, interlace) from IHDR."""
    for ctype, payload in _png_chunks(data):
        if ctype == b"IHDR":
            w, h, depth, color, _, _, interlace = _struct.unpack(">IIBBBBB", payload)
            return w, h, depth, color, interlace
        break  # IHDR must be first
    raise ValueError("PNG missing IHDR")


def png_decode(data: bytes) -> np.ndarray:
    """Decode 8-bit RGB non-interlaced PNG bytes to (H, W, 3) uint8:
    chunk walk (CRC-checked) -> zlib inflate of the concatenated IDAT
    stream -> per-scanline unfiltering."""
    ihdr = None
    idat = bytearray()
    for ctype, payload in _png_chunks(data):
        if ctype == b"IHDR":
            ihdr = _struct.unpack(">IIBBBBB", payload)
        elif ctype == b"IDAT":
            idat += payload
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _, _, interlace = ihdr
    if depth != 8 or color != 2 or interlace != 0:
        raise ValueError(
            "only 8-bit truecolor (RGB) non-interlaced PNG supported, got "
            f"depth={depth} color_type={color} interlace={interlace}"
        )
    bpp, stride = 3, w * 3
    raw = _zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG raster size mismatch: {len(raw)} != {h * (stride + 1)}"
        )
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        line = np.frombuffer(raw, np.uint8, stride, off + 1).copy()
        prev = _png_unfilter_line(raw[off], line, prev, bpp)
        out[y] = prev
    return out.reshape(h, w, 3)


def png_decode_info(data: bytes) -> dict:
    """``decode_fn`` for :func:`multimodal.decode_images`: IHDR parse
    only — no inflate, no raster copy."""
    if not data:
        return {"width": 0, "height": 0, "channels": 0, "format": "empty"}
    w, h, _, color, _ = _png_ihdr(data)
    return {
        "width": w,
        "height": h,
        "channels": _PNG_CHANNELS.get(color, 0),
        "format": "png",
    }


def png_resize(data: bytes, width: int, height: int) -> bytes:
    """``resize_fn`` for :func:`multimodal.resize_images`:
    nearest-neighbor via numpy index slicing, PNG in → PNG out."""
    img = png_decode(data)
    h, w = img.shape[:2]
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return png_encode(img[rows][:, cols])


def png_channel_stats(data: bytes) -> dict:
    """Per-channel mean + global std with REAL decompressed pixels —
    proves the inflate+unfilter path ran, not just the header parse."""
    img = png_decode(data).astype(np.float64)
    return {
        "mean_r": float(img[:, :, 0].mean()),
        "mean_g": float(img[:, :, 1].mean()),
        "mean_b": float(img[:, :, 2].mean()),
        "std": float(img.std()),
    }
