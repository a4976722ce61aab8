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


# ---------------------------------------------------------------------------
# JPEG (baseline DCT, grayscale) — ITU-T T.81 is public; tables from Annex K.
# The most common real image format moves from injection point to proven
# path for the 1-component case: FDCT/quantize/zigzag/Huffman on encode,
# generic DHT/DQT parsing + Huffman decode + dequant + IDCT on decode.
# Color (chroma subsampling), progressive (SOF2) and restart intervals
# stay out of scope and raise cleanly — inject a full decoder for those.
# ---------------------------------------------------------------------------

# Annex K.1 luminance quantization table (quality ~50), row-major.
JPEG_LUMA_QUANT = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# Zigzag scan: _ZIGZAG[k] = row-major index of the k-th scanned coefficient.
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.3.1/K.3.2 luminance Huffman specs: (BITS[1..16], HUFFVAL).
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _huff_canonical(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for a canonical (BITS, HUFFVAL) spec."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _huff_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the inverse map for bit-serial decoding."""
    return {
        (length, code): sym
        for sym, (code, length) in _huff_canonical(bits, vals).items()
    }


# Orthonormal 8x8 DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16);
# FDCT of a block f is A @ f @ A.T, IDCT is A.T @ F @ A.
_DCT_A = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ],
    dtype=np.float64,
)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per T.81
        return bytes(self.out)


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """(category, amplitude-bits) for a coefficient: negatives use the
    ones'-complement convention of T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _jpeg_check_quant(quant: np.ndarray | None) -> np.ndarray:
    q = JPEG_LUMA_QUANT if quant is None else np.asarray(quant, dtype=np.int32)
    if q.shape != (8, 8) or (q < 1).any() or (q > 255).any():
        raise ValueError("quant must be 8x8 with entries in [1, 255]")
    return q


def _jpeg_encode_block(
    bw: _BitWriter,
    f: np.ndarray,
    q: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    prev_dc: int,
) -> int:
    """FDCT + quantize + Huffman-emit one CENTERED 8x8 block; returns the
    new DC predictor."""
    coeffs = _DCT_A @ f @ _DCT_A.T
    qc = np.round(coeffs / q).astype(np.int64).reshape(64)[_ZIGZAG]
    diff = int(qc[0]) - prev_dc
    prev_dc = int(qc[0])
    size, bits = _jpeg_magnitude(diff)
    code, length = dc_codes[size]
    bw.write(code, length)
    bw.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(qc)[0])) if qc.any() else 0
    for k in range(1, 64):
        if k > last_nz:
            break
        v = int(qc[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size, bits = _jpeg_magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(bits, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return prev_dc


def _jpeg_container(
    h: int,
    w: int,
    ncomp: int,
    q: np.ndarray,
    scan: bytes,
    sampling: list[int] | None = None,
) -> bytes:
    """Assemble SOI..EOI around an entropy-coded scan. All components
    share quant table 0 and Huffman tables 0 (legal baseline JFIF; any
    conforming decoder reads the selectors from the stream).
    ``sampling``: per-component H<<4|V byte (default 0x11 each)."""

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    zz_q = q.reshape(64)[_ZIGZAG].astype(np.uint8).tobytes()
    sof = b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([ncomp])
    samp = sampling or [0x11] * ncomp
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, samp[cid - 1], 0x00])
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])
    sos += b"\x00\x3f\x00"
    out = b"\xff\xd8"  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + zz_q)  # DQT: 8-bit, table 0
    out += seg(0xC0, sof)
    out += seg(0xC4, b"\x00" + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS))
    out += seg(0xC4, b"\x10" + bytes(_AC_LUMA_BITS) + bytes(_AC_LUMA_VALS))
    out += seg(0xDA, sos)
    return out + scan + b"\xff\xd9"  # EOI


def jpeg_encode_gray(arr: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    """Baseline JFIF encoding of a 2-D uint8 grayscale image: 8x8 FDCT,
    quantization (``quant`` defaults to the Annex K luminance table),
    zigzag, DC-difference + run-length AC Huffman coding with the Annex K
    luminance tables (emitted in DHT, so any conforming decoder reads
    them from the stream). Edge blocks pad by replication."""
    if arr.ndim != 2 or arr.dtype != np.uint8:
        raise ValueError("jpeg_encode_gray expects a 2-D uint8 array")
    h, w = arr.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    q = _jpeg_check_quant(quant)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(arr, ((0, ph - h), (0, pw - w)), mode="edge")
    dc_codes = _huff_canonical(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _huff_canonical(_AC_LUMA_BITS, _AC_LUMA_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            f = padded[by : by + 8, bx : bx + 8].astype(np.float64) - 128.0
            prev_dc = _jpeg_encode_block(bw, f, q, dc_codes, ac_codes, prev_dc)
    return _jpeg_container(h, w, 1, q, bw.flush())


def jpeg_encode_rgb(
    arr: np.ndarray,
    quant: np.ndarray | None = None,
    subsample: str = "444",
) -> bytes:
    """Baseline JFIF encoding of an (h, w, 3) uint8 RGB image as YCbCr:
    BT.601 full-range conversion (kept in float through the FDCT — no
    intermediate rounding), then per-MCU interleaved blocks with
    independent DC predictors. ``subsample='444'`` (default) keeps
    chroma at full resolution (MCU = Y+Cb+Cr, one block each);
    ``'420'`` box-averages each 2x2 chroma neighborhood (the layout
    most real-world JPEGs use — MCU = 4 Y blocks + Cb + Cr over a 16x16
    tile). All components share the (``quant`` or Annex K luminance)
    quantization table and the luminance Huffman tables — legal baseline
    JFIF, and the selectors in the stream say so."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("jpeg_encode_rgb expects an (h, w, 3) uint8 array")
    if subsample not in ("444", "420"):
        raise ValueError(f"subsample must be '444' or '420', got {subsample!r}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    q = _jpeg_check_quant(quant)
    rf = arr[:, :, 0].astype(np.float64)
    gf = arr[:, :, 1].astype(np.float64)
    bf = arr[:, :, 2].astype(np.float64)
    # centered planes (sample - 128), the FDCT's expected level shift
    yp = 0.299 * rf + 0.587 * gf + 0.114 * bf - 128.0
    cbp = -0.168736 * rf - 0.331264 * gf + 0.5 * bf
    crp = 0.5 * rf - 0.418688 * gf - 0.081312 * bf
    dc_codes = _huff_canonical(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _huff_canonical(_AC_LUMA_BITS, _AC_LUMA_VALS)
    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    if subsample == "444":
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
        planes = [
            np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            for p in (yp, cbp, crp)
        ]
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                for ci, plane in enumerate(planes):
                    prev_dc[ci] = _jpeg_encode_block(
                        bw,
                        plane[by : by + 8, bx : bx + 8],
                        q,
                        dc_codes,
                        ac_codes,
                        prev_dc[ci],
                    )
        return _jpeg_container(h, w, 3, q, bw.flush())
    # 4:2:0 — luma padded to the 16x16 MCU grid; chroma box-averaged 2x2
    # then padded to the 8x8-per-MCU grid.
    ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
    ylum = np.pad(yp, ((0, ph - h), (0, pw - w)), mode="edge")
    ch2, cw2 = -(-h // 2) * 2, -(-w // 2) * 2
    sub = []
    for p in (cbp, crp):
        p2 = np.pad(p, ((0, ch2 - h), (0, cw2 - w)), mode="edge")
        box = p2.reshape(ch2 // 2, 2, cw2 // 2, 2).mean(axis=(1, 3))
        sub.append(
            np.pad(
                box,
                ((0, ph // 2 - box.shape[0]), (0, pw // 2 - box.shape[1])),
                mode="edge",
            )
        )
    for my in range(0, ph, 16):
        for mx in range(0, pw, 16):
            for by, bx in ((0, 0), (0, 8), (8, 0), (8, 8)):  # Y: H then V
                prev_dc[0] = _jpeg_encode_block(
                    bw,
                    ylum[my + by : my + by + 8, mx + bx : mx + bx + 8],
                    q,
                    dc_codes,
                    ac_codes,
                    prev_dc[0],
                )
            cy, cx = my // 2, mx // 2
            for ci, plane in enumerate(sub, start=1):
                prev_dc[ci] = _jpeg_encode_block(
                    bw,
                    plane[cy : cy + 8, cx : cx + 8],
                    q,
                    dc_codes,
                    ac_codes,
                    prev_dc[ci],
                )
    return _jpeg_container(h, w, 3, q, bw.flush(), sampling=[0x22, 0x11, 0x11])


class _BitReader:
    """Bit-serial reader over entropy-coded data with 0xFF00 de-stuffing."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise ValueError("restart markers (DRI) not supported")
            else:
                raise ValueError("unexpected marker inside scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")


def _jpeg_extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _jpeg_segments(data: bytes):
    """Yield (marker, payload, next_pos) for each segment before SOS."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad segment marker")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            return
        ln = int.from_bytes(data[pos + 2 : pos + 4], "big")
        payload = data[pos + 4 : pos + 2 + ln]
        yield marker, payload, pos + 2 + ln
        if marker == 0xDA:
            return
        pos += 2 + ln
    raise ValueError("truncated JPEG")


def _jpeg_decode_planes(data: bytes) -> tuple[list[np.ndarray], int, int]:
    """Shared scan decoder: (per-component float planes BEFORE the +128
    level shift / rounding, h, w) for baseline files. Supports the two
    layouts that cover real-world baseline JPEGs: no subsampling (every
    sampling factor 1x1) and 4:2:0 (luma 2x2, chroma 1x1 — the MCU is a
    16x16 tile of 4 Y blocks + Cb + Cr). Chroma planes come back at
    their SUBSAMPLED resolution; the caller upsamples. DQT and DHT
    tables are read from the stream, never assumed."""
    quants: dict[int, np.ndarray] = {}
    huffs: dict[tuple[int, int], dict] = {}
    dims = None
    comps: list[dict] = []  # SOF order: {id, tq}
    scan_sel: dict[int, tuple[int, int]] = {}  # component id -> (Td, Ta)
    scan_pos = None
    for marker, payload, nxt in _jpeg_segments(data):
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.frombuffer(payload[p + 1 : p + 65], np.uint8).astype(
                    np.int32
                )
                dez = np.empty(64, np.int32)
                dez[_ZIGZAG] = tbl
                quants[tq] = dez.reshape(8, 8)
                p += 65
        elif marker in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0) is supported"
            )
        elif marker == 0xC0:  # SOF0
            if payload[0] != 8:
                raise ValueError("only 8-bit precision supported")
            ncomp = payload[5]
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG not supported (grayscale or "
                    "YCbCr 4:4:4 only; inject a full decoder)"
                )
            h = int.from_bytes(payload[1:3], "big")
            w = int.from_bytes(payload[3:5], "big")
            comps = []
            for ci in range(ncomp):
                base = 6 + 3 * ci
                samp = payload[base + 1]
                comps.append(
                    {
                        "id": payload[base],
                        "hs": samp >> 4,
                        "vs": samp & 0x0F,
                        "tq": payload[base + 2],
                    }
                )
            factors = [(c["hs"], c["vs"]) for c in comps]
            if factors != [(1, 1)] * ncomp and factors != [(2, 2), (1, 1), (1, 1)]:
                raise NotImplementedError(
                    f"sampling layout {factors} not supported (1x1 "
                    "everywhere or 4:2:0; inject a full decoder)"
                )
            dims = (h, w)
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nvals])
                huffs[(tc, th)] = _huff_decode_map(bits, vals)
                p += 17 + nvals
        elif marker == 0xDD:
            raise ValueError("restart intervals (DRI) not supported")
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            for si in range(ns):
                cs = payload[1 + 2 * si]
                tt = payload[2 + 2 * si]
                scan_sel[cs] = (tt >> 4, tt & 0x0F)
            scan_pos = nxt
    if dims is None or scan_pos is None or not comps:
        raise ValueError("missing SOF0/SOS segment")
    h, w = dims
    tables = []
    for c in comps:
        q = quants.get(c["tq"])
        sel = scan_sel.get(c["id"])
        if q is None or sel is None:
            raise ValueError("missing DQT/DHT table referenced by the scan")
        dc_map, ac_map = huffs.get((0, sel[0])), huffs.get((1, sel[1]))
        if dc_map is None or ac_map is None:
            raise ValueError("missing DQT/DHT table referenced by the scan")
        tables.append((q, dc_map, ac_map))
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x, mcus_y = -(-w // mcu_w), -(-h // mcu_h)
    planes = [
        np.empty((mcus_y * 8 * c["vs"], mcus_x * 8 * c["hs"]), np.float64)
        for c in comps
    ]
    br = _BitReader(data, scan_pos)
    prev_dc = [0] * len(comps)
    zz = _ZIGZAG

    def decode_block(ci: int) -> np.ndarray:
        q, dc_map, ac_map = tables[ci]
        coeffs_zz = np.zeros(64, np.int64)
        size = br.huff(dc_map)
        prev_dc[ci] += _jpeg_extend(br.read(size), size)
        coeffs_zz[0] = prev_dc[ci]
        k = 1
        while k < 64:
            sym = br.huff(ac_map)
            if sym == 0x00:  # EOB
                break
            run, size = sym >> 4, sym & 0x0F
            if size == 0:
                if run != 15:
                    raise ValueError("invalid AC symbol")
                k += 16  # ZRL
                continue
            k += run
            if k > 63:
                raise ValueError("AC run past block end")
            coeffs_zz[k] = _jpeg_extend(br.read(size), size)
            k += 1
        coeffs = np.empty(64, np.float64)
        coeffs[zz] = coeffs_zz * q.reshape(64)[zz]
        return _DCT_A.T @ coeffs.reshape(8, 8) @ _DCT_A

    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, c in enumerate(comps):
                for by in range(c["vs"]):  # vertical blocks, raster order
                    for bx in range(c["hs"]):
                        oy = (my * c["vs"] + by) * 8
                        ox = (mx * c["hs"] + bx) * 8
                        planes[ci][oy : oy + 8, ox : ox + 8] = decode_block(ci)
    # crop each plane to its component resolution (ceil of image/sampling)
    out = []
    for ci, c in enumerate(comps):
        chh = -(-h * c["vs"] // vmax)
        cww = -(-w * c["hs"] // hmax)
        out.append(planes[ci][:chh, :cww])
    return out, h, w


def jpeg_decode_gray(data: bytes) -> np.ndarray:
    """Decode a baseline grayscale JPEG to a 2-D uint8 array. DQT and DHT
    tables are read from the stream (not assumed), so any conforming
    1-component baseline file decodes. Progressive (SOF2), chroma
    subsampling, and restart intervals raise ValueError /
    NotImplementedError — inject a full decoder for those. 3-component
    files decode via :func:`jpeg_decode`."""
    planes, _, _ = _jpeg_decode_planes(data)
    if len(planes) != 1:
        raise ValueError(
            "not a grayscale JPEG (use jpeg_decode for color files)"
        )
    return np.clip(np.round(planes[0] + 128.0), 0, 255).astype(np.uint8)


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG: 2-D uint8 for grayscale files, (h, w, 3)
    uint8 RGB for YCbCr color files — 4:4:4 or 4:2:0, where subsampled
    chroma upsamples by nearest-neighbor replication (BT.601 full-range
    conversion, the JFIF convention). Rounding happens ONCE, after the
    color-space conversion, matching common decoders."""
    planes, h, w = _jpeg_decode_planes(data)
    if len(planes) == 1:
        return np.clip(np.round(planes[0] + 128.0), 0, 255).astype(np.uint8)
    y = planes[0] + 128.0
    chroma = []
    for p in planes[1:]:  # already centered: stored as C - 128
        if p.shape != y.shape:
            fy = -(-y.shape[0] // p.shape[0])  # ceil ratio (2 for 4:2:0)
            fx = -(-y.shape[1] // p.shape[1])
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)[
                : y.shape[0], : y.shape[1]
            ]
        chroma.append(p)
    cb, cr = chroma
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def jpeg_decode_info(data: bytes) -> dict:
    """(width, height, channels, format) from the SOF0 header — the
    ``decode_fn`` signature of :func:`multimodal.decode_images`."""
    for marker, payload, _ in _jpeg_segments(data):
        if marker == 0xC0:
            return {
                "width": int.from_bytes(payload[3:5], "big"),
                "height": int.from_bytes(payload[1:3], "big"),
                "channels": int(payload[5]),
                "format": "jpeg",
            }
        if marker in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError("only baseline JPEG (SOF0) supported")
    raise ValueError("missing SOF0 segment")


def jpeg_channel_stats(data: bytes) -> dict:
    """Channel stats with REAL decoded pixels (grayscale: all three
    channel means equal the gray mean; color: per-RGB-channel means) —
    the ``stats_fn`` signature of
    :func:`multimodal.image_channel_stats`; matching an independently
    computed oracle proves the Huffman+IDCT(+YCbCr) path reconstructed
    the raster, not just the header."""
    img = jpeg_decode(data).astype(np.float64)
    if img.ndim == 2:
        mean = float(img.mean())
        return {
            "mean_r": mean, "mean_g": mean, "mean_b": mean,
            "std": float(img.std()),
        }
    return {
        "mean_r": float(img[:, :, 0].mean()),
        "mean_g": float(img[:, :, 1].mean()),
        "mean_b": float(img[:, :, 2].mean()),
        "std": float(img.std()),
    }
