"""Pure-Python PNG codec (decode to RGBA8, encode from RGBA8).

Plays the role lodepng plays in the reference (vendored codec,
src/main.cpp:190-229 decode, src/main.cpp:1710-1716 encode): every PNG is decoded
*to RGBA8* regardless of its native color type, and outputs are always RGBA8.

This is the fallback path; the native C++ codec in `native/` (see
utils/native.py) is used when built. Decode supports bit depth 8, color types
0/2/3/4/6, all five filter types, no interlacing. Encode writes color type 6
(RGBA8) with per-row adaptive None/Sub/Up filtering.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    pass


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode(rgba: np.ndarray, compress_level: int = 6) -> bytes:
    """Encode an (H, W, 4) uint8 array as a PNG (color type 6, 8-bit)."""
    rgba = np.ascontiguousarray(rgba, np.uint8)
    if rgba.ndim != 3 or rgba.shape[2] != 4:
        raise PngError(f"expected (H, W, 4) uint8, got {rgba.shape}")
    h, w, _ = rgba.shape

    # Adaptive per-row filter between None(0), Sub(1), Up(2) -- all three are
    # vectorizable both ways; pick the one with the smallest absolute residual
    # (the standard minimum-sum-of-absolute-differences heuristic).
    raw = rgba.reshape(h, w * 4).astype(np.int16)
    left = np.zeros_like(raw)
    left[:, 4:] = raw[:, :-4]
    up = np.zeros_like(raw)
    up[1:] = raw[:-1]
    cand = np.stack(
        [raw, (raw - left) & 0xFF, (raw - up) & 0xFF], axis=0
    ).astype(np.uint8)
    # Sum of bytes interpreted as signed distance from the 0/256 wrap point.
    c = cand.astype(np.int16)
    cost = np.where(c < 128, c, 256 - c).sum(axis=2)
    choice = np.argmin(cost, axis=0).astype(np.uint8)
    lines = bytearray()
    for y in range(h):
        f = int(choice[y])
        lines.append(f)
        lines += cand[f, y].tobytes()

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines), compress_level))
        + _chunk(b"IEND", b"")
    )


def _unfilter(data: bytes, h: int, w: int, channels: int) -> np.ndarray:
    """Reverse PNG scanline filtering. Returns (H, W*channels) uint8."""
    stride = w * channels
    bpp = channels
    arr = np.frombuffer(data, np.uint8)
    if arr.size != h * (stride + 1):
        raise PngError("bad IDAT length")
    arr = arr.reshape(h, stride + 1)
    filters = arr[:, 0]
    rows = arr[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), np.int32)
    prior = np.zeros(stride, np.int32)
    for y in range(h):
        f = int(filters[y])
        row = rows[y]
        if f == 0:
            rec = row
        elif f == 1:  # Sub: cumulative sum per byte lane modulo 256
            lanes = row.reshape(-1, bpp)
            rec = np.cumsum(lanes, axis=0, dtype=np.int64).reshape(-1) & 0xFF
        elif f == 2:  # Up
            rec = (row + prior) & 0xFF
        elif f == 3:  # Average -- sequential in x over pixels
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (row[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth -- sequential in x over pixels
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prior[x]
                c = prior[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (row[x] + pred) & 0xFF
        else:
            raise PngError(f"unknown filter type {f}")
        out[y] = rec
        prior = rec
    return out.astype(np.uint8)


def decode(data: bytes) -> np.ndarray:
    """Decode a PNG to an (H, W, 4) uint8 RGBA array (lodepng::decode analog)."""
    if data[:8] != _PNG_SIG:
        raise PngError("not a PNG file")
    pos = 8
    w = h = None
    bitdepth = colortype = None
    idat = bytearray()
    palette = None
    trns = None
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bitdepth, colortype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if interlace:
                raise PngError("interlaced PNG not supported")
            if bitdepth != 8:
                raise PngError(f"bit depth {bitdepth} not supported (only 8)")
        elif tag == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, np.uint8)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise PngError("missing IHDR")
    channels = _CHANNELS.get(colortype)
    if channels is None:
        raise PngError(f"color type {colortype} not supported")
    raw = _unfilter(zlib.decompress(bytes(idat)), h, w, channels)
    px = raw.reshape(h, w, channels)

    out = np.empty((h, w, 4), np.uint8)
    if colortype == 6:
        out[:] = px
    elif colortype == 2:
        out[..., :3] = px
        out[..., 3] = 255
    elif colortype == 0:
        out[..., :3] = px
        out[..., 3] = 255
    elif colortype == 4:
        out[..., :3] = px[..., :1]
        out[..., 3] = px[..., 1]
    elif colortype == 3:
        if palette is None:
            raise PngError("palette image without PLTE")
        idx = px[..., 0]
        out[..., :3] = palette[idx]
        if trns is not None:
            alpha = np.full(palette.shape[0], 255, np.uint8)
            alpha[: trns.size] = trns
            out[..., 3] = alpha[idx]
        else:
            out[..., 3] = 255
    return out


def read(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return decode(f.read())


def write(path: str, rgba: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(encode(rgba))
