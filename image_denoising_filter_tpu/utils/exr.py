"""Pure-Python OpenEXR scanline codec (float32/float16, NONE/ZIP/ZIPS).

Plays the role tinyexr plays in the reference (LoadEXR/SaveEXR,
src/main.cpp:151-186, 1688-1708): HDR images round-trip as float32 RGBA with the
alpha channel preserved (the README calls out alpha preservation explicitly,
README.md:57-59).

Supported subset: single-part scanline EXRs, channels stored as HALF or FLOAT,
compression NONE (0), ZIPS (2, 1 scanline/block) and ZIP (3, 16 scanlines/block)
-- which covers OpenEXR's default and tinyexr's SaveEXR output. Tiled, deep,
multipart, and PIZ/PXR24/B44/DWA files raise ExrError.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = 20000630
_HALF = 1
_FLOAT = 2
_UINT = 0

_COMPRESSION_LINES = {0: 1, 2: 1, 3: 16}


class ExrError(ValueError):
    pass


def _read_nullterm(data: bytes, pos: int) -> tuple[str, int]:
    end = data.index(b"\x00", pos)
    return data[pos:end].decode("latin-1"), end + 1


def _predictor_decode(buf: np.ndarray) -> np.ndarray:
    """Reverse OpenEXR's ZIP delta predictor: d[i] stored as
    raw[i] - raw[i-1] + 128 + 256 (mod 256); recover with a cumulative sum."""
    shifted = buf.astype(np.int64)
    shifted[1:] -= 128 + 256
    return (np.cumsum(shifted) & 0xFF).astype(np.uint8)


def _predictor_encode(buf: np.ndarray) -> np.ndarray:
    out = buf.astype(np.int32)
    out[1:] = (out[1:] - out[:-1].astype(np.int32) + (128 + 256)) & 0xFF
    return out.astype(np.uint8)


def _deinterleave(buf: np.ndarray) -> np.ndarray:
    """Reverse OpenEXR's ZIP split-interleave: first half holds even bytes,
    second half holds odd bytes."""
    n = buf.size
    half = (n + 1) // 2
    out = np.empty(n, np.uint8)
    out[0::2] = buf[:half]
    out[1::2] = buf[half:]
    return out


def _interleave(buf: np.ndarray) -> np.ndarray:
    n = buf.size
    half = (n + 1) // 2
    out = np.empty(n, np.uint8)
    out[:half] = buf[0::2]
    out[half:] = buf[1::2]
    return out


def _zip_decompress(block: bytes, expected: int) -> bytes:
    raw = zlib.decompress(block)
    if len(raw) != expected:
        raise ExrError("ZIP block has wrong decompressed size")
    buf = np.frombuffer(raw, np.uint8)
    return _deinterleave(_predictor_decode(buf.copy())).tobytes()


def _zip_compress(raw: bytes) -> bytes:
    buf = _predictor_encode(_interleave(np.frombuffer(raw, np.uint8)))
    return zlib.compress(buf.tobytes(), 6)


def read(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return decode(f.read())


def decode(data: bytes) -> np.ndarray:
    """Decode an EXR to (H, W, 4) float32 RGBA (missing channels zero-filled,
    missing alpha = 1)."""
    magic, version = struct.unpack_from("<iI", data, 0)
    if magic != _MAGIC:
        raise ExrError("not an EXR file")
    if version & 0x200:
        raise ExrError("tiled EXR not supported")
    if version & (0x800 | 0x1000):
        raise ExrError("deep/multipart EXR not supported")

    pos = 8
    channels: list[tuple[str, int]] = []
    compression = None
    data_window = None
    line_order = 0
    while True:
        name, pos = _read_nullterm(data, pos)
        if not name:
            break
        atype, pos = _read_nullterm(data, pos)
        (size,) = struct.unpack_from("<i", data, pos)
        pos += 4
        body = data[pos : pos + size]
        pos += size
        if name == "channels":
            cpos = 0
            while body[cpos] != 0:
                cname, cpos = _read_nullterm(body, cpos)
                ptype, _pl, _xs, _ys = struct.unpack_from("<iBxxxii", body, cpos)
                cpos += 16
                channels.append((cname, ptype))
        elif name == "compression":
            compression = body[0]
        elif name == "dataWindow":
            data_window = struct.unpack("<4i", body)
        elif name == "lineOrder":
            line_order = body[0]  # parsed but placement uses block-header y

    if compression not in _COMPRESSION_LINES:
        raise ExrError(f"compression type {compression} not supported (NONE/ZIP/ZIPS only)")
    if data_window is None:
        raise ExrError("missing dataWindow")
    xmin, ymin, xmax, ymax = data_window
    w, h = xmax - xmin + 1, ymax - ymin + 1
    lines_per_block = _COMPRESSION_LINES[compression]
    nblocks = -(-h // lines_per_block)

    dtypes = {_HALF: np.float16, _FLOAT: np.float32, _UINT: np.uint32}
    ch_bytes = [(n, dtypes[t]) for n, t in channels]
    row_bytes = sum(w * np.dtype(d).itemsize for _, d in ch_bytes)

    offsets = struct.unpack_from(f"<{nblocks}q", data, pos)

    planes = {n: np.zeros((h, w), d) for n, d in ch_bytes}
    for off in offsets:
        y0, size = struct.unpack_from("<iI", data, off)
        block = data[off + 8 : off + 8 + size]
        y0 -= ymin
        nlines = min(lines_per_block, h - y0)
        expected = nlines * row_bytes
        if compression == 0 or size >= expected:
            # ZIP blocks are stored raw when compression doesn't shrink them
            # (OpenEXR convention: compressed blocks are always < raw size).
            raw = block[:expected]
        else:
            raw = _zip_decompress(block, expected)
        bpos = 0
        for line in range(nlines):
            # lineOrder only affects the order blocks appear in the file; the
            # block header's y is absolute and lines within a block ascend.
            y = y0 + line
            for cname, dt in ch_bytes:  # channels stored alphabetically per line
                nb = w * np.dtype(dt).itemsize
                planes[cname][y] = np.frombuffer(raw[bpos : bpos + nb], dt)
                bpos += nb

    out = np.zeros((h, w, 4), np.float32)
    for i, cname in enumerate("RGBA"):
        if cname in planes:
            out[..., i] = planes[cname].astype(np.float32)
        elif cname == "A":
            out[..., 3] = 1.0
    return out


def encode(rgba: np.ndarray, half: bool = False, compression: int = 3) -> bytes:
    """Encode (H, W, 4) float RGBA as a scanline EXR (alpha preserved).

    Default FLOAT pixels + ZIP compression, matching the reference's
    SaveEXR(..., components=4, save_as_fp16=0, ...) call (src/main.cpp:1699).
    """
    rgba = np.asarray(rgba, np.float32)
    if rgba.ndim != 3 or rgba.shape[2] != 4:
        raise ExrError(f"expected (H, W, 4) float, got {rgba.shape}")
    if compression not in _COMPRESSION_LINES:
        raise ExrError(f"unsupported compression {compression}")
    h, w, _ = rgba.shape
    dt = np.float16 if half else np.float32
    ptype = _HALF if half else _FLOAT

    # Channels must be listed (and stored per scanline) alphabetically: A B G R.
    ch_order = [("A", 3), ("B", 2), ("G", 1), ("R", 0)]

    def attr(name: str, atype: str, body: bytes) -> bytes:
        return (
            name.encode() + b"\x00" + atype.encode() + b"\x00"
            + struct.pack("<i", len(body)) + body
        )

    chlist = b""
    for cname, _ in ch_order:
        chlist += cname.encode() + b"\x00" + struct.pack("<iBxxxii", ptype, 0, 1, 1)
    chlist += b"\x00"

    box = struct.pack("<4i", 0, 0, w - 1, h - 1)
    header = (
        struct.pack("<iI", _MAGIC, 2)
        + attr("channels", "chlist", chlist)
        + attr("compression", "compression", bytes([compression]))
        + attr("dataWindow", "box2i", box)
        + attr("displayWindow", "box2i", box)
        + attr("lineOrder", "lineOrder", b"\x00")
        + attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
        + attr("screenWindowCenter", "v2f", struct.pack("<2f", 0.0, 0.0))
        + attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
        + b"\x00"
    )

    lines_per_block = _COMPRESSION_LINES[compression]
    nblocks = -(-h // lines_per_block)
    blocks = []
    planes = [rgba[..., idx].astype(dt) for _, idx in ch_order]
    for b in range(nblocks):
        y0 = b * lines_per_block
        nlines = min(lines_per_block, h - y0)
        raw = b""
        for line in range(nlines):
            for plane in planes:
                raw += plane[y0 + line].tobytes()
        if compression == 0:
            payload = raw
        else:
            payload = _zip_compress(raw)
            if len(payload) >= len(raw):  # OpenEXR stores raw if ZIP doesn't help
                payload = raw
        blocks.append((y0, payload))

    table_pos = len(header) + 8 * nblocks
    offsets = []
    pos = table_pos
    for y0, payload in blocks:
        offsets.append(pos)
        pos += 8 + len(payload)

    out = bytearray(header)
    for off in offsets:
        out += struct.pack("<q", off)
    for y0, payload in blocks:
        out += struct.pack("<iI", y0, len(payload))
        out += payload
    return bytes(out)


def write(path: str, rgba: np.ndarray, half: bool = False, compression: int = 3) -> None:
    with open(path, "wb") as f:
        f.write(encode(rgba, half=half, compression=compression))
