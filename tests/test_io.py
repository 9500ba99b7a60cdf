"""PNG/EXR codec and LDR quantization round-trip tests."""

import numpy as np
import pytest

from image_denoising_filter_tpu.utils import exr, imageio, png


def test_png_roundtrip(rng):
    img = rng.integers(0, 256, (33, 47, 4), dtype=np.uint8)
    assert np.array_equal(png.decode(png.encode(img)), img)


def test_png_roundtrip_large_smooth(rng):
    yy, xx = np.mgrid[0:128, 0:200]
    img = np.stack([xx % 256, yy % 256, (xx + yy) % 256, np.full_like(xx, 255)], -1).astype(np.uint8)
    assert np.array_equal(png.decode(png.encode(img)), img)


def test_png_decode_rgb_and_gray():
    # Hand-build an RGB (color type 2) PNG via our encoder pieces.
    import struct
    import zlib

    h, w = 5, 7
    rgb = (np.arange(h * w * 3, dtype=np.uint8)).reshape(h, w, 3)
    lines = b""
    for y in range(h):
        lines += b"\x00" + rgb[y].tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(lines))
        + png._chunk(b"IEND", b"")
    )
    out = png.decode(data)
    assert out.shape == (h, w, 4)
    assert np.array_equal(out[..., :3], rgb)
    assert np.all(out[..., 3] == 255)


def test_png_all_filters_decode(rng):
    """Force each filter type on encode and check decode inverts it."""
    import struct
    import zlib

    h, w = 9, 11
    img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    raw = img.reshape(h, w * 4).astype(np.int32)
    stride, bpp = w * 4, 4
    lines = bytearray()
    prior = np.zeros(stride, np.int32)
    for y in range(h):
        f = y % 5
        row = raw[y]
        if f == 0:
            filt = row
        elif f == 1:
            filt = (row - np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])) & 0xFF
        elif f == 2:
            filt = (row - prior) & 0xFF
        elif f == 3:
            left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
            filt = (row - ((left + prior) >> 1)) & 0xFF
        else:
            filt = np.empty(stride, np.int32)
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                b = prior[x]
                c = prior[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt[x] = (row[x] - pred) & 0xFF
        lines.append(f)
        lines += filt.astype(np.uint8).tobytes()
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(bytes(lines)))
        + png._chunk(b"IEND", b"")
    )
    assert np.array_equal(png.decode(data), img)


@pytest.mark.parametrize("compression", [0, 2, 3])
@pytest.mark.parametrize("half", [False, True])
def test_exr_roundtrip(rng, compression, half):
    img = rng.normal(0, 2.0, (21, 33, 4)).astype(np.float32)
    data = exr.encode(img, half=half, compression=compression)
    out = exr.decode(data)
    if half:
        np.testing.assert_array_equal(out, img.astype(np.float16).astype(np.float32))
    else:
        np.testing.assert_array_equal(out, img)


def test_exr_alpha_preserved(rng, tmp_path):
    """README.md:57-59: .exr saved with alpha channel."""
    img = rng.uniform(0, 4, (16, 16, 4)).astype(np.float32)
    p = str(tmp_path / "x.exr")
    exr.write(p, img)
    out = exr.read(p)
    np.testing.assert_array_equal(out[..., 3], img[..., 3])


def test_quantize_unclamped_wrap():
    """The reference's unclamped (unsigned char)(255*x) cast wraps values > 1
    (src/main.cpp:97-102)."""
    x = np.array([[[0.0, 0.5, 1.0, 1.5]]], np.float32)
    out = imageio.quantize(x)
    assert out.tolist() == [[[0, 127, 255, int(np.trunc(1.5 * 255)) % 256]]]
    clamped = imageio.quantize(x, clamp=True)
    assert clamped.tolist() == [[[0, 127, 255, 255]]]


def test_ldr_roundtrip_semantics(tmp_path, rng):
    """byte -> *1/255 float -> *255 trunc byte must be the identity
    (src/main.cpp:1125-1128, 97-102)."""
    b = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    again = imageio.quantize(imageio.to_float(b))
    assert np.array_equal(b, again)


def test_load_save_dispatch(tmp_path, rng):
    imgf = rng.uniform(0, 1, (12, 12, 4)).astype(np.float32)
    ppng = str(tmp_path / "a.png")
    pexr = str(tmp_path / "a.exr")
    imageio.save(ppng, imgf)
    imageio.save(pexr, imgf)
    lp, hdr_p = imageio.load(ppng)
    le, hdr_e = imageio.load(pexr)
    assert not hdr_p and hdr_e
    np.testing.assert_array_equal(le, imgf)
    assert np.max(np.abs(lp - imgf)) <= 1.0 / 255.0 + 1e-6
