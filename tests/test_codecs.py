"""Codec round-trip + per-row invariant kernels (PSNR, phash).

Reference parity target: decoded-pixel allclose, PSNR>=40dB for lossy
formats, caption equality (BASELINE.json input_hint).
"""

from __future__ import annotations

import numpy as np
import pytest

from dea_coastlines_spark.codecs import image, png, tiff


def _tile(seed=0, h=64, w=64, nan_frac=0.1):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, size=(h, w)).astype(np.float32)
    mask = rng.random((h, w)) < nan_frac
    x[mask] = np.nan
    return x


def test_png_uint16_roundtrip():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 65536, size=(37, 53), dtype=np.uint16)
    assert np.array_equal(png.decode_gray(png.encode_gray(img, 16)), img)


def test_png_uint8_roundtrip():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    assert np.array_equal(png.decode_gray(png.encode_gray(img, 8)), img)


def test_png_filter_decode():
    # exercise the Up/Sub/Paeth unfilter paths with a hand-built stream
    import struct
    import zlib

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    raw = img.copy()
    scan = []
    # row0: filter 0; row1+: filter 2 (Up)
    scan.append(b"\x00" + raw[0].tobytes())
    for r in range(1, 8):
        delta = (raw[r].astype(np.int16) - raw[r - 1].astype(np.int16)) & 0xFF
        scan.append(b"\x02" + delta.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0)
    buf = (
        b"\x89PNG\r\n\x1a\n"
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(b"".join(scan)))
        + png._chunk(b"IEND", b"")
    )
    assert np.array_equal(png.decode_gray(buf), img)


def test_tiff_f32_roundtrip_bitexact():
    x = _tile(3)
    out = tiff.decode_f32(tiff.encode_f32(x))
    assert out.dtype == np.float32
    assert np.array_equal(np.isnan(out), np.isnan(x))
    assert np.array_equal(out[~np.isnan(out)], x[~np.isnan(x)])


@pytest.mark.parametrize("fmt", ["png", "tiff"])
def test_tile_roundtrip_invariant(fmt):
    x = _tile(4)
    y = image.decode_tile(image.encode_tile(x, fmt), fmt)
    assert np.array_equal(np.isnan(x), np.isnan(y))
    assert np.allclose(x[~np.isnan(x)], y[~np.isnan(y)], atol=2e-4)
    assert image.psnr(x, y) >= 40.0


def test_jpeg_uint8_roundtrip_psnr():
    # smooth content + mild noise, like an MNDWI tile
    from dea_coastlines_spark.codecs import jpeg

    rng = np.random.default_rng(11)
    y, x = np.mgrid[0:96, 0:96]
    img = np.clip(
        np.round(127.5 + 80 * np.sin(x / 30.0) + 30 * np.cos(y / 17.0)
                 + rng.normal(0, 3, (96, 96))),
        0, 255,
    ).astype(np.uint8)
    dec = jpeg.decode_gray(jpeg.encode_gray(img, quality=95))
    assert dec.shape == img.shape and dec.dtype == np.uint8
    mse = float(np.mean((dec.astype(float) - img.astype(float)) ** 2))
    assert 10 * np.log10(255**2 / mse) >= 40.0


def test_jpeg_odd_sizes_roundtrip():
    from dea_coastlines_spark.codecs import jpeg

    rng = np.random.default_rng(12)
    for shape in [(1, 1), (7, 13), (33, 64), (96, 100)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        assert jpeg.decode_gray(jpeg.encode_gray(img, 95)).shape == shape


def test_jpeg_tile_nan_mask_exact_and_psnr_gate():
    # the lossy-format invariant from BASELINE.json input_hint:
    # NaN nodata positions round-trip EXACTLY (APP7 sidecar), values
    # within PSNR>=40dB
    x = _tile(5)
    y = image.decode_tile(image.encode_tile(x, "jpeg"), "jpeg")
    assert np.array_equal(np.isnan(x), np.isnan(y))
    assert image.psnr(x, y) >= 40.0


def test_jpeg_dequantized_content_psnr():
    # corpus-shaped content (smooth ramp + noise), not raw white noise
    rng = np.random.default_rng(13)
    yy, xx = np.mgrid[0:108, 0:108]
    x = np.tanh((yy - 50 + 8 * np.sin(xx / 20.0)) / 6.0).astype(np.float32)
    x += rng.normal(0, 0.04, x.shape).astype(np.float32)
    x = np.clip(x, -1, 1)
    x[rng.random(x.shape) < 0.15] = np.nan
    y = image.decode_tile(image.encode_tile(x, "jpeg"), "jpeg")
    assert np.array_equal(np.isnan(x), np.isnan(y))
    assert image.psnr(x, y) >= 40.0


def test_mixed_corpus_formats_decode():
    from dea_coastlines_spark.synth import corpus

    spec = corpus.CorpusSpec(tile_px=32, halo_px=2, tiles_x=2, tiles_y=1,
                             year0=2000, year1=2001, obs_per_year=3,
                             cloud_frac=0.1, seed=6, fmt="mixed")
    pdf = corpus.generate_pandas(spec)
    assert set(pdf["fmt"]) == {"png", "jpeg", "tiff"}
    for _, r in pdf.iterrows():
        arr = image.decode_tile(bytes(r["bytes"]), r["fmt"])
        assert arr.shape == (36, 36)
        assert np.isfinite(arr[~np.isnan(arr)]).all()


def test_psnr_mismatched_nan_mask_fails():
    x = _tile(6)
    y = x.copy()
    y[0, 0] = np.nan if not np.isnan(y[0, 0]) else 0.0
    assert image.psnr(x, y) == float("-inf")


def test_phash_deterministic_and_discriminative():
    a, b = _tile(7, nan_frac=0), _tile(8, nan_frac=0)
    assert image.phash64(a) == image.phash64(a.copy())
    assert image.phash64(a) != image.phash64(b)
    # fits BIGINT
    assert -(1 << 63) <= image.phash64(a) < (1 << 63)


def test_phash_stable_under_quantization():
    a = _tile(9, nan_frac=0)
    q = image.dequantize(image.quantize(a))
    assert image.phash64(a) == image.phash64(q)
