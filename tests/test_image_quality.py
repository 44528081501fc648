"""Image-quality signals (operators/multimodal.image_quality): planted
degenerate images exercise every threshold / NULL path the deterministic
driver-query corpus can't reach (its synthetic tiles are all textured,
so low_quality is uniformly False there), plus a brute-force numpy
parity check on a textured tile."""

import math

import numpy as np
import pandas as pd
import pytest

from dea_coastlines_spark.codecs import image as ic
from dea_coastlines_spark.operators import multimodal


def _tile_row(image_id, arr):
    arr = np.ascontiguousarray(arr.astype(np.float32))
    return {
        "image_id": image_id,
        "bytes": ic.encode_tile(arr, "tiff"),
        "w": arr.shape[1],
        "h": arr.shape[0],
        "fmt": "tiff",
    }


@pytest.fixture(scope="module")
def quality_rows(spark):
    rng = np.random.default_rng(7)
    const = np.full((16, 16), 0.3)
    allnan = np.full((16, 16), np.nan)
    cb = np.indices((16, 16)).sum(axis=0) % 2 * 1.0 - 0.5  # checkerboard ±0.5
    tiny = np.array([[0.1, 0.9], [0.4, 0.2]])
    mostly_nan = rng.uniform(-1, 1, (16, 16))
    mostly_nan[:10, :] = np.nan  # 62.5% nodata
    gradient = np.linspace(0.0, 1.0, 16)[None, :].repeat(16, axis=0)
    textured = rng.uniform(-1, 1, (16, 16))
    rows = [
        _tile_row("const", const),
        _tile_row("allnan", allnan),
        _tile_row("checker", cb),
        _tile_row("tiny", tiny),
        _tile_row("mostly_nan", mostly_nan),
        _tile_row("gradient", gradient),
        _tile_row("textured", textured),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = multimodal.image_quality(df).toPandas().set_index("image_id")
    return out, {r["image_id"]: ic.decode_tile(bytes(r["bytes"]), "tiff") for r in rows}


def test_constant_image_is_low_quality(quality_rows):
    out, _ = quality_rows
    r = out.loc["const"]
    assert r.laplacian_var == 0.0
    assert r.entropy == 0.0
    assert r.dynamic_range == 0.0
    assert r.nodata_frac == 0.0
    assert bool(r.low_quality)


def test_all_nan_image_is_low_quality(quality_rows):
    out, _ = quality_rows
    r = out.loc["allnan"]
    assert pd.isna(r.laplacian_var) and pd.isna(r.entropy) and pd.isna(r.dynamic_range)
    assert r.nodata_frac == 1.0
    assert bool(r.low_quality)


def test_checkerboard_is_sharp_not_low_quality(quality_rows):
    out, _ = quality_rows
    r = out.loc["checker"]
    # interior Laplacian of a ±0.5 checkerboard is ±4 exactly; the
    # population variance of a symmetric ±4 set is 16
    assert r.laplacian_var == pytest.approx(16.0, abs=1e-6)
    # two occupied bins, equal mass -> ln 2 nats
    assert r.entropy == pytest.approx(math.log(2), abs=1e-6)
    assert r.dynamic_range == pytest.approx(1.0, abs=1e-6)
    assert not bool(r.low_quality)


def test_no_interior_pixels_gives_null_laplacian(quality_rows):
    out, _ = quality_rows
    r = out.loc["tiny"]
    assert pd.isna(r.laplacian_var)
    assert bool(r.low_quality)


def test_nodata_majority_is_low_quality(quality_rows):
    out, _ = quality_rows
    r = out.loc["mostly_nan"]
    assert r.nodata_frac > 0.5
    assert bool(r.low_quality)


def test_linear_gradient_flagged_blurry(quality_rows):
    out, _ = quality_rows
    r = out.loc["gradient"]
    # a linear ramp has an exactly-zero Laplacian everywhere: the blur
    # detector must flag it even though entropy and range are high
    assert r.laplacian_var == pytest.approx(0.0, abs=1e-9)
    assert r.entropy > 0.5 and r.dynamic_range > 0.5
    assert bool(r.low_quality)


def test_textured_parity_vs_brute_numpy(quality_rows):
    out, decoded = quality_rows
    arr = decoded["textured"].astype(np.float64)
    lap = (
        4.0 * arr[1:-1, 1:-1] - arr[:-2, 1:-1] - arr[2:, 1:-1]
        - arr[1:-1, :-2] - arr[1:-1, 2:]
    )
    vmin, vmax = arr.min(), arr.max()
    bins = np.minimum(
        np.floor((arr - vmin) / (vmax - vmin) * 256.0).astype(int), 255
    ).ravel()
    cnt = np.bincount(bins, minlength=256).astype(float)
    p = cnt[cnt > 0] / arr.size
    r = out.loc["textured"]
    assert r.laplacian_var == pytest.approx(lap.var(), abs=1e-6)
    assert r.entropy == pytest.approx(-(p * np.log(p)).sum(), abs=1e-6)
    assert r.dynamic_range == pytest.approx(vmax - vmin, abs=1e-6)
    assert not bool(r.low_quality)


def test_undecodable_payload_flagged_not_fatal(spark):
    rows = [
        _tile_row("good", np.random.default_rng(3).uniform(-1, 1, (16, 16))),
        {"image_id": "corrupt", "bytes": b"\x89PNG then garbage",
         "w": 16, "h": 16, "fmt": "png"},
    ]
    out = (
        multimodal.image_quality(spark.createDataFrame(pd.DataFrame(rows)))
        .toPandas().set_index("image_id")
    )
    r = out.loc["corrupt"]
    assert bool(r.low_quality)
    assert pd.isna(r.laplacian_var) and pd.isna(r.nodata_frac)
    assert not bool(out.loc["good"].low_quality)
