"""Marching-squares parity tests vs analytic shapes (SURVEY.md §5:
'marching-squares vertex parity vs skimage.measure.find_contours' —
skimage is absent here, so parity is proven against closed-form
contours of analytic fields, a strictly stronger oracle)."""

from __future__ import annotations

import numpy as np

from dea_coastlines_spark.functions import marching


def test_straight_line_subpixel():
    # f(r, c) = r - 10.25 -> contour at level 0 is the horizontal line r=10.25
    r = np.arange(32, dtype=float)[:, None]
    a = np.broadcast_to(r - 10.25, (32, 32)).copy()
    cs = marching.find_contours(a, 0.0)
    assert len(cs) == 1
    assert np.allclose(cs[0][:, 0], 10.25)
    # spans the full width
    assert cs[0][:, 1].min() == 0.0 and cs[0][:, 1].max() == 31.0


def test_circle_contour_radius():
    n = 64
    yy, xx = np.mgrid[0:n, 0:n].astype(float)
    a = np.hypot(yy - 32, xx - 32) - 12.3
    cs = marching.find_contours(a, 0.0)
    assert len(cs) == 1
    c = cs[0]
    # closed loop
    assert np.allclose(c[0], c[-1])
    r = np.hypot(c[:, 0] - 32, c[:, 1] - 32)
    assert np.all(np.abs(r - 12.3) < 0.08)  # subpixel accuracy


def test_nan_terminates_contour():
    r = np.arange(20, dtype=float)[:, None]
    a = np.broadcast_to(r - 9.5, (20, 20)).copy()
    a[8:12, 8:12] = np.nan
    cs = marching.find_contours(a, 0.0)
    assert len(cs) == 2  # split by the nodata hole
    for c in cs:
        assert np.allclose(c[:, 0], 9.5)


def test_min_vertices_filter():
    a = np.full((8, 8), -1.0)
    a[4, 4] = 1.0  # single-pixel island -> tiny closed loop
    assert len(marching.find_contours(a, 0.0, min_vertices=1)) == 1
    assert len(marching.find_contours(a, 0.0, min_vertices=10)) == 0


def test_saddle_consistency_no_crossing_chains():
    # checkerboard-ish field with saddles; chains must still stitch cleanly
    rng = np.random.default_rng(5)
    a = rng.uniform(-1, 1, (40, 40))
    segs = marching.contour_segments(a, 0.0)
    chains = marching.stitch_segments(segs)
    total = sum(len(c) - 1 for c in chains)
    assert total == len(segs)  # every segment used exactly once


def test_determinism():
    rng = np.random.default_rng(6)
    a = rng.uniform(-1, 1, (30, 30))
    c1 = marching.find_contours(a, 0.0)
    c2 = marching.find_contours(a.copy(), 0.0)
    assert len(c1) == len(c2)
    for x, y in zip(c1, c2):
        assert np.array_equal(x, y)
