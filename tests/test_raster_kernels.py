"""Morphology + labeling kernel tests (brute-force oracles)."""

from __future__ import annotations

import numpy as np

from dea_coastlines_spark.functions import label as lbl
from dea_coastlines_spark.functions import morphology as mo


def _brute_dilate(a: np.ndarray, radius: int) -> np.ndarray:
    offs = mo.disk_offsets(radius)
    h, w = a.shape
    out = np.zeros_like(a, dtype=bool)
    for r in range(h):
        for c in range(w):
            if not a[r, c]:
                continue
            for dy, dx in offs:
                rr, cc = r + dy, c + dx
                if 0 <= rr < h and 0 <= cc < w:
                    out[rr, cc] = True
    return out


def test_dilate_erode_vs_brute():
    rng = np.random.default_rng(0)
    a = rng.random((24, 30)) > 0.8
    for radius in (1, 2, 3):
        assert np.array_equal(mo.dilate(a, radius), _brute_dilate(a, radius))
        # duality: erode(a) == ~dilate(~a)
        assert np.array_equal(mo.erode(a, radius), ~mo.dilate(~a, radius))


def test_closing_opening_properties():
    rng = np.random.default_rng(1)
    a = rng.random((30, 30)) > 0.6
    c = mo.closing(a, 2)
    o = mo.opening(a, 2)
    assert (c | a).sum() == c.sum()   # closing is extensive
    assert (o & a).sum() == o.sum()   # opening is anti-extensive
    assert np.array_equal(mo.closing(c, 2), c)  # idempotent
    assert np.array_equal(mo.opening(o, 2), o)


def test_black_tophat_detects_thin_dark_line():
    a = np.ones((20, 20))
    a[10, :] = 0.0  # thin dark river
    th = mo.black_tophat(a, 2)
    assert th[10].min() > 0.5
    assert np.abs(th[:5]).max() == 0.0


def test_label_counts_and_shapes():
    m = np.zeros((10, 12), bool)
    m[1:3, 1:3] = True       # blob 1
    m[5:9, 5:9] = True       # blob 2
    m[0, 11] = True          # blob 3
    labels, n = lbl.label(m)
    assert n == 3
    assert labels[m].min() > 0 and (labels[~m] == 0).all()
    # each blob one label
    assert len(np.unique(labels[1:3, 1:3])) == 1
    assert len(np.unique(labels[5:9, 5:9])) == 1


def test_label_8_vs_4_connectivity():
    m = np.zeros((4, 4), bool)
    m[0, 0] = m[1, 1] = True  # diagonal touch
    _, n8 = lbl.label(m, connectivity=2)
    _, n4 = lbl.label(m, connectivity=1)
    assert n8 == 1 and n4 == 2


def test_label_spiral_merging():
    # U-shape requiring union of early-separate runs
    m = np.zeros((5, 5), bool)
    m[:, 0] = True
    m[:, 4] = True
    m[4, :] = True
    labels, n = lbl.label(m)
    assert n == 1


def test_sieve_and_keep_touching():
    m = np.zeros((12, 12), bool)
    m[1:2, 1:2] = True       # size 1 -> sieved
    m[5:9, 5:9] = True       # size 16 -> kept
    s = lbl.sieve(m, min_size=4)
    assert not s[1, 1] and s[6, 6]
    seed = np.zeros_like(m)
    seed[6, 6] = True
    k = lbl.keep_touching(m, seed)
    assert k[5:9, 5:9].all() and not k[1, 1]


def test_edge_connected_ocean():
    m = np.zeros((10, 10), bool)
    m[:, :3] = True          # "ocean" touching left edge
    m[5:7, 6:8] = True       # inland lake
    e = lbl.edge_connected(m)
    assert e[:, :3].all() and not e[5:7, 6:8].any()
