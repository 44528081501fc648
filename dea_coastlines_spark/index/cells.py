"""S2-style quadtree cell index over the projected plane (pure numpy).

The reference partitions work by ~48 km Albers grid cells
(coastlines/raster.py:530-536, configs/dea_coastlines_config.yaml:5) and
uses geohash for point uids (coastlines/vector.py:1590-1595). The engine
generalizes both into one hierarchical cell index: a Morton (Z-order)
quadtree over a fixed projected extent — the same construction S2 uses
per cube face. Everything is vectorized numpy; encode runs inside Arrow
UDF batches (north_rule: "H3/S2 index ... vectorized Arrow UDFs that
batch-encode cell IDs").

Cell id layout (fits signed int64 / Spark BIGINT):
    bits 58..0  : Morton-interleaved (ix, iy) at `res` (29 bits each, capped)
    bits 63..59 : resolution (0..29)

World frame: coordinates in projected metres within
[WORLD_X0, WORLD_X0 + WORLD_SPAN) x [WORLD_Y0, WORLD_Y0 + WORLD_SPAN).
The span is a power-of-two number of metres so cell edges are exact.
"""

from __future__ import annotations

import numpy as np

# Frame sized to comfortably contain an Australia-scale projected CRS
# (EPSG:3577 spans roughly +-2.5e6 m); 2^23 m = ~8,388 km.
WORLD_X0 = -4_194_304.0
WORLD_Y0 = -4_194_304.0
WORLD_SPAN = 8_388_608.0  # 2^23 metres
MAX_RES = 29


def cell_size_m(res: int) -> float:
    """Edge length of a cell at resolution `res` in metres."""
    return WORLD_SPAN / (1 << res)


def _interleave_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 29 bits of each uint64 so they occupy even positions."""
    x = v.astype(np.uint64)
    x = (x | (x << np.uint64(32))) & np.uint64(0x00000000FFFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _deinterleave_bits(v: np.ndarray) -> np.ndarray:
    x = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return x


def xy_to_cell(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    """Vectorized (x, y) metres -> int64 cell ids at resolution `res`."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    n = 1 << res
    size = WORLD_SPAN / n
    ix = np.clip(((np.asarray(x, np.float64) - WORLD_X0) / size).astype(np.int64), 0, n - 1)
    iy = np.clip(((np.asarray(y, np.float64) - WORLD_Y0) / size).astype(np.int64), 0, n - 1)
    morton = _interleave_bits(ix.astype(np.uint64)) | (
        _interleave_bits(iy.astype(np.uint64)) << np.uint64(1)
    )
    return (morton | (np.uint64(res) << np.uint64(59))).astype(np.int64)


def cell_res(cell: np.ndarray) -> np.ndarray:
    return ((np.asarray(cell).astype(np.uint64)) >> np.uint64(59)).astype(np.int64)


def cell_to_ij(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    c = np.asarray(cell).astype(np.uint64) & np.uint64((1 << 59) - 1)
    return (
        _deinterleave_bits(c).astype(np.int64),
        _deinterleave_bits(c >> np.uint64(1)).astype(np.int64),
    )


def ij_to_cell(ix: np.ndarray, iy: np.ndarray, res: int) -> np.ndarray:
    morton = _interleave_bits(np.asarray(ix, np.uint64)) | (
        _interleave_bits(np.asarray(iy, np.uint64)) << np.uint64(1)
    )
    return (morton | (np.uint64(res) << np.uint64(59))).astype(np.int64)


def cell_bounds(cell: np.ndarray) -> np.ndarray:
    """(n, 4) array of [xmin, ymin, xmax, ymax] per cell."""
    cell = np.atleast_1d(np.asarray(cell, np.int64))
    res = cell_res(cell)
    ix, iy = cell_to_ij(cell)
    size = WORLD_SPAN / (1 << res).astype(np.float64)
    xmin = WORLD_X0 + ix * size
    ymin = WORLD_Y0 + iy * size
    return np.stack([xmin, ymin, xmin + size, ymin + size], axis=1)


def cell_parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Coarsen cells to `parent_res` (the H3 `cell_to_parent` analog)."""
    cell = np.asarray(cell, np.int64)
    res = cell_res(cell)
    if np.any(res < parent_res):
        raise ValueError("parent_res must be <= cell res")
    shift = (2 * (res - parent_res)).astype(np.uint64)
    morton = (cell.astype(np.uint64) & np.uint64((1 << 59) - 1)) >> shift
    return (morton | (np.uint64(parent_res) << np.uint64(59))).astype(np.int64)


def k_ring(cell: int, k: int = 1) -> np.ndarray:
    """All cells within Chebyshev distance k of `cell` (incl. itself) —
    the H3 kRing analog used for radius-capped kNN joins
    (reference: sjoin_nearest(max_distance=300), coastlines/vector.py:1228)."""
    res = int(cell_res(np.array([cell]))[0])
    n = 1 << res
    ix, iy = cell_to_ij(np.array([cell]))
    dx, dy = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1))
    jx = ix[0] + dx.ravel()
    jy = iy[0] + dy.ravel()
    ok = (jx >= 0) & (jx < n) & (jy >= 0) & (jy < n)
    return ij_to_cell(jx[ok], jy[ok], res)


def k_ring_batch(cells: np.ndarray, k: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized kRing for a batch of same-resolution cells.

    Returns (src_index, neighbor_cell) pairs, suitable for building an
    exploded neighbor table inside one Arrow UDF batch.
    """
    cells = np.asarray(cells, np.int64)
    if cells.size == 0:
        return np.array([], np.int64), np.array([], np.int64)
    res = int(cell_res(cells)[0])
    n = 1 << res
    ix, iy = cell_to_ij(cells)
    side = 2 * k + 1
    dx, dy = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1))
    jx = (ix[:, None] + dx.ravel()[None, :]).ravel()
    jy = (iy[:, None] + dy.ravel()[None, :]).ravel()
    src = np.repeat(np.arange(cells.size), side * side)
    ok = (jx >= 0) & (jx < n) & (jy >= 0) & (jy < n)
    return src[ok], ij_to_cell(jx[ok], jy[ok], res)


def polyfill_bbox(
    xmin: float, ymin: float, xmax: float, ymax: float, res: int
) -> np.ndarray:
    """All cells at `res` whose extent intersects the bbox (H3 polyfill
    analog, coarse stage of the cover join).

    Out-of-frame bboxes CLAMP to the nearest edge cell — the same rule
    xy_to_cell / cell_id_expr apply to points — never an empty cover.
    The clamp keeps the distributed cover joins semantically identical
    to their broadcast twins even for out-of-frame geometry: both
    sides of a candidate pair land in the same edge cell and the exact
    refine decides, instead of the polygon side silently vanishing
    while the point side clamps (which made the distributed
    orient_transects classify out-of-frame land as open water)."""
    if xmax < xmin or ymax < ymin:
        return np.array([], dtype=np.int64)
    n = 1 << res
    size = WORLD_SPAN / n
    i0 = min(n - 1, max(0, int((xmin - WORLD_X0) // size)))
    i1 = min(n - 1, max(0, int((xmax - WORLD_X0) // size)))
    j0 = min(n - 1, max(0, int((ymin - WORLD_Y0) // size)))
    j1 = min(n - 1, max(0, int((ymax - WORLD_Y0) // size)))
    ii, jj = np.meshgrid(np.arange(i0, i1 + 1), np.arange(j0, j1 + 1))
    return ij_to_cell(ii.ravel(), jj.ravel(), res)
