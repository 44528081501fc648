"""Marching-squares subpixel contour extraction (pure numpy).

Engine-native reimplementation of the semantics of the reference's
`subpixel_contours` (dea_tools wrapper over skimage.measure.find_contours,
called at coastlines/vector.py:1450-1456): linear-interpolated crossings
at a level, saddle disambiguation by cell-center mean, NaN cells skipped
(contours terminate at nodata), chains assembled deterministically.

Segment generation is vectorized over all active cells per case; only
the chain-stitching walk is per-segment Python (bounded by contour
length, not tile area).
"""

from __future__ import annotations

import numpy as np

# edge ids
_T, _B, _L, _R = 0, 1, 2, 3

# case -> list of (edge, edge) undirected segments; saddles (5, 10) handled
# separately via center test
_CASES: dict[int, list[tuple[int, int]]] = {
    1: [(_L, _B)], 14: [(_L, _B)],
    2: [(_B, _R)], 13: [(_B, _R)],
    4: [(_T, _R)], 11: [(_T, _R)],
    8: [(_T, _L)], 7: [(_T, _L)],
    3: [(_L, _R)], 12: [(_L, _R)],
    6: [(_T, _B)], 9: [(_T, _B)],
}


def _edge_points(rr, cc, ul, ur, ll, lr, level):
    """Subpixel crossing points on each cell edge; (row, col) coords."""
    with np.errstate(divide="ignore", invalid="ignore"):
        tT = (level - ul) / (ur - ul)
        tB = (level - ll) / (lr - ll)
        tL = (level - ul) / (ll - ul)
        tR = (level - ur) / (lr - ur)
    pts = np.empty((4, rr.size, 2))
    pts[_T, :, 0] = rr
    pts[_T, :, 1] = cc + tT
    pts[_B, :, 0] = rr + 1
    pts[_B, :, 1] = cc + tB
    pts[_L, :, 0] = rr + tL
    pts[_L, :, 1] = cc
    pts[_R, :, 0] = rr + tR
    pts[_R, :, 1] = cc + 1
    return pts


def contour_segments(a: np.ndarray, level: float = 0.0) -> np.ndarray:
    """All undirected contour segments of `a` at `level` as an (n, 2, 2)
    array of ((r0, c0), (r1, c1))."""
    a = np.asarray(a, np.float64)
    ul = a[:-1, :-1]
    ur = a[:-1, 1:]
    ll = a[1:, :-1]
    lr = a[1:, 1:]
    valid = ~(np.isnan(ul) | np.isnan(ur) | np.isnan(ll) | np.isnan(lr))
    case = (
        (ul > level).astype(np.int8) * 8
        + (ur > level).astype(np.int8) * 4
        + (lr > level).astype(np.int8) * 2
        + (ll > level).astype(np.int8)
    )
    case[~valid] = 0
    segs = []
    for cs, pairs in _CASES.items():
        rr, cc = np.nonzero(case == cs)
        if rr.size == 0:
            continue
        pts = _edge_points(
            rr.astype(np.float64), cc.astype(np.float64),
            ul[rr, cc], ur[rr, cc], ll[rr, cc], lr[rr, cc], level,
        )
        for e0, e1 in pairs:
            segs.append(np.stack([pts[e0], pts[e1]], axis=1))
    # saddles: center mean decides connectivity
    for cs, above_corners in ((5, (_T, _R, _L, _B)), (10, (_T, _L, _B, _R))):
        rr, cc = np.nonzero(case == cs)
        if rr.size == 0:
            continue
        vul, vur, vll, vlr = ul[rr, cc], ur[rr, cc], ll[rr, cc], lr[rr, cc]
        center_above = (vul + vur + vll + vlr) / 4.0 > level
        pts = _edge_points(rr.astype(np.float64), cc.astype(np.float64), vul, vur, vll, vlr, level)
        if cs == 5:  # ur & ll above
            # center above: (T,L)+(B,R); center below: (T,R)+(L,B)
            for mask, pairs in ((center_above, [(_T, _L), (_B, _R)]),
                                (~center_above, [(_T, _R), (_L, _B)])):
                idx = np.nonzero(mask)[0]
                for e0, e1 in pairs:
                    if idx.size:
                        segs.append(np.stack([pts[e0, idx], pts[e1, idx]], axis=1))
        else:  # 10: ul & lr above
            for mask, pairs in ((center_above, [(_T, _R), (_L, _B)]),
                                (~center_above, [(_T, _L), (_B, _R)])):
                idx = np.nonzero(mask)[0]
                for e0, e1 in pairs:
                    if idx.size:
                        segs.append(np.stack([pts[e0, idx], pts[e1, idx]], axis=1))
    if not segs:
        return np.zeros((0, 2, 2))
    return np.concatenate(segs, axis=0)


def _key(p, decimals=6):
    return (round(float(p[0]), decimals), round(float(p[1]), decimals))


def stitch_segments(segs: np.ndarray) -> list[np.ndarray]:
    """Assemble undirected segments into polylines (open chains first from
    degree-1 endpoints, then closed loops). Deterministic: seeds are
    visited in sorted endpoint-key order."""
    if len(segs) == 0:
        return []
    adj: dict[tuple, list[tuple[int, int]]] = {}
    for i, seg in enumerate(segs):
        for end in (0, 1):
            adj.setdefault(_key(seg[end]), []).append((i, end))
    used = np.zeros(len(segs), bool)
    chains: list[np.ndarray] = []

    def walk(seg_i: int, start_end: int) -> list[tuple]:
        pts = [_key(segs[seg_i][start_end]), _key(segs[seg_i][1 - start_end])]
        used[seg_i] = True
        while True:
            cands = [
                (j, e) for j, e in adj.get(pts[-1], []) if not used[j]
            ]
            if not cands:
                return pts
            j, e = min(cands)
            used[j] = True
            pts.append(_key(segs[j][1 - e]))

    # open chains: endpoints with odd degree
    seeds = sorted(k for k, v in adj.items() if len(v) % 2 == 1)
    for k in seeds:
        for j, e in sorted(adj[k]):
            if not used[j]:
                chains.append(np.array(walk(j, e)))
    # closed loops from whatever remains
    for k in sorted(adj.keys()):
        for j, e in sorted(adj[k]):
            if not used[j]:
                chains.append(np.array(walk(j, e)))
    return chains


def find_contours(a: np.ndarray, level: float = 0.0, min_vertices: int = 1) -> list[np.ndarray]:
    """Contours of `a` at `level` as (n, 2) arrays of (row, col), subpixel.

    min_vertices mirrors the reference's `min_vertices=10` filter
    (coastlines/vector.py:1452).
    """
    chains = stitch_segments(contour_segments(a, level))
    return [c for c in chains if len(c) >= min_vertices]
