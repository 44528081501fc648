"""Connected-component labeling + derived ops (pure numpy union-find).

Replaces skimage.measure.label / regionprops / rasterio sieve in the
reference (coastlines/vector.py:188,194-196,285-297,330,592). Run-based
two-pass labeling: rows are split into runs (vectorized), runs are
union-found against overlapping runs of the previous row.
"""

from __future__ import annotations

import numpy as np


def label(mask: np.ndarray, connectivity: int = 2) -> tuple[np.ndarray, int]:
    """Label connected components of a boolean mask.

    connectivity: 1 = 4-neighbor, 2 = 8-neighbor (skimage default 2).
    Returns (labels int32 array with 0 background, n_labels).
    """
    mask = np.asarray(mask, bool)
    h, w = mask.shape
    labels = np.zeros((h, w), np.int32)
    # runs per row
    padded = np.concatenate([np.zeros((h, 1), bool), mask, np.zeros((h, 1), bool)], axis=1)
    diff = np.diff(padded.astype(np.int8), axis=1)
    run_rows: list[tuple[int, int, int, int]] = []  # (row, start, end, run_id)
    next_id = 1
    prev_runs: list[tuple[int, int, int]] = []
    parent_list = [0]
    for r in range(h):
        starts = np.nonzero(diff[r] == 1)[0]
        ends = np.nonzero(diff[r] == -1)[0]
        cur_runs = []
        for s, e in zip(starts, ends):
            rid = next_id
            next_id += 1
            parent_list.append(rid)
            # union with overlapping runs in previous row
            pad = 1 if connectivity == 2 else 0
            for ps, pe, pid in prev_runs:
                if ps < e + pad and pe > s - pad:
                    # union(rid, pid)
                    ra, rb = _find_l(parent_list, rid), _find_l(parent_list, pid)
                    if ra != rb:
                        parent_list[max(ra, rb)] = min(ra, rb)
            cur_runs.append((s, e, rid))
            run_rows.append((r, s, e, rid))
        prev_runs = cur_runs
    # resolve roots and compact label ids
    roots = np.array([_find_l(parent_list, i) for i in range(next_id)], np.int64)
    uniq = np.unique(roots[1:]) if next_id > 1 else np.array([], np.int64)
    remap = np.zeros(next_id, np.int32)
    remap[uniq] = np.arange(1, len(uniq) + 1, dtype=np.int32)
    for r, s, e, rid in run_rows:
        labels[r, s:e] = remap[roots[rid]]
    return labels, int(len(uniq))


def _find_l(parent: list[int], i: int) -> int:
    root = i
    while parent[root] != root:
        root = parent[root]
    while parent[i] != root:
        parent[i], i = root, parent[i]
    return root


def region_max_intensity(labels: np.ndarray, intensity: np.ndarray, n: int) -> np.ndarray:
    """Max intensity per label 1..n (regionprops max_intensity analog,
    coastlines/vector.py:194-196). NaNs ignored."""
    out = np.full(n + 1, -np.inf)
    flat_l = labels.ravel()
    flat_i = np.where(np.isnan(intensity), -np.inf, intensity).ravel()
    np.maximum.at(out, flat_l, flat_i)
    return out


def region_sizes(labels: np.ndarray, n: int) -> np.ndarray:
    return np.bincount(labels.ravel(), minlength=n + 1)


def sieve(mask: np.ndarray, min_size: int, connectivity: int = 2) -> np.ndarray:
    """Drop components smaller than min_size (rasterio sieve analog,
    coastlines/vector.py:330,592)."""
    labels, n = label(mask, connectivity)
    if n == 0:
        return mask.copy()
    sizes = region_sizes(labels, n)
    keep = sizes >= min_size
    keep[0] = False
    return keep[labels]


def keep_touching(mask: np.ndarray, seed: np.ndarray, connectivity: int = 2) -> np.ndarray:
    """Keep components of `mask` that intersect `seed` (the ocean/
    temporal-connectivity test, coastlines/vector.py:184-196,285-297)."""
    labels, n = label(mask, connectivity)
    if n == 0:
        return np.zeros_like(mask, dtype=bool)
    hit = region_max_intensity(labels, seed.astype(np.float64), n) > 0
    hit[0] = False
    return hit[labels]


def edge_connected(mask: np.ndarray, connectivity: int = 2) -> np.ndarray:
    """Components touching the array edge (ocean-from-boundary seed)."""
    seed = np.zeros_like(mask, bool)
    seed[0, :] = seed[-1, :] = True
    seed[:, 0] = seed[:, -1] = True
    return keep_touching(mask, seed & mask, connectivity)
