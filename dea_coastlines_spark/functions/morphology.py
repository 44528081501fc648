"""Binary + grayscale morphology with disk structuring elements
(pure numpy, shift-stack implementation).

Replaces the skimage/odc morphology calls in the reference:
binary_dilation/erosion/closing/opening with disk SE
(coastlines/raster.py:93-94; coastlines/vector.py:202,239-241,598-602,
617,621), grayscale dilation (vector.py:334), black tophat
(vector.py:593). Kernels run per tile inside Arrow UDFs; tiles carry a
halo >= SE radius so results are seamless (raster.py:547,684-689).
"""

from __future__ import annotations

import numpy as np


def disk_offsets(radius: int) -> np.ndarray:
    """(k, 2) integer offsets of a disk SE (same shape as skimage disk)."""
    r = int(radius)
    dy, dx = np.mgrid[-r : r + 1, -r : r + 1]
    keep = dy * dy + dx * dx <= r * r
    return np.stack([dy[keep], dx[keep]], axis=1)


def _shift_reduce(a: np.ndarray, offsets: np.ndarray, op: str, pad_val) -> np.ndarray:
    """Apply max/min over the SE by shifting padded copies (vectorized)."""
    r = int(np.abs(offsets).max()) if len(offsets) else 0
    padded = np.pad(a, r, mode="constant", constant_values=pad_val)
    h, w = a.shape
    out = None
    for dy, dx in offsets:
        view = padded[r + dy : r + dy + h, r + dx : r + dx + w]
        if out is None:
            out = view.copy()
        elif op == "max":
            np.maximum(out, view, out=out)
        else:
            np.minimum(out, view, out=out)
    return out


def dilate(a: np.ndarray, radius: int) -> np.ndarray:
    """Grayscale/binary dilation by a disk."""
    if a.dtype == bool:
        return _shift_reduce(a, disk_offsets(radius), "max", False)
    return _shift_reduce(a, disk_offsets(radius), "max", -np.inf)


def erode(a: np.ndarray, radius: int) -> np.ndarray:
    if a.dtype == bool:
        return _shift_reduce(a, disk_offsets(radius), "min", True)
    return _shift_reduce(a, disk_offsets(radius), "min", np.inf)


def closing(a: np.ndarray, radius: int) -> np.ndarray:
    return erode(dilate(a, radius), radius)


def opening(a: np.ndarray, radius: int) -> np.ndarray:
    return dilate(erode(a, radius), radius)


def black_tophat(a: np.ndarray, radius: int) -> np.ndarray:
    """closing(a) - a: bright response on thin dark features (the river/
    stream detector, coastlines/vector.py:593)."""
    return closing(a, radius) - a
