"""Vectorized geohash encoder (pure numpy).

Parity target: the reference's point uids — `gh.encode(y, x, precision=10)`
at coastlines/vector.py:1590-1595 and precision 11 at
coastlines/continental.py:326-331. Standard geohash base32 alphabet,
lon-first bit interleave.
"""

from __future__ import annotations

import numpy as np

_B32 = np.frombuffer(b"0123456789bcdefghjkmnpqrstuvwxyz", dtype=np.uint8)


def geohash_encode(lat: np.ndarray, lon: np.ndarray, precision: int = 10) -> np.ndarray:
    """Vectorized geohash of (lat, lon) degree arrays -> array of str."""
    lat = np.asarray(lat, np.float64)
    lon = np.asarray(lon, np.float64)
    nbits = precision * 5
    lon_bits = (nbits + 1) // 2  # even positions, lon first
    lat_bits = nbits // 2

    def _quantize(v, lo, hi, bits):
        frac = (v - lo) / (hi - lo)
        q = np.floor(frac * (1 << bits)).astype(np.uint64)
        return np.clip(q, 0, (1 << bits) - 1)

    qlon = _quantize(lon, -180.0, 180.0, lon_bits)
    qlat = _quantize(lat, -90.0, 90.0, lat_bits)

    # interleave: bit 0 (MSB of the hash) is lon's MSB
    out_bits = np.zeros((lat.size, nbits), dtype=np.uint8)
    for b in range(lon_bits):
        out_bits[:, 2 * b] = ((qlon >> np.uint64(lon_bits - 1 - b)) & np.uint64(1)).astype(np.uint8)
    for b in range(lat_bits):
        out_bits[:, 2 * b + 1] = ((qlat >> np.uint64(lat_bits - 1 - b)) & np.uint64(1)).astype(np.uint8)

    chars = np.zeros((lat.size, precision), dtype=np.uint8)
    for c in range(precision):
        v = (
            (out_bits[:, 5 * c].astype(np.int64) << 4)
            | (out_bits[:, 5 * c + 1].astype(np.int64) << 3)
            | (out_bits[:, 5 * c + 2].astype(np.int64) << 2)
            | (out_bits[:, 5 * c + 3].astype(np.int64) << 1)
            | out_bits[:, 5 * c + 4].astype(np.int64)
        )
        chars[:, c] = _B32[v]
    return chars.view(f"S{precision}").ravel().astype(str)
