"""Minimal baseline-TIFF codec for float32 single-band tiles.

Implements the subset of TIFF 6.0 the engine needs: single strip,
uncompressed, 32-bit IEEE-float grayscale, little-endian — the same
logical content as the reference's float32 GeoTIFF composites
(coastlines/raster.py:379-400) minus geo-tags, which this engine
carries in the `caption` JSON column instead.
"""

from __future__ import annotations

import struct

import numpy as np

# tag ids
_W, _H, _BPS, _COMP, _PHOTO, _STRIPOFF, _SPP, _ROWS, _STRIPCNT, _SFMT = (
    256, 257, 258, 259, 262, 273, 277, 278, 279, 339,
)


def encode_f32(img: np.ndarray) -> bytes:
    if img.ndim != 2:
        raise ValueError(f"expected 2-D array, got shape {img.shape}")
    h, w = img.shape
    pix = np.ascontiguousarray(img.astype("<f4")).tobytes()
    entries = [
        (_W, 3, 1, w),
        (_H, 3, 1, h),
        (_BPS, 3, 1, 32),
        (_COMP, 3, 1, 1),       # none
        (_PHOTO, 3, 1, 1),      # BlackIsZero
        (_STRIPOFF, 4, 1, 0),   # patched below
        (_SPP, 3, 1, 1),
        (_ROWS, 3, 1, h),
        (_STRIPCNT, 4, 1, len(pix)),
        (_SFMT, 3, 1, 3),       # IEEE float
    ]
    ifd_offset = 8
    data_offset = ifd_offset + 2 + 12 * len(entries) + 4
    out = [struct.pack("<2sHI", b"II", 42, ifd_offset), struct.pack("<H", len(entries))]
    for tag, typ, cnt, val in entries:
        if tag == _STRIPOFF:
            val = data_offset
        out.append(struct.pack("<HHII", tag, typ, cnt, val))
    out.append(struct.pack("<I", 0))  # next IFD
    out.append(pix)
    return b"".join(out)


def decode_f32(buf: bytes) -> np.ndarray:
    if buf[:4] != b"II*\x00":
        raise ValueError("not a little-endian TIFF")
    (ifd_offset,) = struct.unpack_from("<I", buf, 4)
    (n,) = struct.unpack_from("<H", buf, ifd_offset)
    tags: dict[int, int] = {}
    for i in range(n):
        tag, typ, cnt, val = struct.unpack_from("<HHII", buf, ifd_offset + 2 + 12 * i)
        if typ == 3:  # SHORT packed in low bytes
            val &= 0xFFFF
        tags[tag] = val
    w, h = tags[_W], tags[_H]
    if tags.get(_BPS, 32) != 32 or tags.get(_SFMT, 3) != 3 or tags.get(_COMP, 1) != 1:
        raise ValueError("only uncompressed float32 TIFF supported")
    off, cnt = tags[_STRIPOFF], tags[_STRIPCNT]
    return np.frombuffer(buf[off : off + cnt], dtype="<f4").reshape(h, w).copy()
