"""Pure-numpy/stdlib WAV (RIFF PCM) codec.

Closes the audio leg of the multimodal contract from the format spec
directly — PCM needs no codec library, only RIFF chunk framing and
integer scaling. Supports 16-bit PCM, mono or interleaved stereo,
arbitrary sample rate; the decoder walks RIFF chunks (tolerates
LIST/fact/extra chunks) and returns float32 in [-1, 1].
"""

from __future__ import annotations

import struct

import numpy as np


def encode_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) mono or (n, ch) float array in [-1, 1] -> 16-bit PCM WAV."""
    x = np.asarray(samples, np.float64)
    if x.ndim == 1:
        x = x[:, None]
    if x.ndim != 2 or x.shape[1] not in (1, 2):
        raise ValueError("expected (n,) or (n, 1|2) samples")
    q = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    data = q.reshape(-1).tobytes()
    n_ch = x.shape[1]
    byte_rate = sample_rate * n_ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, byte_rate, n_ch * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_pcm16(buf: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 (n, ch) in [-1, 1], sample_rate)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    n_ch = rate = None
    data = None
    while pos + 8 <= len(buf):
        tag = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        payload = buf[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            audio_fmt, n_ch, rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[:16]
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only 16-bit PCM supported")
        elif tag == b"data":
            data = payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if n_ch is None or data is None:
        raise ValueError("missing fmt/data chunk")
    q = np.frombuffer(data, dtype="<i2")
    q = q[: (len(q) // n_ch) * n_ch].reshape(-1, n_ch)
    return (q.astype(np.float32) / 32767.0), int(rate)
