"""Pure-stdlib WAV (RIFF PCM16) codec — the audio modality's container.

Canonical 44-byte RIFF/WAVE header + little-endian signed 16-bit PCM
samples, per the public WAVE format spec.  Mono only (the corpus
model); any standard audio tool reads these files.  Lossless, so the
audio feature operators stay closed-form certifiable: the SQL oracle
recomputes frame energies and zero-crossing counts straight from the
synthetic waveform model while the Spark side parses real bytes.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Mono PCM16 WAV bytes for an int16 sample array."""
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError(
            f"encode_wav expects 1-D int16 samples, got {samples.shape} {samples.dtype}"
        )
    data = samples.tobytes()
    header = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return header + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """(int16 samples, sample rate) from mono PCM16 WAV bytes.  Walks
    RIFF chunks properly (fmt may be followed by non-data chunks)."""
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE", "not a WAV"
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            assert fmt == 1 and channels == 1 and bits == 16, "mono PCM16 only"
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    assert rate is not None and samples is not None, "missing fmt/data chunk"
    return samples, rate
