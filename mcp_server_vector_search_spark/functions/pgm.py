"""Binary PGM (netpbm P5) codec — the uncompressed second format.

A real, public format (netpbm spec): ``P5\\n<w> <h>\\n255\\n`` followed
by raw row-major bytes.  Lossless, so PGM documents keep the exact
closed-form pixel model through the multimodal certificates; its role
in the mixed-format corpus is proving the decode-dispatch seam
(sources/multimodal.decode_any) with a second container, while JPEG
proves the lossy-codec path.
"""

from __future__ import annotations

import numpy as np


def encode_pgm(arr: np.ndarray) -> bytes:
    if arr.ndim != 2 or arr.dtype != np.uint8:
        raise ValueError(f"encode_pgm expects 2-D uint8, got {arr.shape}")
    h, w = arr.shape
    return f"P5\n{w} {h}\n255\n".encode() + arr.tobytes()


def decode_pgm(payload: bytes) -> np.ndarray:
    assert payload[:2] == b"P5", "not a binary PGM"
    # header = three whitespace-separated tokens after the magic
    parts = payload.split(b"\n", 3)
    w, h = (int(t) for t in parts[1].split())
    assert parts[2] == b"255", "only 8-bit PGM"
    data = parts[3]
    assert len(data) == w * h, "truncated PGM payload"
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w)
