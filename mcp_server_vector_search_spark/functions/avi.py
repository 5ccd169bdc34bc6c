"""Minimal AVI (RIFF) MJPEG container — the VIDEO modality's format.

Motion-JPEG in an AVI container is the classic public video format
whose frames are independent baseline JPEGs (no inter-frame coding),
which makes it exactly implementable on top of functions/jpeg.py: the
writer emits a structurally correct RIFF file (LIST hdrl with
avih/strh/strf, LIST movi with one '00dc' chunk per frame, idx1), the
reader walks the movi list and hands each chunk to the JPEG decoder.

This replaces the repo's former deterministic video STAND-IN
(multimodal.sample_frames' digest frames) with a real
container + real per-frame codec; the stand-in remains for the
audio/video plumbing certificate it already serves.
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(four: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", four + body)


def encode_mjpeg_avi(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """AVI bytes for a list of baseline-JPEG frame payloads."""
    if not frames:
        raise ValueError("MJPEG AVI needs at least one frame")
    n = len(frames)
    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            1_000_000 // fps,  # microseconds per frame
            0,  # max bytes per sec (advisory)
            0,  # padding granularity
            0x10,  # flags: AVIF_HASINDEX
            n,  # total frames
            0,  # initial frames
            1,  # streams
            max(len(f) for f in frames),  # suggested buffer size
            width,
            height,
            0, 0, 0, 0,  # reserved
        ),
    )
    strh = _chunk(
        b"strh",
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4h",
            0, 0, 0,  # flags, priority, language, initial frames (packed)
            0,  # initial frames
            1,  # scale
            fps,  # rate
            0,  # start
            n,  # length
            max(len(f) for f in frames),
            0xFFFFFFFF,  # quality (default)
            0,  # sample size (varies)
            0, 0, width, height,  # rcFrame: RECT of four int16s
        ),
    )
    strf = _chunk(
        b"strf",
        struct.pack(
            "<IiiHH4sIiiII",
            40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0
        ),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))
    movi_chunks = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_chunks)
    # idx1: one entry per frame, offsets relative to the movi list body
    idx_entries, off = [], 4
    for f in frames:
        idx_entries.append(b"00dc" + struct.pack("<III", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_mjpeg_avi(payload: bytes) -> list[bytes]:
    """The JPEG frame payloads, in stream order, from an MJPEG AVI."""
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI ", "not an AVI"
    frames: list[bytes] = []

    def walk(data: bytes) -> None:
        pos = 0
        while pos + 8 <= len(data):
            fourcc = data[pos : pos + 4]
            (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body = data[pos + 8 : pos + 8 + clen]
            if fourcc == b"LIST":
                walk(body[4:])  # skip the list type tag
            elif fourcc in (b"00dc", b"00db"):
                frames.append(body)
            pos += 8 + clen + (clen & 1)

    walk(payload[12:])
    assert frames, "no video chunks found"
    return frames
