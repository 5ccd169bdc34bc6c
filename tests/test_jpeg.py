"""Baseline JPEG codec: bitstream structure, roundtrip-vs-prediction
exactness (which certifies the entropy layer), lossy error bounds, and
the mixed-format dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from mcp_server_vector_search_spark.functions.jpeg import (
    AC_BITS,
    AC_VALS,
    DC_BITS,
    decode_jpeg,
    encode_jpeg,
    predict_decoded,
)
from mcp_server_vector_search_spark.functions.pgm import decode_pgm, encode_pgm
from mcp_server_vector_search_spark.sources.multimodal import (
    decode_any,
    doc_format,
    synthetic_image,
)


def test_jpeg_marker_structure():
    """SOI, DQT, SOF0, two DHTs, SOS, EOI — a spec-shaped baseline
    file any standard decoder would accept."""
    payload = encode_jpeg(synthetic_image(7))
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in payload
    # SOF0 carries the true dimensions
    i = payload.index(b"\xff\xc0")
    h = int.from_bytes(payload[i + 5 : i + 7], "big")
    w = int.from_bytes(payload[i + 7 : i + 9], "big")
    img = synthetic_image(7)
    assert (h, w) == img.shape
    # standard Annex K Huffman tables are emitted verbatim
    assert bytes(DC_BITS) in payload and bytes(AC_BITS) in payload
    assert bytes(AC_VALS) in payload


@pytest.mark.parametrize("doc_id", [0, 1, 5, 13, 17, 38, 221])
def test_jpeg_roundtrip_equals_prediction(doc_id):
    """decode(encode(x)) must equal the closed-form transform
    prediction EXACTLY — the bitstream (zigzag, DC prediction, Huffman,
    byte stuffing) is lossless, so any discrepancy is an entropy-layer
    bug."""
    img = synthetic_image(doc_id)
    dec = decode_jpeg(encode_jpeg(img))
    assert dec.shape == img.shape
    assert np.array_equal(dec, predict_decoded(img))


def test_jpeg_is_lossy_but_bounded_on_smooth_content():
    x = np.linspace(0, 6, 40)[None, :]
    y = np.linspace(0, 5, 32)[:, None]
    img = np.clip(128 + 60 * np.cos(x) * np.cos(y), 0, 255).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert 0 < err.max() <= 12  # lossy, but within quantization scale


def test_jpeg_byte_stuffing_roundtrips():
    """A flat 255 image maximizes 0xFF-prone entropy bytes; the decode
    must unstuff them transparently."""
    img = np.full((24, 24), 255, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img))
    assert np.array_equal(dec, predict_decoded(img))


def test_pgm_roundtrip_exact():
    img = synthetic_image(4)
    assert np.array_equal(decode_pgm(encode_pgm(img)), img)


def test_decode_any_dispatch():
    for d in range(6):
        img = synthetic_image(d)
        fmt = doc_format(d)
        from mcp_server_vector_search_spark.sources.multimodal import encode_any

        payload = encode_any(img, fmt, d)
        dec = decode_any(payload)
        if fmt == "jpeg":
            assert np.array_equal(dec, predict_decoded(img))
        else:
            assert np.array_equal(dec, img)
    with pytest.raises(ValueError):
        decode_any(b"\x00\x01\x02\x03garbage")


def test_jpeg_rejects_rgb():
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((16, 16, 3), dtype=np.uint8))


def test_wav_header_fields():
    import struct

    from mcp_server_vector_search_spark.functions.wav import encode_wav

    payload = encode_wav(synthetic_audio_ref(3), 8000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    fmt_at = payload.index(b"fmt ")
    _, fmt, ch, rate = struct.unpack("<IHHI", payload[fmt_at + 4 : fmt_at + 16])
    assert (fmt, ch, rate) == (1, 1, 8000)


def synthetic_audio_ref(d):
    from mcp_server_vector_search_spark.sources.multimodal import synthetic_audio

    return synthetic_audio(d)


def test_wav_decode_skips_extra_chunks():
    """Real-world WAVs carry LIST/INFO chunks between fmt and data;
    the chunk walker must skip them (word-aligned) instead of assuming
    the canonical 44-byte layout."""
    import struct

    import numpy as np

    from mcp_server_vector_search_spark.functions.wav import (
        decode_wav,
        encode_wav,
    )

    s = synthetic_audio_ref(5)
    canonical = encode_wav(s, 8000)
    fmt_chunk = canonical[12:36]
    data_chunk = canonical[36:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd len, padded
    patched = (
        b"RIFF"
        + struct.pack("<I", 4 + len(fmt_chunk) + len(extra) + len(data_chunk))
        + b"WAVE"
        + fmt_chunk
        + extra
        + data_chunk
    )
    s2, rate = decode_wav(patched)
    assert rate == 8000 and np.array_equal(s, s2)


def test_mjpeg_avi_container_roundtrip():
    from mcp_server_vector_search_spark.functions.avi import (
        decode_mjpeg_avi,
        encode_mjpeg_avi,
    )
    from mcp_server_vector_search_spark.sources.multimodal import (
        synthetic_frame,
        video_frame_count,
    )

    d = 11
    frames = [
        encode_jpeg(synthetic_frame(d, k)) for k in range(video_frame_count(d))
    ]
    img = synthetic_frame(d, 0)
    avi = encode_mjpeg_avi(frames, img.shape[1], img.shape[0])
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    for tag in (b"LIST", b"hdrl", b"movi", b"idx1", b"MJPG", b"00dc"):
        assert tag in avi
    out = decode_mjpeg_avi(avi)
    assert out == frames  # byte-exact frame payloads, in order
    # and each frame decodes to the predicted pixels
    for k, fb in enumerate(out):
        assert np.array_equal(
            decode_jpeg(fb), predict_decoded(synthetic_frame(d, k))
        )
