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


def test_fdct_layout_matches_spec():
    """T.81 orientation known-answer (ADVICE r7): a block varying only
    HORIZONTALLY as cos((2x+1)·1·π/16) concentrates all AC energy in
    S[v=0][u=1], which serializes at ZIGZAG INDEX 1 — the bug class
    this guards produced a spatially transposed image for every
    standard decoder while all same-convention roundtrips stayed
    green."""
    import math

    from mcp_server_vector_search_spark.functions.jpeg import (
        FDCT_DEN,
        ZIGZAG,
        _JCOS_NP,
        quantize,
    )

    x = np.arange(8)
    horiz = np.round(128 + 100 * np.cos(np.pi * (2 * x + 1) / 16)).astype(
        np.int64
    )
    block = np.tile(horiz, (8, 1))  # varies along columns, constant down rows
    q = quantize(_JCOS_NP @ (block - 128) @ _JCOS_NP.T)
    zz = [int(q[r, c]) for (r, c) in ZIGZAG]
    assert zz[1] != 0, "horizontal frequency must land at zigzag index 1"
    assert all(v == 0 for i, v in enumerate(zz) if i not in (0, 1)), zz[:6]
    # full-layout cross-check against the spec's float FDCT formula
    rng = np.random.default_rng(7)
    b = rng.integers(-128, 128, (8, 8)).astype(np.int64)
    fi = (_JCOS_NP @ b @ _JCOS_NP.T) / FDCT_DEN

    def spec_S(v, u):
        c = lambda k: 1 / math.sqrt(2) if k == 0 else 1.0  # noqa: E731
        return (
            0.25
            * c(u)
            * c(v)
            * sum(
                b[y][x]
                * math.cos((2 * x + 1) * u * math.pi / 16)
                * math.cos((2 * y + 1) * v * math.pi / 16)
                for x in range(8)
                for y in range(8)
            )
        )

    err = max(abs(fi[v, u] - spec_S(v, u)) for v in range(8) for u in range(8))
    assert err < 0.5  # integer-table rounding only


@pytest.mark.parametrize("interval", [1, 2, 3, 5])
def test_jpeg_restart_markers_roundtrip(interval):
    """DRI + RSTn streams (the structure real encoders emit for error
    resilience): byte-aligned restarts, modulo-8 marker counter, DC
    predictor reset per segment — decode must recover the exact
    no-restart prediction."""
    img = synthetic_image(38)  # multiple MCU rows and columns
    payload = encode_jpeg(img, restart_interval=interval)
    assert b"\xff\xdd" in payload  # DRI present
    assert b"\xff\xd0" in payload  # at least one RST0
    assert np.array_equal(decode_jpeg(payload), predict_decoded(img))


def test_jpeg_pil_interop():
    """When PIL is available, a real libjpeg decoder must read our
    bitstream and agree with decode_jpeg within the T.81 Annex A
    IDCT tolerance (±1 per pixel after the shared dequantized
    coefficients); skipped where PIL is absent."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    img = synthetic_image(17)
    payload = encode_jpeg(img, restart_interval=3)
    pil_dec = np.asarray(PIL.open(io.BytesIO(payload)).convert("L"))
    ours = decode_jpeg(payload)
    assert pil_dec.shape == ours.shape
    err = np.abs(pil_dec.astype(int) - ours.astype(int))
    assert err.max() <= 2, f"IDCT variance beyond spec tolerance: {err.max()}"


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


def test_jpeg_fill_bytes_before_marker():
    """B.1.1.2 allows any number of 0xFF fill bytes before a marker;
    the header walk must skip them without losing sync."""
    img = synthetic_image(5)
    payload = encode_jpeg(img)
    i = payload.index(b"\xff\xdb")  # first DQT
    stuffed = payload[:i] + b"\xff\xff\xff" + payload[i:]
    assert np.array_equal(decode_jpeg(stuffed), predict_decoded(img))


def test_scan_segment_split_rejects_stray_marker():
    from mcp_server_vector_search_spark.functions.jpeg import (
        _split_restart_segments,
    )

    import pytest as _pytest

    with _pytest.raises(ValueError):
        _split_restart_segments(b"\x12\xff\xc4\x00")  # DHT inside scan
    # stuffing stays inside, RSTs split
    segs = _split_restart_segments(b"\x01\xff\x00\x02\xff\xd0\x03\x04")
    assert segs == [b"\x01\xff\x00\x02", b"\x03\x04"]
