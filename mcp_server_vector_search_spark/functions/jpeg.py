"""Pure-stdlib baseline JPEG codec (greyscale, spec-compliant bitstream).

The second REAL image format next to functions/png.py (VERDICT r6
task 5: "real multimodal parquet is mostly JPEG").  Implemented from
the public JPEG specification (ITU-T T.81 / ISO 10918-1): baseline
sequential DCT, 8-bit, single luminance component (no chroma
subsampling), standard Annex K luminance quantization + Huffman
tables, proper marker structure (SOI/DQT/SOF0/DHT/SOS/EOI) and 0xFF
byte stuffing.  Any standard decoder reads these files; pixel values
may differ by the spec-tolerated IDCT variance (T.81 Annex A allows
implementation-defined IDCT precision).

INTEGER TRANSFORM DISCIPLINE: both the forward and inverse DCT run in
exact int64 arithmetic over a shared 2^13-scaled cosine table, with
symmetric round-half-away-from-zero division (computed on absolute
values, so Python floor-div and DuckDB trunc-div agree).  Decoded
pixels are therefore a CLOSED-FORM integer function of the source
image — the SQL oracle replays pad → FDCT → quantize → dequantize →
IDCT → clamp → crop and predicts every decoded pixel, while the Spark
side gets them by actually parsing the bitstream (markers, Huffman,
zigzag, DC prediction, byte unstuffing).  A wrong bit anywhere in the
entropy layer breaks the value hash.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# ---------------------------------------------------------------------------
# Shared integer transform constants (folded into the SQL oracle too)
# ---------------------------------------------------------------------------

JCOS_SCALE = 1 << 13
# JCOS[u][x] = round( (c(u)/2) * cos(pi*(2x+1)*u/16) * 2^13 ), c(0)=1/sqrt(2):
# the orthonormal-DCT basis with the 1/4 block normalization folded in.
# With b[y, x] (row = y vertical, col = x horizontal),
#   (J @ b @ J.T)[v, u] = sum_{x,y} JCOS[v][y] * JCOS[u][x] * b[y, x]
#                       ~= S[v][u] * 2^26,
# the T.81 coefficient layout (first index vertical frequency v, second
# horizontal u) that ZIGZAG and the Annex K quant table assume.
JCOS = [
    [
        round(
            (1.0 / math.sqrt(2.0) if u == 0 else 1.0)
            / 2.0
            * math.cos(math.pi * (2 * x + 1) * u / 16.0)
            * JCOS_SCALE
        )
        for x in range(8)
    ]
    for u in range(8)
]
_JCOS_NP = np.asarray(JCOS, dtype=np.int64)
FDCT_DEN = JCOS_SCALE * JCOS_SCALE  # 2^26: the scale both transforms carry

# Annex K Table K.1 luminance quantization (quality 50) — the canonical
# public table.
QTABLE = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_Q_NP = np.asarray(QTABLE, dtype=np.int64).reshape(8, 8)

# Zigzag scan order: ZIGZAG[i] = (row, col) index pair of the i-th
# coefficient in the S[v][u] layout — index 1 is (0, 1), the first
# HORIZONTAL frequency, per T.81 Figure 5.
def _zigzag_order() -> list[tuple[int, int]]:
    order = []
    for s in range(15):
        idx = [(s - j, j) for j in range(s + 1) if s - j < 8 and j < 8]
        order.extend(idx if s % 2 == 0 else idx[::-1])
    return order


ZIGZAG = _zigzag_order()

# Annex K Tables K.3/K.5: standard luminance DC and AC Huffman tables
# (BITS = code-length histogram, HUFFVAL = symbols in code order).
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 Annex C code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _build_codes(DC_BITS, DC_VALS)
_AC_CODES = _build_codes(AC_BITS, AC_VALS)


def _decode_tables(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the decoder-side view."""
    return {(ln, c): s for s, (c, ln) in _build_codes(bits, vals).items()}


_DC_DECODE = _decode_tables(DC_BITS, DC_VALS)
_AC_DECODE = _decode_tables(AC_BITS, AC_VALS)


def round_div(a: np.ndarray | int, d: int):
    """Round-half-away-from-zero integer division, computed on the
    absolute value so Python (floor) and DuckDB (trunc) agree:
    sign(a) * ((|a| + d//2) // d)."""
    if isinstance(a, np.ndarray):
        return np.sign(a) * ((np.abs(a) + d // 2) // d)
    s = -1 if a < 0 else 1
    return s * ((abs(a) + d // 2) // d)


def pad_replicate(arr: np.ndarray) -> np.ndarray:
    """Pad to 8-multiples by edge replication (the conventional JPEG
    MCU fill; keeps block DCTs free of synthetic edges)."""
    h, w = arr.shape
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    ys = np.minimum(np.arange(H), h - 1)
    xs = np.minimum(np.arange(W), w - 1)
    return arr[np.ix_(ys, xs)]


def quantize(f_scaled: np.ndarray) -> np.ndarray:
    return np.sign(f_scaled) * (
        (np.abs(f_scaled) + (_Q_NP * FDCT_DEN) // 2) // (_Q_NP * FDCT_DEN)
    )


def dequant_idct(q: np.ndarray) -> np.ndarray:
    """Dequantize and integer IDCT back to clamped uint8 pixels."""
    c = q * _Q_NP  # dequantized coefficients, S[v][u] layout (integer)
    # (J.T @ c @ J)[y, x] = sum_{u,v} JCOS[v][y] * JCOS[u][x] * c[v, u]
    # — spatial [y, x] directly, the inverse of J @ b @ J.T.
    s = _JCOS_NP.T @ c @ _JCOS_NP
    p = round_div(s, FDCT_DEN) + 128
    return np.clip(p, 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (B.1.1.5)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (B.1.1.5) — required
        before emitting a restart marker."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def emit_marker(self, marker: int) -> None:
        """Append a standalone marker (e.g. RSTn) to the byte-aligned
        stream — marker bytes are never stuffed."""
        self.align()
        self.out += bytes([0xFF, marker & 0xFF])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def _amplitude_bits(v: int, cat: int) -> int:
    """One's-complement amplitude encoding (F.1.2.1)."""
    return v if v >= 0 else v + (1 << cat) - 1


def encode_jpeg(arr: np.ndarray, restart_interval: int = 0) -> bytes:
    """Baseline greyscale JPEG bytes for a uint8 (h, w) array.

    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    every N MCUs (byte-aligned, DC predictor reset) — the structure
    real encoders produce for error resilience, and the decode path's
    restart handling is tested against it."""
    if arr.ndim != 2:
        raise ValueError(f"encode_jpeg expects 2-D greyscale, got {arr.shape}")
    h, w = arr.shape
    padded = pad_replicate(arr)
    bw = _BitWriter()
    prev_dc = 0
    mcu = 0
    rst = 0
    for by in range(0, padded.shape[0], 8):
        for bx in range(0, padded.shape[1], 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.emit_marker(0xD0 + rst)  # RSTn, modulo-8 counter
                rst = (rst + 1) % 8
                prev_dc = 0
            mcu += 1
            block = padded[by : by + 8, bx : bx + 8]
            b = block.astype(np.int64) - 128
            f_scaled = _JCOS_NP @ b @ _JCOS_NP.T  # S[v][u] layout
            q = quantize(f_scaled)
            zz = [int(q[r, c]) for (r, c) in ZIGZAG]
            # DC difference
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            cat = _category(diff)
            code, ln = _DC_CODES[cat]
            bw.write(code, ln)
            if cat:
                bw.write(_amplitude_bits(diff, cat), cat)
            # AC run-length
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for i in range(1, last_nz + 1):
                if zz[i] == 0:
                    run += 1
                    continue
                while run > 15:
                    zcode, zln = _AC_CODES[0xF0]  # ZRL
                    bw.write(zcode, zln)
                    run -= 16
                cat = _category(zz[i])
                code, ln = _AC_CODES[(run << 4) | cat]
                bw.write(code, ln)
                bw.write(_amplitude_bits(zz[i], cat), cat)
                run = 0
            if last_nz < 63:
                code, ln = _AC_CODES[0x00]  # EOB
                bw.write(code, ln)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    qt_zz = bytes(int(_Q_NP[r, c]) for (r, c) in ZIGZAG)
    out = b"\xff\xd8"  # SOI
    out += seg(0xFFDB, b"\x00" + qt_zz)  # DQT, table 0, 8-bit
    out += seg(
        0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00"
    )  # SOF0: precision 8, dims, 1 component, 1x1 sampling, qtable 0
    out += seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))  # DHT DC 0
    out += seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))  # DHT AC 0
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))  # DRI
    out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS
    out += scan
    out += b"\xff\xd9"  # EOI
    return out


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:  # unstuff
            assert self.data[self.pos] == 0x00, "unexpected marker in scan"
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _read_huffman(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while True:
        code = (code << 1) | br.read_bit()
        length += 1
        if (length, code) in table:
            return table[(length, code)]
        if length > 16:
            raise ValueError("invalid Huffman code")


def _extend(v: int, cat: int) -> int:
    """Inverse of the one's-complement amplitude encoding (F.2.2.1)."""
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _split_restart_segments(data: bytes) -> list[bytes]:
    """Split entropy-coded data at RSTn markers (B.2.1.2): 0xFF00 is
    stuffing and stays inside its segment; 0xFFD0–0xFFD7 terminate a
    segment (the DC predictor resets at each boundary)."""
    segments: list[bytes] = []
    start = i = 0
    n = len(data)
    while i < n - 1:
        if data[i] != 0xFF:
            i += 1
            continue
        nxt = data[i + 1]
        if nxt == 0x00:
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            segments.append(data[start:i])
            start = i = i + 2
        else:
            raise ValueError(f"unexpected marker 0xFF{nxt:02x} in scan")
    segments.append(data[start:])
    return segments


# Standalone markers (no length field): TEM + RSTn; SOI/EOI handled
# explicitly in the walk.
_STANDALONE = {0xFF01} | {0xFFD0 + i for i in range(8)}


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline greyscale JPEG produced by any encoder using
    8-bit single-component scans with the tables present in the file.
    Markers parsed: DQT, SOF0, DHT, DRI, SOS; quant + Huffman tables
    are read FROM THE FILE, never assumed.  Restart markers (DRI/RSTn)
    reset the DC predictor per B.2.1.2; standalone markers (TEM, RSTn)
    and 0xFF fill bytes are skipped in the header walk."""
    assert payload[:2] == b"\xff\xd8", "not a JPEG (missing SOI)"
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    h = w = None
    comp_q = comp_dc = comp_ac = 0
    restart_interval = 0
    while pos < len(payload):
        assert payload[pos] == 0xFF, "marker sync lost"
        while payload[pos + 1] == 0xFF:  # fill bytes (B.1.1.2)
            pos += 1
        marker = struct.unpack(">H", payload[pos : pos + 2])[0]
        pos += 2
        if marker == 0xFFD9:  # EOI
            break
        if marker in _STANDALONE:
            continue
        (ln,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + ln]
        if marker == 0xFFDB:  # DQT (possibly several tables)
            b = body
            while b:
                pq_tq, b = b[0], b[1:]
                assert pq_tq >> 4 == 0, "only 8-bit quant tables"
                vals, b = b[:64], b[64:]
                qt = np.zeros((8, 8), dtype=np.int64)
                for i, (r, c) in enumerate(ZIGZAG):
                    qt[r, c] = vals[i]
                qtables[pq_tq & 0xF] = qt
        elif marker == 0xFFC0:  # SOF0
            precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            assert precision == 8 and ncomp == 1, "baseline greyscale only"
            comp_q = body[8]
        elif marker == 0xFFC4:  # DHT (possibly several tables)
            b = body
            while b:
                tc_th, b = b[0], b[1:]
                bits, b = list(b[:16]), b[16:]
                nv = sum(bits)
                vals, b = list(b[:nv]), b[nv:]
                tbl = _decode_tables(bits, vals)
                if tc_th >> 4 == 0:
                    dc_tables[tc_th & 0xF] = tbl
                else:
                    ac_tables[tc_th & 0xF] = tbl
        elif marker == 0xFFDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xFFDA:  # SOS — entropy data follows the header
            comp_dc = body[2] >> 4
            comp_ac = body[2] & 0xF
            pos += ln
            break
        pos += ln
    assert h is not None, "missing SOF0"
    # locate end of scan (the EOI marker); 0xFF00 stuffing is internal
    end = payload.rindex(b"\xff\xd9")
    segments = _split_restart_segments(payload[pos:end])
    seg_idx = 0
    br = _BitReader(segments[0])
    qt = qtables[comp_q]
    dct, act = dc_tables[comp_dc], ac_tables[comp_ac]
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    out = np.zeros((H, W), dtype=np.uint8)
    prev_dc = 0
    mcu = 0
    for by in range(0, H, 8):
        for bx in range(0, W, 8):
            if (
                restart_interval
                and mcu
                and mcu % restart_interval == 0
                and seg_idx + 1 < len(segments)
            ):
                seg_idx += 1
                br = _BitReader(segments[seg_idx])
                prev_dc = 0
            mcu += 1
            zz = [0] * 64
            cat = _read_huffman(br, dct)
            diff = _extend(br.read_bits(cat), cat) if cat else 0
            prev_dc += diff
            zz[0] = prev_dc
            i = 1
            while i < 64:
                sym = _read_huffman(br, act)
                if sym == 0x00:  # EOB
                    break
                run, cat = sym >> 4, sym & 0xF
                if sym == 0xF0:  # ZRL
                    i += 16
                    continue
                i += run
                zz[i] = _extend(br.read_bits(cat), cat)
                i += 1
            q = np.zeros((8, 8), dtype=np.int64)
            for i, (r, c_) in enumerate(ZIGZAG):
                q[r, c_] = zz[i]
            c = q * qt
            s = _JCOS_NP.T @ c @ _JCOS_NP  # spatial [y, x] directly
            p = round_div(s, FDCT_DEN) + 128
            out[by : by + 8, bx : bx + 8] = np.clip(p, 0, 255).astype(np.uint8)
    return out[:h, :w]


def predict_decoded(arr: np.ndarray) -> np.ndarray:
    """The closed-form pixel prediction the SQL oracle mirrors:
    pad → FDCT → quantize → dequantize → IDCT → clamp → crop, with NO
    bitstream in between.  decode_jpeg(encode_jpeg(x)) must equal this
    exactly — asserted in tests; the equality is what certifies the
    entropy-coding layer."""
    h, w = arr.shape
    padded = pad_replicate(arr)
    out = np.zeros_like(padded)
    for by in range(0, padded.shape[0], 8):
        for bx in range(0, padded.shape[1], 8):
            b = padded[by : by + 8, bx : bx + 8].astype(np.int64) - 128
            f_scaled = _JCOS_NP @ b @ _JCOS_NP.T  # S[v][u] layout
            q = quantize(f_scaled)
            out[by : by + 8, bx : bx + 8] = dequant_idct(q)
    return out[:h, :w]
