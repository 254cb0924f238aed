"""Dependency-free baseline JPEG codec (stdlib + NumPy only).

Round-6 (VERDICT r5 #9): the container has no Pillow/ffmpeg, but
baseline JPEG needs nothing beyond Huffman coding and the 8x8 DCT —
all public spec (ITU-T T.81). This converts the last stubbed modality
into a value-gated contract the way png.py did for PNG:

- ``decode_jpeg``: baseline sequential DCT (SOF0) AND progressive DCT
  (SOF2, T.81 Annex G: spectral selection + successive approximation,
  DC/AC first and refinement scans, EOB runs, interleaved DC /
  non-interleaved AC block orders), 8-bit, 1-component grayscale or
  3-component YCbCr with generic sampling factors (4:4:4, 4:2:0,
  4:2:2 all fall out of the per-component h/v loop), optional restart
  markers in both modes. 12-bit, lossless, hierarchical and
  arithmetic coding raise with the unsupported feature named — at
  scale the same operator runs with Pillow (multimodal._pixel_decoder
  prefers it; this is the honest fallback).
- ``encode_jpeg_gray``: grayscale baseline encoder (standard-layout
  quant + Huffman tables, 4:4:4) for deterministic test/bench
  fixtures — the synth_png_payloads analogue.
- ``encode_jpeg_gray_progressive``: the progressive twin (DC first +
  refine, per-band AC first + refine, shared EOB runs with buffered
  correction bits — the libjpeg jcphuff.c algorithm re-derived from
  T.81 G.1.2.2-3). Entropy coding is lossless, so progressive and
  baseline encodings of the same array DECODE IDENTICALLY — the
  pytest parity gate, and why the flat-block closed-form oracle holds
  verbatim for progressive fixtures (mm_pixels_jpeg_prog).

Why a lossy codec can still be VALUE-gated: an image built from flat
8x8 blocks has exactly one nonzero DCT coefficient per block (the DC),
so the decoded block is the closed-form quantization round-trip
``clip(round(round((v-128)*8/q)*q/8) + 128)`` of the input value v —
a formula a SQL oracle can state (the mm_pixels_jpeg contract).
Fixtures use ``QUANT_ORACLE`` (DC quantizer 24): ``8(v-128)/24`` has
fractional part in {0, 1/3, 2/3} and ``dc*24/8`` is integral, so
NEITHER rounding ever lands on a .5 tie — NumPy's banker's rounding
and SQL's round-half-away agree everywhere, and the ~1e-12 float noise
of the DCT matmul can't flip a result. tests/test_jpeg.py additionally
round-trips non-flat content within quantization error bounds.

The entropy decoder is a per-coefficient Python loop — fine for the
thumbnail/fixture sizes decoded inline here; the 100 TB path uses
Pillow. Huffman tables ride in the FILE (DHT), so encoder/decoder
self-consistency never depends on Annex-K table transcription.
"""

from __future__ import annotations

import struct

import numpy as np

# 8x8 DCT-II basis, orthonormal: coef = T @ block @ T.T ; inverse T.T @ c @ T
_T = np.zeros((8, 8))
for _i in range(8):
    for _j in range(8):
        _c = np.sqrt(0.5) if _i == 0 else 1.0
        _T[_i, _j] = 0.5 * _c * np.cos((2 * _j + 1) * _i * np.pi / 16.0)

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: Annex-K luminance quantization table (quality 50), natural order
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

#: fixture/oracle table: Annex-K with the DC quantizer bumped to 24 so
#: the flat-block round-trip is tie-free (module docstring)
QUANT_ORACLE = QUANT_LUMA.copy()
QUANT_ORACLE[0] = 24

# Huffman specs (BITS per code length 1..16, then symbol values). The
# DC spec is Annex K verbatim; the AC spec lists every (run, size)
# symbol the encoder can emit in a valid canonical layout — the tables
# are WRITTEN INTO the stream, so codec self-consistency holds by
# construction (see module docstring).
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_VALS = [
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
assert sum(_AC_BITS) == len(_AC_VALS) == 162


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {(ln, c): s for s, (c, ln) in _build_codes(bits, vals).items()}


# ---------------------------------------------------------------------------
# encoder (grayscale baseline, fixture generator)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category: value -> (size, amplitude bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _dht_segment(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg_gray(arr: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    """(h, w) uint8 -> baseline grayscale JPEG. Dimensions padded to a
    multiple of 8 by edge replication (decoder crops back). The quant
    table (natural order, default Annex-K luminance) rides in DQT."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError("encode_jpeg_gray takes a 2-D grayscale array")
    q = (QUANT_LUMA if quant is None else np.asarray(quant, dtype=np.int64)).reshape(8, 8)
    h, w = a.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(a, ((0, ph - h), (0, pw - w)), mode="edge").astype(np.float64)

    dc_codes = _build_codes(_DC_BITS, _DC_VALS)
    ac_codes = _build_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            block = padded[by:by + 8, bx:bx + 8] - 128.0
            coef = _T @ block @ _T.T
            zz = np.round(coef.reshape(64)[ZIGZAG] / q.reshape(64)[ZIGZAG])
            zz = zz.astype(np.int64)
            dc = int(zz[0])
            size, bits = _magnitude(dc - prev_dc)
            c, ln = dc_codes[size]
            bw.write(c, ln)
            if size:
                bw.write(bits, size)
            prev_dc = dc
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for i in range(1, 64):
                if i > last_nz:
                    break
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]  # ZRL
                    bw.write(c, ln)
                    run -= 16
                size, bits = _magnitude(v)
                c, ln = ac_codes[(run << 4) | size]
                bw.write(c, ln)
                bw.write(bits, size)
                run = 0
            if last_nz < 63:
                c, ln = ac_codes[0x00]  # EOB
                bw.write(c, ln)

    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(x) for x in q.reshape(64)[ZIGZAG]
    )
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
    sos = b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    return (
        b"\xff\xd8"
        + dqt
        + sof
        + _dht_segment(0x00, _DC_BITS, _DC_VALS)
        + _dht_segment(0x10, _AC_BITS, _AC_VALS)
        + sos
        + bw.flush()
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# encoder (grayscale progressive, fixture generator)
# ---------------------------------------------------------------------------

#: Progressive AC table: EVERY legal AC symbol — (r, s) for s 1..10,
#: plus EOB0..EOB14 and ZRL (176 total) — at a flat 8-bit code length.
#: The Annex-K table lacks the EOBn (n>0) symbols progressive EOB runs
#: need; since tables ride in the file, a flat layout is simplest (176
#: codes of 256, the all-ones code unused, per the T.81 constraint).
_AC_PROG_VALS = sorted(
    {(r << 4) | s for r in range(16) for s in range(1, 11)}
    | {r << 4 for r in range(15)} | {0xF0}
)
_AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_PROG_VALS),
                 0, 0, 0, 0, 0, 0, 0, 0]
assert len(_AC_PROG_VALS) == 176


def _quantize_blocks(arr: np.ndarray, q: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(h, w) uint8 -> (n_blocks, 64) zigzag quantized coefficients in
    row-major block order, plus frame dims (pre-pad)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError("grayscale encoder takes a 2-D array")
    h, w = a.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(a, ((0, ph - h), (0, pw - w)), mode="edge").astype(np.float64)
    # per-block matmul in exactly encode_jpeg_gray's order: a batched
    # einsum associates the float ops differently and can flip a
    # coefficient sitting on a .5 rounding tie, breaking the
    # progressive==baseline decode-parity guarantee
    qz = q.reshape(64)[ZIGZAG]
    rows = []
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            block = padded[by:by + 8, bx:bx + 8] - 128.0
            coef = _T @ block @ _T.T
            rows.append(np.round(coef.reshape(64)[ZIGZAG] / qz))
    return np.array(rows, dtype=np.int64), h, w


class _ProgScanWriter:
    """One progressive scan's entropy coder: restart-interval aware
    (flushes EOB-run state, byte-aligns, emits RSTn between
    intervals)."""

    def __init__(self, ac_codes: dict) -> None:
        self.ac_codes = ac_codes
        self.bw = _BitWriter()
        self.parts: list[bytes] = []
        self.eobrun = 0
        self.be: list[int] = []  # correction bits riding the EOB run

    def sym(self, code: int) -> None:
        c, ln = self.ac_codes[code]
        self.bw.write(c, ln)

    def flush_eob(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sym(nbits << 4)
            if nbits:
                self.bw.write(self.eobrun, nbits)
            self.eobrun = 0
            for b in self.be:
                self.bw.write(b, 1)
            self.be = []

    def restart(self, idx: int) -> None:
        self.flush_eob()
        self.parts.append(self.bw.flush())
        self.parts.append(bytes([0xFF, 0xD0 + idx % 8]))
        self.bw = _BitWriter()

    def finish(self) -> bytes:
        self.flush_eob()
        self.parts.append(self.bw.flush())
        return b"".join(self.parts)


def encode_jpeg_gray_progressive(
    arr: np.ndarray,
    quant: np.ndarray | None = None,
    dc_al: int = 1,
    ac_al: int = 1,
    bands: tuple[tuple[int, int], ...] = ((1, 5), (6, 63)),
    restart_interval: int = 0,
) -> bytes:
    """(h, w) uint8 -> progressive grayscale JPEG (SOF2).

    Scan script: DC first at Al=``dc_al`` then one DC refinement per
    bit down to 0; per spectral band an AC first scan at
    Al=``ac_al`` then refinements down to 0 — exercising every
    progressive scan kind (T.81 G.1.2.2-3, the jcphuff.c encoding
    algorithm incl. shared EOB runs and buffered correction bits).
    Entropy coding is lossless, so the decode equals the baseline
    encoder's decode for the same array and quant table — the parity
    gate in tests/test_jpeg.py."""
    q = (QUANT_LUMA if quant is None else np.asarray(quant, dtype=np.int64))
    zzs, h, w = _quantize_blocks(arr, q)
    n = len(zzs)
    ri = restart_interval
    intervals = (
        [range(i, min(i + ri, n)) for i in range(0, n, ri)] if ri
        else [range(n)]
    )

    dc_codes = _build_codes(_DC_BITS, _DC_VALS)
    ac_codes = _build_codes(_AC_PROG_BITS, _AC_PROG_VALS)

    def dc_first_scan(al: int) -> bytes:
        shifted = zzs[:, 0] >> al
        sw = _ProgScanWriter(ac_codes)
        for iv_i, iv in enumerate(intervals):
            if iv_i:
                sw.restart(iv_i - 1)
            pred = 0
            for i in iv:
                v = int(shifted[i])
                size, bits = _magnitude(v - pred)
                pred = v
                c, ln = dc_codes[size]
                sw.bw.write(c, ln)
                if size:
                    sw.bw.write(bits, size)
        return sw.finish()

    def dc_refine_scan(al: int) -> bytes:
        sw = _ProgScanWriter(ac_codes)
        for iv_i, iv in enumerate(intervals):
            if iv_i:
                sw.restart(iv_i - 1)
            for i in iv:
                sw.bw.write((int(zzs[i, 0]) >> al) & 1, 1)
        return sw.finish()

    def ac_first_scan(s0: int, s1: int, al: int) -> bytes:
        sw = _ProgScanWriter(ac_codes)
        for iv_i, iv in enumerate(intervals):
            if iv_i:
                sw.restart(iv_i - 1)
            for i in iv:
                band = zzs[i, s0:s1 + 1]
                tv = np.sign(band) * (np.abs(band) >> al)
                nz = np.nonzero(tv)[0]
                if len(nz) == 0:
                    sw.eobrun += 1
                    if sw.eobrun == 0x7FFF:
                        sw.flush_eob()
                    continue
                sw.flush_eob()
                r = 0
                last = int(nz[-1])
                for k in range(last + 1):
                    v = int(tv[k])
                    if v == 0:
                        r += 1
                        continue
                    while r > 15:
                        sw.sym(0xF0)
                        r -= 16
                    size, bits = _magnitude(v)
                    sw.sym((r << 4) | size)
                    sw.bw.write(bits, size)
                    r = 0
                if last < s1 - s0:
                    sw.eobrun += 1
                    if sw.eobrun == 0x7FFF:
                        sw.flush_eob()
        return sw.finish()

    def ac_refine_scan(s0: int, s1: int, al: int) -> bytes:
        sw = _ProgScanWriter(ac_codes)
        for iv_i, iv in enumerate(intervals):
            if iv_i:
                sw.restart(iv_i - 1)
            for i in iv:
                band = zzs[i, s0:s1 + 1]
                absv = np.abs(band) >> al
                ones = np.nonzero(absv == 1)[0]
                eob = int(ones[-1]) if len(ones) else -1
                r = 0
                br: list[int] = []
                for k in range(len(band)):
                    t = int(absv[k])
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob:
                        sw.flush_eob()
                        sw.sym(0xF0)
                        r -= 16
                        for b in br:
                            sw.bw.write(b, 1)
                        br = []
                    if t > 1:
                        br.append(t & 1)
                        continue
                    sw.flush_eob()
                    sw.sym((r << 4) | 1)
                    sw.bw.write(0 if band[k] < 0 else 1, 1)
                    for b in br:
                        sw.bw.write(b, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    sw.eobrun += 1
                    sw.be.extend(br)
                    if sw.eobrun == 0x7FFF:
                        sw.flush_eob()
        return sw.finish()

    scans: list[tuple[int, int, int, int, bytes]] = []
    scans.append((0, 0, 0, dc_al, dc_first_scan(dc_al)))
    for a in range(dc_al - 1, -1, -1):
        scans.append((0, 0, a + 1, a, dc_refine_scan(a)))
    for s0, s1 in bands:
        scans.append((s0, s1, 0, ac_al, ac_first_scan(s0, s1, ac_al)))
    for a in range(ac_al - 1, -1, -1):
        for s0, s1 in bands:
            scans.append((s0, s1, a + 1, a, ac_refine_scan(s0, s1, a)))

    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(x) for x in q.reshape(64)[ZIGZAG]
    )
    sof = b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
    out = bytearray(b"\xff\xd8" + dqt + sof)
    out += _dht_segment(0x00, _DC_BITS, _DC_VALS)
    out += _dht_segment(0x10, _AC_PROG_BITS, _AC_PROG_VALS)
    if ri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, ri)
    for s0, s1, ah, al, body in scans:
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes(
            [1, 0x00, s0, s1, (ah << 4) | al]
        )
        out += body
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder (baseline sequential)
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; restart
    markers are handled by the caller (segment boundaries)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy segment")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # stuffed
                else:
                    raise ValueError("marker inside entropy segment")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            s = table.get((ln, code))
            if s is not None:
                return s
        raise ValueError("invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline or progressive JPEG bytes -> uint8 array (h, w)
    grayscale or (h, w, 3) RGB (BT.601 YCbCr conversion). See module
    docstring for the supported envelope; anything outside it raises
    NotImplementedError naming the feature."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    progressive = False
    coefs: list[np.ndarray] | None = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if progressive and coefs is not None:
                return _reconstruct(frame, coefs, quant)
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seg_len = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(seg[p + 1:p + 65], dtype=np.uint8)
                quant[tq] = tbl
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decoder(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component images")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline frame (marker 0xFF{marker:02X}: lossless/"
                "hierarchical/arithmetic) — decode with Pillow at scale"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_tabs = {}
            scan_comps = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_tabs[cs] = (tt >> 4, tt & 0x0F)
                scan_comps.append(cs)
            if not progressive:
                return _decode_scan(
                    data, pos + seg_len, frame, scan_tabs, quant,
                    huff_dc, huff_ac, restart_interval,
                )
            if frame is None:
                raise ValueError("SOS before SOF")
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            # T.81 G.1.1.1.1: DC scans are exactly the 0..0 band; AC
            # scans are single-component bands inside 1..63
            if (ss == 0) != (se == 0) or se > 63 or (ss > 0 and ns != 1):
                raise ValueError(
                    f"invalid progressive scan header Ss={ss} Se={se} ns={ns}"
                )
            if coefs is None:
                coefs = _alloc_coefs(frame)
            pos = _decode_progressive_scan(
                data, pos + seg_len, frame, scan_comps, scan_tabs,
                huff_dc, huff_ac, restart_interval, coefs,
                ss, se, ahal >> 4, ahal & 0x0F,
            )
            continue
        pos += seg_len
    raise ValueError("no scan data (SOS) found")


def _decode_scan(data, pos, frame, scan_tabs, quant, huff_dc, huff_ac, dri):
    if frame is None:
        raise ValueError("SOS before SOF")
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    fw, fh = frame["w"], frame["h"]
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))

    # split entropy data on restart markers
    end = data.find(b"\xff\xd9", pos)
    if end < 0:
        end = len(data)
    raw = data[pos:end]
    segments = []
    if dri:
        seg, i = bytearray(), 0
        while i < len(raw):
            if raw[i] == 0xFF and i + 1 < len(raw) and 0xD0 <= raw[i + 1] <= 0xD7:
                segments.append(bytes(seg))
                seg = bytearray()
                i += 2
                continue
            seg.append(raw[i])
            i += 1
        segments.append(bytes(seg))
    else:
        segments = [raw]

    n_mcu = mcux * mcuy
    mcu_idx = 0
    for seg_i, seg in enumerate(segments):
        br = _BitReader(seg)
        preds = {c["id"]: 0 for c in comps}
        seg_mcus = dri if dri else n_mcu
        for _ in range(min(seg_mcus, n_mcu - mcu_idx)):
            my, mx = divmod(mcu_idx, mcux)
            for ci, c in enumerate(comps):
                dc_tab = huff_dc[scan_tabs[c["id"]][0]]
                ac_tab = huff_ac[scan_tabs[c["id"]][1]]
                q = quant[c["tq"]]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        s = br.read_symbol(dc_tab)
                        diff = _extend(br.read_bits(s), s)
                        preds[c["id"]] += diff
                        zz[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = br.read_symbol(ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run overflow")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        # q is natural-order; reorder to zigzag to pair
                        # with zz before scattering (round-6 fix: the
                        # first cut paired zz[i] with q[i], silently
                        # mis-scaling every non-DC coefficient)
                        coef[ZIGZAG] = zz * q[ZIGZAG]
                        block = _T.T @ coef.reshape(8, 8) @ _T
                        py = (my * c["v"] + v) * 8
                        px = (mx * c["h"] + hh) * 8
                        planes[ci][py:py + 8, px:px + 8] = block
            mcu_idx += 1

    return _finish_planes(planes, frame)


def _finish_planes(planes: list[np.ndarray], frame: dict) -> np.ndarray:
    """Shared decode tail: level shift, chroma upsample (nearest),
    crop to frame dims, YCbCr->RGB for 3-component images."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    fw, fh = frame["w"], frame["h"]
    out_planes = []
    for ci, c in enumerate(comps):
        p = np.clip(np.round(planes[ci] + 128.0), 0, 255)
        # upsample subsampled chroma to full grid (nearest)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:fh, :fw])
    if len(out_planes) == 1:
        return out_planes[0].astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive decoder (T.81 Annex G)
# ---------------------------------------------------------------------------


def _alloc_coefs(frame: dict) -> list[np.ndarray]:
    """Per-component zigzag coefficient store, MCU-padded grid (covers
    both the interleaved and the non-interleaved block order)."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
        for c in comps
    ]


def _find_entropy_end(data: bytes, pos: int) -> int:
    """First marker after ``pos`` that is neither a stuffed 0x00 nor a
    restart — i.e. where this scan's entropy-coded segment ends."""
    i = pos
    n = len(data)
    while True:
        i = data.find(b"\xff", i)
        if i < 0 or i + 1 >= n:
            return n
        b = data[i + 1]
        if b != 0x00 and not (0xD0 <= b <= 0xD7):
            return i
        i += 2


def _split_restarts(raw: bytes) -> list[bytes]:
    segments = []
    seg, i = bytearray(), 0
    while i < len(raw):
        if raw[i] == 0xFF and i + 1 < len(raw) and 0xD0 <= raw[i + 1] <= 0xD7:
            segments.append(bytes(seg))
            seg = bytearray()
            i += 2
            continue
        seg.append(raw[i])
        i += 1
    segments.append(bytes(seg))
    return segments


def _refine_nonzero(br: _BitReader, zz: np.ndarray, k: int, se: int,
                    p1: int, m1: int) -> None:
    """Correction bits for every already-nonzero coefficient in
    zz[k..se] (the tail of an EOB-run-covered band)."""
    while k <= se:
        if zz[k] != 0 and br.read_bit():
            if (int(zz[k]) & p1) == 0:
                zz[k] += p1 if zz[k] >= 0 else m1
        k += 1


def _block_ac_first(br, ac_tab, zz, ss, se, al, eobrun) -> None:
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        rs = br.read_symbol(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eobrun[0] = (1 << r) - 1
            if r:
                eobrun[0] += br.read_bits(r)
            return
        k += r
        if k > se:
            raise ValueError("AC run overflow")
        zz[k] = _extend(br.read_bits(s), s) << al
        k += 1


def _block_ac_refine(br, ac_tab, zz, ss, se, al, eobrun) -> None:
    """T.81 G.1.2.3 AC successive-approximation refinement (the
    jdphuff.c control flow: run lengths count only zero-history
    coefficients; nonzero-history coefficients passed over receive one
    correction bit each; EOB runs cover whole blocks whose remaining
    nonzero coefficients still receive correction bits)."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun[0] == 0:
        while k <= se:
            rs = br.read_symbol(ac_tab)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun[0] = 1 << r
                    if r:
                        eobrun[0] += br.read_bits(r)
                    break
                # ZRL: pass 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refinement symbol with size > 1")
                newval = p1 if br.read_bit() else m1
            while k <= se:
                if zz[k] != 0:
                    if br.read_bit():
                        if (int(zz[k]) & p1) == 0:
                            zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                if k > se:
                    raise ValueError("refinement run overflow")
                zz[k] = newval
            k += 1
    if eobrun[0] > 0:
        _refine_nonzero(br, zz, k, se, p1, m1)
        eobrun[0] -= 1


def _decode_progressive_scan(
    data: bytes, pos: int, frame: dict, scan_comps: list[int],
    scan_tabs: dict, huff_dc: dict, huff_ac: dict, dri: int,
    coefs: list[np.ndarray], ss: int, se: int, ah: int, al: int,
) -> int:
    """Decode one progressive scan into ``coefs``; returns the stream
    position just past the scan's entropy data."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    by_id = {c["id"]: (ci, c) for ci, c in enumerate(comps)}

    end = _find_entropy_end(data, pos)
    segments = _split_restarts(data[pos:end]) if dri else [data[pos:end]]

    interleaved = len(scan_comps) > 1
    if interleaved:
        if ss != 0:
            raise ValueError("interleaved AC scan")
        n_units = mcux * mcuy
    else:
        ci, c = by_id[scan_comps[0]]
        cw = -(-frame["w"] * c["h"] // hmax)
        ch = -(-frame["h"] * c["v"] // vmax)
        bw, bh = -(-cw // 8), -(-ch // 8)
        n_units = bw * bh

    is_dc = ss == 0
    unit = 0
    for seg in segments:
        br = _BitReader(seg)
        preds = {c["id"]: 0 for c in comps}
        eobrun = [0]
        for _ in range(min(dri or n_units, n_units - unit)):
            if interleaved:
                my, mx = divmod(unit, mcux)
                for cs in scan_comps:
                    ci, c = by_id[cs]
                    dc_tab = huff_dc[scan_tabs[cs][0]]
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            zz = coefs[ci][my * c["v"] + v, mx * c["h"] + hh]
                            _block_dc(br, dc_tab, preds, cs, zz, ah, al)
            else:
                cs = scan_comps[0]
                ci, c = by_id[cs]
                zz = coefs[ci][unit // bw, unit % bw]
                if is_dc:
                    _block_dc(br, huff_dc[scan_tabs[cs][0]], preds, cs,
                              zz, ah, al)
                elif ah == 0:
                    _block_ac_first(br, huff_ac[scan_tabs[cs][1]], zz,
                                    ss, se, al, eobrun)
                else:
                    _block_ac_refine(br, huff_ac[scan_tabs[cs][1]], zz,
                                     ss, se, al, eobrun)
            unit += 1
    return end


def _block_dc(br, dc_tab, preds, cid, zz, ah, al) -> None:
    if ah == 0:  # first DC scan: Huffman-coded diffs of the shifted DC
        s = br.read_symbol(dc_tab)
        preds[cid] += _extend(br.read_bits(s), s)
        zz[0] = preds[cid] << al
    else:  # refinement: one raw bit per block
        if br.read_bit():
            zz[0] |= 1 << al


def _reconstruct(frame: dict, coefs: list[np.ndarray],
                 quant: dict[int, np.ndarray]) -> np.ndarray:
    """Dequantize + IDCT every accumulated block (vectorized over the
    whole plane) and hand off to the shared finishing tail."""
    planes = []
    for ci, c in enumerate(frame["comps"]):
        q = quant[c["tq"]]
        zz = coefs[ci]
        nat = np.zeros(zz.shape, dtype=np.float64)
        nat[..., ZIGZAG] = zz * q[ZIGZAG]
        bv, bh = zz.shape[:2]
        blocks = np.einsum(
            "ij,xyjk,kl->xyil", _T.T, nat.reshape(bv, bh, 8, 8), _T
        )
        planes.append(blocks.transpose(0, 2, 1, 3).reshape(bv * 8, bh * 8))
    return _finish_planes(planes, frame)


def flat_block_roundtrip(v: int, q_dc: int = int(QUANT_ORACLE[0])) -> int:
    """Closed-form decode of a FLAT 8x8 block encoded at quant[0]=q_dc:
    the mm_pixels_jpeg oracle's per-block pixel value (module
    docstring). With the default q_dc=24 both roundings are tie-free,
    so this equals the SQL ``greatest(0, least(255,
    round(round((v-128)*8.0/24)*24/8.0) + 128))`` exactly."""
    dc = float(np.round((v - 128.0) * 8.0 / q_dc))
    return int(np.clip(np.round(dc * q_dc / 8.0) + 128.0, 0, 255))
