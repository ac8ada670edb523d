"""Baseline JPEG codec in pure NumPy + stdlib — no codec library.

Closes the engine's standing multimodal limitation (compressed image
formats previously strict-raised): ITU-T T.81 Huffman-coded DCT JPEG at
8-bit precision — both BASELINE/extended sequential (SOF0/SOF1) and
PROGRESSIVE (SOF2), which together cover essentially every camera/web
JPEG a crawl contains.

* :func:`decode_jpeg`: SOI/DQT/DHT/SOF/DRI/SOS marker walk, canonical
  Huffman decode (accumulator bit reader + T.81 F.2.2.3 per-length
  MAXCODE resolution — one 16-bit peek per symbol, not one Python call
  per bit; ~6x the round-8 decode throughput), dequantize + de-zigzag,
  vectorized 8x8 IDCT (one ``einsum`` per component over all blocks),
  chroma upsampling for any integer sampling ratio, JFIF YCbCr->RGB.
  Restart markers supported.
  Progressive streams decode through the full T.81 Annex G machinery:
  spectral-selection bands, successive approximation (DC bit refinement
  and the AC correction-bit algorithm of G.1.2.3), EOB runs,
  interleaved DC and single-component AC scans — validated against JVM
  ImageIO on real libjpeg progressive files (max code-value diff 2).
  Arithmetic coding and hierarchical/lossless modes raise
  ``ValueError``.
* :func:`encode_jpeg`: the matching baseline encoder (Annex K quant
  tables scaled by IJG quality, standard Huffman tables, 4:4:4 or 4:2:0,
  optional restart intervals). Exists so tests and correctness gates can
  build REAL payloads deterministically, and as the thumbnail sink for
  multimodal pipelines.

Scale design: both functions are per-payload kernels invoked from
Arrow-batched ``mapInPandas`` (see ``multimodal.decode_image``) — the
payload bytes never shuffle, and each Python task touches one batch at a
time. A production deployment would swap in libjpeg-turbo via PIL for
raw throughput; the plumbing (schema, batching, strict-mode contract) is
identical, which is the point of keeping the baseline here.

Correctness anchors (tests/test_jpeg.py): constant-per-block grayscale
at quality 100 round-trips BIT-EXACTLY (DC-only blocks, unit quant), so
the q154 gate's DuckDB oracle can replay decoded pixels value-for-value;
lossy paths are PSNR-bounded against the pre-encode source.

Reference context: nested-pandas has no media handling; this extends the
multimodal column policy (pipeline/multimodal.py) to compressed inputs.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]

# zigzag scan: position k in scan order -> raster index in the 8x8 block
_ZIGZAG = []
for _s in range(15):
    for _i in range(_s + 1):
        _y, _x = (_s - _i, _i) if _s % 2 == 0 else (_i, _s - _i)
        if _y < 8 and _x < 8:
            _ZIGZAG.append(_y * 8 + _x)
_ZIGZAG = np.asarray(_ZIGZAG, dtype=np.int64)

# orthonormal DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
# FDCT: F = A @ f @ A.T ; IDCT: f = A.T @ F @ A
_A = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = np.sqrt(0.5) if _u == 0 else 1.0
        _A[_u, _x] = _c / 2.0 * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# Annex K base quantization tables (natural/raster order)
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K Huffman tables: (counts per code length 1..16, symbol list)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _canonical_codes(counts: list[int], symbols: list[int]):
    """Canonical Huffman codes from a DHT-style (counts, symbols) spec.
    Returns ``[(symbol, code, length), ...]`` in code order."""
    if sum(counts) != len(symbols):
        raise ValueError(
            f"Huffman table: {sum(counts)} codes declared but "
            f"{len(symbols)} symbols listed"
        )
    out, code, k = [], 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out.append((symbols[k], code, length))
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(counts, symbols):
    """Decode tables for :meth:`_BitReader.read_huff`: a full 16-bit
    lookup pair ``(lut_sym, lut_len)`` — every 16-bit window whose prefix
    is a valid code of length L maps to (symbol, L); windows starting
    with no valid prefix map to length 0 (invalid-code error). One peek,
    two list indexings per symbol, versus the per-length MAXCODE scan of
    rounds 8-9 (and the per-bit loop before that). Tables are CACHED on
    the DHT byte spec — identical tables across a corpus of same-encoder
    images (the common case, and every standard-table JPEG) build the
    LUT exactly once per process."""
    key = (bytes(counts), bytes(symbols))
    cached = _DECODE_TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    codes = _canonical_codes(counts, symbols)
    sym = np.zeros(65536, np.int32)
    ln_arr = np.zeros(65536, np.int32)
    for s, code, length in codes:
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        sym[lo:hi] = s
        ln_arr[lo:hi] = length
    table = (sym.tolist(), ln_arr.tolist())
    if len(_DECODE_TABLE_CACHE) >= 64:  # bound: 64 tables x ~1 MB of lists
        _DECODE_TABLE_CACHE.clear()
    _DECODE_TABLE_CACHE[key] = table
    return table


_DECODE_TABLE_CACHE: dict = {}


def _encode_table(counts, symbols) -> dict:
    return {sym: (code, ln) for sym, code, ln in _canonical_codes(counts, symbols)}


# the four standard encode tables are fixed module constants — build their
# symbol->(code, length) dicts once, not once per encoded image
_ENC_DC_LUMA = _encode_table(*_DC_LUMA)
_ENC_AC_LUMA = _encode_table(*_AC_LUMA)
_ENC_DC_CHROMA = _encode_table(*_DC_CHROMA)
_ENC_AC_CHROMA = _encode_table(*_AC_CHROMA)

_QUALITY_TABLE_CACHE: dict = {}


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K base tables (memoized; callers
    must not mutate the returned arrays — they .astype()-copy anyway)."""
    q = min(100, max(1, int(quality)))
    cached = _QUALITY_TABLE_CACHE.get(q)
    if cached is not None:
        return cached
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_QUANT_LUMA, _QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    _QUALITY_TABLE_CACHE[q] = (out[0], out[1])
    return out[0], out[1]


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t magnitude bits back to a signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; raises at non-RST markers (truncated stream).

    Accumulator design (the round-8 hot-path fix): bits buffer in one
    int (``cur``, low ``n`` bits valid) refilled a byte at a time; the
    refill STOPS at any marker instead of raising, so :meth:`read_huff`
    can peek up to 16 zero-padded bits at once and resolve a whole
    canonical code with per-length MAXCODE comparisons — the error for
    genuinely missing bits (marker/EOF inside a symbol) only fires if
    the resolved code needs more bits than the stream has."""

    def __init__(self, buf: bytes, pos: int):
        self.buf, self.pos, self.cur, self.n = buf, pos, 0, 0

    def _fill(self, need: int) -> None:
        """Buffer bytes until ``n >= need`` or the next byte is a
        marker / EOF (stop silently — the caller decides if that's an
        error). Trims consumed high bits so ``cur`` stays machine-int
        sized over long scans."""
        n = self.n
        cur = self.cur & ((1 << n) - 1)
        buf, p, ln = self.buf, self.pos, len(self.buf)
        while n < need and p < ln:
            b = buf[p]
            if b == 0xFF:
                if p + 1 < ln and buf[p + 1] == 0x00:
                    p += 2
                else:
                    break  # marker (or truncated FF): stop, don't consume
            else:
                p += 1
            cur = (cur << 8) | b
            n += 8
        self.cur, self.n, self.pos = cur, n, p

    def _stall(self):
        """Raise the out-of-bits error with the legacy message: marker
        byte next -> 'marker inside entropy data', else truncated."""
        buf, p = self.buf, self.pos
        if p < len(buf) and buf[p] == 0xFF and p + 1 < len(buf):
            raise ValueError(
                f"marker 0xFF{buf[p + 1]:02X} inside entropy data"
            )
        raise ValueError("truncated JPEG entropy data")

    def read(self, nbits: int) -> int:
        n = self.n
        if n < nbits:
            # refill deep (not just to nbits): _fill can never cross a
            # marker, so over-buffering is safe, and it amortizes the
            # per-call overhead over ~6x more symbol reads
            self._fill(48)
            n = self.n
            if n < nbits:
                self._stall()
        n -= nbits
        self.n = n
        return (self.cur >> n) & ((1 << nbits) - 1)

    def read_huff(self, table) -> int:
        syms, lens = table
        n = self.n
        if n < 16:
            self._fill(48)  # deep refill; see read()
            n = self.n
        cur = self.cur
        # 16-bit window, zero-padded past stream end; garbage above bit
        # n is masked by the &0xFFFF after the shift
        v = (
            (cur >> (n - 16)) & 0xFFFF
            if n >= 16
            else (cur << (16 - n)) & 0xFFFF
        )
        length = lens[v]
        if length == 0:
            raise ValueError("invalid Huffman code in JPEG entropy data")
        if length > n:
            self._stall()  # code ran past the stream's last bit
        self.n = n - length
        return syms[v]

    def skip_rst(self, index: int) -> None:
        """Byte-align (discarding pad bits) and consume the expected
        RSTm marker (m = index mod 8)."""
        self.finish()
        buf = self.buf
        want = 0xD0 + (index % 8)
        if (
            self.pos + 1 >= len(buf)
            or buf[self.pos] != 0xFF
            or buf[self.pos + 1] != want
        ):
            raise ValueError(f"expected RST{index % 8} marker at byte {self.pos}")
        self.pos += 2

    def finish(self) -> int:
        """Byte-align, dropping pad bits and any fully-unread stuffed
        0xFF pad byte; returns the byte position of the next marker."""
        self.cur = self.n = 0
        buf = self.buf
        while (
            self.pos + 1 < len(buf)
            and buf[self.pos] == 0xFF
            and buf[self.pos + 1] == 0x00
        ):
            self.pos += 2
        return self.pos


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a JPEG payload to ``(h, w, 3)`` uint8 RGB (or ``(h, w, 1)``
    for single-component grayscale).

    Supports baseline/extended sequential (SOF0/SOF1) AND progressive
    (SOF2) Huffman coding, 8-bit precision: spectral selection,
    successive approximation (DC + AC refinement with EOB runs),
    interleaved and single-component scans, any integer chroma sampling
    ratio, restart intervals, multiple DQT/DHT segments. Raises
    ``ValueError`` for arithmetic coding, hierarchical/lossless modes,
    12-bit precision, or malformed streams.
    """
    if len(payload) < 4 or payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    dri = 0
    frame = None
    state = None  # per-component raw zigzag coefficients + DC preds
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (length,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + length]
        pos += length
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 15
                i += 1
                if prec == 0:
                    vals = np.frombuffer(seg, np.uint8, 64, i).astype(np.int64)
                    i += 64
                else:
                    vals = np.frombuffer(seg, ">u2", 64, i).astype(np.int64)
                    i += 128
                nat = np.empty(64, np.int64)
                nat[_ZIGZAG] = vals
                qt[tid] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1 : i + 17])
                n = sum(counts)
                symbols = list(seg[i + 17 : i + 17 + n])
                huff[(cls, tid)] = _decode_table(counts, symbols)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1/SOF2
            prec, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            if h == 0 or w == 0:
                raise ValueError(f"bad JPEG dimensions {w}x{h}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if hmax < 1 or vmax < 1:
                raise ValueError("bad JPEG sampling factors")
            frame = {
                "h": h, "w": w, "comps": comps, "hmax": hmax, "vmax": vmax,
                "mcux": -(-w // (8 * hmax)), "mcuy": -(-h // (8 * vmax)),
                "progressive": marker == 0xC2,
            }
            state = {
                "coef": [
                    np.zeros(
                        (frame["mcuy"] * c["v"], frame["mcux"] * c["h"], 64),
                        np.int32,
                    )
                    for c in comps
                ],
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding (SOF marker 0xFF{marker:02X}); "
                "only sequential/progressive Huffman decodes here"
            )
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS -> entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                ci = next(
                    i for i, x in enumerate(frame["comps"]) if x["id"] == cid
                )
                scan.append((ci, tabs >> 4, tabs & 15))
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            pos = _decode_scan_into(
                payload, pos, frame, scan, huff, dri, state,
                ss, se, a >> 4, a & 15,
            )
        # else: APPn / COM — skipped
    if frame is None or state is None:
        raise ValueError("JPEG has no frame")
    return _reconstruct(frame, state, qt)


def _ac_first(reader, ac_t, coef, ss, se, al, eobrun) -> int:
    """First AC scan of a spectral band (T.81 G.1.2.2): run-length coded
    new coefficients, shifted by the approximation low bit; EOBn symbols
    start a run of entirely-skipped blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.read_huff(ac_t)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read(r)
                return eobrun
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("JPEG AC coefficient overrun")
        coef[k] = _extend(reader.read(s), s) << al
        k += 1
    return 0


def _ac_refine(reader, ac_t, coef, ss, se, al, eobrun) -> int:
    """AC successive-approximation refinement (T.81 G.1.2.3): every
    already-nonzero coefficient traversed gets a correction bit; runs
    count only zero-history positions; EOB runs refine the remainder."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.read_huff(ac_t)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read(r)
                    break  # remainder handled by the EOB sweep below
                # r == 15 (ZRL): skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("bad AC refinement magnitude")
                val = p1 if reader.read(1) else m1
            while k <= se:
                t = int(coef[k])
                if t != 0:
                    if reader.read(1) and (abs(t) & p1) == 0:
                        coef[k] = t + (p1 if t >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError("JPEG AC refinement overrun")
                coef[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            t = int(coef[k])
            if t != 0 and reader.read(1) and (abs(t) & p1) == 0:
                coef[k] = t + (p1 if t >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan_into(
    payload, pos, frame, scan, huff, dri, state, ss, se, ah, al
) -> int:
    """Decode one scan's entropy data into the frame coefficient store;
    returns the byte position after the scan (next marker)."""
    comps = frame["comps"]
    progressive = frame["progressive"]
    tables = []
    for ci, tdc, tac in scan:
        dc_t = huff.get((0, tdc))
        ac_t = huff.get((1, tac))
        need_dc = not progressive or ss == 0
        need_ac = not progressive or ss > 0
        refining = progressive and ah != 0
        if need_dc and dc_t is None and not (refining and ss == 0):
            raise ValueError("JPEG scan references an undefined DC table")
        if need_ac and ac_t is None:
            raise ValueError("JPEG scan references an undefined AC table")
        tables.append((dc_t, ac_t))
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("bad progressive spectral selection")
        if ss > 0 and len(scan) != 1:
            raise ValueError("progressive AC scans must be single-component")
    else:
        ss, se, ah, al = 0, 63, 0, 0
    reader = _BitReader(payload, pos)
    preds = [0] * len(comps)
    eobrun = 0
    interleaved = len(scan) > 1

    def dc_block(ci, coef, dc_t):
        if not progressive or ah == 0:
            t = reader.read_huff(dc_t)
            preds[ci] += _extend(reader.read(t), t) if t else 0
            coef[0] = preds[ci] << al
        else:
            if reader.read(1):
                coef[0] = int(coef[0]) | (1 << al)

    def full_block(ci, coef, dc_t, ac_t):
        dc_block(ci, coef, dc_t)
        k = 1
        while k < 64:
            rs = reader.read_huff(ac_t)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("JPEG AC coefficient overrun")
            coef[k] = _extend(reader.read(s), s)
            k += 1

    if interleaved:
        mcux, mcuy = frame["mcux"], frame["mcuy"]
        n_units = mcux * mcuy
    else:
        ci0 = scan[0][0]
        comp = comps[ci0]
        # full-sample dims of this component, then whole-block grid
        bw = (-(-frame["w"] * comp["h"] // frame["hmax"]) + 7) // 8
        bh = (-(-frame["h"] * comp["v"] // frame["vmax"]) + 7) // 8
        n_units = bw * bh
    rst = 0
    for m in range(n_units):
        if dri and m and m % dri == 0:
            reader.skip_rst(rst)
            rst += 1
            preds = [0] * len(comps)
            eobrun = 0
        if interleaved:
            my, mx = divmod(m, frame["mcux"])
            for (ci, _tdc, _tac), (dc_t, ac_t) in zip(scan, tables):
                comp = comps[ci]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coef = state["coef"][ci][
                            my * comp["v"] + by, mx * comp["h"] + bx
                        ]
                        if progressive:
                            dc_block(ci, coef, dc_t)
                        else:
                            full_block(ci, coef, dc_t, ac_t)
        else:
            ci, _tdc, _tac = scan[0]
            dc_t, ac_t = tables[0]
            by, bx = divmod(m, bw)
            coef = state["coef"][ci][by, bx]
            if not progressive:
                full_block(ci, coef, dc_t, ac_t)
            elif ss == 0:
                dc_block(ci, coef, dc_t)
            elif ah == 0:
                eobrun = _ac_first(reader, ac_t, coef, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine(reader, ac_t, coef, ss, se, al, eobrun)
    return reader.finish()


def _reconstruct(frame, state, qt) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    planes = []
    for ci, comp in enumerate(frame["comps"]):
        if comp["tq"] not in qt:
            raise ValueError("JPEG frame references an undefined quant table")
        q = qt[comp["tq"]].astype(np.float64)
        zz = state["coef"][ci]
        by, bx = zz.shape[:2]
        nat = np.zeros((by, bx, 64), np.float64)
        nat[..., _ZIGZAG] = zz
        blocks = nat.reshape(by, bx, 8, 8) * q
        spatial = np.einsum("ux,ijuv,vy->ijxy", _A, blocks, _A) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if vmax % comp["v"] or hmax % comp["h"]:
            raise ValueError(
                f"non-integer chroma upsampling ratio {vmax}/{comp['v']}, "
                f"{hmax}/{comp['h']}"
            )
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return y[..., None]
    if len(planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(planes)}")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur, self.n = 0, 0

    def write(self, code: int, nbits: int) -> None:
        self.cur = (self.cur << nbits) | (code & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            b = (self.cur >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.cur &= (1 << self.n) - 1

    def write_long(self, code: int, nbits: int) -> None:
        """Bulk :meth:`write`: emit whole bytes via int.to_bytes and do
        the 0xFF00 stuffing with one bytes.replace — byte-identical to a
        sequence of write() calls carrying the same bits, at C speed for
        the per-byte part. ``nbits`` may be arbitrarily large."""
        cur = (self.cur << nbits) | (code & ((1 << nbits) - 1))
        n = self.n + nbits
        rem = n & 7
        nbytes = n >> 3
        if nbytes:
            chunk = (cur >> rem).to_bytes(nbytes, "big")
            if 0xFF in chunk:
                chunk = chunk.replace(b"\xff", b"\xff\x00")
            self.out += chunk
        self.cur = cur & ((1 << rem) - 1)
        self.n = rem

    def align(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s

    def marker(self, m: int) -> None:
        self.align()
        self.out += bytes((0xFF, m))


def _encode_block(bw, coeff_zz, pred, dc_tbl, ac_tbl) -> int:
    # accumulate the whole block's bit string in one Python int (a block
    # is a few hundred bits at most, so big-int shifts stay cheap) and
    # flush it with ONE write_long — same bits, ~6x fewer bit-I/O calls
    zz = coeff_zz.tolist() if hasattr(coeff_zz, "tolist") else list(coeff_zz)
    diff = zz[0] - pred
    t = abs(diff).bit_length()
    code, ln = dc_tbl[t]
    acc, bits = code, ln
    if t:
        acc = (acc << t) | ((diff if diff > 0 else diff + (1 << t) - 1) & ((1 << t) - 1))
        bits += t
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    zrl_code, zrl_ln = ac_tbl[0xF0]
    for k in range(1, last + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            acc = (acc << zrl_ln) | zrl_code
            bits += zrl_ln
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_tbl[(run << 4) | s]
        acc = (acc << (ln + s)) | (code << s) | ((v if v > 0 else v + (1 << s) - 1) & ((1 << s) - 1))
        bits += ln + s
        run = 0
    if last < 63:
        code, ln = ac_tbl[0x00]  # EOB
        acc = (acc << ln) | code
        bits += ln
    bw.write_long(acc, bits)
    return zz[0]


def _to_zigzag(nat64: np.ndarray) -> np.ndarray:
    """Reorder the last axis from natural (raster) to zigzag scan order."""
    return nat64[..., _ZIGZAG]


def _pad_to(plane: np.ndarray, ty: int, tx: int) -> np.ndarray:
    """Edge-replicate pad an (H, W) plane up to exactly (ty, tx)."""
    hh, ww = plane.shape
    if (hh, ww) != (ty, tx):
        plane = np.pad(plane, ((0, ty - hh), (0, tx - ww)), mode="edge")
    return plane


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode an image as baseline JPEG (JFIF). ``arr``: ``(h, w, 3)``
    uint8 RGB, or ``(h, w)`` / ``(h, w, 1)`` uint8 grayscale (encoded as
    a single-component scan). ``subsampling``: ``'444'`` or ``'420'``
    (ignored for grayscale). ``restart_interval``: MCUs between RST
    markers (0 = none)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 3):
        raise ValueError(f"expected (h, w, 1|3) image, got shape {arr.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    gray = arr.shape[2] == 1
    ql, qc = _quality_tables(quality)
    qlm, qcm = ql.reshape(8, 8).astype(np.float64), qc.reshape(8, 8).astype(np.float64)
    x = arr.astype(np.float64)
    if gray:
        planes = [x[..., 0]]
        samp = [(1, 1)]
    else:
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        yy = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
            ey, ex = h + h % 2, w + w % 2
            cbp, crp = _pad_to(cb, ey, ex), _pad_to(cr, ey, ex)
            cb = cbp.reshape(ey // 2, 2, ex // 2, 2).mean((1, 3))
            cr = crp.reshape(ey // 2, 2, ex // 2, 2).mean((1, 3))
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [yy, cb, cr]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # FDCT every component once, vectorized; blocks in natural order
    comp_blocks = []
    for ci, plane in enumerate(planes):
        sh, sv = samp[ci]
        plane = _pad_to(plane, 8 * mcuy * sv, 8 * mcux * sh)  # to the MCU grid
        q = qlm if ci == 0 or gray else qcm
        hh, ww = plane.shape
        blocks = plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
        f = np.einsum("ux,ijxy,vy->ijuv", _A, blocks - 128.0, _A)
        qd = np.round(f / q).astype(np.int64).reshape(hh // 8, ww // 8, 64)
        comp_blocks.append(_to_zigzag(qd))
    dc_l, ac_l, dc_c, ac_c = (
        _ENC_DC_LUMA, _ENC_AC_LUMA, _ENC_DC_CHROMA, _ENC_AC_CHROMA,
    )
    # ---- headers ----
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(
        (1, 1, 0)
    ) + struct.pack(">HH", 1, 1) + bytes((0, 0))
    for tid, tbl in ((0, ql),) if gray else ((0, ql), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(v) for v in tbl[_ZIGZAG])
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        out += bytes((ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1))
    hts = [(0, 0, _DC_LUMA), (1, 0, _AC_LUMA)]
    if not gray:
        hts += [(0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)]
    for cls, tid, (counts, syms) in hts:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(syms), (cls << 4) | tid)
        out += bytes(counts) + bytes(syms)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes((ci + 1, 0x00 if ci == 0 else 0x11))
    out += bytes((0, 63, 0))
    # ---- entropy-coded data ----
    bw = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.marker(0xD0 + (rst % 8))
            rst += 1
            preds = [0] * ncomp
        my, mx = divmod(m, mcux)
        for ci in range(ncomp):
            sh, sv = samp[ci]
            dct, act = (dc_l, ac_l) if ci == 0 or gray else (dc_c, ac_c)
            for by in range(sv):
                for bx in range(sh):
                    zz = comp_blocks[ci][my * sv + by, mx * sh + bx]
                    preds[ci] = _encode_block(bw, zz, preds[ci], dct, act)
    bw.align()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
