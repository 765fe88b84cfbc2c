"""Pure-stdlib baseline-JPEG codec: real image decode, zero deps.

Closes the last fake-decoder media kind (round-9 verdict ask #5): PNG
(functions/png.py) and WAV (functions/wav.py) already decode real
bytes; this adds ITU-T T.81 baseline sequential JPEG — marker parse,
DHT canonical-Huffman entropy decode, dequantize, 8×8 inverse DCT,
level shift, and libjpeg-style FIXED-POINT YCbCr→RGB — all from the
public spec, in plain Python.

Scope (raises ``ValueError`` outside it, so callers can fall back to
``multimodal.set_decoder``):
- baseline DCT (SOF0), 8-bit precision
- 1 component (grayscale) or 3 components (YCbCr) with ALL sampling
  factors 1×1 (4:4:4) — no chroma subsampling
- restart intervals (DRI / RSTn) supported
- APPn/COM ancillary segments skipped; progressive (SOF2),
  arithmetic coding, and hierarchical modes rejected

Exactness contract (what makes a DuckDB oracle possible for a LOSSY
format): an image whose 8×8 blocks are each a CONSTANT sample value,
encoded with unity quantization tables, has DC-only coefficient
blocks (DC = 8·(v−128), all AC = 0).  The IDCT of a DC-only block is
exactly DC/8 in IEEE arithmetic (every cosine term is multiplied by
zero), so decode returns v bit-exactly — and the color transform
below is INTEGER fixed-point, so RGB output is exact integer
arithmetic on (Y, Cb, Cr) that SQL replays to the bit:

    R = clamp(Y + ((91881·(Cr−128) + 32768) >> 16))
    G = clamp(Y − ((22554·(Cb−128) + 46802·(Cr−128) + 32768) >> 16))
    B = clamp(Y + ((116130·(Cb−128) + 32768) >> 16))

(">>" is an ARITHMETIC shift = floor division by 2^16; constants are
round(c·2^16) of the CCIR 601 factors, the libjpeg convention.)

The per-coefficient Python loops are the honest slow path, fine for
fixture-scale payloads and correctness gates; at cluster scale a
C-backed codec (PIL/libjpeg-turbo) replaces ``decode_jpeg`` behind
the identical signature while the Arrow batching around it stays.
"""

from __future__ import annotations

import math
import struct

# fixed-point CCIR 601 color constants, round(c * 65536)
_FIX_R_CR = 91881  # 1.402
_FIX_G_CB = 22554  # 0.344136
_FIX_G_CR = 46802  # 0.714136
_FIX_B_CB = 116130  # 1.772

# zigzag index -> (row, col) raster position
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# IDCT basis: _COS[u][x] = C(u) * cos((2x+1)uπ/16) with C(0)=1/√2
_COS = [
    [
        (1.0 / math.sqrt(2.0) if u == 0 else 1.0)
        * math.cos((2 * x + 1) * u * math.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
]


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def idct_8x8(coeffs: list[int]) -> list[int]:
    """Inverse 8×8 DCT of a RASTER-ordered coefficient block →
    64 raster samples, level-shifted (+128) and clamped to 0..255.
    Separable two-pass float implementation; DC-only blocks come out
    exactly DC/8 + 128 (see module docstring)."""
    # rows: for each row v of the coefficient block, transform over u
    tmp = [0.0] * 64
    for v in range(8):
        base = v * 8
        row = coeffs[base : base + 8]
        if not any(row):
            continue
        for x in range(8):
            s = 0.0
            for u in range(8):
                c = row[u]
                if c:
                    s += c * _COS[u][x]
            tmp[base + x] = s
    out = [0] * 64
    for x in range(8):
        col = [tmp[v * 8 + x] for v in range(8)]
        for y in range(8):
            s = 0.0
            for v in range(8):
                c = col[v]
                if c:
                    s += c * _COS[v][y]
            out[y * 8 + x] = _clamp(int(round(s / 4.0)) + 128)
    return out


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                self.bits = (self.bits << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:
                    self.marker = nxt
                    continue  # don't consume; padding zeros from here
            else:
                self.pos += 1
            self.bits = ((self.bits << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_sync_rst(self, expected: int) -> None:
        """Byte-align and consume the next RSTn marker (restart
        interval boundary)."""
        self.bits = 0
        self.nbits = 0
        if self.marker is None:
            # marker not yet hit while filling: scan forward
            while self.pos + 1 < len(self.data):
                if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                    self.marker = self.data[self.pos + 1]
                    break
                self.pos += 1
        if self.marker is None or not 0xD0 <= self.marker <= 0xD7:
            raise ValueError("expected restart marker in entropy stream")
        if (self.marker & 7) != (expected & 7):
            raise ValueError("restart marker out of sequence")
        self.pos += 2
        self.marker = None


def _build_huffman(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman table → {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, size: int) -> int:
    """DC/AC magnitude decode: T.81 EXTEND — ``size``-bit value ``v``
    maps to v if the high bit is set, else v − (2^size − 1)."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> dict:
    """Decode a baseline JPEG byte string → ``{width, height,
    channels, pixels}`` with ``pixels`` a ``bytes`` of
    width·height·channels interleaved samples (gray, or RGB via the
    fixed-point transform in the module docstring).  Raises
    ``ValueError`` on non-JPEG bytes or features outside scope —
    the decode boundary converts the low-level errors a CORRUPTED
    stream can reach (short unpack, out-of-range table id, truncated
    Huffman spec) into that contract, because the strict-mode
    dispatch and the MJPEG-AVI fallback both key on ValueError
    (mutation-fuzzed in tests/test_codec_fuzz.py; round 11)."""
    try:
        return _decode_jpeg(data)
    except (IndexError, KeyError, struct.error) as e:
        raise ValueError(
            f"malformed JPEG stream: {type(e).__name__}: {e}"
        ) from e


def _decode_jpeg(data: bytes) -> dict:
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None  # (height, width, comps) comps: list of (cid, h, v, tq)
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        # T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes —
        # skip them so the segment length is read from the right offset
        while pos + 4 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(data):
            break
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    vals = list(seg[p : p + 64])
                    p += 64
                else:
                    vals = list(struct.unpack(">64H", seg[p : p + 128]))
                    p += 128
                if len(vals) != 64:
                    raise ValueError("truncated DQT")
                qt[tq] = vals
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                huffval = list(seg[p + 17 : p + 17 + n])
                p += 17 + n
                tbl = _build_huffman(bits, huffval)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
        elif marker == 0xC0:  # SOF0 baseline
            prec = seg[0]
            if prec != 8:
                raise ValueError(f"unsupported precision {prec}")
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            comps = []
            for c in range(nc):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                tq = seg[8 + 3 * c]
                if hv != 0x11:
                    raise ValueError(
                        "unsupported sampling factors (4:4:4 only); "
                        "subsampled JPEG needs a C codec via "
                        "multimodal.set_decoder"
                    )
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG mode (baseline SOF0 only)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs = seg[1 + 2 * c]
                td, ta = seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 0x0F
                scan.append((cs, td, ta))
            height, width, comps = frame
            if ns != len(comps):
                raise ValueError("partial scans unsupported (baseline single scan)")
            by_id = {cid: tq for cid, tq in comps}
            planes = _decode_scan(
                data, pos + 2 + seglen, width, height, comps, scan,
                qt, huff_dc, huff_ac, restart_interval, by_id,
            )
            return _planes_to_pixels(planes, width, height)
        # APPn / COM / anything ancillary: skip
        pos += 2 + seglen
    raise ValueError("missing SOS scan")


def _decode_scan(
    data, pos, width, height, comps, scan, qt, huff_dc, huff_ac,
    restart_interval, by_id,
):
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    br = _BitReader(data, pos)
    planes = {cid: [[None] * bw for _ in range(bh)] for cid, _ in comps}
    pred = {cid: 0 for cid, _ in comps}
    mcu = 0
    rst = 0
    for byy in range(bh):
        for bxx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.align_and_sync_rst(0xD0 + rst)
                rst = (rst + 1) & 7
                pred = {cid: 0 for cid, _ in comps}
            for cs, td, ta in scan:
                tq = by_id[cs]
                if tq not in qt or td not in huff_dc or ta not in huff_ac:
                    raise ValueError("scan references undefined table")
                q = qt[tq]
                zz = [0] * 64
                s = _huff_decode(br, huff_dc[td])
                if s > 11:
                    raise ValueError("invalid DC category")
                diff = _extend(br.read_bits(s), s)
                pred[cs] += diff
                zz[0] = pred[cs]
                k = 1
                while k < 64:
                    rs = _huff_decode(br, huff_ac[ta])
                    r, sz = rs >> 4, rs & 0x0F
                    if sz == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC run past end of block")
                    zz[k] = _extend(br.read_bits(sz), sz)
                    k += 1
                raster = [0] * 64
                for i in range(64):
                    raster[ZIGZAG[i]] = zz[i] * q[i]
                planes[cs][byy][bxx] = idct_8x8(raster)
            mcu += 1
    return [planes[cid] for cid, _ in comps]


def _planes_to_pixels(planes, width, height):
    nc = len(planes)
    out = bytearray(width * height * (3 if nc == 3 else 1))
    for y in range(height):
        byy, iy = y >> 3, y & 7
        for x in range(width):
            bxx, ix = x >> 3, x & 7
            if nc == 1:
                out[y * width + x] = planes[0][byy][bxx][iy * 8 + ix]
            else:
                Y = planes[0][byy][bxx][iy * 8 + ix]
                cb = planes[1][byy][bxx][iy * 8 + ix] - 128
                cr = planes[2][byy][bxx][iy * 8 + ix] - 128
                o = (y * width + x) * 3
                out[o] = _clamp(Y + ((_FIX_R_CR * cr + 32768) >> 16))
                out[o + 1] = _clamp(
                    Y - ((_FIX_G_CB * cb + _FIX_G_CR * cr + 32768) >> 16)
                )
                out[o + 2] = _clamp(Y + ((_FIX_B_CB * cb + 32768) >> 16))
    return {
        "width": width,
        "height": height,
        "channels": 3 if nc == 3 else 1,
        "pixels": bytes(out),
    }


# ---------------------------------------------------------------------------
# Encoder (fixture-grade): arbitrary pre-quantized coefficient blocks
# ---------------------------------------------------------------------------

# Compact VALID Huffman tables for encoding (decoder reads tables from
# DHT, so any consistent tables are spec-legal): DC categories 0..11
# at 4 bits each; AC symbols at 5 bits each — EOB, ZRL, and the
# (run,size) combos the fixture/test coefficients use.
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 7)
]
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, len(_ENC_AC_SYMS)] + [0] * 9
_ENC_AC_VALS = list(_ENC_AC_SYMS)


def _enc_codes(bits, vals):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (length, code)
            k += 1
            code += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, length: int, code: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def align(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits per T.81


def _category(v: int) -> int:
    return abs(v).bit_length()


def encode_jpeg_from_coeffs(
    width: int,
    height: int,
    comp_coeffs: list[list[list[list[int]]]],
    comment: bytes | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Assemble a spec-compliant baseline JPEG from PRE-QUANTIZED
    zigzag coefficient blocks (unity quantization tables), one block
    grid per component (1 = gray, 3 = YCbCr 4:4:4).
    ``comp_coeffs[c][by][bx]`` is a 64-list in ZIGZAG order.  The
    fixture generator feeds DC-only blocks (exact decode — module
    docstring); tests feed AC-bearing blocks to exercise the full
    entropy/IDCT path."""
    nc = len(comp_coeffs)
    if nc not in (1, 3):
        raise ValueError("1 or 3 components")
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    dc_codes = _enc_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _enc_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    if comment is not None:
        out += b"\xff\xfe" + struct.pack(">H", len(comment) + 2) + comment
    # DQT: unity tables 0 (and 1 when color)
    for tq in range(1 if nc == 1 else 2):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + b"\x01" * 64
    # SOF0
    comps = []
    for c in range(nc):
        comps.append(bytes([c + 1, 0x11, 0 if c == 0 else 1]))
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([nc]) + b"".join(comps)
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT: same compact tables for ids 0 and (color) 1
    for th in range(1 if nc == 1 else 2):
        body = bytes([0x00 | th]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
        body = bytes([0x10 | th]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([nc])
    for c in range(nc):
        th = 0 if c == 0 else 1
        sos += bytes([c + 1, (th << 4) | th])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    # entropy-coded data
    bwr = _BitWriter()
    pred = [0] * nc
    mcu = 0
    rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bwr.align()
                out += bwr.out
                bwr = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = [0] * nc
            for c in range(nc):
                zz = comp_coeffs[c][by][bx]
                diff = zz[0] - pred[c]
                pred[c] = zz[0]
                s = _category(diff)
                if s > 11:
                    raise ValueError("DC difference out of range")
                ln, code = dc_codes[s]
                bwr.write(ln, code)
                if s:
                    v = diff if diff > 0 else diff + (1 << s) - 1
                    bwr.write(s, v)
                # AC
                run = 0
                last_nz = 0
                for k in range(63, 0, -1):
                    if zz[k]:
                        last_nz = k
                        break
                for k in range(1, last_nz + 1):
                    v = zz[k]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = ac_codes[0xF0]
                        bwr.write(ln, code)
                        run -= 16
                    sz = _category(v)
                    sym = (run << 4) | sz
                    if sym not in ac_codes:
                        raise ValueError(
                            f"AC (run,size) symbol {sym:#x} not in the "
                            "compact encoder table"
                        )
                    ln, code = ac_codes[sym]
                    bwr.write(ln, code)
                    bwr.write(sz, v if v > 0 else v + (1 << sz) - 1)
                    run = 0
                if last_nz < 63:
                    ln, code = ac_codes[0x00]
                    bwr.write(ln, code)
            mcu += 1
    bwr.align()
    out += bwr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def const_block_coeffs(values: list[list[int]]) -> list[list[list[int]]]:
    """Block grid of constant sample ``values[by][bx]`` (0..255) →
    DC-only zigzag coefficient grid (DC = 8·(v−128)) for
    :func:`encode_jpeg_from_coeffs`; decodes back to v bit-exactly
    under unity quantization."""
    return [
        [[8 * (v - 128)] + [0] * 63 for v in row]
        for row in values
    ]


def rgb_sums(decoded: dict) -> tuple[int, int, int, int]:
    """Exact integer per-channel sums ``(sum_r, sum_g, sum_b,
    n_pixels)`` of a decoded image; grayscale counts its single
    channel into all three sums (r = g = b = Y), mirroring the x417
    oracle's arithmetic."""
    px = decoded["pixels"]
    n = decoded["width"] * decoded["height"]
    if decoded["channels"] == 1:
        s = sum(px)
        return s, s, s, n
    return sum(px[0::3]), sum(px[1::3]), sum(px[2::3]), n
