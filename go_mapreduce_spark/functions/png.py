"""Pure-stdlib PNG codec: real image decode with zero dependencies.

PNG is the one mainstream media format a container with only the
Python standard library can decode for real: the pixel stream is
zlib-compressed (``zlib`` is stdlib) behind a byte-level predictor
("filter") per scanline, and the container is a flat chunk list —
RFC 2083 / the W3C PNG spec, all public.  This upgrades the
multimodal operators' decode plug-point from a deterministic fake to
a working codec for one format; PIL/ffmpeg remain the production
path for everything else (``multimodal.set_decoder``).

Scope (raises ``ValueError`` outside it, so a caller can fall back):
- bit depth 8, interlace 0 (non-interlaced)
- color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
  6 (RGBA); palette output is expanded to RGB
- ancillary chunks are skipped; CRCs are verified on critical chunks

The per-byte unfilter loop is pure Python — the honest slow path,
fine for fixture-scale payloads and correctness gates.  At cluster
scale the same ``decode_png`` signature is what a C-backed codec
(PIL) replaces; everything around it (Arrow batching, schema,
partition preservation) is format-independent and stays.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> channels in the RAW (pre-palette) pixel stream
_RAW_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# color type -> channels in the DECODED output (palette -> RGB)
OUT_CHANNELS = {0: 1, 2: 3, 3: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG filter 4): nearest of left/up/up-left to
    the linear estimate a + b − c, ties toward a then b."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> dict:
    """Decode a PNG byte string → ``{width, height, channels,
    bit_depth, color_type, pixels}`` with ``pixels`` a ``bytes`` of
    ``width*height*channels`` interleaved samples (palette expanded
    to RGB).  Raises ``ValueError`` on non-PNG bytes or features
    outside the supported scope (see module docstring) — the decode
    boundary converts low-level errors a corrupted stream can reach
    (short unpack, zlib inflate failure, bad filter index) into that
    contract (mutation-fuzzed in tests/test_codec_fuzz.py)."""
    import struct as _struct
    import zlib as _zlib

    try:
        return _decode_png(data)
    except (IndexError, KeyError, _struct.error, _zlib.error) as e:
        raise ValueError(
            f"malformed PNG stream: {type(e).__name__}: {e}"
        ) from e


def _decode_png(data: bytes) -> dict:
    if len(data) < 8 or data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    plte = b""
    idat_parts = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        crc = data[pos + 8 + length : pos + 12 + length]
        if ctype in (b"IHDR", b"PLTE", b"IDAT", b"IEND"):
            if struct.unpack(">I", crc)[0] != zlib.crc32(ctype + body):
                raise ValueError(f"bad CRC on {ctype.decode()} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat_parts.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, bit_depth, color_type, comp, filt, interlace = ihdr
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
    if color_type not in _RAW_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if not idat_parts:
        raise ValueError("PNG missing IDAT")
    raw = zlib.decompress(b"".join(idat_parts))
    ch = _RAW_CHANNELS[color_type]
    stride = width * ch
    if len(raw) != height * (1 + stride):
        raise ValueError("PNG pixel stream has wrong length")

    recon = bytearray(height * stride)
    prev_off = -stride
    for y in range(height):
        f = raw[y * (1 + stride)]
        line = raw[y * (1 + stride) + 1 : (y + 1) * (1 + stride)]
        off = y * stride
        if f == 0:
            recon[off : off + stride] = line
        elif f == 1:  # Sub
            for i in range(stride):
                a = recon[off + i - ch] if i >= ch else 0
                recon[off + i] = (line[i] + a) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                b = recon[prev_off + i] if y > 0 else 0
                recon[off + i] = (line[i] + b) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = recon[off + i - ch] if i >= ch else 0
                b = recon[prev_off + i] if y > 0 else 0
                recon[off + i] = (line[i] + (a + b) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = recon[off + i - ch] if i >= ch else 0
                b = recon[prev_off + i] if y > 0 else 0
                c = recon[prev_off + i - ch] if (y > 0 and i >= ch) else 0
                recon[off + i] = (line[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        prev_off = off

    if color_type == 3:
        if not plte or len(plte) % 3:
            raise ValueError("palette PNG missing/odd PLTE")
        n_pal = len(plte) // 3
        out = bytearray(width * height * 3)
        for i, idx in enumerate(recon):
            if idx >= n_pal:
                raise ValueError("palette index out of range")
            out[3 * i : 3 * i + 3] = plte[3 * idx : 3 * idx + 3]
        pixels = bytes(out)
    else:
        pixels = bytes(recon)
    return {
        "width": width,
        "height": height,
        "channels": OUT_CHANNELS[color_type],
        "bit_depth": bit_depth,
        "color_type": color_type,
        "pixels": pixels,
    }


def luma_stats(decoded: dict) -> tuple[int, int]:
    """(sum of per-pixel luma, pixel count) from a :func:`decode_png`
    result — exact integers, so downstream means are deterministic.
    Luma: the sample itself for gray / gray+alpha; the integer ITU
    601 mix ``(299·R + 587·G + 114·B) // 1000`` for RGB(A) (weights
    sum to exactly 1000, so an (g,g,g) pixel maps back to g)."""
    px, ch = decoded["pixels"], decoded["channels"]
    n = decoded["width"] * decoded["height"]
    if ch <= 2:
        total = sum(px[i * ch] for i in range(n))
    else:
        total = sum(
            (299 * px[i * ch] + 587 * px[i * ch + 1] + 114 * px[i * ch + 2])
            // 1000
            for i in range(n)
        )
    return total, n


def gray_histogram(decoded: dict, bins: int = 16) -> list[float]:
    """Unit-normalized ``bins``-bin luma histogram — the same feature
    contract as the PIL-backed decoder (multimodal._pil_features)."""
    px, ch = decoded["pixels"], decoded["channels"]
    n = decoded["width"] * decoded["height"]
    step = 256 // bins
    hist = [0] * bins
    for i in range(n):
        if ch <= 2:
            l = px[i * ch]
        else:
            l = (
                299 * px[i * ch] + 587 * px[i * ch + 1] + 114 * px[i * ch + 2]
            ) // 1000
        hist[l // step] += 1
    norm = sum(x * x for x in hist) ** 0.5 or 1.0
    return [x / norm for x in hist]


# ---------------------------------------------------------------------------
# Encoder — fixture/test side (round-trips the decoder; also how the
# committed PNG fixture is generated, tools/make_png_fixture.py)
# ---------------------------------------------------------------------------


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def encode_png(
    width: int,
    height: int,
    color_type: int,
    pixels: bytes,
    palette: bytes = b"",
    filter_per_line=None,
) -> bytes:
    """Encode interleaved 8-bit samples into a PNG.  ``pixels`` holds
    the RAW stream (palette indices for color type 3, ``palette`` the
    flat RGB table).  ``filter_per_line(y) -> 0..4`` picks each
    scanline's filter (default cycles ``y % 5`` so every unfilter
    branch gets exercised by round-trip tests); the filtered bytes
    are computed from the raw ones, so any choice decodes back
    identically."""
    ch = _RAW_CHANNELS[color_type]
    stride = width * ch
    if len(pixels) != height * stride:
        raise ValueError("pixel buffer does not match width*height*channels")
    if filter_per_line is None:
        filter_per_line = lambda y: y % 5  # noqa: E731
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        f = filter_per_line(y)
        out.append(f)
        if f == 0:
            out += line
        else:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) // 2
                elif f == 4:
                    pred = _paeth(a, b, c)
                else:
                    raise ValueError(f"unknown filter {f}")
                out.append((line[i] - pred) & 0xFF)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    parts = [_SIGNATURE, _chunk(b"IHDR", ihdr)]
    if color_type == 3:
        parts.append(_chunk(b"PLTE", palette))
    parts.append(_chunk(b"IDAT", zlib.compress(bytes(out), 9)))
    parts.append(_chunk(b"IEND", b""))
    return b"".join(parts)
