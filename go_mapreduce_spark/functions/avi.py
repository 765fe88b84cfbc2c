"""Pure-stdlib AVI codec: real VIDEO decode with zero dependencies.

Closes the last media kind that still had only a fake decoder: PNG
(functions/png.py), WAV (functions/wav.py) and baseline JPEG
(functions/jpeg.py) already decode real bytes; this adds the one
mainstream VIDEO container a stdlib-only environment can decode for
real — RIFF AVI carrying uncompressed BI_RGB device-independent
bitmap frames (the 'DIB ' handler), per the public Microsoft
AVI/RIFF and BITMAPINFOHEADER specifications.  Any standard player
opens these files; they are what capture tools emit before a
compressor is chosen.

Scope (raises ``ValueError`` outside it, so callers fall back to an
ffmpeg-backed decoder via ``multimodal.set_decoder``):
- one 'vids' stream, handler DIB/raw (``biCompression = 0``, BI_RGB)
  or **MJPG** (round 11: Motion-JPEG — each '00dc' chunk is a
  standalone baseline JPEG, dispatched into functions/jpeg.py's
  decoder; this is the classic intra-frame compressed AVI, so
  "compressed video" is now a REAL decode too)
- 24-bit DIB frames ('00db'/'00dc' chunks: bottom-up BGR rows, each
  row padded to a 4-byte boundary — both normalized to top-down RGB)
- ancillary LIST/JUNK/idx1 segments are skipped; inter-frame codecs
  (cvid/h264/...) are rejected with a clear message, same contract
  as jpeg.py's progressive rejection

Frame timing comes from the stream header's rate/scale pair
(fps = rate/scale), so duration and frame-sampling grids are exact
integer arithmetic — which is what lets the x418 oracle replay the
decode from first principles.

The per-pixel Python loop is the honest slow path for fixture-scale
payloads; at cluster scale an ffmpeg-backed decoder replaces
``decode_avi`` behind the identical signature while the Arrow
batching around it stays.
"""

from __future__ import annotations

import struct


def _expect(cond: bool, msg: str) -> None:
    if not cond:
        raise ValueError(msg)


def decode_avi(data: bytes) -> dict:
    """Decode an uncompressed-RGB or Motion-JPEG AVI byte string →
    ``{width, height, n_frames, rate, scale, codec, frames}`` with
    ``frames`` a list of ``bytes`` (width·height·3 interleaved RGB,
    top-down rows).  Raises ``ValueError`` on non-AVI bytes or
    features outside the supported scope (see module docstring) —
    the decode boundary converts low-level errors a corrupted
    container can reach into that contract (mutation-fuzzed in
    tests/test_codec_fuzz.py)."""
    try:
        return _decode_avi(data)
    except (IndexError, KeyError, struct.error, RecursionError) as e:
        raise ValueError(
            f"malformed AVI stream: {type(e).__name__}: {e}"
        ) from e


def _decode_avi(data: bytes) -> dict:
    _expect(
        len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI ",
        "not an AVI: bad RIFF/AVI signature",
    )
    (declared,) = struct.unpack("<I", data[4:8])
    _expect(declared + 8 <= len(data), "truncated AVI: RIFF size exceeds payload")
    end = 8 + declared

    width = height = None
    n_frames_hdr = None
    rate = scale = None
    bitcount = compression = None
    mjpeg = False
    have_vids = False
    frames: list[bytes] = []

    def walk(pos: int, stop: int) -> None:
        nonlocal width, height, n_frames_hdr, rate, scale
        nonlocal bitcount, compression, have_vids, mjpeg
        while pos + 8 <= stop:
            fourcc = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            _expect(pos + 8 + size <= stop, f"truncated AVI: {fourcc!r} chunk cut short")
            body_start = pos + 8
            if fourcc == b"LIST":
                walk(body_start + 4, body_start + size)  # skip list type tag
            elif fourcc == b"avih":
                _expect(size >= 40, "malformed avih")
                vals = struct.unpack("<10I", data[body_start : body_start + 40])
                n_frames_hdr = vals[4]
                width, height = vals[8], vals[9]
            elif fourcc == b"strh":
                _expect(size >= 48, "malformed strh")
                fcc_type = data[body_start : body_start + 4]
                if fcc_type == b"vids":
                    # mirror the 'auds' rejection: a second video stream
                    # would otherwise decode with the FIRST stream's
                    # geometry (the strf branch below only parses the
                    # first vids strf) — fail loudly instead
                    _expect(
                        not have_vids,
                        "multiple vids streams unsupported (single-video scope)",
                    )
                    have_vids = True
                    handler = data[body_start + 4 : body_start + 8]
                    if handler in (b"MJPG", b"mjpg"):
                        mjpeg = True
                    else:
                        _expect(
                            handler in (b"DIB ", b"\x00\x00\x00\x00", b"RGB "),
                            f"unsupported video handler {handler!r} "
                            "(uncompressed DIB or MJPG only); inter-frame "
                            "codecs need ffmpeg via multimodal.set_decoder",
                        )
                    scale, rate = struct.unpack(
                        "<II", data[body_start + 20 : body_start + 28]
                    )
                elif fcc_type == b"auds":
                    raise ValueError("AVI audio streams unsupported (video-only scope)")
            elif fourcc == b"strf" and have_vids and bitcount is None:
                _expect(size >= 40, "malformed strf/BITMAPINFOHEADER")
                (
                    bisize, biw, bih, planes, bc, comp,
                ) = struct.unpack("<IiiHHI", data[body_start : body_start + 20])
                _expect(bisize >= 40, "malformed BITMAPINFOHEADER")
                if mjpeg:
                    _expect(
                        comp == MJPG_FOURCC,
                        "MJPG stream with non-MJPG biCompression",
                    )
                else:
                    _expect(comp == 0, "unsupported biCompression (BI_RGB only)")
                _expect(bc == 24, f"unsupported bit count {bc} (24-bit only)")
                # negative biHeight = top-down DIB; _decode_dib_frame
                # assumes bottom-up row order, so reject rather than
                # silently decode vertically flipped (round-10 advice)
                _expect(bih > 0, "unsupported top-down DIB (negative biHeight)")
                bitcount, compression = bc, comp
                if width is None:
                    width, height = biw, bih
            elif fourcc in (b"00db", b"00dc"):
                _expect(
                    width is not None and bitcount == 24,
                    "frame chunk before vids strf header",
                )
                if mjpeg:
                    frames.append(
                        _decode_mjpg_frame(
                            data[body_start : body_start + size], width, height
                        )
                    )
                else:
                    frames.append(
                        _decode_dib_frame(data, body_start, size, width, height)
                    )
            # JUNK / idx1 / other stream chunks: skip
            pos = body_start + size + (size % 2)  # chunks are word-aligned

    walk(12, min(len(data), end))
    _expect(have_vids, "missing vids stream header")
    _expect(width is not None and height is not None, "missing dimensions")
    _expect(rate is not None and rate > 0 and scale and scale > 0, "missing rate/scale")
    if n_frames_hdr is not None:
        _expect(
            n_frames_hdr == len(frames),
            f"header declares {n_frames_hdr} frames, movi carries {len(frames)}",
        )
    return {
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "rate": rate,
        "scale": scale,
        "codec": "mjpg" if mjpeg else "rgb",
        "frames": frames,
    }


MJPG_FOURCC = struct.unpack("<I", b"MJPG")[0]  # biCompression for Motion-JPEG


def _decode_mjpg_frame(chunk: bytes, w: int, h: int) -> bytes:
    """One MJPG frame: the chunk body is a standalone baseline JPEG
    (every frame intra-coded — that is what makes Motion-JPEG the one
    compressed video format decodable without inter-frame state).
    Dispatches into functions/jpeg.py and normalizes to the same
    top-down interleaved-RGB contract as DIB frames (grayscale JPEGs
    replicate the single channel)."""
    from go_mapreduce_spark.functions.jpeg import decode_jpeg

    d = decode_jpeg(chunk)
    _expect(
        d["width"] == w and d["height"] == h,
        f"MJPG frame is {d['width']}x{d['height']}, container says {w}x{h}",
    )
    px = d["pixels"]
    if d["channels"] == 3:
        return px
    out = bytearray(w * h * 3)
    out[0::3] = px
    out[1::3] = px
    out[2::3] = px
    return bytes(out)


def _decode_dib_frame(data: bytes, start: int, size: int, w: int, h: int) -> bytes:
    """One BI_RGB frame: bottom-up BGR rows padded to 4 bytes →
    top-down interleaved RGB."""
    stride = (w * 3 + 3) & ~3
    _expect(size >= stride * h, "frame chunk smaller than one DIB image")
    out = bytearray(w * h * 3)
    for y in range(h):
        src = start + (h - 1 - y) * stride
        dst = y * w * 3
        row = data[src : src + w * 3]
        # BGR -> RGB
        out[dst + 0 : dst + w * 3 : 3] = row[2::3]
        out[dst + 1 : dst + w * 3 : 3] = row[1::3]
        out[dst + 2 : dst + w * 3 : 3] = row[0::3]
    return bytes(out)


def frame_rgb_sums(decoded: dict) -> list[tuple[int, int, int]]:
    """Per-frame exact integer channel sums [(sum_r, sum_g, sum_b)] —
    the x418 oracle contract (no float anywhere)."""
    return [
        (sum(f[0::3]), sum(f[1::3]), sum(f[2::3])) for f in decoded["frames"]
    ]


# ---------------------------------------------------------------------------
# Encoder (fixture-grade, spec-compliant output)
# ---------------------------------------------------------------------------


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def _assemble_avi(
    width: int,
    height: int,
    handler: bytes,
    compression: int,
    chunk_id: bytes,
    chunk_bodies: list[bytes],
    buf_size: int,
    rate: int,
    scale: int,
    junk: bool,
) -> bytes:
    """Shared container assembly for both encoders: RIFF('AVI ') with
    hdrl(avih + strl(strh 'vids' + strf BITMAPINFOHEADER)),
    movi(``chunk_id`` chunks), and a proper idx1 index.  The encoders
    differ only in handler/biCompression/chunk id and how they build
    the per-frame chunk bodies; container fixes land here once.
    ``buf_size`` feeds dwMaxBytesPerSec/dwSuggestedBufferSize (the
    fixed DIB frame size for uncompressed, the largest JPEG for MJPG).
    """
    n = len(chunk_bodies)
    avih = struct.pack(
        "<10I",
        1_000_000 * scale // rate,  # dwMicroSecPerFrame
        buf_size * rate // max(scale, 1),  # dwMaxBytesPerSec
        0,  # padding granularity
        0x10,  # AVIF_HASINDEX
        n, 0, 1, buf_size,
        width, height,
    ) + b"\x00" * 16  # dwReserved[4]
    strh = (
        b"vids" + handler + struct.pack("<IHHI", 0, 0, 0, 0)
        + struct.pack("<IIiI", scale, rate, 0, n)
        + struct.pack("<IiI", buf_size, -1, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, compression, buf_size, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks = []
    offsets = []
    off = 4  # relative to 'movi' tag start
    for b in chunk_bodies:
        movi_chunks.append(_chunk(chunk_id, b))
        offsets.append((off, len(b)))
        off += 8 + len(b) + (len(b) % 2)
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(
        b"idx1",
        b"".join(
            chunk_id + struct.pack("<III", 0x10, o, sz) for o, sz in offsets
        ),
    )
    body = hdrl
    if junk:
        body += _chunk(b"JUNK", b"\x00" * 24)
    body += movi + idx1
    riff_body = b"AVI " + body
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def encode_avi(
    width: int,
    height: int,
    frames_rgb: list[bytes],
    rate: int = 10,
    scale: int = 1,
    junk: bool = False,
) -> bytes:
    """Assemble a spec-compliant uncompressed AVI from top-down RGB
    frames (``width*height*3`` bytes each): strh 'vids'/DIB, strf
    BI_RGB 24-bit, movi '00db' bottom-up padded BGR frames.
    ``junk=True`` inserts a JUNK chunk to exercise the decoder's
    ancillary walk."""
    stride = (width * 3 + 3) & ~3
    frame_size = stride * height
    for f in frames_rgb:
        if len(f) != width * height * 3:
            raise ValueError("frame byte length != width*height*3")

    def to_dib(f: bytes) -> bytes:
        rows = []
        pad = b"\x00" * (stride - width * 3)
        for y in range(height - 1, -1, -1):
            row = bytearray(width * 3)
            src = f[y * width * 3 : (y + 1) * width * 3]
            row[0::3] = src[2::3]  # B
            row[1::3] = src[1::3]  # G
            row[2::3] = src[0::3]  # R
            rows.append(bytes(row) + pad)
        return b"".join(rows)

    return _assemble_avi(
        width, height, b"DIB ", 0, b"00db",
        [to_dib(f) for f in frames_rgb],
        frame_size, rate, scale, junk,
    )


def encode_avi_mjpeg(
    width: int,
    height: int,
    jpeg_frames: list[bytes],
    rate: int = 10,
    scale: int = 1,
    junk: bool = False,
) -> bytes:
    """Assemble a spec-compliant Motion-JPEG AVI: same RIFF layout as
    ``encode_avi`` but strh handler 'MJPG', strf ``biCompression =
    'MJPG'``, and each '00dc' movi chunk carrying one standalone
    baseline-JPEG byte stream (produced by functions/jpeg.py's
    encoder).  This is the round-11 composition that makes
    "compressed video" a real decode: container walk from this
    module, per-frame entropy decode from jpeg.py."""
    for f in jpeg_frames:
        if len(f) < 4 or f[0:2] != b"\xff\xd8":
            raise ValueError("MJPG frame is not a JPEG byte stream")
    max_size = max(len(f) for f in jpeg_frames) if jpeg_frames else 0
    return _assemble_avi(
        width, height, b"MJPG", MJPG_FOURCC, b"00dc",
        list(jpeg_frames), max_size, rate, scale, junk,
    )
