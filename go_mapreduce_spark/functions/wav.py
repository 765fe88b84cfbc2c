"""Pure-stdlib WAV (RIFF/PCM) codec: real audio decode with zero
dependencies.

WAV is the audio analogue of PNG for a stdlib-only container
(functions/png.py): uncompressed PCM samples in a flat RIFF chunk
list — the format is public (Microsoft/IBM RIFF spec, mirrored in
RFC 2361's WAVE format registry), and decoding needs nothing beyond
``struct``.  This upgrades the multimodal decode plug-point from a
deterministic fake to a working codec for one AUDIO format, the same
step x414 took for images; ffmpeg/soundfile remain the production
path for compressed audio (``multimodal.set_decoder``).

Scope (raises ``ValueError`` outside it, so a caller can fall back):
- audio format 1 (integer PCM), bit depth 8 (unsigned) or 16
  (signed little-endian), any channel count / sample rate
- chunk walking skips ancillary chunks (LIST, fact, ...) with the
  RIFF word-alignment pad; fmt consistency (block align, byte rate)
  and data-chunk framing are validated, truncation fails loudly
- decoded samples are SIGNED ints at either depth (8-bit payload is
  stored excess-128 per the spec; decode recenters to −128..127), so
  feature math is depth-independent

The per-sample ``struct`` unpack is pure Python — the honest slow
path, fine for fixture-scale payloads and correctness gates.  At
cluster scale a C-backed decoder (soundfile/ffmpeg) replaces
``decode_wav`` behind the identical signature; the Arrow batching,
schema, and partition preservation around it are format-independent
and stay.
"""

from __future__ import annotations

import struct


def encode_wav(
    sample_rate: int,
    channels: int,
    bit_depth: int,
    samples: list[int],
    extra_chunks: list[tuple[bytes, bytes]] | None = None,
) -> bytes:
    """Encode interleaved SIGNED integer ``samples`` (len = n_frames ×
    channels) into a canonical PCM WAV byte string.  8-bit input must
    lie in −128..127 (stored excess-128), 16-bit in −32768..32767.
    ``extra_chunks`` prepends ancillary ``(fourcc, body)`` chunks
    before ``data`` — used by tests to exercise the chunk walk."""
    if bit_depth not in (8, 16):
        raise ValueError(f"unsupported bit depth {bit_depth}")
    if channels < 1:
        raise ValueError("channels must be >= 1")
    if len(samples) % channels:
        raise ValueError("sample count is not a whole number of frames")
    block_align = channels * bit_depth // 8
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bit_depth
    )
    if bit_depth == 8:
        # enforce the documented -128..127 contract: the 16-bit path
        # range-checks for free via struct.pack('h'), and a silent
        # (s+128)&0xFF wrap would produce corrupt-but-valid audio
        bad = next((s for s in samples if not -128 <= s <= 127), None)
        if bad is not None:
            raise ValueError(f"8-bit sample {bad} outside -128..127")
        data = bytes((s + 128) & 0xFF for s in samples)
    else:
        data = struct.pack(f"<{len(samples)}h", *samples)
    chunks = [(b"fmt ", fmt)]
    chunks += list(extra_chunks or [])
    chunks.append((b"data", data))
    body = bytearray(b"WAVE")
    for fourcc, payload in chunks:
        body += fourcc + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:  # RIFF chunks are word-aligned
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + bytes(body)


def decode_wav(data: bytes) -> dict:
    """Decode a WAV byte string → ``{sample_rate, channels, bit_depth,
    n_frames, samples}`` with ``samples`` a list of SIGNED ints,
    frame-interleaved (8-bit recentered from excess-128).  Raises
    ``ValueError`` on non-WAV bytes or features outside the supported
    scope (see module docstring) — the decode boundary converts any
    low-level error a corrupted stream could reach into that contract
    (mutation-fuzzed in tests/test_codec_fuzz.py)."""
    try:
        return _decode_wav(data)
    except (IndexError, KeyError, struct.error) as e:
        raise ValueError(
            f"malformed WAV stream: {type(e).__name__}: {e}"
        ) from e


def _decode_wav(data: bytes) -> dict:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE signature")
    declared = struct.unpack("<I", data[4:8])[0]
    if declared + 8 > len(data):
        raise ValueError("truncated WAV: RIFF size exceeds payload")
    # walk only the DECLARED RIFF container: a fmt/data chunk in
    # trailing garbage past it must not be honored
    end = min(len(data), 8 + declared)
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + size > end:
            raise ValueError(f"truncated WAV: {fourcc!r} chunk cut short")
        body = data[pos + 8 : pos + 8 + size]
        if fourcc == b"fmt ":
            if size < 16:
                raise ValueError("malformed fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif fourcc == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt")
            pcm = body
            break  # spec: one data chunk; nothing else needed
        pos += 8 + size + (size % 2)  # skip ancillary, keep word alignment
    if fmt is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, rate, byte_rate, block_align, depth = fmt
    if audio_format != 1:
        raise ValueError(
            f"unsupported WAV audio format {audio_format} (PCM=1 only); "
            "compressed audio needs ffmpeg/soundfile via "
            "multimodal.set_decoder"
        )
    if depth not in (8, 16):
        raise ValueError(f"unsupported bit depth {depth} (8/16 only)")
    if channels < 1:
        raise ValueError("malformed fmt: zero channels")
    if block_align != channels * depth // 8:
        raise ValueError("malformed fmt: block align inconsistent")
    if byte_rate != rate * block_align:
        raise ValueError("malformed fmt: byte rate inconsistent")
    if len(pcm) % block_align:
        raise ValueError("data chunk is not a whole number of frames")
    if depth == 8:
        samples = [b - 128 for b in pcm]
    else:
        samples = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
    return {
        "sample_rate": rate,
        "channels": channels,
        "bit_depth": depth,
        "n_frames": len(pcm) // block_align,
        "samples": samples,
    }


def amplitude_stats(decoded: dict) -> tuple[int, int, int]:
    """Exact integer amplitude statistics of a decoded clip:
    ``(sum_abs, peak, n_samples)`` over all channels — the
    depth-independent contract the x415 oracle recomputes from first
    principles."""
    samples = decoded["samples"]
    abs_s = [abs(s) for s in samples]
    return sum(abs_s), max(abs_s, default=0), len(samples)


def amplitude_histogram(decoded: dict, bins: int) -> list[float]:
    """Unit-normalized ``bins``-bin histogram of sample amplitude
    positions within the depth's signed range — the audio analogue of
    the PNG luma histogram feature contract (same FEATURE_DIM
    vector shape, so decoded audio drops into the similarity/dedup
    operators unchanged)."""
    full = 1 << decoded["bit_depth"]
    half = full // 2
    counts = [0] * bins
    for s in decoded["samples"]:
        counts[(s + half) * bins // full] += 1
    norm = sum(c * c for c in counts) ** 0.5 or 1.0
    return [c / norm for c in counts]
