"""Tests for the stdlib AVI codec (functions/avi.py) and x418: exact
frame round-trips, container ancillary walk, scope rejections,
strict-mode routing, and fixture-vs-arithmetic parity."""

from __future__ import annotations

import struct

import pytest

from go_mapreduce_spark.functions.avi import (
    decode_avi,
    encode_avi,
    frame_rgb_sums,
)


def _const_frames(w, h, colors):
    return [bytes([r, g, b] * (w * h)) for r, g, b in colors]


def test_constant_frames_roundtrip_exact():
    w, h = 5, 3
    frames = _const_frames(w, h, [(10, 20, 30), (200, 100, 0), (255, 255, 255)])
    d = decode_avi(encode_avi(w, h, frames, rate=12, scale=1))
    assert (d["width"], d["height"], d["n_frames"]) == (w, h, 3)
    assert (d["rate"], d["scale"]) == (12, 1)
    assert d["frames"] == frames
    assert frame_rgb_sums(d) == [
        (150, 300, 450),
        (3000, 1500, 0),
        (3825, 3825, 3825),
    ]


def test_gradient_frame_roundtrip_exact():
    """Non-constant content: exercises BGR swap, bottom-up row order,
    and 4-byte stride padding (w=5 -> 15-byte rows padded to 16)."""
    w, h = 5, 4
    grad = bytes(
        (3 * x + 7 * y + 11 * c) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    d = decode_avi(encode_avi(w, h, [grad]))
    assert d["frames"][0] == grad


def test_junk_chunk_skipped():
    w, h = 4, 3
    frames = _const_frames(w, h, [(1, 2, 3), (4, 5, 6)])
    d = decode_avi(encode_avi(w, h, frames, junk=True))
    assert d["frames"] == frames


def test_width_multiple_of_4_no_padding():
    w, h = 8, 2  # 24-byte rows, no stride padding
    frames = _const_frames(w, h, [(9, 8, 7)])
    assert decode_avi(encode_avi(w, h, frames))["frames"] == frames


def test_non_avi_rejected():
    with pytest.raises(ValueError, match="signature"):
        decode_avi(b"RIFF" + struct.pack("<I", 8) + b"WAVExxxx")


def test_compressed_handler_rejected():
    data = bytearray(encode_avi(4, 3, _const_frames(4, 3, [(1, 1, 1)])))
    i = data.find(b"DIB ")
    data[i : i + 4] = b"cvid"
    with pytest.raises(ValueError, match="handler"):
        decode_avi(bytes(data))


def test_audio_stream_rejected():
    data = bytearray(encode_avi(4, 3, _const_frames(4, 3, [(1, 1, 1)])))
    i = data.find(b"vids")
    data[i : i + 4] = b"auds"
    with pytest.raises(ValueError, match="audio"):
        decode_avi(bytes(data))


def test_second_vids_stream_rejected():
    # round-11 advice: a second 'vids' strh must fail loudly, not
    # silently decode with the first stream's geometry (mirror of the
    # 'auds' rejection)
    base = encode_avi(4, 3, _const_frames(4, 3, [(1, 1, 1)]))
    strh2 = b"vids" + b"DIB " + b"\x00" * 40
    body = base[8:] + b"strh" + struct.pack("<I", len(strh2)) + strh2
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="multiple vids"):
        decode_avi(data)


def test_frame_count_mismatch_rejected():
    w, h = 4, 3
    data = bytearray(encode_avi(w, h, _const_frames(w, h, [(1, 1, 1), (2, 2, 2)])))
    # corrupt the avih dwTotalFrames (5th uint32 of the avih body)
    i = data.find(b"avih") + 8 + 16
    data[i : i + 4] = struct.pack("<I", 9)
    with pytest.raises(ValueError, match="frames"):
        decode_avi(bytes(data))


def test_strict_mode_decodes_avi_format():
    import pandas as pd

    from go_mapreduce_spark.operators.multimodal import make_decode_batch

    payload = encode_avi(4, 3, _const_frames(4, 3, [(30, 60, 90), (120, 150, 180)]))
    fn = make_decode_batch("strict")
    out = list(
        fn(
            iter(
                [
                    pd.DataFrame(
                        {
                            "media_id": [1],
                            "kind": ["video"],
                            "format": ["avi"],
                            "payload": [payload],
                            "width": [4],
                            "height": [3],
                            "duration_ms": [200],
                        }
                    )
                ]
            )
        )
    )
    feats = out[0]["features"][0]
    assert abs(sum(x * x for x in feats) - 1.0) < 1e-9


def test_strict_mode_still_raises_for_mp4():
    import pandas as pd

    from go_mapreduce_spark.operators.multimodal import make_decode_batch

    fn = make_decode_batch("strict")
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        list(
            fn(
                iter(
                    [
                        pd.DataFrame(
                            {
                                "media_id": [1],
                                "kind": ["video"],
                                "format": ["mp4"],
                                "payload": [b"\x00" * 64],
                                "width": [-1],
                                "height": [-1],
                                "duration_ms": [1000],
                            }
                        )
                    ]
                )
            )
        )


def test_fixture_payloads_decode_and_match_contract():
    import os

    import pyarrow.parquet as pq

    from go_mapreduce_spark.operators.multimodal import AVI_FIXTURE_PATH

    assert os.path.exists(AVI_FIXTURE_PATH)
    t = pq.read_table(AVI_FIXTURE_PATH).to_pydict()
    assert len(t["media_id"]) == 48
    for i, payload in zip(t["media_id"], t["payload"]):
        d = decode_avi(bytes(payload))
        assert d["width"] == 4 + i % 9
        assert d["height"] == 3 + i % 5
        assert d["n_frames"] == 2 + i % 4
        assert d["rate"] == (10, 24, 30)[i % 3]
        sums = frame_rgb_sums(d)
        wh = d["width"] * d["height"]
        for tdx, (sr, sg, sb) in enumerate(sums):
            assert sr == (((i * 37) % 251 + 7 * tdx) % 256) * wh
            assert sg == (((i * 53) % 199 + 11 * tdx) % 256) * wh
            assert sb == (((i * 29) % 173 + 13 * tdx) % 256) * wh


def test_topdown_dib_rejected():
    """Negative biHeight (top-down DIB) would decode vertically flipped
    under the bottom-up row walk — must raise, not silently flip."""
    w, h = 4, 3
    data = bytearray(encode_avi(w, h, _const_frames(w, h, [(1, 2, 3)])))
    i = data.find(b"strf") + 8  # BITMAPINFOHEADER: biSize, biWidth, biHeight
    data[i + 8 : i + 12] = struct.pack("<i", -h)
    with pytest.raises(ValueError, match="top-down"):
        decode_avi(bytes(data))
