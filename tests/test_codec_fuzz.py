"""Mutation fuzz of the stdlib codecs' error contract (round 11).

Every decoder documents "raises ValueError outside scope" — and the
strict-mode decoder dispatch, the MJPEG-AVI frame fallback, and any
future set_decoder chaining all key on exactly that.  Round-11
fuzzing found corrupted streams escaping with IndexError / KeyError /
struct.error / zlib.error instead (a mutated table id, a short
unpack, a broken inflate), which would kill an executor task rather
than classify the payload as malformed.  The decode boundaries now
convert those; this test pins the contract with seeded random
mutations of genuine payloads: a decode either succeeds or raises
ValueError — nothing else, ever.
"""

from __future__ import annotations

import random

import pytest

from go_mapreduce_spark.functions.avi import (
    decode_avi,
    encode_avi,
    encode_avi_mjpeg,
)
from go_mapreduce_spark.functions.jpeg import (
    const_block_coeffs,
    decode_jpeg,
    encode_jpeg_from_coeffs,
)
from go_mapreduce_spark.functions.png import decode_png, encode_png
from go_mapreduce_spark.functions.wav import decode_wav, encode_wav

TRIALS = 800


def _bases():
    rng = random.Random(13)
    rgb = bytes(rng.randrange(256) for _ in range(8 * 6 * 3))
    jpg = encode_jpeg_from_coeffs(
        16,
        16,
        [const_block_coeffs([[40, 90], [10, 200]])],
        restart_interval=2,
    )
    color_jpg = encode_jpeg_from_coeffs(
        16,
        8,
        [
            const_block_coeffs([[100, 150]]),
            const_block_coeffs([[120, 130]]),
            const_block_coeffs([[140, 90]]),
        ],
    )
    return [
        ("png", encode_png(8, 6, 2, rgb), decode_png),
        (
            "wav",
            encode_wav(8000, 2, 16, [rng.randrange(-30000, 30000) for _ in range(300)]),
            decode_wav,
        ),
        ("jpeg", jpg, decode_jpeg),
        (
            "avi",
            encode_avi(5, 4, [bytes([10, 20, 30] * 20), bytes([9, 8, 7] * 20)], junk=True),
            decode_avi,
        ),
        ("mjpeg", encode_avi_mjpeg(16, 8, [color_jpg], junk=True), decode_avi),
    ]


@pytest.mark.parametrize("name,base,fn", _bases(), ids=lambda v: v if isinstance(v, str) else "")
def test_mutated_payloads_raise_only_valueerror(name, base, fn):
    # the pristine payload must decode (the fuzz is meaningful only
    # against a valid baseline)
    fn(base)
    rng = random.Random(hash(name) & 0xFFFF)
    escaped = []
    for trial in range(TRIALS):
        data = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            data[rng.randrange(len(data))] = rng.randrange(256)
        try:
            fn(bytes(data))
        except ValueError:
            pass
        except Exception as e:  # noqa: BLE001 - the contract under test
            escaped.append((trial, type(e).__name__, str(e)[:80]))
    assert not escaped, escaped[:5]


def test_truncations_raise_only_valueerror():
    for name, base, fn in _bases():
        for cut in range(0, len(base), max(1, len(base) // 64)):
            try:
                fn(base[:cut])
            except ValueError:
                pass
            except Exception as e:  # noqa: BLE001
                raise AssertionError(
                    f"{name} truncated at {cut}: {type(e).__name__}: {e}"
                ) from e
