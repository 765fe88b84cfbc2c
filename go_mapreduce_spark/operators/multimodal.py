"""Multimodal column support: binary payloads + typed metadata.

Design (north-star extension, BASELINE.json:6): image/audio/video
payloads travel as opaque ``binary`` columns with a typed metadata
struct alongside; decode / feature-extract / resize / frame-sample
run as Arrow-batched Pandas functions over ``mapInPandas``.

The actual codec work is STUBBED — image/audio libraries are not in
this container — behind ``set_decoder``:
- default ``"fake"`` decoder: deterministic, pure-Python header parse
  + content-hash features (real Spark plumbing, fake pixels);
- ``"strict"`` raises NotImplementedError, marking exactly where a
  real codec (PIL/ffmpeg) plugs in.

What IS real and tested: the schema contract, the Arrow batch path,
partition-preserving execution, and batch-shape independence (results
must not depend on how rows land in batches/partitions — the property
that matters at 100 TB when batch boundaries are arbitrary).
"""

from __future__ import annotations

import hashlib
import os
import struct as _struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("format", StringType()),     # png | wav | mp4 | ...
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),     # -1 when unknown/not applicable
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_DIM = 16

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("format", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_sha", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

_DECODER_MODE = "fake"


def pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def set_decoder(mode: str) -> None:
    """Select the decode implementation:

    - ``'fake'`` (default): deterministic stub — header parse +
      content-hash features.  Keeps the x35 oracle reproducible
      anywhere, codecs or not.
    - ``'strict'``: raises NotImplementedError at decode time,
      marking exactly where a real codec plugs in.
    - ``'pil'``: real image decode via Pillow (true width/height +
      16-bin grayscale-histogram features); non-image kinds keep the
      fake features.  Registration fails fast with ImportError if
      Pillow isn't importable on the driver (executors import it per
      worker — install the wheel cluster-wide, same discipline as
      any Python dependency).
    """
    global _DECODER_MODE
    if mode not in ("fake", "strict", "pil"):
        raise ValueError("decoder mode must be 'fake', 'strict', or 'pil'")
    if mode == "pil" and not pil_available():
        raise ImportError(
            "set_decoder('pil') requires Pillow; it is not importable here — "
            "install it or stay on the deterministic 'fake' decoder"
        )
    _DECODER_MODE = mode


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic unit-norm feature vector from a content hash.

    Stands in for a real encoder; byte-identical across machines so
    downstream similarity tests are reproducible.
    """
    h = hashlib.sha256(payload).digest()
    raw = [
        _struct.unpack(">h", h[2 * i : 2 * i + 2])[0] / 32768.0
        for i in range(FEATURE_DIM)
    ]
    norm = sum(x * x for x in raw) ** 0.5 or 1.0
    return [float(x / norm) for x in raw]


def make_decode_batch(mode: str):
    """Build the mapInPandas worker fn with the decoder mode captured
    in the closure — module globals set on the driver do NOT reach
    executor processes (they re-import the module), closures pickle
    by value.

    One output row per input row; output depends only on row content,
    never on batch composition.
    """

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "strict":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg; install and register "
                    "a codec-backed decoder via multimodal.set_decoder"
                )
            if mode == "pil":
                features = [
                    _pil_features(bytes(b))
                    if k == "image"
                    else _fake_features(bytes(b))
                    for b, k in zip(pdf["payload"], pdf["kind"])
                ]
            else:
                features = [_fake_features(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "format": pdf["format"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "payload_sha": pdf["payload"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "features": features,
                }
            )

    return decode_batch


def _pil_features(payload: bytes) -> list[float]:
    """Real image features: FEATURE_DIM-bin grayscale histogram,
    unit-normalized.  Import is per-call-site (executor processes
    re-import the module; Pillow must be installed there)."""
    import io

    import PIL.Image

    img = PIL.Image.open(io.BytesIO(payload)).convert("L")
    hist = img.histogram()  # 256 bins
    step = 256 // FEATURE_DIM
    raw = [float(sum(hist[i * step : (i + 1) * step])) for i in range(FEATURE_DIM)]
    norm = sum(x * x for x in raw) ** 0.5 or 1.0
    return [x / norm for x in raw]


def decode_media(media: DataFrame) -> DataFrame:
    """Decode a MEDIA_SCHEMA DataFrame → DECODED_SCHEMA.

    Arrow-batched (``spark.sql.execution.arrow.maxRecordsPerBatch``
    bounds per-batch memory — size it so batch_bytes ≈ batch_rows ×
    max payload fits the executor); partitioning of the input is
    preserved, so a corpus pre-partitioned by media_id stays
    co-located for downstream joins.
    """
    from go_mapreduce_spark.session import ensure_package_on_executors

    ensure_package_on_executors(media.sparkSession)
    return media.mapInPandas(make_decode_batch(_DECODER_MODE), schema=DECODED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (JVM-side explode of the sample grid; the per-frame
    pixel decode is the stubbed step).

    At scale this is the right shape: the (cheap) frame-grid explode
    happens before the (expensive) decode, so decode parallelism is
    per-frame, not per-video — a 2-hour video fans out to thousands
    of independently-schedulable rows instead of one straggler task.
    """
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        "format",
        "payload",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
    return frames


FIXTURE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
    "media.parquet",
)


def x35_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible multimodal query: decode the committed media
    fixture and emit per-media (kind, format, byte count, payload
    sha256).

    ``sf_dir`` is ignored — media payloads are fixture-scale-
    independent; the committed parquet (tools/make_media_fixture.py)
    gives the DuckDB oracle a stable absolute path, and its
    independent BLOB length/sha computation cross-checks the Arrow
    mapInPandas decode path end-to-end.  The ``features`` vector stays
    pytest-only (its formula is the fake-decoder's, not SQL).
    """
    media = spark.read.parquet(FIXTURE_PATH)
    return (
        decode_media(media)
        .select("media_id", "kind", "format", "n_bytes", "payload_sha")
        .orderBy("media_id")
    )


def synthetic_media(spark, n: int = 64):
    """Deterministic fake media table for tests/demos (seeded bytes)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        fmt = {"image": "png", "audio": "wav", "video": "mp4"}[kind]
        payload = hashlib.sha256(f"media:{i}".encode()).digest() * (4 + i % 5)
        rows.append(
            (
                i,
                kind,
                fmt,
                bytearray(payload),
                64 + i if kind == "image" else -1,
                48 + i if kind == "image" else -1,
                (i + 1) * 3000 if kind == "video" else -1,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def x71_frame_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible frame-sample accounting: per video, the number
    of frame rows the sample grid fans out to (1 frame/second).

    Drives :func:`frame_sample_plan`'s JVM-side sequence-explode
    through the correctness gate — the oracle recomputes the grid
    arithmetic (⌊(duration−1)/step⌋ + 1) from the metadata alone, so
    a fan-out bug (off-by-one, empty-video handling) hash-mismatches.
    ``sf_dir`` ignored: media is the committed fixture (see x35).
    """
    media = spark.read.parquet(FIXTURE_PATH)
    frames = frame_sample_plan(media, every_ms=1000)
    return (
        frames.groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n_frames"))
        .orderBy("media_id")
    )


# ---------------------------------------------------------------------------
# x122: exact media dedup by content hash
# ---------------------------------------------------------------------------

DUP_FIXTURE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
    "media_dup.parquet",
)


def x122_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup over binary media payloads: group by the
    payload's sha256, keep groups with > 1 row, report the canonical
    id (min media_id), copy count, and the redundant-byte total a
    dedup pass would reclaim.

    The multimodal twin of x1's text dedup: hashing happens JVM-side
    (``sha2`` over the binary column — payloads never reach Python),
    the shuffle key is the 64-hex digest (uniform by construction, no
    skew), and per-group state is three scalars.  Runs on the
    dedicated dup fixture (fixtures/media_dup.parquet) — the primary
    media fixture is duplicate-free by design (x35's decode oracle
    wants one row per id).
    """
    media = spark.read.parquet(DUP_FIXTURE_PATH)
    return (
        media.select(
            "media_id",
            "kind",
            F.sha2(F.col("payload"), 256).alias("payload_sha"),
            F.length(F.col("payload")).alias("n_bytes"),
        )
        .groupBy("payload_sha", "kind")
        .agg(
            F.min("media_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
            # payload length is constant within a sha group
            F.min("n_bytes").alias("n_bytes"),
        )
        .filter(F.col("n_copies") > 1)
        .select(
            "payload_sha",
            "kind",
            "canonical_id",
            "n_copies",
            ((F.col("n_copies") - 1) * F.col("n_bytes")).alias("reclaim_bytes"),
        )
        .orderBy("canonical_id")
    )


# ---------------------------------------------------------------------------
# x196: payload byte-frequency audit (corruption / randomness signal)
# ---------------------------------------------------------------------------


def x196_byte_frequency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-payload byte-frequency profile: total bytes, distinct byte
    values, the dominant byte and its share — the cheap first-pass
    corruption/randomness screen for opaque media columns (an
    all-one-byte payload is padding, a near-uniform histogram at high
    distinct count is ciphertext/noise, text-like payloads sit in
    between).

    Everything is IN-ROW expression work on the hex rendering of the
    binary column: byte list → distinct values → per-value counts
    (nested filter lambda) → max count, with ties broken toward the
    smallest byte via an explicit filter+array_min — no explode, no
    shuffle beyond the final sort, so the audit costs one codegen
    pass however wide the corpus gets (the 256x row-explosion a
    naive groupBy-per-byte plan would pay is avoided BY SHAPE).
    Payload bytes never reach Python; DuckDB replays the identical
    list pipeline on ``hex(payload)``.
    """
    media = spark.read.parquet(FIXTURE_PATH)
    n = F.length("payload")
    hx = F.hex(F.col("payload"))
    d = media.select(
        "media_id",
        "kind",
        n.alias("n_bytes"),
        F.transform(
            F.sequence(F.lit(1), n), lambda i: F.substr(hx, i * 2 - 1, F.lit(2))
        ).alias("bytes"),
    )
    d = d.select(
        "media_id",
        "kind",
        "n_bytes",
        "bytes",
        F.array_distinct("bytes").alias("db"),
    )
    cnts = F.transform(
        F.col("db"),
        lambda b: F.size(F.filter(F.col("bytes"), lambda x: x == b)),
    )
    d = d.select(
        "media_id",
        "kind",
        "n_bytes",
        "bytes",
        "db",
        cnts.alias("cnts"),
        F.array_max(cnts).alias("mc"),
    )
    top = F.array_min(
        F.transform(
            F.filter(
                F.zip_with(
                    F.col("db"),
                    F.col("cnts"),
                    lambda b, c: F.struct(b.alias("b"), c.alias("c")),
                ),
                lambda p: p["c"] == F.col("mc"),
            ),
            lambda p: p["b"],
        )
    )
    return d.select(
        "media_id",
        "kind",
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        F.size("db").cast("int").alias("n_distinct_bytes"),
        top.alias("top_byte"),
        F.round(F.col("mc").cast("double") / F.col("n_bytes"), 6).alias(
            "top_share"
        ),
    ).orderBy("media_id")
