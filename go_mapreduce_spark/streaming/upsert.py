"""Streaming CDC apply: maintain a keyed target table from a stream
via ``foreachBatch`` — the streaming counterpart of the batch
merge_upsert (operators/cdc.py).

``foreachBatch`` is the extension point Structured Streaming offers
for sinks with merge semantics: each micro-batch arrives as a plain
DataFrame and is applied transactionally-per-batch.  On a lakehouse
the apply step is ``MERGE INTO`` on a Delta/Iceberg table (storage
handles atomicity + file pruning); this module keeps the plain
directory-swap variant for parity, and ``go_mapreduce_spark.
lakehouse.x151_stream_lakehouse_upsert`` is the full transactional
path: atomic manifest commits, batch-id ledger (replay = no-op),
key-range file pruning, time travel.

Scale notes: per batch, one key-partitioned full-outer join between
the (small) batch aggregate and the target — the batch side is
map-side pre-aggregated first, so join input is one row per touched
key.  Restart safety:

- **Replay idempotence**: every applied batch id leaves a marker file
  under ``<target>/_batches/`` (underscore-prefixed paths are hidden
  from Spark's file listing, so the parquet read is unaffected).
  Markers are copied into the stage directory before the swap, so
  they travel with the data version they describe.  Re-applying a
  batch whose marker exists is a no-op — ``foreachBatch`` replay
  after a crash between write and checkpoint-commit is safe, the
  guarantee Delta's keyed MERGE would give.
- **Crash-safe swap**: target is renamed aside (``<target>.old``)
  before the stage is renamed in, so some complete copy of the table
  exists at every instant; a crash between the two renames is healed
  on the next read/apply by restoring ``.old``.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_mapreduce_spark.functions.numeric import dsum

_BATCH_MARKERS = "_batches"


def _recover_target(target_dir: str) -> None:
    """Heal a crash between the two swap renames: if the target is
    missing but ``<target>.old`` survives, restore it."""
    old = target_dir.rstrip("/") + ".old"
    if not os.path.isdir(target_dir) and os.path.isdir(old):
        os.rename(old, target_dir)


def _applied_batches(target_dir: str) -> set[str]:
    d = os.path.join(target_dir, _BATCH_MARKERS)
    return set(os.listdir(d)) if os.path.isdir(d) else set()


def apply_totals_batch(
    spark: SparkSession,
    target_dir: str,
    batch_df: DataFrame,
    batch_id: int | None = None,
) -> None:
    """Merge one micro-batch of events into the per-user totals
    target: n_events += batch count, total_value += batch sum.

    With a ``batch_id``, the apply is idempotent: an id already
    recorded in ``<target>/_batches/`` is skipped, so replaying the
    last micro-batch after a crash cannot double-count.
    """
    _recover_target(target_dir)
    if batch_id is not None and str(batch_id) in _applied_batches(target_dir):
        return
    agg = batch_df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("b_n"), dsum(F.col("value"), "b_total")
    )
    if os.path.isdir(target_dir):
        target = spark.read.parquet(target_dir)
    else:
        target = spark.createDataFrame(
            [], "user_id bigint, n_events bigint, total_value double"
        )
    merged = (
        target.join(agg, "user_id", "full_outer")
        .select(
            "user_id",
            (F.coalesce("n_events", F.lit(0)) + F.coalesce("b_n", F.lit(0)))
            .cast("bigint")
            .alias("n_events"),
            (
                F.coalesce("total_value", F.lit(0.0))
                + F.coalesce("b_total", F.lit(0.0))
            ).alias("total_value"),
        )
    )
    stage = target_dir.rstrip("/") + ".stage"
    merged.write.mode("overwrite").parquet(stage)
    # markers describe the data version they ride with: carry the
    # history forward into the stage, then add this batch's marker
    stage_markers = os.path.join(stage, _BATCH_MARKERS)
    os.makedirs(stage_markers, exist_ok=True)
    for b in _applied_batches(target_dir):
        open(os.path.join(stage_markers, b), "w").close()
    if batch_id is not None:
        open(os.path.join(stage_markers, str(batch_id)), "w").close()
    # swap with a complete copy present at every instant
    old = target_dir.rstrip("/") + ".old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(target_dir):
        os.rename(target_dir, old)
    os.rename(stage, target_dir)
    if os.path.isdir(old):
        shutil.rmtree(old)


def stream_upsert_totals(
    spark: SparkSession,
    events_stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str | None = None,
) -> None:
    """Drain ``events_stream`` (availableNow) applying each
    micro-batch to the keyed target via :func:`apply_totals_batch`."""
    writer = events_stream.writeStream.foreachBatch(
        lambda bdf, bid: apply_totals_batch(spark, target_dir, bdf, bid)
    ).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
