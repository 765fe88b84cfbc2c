"""Streaming CDC apply: maintain a keyed target table from a stream
via ``foreachBatch`` — the streaming counterpart of the batch
merge_upsert (operators/cdc.py).

``foreachBatch`` is the extension point Structured Streaming offers
for sinks with merge semantics: each micro-batch arrives as a plain
DataFrame and is applied transactionally-per-batch.  On a lakehouse
the apply step is ``MERGE INTO`` on a Delta/Iceberg table (storage
handles atomicity + file pruning); this container has bare parquet,
so the apply is read-target → full-outer-join → write-stage →
atomic directory swap — same plan shape, driver-local commit.

Scale notes: per batch, one key-partitioned full-outer join between
the (small) batch aggregate and the target — the batch side is
map-side pre-aggregated first, so join input is one row per touched
key.  Restart safety comes from the checkpoint dir: availableNow +
checkpointLocation replays only unprocessed files (exactly-once per
batch id); idempotence of re-applying batch N after a crash between
write and checkpoint-commit is the storage layer's job (Delta MERGE
is idempotent under replay when keyed by batch id; plain parquet
swap is not — documented, not hidden).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_mapreduce_spark.functions.numeric import dsum


def apply_totals_batch(
    spark: SparkSession, target_dir: str, batch_df: DataFrame
) -> None:
    """Merge one micro-batch of events into the per-user totals
    target: n_events += batch count, total_value += batch sum."""
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
    if os.path.isdir(target_dir):
        shutil.rmtree(target_dir)
    os.rename(stage, target_dir)


def stream_upsert_totals(
    spark: SparkSession,
    events_stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str | None = None,
) -> None:
    """Drain ``events_stream`` (availableNow) applying each
    micro-batch to the keyed target via :func:`apply_totals_batch`."""
    writer = events_stream.writeStream.foreachBatch(
        lambda bdf, _bid: apply_totals_batch(spark, target_dir, bdf)
    ).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
