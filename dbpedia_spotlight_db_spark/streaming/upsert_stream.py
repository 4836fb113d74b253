"""Streaming incremental MERGE: a changelog delta arrives as a
micro-batched stream and is folded into a compacted upsert state via
``foreachBatch`` — the Structured-Streaming shape of a continuously
refreshed crawl/KG store (the batch twin is qcorpus.crawl_upsert;
jobs/refresh.py is the scheduled-batch form).

Latest-per-key (ts, event_id) compaction is ASSOCIATIVE over
arbitrary chunking, so the final state is independent of how the
micro-batch planner splits the delta — that invariant is what makes
the face oracle-checkable (and is pinned in tests by running the
same delta at 1 file/trigger vs one batch).

Scale shape: each micro-batch merge is one map-side-combinable
``max_by`` agg over |state| + |batch| rows keyed by the entity key;
state generations are parquet (columnar, splittable), written to a
fresh path per epoch so a failed epoch can never corrupt the previous
generation (the checkpoint replays it). In production the state table
is the Iceberg-backed store written bucketed on the key
(sources/catalog.save_bucketed), so the per-epoch merge needs no
state-side exchange at all.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

_COLS = ["user_id", "event_id", "ts", "event_type"]


def compact_latest(df: DataFrame) -> DataFrame:
    """Latest-per-key compaction via max_by((ts, event_id)) — one
    map-side-combinable agg, never a row_number sort of the log."""
    best = F.max_by(
        F.struct("event_id", "ts", "event_type"), F.struct("ts", "event_id")
    ).alias("b")
    return (
        df.groupBy("user_id")
        .agg(best)
        .select("user_id", "b.event_id", "b.ts", "b.event_type")
    )


class UpsertState:
    """Per-epoch delta-state accumulator for foreachBatch.

    Holds the compacted latest-per-key view of every delta row seen so
    far, INCLUDING tombstones (they stay in the state as markers so a
    later re-fetch can resurrect the key; they are dropped only at
    final projection — exactly crawl_upsert's semantics)."""

    def __init__(self, spark, state_root: str):
        self.spark = spark
        self.root = state_root
        self.generations = 0
        self.path: str | None = None

    def apply_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        rows = batch_df.select(*_COLS)
        if self.path is not None:
            rows = self.spark.read.parquet(self.path).unionByName(rows)
        self.generations += 1
        new_path = os.path.join(self.root, f"gen={self.generations}")
        compact_latest(rows).write.mode("overwrite").parquet(new_path)
        self.path = new_path

    def delta(self) -> DataFrame | None:
        return self.spark.read.parquet(self.path) if self.path else None

    def merged(self, base: DataFrame) -> DataFrame:
        """Final state: base keys untouched by the delta survive an
        unhinted left_anti; non-tombstone delta winners union in."""
        d = self.delta()
        if d is None:
            return base
        kept = base.join(d.select("user_id"), "user_id", "left_anti")
        return kept.unionByName(d.filter(F.col("event_type") != "error"))


def run_upsert_stream(
    spark,
    delta_dir: str,
    schema,
    state_root: str,
    checkpoint: str,
    max_files_per_trigger: int = 1,
) -> UpsertState:
    """Drive the delta directory through a file-source stream one
    file per trigger (so the merge really exercises multi-epoch
    state), folding each micro-batch into the UpsertState."""
    state = UpsertState(spark, state_root)
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(delta_dir)
    )
    q = (
        src.writeStream.foreachBatch(state.apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return state
