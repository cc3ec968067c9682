"""Keyed upsert sink for foreachBatch — streaming MERGE-INTO semantics
on plain parquet.

The reference's sink is append-only (rainstorm.go:566 appends each
batch's results to the HyDFS dest file, and running aggregates exist
only in the leader's memory). This sink materializes the *current
state per key* instead: each micro-batch upserts (key → latest row)
into a persistent table, so readers see point-in-time state without
replaying the log.

Scale design (100 TB state):
- State is hash-bucketed by ``pmod(xxhash64(key), n_buckets)``. A
  micro-batch rewrites ONLY the buckets its keys fall in — the rest of
  the state is untouched (verified by test: unaffected bucket files
  keep their bytes). With 4096 buckets and a well-spread key, a small
  batch touches a small fraction of the state regardless of total
  state size. This is the merge-on-write strategy of Delta/Iceberg
  MERGE INTO, emulated with directory-swap atomicity per bucket.
- The merge itself is a per-bucket union + max-by — a hash aggregate
  co-partitioned by the bucket column, no global shuffle of the state.
- Exactly-once: upsert is idempotent (same batch replayed → same
  state), so foreachBatch's at-least-once replay after restart is
  safe — the same argument as the reference's UploadedBatchLineNumbers
  dedup set (rainstorm.go:537-575), but without needing the set.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class KeyedUpsertSink:
    """Upsert (key → latest row) state table on hash-bucketed parquet.

    ``order_col`` decides "latest" within and across batches (event
    time, version, …); newer batches win ties so reprocessing with
    equal timestamps stays deterministic.
    """

    def __init__(
        self,
        base_dir: str,
        key: str,
        order_col: str,
        n_buckets: int = 16,
    ) -> None:
        self.base_dir = base_dir
        self.key = key
        self.order_col = order_col
        self.n_buckets = n_buckets
        self.state_dir = os.path.join(base_dir, "state")
        os.makedirs(self.state_dir, exist_ok=True)

    # -- helpers ---------------------------------------------------------

    def _bucket_col(self):
        return F.pmod(F.xxhash64(F.col(self.key)), F.lit(self.n_buckets)).cast("int")

    def _bucket_path(self, b: int) -> str:
        return os.path.join(self.state_dir, f"bucket={b:05d}")

    def _retired_path(self, b: int) -> str:
        # ".old-" prefix: never matches the "bucket=" snapshot listing
        return os.path.join(self.state_dir, f".old-bucket={b:05d}")

    def _recover(self) -> None:
        """Roll the two-rename swap forward/back after a crash: a
        retired dir with no live dir means we died between renames —
        restore it; with a live dir present it is superseded — drop it."""
        for d in os.listdir(self.state_dir):
            if not d.startswith(".old-bucket="):
                continue
            retired = os.path.join(self.state_dir, d)
            live = os.path.join(self.state_dir, d[len(".old-") :])
            if os.path.isdir(live):
                shutil.rmtree(retired)
            else:
                os.rename(retired, live)

    def snapshot(self, spark: SparkSession) -> DataFrame:
        """Current state: one row per key (the latest by order_col)."""
        self._recover()
        dirs = [
            os.path.join(self.state_dir, d)
            for d in sorted(os.listdir(self.state_dir))
            if d.startswith("bucket=")
        ]
        if not dirs:
            raise FileNotFoundError(f"no upsert state under {self.state_dir}")
        return spark.read.parquet(*dirs)

    # -- core ------------------------------------------------------------

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Merge one micro-batch into state, rewriting only touched
        buckets. Deterministic and idempotent per (state, batch)."""
        spark = batch_df.sparkSession
        self._recover()
        # latest row per key within the batch
        w = Window.partitionBy(self.key).orderBy(F.desc(self.order_col))
        batch_latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn("_bucket", self._bucket_col())
            .withColumn("_is_new", F.lit(1))
        )
        # the window dedup feeds both the touched-bucket listing and the
        # merge below — persist so the partitionBy(key) shuffle runs once
        # per batch, not twice
        batch_latest.persist()
        touched = [r["_bucket"] for r in batch_latest.select("_bucket").distinct().collect()]
        if not touched:
            batch_latest.unpersist()
            return

        existing_dirs = [p for b in touched if os.path.isdir(p := self._bucket_path(b))]
        if existing_dirs:
            old = (
                spark.read.parquet(*existing_dirs)
                .withColumn("_bucket", self._bucket_col())
                .withColumn("_is_new", F.lit(0))
            )
            merged = batch_latest.unionByName(old)
        else:
            merged = batch_latest
        # newest order_col wins; on a tie the incoming batch wins
        w2 = Window.partitionBy(self.key).orderBy(
            F.desc(self.order_col), F.desc("_is_new")
        )
        winners = (
            merged.withColumn("_rn", F.row_number().over(w2))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_is_new")
        )

        staging = os.path.join(self.base_dir, f"staging-{batch_id:020d}")
        (
            winners.repartition(len(touched), "_bucket")
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(staging)
        )
        batch_latest.unpersist()
        # Per-bucket swap via two renames, never delete-then-rename: a
        # crash between rmtree and rename would lose the bucket's prior
        # state with nothing to replay it from (the batch only holds the
        # keys it touched). With rename→rename, every crash point leaves
        # either the retired dir or the new dir in place and _recover()
        # rolls the swap forward or back on the next call.
        for b in touched:
            src = os.path.join(staging, f"_bucket={b}")
            dst = self._bucket_path(b)
            retired = self._retired_path(b)
            if os.path.isdir(dst):
                os.rename(dst, retired)
            if os.path.isdir(src):
                os.rename(src, dst)
            elif os.path.isdir(retired):
                # batch produced no rows for this bucket (cannot happen
                # for touched buckets, but stay crash-safe): restore
                os.rename(retired, dst)
            if os.path.isdir(retired) and os.path.isdir(dst):
                shutil.rmtree(retired)
        shutil.rmtree(staging, ignore_errors=True)

    def writer(self):
        """foreachBatch callable: ``.writeStream.foreachBatch(sink.writer())``."""

        def _write(batch_df: DataFrame, batch_id: int) -> None:
            self.apply_batch(batch_df, batch_id)

        return _write


def stream_upsert(
    spark: SparkSession,
    source_dir: str,
    schema,
    checkpoint_dir: str,
    sink: KeyedUpsertSink,
):
    """Wire a file-source stream into a KeyedUpsertSink (update-mode
    materialization of latest-per-key, the streaming twin of
    ``dedup_keep_first`` run in reverse — keep *last*)."""
    src = spark.readStream.schema(schema).parquet(source_dir)
    return (
        src.writeStream.foreachBatch(sink.writer())
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
