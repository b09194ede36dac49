"""Incremental materialized-rollup maintenance.

The reference recomputes its dashboard aggregates from scratch on every
page load (app/app.py metric queries re-scan donations per request); at
100 TB a full rescan per refresh is the first thing that dies.  This
operator keeps a materialized aggregate as ADDITIVE PARTIALS (count +
exact-decimal sum per group) in a bucket-partitioned parquet store, so a
delta batch folds in by:

1. aggregating the delta alone (one shuffle over O(delta) rows),
2. reading ONLY the store buckets the delta touches (partition-pruned
   scan — the touched-bucket list is O(buckets), collected like
   ParquetUpsertTable's touched-partition list),
3. re-aggregating store-partials ∪ delta-partials for those buckets and
   dynamic-partition-overwriting just those directories.

Because (n, Σ) partials form a commutative monoid (the same contract as
q_moments_mergeable / q_hll_mergeable), merge order never matters and
the maintained store is bit-equal to a full recompute — which is exactly
what the q_incremental_rollup oracle asserts.

Idempotency: each merge records its batch_id as a marker file; replaying
a batch (crash-retry, at-least-once upstream) is a no-op.  Derived
measures (averages, ratios) are computed at SERVE time from the
partials, never stored — storing a mean would make the store
non-mergeable.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class RollupStore:
    """Bucket-partitioned store of additive aggregate partials."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        group_cols: Sequence[str],
        n_buckets: int = 8,
    ) -> None:
        self.spark = spark
        self.path = path
        self.group_cols = list(group_cols)
        self.n_buckets = n_buckets

    # -- partial computation ------------------------------------------------

    def _partials(self, df: DataFrame) -> DataFrame:
        """Aggregate rows to (group, n, s) partials.  Input must carry the
        group columns plus a DECIMAL `measure` column (exact — sums are
        order-independent, so partials merge associatively)."""
        return df.groupBy(*self.group_cols).agg(
            F.count("*").alias("n"),
            F.sum("measure").cast("decimal(18,2)").alias("s"),
        )

    def _with_bucket(self, partials: DataFrame) -> DataFrame:
        # internal routing only — never reaches a query output, so Spark's
        # native hash is fine here (md5 discipline is for oracle-visible
        # values)
        return partials.withColumn(
            "bucket", F.pmod(F.hash(*self.group_cols), F.lit(self.n_buckets))
        )

    # -- lifecycle ----------------------------------------------------------

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.path, "_SUCCESS"))

    def _schema_file(self) -> str:
        return os.path.join(self.path, "_partials_schema.json")

    def _read_store(self) -> DataFrame:
        """Schema-pinned read: an EMPTY store (built from an empty base —
        day-one pipelines) has no parquet footer to infer from, so the
        schema written at build time is always applied."""
        reader = self.spark.read
        if os.path.exists(self._schema_file()):
            from pyspark.sql.types import StructType

            with open(self._schema_file()) as fh:
                reader = reader.schema(StructType.fromJson(__import__("json").load(fh)))
        return reader.parquet(self.path)

    def build(self, df: DataFrame) -> None:
        """Full (re)build from a base dataset."""
        partials = self._with_bucket(self._partials(df))
        partials.write.partitionBy("bucket").mode("overwrite").parquet(self.path)
        import json

        with open(self._schema_file(), "w") as fh:
            json.dump(partials.schema.jsonValue(), fh)

    def _marker(self, batch_id: str) -> str:
        return os.path.join(self.path, "_merged_batches", batch_id)

    def merged_already(self, batch_id: str) -> bool:
        return os.path.exists(self._marker(batch_id))

    def merge(
        self,
        delta: DataFrame,
        batch_id: Optional[str] = None,
        dry_run: bool = False,
    ) -> DataFrame:
        """Fold a delta batch into the store; returns the post-merge rollup
        (all groups).  Reads only the buckets the delta touches.  With
        ``dry_run`` the merged frame is returned without mutating the
        store (pure — the driver-verified query path).  With a
        ``batch_id`` an already-merged batch is skipped (idempotent
        replay)."""
        store = self._read_store()
        if batch_id is not None and self.merged_already(batch_id):
            return store.drop("bucket")

        d = self._with_bucket(self._partials(delta))
        # O(n_buckets) driver list — same discipline as the
        # touched-partition MERGE in operators/upsert.py
        touched = [r["bucket"] for r in d.select("bucket").distinct().collect()]
        hot = store.filter(F.col("bucket").isin(touched))  # partition-pruned
        cold = store.filter(~F.col("bucket").isin(touched))
        merged_hot = (
            hot.unionByName(d)
            .groupBy(*self.group_cols, "bucket")
            .agg(F.sum("n").cast("bigint").alias("n"), F.sum("s").cast("decimal(18,2)").alias("s"))
        )
        if not dry_run:
            merged_hot.write.mode("overwrite").parquet(self.path + ".staging")
            staged = self.spark.read.parquet(self.path + ".staging")
            conf = "spark.sql.sources.partitionOverwriteMode"
            prev = self.spark.conf.get(conf, "static")
            try:
                self.spark.conf.set(conf, "dynamic")
                staged.write.partitionBy("bucket").mode("overwrite").parquet(self.path)
            finally:
                self.spark.conf.set(conf, prev)
            if batch_id is not None:
                os.makedirs(self._marker(batch_id), exist_ok=True)
            self.spark.catalog.refreshByPath(self.path)
            return self._read_store().drop("bucket")
        return merged_hot.drop("bucket").unionByName(cold.drop("bucket"))

    def serve(self) -> DataFrame:
        """Final measures derived from partials at read time."""
        return self._read_store().drop("bucket")
