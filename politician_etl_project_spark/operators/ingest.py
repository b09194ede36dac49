"""Incremental dedup-on-ingest: the production path a training-data
pipeline actually runs — new document batches arrive forever, and each
batch must be deduplicated against the ENTIRE accepted corpus without
rescanning it (the batch-mode queries q_dedup_exact/q_near_dup_pairs
assume the whole corpus in one frame; this operator is their streaming-
shaped twin, the text analog of similarity.extend_lsh_index).

State = two partition-pruned parquet tables under one index root:
- ``fps``:   (doc_id, fp) partitioned by ``fpp`` = first 2 hex chars of
  the exact-dup fingerprint — an incoming batch probes only the ≤256
  directories its fingerprints land in.
- ``bands``: (band_id, band_key, doc_id, toks) partitioned by ``bkp`` =
  first 2 hex chars of the band key — the LSH candidate join reads only
  the band partitions the batch's signatures touch.

Both probes collect ONLY the distinct 2-hex prefixes driver-side (≤256
values — bounded regardless of corpus size) to build partition IN-lists;
candidate verification is the same capped in-bucket Jaccard the batch
path uses.  A 1k-doc batch against a billion-doc corpus reads
O(batch-size) partitions, not the corpus.

Append discipline: survivor rows APPEND into their partitions (ids are
new by contract, like extend_lsh_index — a changed doc re-ingested under
the same id needs a rebuild, since its old fingerprint/bands partitions
are unknown without a scan).

Cost profile: ``ingest`` is intentionally a MULTI-JOB report operator —
each per-stage drop count (in-batch, exact-vs-store, near-vs-store) is
its own action over the persisted batch, plus two bounded prefix
collects, ~6-7 small jobs total (≈5 s at sf0.1 steady-state).  Every job
is O(batch + pruned store slice), so the shape is constant-cost at any
corpus size; fuse the counts only if the report granularity stops being
worth one job each.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from politician_etl_project_spark.operators.dedup import (
    fingerprint,
    jaccard,
    minhash_signature_from,
)

_N_HASHES = 4
_ROWS_PER_BAND = 2


def _with_fp(batch: DataFrame, id_col: str, text_col: str) -> DataFrame:
    fp = fingerprint(text_col)
    return batch.select(
        F.col(id_col),
        F.col(text_col),
        fp.alias("fp"),
        # 'x' marker keeps the partition value non-numeric: an all-digit
        # hex prefix ('25') would otherwise be type-INFERRED as BIGINT on
        # read-back, zero-stripping '07'->7 and crashing the IN-list cast
        F.concat(F.lit("x"), F.substring(fp, 1, 2)).alias("fpp"),
        F.expr(f"array_distinct(split(trim({text_col}), '\\\\s+'))").alias("toks"),
    )


def _bands_of(df: DataFrame, id_col: str) -> DataFrame:
    """(band_id, band_key, doc_id, toks) rows — same banding scheme as
    lsh_bucket_pairs (md5 over paired minhash sigs)."""
    sigs = df.select(id_col, "toks", *minhash_signature_from("toks", _N_HASHES))
    bands = []
    for b in range(_N_HASHES // _ROWS_PER_BAND):
        lo = b * _ROWS_PER_BAND
        key = F.md5(
            F.concat_ws("|", *[F.col(f"sig{j}") for j in range(lo, lo + _ROWS_PER_BAND)])
        )
        bands.append(
            sigs.select(
                F.lit(b).alias("band_id"),
                key.alias("band_key"),
                F.col(id_col),
                "toks",
            )
        )
    out = bands[0]
    for b in bands[1:]:
        out = out.unionByName(b)
    return out.withColumn("bkp", F.concat(F.lit("x"), F.substring("band_key", 1, 2)))


@dataclass
class IngestReport:
    n_in: int
    n_batch_dup: int
    n_exact_dup: int
    n_near_dup: int
    n_ingested: int


class DedupIngestTable:
    """Stored dedup index + ingest protocol.  See module docstring."""

    def __init__(self, spark: SparkSession, path: str, id_col: str = "doc_id",
                 text_col: str = "text", min_jaccard: float = 0.80):
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.text_col = text_col
        self.min_jaccard = min_jaccard

    _SCHEMAS = {
        "fps": "{id} bigint, fp string, fpp string",
        "bands": "band_id int, band_key string, {id} bigint, toks array<string>, bkp string",
    }

    # -- state ---------------------------------------------------------
    def initialize(self, corpus: DataFrame) -> None:
        """Bootstrap the index from an already-deduplicated corpus.  An
        empty corpus writes nothing — a partitioned write of zero rows
        emits no files at all and a later read can't infer a schema, so
        the probe side falls back to a typed empty frame instead
        (:meth:`_pruned`)."""
        enriched = _with_fp(corpus, self.id_col, self.text_col)
        self._append(enriched, overwrite=True)

    def _append(self, enriched: DataFrame, overwrite: bool = False) -> None:
        mode = "overwrite" if overwrite else "append"
        if enriched.isEmpty():
            return
        enriched.select(self.id_col, "fp", "fpp").write.partitionBy("fpp").mode(
            mode
        ).parquet(f"{self.path}/fps")
        _bands_of(enriched, self.id_col).write.partitionBy("bkp").mode(
            mode
        ).parquet(f"{self.path}/bands")

    def _pruned(self, table: str, part_col: str, prefixes: list[str]) -> DataFrame:
        from pyspark.errors import AnalysisException

        try:
            df = self.spark.read.parquet(f"{self.path}/{table}")
        except AnalysisException:  # index not yet materialized: empty store
            schema = self._SCHEMAS[table].format(id=self.id_col)
            return self.spark.createDataFrame([], schema)
        return df.filter(F.col(part_col).isin(prefixes) if prefixes else F.lit(False))

    # -- ingest --------------------------------------------------------
    def ingest(self, batch: DataFrame, dry_run: bool = False) -> IngestReport:
        """Dedup ``batch`` within itself and against the stored corpus;
        append survivors (unless ``dry_run`` — then only report, leaving
        the index untouched: the what-would-this-batch-add probe, and
        the form the declared query q_dedup_incremental verifies).
        Returns per-stage drop counts."""
        id_col = self.id_col
        enriched = _with_fp(batch, id_col, self.text_col).persist()
        no_exact = survivors = None
        try:
            n_in = enriched.count()

            # 1. within-batch exact dedup (keep min id per fingerprint)
            w_keep = F.row_number().over(Window.partitionBy("fp").orderBy(id_col))
            batch_kept = enriched.withColumn("_rn", w_keep).filter(F.col("_rn") == 1).drop("_rn")
            n_kept = batch_kept.count()
            n_batch_dup = n_in - n_kept

            # 2. exact dups vs store: partition-pruned anti join on fp
            fpp = [r["fpp"] for r in batch_kept.select("fpp").distinct().collect()]
            stored_fps = self._pruned("fps", "fpp", fpp).select("fp")
            no_exact = batch_kept.join(stored_fps, "fp", "left_anti").persist()
            n_after_exact = no_exact.count()
            n_exact_dup = n_kept - n_after_exact

            # 3. near-dups vs store: band-key equi-join (partition-pruned),
            #    Jaccard-verified — same comparator as the batch path
            batch_bands = _bands_of(no_exact, id_col)
            bkp = [r["bkp"] for r in batch_bands.select("bkp").distinct().collect()]
            stored_bands = self._pruned("bands", "bkp", bkp).select(
                "band_id", "band_key", F.col("toks").alias("_stoks")
            )
            near_ids = (
                batch_bands.join(stored_bands, ["band_id", "band_key"])
                .filter(jaccard("toks", "_stoks") >= self.min_jaccard)
                .select(id_col)
                .distinct()
            )
            survivors = no_exact.join(near_ids, id_col, "left_anti").persist()
            n_ingested = survivors.count()
            n_near_dup = n_after_exact - n_ingested

            # 4. append survivor state (new ids by contract — plain
            #    partition-dir appends, no merge needed)
            if not dry_run:
                self._append(survivors)
            return IngestReport(
                n_in=n_in,
                n_batch_dup=n_batch_dup,
                n_exact_dup=n_exact_dup,
                n_near_dup=n_near_dup,
                n_ingested=n_ingested,
            )
        finally:
            enriched.unpersist()
            for df in (no_exact, survivors):
                if df is not None:
                    df.unpersist()
