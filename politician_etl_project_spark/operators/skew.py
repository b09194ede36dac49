"""Skew mitigation operators (SURVEY §4/§7: "salting for hot politicians";
the reference's analog problem is the California block in the fuzzy join,
ingest_fec_links.py:116).

AQE skew-join splitting (on in session.py) handles most runtime skew; these
are the *explicit* levers for when a key's hotness is known up front:

- ``salted_agg``: two-phase aggregation — explode each hot key into
  ``n_salts`` subkeys for the first (wide, parallel) partial aggregate,
  then re-aggregate without salt.  Result is identical to a direct
  groupBy for any decomposable aggregate (SUM/COUNT/MIN/MAX), which is
  what makes it oracle-checkable.
- ``salted_broadcast_left``: replicate the *small* side once per salt and
  salt the fact side, so one hot join key spreads over n partitions.

At 100 TB, a single politician receiving 30% of donations turns one
shuffle partition into the job's critical path; salting caps the largest
partition at hot_share/n_salts of the table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Per-row salt in [0, n_salts): content hash mixed with the input
    partition id.

    Two constraints pull in opposite directions here and this is the
    deterministic middle:

    - A pure content hash would send a hot key's byte-identical rows
      (millions of equal $10 donations) all to ONE salt — the straggler
      the salt exists to split survives untouched.
    - A pure row-position spray (monotonically_increasing_id % n) splits
      them, but the expression is NONDETERMINISTIC as a shuffle key:
      after a shuffle-fetch failure, recomputed map tasks can assign
      rows to different salts than already-consumed reducers fetched —
      silently wrong aggregates.

    hash(all columns) + spark_partition_id()*PRIME spreads identical
    rows that live in different scan partitions (at scale a hot key
    spans thousands of ~128 MB input splits, so the spread is uniform),
    while a re-executed task attempt re-reads the same split and
    reproduces the identical salts — the divergence window is closed.
    F.hash (Murmur3 over the native column values) rather than
    crc32(concat_ws(cast-to-string)): it drops the per-column string
    casts and the concat from the codegen hot path.  NOTE the caveat
    verified in round-6 review: Spark's Murmur3 also SKIPS NULL columns
    (the seed passes through unchanged), so ('a', NULL, 'b') and
    ('a', 'b', NULL) still land on one salt — a spread loss on
    NULL-position-heavy data, never a correctness loss.  F.hash also
    rejects MapType columns at analysis time where the old string-cast
    accepted them; callers salting map-typed frames must project the
    map away (or hash map_entries) first.
    The residual clustering (identical rows WITHIN one input partition
    share a salt) is bounded by maxPartitionBytes, i.e. no worse than
    any ordinary partition.

    PRECONDITION (deterministic lineage): spark_partition_id() is only
    re-execution-stable when the partition's CONTENTS are — true for
    file scans and hash-shuffle outputs, NOT downstream of
    order-nondeterministic lineage (round-robin ``repartition(n)``
    with no columns, ``sample``, ``coalesce`` after a shuffle).  There
    a recomputed map task can legitimately see different rows under the
    same partition id and the fetch-failure divergence window this
    rewrite closes reopens.  Callers must salt directly over the scan
    (or any deterministic transform of it), never after a round-robin
    repartition — every in-repo caller salts over a parquet scan."""
    content = F.hash(*[F.col(c) for c in df.columns]).cast("bigint")
    return df.withColumn(
        salt_col,
        F.pmod(content + F.spark_partition_id().cast("bigint") * F.lit(2654435761), F.lit(n_salts))
        .cast("int"),
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    reaggs: list[Column],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` aggregate the salted groups (e.g. ``F.sum('x').alias('sx')``);
    ``reaggs`` fold the partials (e.g. ``F.sum('sx').alias('sum_x')``).
    Phase 1 shuffles on (keys + salt) — n_salts× more, smaller partitions;
    phase 2 shuffles the tiny partial frame on the bare keys."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(*aggs)
    return partial.groupBy(*keys).agg(*reaggs)


def salted_broadcast_left(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: salt the fact, replicate the dim across all
    salts (explode over sequence), join on (key, salt).  The dim
    replication is n_salts× its size — use for small dims only (the
    broadcast case); big-big skew joins belong to AQE."""
    salted_fact = with_salt(fact, n_salts)
    replicated = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0).cast("int"), F.lit(n_salts - 1).cast("int")))
    )
    return salted_fact.join(F.broadcast(replicated), [key, "_salt"]).drop("_salt")
