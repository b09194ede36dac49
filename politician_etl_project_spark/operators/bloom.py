"""Bloom-filter semijoin pruning (cross-engine-replayable hashes).

The 100 TB problem: a selective dim-side predicate should prune the fact
scan before the join shuffle, but an IN-list only works while the key
set fits in a literal, and a shuffle semijoin moves the whole fact.  A
Bloom filter is the standard middle ground — O(m) bits summarize the dim
keys, the fact probes it as a pure per-row expression (no shuffle, no
join), and the only cost of its false positives is some extra rows
surviving into the real join, never a wrong result.  Spark's own AQE
runtime filter (``spark.sql.optimizer.runtime.bloomFilter.enabled``)
injects exactly this plan; this module is the explicit, measurable form:
the declared query reports the observed false-positive rate next to the
prune ratio, which is how you size ``m_bits`` before turning it loose on
a 100 TB scan (m ≈ 10 bits/key ⇒ ~1% FP at k=3).

Hashing: k positions are drawn from disjoint 8-hex-digit substrings of
``md5(key_string)`` — the repo's established cross-engine idiom (same as
the count-min bucket hash in queries/textops.py), so a DuckDB oracle
reproduces the filter bit-for-bit and the driver hash check covers the
*filter itself*, not just the final counts.

Reference analog: the reference pulls whole tables and filters in pandas
(app/app.py query paths); there is no pruning tier to mirror — this is
the scale capability that replaces it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD = 64  # bits per packed word


def bloom_bit_exprs(key_sql: str, m_bits: int, k: int = 3) -> list[str]:
    """The k bit-position expressions (Spark SQL strings) for a key.

    ``key_sql`` must be a STRING-typed SQL expression.  Each position is
    an independent 32-bit slice of md5 reduced mod ``m_bits``; k <= 4
    because md5 yields four disjoint 8-hex slices.  The DuckDB twin of
    slice i is ``CAST('0x' || substr(md5(x), 1+8*i, 8) AS BIGINT) %
    m_bits``.
    """
    if not 1 <= k <= 4:
        raise ValueError("k must be in 1..4 (md5 has four 8-hex slices)")
    return [
        f"cast(conv(substring(md5({key_sql}), {1 + 8 * i}, 8), 16, 10) as bigint)"
        f" % {m_bits}"
        for i in range(k)
    ]


def build_bloom_words(keys: DataFrame, key: str, m_bits: int, k: int = 3) -> tuple[list[int], int]:
    """Build the filter from the dim side: returns (packed words, bits set).

    One aggregation over the (small) key set: explode each key into its
    k bit positions, OR them into ``m_bits / 64`` packed BIGINT words,
    and collect.  The collect is O(m_bits) — the size of the filter, by
    construction independent of data volume (same bounded-collect class
    as k-means centroids), which is exactly what makes the filter
    broadcastable into a scan at any scale.
    """
    if m_bits % _WORD != 0:
        raise ValueError("m_bits must be a multiple of 64")
    key_sql = f"cast({key} as string)"
    bit_cols = [F.expr(e) for e in bloom_bit_exprs(key_sql, m_bits, k)]
    # NULL keys set no bits: md5(NULL) is NULL and a NULL never matches
    # an equi-join anyway — without the filter the NULL bit group would
    # index the words list with None and crash the build
    bits = (
        keys.filter(F.col(key).isNotNull())
        .select(F.explode(F.array(*bit_cols)).alias("bit"))
        .distinct()
    )
    words_rows = (
        bits.groupBy((F.col("bit") / _WORD).cast("int").alias("w"))
        .agg(F.expr(f"bit_or(shiftleft(cast(1 as bigint), cast(bit % {_WORD} as int)))").alias("word"))
        .collect()
    )
    words = [0] * (m_bits // _WORD)
    for row in words_rows:
        words[row["w"]] = row["word"]
    n_bits = sum(bin(w & ((1 << _WORD) - 1)).count("1") for w in words)
    return words, n_bits


def bloom_probe(key_col: str, words: list[int], m_bits: int, k: int = 3) -> Column:
    """Membership-probe Column: TRUE iff all k bits are set.

    Pure per-row expression over a words-array *literal* — stays inside
    whole-stage codegen, needs no join and no shuffle, and survives into
    the scan stage like any other pushed predicate.  May return TRUE for
    a non-member (tunable FP rate), never FALSE for a member.
    """
    words_lit = F.array(*[F.lit(int(w)).cast("long") for w in words])
    key_sql = f"cast({key_col} as string)"
    checks = []
    for expr in bloom_bit_exprs(key_sql, m_bits, k):
        bit = F.expr(expr)
        word = F.element_at(words_lit, (bit / _WORD).cast("int") + 1)
        mask = F.expr(f"shiftleft(cast(1 as bigint), cast(({expr}) % {_WORD} as int))")
        checks.append(word.bitwiseAND(mask) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out
