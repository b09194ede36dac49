"""Partitioning invariance: the fixed-point/micro-unit queries claim their
results cannot depend on how partial aggregates re-associate.  Prove it:
run each under two very different shuffle-partition settings and require
identical row multisets — a float-accumulating implementation would
diverge here, which is exactly why the engine fixes its arithmetic."""

from __future__ import annotations

import pytest

from politician_etl_project_spark.queries import load_all

from tests.conftest import SF_SMALL

SPECS = load_all()

INVARIANT_QUERIES = [
    "q_pagerank",           # integer rank propagation
    "q_correlation",        # decimal sufficient sums -> one float expr
    "q_lm_quality_score",   # micro-unit log-probs, integer sums
    "q_label_centroid",     # micro-unit centroid sums
    "q_moments_mergeable",  # decimal moment partials
    "q_embed_quantize",     # per-row nano-units
    "q_zorder_layout",      # pure integer bit interleave
    "q_bpe_train_merges",   # argmax merges, weighted integer counts
    "q_sketch_merge_replay",  # count-min monoid (integer counters)
    "q_cdc_apply",          # struct-max compaction, decimal balance sums
    "q_bloom_prune",        # bit-or word build + integer tallies
    "q_triangle_count",     # degree-keyed orientation, pure joins
]


@pytest.mark.parametrize("name", INVARIANT_QUERIES)
def test_result_invariant_under_repartitioning(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, SPECS[name].fn(spark, SF_SMALL).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(map(tuple, SPECS[name].fn(spark, SF_SMALL).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b, f"{name} changed under repartitioning"
