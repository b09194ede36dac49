"""Property-based tests (hypothesis) for the invariants SURVEY §7 calls
the hard parts: MERGE determinism under arbitrary data and partitioning,
and salted aggregation's exact equivalence to direct groupBy."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from politician_etl_project_spark.operators.skew import salted_agg, salted_broadcast_left
from politician_etl_project_spark.operators.upsert import insert_if_absent, merge_keep

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),          # key
        st.integers(min_value=-100, max_value=100),     # value
        st.sampled_from(["a", "b", "c"]),               # attr
    ),
    min_size=0,
    max_size=25,
)

_SETTINGS = dict(
    max_examples=12,  # each example runs Spark jobs; keep the budget sane
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _df(spark, rows, parts):
    return spark.createDataFrame(rows or [(0, 0, "a")], "k int, v int, attr string").repartition(
        parts
    ).filter(F.lit(bool(rows)))


@given(existing=rows_strategy, incoming=rows_strategy, parts=st.sampled_from([1, 3, 7]))
@settings(**_SETTINGS)
def test_merge_keep_one_row_per_key_and_partition_invariant(
    spark, existing, incoming, parts
):
    e = _df(spark, existing, parts)
    i = _df(spark, incoming, parts)
    merged = merge_keep(e, i, ["k"], update_wins=True).collect()
    keys = [r.k for r in merged]
    assert len(keys) == len(set(keys))  # exactly one survivor per key
    assert set(keys) == {r[0] for r in existing} | {r[0] for r in incoming}
    # determinism: a different partitioning yields the identical survivors
    merged2 = merge_keep(
        _df(spark, existing, 11), _df(spark, incoming, 2), ["k"], update_wins=True
    ).collect()
    assert sorted(map(tuple, merged)) == sorted(map(tuple, merged2))


@given(existing=rows_strategy, incoming=rows_strategy)
@settings(**_SETTINGS)
def test_merge_precedence(spark, existing, incoming):
    e = _df(spark, existing, 3)
    i = _df(spark, incoming, 3)
    update_wins = {r.k: r for r in merge_keep(e, i, ["k"], update_wins=True).collect()}
    first_wins = {r.k: r for r in merge_keep(e, i, ["k"], update_wins=False).collect()}
    e_keys = {r[0] for r in existing}
    i_keys = {r[0] for r in incoming}
    for k in e_keys & i_keys:
        # survivor must come from the precedent side (any of its rows)
        assert tuple(update_wins[k])[1:] in {r[1:] for r in incoming if r[0] == k}
        assert tuple(first_wins[k])[1:] in {r[1:] for r in existing if r[0] == k}


@given(existing=rows_strategy, incoming=rows_strategy)
@settings(**_SETTINGS)
def test_insert_if_absent_never_mutates_existing(spark, existing, incoming):
    e = _df(spark, existing, 3)
    i = _df(spark, incoming, 3)
    out = insert_if_absent(e, i, ["k"]).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append(tuple(r))
    for r in existing:
        # every existing row survives verbatim
        assert tuple(r) in out_set(out)
    e_keys = {r[0] for r in existing}
    for k, rows in by_key.items():
        if k in e_keys:
            # no incoming row joined an existing key
            assert all(t in {tuple(r) for r in existing} for t in rows)


def out_set(rows):
    return {tuple(r) for r in rows}


@given(rows=rows_strategy, n_salts=st.sampled_from([2, 8]))
@settings(**_SETTINGS)
def test_salted_agg_equals_direct(spark, rows, n_salts):
    df = _df(spark, rows, 5)
    direct = {
        (r.k,): (r.s, r.n)
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("n")).collect()
    }
    salted = {
        (r.k,): (r.s, r.n)
        for r in salted_agg(
            df,
            ["k"],
            [F.sum("v").alias("_s"), F.count("*").alias("_n")],
            [F.sum("_s").alias("s"), F.sum("_n").alias("n")],
            n_salts=n_salts,
        ).collect()
    }
    assert direct == salted


def test_salted_broadcast_join_equals_plain(spark):
    fact = spark.createDataFrame(
        [(k, v) for k in range(4) for v in range(50)], "k int, v int"
    )
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(4)], "k int, label string")
    plain = sorted(map(tuple, fact.join(dim, "k").collect()))
    salted = sorted(map(tuple, salted_broadcast_left(fact, dim, "k", n_salts=4).collect()))
    assert plain == salted


# --- temporal operators vs naive references ---------------------------------

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # user
        st.integers(min_value=0, max_value=5000),   # ts seconds offset
    ),
    min_size=0,
    max_size=30,
)


def _ts_df(spark, rows, side):
    from datetime import datetime, timezone

    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    data = [
        (u, datetime.fromtimestamp(base.timestamp() + s, tz=timezone.utc), i + side * 10_000)
        for i, (u, s) in enumerate(rows)
    ]
    return spark.createDataFrame(data, "user_id long, ts timestamp, event_id long")


@given(left=events_strategy, right=events_strategy)
@settings(**_SETTINGS)
def test_asof_join_matches_naive(spark, left, right):
    from politician_etl_project_spark.operators.temporal import asof_join

    l_df = _ts_df(spark, left, 0)
    r_df = _ts_df(spark, right, 1)
    got = {
        r.event_id: r.ts_right
        for r in asof_join(
            l_df.select("user_id", "ts", "event_id"), r_df.select("user_id", "ts"), "user_id"
        ).collect()
    }
    # naive: for each left row, max right ts <= left ts within the user
    naive = {}
    for i, (u, s) in enumerate(left):
        cands = [s2 for (u2, s2) in right if u2 == u and s2 <= s]
        naive[i] = max(cands) if cands else None
    assert set(got) == set(naive)
    for eid, ts in got.items():
        expect = naive[eid]
        if expect is None:
            assert ts is None
        else:
            assert ts is not None and int(ts.timestamp()) % 100000 == (
                1704067200 + expect
            ) % 100000


@given(left=events_strategy, right=events_strategy, width=st.sampled_from([60, 600]))
@settings(**_SETTINGS)
def test_range_join_matches_naive(spark, left, right, width):
    from politician_etl_project_spark.operators.temporal import range_join_binned

    l_df = _ts_df(spark, left, 0)
    r_df = _ts_df(spark, right, 1)
    got = {
        (r.a_event_id, r.b_event_id)
        for r in range_join_binned(
            l_df.select("user_id", "ts", "event_id"),
            r_df.select("user_id", "ts", "event_id"),
            "user_id",
            width_seconds=width,
        ).collect()
    }
    naive = {
        (i, j + 10_000)
        for i, (u, s) in enumerate(left)
        for j, (u2, s2) in enumerate(right)
        if u == u2 and s2 > s and s2 <= s + width
    }
    assert got == naive


@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=4),   # key within partition
                st.integers(min_value=118, max_value=120),  # partition value (part of key)
                st.integers(min_value=-50, max_value=50),   # payload
            ),
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=3,
    ),
    update_wins=st.booleans(),
)
@settings(**_SETTINGS)
def test_partition_scoped_merge_equals_full_merge(spark, tmp_path_factory, batches, update_wins):
    """Applying the same upsert batches to a partitioned table (touched-
    partition MERGE) and an unpartitioned one (full-table MERGE) must
    converge to identical content — partition-scoping is a physical
    optimization, never a semantic one."""
    from politician_etl_project_spark.operators.upsert import ParquetUpsertTable

    root = tmp_path_factory.mktemp("pmerge")
    part_tbl = ParquetUpsertTable(
        spark, str(root / "p"), keys=["k", "congress"], partition_cols=["congress"]
    )
    flat_tbl = ParquetUpsertTable(spark, str(root / "f"), keys=["k", "congress"])
    for batch in batches:
        if not batch:
            continue
        df = spark.createDataFrame(batch, "k int, congress int, v int")
        part_tbl.upsert(df, update_wins=update_wins)
        flat_tbl.upsert(df, update_wins=update_wins)
    if part_tbl.exists() or flat_tbl.exists():
        got = sorted(tuple(r) for r in part_tbl.read().select("k", "congress", "v").collect())
        want = sorted(tuple(r) for r in flat_tbl.read().select("k", "congress", "v").collect())
        assert got == want


@given(
    keys=st.lists(
        st.one_of(
            st.none(),
            st.text(alphabet="abAB|", min_size=0, max_size=12),
        ),
        min_size=1,
        max_size=30,
    ),
    prefix_len=st.sampled_from([1, 2, 8]),
    parts=st.sampled_from([1, 4]),
)
@settings(**_SETTINGS)
def test_surrogate_ids_equal_global_window(spark, keys, prefix_len, parts):
    """The prefix-bucketed two-level surrogate_ids must assign EXACTLY the
    ids a global row_number window would — including NULL lead keys,
    empty strings, duplicate keys (ties broken by the remaining order
    cols), and keys shorter than the prefix."""
    from pyspark.sql import Window

    from politician_etl_project_spark.operators.upsert import surrogate_ids

    rows = [(k, i) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "uid string, seq int").repartition(parts)
    got = {
        (r.uid, r.seq): r.sid
        for r in surrogate_ids(df, ["uid", "seq"], "sid", prefix_len=prefix_len).collect()
    }
    w = Window.orderBy(F.asc("uid"), F.asc("seq"))
    want = {
        (r.uid, r.seq): r.sid
        for r in df.withColumn("sid", F.row_number().over(w)).collect()
    }
    assert got == want


@given(
    docs=st.lists(
        st.lists(st.sampled_from(list("abcdefgh")), min_size=0, max_size=10),
        min_size=0,
        max_size=20,
    ),
    cap=st.sampled_from([2, 5, 32]),
)
@settings(**_SETTINGS)
def test_lsh_bucket_pairs_equals_selfjoin_form(spark, docs, cap):
    """The one-shuffle in-bucket enumeration (lsh_bucket_pairs) must emit
    exactly the pairs of the self-join form (lsh_candidate_pairs +
    Jaccard verify) at the same bucket cap — same ids, same jaccard."""
    from politician_etl_project_spark.operators.dedup import (
        jaccard,
        lsh_bucket_pairs,
        lsh_candidate_pairs,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows or [(0, "x")], "doc_id int, text string").filter(
        F.lit(bool(rows))
    )
    toked = df.select("doc_id", F.array_distinct(F.split(F.trim("text"), r"\s+")).alias("toks"))
    got = {
        (r.id_a, r.id_b, str(r.jaccard))
        for r in lsh_bucket_pairs(
            toked, "doc_id", n_hashes=4, rows_per_band=2, max_bucket=cap,
            tokens_col="toks", min_jaccard=0.5,
        ).distinct().collect()
    }
    pairs = lsh_candidate_pairs(df, "doc_id", "text", 4, 2, max_bucket=cap)
    a = toked.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("ta"))
    b = toked.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("tb"))
    want = {
        (r.id_a, r.id_b, str(r.jaccard))
        for r in pairs.join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b", jaccard("ta", "tb").alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    }
    assert got == want


# ---- connected components vs driver-side union-find ----------------------

edges_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=15), st.integers(min_value=0, max_value=15)),
    min_size=0,
    max_size=20,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        if u == v:
            find(u)
            continue
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    comp = {}
    for u, v in edges:
        if u != v:
            comp[u] = None
            comp[v] = None
    for n in comp:
        comp[n] = find(n)
    # min-id relabel (union-find roots are already the component min here,
    # but recompute defensively)
    mins = {}
    for n, r in comp.items():
        mins[r] = min(mins.get(r, n), n)
    return {(n, mins[r]) for n, r in comp.items()}


@given(edges=edges_strategy)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_connected_components_matches_union_find(spark, edges):
    from politician_etl_project_spark.operators.components import connected_components

    df = spark.createDataFrame(edges or [(0, 0)], "id_a int, id_b int").filter(
        F.lit(bool(edges))
    )
    got = {(r["node"], r["component"]) for r in connected_components(df).collect()}
    assert got == _union_find(edges)


def test_connected_components_chain_and_star(spark):
    """A 40-node path (worst case for naive propagation) plus a hub star
    and an isolated pair — converges in O(log^2 n) star rounds and lands
    every node on the component minimum.  Run through BOTH physical
    strategies (driver union-find and distributed star rounds, round-8
    size-adaptive split) — they must agree exactly."""
    from politician_etl_project_spark.operators.components import connected_components

    chain = [(i, i + 1) for i in range(100, 140)]
    star = [(7, i) for i in range(200, 220)]
    pair = [(998, 999), (999, 998), (998, 998)]  # reversed dup + self-loop
    df = spark.createDataFrame(chain + star + pair, "id_a int, id_b int")
    expected = (
        {(i, 100) for i in range(100, 141)}
        | {(i, 7) for i in range(200, 220)} | {(7, 7)}
        | {(999, 998), (998, 998)}
    )
    for threshold in (None, 0):  # None -> driver path here; 0 -> star rounds
        got = {
            (r["node"], r["component"])
            for r in connected_components(df, driver_threshold=threshold).collect()
        }
        assert got == expected, f"strategy driver_threshold={threshold} diverged"


def test_connected_components_strategies_agree_on_random_graph(spark):
    """The size-adaptive strategies must be indistinguishable: a
    seeded random graph (dense enough for multi-round star convergence)
    through the distributed path equals the driver union-find path."""
    import random

    from politician_etl_project_spark.operators.components import connected_components

    rng = random.Random(20260815)
    edges = [(rng.randrange(400), rng.randrange(400)) for _ in range(300)]
    df = spark.createDataFrame(edges, "id_a int, id_b int")
    driver = {
        (r["node"], r["component"])
        for r in connected_components(df, driver_threshold=10**6).collect()
    }
    dist = {
        (r["node"], r["component"])
        for r in connected_components(df, driver_threshold=0).collect()
    }
    assert driver == dist and len(driver) > 100


def test_cluster_joinback_broadcasts_only_on_driver_path(spark):
    """r11: when the size-adaptive CC ran its driver union-find, the
    component table's exact size is known, so duplicate_clusters tags
    its output with a broadcast hint — a corpus join-back must then be
    a BroadcastHashJoin (no corpus shuffle by doc_id).  The distributed
    path must NOT be tagged: at scale the cluster table can be huge and
    the shuffled join is the only safe plan.  Results are identical on
    both paths (strategy-agreement tests above); this pins the PLAN."""
    from politician_etl_project_spark.operators.components import (
        connected_components,
        duplicate_clusters,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a bigint, id_b bigint"
    )
    corpus = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(1, 40)], "doc_id bigint, source string"
    )

    import os

    def joined_plan(driver_threshold: int) -> str:
        # pin the env var for BOTH halves (r11 ADVICE #3): the internal
        # duplicate_clusters CC call reads the ambient environment, so
        # a CI job exporting SPARK_GRAFT_CC_DRIVER_EDGES=0 would
        # otherwise flip the driver-path half spuriously
        old = os.environ.get("SPARK_GRAFT_CC_DRIVER_EDGES")
        os.environ["SPARK_GRAFT_CC_DRIVER_EDGES"] = str(driver_threshold)
        try:
            comp = connected_components(pairs, driver_threshold=driver_threshold)
            assert (getattr(comp, "_cc_driver_rows", None) is not None) == (
                driver_threshold > 0
            )
            clusters = duplicate_clusters(pairs).select("doc_id", "cluster_id")
            return (
                corpus.join(clusters, "doc_id", "left")
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        finally:
            if old is None:
                os.environ.pop("SPARK_GRAFT_CC_DRIVER_EDGES", None)
            else:
                os.environ["SPARK_GRAFT_CC_DRIVER_EDGES"] = old

    driver_plan = joined_plan(10**6)
    assert "BroadcastHashJoin" in driver_plan and "SortMergeJoin" not in driver_plan
    dist_plan = joined_plan(0)
    assert "SortMergeJoin" in dist_plan and "BroadcastHashJoin" not in dist_plan


def test_cc_broadcast_hint_capped_by_fixed_row_count(spark, monkeypatch):
    """r11 ADVICE #1: the driver-path broadcast hint must be gated by a
    FIXED row-count constant, not only by the env-overridable driver
    threshold — a raised $SPARK_GRAFT_CC_DRIVER_EDGES must not be able
    to force an arbitrarily large broadcast."""
    from politician_etl_project_spark.operators import components as C

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a bigint, id_b bigint"
    )
    corpus = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(1, 40)], "doc_id bigint, source string"
    )
    monkeypatch.setenv("SPARK_GRAFT_CC_DRIVER_EDGES", "1000000")
    monkeypatch.setattr(C, "_CC_BROADCAST_ROW_CAP", 2)  # 5 assignment rows > 2
    comp = C.connected_components(pairs)
    assert getattr(comp, "_cc_driver_rows", None) == 5  # driver path ran
    clusters = C.duplicate_clusters(pairs).select("doc_id", "cluster_id")
    plan = (
        corpus.join(clusters, "doc_id", "left")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" not in plan  # over-cap: no forced broadcast


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12), st.integers(1, 5)),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pagerank_mass_conservation_and_positivity(spark, edges):
    """Integer PageRank invariants on arbitrary undirected graphs: every
    rank positive; total mass never exceeds the initial micro budget and
    loses at most a bounded number of units per round to integer floors
    (each DIV discards < 1 unit per edge/vertex)."""
    from politician_etl_project_spark.operators.graph import pagerank_micro

    rows = [(u, v, w) for u, v, w in edges if u != v]
    if not rows:
        return
    df = spark.createDataFrame(rows, "u long, v long, w long")
    sym = df.union(df.selectExpr("v as u", "u as v", "w"))
    sym = sym.groupBy("u", "v").agg(F.sum("w").alias("w"))
    ranks = pagerank_micro(sym, iterations=2).collect()
    n = len({r["u"] for r in ranks})
    assert all(r["r"] > 0 for r in ranks)
    total = sum(r["r"] for r in ranks)
    micro = 1_000_000_000
    # ceiling: initial mass; floor: generous slack for per-edge/vertex DIV loss
    assert total <= micro + n
    assert total >= micro - (2 * (len(rows) * 2 + n) * 2 + n) - micro // 10


def test_quantize_error_bound(spark, sf_dir):
    """int8 symmetric quantization: per-element reconstruction error is
    at most scale/2 (round-half-up), so max_err_nano <= scale_nano/2 + 1."""
    from politician_etl_project_spark.queries import load_all

    df = load_all()["q_embed_quantize"].fn(spark, sf_dir)
    for r in df.collect():
        assert r["max_err_nano"] <= r["scale_nano"] // 2 + 1, r


# ---------------------------------------------------------------------------
# Triangles: degree-oriented enumeration == brute force on random graphs
# ---------------------------------------------------------------------------

edge_strategy = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=0, max_size=30
)


@given(edges=edge_strategy)
@settings(**_SETTINGS)
def test_triangles_match_bruteforce(spark, edges):
    from itertools import combinations

    from politician_etl_project_spark.operators.graph import triangles

    df = spark.createDataFrame(edges or [(0, 0)], "u int, v int").filter(
        F.lit(bool(edges))
    )
    got = {(r.t1, r.t2, r.t3) for r in triangles(df).collect()}
    eset = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    verts = sorted({x for e in eset for x in e})
    want = {
        (a, b, c)
        for a, b, c in combinations(verts, 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    }
    assert got == want


# ---------------------------------------------------------------------------
# CDC apply: latest-seq-wins MERGE == a sequential replay of the log
# ---------------------------------------------------------------------------

chg_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),                      # key
        st.integers(0, 20),                     # seq
        st.sampled_from(["U", "D"]),            # op
        st.integers(-50, 50),                   # new value
    ),
    min_size=0,
    max_size=25,
    unique_by=lambda t: (t[0], t[1]),           # unique (key, seq): a real log's LSN
)


@given(base=rows_strategy, changes=chg_strategy, parts=st.sampled_from([1, 3, 7]))
@settings(**_SETTINGS)
def test_apply_changelog_equals_python_model(spark, base, changes, parts):
    """Latest-op-wins MERGE against a direct python model: per key the
    highest-seq change decides (D -> absent; U -> new value, base attrs
    carried for pre-existing keys, NULL attrs for inserts); untouched
    base rows carry forward.  Partitioning must not matter."""
    from politician_etl_project_spark.operators.upsert import apply_changelog

    # base must be a valid snapshot (one live row per key): drop dup draws
    base_keys = [r[0] for r in base]
    if len(base_keys) != len(set(base_keys)):
        base = list({r[0]: r for r in base}.values())

    base_df = _df(spark, base, parts)
    chg_df = spark.createDataFrame(
        changes or [(0, 0, "U", 0)], "k int, seq int, op string, v int"
    ).filter(F.lit(bool(changes)))
    out = {
        r.k: (r.v, r.attr)
        for r in apply_changelog(
            base_df, chg_df, key="k", seq="seq", op="op"
        ).collect()
    }

    state = {k: (v, attr) for k, v, attr in base}
    last = {}
    for k, seq, op, v in changes:
        if k not in last or seq > last[k][0]:
            last[k] = (seq, op, v)
    for k, (_seq, op, v) in last.items():
        if op == "D":
            state.pop(k, None)
        else:
            base_attr = dict((b[0], b[2]) for b in base).get(k)
            state[k] = (v, base_attr)
    assert out == state


# ---------------------------------------------------------------------------
# SnapshotTable: random write sequences == a python model, at every version
# ---------------------------------------------------------------------------

write_strategy = st.lists(
    st.tuples(
        st.sampled_from(["overwrite", "append", "upsert"]),
        st.lists(
            st.tuples(st.integers(0, 9), st.integers(-50, 50)),
            min_size=0,
            max_size=6,
        ),
    ),
    min_size=1,
    max_size=6,
)


@given(writes=write_strategy)
@settings(**_SETTINGS)
def test_snapshot_table_matches_model(spark, writes, tmp_path_factory):
    """Every published version must forever read back exactly what the
    write sequence implied at that point: overwrite replaces, append
    concatenates (duplicates preserved), upsert merges by key with
    update-wins.  Time travel = replaying the model prefix."""
    from politician_etl_project_spark.storage import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path_factory.mktemp("snapprop") / "t"))
    model_states: list[list[tuple[int, int]]] = []
    state: list[tuple[int, int]] = []
    for op, rows in writes:
        df = spark.createDataFrame(rows or [(0, 0)], "k long, v long").filter(
            F.lit(bool(rows))
        )
        if op == "overwrite":
            t.overwrite(df)
            state = list(rows)
        elif op == "append":
            if t.current_version() is None:
                t.overwrite(df, op="append")
            else:
                t.append(df)
            state = state + list(rows)
        else:
            t.upsert(df, keys=["k"])
            # merge_keep / dedup_keys order ties by the value columns
            # ASCENDING, so the deterministic winner is the LOWEST value
            # per key WITHIN each side; update-wins puts incoming first.
            # The merge also rewrites the table one-row-per-key, so any
            # append-introduced duplicate keys collapse here.
            merged: dict[int, int] = {}
            for k, v in state:
                if k not in merged or v < merged[k]:
                    merged[k] = v
            incoming: dict[int, int] = {}
            for k, v in rows:
                if k not in incoming or v < incoming[k]:
                    incoming[k] = v
            merged.update(incoming)
            state = sorted(merged.items())
        model_states.append(list(state))
    # every version still reads back its model prefix
    for v, want in zip(t.versions(), model_states):
        got = sorted((r.k, r.v) for r in t.read(v).collect())
        assert got == sorted(want), f"version {v}: {got} != {sorted(want)}"


# ---------------------------------------------------------------------------
# Corpus segment dedup (operators/dedup.segment_dedup)
# ---------------------------------------------------------------------------

_seg_corpus = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=9).map(
        " ".join
    ),
    min_size=1,
    max_size=8,
)


def _segment_dedup_model(texts, k=3):
    """Brute-force keep-first model over (doc order, segment order)."""
    seen = set()
    out = {}
    for doc_id, text in enumerate(texts):
        w = text.split()
        segs = [" ".join(w[i : i + k]) for i in range(0, len(w), k)]
        kept = [s for s in segs if s not in seen and not seen.add(s)]
        out[doc_id] = (len(segs), len(kept), " ".join(kept) if kept else None)
    return out


@given(texts=_seg_corpus, parts=st.sampled_from([1, 5]))
@settings(**_SETTINGS)
def test_segment_dedup_matches_python_model(spark, texts, parts):
    """Tiny vocab forces heavy cross-doc segment collisions; the Spark
    aggregate's winner must equal the sequential keep-first model for
    every doc, under any partitioning."""
    from politician_etl_project_spark.operators.dedup import segment_dedup

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    ).repartition(parts)
    got = {
        r.doc_id: (r.n_segs, r.n_kept, r.kept_text)
        for r in segment_dedup(docs, seg_tokens=3).collect()
    }
    assert got == _segment_dedup_model(texts, 3)


# --- round-6: pure-numpy container codecs (no Spark jobs — pure python) -----

_CODEC_SETTINGS = dict(max_examples=60, deadline=None)


@given(
    vals=st.lists(st.integers(0, 255), min_size=1, max_size=200),
    width=st.integers(1, 17),
)
@settings(**_CODEC_SETTINGS)
def test_bmp_roundtrip_property(vals, width):
    """Any grayscale payload with >= one complete row survives the
    24-bit BMP encode/parse round trip exactly — across every row
    padding (width % 4) and truncated-tail case."""
    import numpy as np

    from politician_etl_project_spark.operators.multimodal import decode_real, encode_bmp

    arr = np.array(vals, dtype=np.uint8)
    h = arr.size // width
    if h < 1:
        return  # encoder refuses (tested separately); property needs a row
    img = decode_real(encode_bmp(arr, width))
    assert img.shape == (h, width, 3)
    expect = np.repeat(arr[: h * width].reshape(h, width), 3).reshape(h, width, 3)
    np.testing.assert_array_equal(img, expect)


@given(vals=st.lists(st.integers(-32768, 32767), min_size=0, max_size=300))
@settings(**_CODEC_SETTINGS)
def test_wav_roundtrip_property(vals):
    import numpy as np

    from politician_etl_project_spark.operators.multimodal import decode_real, encode_wav

    samples = np.array(vals, dtype=np.int16)
    np.testing.assert_array_equal(decode_real(encode_wav(samples)), samples)


@given(
    vals=st.lists(st.integers(0, 255), min_size=3, max_size=240),
    width=st.integers(1, 9),
)
@settings(**_CODEC_SETTINGS)
def test_ppm_roundtrip_property(vals, width):
    import numpy as np

    from politician_etl_project_spark.operators.multimodal import decode_real, encode_ppm

    arr = np.array(vals, dtype=np.uint8)
    if arr.size // (width * 3) < 1:
        return
    img = decode_real(encode_ppm(arr, width))
    h = arr.size // (width * 3)
    assert img.shape == (h, width, 3)
    np.testing.assert_array_equal(img.reshape(-1), arr[: h * width * 3])


# --- round-6: digest-keyed segment dedup equals the direct form -------------

_corpus_strategy = st.lists(
    st.text(alphabet="ab x", min_size=0, max_size=24),  # tiny alphabet -> heavy dup rates
    min_size=0,
    max_size=14,
)


@given(texts=_corpus_strategy, seg=st.sampled_from([1, 2, 3]))
@settings(**_SETTINGS)
def test_segment_dedup_digest_equals_direct_property(spark, texts, seg):
    """Hypothesis twin of the fixed-corpus equality test: on random
    corpora with adversarial duplication/whitespace, the digest-keyed
    winner exchange must reproduce the direct form bit-for-bit."""
    from politician_etl_project_spark.operators.dedup import segment_dedup

    docs = spark.createDataFrame(
        list(enumerate(texts)) or [(0, "")], "doc_id bigint, text string"
    ).filter(F.lit(bool(texts)))
    direct = sorted(map(tuple, segment_dedup(docs, seg_tokens=seg, key="direct").collect()))
    digest = sorted(map(tuple, segment_dedup(docs, seg_tokens=seg, key="digest").collect()))
    assert direct == digest


@given(
    vals=st.lists(st.integers(0, 255), min_size=1, max_size=400),
    width=st.integers(1, 13),
    color_type=st.sampled_from([0, 2, 6]),
)
@settings(**_CODEC_SETTINGS)
def test_png_roundtrip_property(vals, color_type, width):
    """Any 8-bit payload with >= one complete scanline survives the
    zlib PNG encode/inflate/unfilter round trip exactly — across gray/
    RGB/RGBA channel layouts, every scanline width (including width 1,
    where left-predictors see only zeros), and heights that cycle
    through all five filter types."""
    import numpy as np

    from politician_etl_project_spark.operators.multimodal import decode_real, encode_png

    arr = np.array(vals, dtype=np.uint8)
    ch = {0: 1, 2: 3, 6: 4}[color_type]
    h = arr.size // (width * ch)
    if h < 1:
        return  # encoder refuses (tested separately)
    img = decode_real(encode_png(arr, width, color_type=color_type))
    assert img.shape == (h, width, ch)
    np.testing.assert_array_equal(img.reshape(-1), arr[: h * width * ch])


@given(
    vals=st.lists(st.integers(0, 255), min_size=4, max_size=64),
    color=st.booleans(),
)
@settings(**_CODEC_SETTINGS)
def test_jpeg_block_constant_roundtrip_property(vals, color):
    """ANY byte sequence survives the q_media_decode_jpeg packing
    bit-exactly: bytes become block-constant gray levels, go through
    the full baseline pipeline (DCT, all-8 quantizer, zigzag, Annex-K
    Huffman, byte stuffing — plus 4:2:0 subsampling, MCU interleave and
    YCbCr conversion on the color variant) and decode back to the same
    image.  This is the exactness window the declared query's oracle
    relies on; arbitrary DC deltas across blocks exercise every DC
    category the packing can produce."""
    import numpy as np

    from politician_etl_project_spark.operators.multimodal import decode_real, encode_jpeg

    q8 = np.full(64, 8, np.int64)
    arr = np.array(vals, dtype=np.uint8)
    usable = (arr.size // 4) * 4
    ones = np.ones((8, 8), np.uint8)
    if color:
        img = np.repeat(np.kron(arr[:usable].reshape(-1, 2), ones)[:, :, None], 3, axis=2)
        payload = encode_jpeg(img, subsample="4:2:0", quant_luma=q8, quant_chroma=q8)
    else:
        img = np.kron(arr[:usable].reshape(-1, 4), ones)
        payload = encode_jpeg(img, quant_luma=q8)
    np.testing.assert_array_equal(decode_real(payload), img)


@given(
    vals=st.lists(st.integers(0, 255), min_size=64, max_size=256),
    width=st.sampled_from([8, 11, 16]),
    color=st.booleans(),
)
@settings(**_CODEC_SETTINGS)
def test_jpeg_progressive_equals_baseline_property(vals, width, color):
    """For ANY image, progressive=True reorders the same quantized
    coefficients into an SOF2 multi-scan file — decoded pixels must be
    IDENTICAL to the baseline file's, across gray/color, odd dims, and
    every spectral band population the input happens to produce."""
    import numpy as np

    from politician_etl_project_spark.operators.multimodal import _decode_jpeg, encode_jpeg

    arr = np.array(vals, dtype=np.uint8)
    ch = 3 if color else 1
    h = arr.size // (width * ch)
    if h < 1:
        return
    img = arr[: h * width * ch].reshape(h, width, ch).squeeze()
    base = _decode_jpeg(encode_jpeg(img, quality=80))
    prog = _decode_jpeg(encode_jpeg(img, quality=80, progressive=True))
    np.testing.assert_array_equal(prog, base)


@given(
    flips=st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(1, 255)), min_size=1, max_size=4
    ),
    trunc=st.integers(0, 64),
)
@settings(**_CODEC_SETTINGS)
def test_jpeg_corruption_fuzz_never_leaks_other_exceptions(flips, trunc):
    """decode_real's contract: a corrupt payload raises ValueError —
    never struct.error / IndexError / a runaway allocation.  Fuzz a
    valid JPEG with random byte flips and truncation; decoding must
    either still succeed (flips in padding or APP0 are benign) or raise
    ValueError, and nothing else."""
    import numpy as np

    from politician_etl_project_spark.operators.multimodal import _decode_jpeg, encode_jpeg

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    good = bytearray(encode_jpeg(img, quality=80))
    for pos, delta in flips:
        good[pos % len(good)] = (good[pos % len(good)] + delta) & 0xFF
    payload = bytes(good[: max(2, len(good) - trunc)])
    try:
        out = _decode_jpeg(payload)
        assert isinstance(out, np.ndarray)
    except ValueError:
        pass  # the contract: loud, typed failure


@given(
    vals=st.lists(st.integers(0, 255), min_size=64, max_size=192),
    width=st.sampled_from([8, 11, 16]),
)
@settings(**_CODEC_SETTINGS)
def test_jpeg_lossy_error_is_bounded_property(vals, width):
    """On ARBITRARY (non-block-constant) images the codec is lossy but
    the error is mathematically bounded: with a quant table of all 2s
    each coefficient moves at most 1, and the IDCT basis magnitude is
    <= 1/4, so no pixel can move more than 64 * 1/4 = 16 (pre-rounding;
    +1 for the two rounding steps).  Catches any systematic distortion
    (zigzag/dequant/table mix-ups) that the exactness window's
    permutation-invariant all-8 table cannot see."""
    import numpy as np

    from politician_etl_project_spark.operators.multimodal import decode_real, encode_jpeg

    arr = np.array(vals, dtype=np.uint8)
    h = arr.size // width
    img = arr[: h * width].reshape(h, width)
    out = decode_real(encode_jpeg(img, quant_luma=np.full(64, 2, np.int64)))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 17, f"max pixel error {err.max()} exceeds the q=2 bound"
