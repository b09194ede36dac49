"""Guards on the driver verification window (queries/__init__.DRIVER_WINDOW).

The driver hash-verifies registry entries [:50] per round, so the window
head is load-bearing evidence: a duplicate slot silently wastes a check,
and a query that never rotates into the head is never driver-verified.
These tests fail the moment either happens (round-3 verdict item 3).
"""

from __future__ import annotations

import json
import os

from politician_etl_project_spark.queries import DRIVER_WINDOW, load_all

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _driver_checked_names() -> set[str]:
    """Union of all query names that ever had a driver CORRECTNESS row."""
    names: set[str] = set()
    for fn in sorted(os.listdir(REPO_ROOT)):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            with open(os.path.join(REPO_ROOT, fn)) as fh:
                names |= set(json.load(fh))
    return names


def test_window_head_is_unique():
    head = DRIVER_WINDOW[:WINDOW]
    assert len(head) == len(set(head)), "duplicate slot wastes a driver check"


def test_window_names_all_registered():
    specs = load_all()
    missing = [n for n in DRIVER_WINDOW if n not in specs]
    assert not missing, f"DRIVER_WINDOW names not in registry: {missing}"


def test_registry_leads_with_window_head():
    """load_all must serve the window head as the first 50 entries —
    that ordering IS what the driver consumes."""
    specs = load_all()
    assert list(specs)[:WINDOW] == DRIVER_WINDOW[:WINDOW]


def test_every_never_checked_query_is_in_window_head():
    """Every registered query lacking a driver CORRECTNESS row across
    all recorded rounds must occupy a current-window slot (or there are
    more such queries than slots — then the set must be EXACTLY the
    head, rotating the backlog through).  Adding a query without
    scheduling it fails here."""
    specs = load_all()
    never = [n for n in specs if n not in _driver_checked_names()]
    head = set(DRIVER_WINDOW[:WINDOW])
    if len(never) <= WINDOW:
        out = [n for n in never if n not in head]
        assert not out, f"never-driver-checked queries outside window head: {out}"
    else:
        assert all(n in never for n in head), (
            "window head wastes slots on already-checked queries while a "
            f"{len(never)}-query backlog exists"
        )


def _latest_checked_round() -> dict[str, int]:
    """Per query, the most recent round with a driver CORRECTNESS row."""
    latest: dict[str, int] = {}
    for fn in sorted(os.listdir(REPO_ROOT)):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            rnd = int(fn[len("CORRECTNESS_r") : -len(".json")])
            with open(os.path.join(REPO_ROOT, fn)) as fh:
                for name in json.load(fh):
                    latest[name] = max(latest.get(name, 0), rnd)
    return latest


def test_window_head_prefers_stalest():
    """The head must spend its slots on the STALEST driver evidence
    (round-5 verdict item 1): aside from never-checked queries (covered
    above) and the bounded sentinel list (code changed this round, so
    their prior green is stale by definition), every verified head
    slot must be no FRESHER than any verified query left outside the
    head.  A fresh name occupying a slot while a staler one waits
    means the rotation stopped working."""
    from politician_etl_project_spark.queries import WINDOW_SENTINELS

    assert len(WINDOW_SENTINELS) <= 10, "sentinel list must stay bounded"
    latest = _latest_checked_round()
    specs = load_all()
    head = DRIVER_WINDOW[:WINDOW]
    rotating = [
        n for n in head if n in latest and n not in WINDOW_SENTINELS
    ]
    outside = [n for n in specs if n not in head and n in latest]
    if not rotating or not outside:
        return
    freshest_in = max(latest[n] for n in rotating)
    stalest_out = min(latest[n] for n in outside)
    offenders = [n for n in rotating if latest[n] > stalest_out]
    assert freshest_in <= stalest_out, (
        f"head holds round-{freshest_in} evidence {offenders} while "
        f"round-{stalest_out} names wait outside"
    )


def test_bench_exclusions_are_registered_and_reasoned():
    """bench.py covers the registry minus BENCH_EXCLUDED; every
    exclusion must name a real query and carry a non-trivial reason —
    a stale name would silently shrink the no-silent-caps guarantee."""
    import bench

    specs = load_all()
    for name, reason in bench.BENCH_EXCLUDED.items():
        assert name in specs, f"BENCH_EXCLUDED names unknown query {name}"
        assert len(reason) > 40, f"exclusion reason for {name} too thin"
    assert len(bench.BENCH_EXCLUDED) <= 5, "exclusion list must stay short"
