"""Driver-side source acquisition helpers (SURVEY S4/S5/S10/T4).

The reference pulls data into staging dirs before any dataframe work:
HTTP zips of FEC bulk files (``scripts/update_donations.py:68-125``),
paginated Congress.gov REST pages (``scripts/ingest_bills.py:59-139``),
and a probe loop that scrapes ids past the known max until N consecutive
misses (``scripts/update_votes.py:232-287``).  These are *driver-side
orchestration around the engine* — the engine proper starts at the
staging-dir scan (S1/S6/S7).  Each helper is dependency-injected
(callables in, rows out) so it unit-tests without network, and the
network paths are gated behind stdlib urllib.

Scale note: a single driver fetching 100 TB is wrong; at that scale the
id-space is partitioned into a DataFrame and fetches run inside
``mapInPandas`` workers (SURVEY S5 note) — ``paginate``/``probe_ids``
are the per-worker loop bodies for that layout too.
"""

from __future__ import annotations

import os
import zipfile
from collections.abc import Callable, Iterator
from typing import Any


def extract_zip(zip_path: str, staging_dir: str, suffix: str = ".txt") -> list[str]:
    """Extract matching members of a downloaded archive into the staging
    dir (reference zipfile.extract of indiv{yy}.zip,
    update_donations.py:110-125).  Returns extracted paths."""
    out: list[str] = []
    os.makedirs(staging_dir, exist_ok=True)
    with zipfile.ZipFile(zip_path) as zf:
        for name in zf.namelist():
            if name.endswith(suffix):
                zf.extract(name, staging_dir)
                out.append(os.path.join(staging_dir, name))
    return out


def fetch_zip_to_staging(url: str, staging_dir: str, suffix: str = ".txt") -> list[str]:
    """S4: download an archive and extract data members.  Network path —
    kept out of tests; the extract step is covered via a local archive."""
    import urllib.request

    os.makedirs(staging_dir, exist_ok=True)
    zip_path = os.path.join(staging_dir, os.path.basename(url) or "download.zip")
    urllib.request.urlretrieve(url, zip_path)  # noqa: S310 — explicit driver-side fetch
    return extract_zip(zip_path, staging_dir, suffix)


def paginate(
    fetch_page: Callable[[int], dict[str, Any]],
    items_key: str,
    max_pages: int = 10_000,
) -> Iterator[dict[str, Any]]:
    """S5: pagination.next-style REST loop (ingest_bills.py:59-139).
    ``fetch_page(offset)`` returns ``{items_key: [...], 'pagination':
    {'next': url_or_None}}``; iteration stops when no next page.  Backoff
    on 429 is the fetcher's concern (it owns the HTTP client)."""
    offset = 0
    for _ in range(max_pages):
        page = fetch_page(offset)
        items = page.get(items_key) or []
        yield from items
        nxt = (page.get("pagination") or {}).get("next")
        if not nxt or not items:
            return
        offset += len(items)


def paginate_partitioned(
    spark,
    fetch_page: Callable[[int], dict[str, Any]],
    items_key: str,
    total_items: int,
    page_size: int,
    n_partitions: int = 8,
):
    """S5 at scale: the ``mapInPandas``-over-id-partitions twin of
    :func:`paginate` (SURVEY §2.1 S5's own at-scale mapping).  The
    page-offset space is partitioned into a DataFrame and each WORKER
    fetches its assigned offsets — a thousand executors pull a
    million-page API in parallel instead of one driver walking
    ``pagination.next`` sequentially.

    Contract difference from the driver loop: the offset space must be
    known up front (``total_items``, from the API's count field or a
    HEAD probe) because next-links only exist after fetching the
    previous page — that sequential dependency is exactly what this
    layout removes.  ``fetch_page(offset)`` has the same signature as
    in :func:`paginate` and is shipped to workers by closure pickling,
    so it must stay self-contained (build its HTTP client lazily inside
    the call, never capture a live connection).

    Returns a DataFrame ``(offset BIGINT, item_json STRING)`` — one row
    per item, JSON-encoded with sorted keys so downstream
    ``from_json``/comparison is deterministic.  Rate limits shape this
    path too: n_partitions bounds concurrent fetchers, and a 429
    backoff belongs inside ``fetch_page`` exactly as on the driver."""
    import json as _json

    offsets = list(range(0, max(int(total_items), 0), page_size))
    if not offsets:
        return spark.createDataFrame([], "offset bigint, item_json string")
    off_df = spark.createDataFrame([(o,) for o in offsets], "offset bigint").repartition(
        min(n_partitions, len(offsets)), "offset"
    )

    def _fetch(batches):
        import pandas as pd

        for pdf in batches:
            offs, items = [], []
            for off in pdf["offset"]:
                page = fetch_page(int(off))
                if items_key not in page:
                    # A page missing its items envelope is a transient
                    # API failure, not an empty page — treating it as
                    # zero items would ship a SILENT GAP in the fetched
                    # set (round-7 advice; the driver loop at least
                    # stops at its first empty page).  Raise so the
                    # task retries / the job fails loudly; a fetcher
                    # that wants partial results can catch upstream.
                    raise ValueError(
                        f"page at offset {int(off)} has no {items_key!r} key "
                        f"(got keys {sorted(page)}): transient fetch failure, "
                        "refusing to record it as an empty page"
                    )
                for item in page.get(items_key) or []:
                    offs.append(int(off))
                    items.append(_json.dumps(item, sort_keys=True))
            yield pd.DataFrame(
                {
                    "offset": pd.Series(offs, dtype="int64"),
                    "item_json": pd.Series(items, dtype=object),
                }
            )

    return off_df.mapInPandas(_fetch, "offset bigint, item_json string")


def probe_ids(
    fetch: Callable[[int], bool],
    start: int,
    max_consecutive_failures: int = 3,
    cap: int = 50,
) -> list[int]:
    """T4: incremental discovery loop — try ids max+1, max+2, … until N
    consecutive misses or the cap (update_votes.py:232-287: 3 misses for
    votes, 10 for bills, cap 50).  ``fetch(id)`` returns True when the id
    materialized data into staging."""
    found: list[int] = []
    misses = 0
    i = start
    while misses < max_consecutive_failures and len(found) + misses < cap:
        i += 1
        if fetch(i):
            found.append(i)
            misses = 0
        else:
            misses += 1
    return found
