"""Unit tests for functions/url.canonical_url — edge cases beyond the
synthetic corpus the declared queries exercise (q_url_canonicalize):
http:80, multiple/uppercase utm params, mixed params, idempotence."""

from __future__ import annotations

from politician_etl_project_spark.functions.url import canonical_url, url_host

CASES = [
    # (raw, canonical)
    ("https://www.Site.com/Page", "https://site.com/page"),
    ("HTTPS://SITE.COM:443/a", "https://site.com/a"),
    ("http://site.com:80/a", "http://site.com/a"),
    # non-default port survives
    ("https://site.com:8443/a", "https://site.com:8443/a"),
    ("https://site.com/a#frag", "https://site.com/a"),
    ("https://site.com/a?utm_source=x", "https://site.com/a"),
    ("https://site.com/a?UTM_SOURCE=x", "https://site.com/a"),  # lowered first
    ("https://site.com/a?utm_source=x&utm_medium=y", "https://site.com/a"),
    ("https://site.com/a?utm_source=x&id=7", "https://site.com/a?id=7"),
    ("https://site.com/a?id=7&utm_source=x", "https://site.com/a?id=7"),
    ("https://site.com/a?ref=rss", "https://site.com/a?ref=rss"),  # kept
    # anchored utm strip: a param NAME merely containing 'utm_' and a
    # VALUE containing 'utm_x=' are legitimate and must survive
    ("https://site.com/a?xutm_source=1", "https://site.com/a?xutm_source=1"),
    ("https://site.com/a?a=utm_b=c", "https://site.com/a?a=utm_b=c"),
    # three consecutive utm params collapse their separators cleanly
    (
        "https://site.com/a?utm_a=1&utm_b=2&utm_c=3&ref=4",
        "https://site.com/a?ref=4",
    ),
    # default port strips with no path / before a query string too
    ("https://site.com:443", "https://site.com"),
    ("https://site.com:443?id=1", "https://site.com?id=1"),
    ("http://site.com:80", "http://site.com"),
    ("https://www.site.com:443/a?utm_campaign=z#s2", "https://site.com/a"),
    # www in the PATH is untouched; only the leading host www. strips
    ("https://site.com/www.other.com", "https://site.com/www.other.com"),
    ("not a url", "not a url"),  # degrades to identity, never errors
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "raw string")
    got = [r.c for r in df.select(canonical_url("raw").alias("c")).collect()]
    want = [c for _, c in CASES]
    assert got == want


def test_canonical_url_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) — a second normalization
    pass (re-crawl of an already-normalized URL) is a no-op."""
    df = spark.createDataFrame([(r,) for r, _ in CASES], "raw string")
    once = df.select(canonical_url("raw").alias("c"))
    twice = once.select(canonical_url("c").alias("c2"))
    assert [r.c2 for r in twice.collect()] == [r.c for r in once.collect()]


def test_url_host(spark):
    rows = [
        ("https://site.com/a", "site.com"),
        ("http://sub.site.com/a?x=1", "sub.site.com"),
        ("https://site.com:8443/a", "site.com"),  # stops at the port
        ("nonsense", ""),
    ]
    df = spark.createDataFrame([(r,) for r, _ in rows], "u string")
    got = [r.h for r in df.select(url_host("u").alias("h")).collect()]
    assert got == [h for _, h in rows]


def test_dangling_amp_after_trailing_utm_strip(spark):
    """utm at the END after a kept param leaves '...?id=7&' — the
    dangling-separator sweep must clean it."""
    df = spark.createDataFrame(
        [("https://site.com/a?id=7&utm_source=x&utm_ref=y",)], "raw string"
    )
    got = df.select(canonical_url("raw").alias("c")).collect()[0].c
    assert got == "https://site.com/a?id=7"
