"""URL canonicalization — the normalization pass every web-corpus
curation pipeline runs before URL-level dedup (the reference stores raw
source URLs on scraped pages and dedups them verbatim; at corpus scale
the SAME page arrives under dozens of spellings and verbatim matching
under-dedups).

All rules are single Column expression trees (whole-stage codegen, no
UDF), applied in a fixed order so the Spark query and a SQL oracle can
mirror each other step for step:

1. lowercase the whole URL (scheme + host are case-insensitive; our
   synthetic paths are already lower — a production variant would
   lowercase only up to the path);
2. strip the fragment (``#...`` never reaches the server);
3. strip tracking parameters (``utm_*=...`` plus a trailing ``&``);
4. strip a now-dangling ``?`` or ``&``;
5. strip explicit default ports (``https://h:443/`` → ``https://h/``,
   ``http://h:80/`` → ``http://h/``);
6. strip a leading ``www.``.

Order matters: lowering first makes the utm/port/www rules
case-insensitive for free, and the dangling-separator sweep must follow
the param strip.  Non-tracking query params (``?ref=rss``) survive —
they address different content and MUST NOT collapse.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) pairs in application order — Java regex on the
# Spark side; the DuckDB oracle mirrors them with RE2 syntax ("\\1"
# backrefs, explicit 'g' flag) in queries/webcorpus.py.  Both engines
# must stay inside the RE2-supported subset (NO lookarounds), which
# shapes two rules:
#
# - the utm strip anchors on a CAPTURED ?/& separator and puts it back
#   ("$1"), so 'xutm_source=1' (a legitimate param whose name merely
#   contains the substring) and 'a=utm_b' (a value) are untouched;
#   consecutive utm params leave doubled separators ('?&', '&&') that
#   the two collapse rules sweep before the dangling-separator rule;
# - the default-port strip captures the port's FOLLOWER (end, '/', or
#   '?') instead of using a lookahead, so path-less 'https://h:443'
#   collapses with 'https://h' too.
CANON_RULES: list[tuple[str, str]] = [
    (r"#.*$", ""),
    (r"([?&])utm_[a-z0-9_]+=[^&]*", "$1"),
    (r"&&+", "&"),
    (r"\?&", "?"),
    (r"[?&]$", ""),
    (r"^https://([^/:]+):443($|[/?])", "https://$1$2"),
    (r"^http://([^/:]+):80($|[/?])", "http://$1$2"),
    (r"^(https?://)www\.", "$1"),
]


def canonical_url(url: Column | str) -> Column:
    """Canonical form of a raw URL (rules + order in the module doc)."""
    u = F.lower(url if isinstance(url, Column) else F.col(url))
    for pat, rep in CANON_RULES:
        u = F.regexp_replace(u, pat, rep)
    return u


def url_host(url: Column | str) -> Column:
    """Registrable host of an (already canonical) URL — empty string when
    the value is not a URL.  Port and userinfo are not expected after
    canonicalization; the pattern stops at ``/``, ``:`` or ``?`` anyway
    so a raw URL degrades gracefully."""
    u = url if isinstance(url, Column) else F.col(url)
    return F.regexp_extract(u, r"^https?://([^/:?]+)", 1)
