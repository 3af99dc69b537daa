"""Relative-URL resolution as a pure Spark column expression (r4) —
the missing half of the outlink feed: a crawl frontier needs ABSOLUTE
urls, and real pages link relatively. RFC 3986 §5 resolution re-expressed
as JVM column functions (zero Python in the hot path):

- absolute href          → itself
- protocol-relative //h  → base scheme + href
- root-relative /p       → base origin + path (dot-segments removed)
- relative p, ./p, ../p  → merged with the base path's directory,
  dot-segments removed (§5.2.4, as a fold over path segments)
- query-only ?q / fragment-only #f → base path with query replaced /
  fragment dropped (fragments never survive — crawl semantics)

Scope (documented, differentially tested): hierarchical http(s) bases.
The ground truth is stdlib ``urllib.parse.urljoin`` — the differential
test sweeps a (base × href) grammar plus seeded-random cases and
requires byte-equality (minus fragments) on every supported shape.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _strip_fragment(c: Column) -> Column:
    return F.regexp_replace(c, "#.*$", "")


def _origin(base: Column) -> Column:
    """scheme://host[:port] of the base url."""
    return F.regexp_extract(base, r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)", 1)


def _scheme(base: Column) -> Column:
    return F.regexp_extract(base, r"^([a-zA-Z][a-zA-Z0-9+.\-]*):", 1)


def _base_dir(base: Column) -> Column:
    """The base path up to and including the last '/' (RFC 3986 §5.3
    merge rule); '/' when the base has no path."""
    path = F.regexp_extract(base, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    d = F.regexp_extract(path, r"^(.*/)", 1)
    return F.when(d == "", F.lit("/")).otherwise(d)


def _remove_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 as a fold over '/'-split segments: '.' drops,
    '..' pops (never past root), others append. Trailing '/' preserved
    for '.'/'..' finals (urljoin semantics)."""
    # strip the leading '/' before splitting — it would otherwise
    # contribute an empty first segment and a doubled slash; interior
    # empty segments ('a//b') are real segments and survive the fold
    segs = F.split(F.regexp_replace(path, "^/", ""), "/")
    folded = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: (
            F.when(s == ".", acc)
            .when(s == "..",
                  F.slice(acc, F.lit(1),
                          F.greatest(F.size(acc) - 1, F.lit(0))))
            .otherwise(F.concat(acc, F.array(s)))),
    )
    joined = F.concat(F.lit("/"), F.array_join(folded, "/"))
    # a path ending in '/.' or '/..' resolves to a directory — keep the
    # trailing slash the fold dropped
    dir_final = path.rlike(r"(^|/)\.\.?$")
    return F.when(
        dir_final & ~joined.endswith("/"), F.concat(joined, F.lit("/"))
    ).otherwise(joined)


def resolve_href(base: Column, href: Column) -> Column:
    """Absolute form of ``href`` against ``base`` (both string columns);
    fragments never survive. NULL-safe: NULL href resolves to NULL."""
    h = _strip_fragment(href)
    b = _strip_fragment(base)
    origin = _origin(b)
    merged = F.concat(_base_dir(b), h)
    return (
        # absolute (any scheme)
        F.when(h.rlike(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:"), h)
        # protocol-relative
        .when(h.startswith("//"), F.concat(_scheme(b), F.lit(":"), h))
        # root-relative
        .when(h.startswith("/"),
              F.concat(origin, _remove_dot_segments(
                  F.regexp_replace(h, r"\?.*$", "")),
                  F.regexp_extract(h, r"(\?.*)$", 1)))
        # query-only: replace the base query, keep the base path
        .when(h.startswith("?"),
              F.concat(origin, F.regexp_extract(
                  b, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)", 1), h))
        # empty href → base sans fragment
        .when(h == "", b)
        # relative path: merge with base directory, strip dot segments
        .otherwise(
            F.concat(origin, _remove_dot_segments(
                F.regexp_replace(merged, r"\?.*$", "")),
                F.regexp_extract(merged, r"(\?.*)$", 1)))
    )
