"""Web-pipeline column functions: URL canonicalization.

A Common-Crawl-scale corpus keyed by ``url`` needs a canonical form
before any URL-level dedup or join — the same page arrives as
``HTTP://WWW.Example.com:80/a/?b=2&utm_source=feed`` and
``http://example.com/a?b=2``. ``normalize_url`` is a PURE COLUMN
EXPRESSION (JVM regex + array HOFs, whole-stage codegen — no UDF), so
it pushes through the scan and costs one map pass at any scale.

Normalization rules (the usual crawl-dedup set):
- scheme and host lowercased; path/query case preserved
  (paths are case-sensitive);
- leading ``www.`` stripped from the host;
- default ports dropped (``:80`` for http, ``:443`` for https);
  non-default ports kept;
- trailing slashes stripped from the path; empty path -> ``/``;
- tracking params removed (``utm_*``, ``fbclid``, ``gclid``, ``ref``),
  remaining query params SORTED (param order is not identity), empty
  query dropped;
- fragment dropped (never sent to the server).

Anything that does not look like ``scheme://...`` is passed through
trimmed-but-unchanged (garbage in a crawl should not be silently
rewritten into a colliding key).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"
# params that never distinguish content
_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|ref)="


def normalize_url(url: Column | str) -> Column:
    """Canonical URL as a single column expression (see module doc)."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.regexp_extract(u, _HOSTPORT_RE, 1)
    host = F.regexp_replace(
        F.lower(F.regexp_replace(hostport, r":[0-9]+$", "")),
        r"^www\.",
        "",
    )
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == "80"))
        & ~((scheme == F.lit("https")) & (port == "443"))
    )
    port_part = F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(
        F.lit("")
    )
    raw_path = F.regexp_replace(
        F.regexp_extract(u, _PATH_RE, 1), r"/+$", ""
    )
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    params = F.array_sort(
        F.filter(
            F.split(F.regexp_extract(u, _QUERY_RE, 1), "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    qs = F.array_join(params, "&")
    q_part = F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs))
    normalized = F.concat(
        scheme, F.lit("://"), host, port_part, path, q_part
    )
    return F.when(scheme == "", u).otherwise(normalized)


# The DuckDB twin of normalize_url, parameterized by the input
# expression — kept HERE so the Spark rules and the oracle rules sit
# side by side and must drift together. list_filter/list_sort mirror
# the array HOFs; anchored regexes make single-replace semantics
# (DuckDB replaces first match; every pattern is anchored).
def normalize_url_sql(expr: str) -> str:
    return f"""
    CASE WHEN regexp_extract(trim({expr}), '{_SCHEME_RE}', 1) = ''
         THEN trim({expr})
         ELSE
      lower(regexp_extract(trim({expr}), '{_SCHEME_RE}', 1)) || '://' ||
      regexp_replace(
        lower(regexp_replace(
          regexp_extract(trim({expr}), '{_HOSTPORT_RE}', 1),
          ':[0-9]+$', '')),
        '^www\\.', '') ||
      CASE WHEN regexp_extract(
                  regexp_extract(trim({expr}), '{_HOSTPORT_RE}', 1),
                  ':([0-9]+)$', 1) = '' THEN ''
           WHEN lower(regexp_extract(trim({expr}), '{_SCHEME_RE}', 1))
                  = 'http'
                AND regexp_extract(
                      regexp_extract(trim({expr}), '{_HOSTPORT_RE}', 1),
                      ':([0-9]+)$', 1) = '80' THEN ''
           WHEN lower(regexp_extract(trim({expr}), '{_SCHEME_RE}', 1))
                  = 'https'
                AND regexp_extract(
                      regexp_extract(trim({expr}), '{_HOSTPORT_RE}', 1),
                      ':([0-9]+)$', 1) = '443' THEN ''
           ELSE ':' || regexp_extract(
                  regexp_extract(trim({expr}), '{_HOSTPORT_RE}', 1),
                  ':([0-9]+)$', 1)
      END ||
      CASE WHEN regexp_replace(
                  regexp_extract(trim({expr}), '{_PATH_RE}', 1),
                  '/+$', '') = '' THEN '/'
           ELSE regexp_replace(
                  regexp_extract(trim({expr}), '{_PATH_RE}', 1),
                  '/+$', '')
      END ||
      CASE WHEN coalesce(array_to_string(list_sort(list_filter(
                  string_split(
                    regexp_extract(trim({expr}), '\\?([^#]*)', 1), '&'),
                  p -> p <> ''
                       AND NOT regexp_matches(p, '{_TRACKING_RE}'))),
                  '&'), '') = '' THEN ''
           ELSE '?' || array_to_string(list_sort(list_filter(
                  string_split(
                    regexp_extract(trim({expr}), '\\?([^#]*)', 1), '&'),
                  p -> p <> ''
                       AND NOT regexp_matches(p, '{_TRACKING_RE}'))),
                  '&')
      END
    END
    """
    # NB: array_to_string over an EMPTY filtered list is NULL in
    # DuckDB (not ''), hence the coalesce in the CASE test.
