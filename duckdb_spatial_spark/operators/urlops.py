"""URL operators for web-corpus pipelines — parse, normalize, and group by
registrable domain. The companion tier to the WARC scan (`sources/warc.py`):
per-domain corpus statistics, domain quotas, and URL-level dedup all start
from these.

All pure column expressions (whole-stage codegen; zero Python workers), and
every regex is RE2-compatible with no backreferences, so each op has an
exact DuckDB-SQL twin (`*_sql`) built from the SAME pattern constants —
the q83 oracle runs the identical chain.

Spark-first notes for 100-TB scale: these are scalar projections — they
pipeline into whatever scan feeds them (no shuffle, no barrier); grouping
by `registrable_domain` afterwards shuffles on a low-cardinality key, which
is the right key for per-domain quotas (hot domains are the skew to watch;
cap with a salted two-level count like the dedup tier when needed).
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "url_scheme", "url_host", "url_path", "url_query", "url_normalize",
    "registrable_domain", "url_scheme_sql", "url_host_sql", "url_path_sql",
    "url_query_sql", "url_normalize_sql", "registrable_domain_sql",
]

# shared pattern constants (Java regex ∩ RE2 — no backrefs, no lookaround)
_P_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_P_HOST = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
_P_PORT = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]+:([0-9]+)"
_P_PATH = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# query must precede the fragment: a '?' after '#' is fragment text
_P_QUERY = r"^[^#]*?\?([^#]*)"
# tracking params dropped by url_normalize (the public utm/click-id set)
_P_TRACK = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid)="

# second-level labels that act as TLD extensions in the public-suffix
# heuristic: host a.b.co.uk → registrable domain b.co.uk
_SLD = ("co", "com", "net", "org", "gov", "ac", "edu")


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _P_SCHEME, 1))


def url_host(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _P_HOST, 1))


def url_path(url: Column) -> Column:
    return F.regexp_extract(url, _P_PATH, 1)


def url_query(url: Column) -> Column:
    return F.regexp_extract(url, _P_QUERY, 1)


def _clean_query(url: Column) -> Column:
    """Query string minus tracking params (order of survivors preserved)."""
    q = url_query(url)
    parts = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(_P_TRACK),
    )
    return F.array_join(parts, "&")


def url_normalize(url: Column) -> Column:
    """Canonical URL: lowercase scheme+host, default ports (80/443) and
    fragments stripped, tracking params removed, empty path → '/'. The
    dedup key for URL-level exact dedup."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = F.regexp_extract(url, _P_PORT, 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    path = url_path(url)
    q = _clean_query(url)
    return F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


def registrable_domain(host: Column) -> Column:
    """Public-suffix heuristic: last 2 labels, or last 3 when the middle
    label is a known second-level extension under a 2-char country TLD
    (b.co.uk style). Heuristic by design (the full PSL is a data file, not
    an algorithm); exact for the common cases and deterministic."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    take3 = (
        (n >= 3)
        & F.element_at(parts, -2).isin(*_SLD)
        & (F.length(F.element_at(parts, -1)) == 2)
    )
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(".", F.element_at(parts, -3), F.element_at(parts, -2),
                        F.element_at(parts, -1))
    return F.when(n <= 2, host).otherwise(
        F.when(take3, last3).otherwise(last2))


# --- DuckDB-SQL twins (same constants, same order) -------------------------

def _q(pat: str) -> str:
    return pat.replace("'", "''")


def url_scheme_sql(e: str) -> str:
    return f"lower(regexp_extract({e}, '{_q(_P_SCHEME)}', 1))"


def url_host_sql(e: str) -> str:
    return f"lower(regexp_extract({e}, '{_q(_P_HOST)}', 1))"


def url_path_sql(e: str) -> str:
    return f"regexp_extract({e}, '{_q(_P_PATH)}', 1)"


def url_query_sql(e: str) -> str:
    return f"regexp_extract({e}, '{_q(_P_QUERY)}', 1)"


def _clean_query_sql(e: str) -> str:
    q = url_query_sql(e)
    return (
        f"array_to_string(list_filter(string_split({q}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{_q(_P_TRACK)}')), '&')"
    )


def url_normalize_sql(e: str) -> str:
    sch = url_scheme_sql(e)
    host = url_host_sql(e)
    port = f"regexp_extract({e}, '{_q(_P_PORT)}', 1)"
    path = url_path_sql(e)
    q = _clean_query_sql(e)
    keep = (f"({port} <> '' AND NOT ({sch} = 'http' AND {port} = '80') "
            f"AND NOT ({sch} = 'https' AND {port} = '443'))")
    return (
        f"{sch} || '://' || {host} || "
        f"(CASE WHEN {keep} THEN ':' || {port} ELSE '' END) || "
        f"(CASE WHEN {path} = '' THEN '/' ELSE {path} END) || "
        f"(CASE WHEN {q} <> '' THEN '?' || {q} ELSE '' END)"
    )


def registrable_domain_sql(host: str) -> str:
    parts = f"string_split({host}, '.')"
    slds = ", ".join(f"'{s}'" for s in _SLD)
    return (
        f"(CASE WHEN len({parts}) <= 2 THEN {host} "
        f"WHEN len({parts}) >= 3 AND {parts}[-2] IN ({slds}) "
        f"AND length({parts}[-1]) = 2 "
        f"THEN {parts}[-3] || '.' || {parts}[-2] || '.' || {parts}[-1] "
        f"ELSE {parts}[-2] || '.' || {parts}[-1] END)"
    )
