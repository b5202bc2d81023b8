"""HTML -> text extraction, entirely in whole-stage codegen.

The reference pipeline consumes already-clean CSV text
(``dag/vacancy_pipline_gpt_rerty.py:109-117``); the raw form of web
training data is HTML, and the first curation stage of every published
web-corpus pipeline (CCNet, RefinedWeb, Dolma) is markup removal.  This
module implements it as a chain of JVM ``regexp_replace`` / ``replace``
expressions — no Python in the hot path, so extraction runs at scan
speed inside WholeStageCodegen and survives a 100 TB crawl.

Both engines evaluate the SAME chain: :func:`strip_html_text` builds
the Spark Column and :func:`strip_html_sql` renders the identical
DuckDB expression from the SAME pattern tables, so operator and oracle
cannot drift (the mojibake-repair precedent, functions/text.py:348).

Patterns are RE2-compatible by construction (non-greedy + inline flags
only, no lookaround) so the DuckDB mirror is exact; Java regex and RE2
agree on every construct used here.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["strip_html_text", "strip_html_sql", "HTML_LINK_PATTERN"]

# Removal order matters and is shared verbatim by both engines:
# script/style blocks go first (their bodies may contain '<' and '>'
# that are NOT tag delimiters), then comments, then remaining tags.
_HTML_STRIP_PATTERNS: tuple[tuple[str, str], ...] = (
    ("(?is)<script[^>]*>.*?</script>", " "),
    ("(?is)<style[^>]*>.*?</style>", " "),
    ("(?s)<!--.*?-->", " "),
    ("(?s)<[^>]*>", " "),
)

# Literal entity decode AFTER tag removal, '&amp;' last — single-pass
# decode semantics: '&amp;lt;' becomes '&lt;' (text), never '<'.
_HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)

# href extraction for link counting/outlink graphs; group 1 is the URL
HTML_LINK_PATTERN = '<a\\s[^>]*href="([^"]*)"'


def strip_html_text(c: Column | str) -> Column:
    """Markup-stripped, entity-decoded, whitespace-collapsed text of an
    HTML column.  Every step is a codegen string expression."""
    col = F.col(c) if isinstance(c, str) else c
    for pat, rep in _HTML_STRIP_PATTERNS:
        col = F.regexp_replace(col, pat, rep)
    for ent, ch in _HTML_ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(col, "\\s+", " "))


def strip_html_sql(expr: str) -> str:
    """The identical chain as a DuckDB SQL expression over ``expr``,
    rendered from the same tables (drift-proof oracle)."""
    out = expr
    for pat, rep in _HTML_STRIP_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    for ent, ch in _HTML_ENTITIES:
        cch = ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{cch}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"
