"""Safe parsing of LLM JSON responses (SURVEY.md §2.8 F6-F8).

Reference parity: dag/vacancy_pipline_gpt_rerty.py:251-265 / :560-574 —
strip markdown fences, try json.loads, fall back to a DOTALL regex that
extracts the first ``[ { ... } ]`` block, else return None (caller injects
fallback stubs so output stays total).

Two implementations with identical semantics:

- ``safe_json_parse_text``: plain-Python, used INSIDE the Arrow-batched
  enrichment UDF (the response text never leaves the executor).
- ``parse_llm_json``: Column expression (regexp_replace + from_json +
  explode-ready array) for when responses are a DataFrame column.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FENCE_RE = re.compile(r"^\s*```(?:json)?\s*|\s*```\s*$", re.IGNORECASE)
_ARRAY_RE = re.compile(r"\[\s*\{.*\}\s*\]", re.DOTALL)


def safe_json_parse_text(text: str | None) -> list[dict] | None:
    """Parse an LLM response into a list of dicts, or None if hopeless."""
    if not text:
        return None
    cleaned = _FENCE_RE.sub("", text.strip())
    for candidate in (cleaned,):
        try:
            parsed = json.loads(candidate)
            if isinstance(parsed, list):
                return parsed
        except (json.JSONDecodeError, ValueError):
            pass
    m = _ARRAY_RE.search(cleaned)
    if m:
        try:
            parsed = json.loads(m.group(0))
            if isinstance(parsed, list):
                return parsed
        except (json.JSONDecodeError, ValueError):
            return None
    return None


def parse_llm_json(c: Column | str, schema: T.ArrayType) -> Column:
    """Column-expression variant: fence cleanup (F6), regex array extraction
    (F7, DOTALL via ``(?s)``), from_json (F8). NULL on unparseable input."""
    col = F.col(c) if isinstance(c, str) else c
    cleaned = F.regexp_replace(F.trim(col), r"^\s*```(json)?\s*|\s*```\s*$", "")
    extracted = F.regexp_extract(cleaned, r"(?s)(\[\s*\{.*\}\s*\])", 1)
    candidate = F.when(extracted != "", extracted).otherwise(cleaned)
    return F.from_json(candidate, schema)
