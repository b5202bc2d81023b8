"""Adversarial mock enrichers that cross the driver→executor pickle boundary.

Kept in a standalone module (shipped to executors via ``addPyFile`` in
conftest) because classes defined inside a pytest module can't be unpickled
by Spark workers.
"""

from __future__ import annotations

import json

from vacancy_gpt_etl_pipeline_spark.operators.enrichment import Enricher


class FlakyEnricher(Enricher):
    """Fenced output; drops every key containing '3' on attempt 0 (resolved
    on retry). Deterministic & state-free → safe on executors."""

    output_cols = ("normalized_title",)
    retry_values = frozenset()

    def respond(self, keys, attempt):
        resolved = [k for k in keys if attempt > 0 or "3" not in k]
        body = json.dumps(
            [{"original": k, "normalized_title": f"T:{k}"} for k in resolved],
            ensure_ascii=False,
        )
        return f"```json\n{body}\n```"


class CallCountingEnricher(Enricher):
    """Drops a marker file per respond() call so the driver can count how
    many LLM calls actually happened across executors."""

    output_cols = ("normalized_title",)
    retry_values = frozenset()

    def __init__(self, marker_dir):
        self.marker_dir = marker_dir

    def respond(self, keys, attempt):
        import os
        import uuid

        with open(os.path.join(self.marker_dir, f"{uuid.uuid4().hex}.call"), "w") as f:
            f.write(str(len(keys)))
        return json.dumps(
            [{"original": k, "normalized_title": f"T:{k}"} for k in keys]
        )


class BatchSizeEcho(Enricher):
    """Labels each key with the size of the batch it arrived in."""

    output_cols = ("normalized_title",)
    retry_values = frozenset()

    def respond(self, keys, attempt):
        return json.dumps(
            [{"original": k, "normalized_title": str(len(keys))} for k in keys]
        )
