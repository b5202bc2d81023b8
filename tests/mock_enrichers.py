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


class TaskCrashEnricher(Enricher):
    """Fails the whole Spark TASK — not just the respond() call, which
    the retry-residue loop would swallow — on every task's FIRST
    attempt: the ``output_cols`` property is read executor-side in
    ``_process_chunk`` OUTSIDE the try/except, so raising there kills
    the task like a transient executor crash or a speculative-execution
    sibling would. Driver-side reads (TaskContext is None) pass
    through. Drops a marker file per injected failure so the test can
    assert the failure path actually ran."""

    retry_values = frozenset()

    def __init__(self, marker_dir):
        self.marker_dir = marker_dir

    @property
    def output_cols(self):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        if ctx is not None and ctx.attemptNumber() == 0:
            import os
            import uuid

            with open(
                os.path.join(self.marker_dir, f"{uuid.uuid4().hex}.crash"),
                "w",
            ) as f:
                f.write(str(ctx.partitionId()))
            raise RuntimeError("injected task failure (attempt 0)")
        return ("normalized_title",)

    def respond(self, keys, attempt):
        return json.dumps(
            [{"original": k, "normalized_title": f"T:{k}"} for k in keys]
        )
