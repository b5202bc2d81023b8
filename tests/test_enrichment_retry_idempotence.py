"""Exactly-once-per-key under Spark TASK retries (r9 verdict item 6).

The §2.10 contract claims the enrichment mapping is total and
duplicate-free even when tasks fail and re-run (speculative execution,
executor loss). The guarantee is: enricher CALLS are at-least-once
(a failed attempt may already have called the LLM), but the OUTPUT
mapping is exactly-once per key — Spark discards a failed attempt's
output wholesale, `_process_chunk` is a pure function of its input
batch, and the keep-first dedup + final left join make the surviving
attempt's mapping total and duplicate-free.

Task retries need `spark.task.maxFailures > 1`, which is fixed at
SparkContext creation (`local[4,2]` = 4 slots, 2 attempts), so the
scenario runs in a SUBPROCESS with its own session rather than the
shared conftest session.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = textwrap.dedent(
    """
    import glob
    import sys

    from pyspark.sql import SparkSession

    from tests.mock_enrichers import TaskCrashEnricher
    from vacancy_gpt_etl_pipeline_spark.operators.enrichment import (
        enrich_column,
    )

    marker_dir = sys.argv[1]
    spark = (
        SparkSession.builder.master("local[4,2]")  # 4 slots, 2 attempts
        .appName("retry-idempotence")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    keys = [f"title {i}" for i in range(40)]
    rows = [(k,) for k in keys for _ in (0, 1)]  # every key twice
    df = spark.createDataFrame(rows, "title string")

    out = enrich_column(
        df,
        "title",
        TaskCrashEnricher(marker_dir),
        batch_size=10,
        max_retries=0,
    ).collect()

    crashes = glob.glob(f"{marker_dir}/*.crash")
    assert crashes, "failure injection never ran - test proves nothing"

    # totality: every input row survives the join-back
    assert len(out) == len(rows), (len(out), len(rows))
    # exactly-once per key: each key maps to exactly ONE enriched value,
    # and it is the successful attempt's value (never a default stub)
    seen = {}
    for r in out:
        seen.setdefault(r.title, set()).add(r.normalized_title)
    assert set(seen) == set(keys)
    for k, vals in seen.items():
        assert vals == {f"T:{k}"}, (k, vals)
    print(f"OK crashes={len(crashes)} rows={len(out)}")
    """
)


def test_enrichment_exactly_once_under_task_retries(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT, str(tmp_path)],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "OK crashes=" in proc.stdout, proc.stdout
