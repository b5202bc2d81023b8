"""The reference's SQL analytics surface, verbatim.

Source: datalens_dashboard/sql_queries/vacancy_analysis.sql — two queries run
by Datalens over the enriched CSV. Here they run through ``spark.sql`` over a
``normalized_vacancies`` view (the correctness contract's SQL half).

Both queries read 3 of ~10 columns and filter before aggregating — Catalyst
pushes the filter below the aggregate and prunes the scan to the referenced
columns (visible as ReadSchema in .explain), which the reference's CSV
pipeline cannot do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# vacancy_analysis.sql:11-19 — top job titles with count + rounded avg salary
# (verbatim apart from the table name: the reference reads the Datalens
# connection ``processed.normalized_vacancies``, here a temp view).
REF_Q1_TOP_TITLES = """
SELECT
    normalized_title AS vacancy_position,
    COUNT(*) AS vacancy_count,
    ROUND(AVG(salary_to), 0) AS avg_salary_to
FROM normalized_vacancies
WHERE normalized_title != 'Не определена'
GROUP BY normalized_title
ORDER BY vacancy_count DESC
LIMIT 20
"""

# vacancy_analysis.sql:23-31 — category market share via grand-total window;
# carries FOUR output columns incl. ROUND(AVG(salary_to), 0)
# (vacancy_analysis.sql:26).
REF_Q2_MARKET_SHARE = """
SELECT
    category,
    COUNT(*) AS vacancy_count,
    ROUND(AVG(salary_to), 0) AS avg_salary_to,
    ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER(), 1) AS market_share_percent
FROM normalized_vacancies
WHERE category NOT IN ('Не определена', 'Другое', 'Не указано')
GROUP BY category
ORDER BY vacancy_count DESC
"""


def run_reference_queries(
    spark: SparkSession, normalized: DataFrame
) -> tuple[DataFrame, DataFrame]:
    normalized.createOrReplaceTempView("normalized_vacancies")
    return spark.sql(REF_Q1_TOP_TITLES), spark.sql(REF_Q2_MARKET_SHARE)
