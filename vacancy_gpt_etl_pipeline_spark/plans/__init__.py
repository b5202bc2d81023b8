from vacancy_gpt_etl_pipeline_spark.plans.analysis import REF_Q1_TOP_TITLES, REF_Q2_MARKET_SHARE
from vacancy_gpt_etl_pipeline_spark.plans.pipeline import run_pipeline

__all__ = ["REF_Q1_TOP_TITLES", "REF_Q2_MARKET_SHARE", "run_pipeline"]
