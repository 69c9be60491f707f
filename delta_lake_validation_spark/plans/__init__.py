"""Query plans: the engine's analytic query inventory (SURVEY.md §2.2-2.7)
plus north-star LLM-pipeline queries, each paired with DuckDB oracle SQL
where SQL-expressible."""

from delta_lake_validation_spark.plans.registry import (  # noqa: F401
    QuerySpec,
    REGISTRY,
    register,
    all_queries,
    all_oracles,
)

# importing these modules populates REGISTRY
from delta_lake_validation_spark.plans import relational  # noqa: E402,F401
from delta_lake_validation_spark.plans import relational2  # noqa: E402,F401
from delta_lake_validation_spark.plans import timeseries  # noqa: E402,F401
from delta_lake_validation_spark.plans import llm  # noqa: E402,F401
