from delta_lake_validation_spark.functions.aggregates import (  # noqa: F401
    dsum,
    davg,
    sql_davg,
    sql_dsum,
)
