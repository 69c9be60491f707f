"""Sources & sinks: parquet IO (tables.py) and the ``acid`` transaction-log
table format — the engine's re-expression of the reference's Delta Lake
surface (SURVEY.md §2.1, §2.8) without any external table-format dependency."""
