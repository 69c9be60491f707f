from delta_lake_validation_spark.sources.acid.errors import (  # noqa: F401
    AcidTableError,
    ConcurrentWriteException,
    TableNotFoundError,
    VersionNotFoundError,
)
from delta_lake_validation_spark.sources.acid.table import AcidTable  # noqa: F401
