from delta_lake_validation_spark.sources.acid.errors import (  # noqa: F401
    AcidTableError,
    ConcurrentWriteException,
    ConstraintViolationError,
    TableNotFoundError,
    VersionNotFoundError,
)
from delta_lake_validation_spark.sources.acid.table import AcidTable  # noqa: F401
from delta_lake_validation_spark.sources.acid.sqlshim import (  # noqa: F401
    AcidSqlContext,
    AcidSqlError,
)
