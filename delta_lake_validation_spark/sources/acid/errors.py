"""Exception taxonomy for the ACID table layer.

Mirrors Delta's optimistic-concurrency surface that the reference's
concurrency tests expect (expected exception classes documented at
src/validation_suite.py:886-890): a writer whose snapshot went stale loses
the race and gets ConcurrentWriteException.
"""


class AcidTableError(Exception):
    pass


class TableNotFoundError(AcidTableError):
    pass


class VersionNotFoundError(AcidTableError):
    pass


class ConcurrentWriteException(AcidTableError):
    """Another transaction committed after this one's snapshot was taken and
    the operations cannot both win (e.g. blind overwrite vs anything)."""

class ConstraintViolationError(AcidTableError):
    """A write produced rows that violate an active CHECK constraint, or
    ADD CONSTRAINT found existing rows violating the new constraint."""
