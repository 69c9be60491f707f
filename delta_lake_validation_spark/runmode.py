"""Interleaved-operation run modes (ref TestRunMode, src/validation_suite.py:67-76).

The reference's validation scenarios can run in three modes so that an
*external* operation (another writer, a crunch job, a vacuum from a different
engine) can be interleaved between a scenario's setup and its validation:

    setup_only          — build the scenario state, persist, exit
    validation_only     — re-attach to previously persisted state, validate
    setup_and_validate  — both phases in one run (the default)

``Scenario`` re-expresses that contract over the engine's ACID tables.  The
phases communicate only through durable state (the table location itself), so
a ``validation_only`` run may happen in a different process / session — the
same property the reference relies on for its interleaved Delta-op tests
(e.g. test_9's vacuum flow, src/validation_suite.py:796-809).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import SparkSession


class TestRunMode(enum.Enum):
    __test__ = False  # named for reference parity; not a pytest class

    setup_only = enum.auto()
    validation_only = enum.auto()
    setup_and_validate = enum.auto()


@dataclass
class ScenarioConfig:
    """Everything a phase needs; mirrors the reference's TestConfig shape
    (spark + table location + mode)."""

    spark: SparkSession
    location: str
    exec_mode: TestRunMode = TestRunMode.setup_and_validate
    params: dict[str, Any] = field(default_factory=dict)


class Scenario:
    """Subclass and override ``setup`` / ``validate``; both receive the
    config and must communicate only via durable state at ``config.location``.

    ``run`` executes the phases the mode selects and returns ``validate``'s
    result (or None for setup_only), exactly like the reference's per-test
    ``exec_mode`` dispatch."""

    name = "scenario"

    def setup(self, config: ScenarioConfig) -> None:  # pragma: no cover
        raise NotImplementedError

    def validate(self, config: ScenarioConfig) -> Any:  # pragma: no cover
        raise NotImplementedError

    def run(self, config: ScenarioConfig) -> Any:
        mode = config.exec_mode
        if mode in (TestRunMode.setup_only, TestRunMode.setup_and_validate):
            self.setup(config)
        if mode is TestRunMode.setup_only:
            return None
        return self.validate(config)


def run_interleaved(
    scenario: Scenario,
    config: ScenarioConfig,
    external_op: Callable[[ScenarioConfig], None],
) -> Any:
    """Drive the reference's two-step pattern explicitly: setup_only, then an
    external operation against the durable state, then validation_only."""
    scenario.run(
        ScenarioConfig(config.spark, config.location, TestRunMode.setup_only,
                       config.params)
    )
    external_op(config)
    return scenario.run(
        ScenarioConfig(config.spark, config.location, TestRunMode.validation_only,
                       config.params)
    )
