"""Registry of (Spark query, DuckDB oracle) pairs.

Every analytic operator the engine claims (SURVEY.md §2) registers here; the
driver contract ``__spark_entry__.queries()/oracle_sql()`` is generated from
this registry.  Column names are aliased identically on both sides — the
driver's comparator sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL over views region..embeddings; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator: register a builder(spark, sf_dir) -> DataFrame."""

    def wrap(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name}")
        REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, tags=tags, doc=doc)
        return fn

    return wrap


def all_queries() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
