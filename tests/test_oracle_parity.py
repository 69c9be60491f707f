"""t2-style correctness: every registry query vs its DuckDB oracle at sf0.001.

This is the same comparison the driver runs at sf0.01 (tools/selfcheck.py runs
it at arbitrary sf); keeping it in the pytest suite means a regression in any
operator fails fast.
"""

from __future__ import annotations

import pytest

from delta_lake_validation_spark.plans import REGISTRY
from delta_lake_validation_spark.testing import compare_frames

from .conftest import SF_DIR


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, oracle):
    spec = REGISTRY[name]
    sdf = spec.builder(spark, SF_DIR).toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0  # rows-only contract: must run and be well-formed
        return
    odf = oracle.execute(spec.oracle).df()
    assert compare_frames(sdf, odf) == "OK"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 25
