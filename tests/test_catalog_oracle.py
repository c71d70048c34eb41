"""The correctness gate, locally: run every cataloged query on Spark
and its oracle on DuckDB at sf0.001 (fast) and compare exactly the way
the driver does. A second marker-gated pass runs sf0.01 (the driver's
actual correctness SF)."""

from __future__ import annotations

import os

import pytest

from picoprobedataflow_spark.plans import catalog

from .conftest import SF_DIR, SF_DIR_ORACLE, assert_matches_oracle, make_duck

SPECS = catalog.specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, duck, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_DIR)
    assert df is not None
    if spec.oracle is None:
        # rows-only check, like the driver's weaker gate
        assert df.count() >= 0
        return
    assert_matches_oracle(df, duck, spec.oracle)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle_sf001(spark, name):
    if os.environ.get("SPARK_GRAFT_SLOW") != "1":
        pytest.skip("set SPARK_GRAFT_SLOW=1 for the sf0.01 pass")
    spec = SPECS[name]
    df = spec.fn(spark, SF_DIR_ORACLE)
    if spec.oracle is None:
        assert df.count() >= 0
        return
    con = make_duck(SF_DIR_ORACLE)
    assert_matches_oracle(df, con, spec.oracle)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) == len(SPECS)
