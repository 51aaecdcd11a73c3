"""Catalog ⇄ DuckDB oracle parity (the driver's t2 gate, replicated).

Runs at sf0.001 by default for speed; set AYEAYE_TEST_SF_DIR to
/root/testdata/sf0.01 to replicate the driver's exact scale."""

import pytest

from ayeaye_spark.catalog import ORACLES, QUERIES

from .conftest import SF_ORACLE
from .oracle_harness import compare, duck_connection


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF_ORACLE)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_match(name, spark, duck):
    if name not in ORACLES:
        # approximate-by-design queries get the driver's weaker rows-only check
        assert QUERIES[name](spark, SF_ORACLE).count() >= 0
        return
    ok, msg = compare(name, spark, duck, SF_ORACLE)
    assert ok, f"{name}: {msg}"
