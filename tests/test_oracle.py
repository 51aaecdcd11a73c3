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


def test_no_hugeint_oracle_columns(duck):
    """Guard the whole catalog against the HUGEINT class: DuckDB widens
    SUM(<int>) and integer `//` to int128 where Spark stays bigint, and
    the driver's value hash is dtype-sensitive.  Planning each oracle
    (``rel.types`` — no execution) must show no int128-family column;
    the fix at any red site is CAST(... AS BIGINT) in the oracle text."""
    from .oracle_harness import type_class

    offenders = {}
    for name, sql in sorted(ORACLES.items()):
        rel = duck.sql(sql)
        bad = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if type_class(str(t)) == "hugeint"
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"uncast int128 oracle columns: {offenders}"
