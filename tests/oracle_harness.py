"""Local replica of the driver's correctness gate.

Runs each catalog query on Spark AND its DuckDB oracle on the same
parquet tables, then compares row count + column names + values
(columns sorted by name, rows sorted, exact equality — stricter than a
hash, so anything passing here hash-matches)."""

from __future__ import annotations

import datetime
import math
from typing import Any

import duckdb

from ayeaye_spark.catalog import ORACLES, QUERIES, TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def compare(name: str, spark, con, sf_dir: str) -> tuple[bool, str]:
    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = [
        tuple(_canon(row[c]) for c in spark_cols) for row in sdf.collect()
    ]
    rel = con.sql(ORACLES[name])
    duck_cols_raw = list(rel.columns)
    order = sorted(range(len(duck_cols_raw)), key=lambda i: duck_cols_raw[i])
    duck_cols = [duck_cols_raw[i] for i in order]
    duck_rows = [tuple(_canon(r[i]) for i in order) for r in rel.fetchall()]

    if spark_cols != duck_cols:
        return False, f"columns differ: spark={spark_cols} duck={duck_cols}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
    s, d = sorted(spark_rows), sorted(duck_rows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:3]
        return False, f"values differ; first diffs: {diffs}"
    return True, f"{len(spark_rows)} rows"
