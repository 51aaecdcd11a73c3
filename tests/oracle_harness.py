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


def type_class(type_str: str) -> str:
    """Collapse a Spark dtype string or DuckDB type string to a dialect-
    neutral class, so the gate catches the driver's dtype-sensitive hash
    failures (e.g. DuckDB HUGEINT for SUM(<int>) vs Spark bigint) before
    the driver does.  HUGEINT deliberately maps to its OWN class: Spark
    never emits int128, so any oracle column landing there is a missing
    CAST(... AS BIGINT) in the oracle text."""
    t = type_str.strip().upper()
    if t in ("HUGEINT", "UHUGEINT", "INT128", "UINT128"):
        return "hugeint"
    if t.startswith("DECIMAL") or t.startswith("NUMERIC"):
        return "decimal"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "INT", "BIGINT", "LONG",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t in ("BOOLEAN", "BOOL"):
        return "bool"
    if t in ("VARCHAR", "STRING", "TEXT"):
        return "string"
    if t in ("BLOB", "BINARY", "BYTEA"):
        return "binary"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.startswith(("ARRAY", "LIST")) or t.endswith("[]"):
        return "array"
    if t.startswith("STRUCT"):
        return "struct"
    if t.startswith("MAP"):
        return "map"
    return t.lower()


def compare(name: str, spark, con, sf_dir: str) -> tuple[bool, str]:
    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_types = dict(sdf.dtypes)
    spark_rows = [
        tuple(_canon(row[c]) for c in spark_cols) for row in sdf.collect()
    ]
    rel = con.sql(ORACLES[name])
    duck_cols_raw = list(rel.columns)
    duck_types_raw = [str(t) for t in rel.types]
    order = sorted(range(len(duck_cols_raw)), key=lambda i: duck_cols_raw[i])
    duck_cols = [duck_cols_raw[i] for i in order]
    duck_rows = [tuple(_canon(r[i]) for i in order) for r in rel.fetchall()]

    if spark_cols != duck_cols:
        return False, f"columns differ: spark={spark_cols} duck={duck_cols}"
    # dtype-class check (replicates the driver's type-sensitive value
    # hash, which Python == comparison is blind to: 5 == 5.0)
    for i, c in zip(order, duck_cols):
        sc, dc = type_class(spark_types[c]), type_class(duck_types_raw[i])
        if sc != dc:
            return False, (
                f"dtype class differs on {c!r}: spark={spark_types[c]} ({sc}) "
                f"duck={duck_types_raw[i]} ({dc})"
            )
    if len(spark_rows) != len(duck_rows):
        return False, f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"

    # null-safe total order: NULL sorts before any value, and never
    # reaches a Python None-vs-int comparison (tuple sort only compares
    # same-position values, which share a column type otherwise)
    def _key(row):
        return tuple((x is not None, x) for x in row)

    s, d = sorted(spark_rows, key=_key), sorted(duck_rows, key=_key)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:3]
        return False, f"values differ; first diffs: {diffs}"
    return True, f"{len(spark_rows)} rows"
