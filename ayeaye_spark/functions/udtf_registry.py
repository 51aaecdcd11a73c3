"""Python UDTF registry — the engine's table-function extensibility
surface.

The reference's user-extension points are ``transform_map`` (per-field
callables, csv_connector.py:59-62) and ``method_overlay``
(connectors/base.py:110-151); both are scalar, driver-adjacent hooks.
Spark adds a row→rows axis: Python UDTFs (``pyspark.sql.functions.udtf``),
registered here so models can call them from SQL.

PERFORMANCE CONTRACT: UDTF ``eval`` runs row-at-a-time in Python
workers — the SLOW PATH, for logic that genuinely cannot be expressed
with built-in generators (``explode``/``posexplode``/``inline``/
``stack``) or Arrow-batched ``mapInPandas``.  These registrations use
``useArrow=True`` so at least the JVM↔Python transfer is Arrow-batched
(Spark 4 arrow-optimized UDTFs), but the per-row Python dispatch
remains.  Every UDTF registered here has a built-in "twin" expression
documented (and tested equivalent); hot paths should use the twin.
The UDTFs exist so user extensions have a first-class,
SQL-addressable registration point — not for the engine's own
operators.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="word: string, pos: int", useArrow=True)
class SplitTokens:
    """``split_tokens(text)`` → one row per whitespace token with its
    position (Python ``str.split`` semantics: leading/trailing/empty
    input yields no empty tokens).  Built-in twin (use in hot paths) —
    note the ``trim`` and the empty-string guard, without which regex
    split emits '' tokens for padded or empty input and the positions
    shift:

        SELECT pos, word
        FROM ..., LATERAL posexplode(split(trim(text), '\\\\s+')) AS s(pos, word)
        WHERE word != ''
    """

    def eval(self, text: str):  # noqa: D102 - contract in class docstring
        for i, w in enumerate((text or "").split()):
            yield w, i


@udtf(returnType="key: string, value: string", useArrow=True)
class JsonKv:
    """``json_kv(doc)`` → one row per top-level key of a JSON object,
    value rendered as a string.  Built-in twin for fixed schemas:

        SELECT explode(from_json(doc, 'map<string,string>'))

    The UDTF form handles heterogeneous value types (numbers, nested
    objects) without a declared schema — the genuinely-dynamic case
    built-ins can't express.
    """

    def eval(self, doc: str):
        if not doc:
            return
        try:
            obj = json.loads(doc)
        except (ValueError, TypeError):
            return
        if not isinstance(obj, dict):
            return
        for k, v in obj.items():
            yield k, v if isinstance(v, str) else json.dumps(v)


_UDTFS = {
    "split_tokens": SplitTokens,
    "json_kv": JsonKv,
}


def register_udtfs(spark: SparkSession, **extra) -> list[str]:
    """Register the built-in UDTFs (plus any ``name=udtf_class`` extras)
    on *spark*; returns the registered names.  Idempotent — re-registering
    replaces."""
    table = {**_UDTFS, **extra}
    for name, cls in table.items():
        spark.udtf.register(name, cls)
    return sorted(table)
