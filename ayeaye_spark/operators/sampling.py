"""Deterministic sampling / splitting / budgeting for training-data
pipelines.

The reference has no sampling operators (its user code iterates rows);
these are the corpus-curation primitives a large-scale pipeline needs,
built so the SAME selection is reproducible on any engine and any
cluster size:

* selection is keyed on a **deterministic integer hash bucket** of the
  row id — a linear congruential mix ``(id * 1103515245 + 12345) %
  1000`` — never on ``rand()`` or row position.  Pure 64-bit integer
  arithmetic: portable to the DuckDB oracle verbatim, stable across
  partitionings, and joinable (the same doc lands in the same split in
  every run and every table that shares the id).
* budgets use exact integer token counts and window cumsums — no float
  order dependence.

At 100 TB every operator here is a scan + (for budgeting) one global
sort of a narrow (id, score, tokens) projection; nothing shuffles the
text itself.

Reference parity: sampling is "new capability" per SURVEY §2.5 —
designed Spark-first, no reference counterpart to cite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: LCG constants (glibc's) for the deterministic bucket in [0, 1000).
HASH_A = 1103515245
HASH_B = 12345
HASH_BUCKETS = 1000


def bucket_expr(id_col: str) -> str:
    """SQL text for the selection bucket — identical in Spark and DuckDB
    (64-bit integer multiply/add/modulo; ids up to ~8e9 stay < 2^63)."""
    return f"(({id_col} * {HASH_A} + {HASH_B}) % {HASH_BUCKETS})"


def with_bucket(df: DataFrame, id_col: str, out_col: str = "bucket") -> DataFrame:
    return df.withColumn(out_col, F.expr(bucket_expr(id_col)))


def deterministic_split(
    df: DataFrame,
    id_col: str,
    *,
    splits: list[tuple[str, int]] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by bucket range.

    ``splits`` is [(name, permille), ...] summing to 1000 — default
    900/50/50 train/val/test.  Assignment depends only on the id, so it
    is stable across runs, engines, and repartitioning, and any table
    keyed by the same id inherits the same split via join.
    """
    splits = splits or [("train", 900), ("val", 50), ("test", 50)]
    total = sum(p for _, p in splits)
    if total != HASH_BUCKETS:
        raise ValueError(f"split permilles must sum to {HASH_BUCKETS}, got {total}")
    expr = "CASE"
    acc = 0
    for name, permille in splits[:-1]:
        acc += permille
        expr += f" WHEN {bucket_expr(id_col)} < {acc} THEN '{name}'"
    expr += f" ELSE '{splits[-1][0]}' END"
    return df.withColumn(out_col, F.expr(expr))


def rate_sample(
    df: DataFrame,
    id_col: str,
    *,
    rate_permille: int | None = None,
    rate_by: dict[str, dict[str, int]] | None = None,
    default_permille: int = 1000,
) -> DataFrame:
    """Keep a deterministic fraction of rows — globally, or per group.

    ``rate_permille`` keeps ~N/1000 of all rows.  ``rate_by`` maps a
    column name to {value: permille} for stratified downsampling (e.g.
    rebalance an English-dominant corpus: ``{"lang": {"en": 300}}`` with
    ``default_permille`` for the rest).  Selection is the id bucket, so
    subsamples at different rates are NESTED (rate 300 ⊂ rate 800):
    growing a sample keeps everything already selected.
    """
    if (rate_permille is None) == (rate_by is None):
        raise ValueError("exactly one of rate_permille / rate_by required")
    if rate_permille is not None:
        return df.where(F.expr(f"{bucket_expr(id_col)} < {rate_permille}"))
    (group_col, rates), = rate_by.items()
    case = "CASE " + " ".join(
        f"WHEN {group_col} = '{v}' THEN {p}" for v, p in sorted(rates.items())
    ) + f" ELSE {default_permille} END"
    return df.where(F.expr(f"{bucket_expr(id_col)} < {case}"))


def token_budget_filter(
    df: DataFrame,
    *,
    id_col: str,
    token_col: str,
    score_col: str,
    budget: int,
) -> DataFrame:
    """Keep the best-scoring rows whose cumulative token count fits a
    budget: rows ordered by (score DESC, id ASC), running ``SUM(tokens)``
    ≤ ``budget``.

    The order-by is total (score ties broken by id) and every quantity
    is an integer, so the kept set is exact and engine-independent.  The
    cumsum is one global window over a narrow (id, score, tokens)
    projection — at scale Spark range-partitions the sort; the text
    columns rejoin by id afterwards if needed.
    """
    w = (
        Window.orderBy(F.desc(score_col), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_cum_tokens", F.sum(token_col).over(w))
        .where(F.col("_cum_tokens") <= budget)
        .drop("_cum_tokens")
    )


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Contiguous-fill sequence packing: rows ordered by id, each row
    joins the pack its running token count starts in — ``pack_id =
    (cumsum - tokens) div budget``.

    The deterministic streaming formulation of training-sequence packing
    (docs → fixed-token training rows): exact integer math, one global
    sort of the narrow (id, tokens) projection, no driver loop.  Packs
    may overflow the budget by at most one document (standard greedy
    fill; oversized docs would be pre-split upstream).
    """
    w = (
        Window.orderBy(F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # integer `div`, not `/`: float division of big longs loses exactness
    return df.withColumn("_cum", F.sum(token_col).over(w)).withColumn(
        "pack_id", F.expr(f"(_cum - {token_col}) div {budget}")
    ).drop("_cum")
