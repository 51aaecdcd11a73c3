"""Slowly-changing-dimension (SCD2) merge emulation.

Without a transactional table format (Delta/Iceberg jars absent), MERGE
INTO is emulated the classic way: anti-join + union + window close-out.
Batch semantics: every update row opens a new version at its timestamp;
the previously-open version (from the current table or an earlier update
in the same batch) closes at that timestamp.  Multiple updates per key in
one batch chain correctly via a single ``lead()`` window — no iterative
merging.

Plan shape: one shuffle on the key (window) + one union; scales linearly
with |current| + |updates|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    *,
    key: str,
    ts_col: str,
    attr_cols: list[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Return the new SCD2 table.

    ``current`` columns: key, attrs, valid_from, valid_to (null = open).
    ``updates`` columns: key, attrs, ts_col.
    """
    select_cols = [key, *attr_cols, valid_from, valid_to]

    updated_keys = updates.select(key).distinct()

    # rows for untouched keys pass through; closed history always passes
    untouched = current.join(updated_keys, on=key, how="left_anti").select(*select_cols)
    closed_history = current.join(updated_keys, on=key, how="inner").where(
        F.col(valid_to).isNotNull()
    ).select(*select_cols)

    # open rows of updated keys + the update stream form the version chain
    open_versions = (
        current.join(updated_keys, on=key, how="inner")
        .where(F.col(valid_to).isNull())
        .select(key, *attr_cols, F.col(valid_from).alias("_vf"))
    )
    new_versions = updates.select(
        key, *attr_cols, F.col(ts_col).alias("_vf")
    )
    chain = open_versions.unionByName(new_versions)
    w = Window.partitionBy(key).orderBy(F.col("_vf").asc())
    return (
        chain.withColumn("_vt", F.lead("_vf").over(w))
        .select(
            key,
            *attr_cols,
            F.col("_vf").alias(valid_from),
            F.col("_vt").alias(valid_to),
        )
        .unionByName(untouched)
        .unionByName(closed_history)
    )


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    *,
    key: str,
    validate: bool = False,
) -> DataFrame:
    """SCD1 / MERGE INTO emulation (no version history): rows from
    ``updates`` replace same-key rows in ``target``; unmatched update
    rows insert.  ``WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED
    THEN INSERT *`` without a transactional table format.

    ``updates`` must be unique per key (dedupe upstream — a MERGE with
    duplicate source keys is non-deterministic in every engine and
    rejected by Delta/Iceberg too).  With ``validate=True`` the contract
    is ENFORCED: duplicate update keys raise instead of silently
    emitting duplicate output rows.  The check is one extra aggregate
    pass over the (small) update side — pay it wherever the source
    isn't already guaranteed deduped.

    Plan shape: one anti-join shuffle on the key + a union — linear in
    |target| + |updates|, the update side typically far smaller and
    broadcast by AQE.  At 100 TB the target is read once and rewritten
    partition-parallel; nothing collects (``validate`` collects a
    bounded sample of offending keys, not the data).
    """
    cols = target.columns
    if updates.columns != cols:
        raise ValueError(
            f"updates columns {updates.columns} must match target {cols}"
        )
    if validate:
        dupes = (
            updates.groupBy(key)
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > 1)
        )
        sample = dupes.take(5)
        if sample:
            shown = ", ".join(str(r[key]) for r in sample)
            raise ValueError(
                f"merge_upsert: duplicate update keys (e.g. {shown}) — a "
                "MERGE with duplicate source keys is non-deterministic; "
                "dedupe the update side first"
            )
    untouched = target.join(updates.select(key), on=key, how="left_anti")
    return untouched.select(*cols).unionByName(updates.select(*cols))
