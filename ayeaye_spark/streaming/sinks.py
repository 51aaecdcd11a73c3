"""Exactly-once streaming sinks via ``foreachBatch``.

Structured Streaming guarantees at-least-once delivery to ``foreachBatch``
after failures: a micro-batch may be REPLAYED with the same ``batch_id``.
Exactly-once therefore means *idempotent per batch_id* — the canonical
pattern for sinks without transactional support (parquet directories,
JDBC upserts keyed by batch, …).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from ..core.checkpoint import ckpt_eager


# ---------------------------------------------------------------------------
# Filesystem helper.  ALL sink-state filesystem operations (replay-skip
# probes, version listing, retention deletes) go through the Hadoop FS
# API so the state directory can live on any scheme a cluster uses —
# ``file://``, ``hdfs://``, ``s3a://`` — not just the driver-local
# filesystem ``os.path`` sees.  Same pattern as
# ``operators.maintenance._fs_and_path`` / ``merge_upsert_sink``.
# ---------------------------------------------------------------------------


def _join(base: str, name: str) -> str:
    """URI-style child path (Hadoop paths are ``/``-separated on every
    scheme; never ``os.path.join``, which is OS-dependent)."""
    return base.rstrip("/") + "/" + name


def _state_exists(spark: SparkSession, path: str) -> bool:
    """Does ``path`` exist on its scheme's filesystem?"""
    from ..operators.maintenance import _fs_and_path

    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.exists(hpath))


def _is_committed(spark: SparkSession, dir_path: str) -> bool:
    """Committed = the writer finished (``_SUCCESS`` marker present)."""
    return _state_exists(spark, _join(dir_path, "_SUCCESS"))


def _list_committed_versions(spark: SparkSession, state_dir: str) -> list[int]:
    """Sorted committed ``v=N`` snapshot numbers under ``state_dir``
    (empty if the directory doesn't exist yet).  Uncommitted dirs —
    no ``_SUCCESS`` — are excluded: they belong to an in-flight
    writer."""
    from ..operators.maintenance import _fs_and_path

    fs, hpath = _fs_and_path(spark, state_dir)
    if not fs.exists(hpath):
        return []
    versions = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v="):
            try:
                n = int(name[2:])
            except ValueError:
                continue
            if fs.exists(
                spark._jvm.org.apache.hadoop.fs.Path(
                    st.getPath(), "_SUCCESS"
                )
            ):
                versions.append(n)
    return sorted(versions)


def _delete_recursive(spark: SparkSession, path: str) -> None:
    """Best-effort recursive delete on ``path``'s scheme."""
    from ..operators.maintenance import _fs_and_path

    fs, hpath = _fs_and_path(spark, path)
    if fs.exists(hpath):
        fs.delete(hpath, True)


def idempotent_parquet_sink(out_dir: str) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function writing each micro-batch to
    ``out_dir/batch_id=N`` exactly once: a replayed batch_id is detected
    via the directory's ``_SUCCESS`` marker (probed through the Hadoop
    FS API, so ``out_dir`` may be ``s3a://``/``hdfs://``) and skipped.

    >>> q = (stream.writeStream.foreachBatch(idempotent_parquet_sink(path))
    ...      .option("checkpointLocation", ckpt).start())
    """

    def write_batch(df: DataFrame, batch_id: int) -> None:
        target = _join(out_dir, f"batch_id={batch_id}")
        if _is_committed(df.sparkSession, target):
            return  # replay of a committed batch — exactly-once by skip
        df.write.mode("overwrite").parquet(target)

    return write_batch


def read_all_batches(spark: SparkSession, out_dir: str) -> DataFrame:
    """Union of every committed batch directory (hive-partitioned on
    batch_id, so readers can also filter/prune by it)."""
    return spark.read.option("basePath", out_dir).parquet(f"{out_dir}/batch_id=*")


def merge_upsert_sink(
    target_path: str,
    *,
    key: str,
    order_col: str | None = None,
    tiebreak_cols: list[str] | None = None,
    versioned: bool = False,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` CDC-apply: MERGE each micro-batch of updates
    into a parquet target (SCD1 semantics, ``scd.merge_upsert``) —
    the streaming upsert a change-data-capture pipeline applies to its
    serving table, without a transactional table format.

    Semantics per key:

    * **with ``order_col``** — the LARGEST ``order_col`` wins across
      target ∪ batch (ties broken by ``tiebreak_cols`` ASC; pass them
      whenever ``order_col`` can tie, or the survivor is
      partition-dependent).  Out-of-order and late-arriving updates are
      therefore safe: an older change can never clobber a newer row the
      target already holds, regardless of which micro-batch carried it.
    * **without ``order_col``** — plain replace semantics
      (``scd.merge_upsert``): the batch's row (deduped) replaces the
      target's.  Only correct when the source is strictly ordered.

    The merged table writes to a staging sibling, then
    ``maintenance.replace_dir``'s guarded rename swap — or, with
    ``versioned=True``, each batch publishes a NEW ``v=N`` snapshot via
    ``maintenance.versioned_publish`` (pointer-file commit: atomic on
    object stores, and concurrent readers keep a stable snapshot while
    batches land; read the table with ``maintenance.read_published``).

    Replay safety: Structured Streaming may re-deliver a batch_id after
    a failure.  Re-merging the same updates is a no-op by construction
    (max-order pick / same-key replace see identical rows), so the sink
    is idempotent without tracking batch ids.  First batch installs
    the target.
    """
    from ..operators.maintenance import (
        read_published, replace_dir, versioned_publish,
    )
    from ..operators.scd import merge_upsert

    def _read_target(spark):
        if versioned:
            try:
                return read_published(spark, target_path)
            except FileNotFoundError:
                return None
        probe = spark._jvm.org.apache.hadoop.fs.Path(target_path)
        fs = probe.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(probe):
            return None
        return spark.read.parquet(target_path)

    def apply_batch(df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        spark = df.sparkSession
        target = _read_target(spark)
        if order_col is not None:
            base = df
            if target is not None:
                base = target.select(*df.columns).unionByName(df)
            ordering = [F.desc(order_col)]
            ordering += [F.asc(c) for c in (tiebreak_cols or [])]
            w = Window.partitionBy(key).orderBy(*ordering)
            merged = (
                base.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            merged = df.dropDuplicates([key])
            if target is not None:
                merged = merge_upsert(
                    target.select(*df.columns), merged, key=key
                )
        if versioned:
            versioned_publish(spark, target_path, merged)
        else:
            staging = target_path.rstrip("/") + "._merge_staging"
            merged.write.mode("overwrite").parquet(staging)
            replace_dir(spark, target_path, staging)

    return apply_batch


def hll_state_sink(
    state_dir: str,
    *,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
    keep_versions: int = 2,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` incremental distinct-count maintenance with
    MERGEABLE HLL sketches (Spark's Datasketches ``hll_sketch_agg`` /
    ``hll_union_agg``): each micro-batch folds into a per-group sketch
    state table WITHOUT ever rescanning history — the 100 TB shape for
    "distinct users per key, forever" over a stream (exact distinct
    needs unbounded per-key value state; the sketch is ~2^lg_k bytes
    per group, period).

    State layout: ``state_dir/v={batch_id}`` parquet snapshots of
    ``(group_cols…, sketch binary)`` with a ``_SUCCESS`` marker.
    Exactly-once by construction: a REPLAYED batch_id finds its own
    committed snapshot and skips (union-ing the same batch twice would
    NOT be idempotent — HLL union is, but only against the same
    elements, and a replay after new batches would double-fold);
    readers take the max committed version.

    Read back with :func:`read_hll_state` (estimates) or union further
    with ``hll_union_agg`` across states/ranges — sketches compose
    across any slicing, which is the whole point."""

    def apply_batch(df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        spark = df.sparkSession
        target = _join(state_dir, f"v={batch_id}")
        if _is_committed(spark, target):
            return  # replayed batch: its fold is already committed
        batch_sketches = df.groupBy(*group_cols).agg(
            F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
        )
        prev = _latest_versioned_state(spark, state_dir, before=batch_id)
        if prev is not None:
            merged = (
                prev.select(*group_cols, "sketch")
                .unionByName(batch_sketches)
                .groupBy(*group_cols)
                .agg(F.hll_union_agg("sketch", F.lit(True)).alias("sketch"))
            )
        else:
            merged = batch_sketches
        merged.write.mode("overwrite").parquet(target)
        _prune_state_versions(spark, state_dir, keep=keep_versions)

    return apply_batch


def _prune_state_versions(
    spark: SparkSession, state_dir: str, *, keep: int
) -> None:
    """Drop all but the newest ``keep`` committed ``v=N`` snapshots.

    Retention keeps the state directory bounded (one snapshot lands per
    micro-batch).  ``keep >= 2`` is the safe floor: Structured
    Streaming only ever replays the most recent planned-but-uncommitted
    batch, whose skip-check needs ITS OWN snapshot, and the fold reads
    the one before it.  Uncommitted (no ``_SUCCESS``) dirs are left
    alone — they belong to an in-flight writer."""
    committed = _list_committed_versions(spark, state_dir)
    for n in committed[:-keep] if keep > 0 else []:
        _delete_recursive(spark, _join(state_dir, f"v={n}"))


def _latest_versioned_state(
    spark: SparkSession, state_dir: str, *, before: int | None = None
):
    """Most recent committed ``v=N`` snapshot (N < before if given)."""
    versions = [
        n
        for n in _list_committed_versions(spark, state_dir)
        if before is None or n < before
    ]
    if not versions:
        return None
    return spark.read.parquet(_join(state_dir, f"v={max(versions)}"))


def read_hll_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Latest committed sketch state → ``(group_cols…, distinct_est)``
    (long estimates; the sketches stay queryable/composable in the
    state table itself)."""
    from pyspark.sql import functions as F

    state = _latest_versioned_state(spark, state_dir)
    if state is None:
        raise FileNotFoundError(f"no committed HLL state under {state_dir}")
    return state.withColumn(
        "distinct_est", F.hll_sketch_estimate("sketch").cast("long")
    ).drop("sketch")


def minhash_dedup_sink(
    state_dir: str,
    *,
    id_col: str,
    text_col: str,
    keep_versions: int = 2,
    **lsh_kwargs,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` incremental NEAR-DUP dedup of a document stream
    against all history: each micro-batch's survivors — documents that
    near-duplicate neither an already-accepted document nor a
    smaller-id document in the same batch — fold into a versioned
    survivor-state table (``operators.dedup.minhash_dedup_incremental``
    does the banding; existing-vs-existing candidate pairs are pruned
    before the exact-Jaccard verification, so steady-state cost scales
    with the BATCH, not the corpus).

    This is streaming corpus ingest with dedup-on-arrival: the 100 TB
    crawl pipeline shape where re-deduplicating the whole corpus per
    batch is impossible.  State stores the narrow ``(id, text)``
    survivor projection — the signature-only state table is the
    production-size optimization and drops in here without changing
    the protocol.  Incremental semantics (documented, inherent):
    acceptance depends on arrival order — a document that near-dups
    only a REJECTED earlier document is accepted, where a global batch
    dedup over the union might drop it.

    Exactly-once like :func:`hll_state_sink`: state snapshots are
    ``state_dir/v={batch_id}``; a replayed batch_id finds its
    committed snapshot and skips.  Read survivors back with
    :func:`read_dedup_state`."""
    from ..operators.dedup import minhash_dedup_incremental

    def apply_batch(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        target = _join(state_dir, f"v={batch_id}")
        if _is_committed(spark, target):
            return  # replayed batch: already folded
        # detach the narrow (id, text) projection from the micro-batch
        # plan: downstream LSH joins/aggregates then plan as a regular
        # batch query (AQE partition coalescing + runtime join picks),
        # which the streaming incremental planner disables
        batch = (
            df.select(id_col, text_col)
            .transform(ckpt_eager)
            .dropDuplicates([id_col])
        )
        prev = _latest_versioned_state(spark, state_dir, before=batch_id)
        existing = prev if prev is not None else batch.limit(0)
        survivors = minhash_dedup_incremental(
            existing, batch, id_col, text_col, **dict(lsh_kwargs)
        ).select(id_col, text_col)
        existing.unionByName(survivors).write.mode("overwrite").parquet(target)
        _prune_state_versions(spark, state_dir, keep=keep_versions)

    return apply_batch


def read_dedup_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Latest committed survivor state of :func:`minhash_dedup_sink`."""
    state = _latest_versioned_state(spark, state_dir)
    if state is None:
        raise FileNotFoundError(f"no committed dedup state under {state_dir}")
    return state


def theta_state_sink(
    state_dir: str,
    *,
    group_cols: list[str],
    value_col: str,
    keep_versions: int = 2,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` incremental THETA sketch-state maintenance —
    :func:`hll_state_sink`'s sibling for when the stored states must
    support SET ALGEBRA, not just cardinality: theta sketches of
    per-group member sets union incrementally like HLL, but any two
    stored states can later be INTERSECTED or DIFFERENCED
    (``theta_intersection``/``theta_difference``) — month-over-month
    retention, audience overlap across keys, "active in A but never
    B" — without ever rescanning the stream.

    Same exactly-once protocol as the HLL sink (versioned ``v=N``
    snapshots; replayed batch ids skip their committed fold).  Use
    :func:`read_theta_state` for estimates, or operate on the stored
    ``sketch`` bytes directly for the set algebra."""

    def apply_batch(df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        spark = df.sparkSession
        target = _join(state_dir, f"v={batch_id}")
        if _is_committed(spark, target):
            return
        batch_sketches = df.groupBy(*group_cols).agg(
            F.expr(f"theta_sketch_agg({value_col})").alias("sketch")
        )
        prev = _latest_versioned_state(spark, state_dir, before=batch_id)
        if prev is not None:
            merged = (
                prev.select(*group_cols, "sketch")
                .unionByName(batch_sketches)
                .groupBy(*group_cols)
                .agg(F.expr("theta_union_agg(sketch)").alias("sketch"))
            )
        else:
            merged = batch_sketches
        merged.write.mode("overwrite").parquet(target)
        _prune_state_versions(spark, state_dir, keep=keep_versions)

    return apply_batch


def read_theta_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Latest committed theta state → ``(group_cols…, distinct_est)``;
    the ``sketch`` column stays available for set algebra."""
    from pyspark.sql import functions as F

    state = _latest_versioned_state(spark, state_dir)
    if state is None:
        raise FileNotFoundError(f"no committed theta state under {state_dir}")
    return state.withColumn(
        "distinct_est", F.expr("theta_sketch_estimate(sketch)").cast("long")
    )


def url_dedup_sink(
    state_dir: str,
    *,
    id_col: str,
    url_col: str,
    keep_versions: int = 2,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` incremental CANONICAL-URL dedup of a crawl
    stream: each micro-batch's survivors — pages whose canonical URL
    (``portable.canonical_url``: tracking params, default ports,
    fragments, case variants collapsed) matches neither an
    already-accepted page nor a smaller-id page in the same batch —
    fold into a versioned ``(canonical_url, id)`` state table.  The
    cheapest dedup-on-arrival stage of a streaming crawl ingest,
    upstream of the content-level :func:`minhash_dedup_sink`; per
    batch one anti-join against the state (URL-keyed, uniform) + one
    min-id aggregate over the batch, so steady-state cost scales with
    the BATCH while state is one narrow row per accepted page.

    Exactly-once like the other versioned sinks: snapshots at
    ``state_dir/v={batch_id}``, replayed batch ids find their
    committed snapshot and skip, retention prunes to
    ``keep_versions``.  Read back with :func:`read_url_dedup_state`."""
    from ..functions import portable as P

    def apply_batch(df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        spark = df.sparkSession
        target = _join(state_dir, f"v={batch_id}")
        if _is_committed(spark, target):
            return  # replayed batch: already folded
        batch = (
            df.where(F.col(url_col).isNotNull())
            .select(
                F.expr(P.canonical_url(url_col, P.SPARK)).alias(
                    "canonical_url"
                ),
                F.col(id_col).alias("id"),
            )
            .groupBy("canonical_url")
            .agg(F.min("id").alias("id"))
        )
        prev = _latest_versioned_state(spark, state_dir, before=batch_id)
        if prev is not None:
            fresh = batch.join(
                prev.select("canonical_url"), "canonical_url", "left_anti"
            )
            merged = prev.unionByName(fresh)
        else:
            merged = batch
        merged.write.mode("overwrite").parquet(target)
        _prune_state_versions(spark, state_dir, keep=keep_versions)

    return apply_batch


def read_url_dedup_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Latest committed ``(canonical_url, id)`` survivor state of
    :func:`url_dedup_sink`."""
    state = _latest_versioned_state(spark, state_dir)
    if state is None:
        raise FileNotFoundError(
            f"no committed url-dedup state under {state_dir}"
        )
    return state
