"""Arrow IPC (Feather v2) shard sink/source (``arrow://``).

The zero-copy columnar interchange format: an Arrow IPC file round-trips
schemas exactly (nested lists, unsigned ints, dictionary encoding) and
memory-maps for free, which makes it the standard hand-off between a
Spark curation pipeline and single-node Python/Rust tooling (pandas,
polars, duckdb, torch dataloaders all read it natively).

Spark has no built-in IPC source, but this engine already speaks Arrow
everywhere (Pandas UDFs are Arrow under the hood), so the mapping is
thin and stays columnar end to end:

* :func:`write_arrow_shards` — the same deterministic sharding contract
  as the WebDataset sink (``pmod(xxhash64(key), n_shards)`` membership,
  key-sorted rows, one shard = one task) with the payload written as an
  Arrow IPC file per shard.
* :class:`ArrowIpcDataSource` (``spark.read.format("ayeaye_arrow")``) —
  one input partition per shard file; the reader yields the file's own
  ``RecordBatch``es straight into Spark's Arrow pipeline (no per-row
  Python, no pandas detour).  Schema is inferred ON THE DRIVER from the
  first file's IPC footer (names only — no data read).

Scale contract mirrors ``webdataset.py``: one shard's columns
materialize per task; each shard is written to executor-local scratch
then published via :func:`executor_fs.publish_file` (``shutil.move``
for scheme-less shared-mount paths, JVM-side
``FileSystem.copyFromLocalFile`` for ``file://``/``hdfs://``/``s3a://``
destinations), with scheme-aware ``fs.globStatus`` overwrite cleanup.
The pyds reader and ``infer_ipc_schema`` are scheme-aware too:
scheme-less paths glob/mmap locally, URI-scheme'd paths list via
``fs.globStatus`` and fetch each shard whole to executor-local scratch
JVM-side (``executor_fs.fetch_to_local``) before the memory-map — the
object-store read route, with disk absorbing one shard per task.

Reference parity: beyond-reference addition in the spirit of the file
connectors (`lib/ayeaye/connectors/parquet_connector.py` is the
columnar-file precedent).
"""

from __future__ import annotations

import os
from typing import Any

import pandas as pd
import pyarrow as pa
import pyarrow.ipc as ipc
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import AccessMode, ConnectorError, DataConnector, spark_path
from .executor_fs import (
    has_scheme,
    publish_file,
    session_hadoop_overrides,
    uri_join,
    warn_if_worker_reuse_disabled,
)

MANIFEST_SCHEMA = (
    "shard_id BIGINT, path STRING, n_rows BIGINT, n_bytes BIGINT"
)


def write_arrow_shards(
    df: DataFrame,
    out_dir: str,
    *,
    key_col: str,
    n_shards: int = 16,
) -> DataFrame:
    """Export ``df`` as ``shard-NNNNNN.arrow`` IPC files; returns the
    manifest (one row per shard).  Shard membership is a pure function
    of the key and rows are key-sorted, so the same input produces the
    same shards under any upstream partitioning.  The manifest is the
    ACTION — nothing is written until it is collected/saved."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    if has_scheme(out_dir):
        warn_if_worker_reuse_disabled(df.sparkSession)
    # driver-side capture: spark.hadoop.* must reach the worker gateway
    # JVM through the task closure (it builds a fresh Configuration)
    hadoop_conf = (
        session_hadoop_overrides(df.sparkSession)
        if has_scheme(out_dir) else {}
    )
    cols = df.columns
    if key_col not in cols:
        raise ValueError(f"key column {key_col!r} not in {cols}")
    # pin the Arrow schema from the Spark schema: per-shard inference
    # would type a whole-shard-null column as pa.null() and make that
    # shard's footer disagree with every other shard's
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(df.schema)
    narrow = df.withColumn(
        "_shard", F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_shards))
    )

    def _write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        shard_id = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values(key_col, kind="mergesort").drop(columns=["_shard"])
        # emit to executor-local scratch, publish() moves/uploads after
        import tempfile

        name = f"shard-{shard_id:06d}.arrow"
        path = uri_join(out_dir, name)
        fd, scratch = tempfile.mkstemp(suffix=name, prefix="ayeaye-arrow-")
        os.close(fd)
        table = pa.Table.from_pandas(
            pdf, schema=arrow_schema, preserve_index=False
        )
        with pa.OSFile(scratch, "wb") as f:
            with ipc.new_file(f, table.schema) as writer:
                writer.write_table(table)
        n_bytes = os.path.getsize(scratch)
        publish_file(scratch, path, hadoop_conf=hadoop_conf)
        return pd.DataFrame(
            [
                {
                    "shard_id": shard_id,
                    "path": path,
                    "n_rows": len(pdf),
                    "n_bytes": n_bytes,
                }
            ]
        )

    return narrow.groupBy("_shard").applyInPandas(_write_group, MANIFEST_SCHEMA)


def infer_ipc_schema(path_glob: str):
    """Spark StructType from the FIRST matching shard's IPC footer
    (driver-side, metadata only).  Scheme-aware: scheme-less paths
    glob locally; any URI scheme lists via ``fs.globStatus`` and
    fetches the first shard to scratch for its footer."""
    from pyspark.sql.pandas.types import from_arrow_schema

    from .executor_fs import fetch_to_local, glob_paths

    files = glob_paths(path_glob)
    if not files:
        raise FileNotFoundError(f"no Arrow IPC files match {path_glob}")
    local, is_temp = fetch_to_local(files[0])
    try:
        with pa.memory_map(local, "r") as source:
            schema = ipc.open_file(source).schema
    finally:
        if is_temp:
            os.remove(local)
    return from_arrow_schema(schema)


def read_arrow_shards(spark: SparkSession, path_glob: str) -> DataFrame:
    """All matching IPC shards as one DataFrame via the ``ayeaye_arrow``
    Python DataSource (one input partition per file, RecordBatches fed
    straight to Spark's Arrow pipeline)."""
    from .pyds import register_python_datasources

    register_python_datasources(spark)
    return (
        spark.read.format("ayeaye_arrow").option("path", path_glob).load()
    )


class ArrowIpcConnector(DataConnector):
    """``arrow://`` — directory (or glob) of Arrow IPC shard files.

    Read: ``arrow:///data/x`` or ``arrow:///data/x/shard-*.arrow``.
    Write: ``arrow:///data/x;shards=32;key=doc_id``.  The shard
    manifest from the last write is kept on ``self.last_manifest``."""

    engine_types = ["arrow"]

    def __init__(self, engine_url: str, access: AccessMode = AccessMode.READ, **kwargs: Any):
        super().__init__(engine_url, access, **kwargs)
        self.last_manifest: list | None = None

    def _glob(self) -> str:
        path = spark_path(self.url)
        if not any(ch in path for ch in "*?[") and not path.endswith(".arrow"):
            path = uri_join(path, "shard-*.arrow")
        return path

    def read(self, spark: SparkSession) -> DataFrame:
        self._require_read()
        return read_arrow_shards(spark, self._glob())

    def write(self, df: DataFrame, mode: str = "overwrite") -> None:
        self._require_write()
        key = self.url.option("key")
        if not key:
            raise ConnectorError("arrow write requires ;key=<col> in the url")
        out_dir = spark_path(self.url)
        # clear stale shard files first (same contract as the wds sink):
        # a rewrite with fewer shards otherwise leaves old shard-NNNNNN
        # files the read glob mixes in
        from .webdataset import prepare_shard_dir

        if not prepare_shard_dir(out_dir, "shard-*.arrow", mode):
            return  # mode=ignore with existing shards
        manifest = write_arrow_shards(
            df,
            out_dir,
            key_col=key,
            n_shards=self.url.int_option("shards", 16),
        )
        self.last_manifest = manifest.collect()
