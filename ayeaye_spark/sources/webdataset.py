"""WebDataset-style tar shard sink/source (``wds://``).

The interchange format LLM training stacks stream from: a corpus is a
directory of ``shard-NNNNNN.tar`` files, each sample a group of members
named ``{key}.{suffix}`` (``000123.txt``, ``000123.json``,
``000123.jpg`` …), samples contiguous within a shard.  Readers stream
shards sequentially — no random access, no footer — which is what makes
the format work from object storage at training time.

This module maps the format onto Spark with stdlib ``tarfile`` only:

* :func:`write_tar_shards` — distributed sharded export.  Shard
  assignment is ``pmod(xxhash64(key), n_shards)`` — a pure function of
  the key, so shard *membership* is independent of upstream
  partitioning; members are sorted by key within a shard and all tar
  metadata is pinned (mtime/uid/gid/mode), so each shard's bytes are
  fully deterministic (two runs of the same input produce identical
  files — diffable, cache-friendly, content-addressable).
* :func:`read_tar_shards` — ``binaryFile`` scan → ``mapInPandas``
  member extraction, one row per tar member.
* :func:`members_to_samples` — long→wide pivot back to one row per
  sample key.

Scale contract: ONE SHARD = ONE TASK = ONE IN-MEMORY GROUP on write
(``applyInPandas``), one whole file on read (``binaryFile`` materializes
each shard as a single binary value).  Size shards accordingly — the
WebDataset convention of 100 MB–1 GB per shard is exactly the executor-
friendly range; pick ``n_shards ≈ corpus_bytes / 500 MB``.

Output placement (round 11): each shard is written to EXECUTOR-LOCAL
scratch, then published by :func:`executor_fs.publish_file` — a
``shutil.move`` for scheme-less (shared/fuse-mounted) ``out_dir``, or a
JVM-side ``FileSystem.copyFromLocalFile`` for any URI scheme
(``file://``, ``hdfs://``, ``s3a://``…), so the LLM-corpus export path
works on pure object-store clusters.  Stale-shard overwrite cleanup is
scheme-aware too (``fs.globStatus`` via the driver's Hadoop FS).

Reference parity: the reference has no tar/WebDataset connector — this
is a beyond-reference addition in the spirit of its file connectors
(``lib/ayeaye/connectors/uncooked_connector.py`` treats files as opaque
bytes; here the bytes are structured samples).
"""

from __future__ import annotations

import gzip
import io
import json
import os
import tarfile
from typing import Any, Iterator

import pandas as pd
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
    "shard_id BIGINT, path STRING, n_keys BIGINT, n_members BIGINT, n_bytes BIGINT"
)

MEMBER_SCHEMA = "shard_path STRING, key STRING, suffix STRING, content BINARY"

# USTAR caps member names at 100 bytes; names are "{key}.{suffix}".
_USTAR_NAME_MAX = 100


def prepare_shard_dir(out_dir: str, pattern: str, mode: str) -> bool:
    """Save-mode contract for shard-directory sinks, returning whether
    the write should proceed.  Shard ids are a pure function of the key
    hash, so a rewrite emits files only for shard ids present in the
    NEW data — without cleanup, stale ``shard-NNNNNN`` files from a
    previous larger write survive and the glob-based readers silently
    mix them back in.

    * ``overwrite`` — delete existing files matching ``pattern`` first.
    * ``error``/``errorifexists`` — raise if any match exists.
    * ``ignore`` — skip the write (return False) if any match exists.
    * ``append`` — rejected: same-id shard files would be clobbered,
      not appended (reshard the union instead).

    Scheme-aware: a scheme-less ``out_dir`` is listed/cleaned with the
    local glob; any URI scheme routes through the driver session's
    Hadoop FS (``fs.globStatus`` / ``fs.delete``), so overwrite works
    on ``s3a://``/``hdfs://`` shard directories too.
    """
    if has_scheme(out_dir):
        return _prepare_shard_dir_hadoop(out_dir, pattern, mode)
    from glob import glob as _glob

    existing = sorted(_glob(os.path.join(out_dir, pattern)))
    if mode == "overwrite":
        for p in existing:
            os.remove(p)
        return True
    if mode in ("error", "errorifexists"):
        if existing:
            raise ConnectorError(
                f"shard dir {out_dir} already has {len(existing)} files "
                f"matching {pattern} (mode={mode})"
            )
        return True
    if mode == "ignore":
        return not existing
    if mode == "append":
        raise ConnectorError(
            "append is not supported for shard sinks: shard ids are "
            "key-hash-determined, so a second write would overwrite "
            "same-id shard files, not append — reshard the union instead"
        )
    raise ConnectorError(f"unknown save mode {mode!r}")


def _prepare_shard_dir_hadoop(out_dir: str, pattern: str, mode: str) -> bool:
    """Driver-side scheme'd variant of :func:`prepare_shard_dir` —
    ``fs.globStatus`` listing + ``fs.delete`` cleanup via the active
    session's Hadoop FS."""
    from ..operators.maintenance import _fs_and_path

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise ConnectorError(
            f"shard dir {out_dir} has a URI scheme but no active "
            "SparkSession exists to reach its filesystem"
        )
    fs, _ = _fs_and_path(spark, out_dir)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    statuses = fs.globStatus(jvm_path(uri_join(out_dir, pattern)))
    existing = [st.getPath() for st in statuses] if statuses is not None else []
    if mode == "overwrite":
        for p in existing:
            fs.delete(p, False)
        return True
    if mode in ("error", "errorifexists"):
        if existing:
            raise ConnectorError(
                f"shard dir {out_dir} already has {len(existing)} files "
                f"matching {pattern} (mode={mode})"
            )
        return True
    if mode == "ignore":
        return not existing
    if mode == "append":
        raise ConnectorError(
            "append is not supported for shard sinks: shard ids are "
            "key-hash-determined, so a second write would overwrite "
            "same-id shard files, not append — reshard the union instead"
        )
    raise ConnectorError(f"unknown save mode {mode!r}")


def _to_bytes(value: Any) -> bytes:
    """Member payload encoding: str→utf-8, bytes pass through, anything
    else canonical JSON (sorted keys → deterministic bytes)."""
    if value is None:
        return b""
    if isinstance(value, bytes):
        return value
    if isinstance(value, bytearray):
        return bytes(value)
    if isinstance(value, str):
        return value.encode("utf-8")
    return json.dumps(value, sort_keys=True, default=str).encode("utf-8")


def write_tar_shards(
    df: DataFrame,
    out_dir: str,
    *,
    key_col: str,
    member_cols: dict[str, str],
    n_shards: int = 16,
    compress: bool = False,
    fixed_mtime: int = 0,
) -> DataFrame:
    """Export ``df`` as WebDataset tar shards; returns the manifest
    (``shard_id, path, n_keys, n_members, n_bytes``), one row per shard
    written.  The manifest is the ACTION — nothing is written until it
    is collected/saved.

    ``member_cols`` maps member suffix → source column, e.g.
    ``{"txt": "text", "json": "meta"}`` writes ``{key}.txt`` and
    ``{key}.json`` per row.  Keys must be unique (duplicate keys would
    silently interleave samples; the writer raises).  ``compress=True``
    writes ``.tar.gz`` with a zeroed gzip mtime so compressed shards
    stay byte-deterministic too.
    """
    if not member_cols:
        raise ValueError("member_cols must be non-empty")
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
    suffixes = dict(member_cols)  # capture for the closure
    ext = ".tar.gz" if compress else ".tar"
    # USTAR caps member names ("{key}.{suffix}") at 100 bytes; tarfile
    # would otherwise raise mid-shard and fail the whole write task with
    # an opaque error
    key_budget = _USTAR_NAME_MAX - 1 - max(
        len(s.encode("utf-8")) for s in suffixes
    )

    narrow = df.select(
        F.col(key_col).cast("string").alias("_key"),
        *[F.col(c).alias(f"_m_{s}") for s, c in suffixes.items()],
    ).withColumn("_shard", F.pmod(F.xxhash64(F.col("_key")), F.lit(n_shards)))

    def _write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        shard_id = int(pdf["_shard"].iloc[0])
        if pdf["_key"].duplicated().any():
            dup = pdf["_key"][pdf["_key"].duplicated()].iloc[0]
            raise ValueError(
                f"write_tar_shards: duplicate key {dup!r} in shard {shard_id}"
            )
        key_bytes = pdf["_key"].str.encode("utf-8").str.len()
        if (key_bytes > key_budget).any():
            bad = pdf["_key"][key_bytes > key_budget].iloc[0]
            raise ValueError(
                f"write_tar_shards: key {bad!r} is {len(bad.encode('utf-8'))} "
                f"bytes; USTAR member names cap at {_USTAR_NAME_MAX} bytes, "
                f"leaving {key_budget} for the key with these suffixes — "
                f"shorten the key (e.g. hash it)"
            )
        pdf = pdf.sort_values("_key", kind="mergesort")
        # emit to executor-local scratch, publish() moves/uploads after
        import tempfile

        name = f"shard-{shard_id:06d}{ext}"
        path = uri_join(out_dir, name)
        fd, scratch = tempfile.mkstemp(suffix=name, prefix="ayeaye-wds-")
        os.close(fd)
        n_members = 0
        n_bytes = 0
        with open(scratch, "wb") as raw:
            if compress:
                # gzip.GzipFile(mtime=0): tarfile's own "w:gz" stamps
                # wall-clock time into the gzip header, breaking
                # byte-determinism
                stream = gzip.GzipFile(
                    filename="", mode="wb", fileobj=raw, mtime=fixed_mtime
                )
            else:
                stream = raw
            member_series = [pdf[f"_m_{s}"].tolist() for s in suffixes]
            with tarfile.open(fileobj=stream, mode="w", format=tarfile.USTAR_FORMAT) as tar:
                # itertuples mangles leading-underscore names; zip instead
                for i, key in enumerate(pdf["_key"].tolist()):
                    for s, series in zip(suffixes, member_series):
                        payload = _to_bytes(series[i])
                        info = tarfile.TarInfo(name=f"{key}.{s}")
                        info.size = len(payload)
                        info.mtime = fixed_mtime
                        info.uid = info.gid = 0
                        info.uname = info.gname = ""
                        info.mode = 0o644
                        tar.addfile(info, io.BytesIO(payload))
                        n_members += 1
                        n_bytes += len(payload)
            if compress:
                stream.close()
        publish_file(scratch, path, hadoop_conf=hadoop_conf)
        return pd.DataFrame(
            [
                {
                    "shard_id": shard_id,
                    "path": path,
                    "n_keys": len(pdf),
                    "n_members": n_members,
                    "n_bytes": n_bytes,
                }
            ]
        )

    return narrow.groupBy("_shard").applyInPandas(_write_group, MANIFEST_SCHEMA)


def read_tar_shards(spark: SparkSession, path: str) -> DataFrame:
    """Tar shards → one row per member:
    ``(shard_path, key, suffix, content)``.  ``path`` may be a glob
    (``.../shard-*.tar``); ``.tar.gz`` is auto-detected (``r:*``).

    ``binaryFile`` gives (path, whole-file bytes) per shard — each
    shard is one scan row, decoded executor-side in an Arrow batch
    pass; no driver involvement.  Member order inside a tar is
    preserved (WebDataset samples are contiguous).

    Memory contract: one whole shard materializes per row (Spark's
    2 GB single-value ceiling).  For 1 GB+ shards use the streaming
    Python DataSource instead — ``spark.read.format("ayeaye_wds")``
    (``sources/pyds.py:WdsDataSource``) holds one MEMBER at a time."""
    files = spark.read.format("binaryFile").load(path)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict[str, Any]] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(content), mode="r:*") as tar:
                    for info in tar:
                        if not info.isfile():
                            continue
                        name = info.name
                        key, dot, suffix = name.rpartition(".")
                        if not dot:
                            key, suffix = name, ""
                        member = tar.extractfile(info)
                        out.append(
                            {
                                "shard_path": fpath,
                                "key": key,
                                "suffix": suffix,
                                "content": member.read() if member else b"",
                            }
                        )
            yield pd.DataFrame(
                out, columns=["shard_path", "key", "suffix", "content"]
            )

    return files.select("path", "content").mapInPandas(_extract, MEMBER_SCHEMA)


def members_to_samples(members: DataFrame, suffixes: list[str]) -> DataFrame:
    """Long member rows → one row per sample key with a binary column
    per suffix (missing members null).  One grouped aggregate — the
    key's members are a handful of rows, so ``max(when(...))`` per
    suffix is the shuffle-minimal pivot."""
    return members.groupBy("key").agg(
        *[
            F.max(F.when(F.col("suffix") == s, F.col("content"))).alias(s)
            for s in suffixes
        ]
    )


class WebDatasetConnector(DataConnector):
    """``wds://`` — WebDataset tar shard directory.

    Read: ``wds:///data/corpus/shard-*.tar`` → the member frame
    (``shard_path, key, suffix, content``).

    Write: ``wds:///data/corpus;shards=64;key=doc_id;gz`` with
    ``member_cols={"txt": "text", ...}`` passed as a connector kwarg
    (defaults to ``{"txt": <first string column that is not the
    key>}``).  The shard manifest from the write is kept on
    ``self.last_manifest`` (list of Rows).
    """

    engine_types = ["wds"]

    def __init__(self, engine_url: str, access: AccessMode = AccessMode.READ, **kwargs: Any):
        super().__init__(engine_url, access, **kwargs)
        self.member_cols: dict[str, str] | None = kwargs.get("member_cols")
        self.last_manifest: list | None = None

    def read(self, spark: SparkSession) -> DataFrame:
        self._require_read()
        path = spark_path(self.url)
        if not any(ch in path for ch in "*?[") and not path.endswith((".tar", ".tar.gz")):
            path = uri_join(path, "shard-*.tar*")
        return read_tar_shards(spark, path)

    def write(self, df: DataFrame, mode: str = "overwrite") -> None:
        self._require_write()
        key = self.url.option("key", "key")
        if key not in df.columns:
            raise ConnectorError(
                f"wds write needs key column {key!r} (set ;key=<col>); "
                f"have {df.columns}"
            )
        member_cols = self.member_cols
        if member_cols is None:
            text_cols = [
                f.name
                for f in df.schema.fields
                if f.name != key and f.dataType.simpleString() in ("string", "binary")
            ]
            if not text_cols:
                raise ConnectorError(
                    "wds write: pass member_cols= (no string/binary column "
                    "besides the key to default to)"
                )
            member_cols = {"txt": text_cols[0]}
        out_dir = spark_path(self.url)
        # clear stale shard files first: a rewrite with fewer shards
        # otherwise leaves old shard-NNNNNN files the read glob mixes in
        if not prepare_shard_dir(out_dir, "shard-*.tar*", mode):
            return  # mode=ignore with existing shards
        manifest = write_tar_shards(
            df,
            out_dir,
            key_col=key,
            member_cols=member_cols,
            n_shards=self.url.int_option("shards", 16),
            compress=self.url.bool_option("gz", False),
        )
        self.last_manifest = manifest.collect()
