"""Wildcard listing beyond Spark's glob: reference-parity pattern
expansion.

The reference expands ``*`` wildcards into per-object engine_urls with an
S3 ``list_objects_v2`` prefix scan plus a regex over the remainder
(``engine_type_modifiers/smart_open_modifier.py:16-72``,
``engine_type_modifiers/utils.py:4-34``).  Spark's path globs cover
``*``/``?`` inside one scan, but users of the reference rely on getting
the *expanded url list* back (MultiConnector per-file logic, manifests).

This shim reproduces that: :func:`pattern_prefix_matcher` is the exact
prefix+regex split the reference uses, and :func:`expand_pattern` walks
any Hadoop-visible filesystem (local, ``s3a://`` when configured) through
the JVM FileSystem API — a driver-side listing, the same shape as the
reference's paginated S3 listing.
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import SparkSession

from ..core.engine_url import split_engine_type

#: characters the reference refuses inside patterns (regex safety,
#: utils.py:17-23)
_RESERVED = "?\\()!^$+{}[]|<"


def pattern_prefix_matcher(key_pattern: str) -> tuple[str, Callable[[str], bool]]:
    """(static prefix, full-path matcher) for a ``*`` wildcard pattern.

    Mirrors the reference's ``s3_pattern_match`` contract exactly: the
    listing API filters by the prefix up to the first ``*``; the rest is
    a regex full-match with ``*`` → ``.*`` and ``.`` escaped.
    """
    if "*" not in key_pattern:
        raise ValueError("pattern must contain a '*' wildcard")
    for char in _RESERVED:
        if char in key_pattern:
            raise NotImplementedError(
                f"object pattern not supported: can't contain {_RESERVED!r}"
            )
    prefix = key_pattern.split("*", 1)[0]
    expression = key_pattern.replace(".", r"\.").replace("*", ".*")
    pattern = re.compile(expression)

    def check_file_path(full_path: str) -> bool:
        return pattern.fullmatch(full_path) is not None

    return prefix, check_file_path


def expand_pattern(spark: SparkSession, engine_url: str) -> list[str]:
    """Expand a wildcard engine_url into per-file engine_urls.

    Uses the Hadoop FileSystem of the path's scheme (local paths, or any
    configured remote fs such as ``s3a``) — one recursive driver-side
    listing under the static prefix, regex-filtered, sorted.  Feed the
    result to ``MultiConnector`` for reference-style per-file access; for
    a single fused scan, pass the glob straight to the connector instead.
    """
    modifiers, engine_type = split_engine_type(engine_url)
    path_pattern = engine_url.split("://", 1)[1]
    # strip url options (';key=value') before matching
    path_pattern = path_pattern.split(";", 1)[0]
    scheme = ""
    if "s3" in modifiers:
        scheme = "s3a://"
    prefix, matcher = pattern_prefix_matcher(path_pattern)

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    # list from the deepest static directory of the prefix
    base_dir = prefix if prefix.endswith("/") else prefix.rsplit("/", 1)[0] + "/"
    jpath = jvm.org.apache.hadoop.fs.Path(scheme + base_dir)
    fs = jpath.getFileSystem(conf)
    if not fs.exists(jpath):
        return []

    mods = "".join(f"{m}+" for m in modifiers)
    found: list[str] = []
    it = fs.listFiles(jpath, True)  # recursive
    while it.hasNext():
        uri = it.next().getPath().toUri()
        full = _match_target(uri.getAuthority(), uri.getPath())
        if matcher(full):
            found.append(f"{mods}{engine_type}://{full}")
    return sorted(found)


def _match_target(authority: str | None, path: str) -> str:
    """URI → the string the pattern was written against.

    Remote stores put the bucket in the URI *authority* and the key in
    the path (``s3a://bucket/data/f.csv`` → authority ``bucket``, path
    ``/data/f.csv``), while the reference-style pattern is
    ``bucket/data/f.csv`` — so re-join them.  Local files have no
    authority and match on the absolute path as-is.
    """
    if authority:
        return f"{authority}{path}"
    return path
