"""Web-corpus curation operators: URL canonicalization, URL-keyed
dedup, and registrable-domain statistics.

The first dedup pass of every crawled training corpus is URL-keyed —
the same page arrives under ``HTTP://Example.COM:80/a/?utm_source=x``
and ``http://example.com/a`` — and domain-level share statistics drive
source reputation and mixture planning.  All three operators are pure
single-row string expressions (``functions.portable.canonical_url`` /
``registrable_domain``) in the scan projection plus at most one
hash-keyed aggregate: whole-stage codegen, no UDF, and the only
shuffle is keyed on the canonical URL / domain (uniform keys at any
corpus size).

Reference parity: the reference has no web operators — this is a
beyond-reference addition in the spirit of its record-level transform
maps (``connectors/ndjson_connector.py`` transform_map), motivated by
the training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import portable as P


def with_canonical_url(
    df: DataFrame,
    url_col: str,
    out_col: str = "canonical_url",
    *,
    tracking_re: str = P.TRACKING_PARAM_RE,
) -> DataFrame:
    """Append the canonical form of ``url_col`` (lowercased scheme +
    host, fragment/default-port/tracking-param dropped, query params
    sorted — see ``portable.canonical_url``).  Scan-projection only."""
    return df.withColumn(
        out_col,
        F.expr(P.canonical_url(url_col, P.SPARK, tracking_re=tracking_re)),
    )


def url_dedup(
    df: DataFrame,
    id_col: str,
    url_col: str,
    *,
    tracking_re: str = P.TRACKING_PARAM_RE,
) -> DataFrame:
    """Canonical-URL-keyed exact dedup: one row per canonical URL with
    the smallest-id survivor and the duplicate count — the crawl
    pipeline's first (and cheapest) dedup stage, upstream of content
    fingerprints and MinHash.  One hash aggregate keyed on the
    canonical URL."""
    return (
        with_canonical_url(df, url_col, "_canon", tracking_re=tracking_re)
        .groupBy(F.col("_canon").alias("canonical_url"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def domain_stats(df: DataFrame, url_col: str) -> DataFrame:
    """Per registrable-domain (eTLD+1 heuristic) page counts and exact
    integer-ppm corpus share — the source-reputation / mixture-planning
    rollup.  One aggregate keyed on the domain; the total re-joins by
    broadcast (one row)."""
    host = P.url_host(url_col, P.SPARK)
    dom = P.registrable_domain(host, P.SPARK)
    counts = (
        df.where(F.col(url_col).isNotNull())
        .groupBy(F.expr(dom).alias("domain"))
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )
    total = counts.agg(F.sum("n_pages").cast("long").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "domain",
            "n_pages",
            F.expr("n_pages * 1000000 div _total").alias("share_ppm"),
        )
    )
