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
from ..core.checkpoint import ckpt_lazy


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
    canonical URL.  NULL urls are dropped (they are unkeyable, and a
    NULL group would otherwise swallow every NULL-url row as
    "duplicates" of one survivor) — same contract as the streaming
    twin ``sinks.url_dedup_sink`` and ``domain_stats``."""
    return (
        with_canonical_url(
            df.where(F.col(url_col).isNotNull()), url_col, "_canon",
            tracking_re=tracking_re,
        )
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


def html_extract(
    df: DataFrame, id_col: str, html_col: str
) -> DataFrame:
    """Main-content extraction profile for raw HTML pages — the step
    between the crawl and every text-quality operator: visible ``text``
    (comments/script/style removed, tags stripped, entities decoded,
    whitespace collapsed), size accounting, and the two classic
    boilerplate signals — text-to-HTML ratio and link density (anchor
    chars per visible char, jusText/trafilatura's navigation-page
    discriminator), both as exact integer ppm.

    One chained regex/replace scan projection per row (whole-stage
    codegen, no UDF, no shuffle); value-exact in both engines.  Pages
    where nothing survives extraction report ``text_ratio_ppm`` /
    ``link_density_ppm`` of 0 — filter on those plus ``n_links`` to
    drop pure-chrome pages before quality scoring."""
    h = f"coalesce({html_col}, '')"
    return df.select(
        F.col(id_col),
        F.expr(P.html_to_text(h, P.SPARK)).alias("text"),
        F.length(F.expr(h)).cast("long").alias("n_chars_html"),
        F.expr(P.size(P.html_anchor_texts(h, P.SPARK), P.SPARK))
        .cast("long").alias("n_links"),
        F.expr(P.link_density_ppm(h, P.SPARK)).alias("link_density_ppm"),
    ).withColumn(
        "n_chars_text", F.length("text").cast("long")
    ).withColumn(
        "text_ratio_ppm",
        F.expr(
            "CASE WHEN n_chars_html = 0 THEN CAST(0 AS BIGINT) "
            "ELSE n_chars_text * 1000000 div n_chars_html END"
        ),
    )


def license_signals(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document reuse/compliance flags (``portable
    .LICENSE_SIGNAL_RES``): Creative-Commons license marks, public
    domain / CC0, "all rights reserved", and AI-training opt-out
    signals (noai/noimageai/noml) — the corpus-compliance scan a
    responsible training pipeline runs before mixing sources.  Pure
    regex scan projection; no shuffle."""
    flags = P.license_signal_flags(text_col, P.SPARK)
    return df.select(
        F.col(id_col),
        *[F.expr(expr).alias(name) for name, expr in flags.items()],
    )


def license_rollup(
    df: DataFrame, group_col: str, text_col: str
) -> DataFrame:
    """Per-``group_col`` (source/domain) rollup of the reuse signals:
    document counts plus each signal's exact integer-ppm share — the
    table that decides which sources need license review before
    inclusion.  One group-keyed aggregate over the flag projection."""
    flags = P.license_signal_flags(text_col, P.SPARK)
    flagged = df.select(
        F.col(group_col),
        *[F.expr(expr).cast("int").alias(f"_{n}") for n, expr in flags.items()],
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_docs")]
    aggs += [F.sum(f"_{n}").cast("long").alias(f"n_{n}") for n in flags]
    out = flagged.groupBy(group_col).agg(*aggs)
    for n in flags:
        out = out.withColumn(
            f"{n}_ppm", F.expr(f"n_{n} * 1000000 div n_docs")
        )
    return out


def domain_link_edges(
    df: DataFrame,
    url_col: str,
    html_col: str,
    *,
    drop_self: bool = True,
) -> DataFrame:
    """Registrable-domain link graph from raw crawl pages: every
    ``<a href>`` in ``html_col`` resolves against the page's own host
    (absolute keeps its host, protocol-relative takes the given host,
    root/path-relative stays on the page's host, mailto:/javascript:/
    fragment links drop), and edges aggregate to
    ``(src_domain, dst_domain, n_links)`` at eTLD+1 granularity —
    the input to domain-authority PageRank and link-spam detection.

    Scale shape: href extraction + host resolution are one regex scan
    projection; one explode per link (output-sized); one hash aggregate
    keyed on the (src, dst) pair — never an all-pairs step.  With
    ``drop_self`` (default) intra-domain navigation edges are removed
    before the aggregate, which on real crawls removes the large
    majority of the explode output early."""
    base_host = P.url_host(url_col, P.SPARK)
    src_dom = P.registrable_domain("_bh", P.SPARK)
    dst_dom = P.registrable_domain("_lh", P.SPARK)
    links = (
        df.where(F.col(url_col).isNotNull() & F.col(html_col).isNotNull())
        .select(
            F.expr(base_host).alias("_bh"),
            F.explode(F.expr(P.html_hrefs(html_col, P.SPARK))).alias("_href"),
        )
        .select(
            "_bh",
            F.expr(P.link_host("_href", "_bh", P.SPARK)).alias("_lh"),
        )
        .where(F.col("_lh").isNotNull() & (F.col("_lh") != ""))
        .select(
            F.expr(src_dom).alias("src_domain"),
            F.expr(dst_dom).alias("dst_domain"),
        )
    )
    if drop_self:
        links = links.where(F.col("src_domain") != F.col("dst_domain"))
    return links.groupBy("src_domain", "dst_domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_links")
    )


def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    url_col: str,
    text_col: str,
    *,
    hash_mode: str = P.PORTABLE,
) -> DataFrame:
    """Snapshot-over-snapshot crawl diff: per canonical URL, whether
    the page was ``added``, ``removed``, ``changed`` (same URL,
    different content fingerprint), or ``unchanged`` between two
    crawls — the table an incremental ingest reads to process ONLY the
    changed slice instead of re-running the pipeline over the full new
    snapshot.

    Content identity is the normalized-text fingerprint
    (``portable.fingerprint``; pass ``hash_mode="fast"`` for the
    64-bit production keyspace).  Each side collapses to one row per
    canonical URL first (smallest fingerprint wins on intra-snapshot
    URL duplicates, deterministically), then ONE full outer join on
    the canonical URL — uniform keys, no skew at any corpus size.

    Output: (canonical_url, status, old_fingerprint, new_fingerprint)
    with fingerprints NULL on the missing side."""
    def side(df: DataFrame, out: str) -> DataFrame:
        return (
            df.where(F.col(url_col).isNotNull())
            .select(
                F.expr(P.canonical_url(url_col, P.SPARK)).alias(
                    "canonical_url"
                ),
                F.expr(
                    P.fingerprint(f"coalesce({text_col}, '')", P.SPARK,
                                  hash_mode)
                ).alias(out),
            )
            .groupBy("canonical_url")
            .agg(F.min(out).alias(out))
        )

    joined = side(old, "old_fingerprint").join(
        side(new, "new_fingerprint"), "canonical_url", "full_outer"
    )
    return joined.select(
        "canonical_url",
        F.expr(
            "CASE WHEN old_fingerprint IS NULL THEN 'added' "
            "WHEN new_fingerprint IS NULL THEN 'removed' "
            "WHEN old_fingerprint = new_fingerprint THEN 'unchanged' "
            "ELSE 'changed' END"
        ).alias("status"),
        "old_fingerprint",
        "new_fingerprint",
    )


def _robots_groups(
    robots: DataFrame,
    host_col: str,
    text_col: str,
    agent: str,
) -> DataFrame:
    """Shared robots.txt group machinery: per host, every directive
    line of the groups governing ``agent`` — (host, _kind, _value)
    with ``_kind`` in allow | disallow | crawl-delay.

    Semantics (RFC 9309):

    * a group = a run of consecutive ``User-agent`` lines plus the
      directives after it; ANY other non-blank line ends the run, so
      unrecognized directives still split groups (they classify as
      ``other`` and participate in the lag window — dropping them
      first would merge adjacent groups);
    * comments (#) stripped, blank lines ignored;
    * agent selection: the groups naming ``agent`` (case-insensitive
      product token) when any exist on that host, else the host's
      ``*`` groups — the MUST-fallback of RFC 9309 §2.2.1.

    One robots.txt per host is expected; duplicate host rows are
    collapsed deterministically (max text) before parsing.  The line
    window is per-host and bounded by FILE size, never corpus size."""
    from pyspark.sql import Window

    one = robots.groupBy(F.col(host_col).alias("host")).agg(
        F.max(F.coalesce(F.col(text_col), F.lit(""))).alias("_txt")
    )
    lines = one.select(
        "host",
        F.posexplode(F.split(F.col("_txt"), "\n")).alias("_pos", "_raw"),
    ).select(
        "host", "_pos",
        F.expr("trim(regexp_replace(_raw, '#.*$', ''))").alias("_line"),
    ).where(F.col("_line") != "").select(
        "host", "_pos",
        F.expr(
            r"""CASE WHEN regexp_extract(_line,
                '(?i)^(user-agent|allow|disallow|crawl-delay)\s*:', 1)
                = '' THEN 'other'
            ELSE lower(regexp_extract(_line,
                '(?i)^(user-agent|allow|disallow|crawl-delay)\s*:', 1))
            END"""
        ).alias("_kind"),
        F.expr(
            r"trim(regexp_extract(_line, '(?i)^[a-z-]+\s*:\s*(.*)$', 1))"
        ).alias("_value"),
    )
    w = Window.partitionBy("host").orderBy("_pos")
    grouped = lines.withColumn(
        "_new_group",
        (
            (F.col("_kind") == "user-agent")
            & (F.coalesce(F.lag("_kind").over(w), F.lit(""))
               != "user-agent")
        ).cast("int"),
    ).withColumn(
        "_gid",
        F.sum("_new_group").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ua = grouped.where(F.col("_kind") == "user-agent")
    star = ua.where(F.lower("_value") == "*").select("host", "_gid").distinct()
    if agent == "*":
        chosen = star
    else:
        spec = ua.where(F.lower("_value") == agent.lower()).select(
            "host", "_gid"
        ).distinct()
        hosts_with_spec = spec.select("host").distinct()
        chosen = spec.unionByName(
            star.join(hosts_with_spec, "host", "left_anti")
        )
    return (
        grouped.where(
            F.col("_kind").isin("allow", "disallow", "crawl-delay")
        )
        .join(chosen, ["host", "_gid"])
        .select("host", "_kind", "_value")
    )


def parse_robots_rules(
    robots: DataFrame,
    host_col: str,
    text_col: str,
    *,
    agent: str = "*",
) -> DataFrame:
    """RFC 9309 robots.txt parser: per host, the Allow/Disallow path
    rules governing ``agent`` (with the ``*``-group fallback when no
    group names the agent) — see :func:`_robots_groups` for the group
    semantics; empty rule values (the "Disallow:" allow-everything
    idiom) are dropped.

    Output: (host, rule_type allow|disallow, path_rule, rule_regex,
    rule_len) — ``rule_regex`` is the anchored translation of the rule
    (``*`` -> ``.*``, trailing ``$`` -> end anchor) that
    :func:`robots_filter` matches against."""
    rules = _robots_groups(robots, host_col, text_col, agent).where(
        F.col("_kind").isin("allow", "disallow") & (F.col("_value") != "")
    )
    return rules.select(
        "host",
        F.col("_kind").alias("rule_type"),
        F.col("_value").alias("path_rule"),
    ).distinct().select(
        "host", "rule_type", "path_rule",
        F.expr(P.robots_rule_regex("path_rule", P.SPARK)).alias(
            "rule_regex"
        ),
        F.length("path_rule").cast("long").alias("rule_len"),
    )


def robots_filter(
    pages: DataFrame,
    robots: DataFrame,
    id_col: str,
    url_col: str,
    *,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """Crawl-compliance gate: for every page, whether ``agent`` may
    fetch it under its host's robots.txt (RFC 9309 longest-match: the
    most specific matching rule wins, ties go to allow; no matching
    rule and no robots file both mean allowed).

    Join shape: pages join their host's parsed rules (robots frames
    are host-keyed and small per host), the per-row anchored regex
    match runs in the join projection, and one integer aggregate picks
    the winner — ``rank = rule_len * 2 + is_allow`` maximized over
    matching rules encodes longest-wins-ties-allow with NO struct
    comparisons (portable to the oracle).

    Output: (id_col, allowed, matched_rule, matched_type)."""
    rules = parse_robots_rules(robots, host_col, text_col, agent=agent)
    keyed = pages.select(
        F.col(id_col),
        F.expr(P.url_host(url_col, P.SPARK)).alias("host"),
        F.expr(P.url_pathq(url_col, P.SPARK)).alias("_pathq"),
    )
    cand = keyed.join(rules, "host", "left").withColumn(
        "_m",
        F.col("rule_regex").isNotNull()
        & F.expr(P.regexp_like_col("_pathq", "rule_regex", P.SPARK)),
    ).transform(ckpt_lazy)
    # ^ cand feeds BOTH the rank aggregate and the winner lookup below;
    # without persisting it, the robots parse + per-row regex pipeline
    # would execute twice (Catalyst doesn't dedupe common subplans
    # across a self-join, and the two consumers' exchanges differ)
    ranked = cand.groupBy(id_col).agg(
        F.max(
            F.when(
                F.col("_m"),
                F.col("rule_len") * 2
                + (F.col("rule_type") == "allow").cast("long"),
            )
        ).alias("_rank")
    )
    winner = (
        cand.join(ranked, id_col)
        .where(
            F.col("_m")
            & (
                F.col("rule_len") * 2
                + (F.col("rule_type") == "allow").cast("long")
                == F.col("_rank")
            )
        )
        .groupBy(id_col)
        .agg(F.min("path_rule").alias("matched_rule"))
    )
    out = (
        ranked.join(winner, id_col, "left")
        .withColumn(
            "allowed",
            F.col("_rank").isNull() | (F.col("_rank") % 2 == 1),
        )
        .withColumn(
            "matched_type",
            F.when(F.col("_rank").isNull(), F.lit(None).cast("string"))
            .when(F.col("_rank") % 2 == 1, F.lit("allow"))
            .otherwise(F.lit("disallow")),
        )
        .select(id_col, "allowed", "matched_rule", "matched_type")
    )
    return out


def robots_crawl_delays(
    robots: DataFrame,
    host_col: str,
    text_col: str,
    *,
    agent: str = "*",
    default_delay_ms: int = 1000,
) -> DataFrame:
    """Per-host ``Crawl-delay`` (the de-facto politeness extension to
    RFC 9309) for ``agent`` (with the ``*``-group fallback): the MAX
    delay named in any governing group, in integer milliseconds —
    fractional seconds honored exactly to microsecond resolution;
    values outside ``0..999999.999999`` seconds or non-numeric are
    ignored (hostile robots.txt must not crash the plan); hosts
    without a usable directive get ``default_delay_ms``.  Group
    semantics shared with :func:`parse_robots_rules` via
    :func:`_robots_groups`.

    Output: (host, crawl_delay_ms)."""
    delays = (
        _robots_groups(robots, host_col, text_col, agent)
        .where(
            (F.col("_kind") == "crawl-delay")
            & F.col("_value").rlike(r"^[0-9]{1,6}(\.[0-9]{1,6})?$")
        )
        .groupBy("host")
        .agg(
            F.max(
                F.expr(
                    "cast(cast(_value as decimal(13,6)) * 1000 as bigint)"
                )
            ).alias("crawl_delay_ms")
        )
    )
    hosts = robots.select(F.col(host_col).alias("host")).distinct()
    return hosts.join(delays, "host", "left").na.fill(
        {"crawl_delay_ms": default_delay_ms}
    )


def crawl_plan(
    pages: DataFrame,
    robots: DataFrame,
    url_col: str,
    *,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
    default_delay_ms: int = 1000,
) -> DataFrame:
    """Per-host politeness plan for a (re-)crawl of ``pages``: page
    count, the host's effective ``Crawl-delay`` (ms), and the serial
    fetch time the delay implies (``n_pages * delay``, exact integer
    ms) — the table a frontier scheduler partitions work by (hosts are
    crawled serially for politeness, so per-host serial time IS the
    critical path).  One host-keyed count + one small join."""
    counts = (
        pages.where(F.col(url_col).isNotNull())
        .select(F.expr(P.url_host(url_col, P.SPARK)).alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pages"))
    )
    delays = robots_crawl_delays(
        robots, host_col, text_col, agent=agent,
        default_delay_ms=default_delay_ms,
    )
    return (
        counts.join(delays, "host", "left")
        .na.fill({"crawl_delay_ms": default_delay_ms})
        .select(
            "host", "n_pages", "crawl_delay_ms",
            F.expr("n_pages * crawl_delay_ms").alias("serial_ms"),
        )
    )
