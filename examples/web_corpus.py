"""Web-corpus curation pipeline as one Model: the crawl-side stages a
training-data team runs BEFORE any text-quality work, composed from the
engine's verified operators:

1. URL canonicalization + URL-keyed dedup (``web.url_dedup``) — the
   cheapest dedup stage, collapsing tracking-param/port/fragment
   variants of the same page;
2. HTML main-content extraction (``web.html_extract``) with the two
   boilerplate gates — link density (navigation pages) and
   text-to-HTML ratio (chrome-only pages);
3. encoding-artifact hygiene (``text.encoding_artifact_profile``) —
   mojibake / replacement-char / control-byte damage;
4. license / AI-opt-out compliance (``web.license_signals`` per doc,
   ``web.license_rollup`` per source for the report);
5. domain link graph -> exact int64 PageRank
   (``web.domain_link_edges`` + ``graph.pagerank_exact``) — the
   domain-authority prior reported per surviving domain.

Each stage is a scan projection or a key-uniform hash aggregate — the
pipeline shape survives a 100 TB crawl unchanged.  The crawl columns
(url, html) are DERIVED deterministically from the documents table
here because the test corpus carries no crawl fields; swap the
derivation for real columns and nothing else changes.

Model/Connect surface is the reference's (``model.py:55-92``); the
reference has no web operators — this composition is
beyond-reference, per the training-pipeline mandate.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ayeaye_spark import AccessMode, Connect, Model
from ayeaye_spark.operators import graph, web
from ayeaye_spark.operators import text as textops


class WebCorpus(Model):
    documents = Connect(engine_url="parquet://{docs_path}")
    curated = Connect(
        engine_url="parquet://{output_path}/web_curated.parquet",
        access=AccessMode.READWRITE,
    )
    report = Connect(
        engine_url="json://{output_path}/web_corpus.json;indent=2",
        access=AccessMode.READWRITE,
    )

    max_link_density_ppm = 500_000   # > half the text is anchors: nav page
    min_text_ratio_ppm = 30_000      # < 3% visible text: chrome-only page
    max_artifact_ppm = 20_000        # > 2% damaged chars: drop

    def _crawl_frame(self):
        """documents + derived (url, html) crawl columns — the test
        corpus has no crawl fields; a real deployment selects them."""
        sid = "cast(doc_id as string)"
        url = (
            # doc_id%7==3 rows re-crawl the page of doc_id-20 — the
            # SAME source (source = doc_id % 20 in the test corpus) —
            # through a tracking-param/port/fragment/case variant, so
            # canonicalization collapses the two rows onto one page
            f"(CASE WHEN doc_id % 7 = 3 AND doc_id >= 20 THEN "
            f"concat('HTTPS://www.', source, '-site.com:443/page/', "
            f"cast(doc_id - 20 as string), '/?utm_source=feed#top') "
            f"ELSE concat('https://www.', source, '-site.com/page/', "
            f"{sid}) END)"
        )
        k1 = "cast((doc_id * 7 + 3) % 20 as string)"
        # nav pages (%17==2) carry ONLY anchors — link density ~1;
        # article pages carry the document text plus slice-injected
        # encoding damage (%11==5) and AI-opt-out marks (%13==7)
        article = (
            f"concat('<p>', coalesce(text, ''), "
            f"CASE WHEN doc_id % 11 = 5 THEN ' cafÃ© naÃ¯ve â€™ bad' "
            f"ELSE '' END, "
            f"CASE WHEN doc_id % 13 = 7 THEN ' noai noimageai' "
            f"ELSE '' END, "
            f"'</p>')"
        )
        nav = (
            "'<ul><li><a href=\"/a\">home page link</a></li>"
            "<li><a href=\"/b\">products and services overview</a></li>"
            "<li><a href=\"/c\">about the whole company</a></li></ul>'"
        )
        html = (
            f"concat('<html><head><style>p{{}}</style>"
            f"<script>var x=1;</script></head><body><!-- c -->', "
            f"CASE WHEN doc_id % 17 = 2 THEN {nav} ELSE {article} END, "
            f"'<a href=\"https://src', {k1}, '-site.com/a\">x</a>"
            f"</body></html>')"
        )
        return self.documents.df.select(
            "doc_id", "source", "lang",
            F.expr(url).alias("url"), F.expr(html).alias("html"),
        )

    def _robots_frame(self):
        """Per-host robots.txt: every fifth source disallows its
        /page/ tree to all agents (a real crawl fetches these; the
        test corpus derives them)."""
        return self.documents.df.select(
            F.concat(F.lit("www."), F.col("source"), F.lit("-site.com"))
            .alias("host"),
            F.expr(
                "CASE WHEN cast(substring(source, 4) as int) % 5 = 0 "
                "THEN concat('User-agent: *', chr(10), "
                "'Disallow: /page/', chr(10)) "
                "ELSE concat('User-agent: *', chr(10), "
                "'Disallow: /admin/', chr(10)) END"
            ).alias("robots_txt"),
        ).distinct()

    def build(self):
        crawled = self._crawl_frame()
        n_pages = crawled.count()

        # 0. robots compliance: drop pages the site's robots.txt
        # disallows for '*' — the gate a lawful crawl applies FIRST
        verdicts = web.robots_filter(
            crawled, self._robots_frame(), "doc_id", "url"
        )
        pages = crawled.join(
            verdicts.where(F.col("allowed")).select("doc_id"), "doc_id"
        )
        n_robots_allowed = pages.count()

        # 1. canonical-URL dedup: smallest doc_id survives per page
        survivors = web.url_dedup(pages, "doc_id", "url").select(
            F.col("keep_id").alias("doc_id")
        )
        deduped = pages.join(survivors, "doc_id")
        n_url_deduped = deduped.count()

        # 2. HTML extraction + boilerplate gates
        extracted = web.html_extract(deduped, "doc_id", "html").join(
            deduped.select("doc_id", "source", "lang", "url"), "doc_id"
        )
        content = extracted.where(
            (F.col("link_density_ppm") <= self.max_link_density_ppm)
            & (F.col("text_ratio_ppm") >= self.min_text_ratio_ppm)
        )
        n_content = content.count()

        # 3. encoding hygiene on the EXTRACTED text
        hygiene = textops.encoding_artifact_profile(
            content, "doc_id", "text"
        ).where(F.col("artifact_ppm") <= self.max_artifact_ppm)
        clean = content.join(hygiene.select("doc_id"), "doc_id")
        n_clean = clean.count()

        # 4. compliance: drop AI-opt-out documents, report the rest
        flags = web.license_signals(clean, "doc_id", "text")
        curated = clean.join(
            flags.where(~F.col("ai_opt_out")).select("doc_id"), "doc_id"
        )
        n_curated = curated.count()
        self.curated.write(
            curated.select("doc_id", "source", "lang", "url", "text")
        )

        # 5. domain authority over the FULL crawl's link graph
        # (links exist whether or not robots lets us fetch the target)
        edges = web.domain_link_edges(crawled, "url", "html")
        pr = graph.pagerank_exact(
            edges.select(
                F.col("src_domain").alias("src"),
                F.col("dst_domain").alias("dst"),
                F.col("n_links").alias("w"),
            ),
            "src", "dst", "w", iterations=5,
        )
        top_domains = [
            {"domain": r["node"], "pr_ppb": r["pr_ppb"]}
            for r in pr.orderBy(F.desc("pr_ppb"), F.asc("node"))
            .limit(5).collect()
        ]

        lic = web.license_rollup(clean, "source", "text")
        opt_out_sources = [
            {"source": r["source"], "ai_opt_out_ppm": r["ai_opt_out_ppm"]}
            for r in lic.where(F.col("n_ai_opt_out") > 0)
            .orderBy(F.desc("ai_opt_out_ppm"), F.asc("source"))
            .limit(5).collect()
        ]

        self.report.data = {
            "funnel": {
                "pages": n_pages,
                "after_robots_gate": n_robots_allowed,
                "after_url_dedup": n_url_deduped,
                "after_boilerplate_gates": n_content,
                "after_encoding_hygiene": n_clean,
                "curated": n_curated,
            },
            "link_graph_domains": pr.count(),
            "top_domains_by_authority": top_domains,
            "opt_out_sources": opt_out_sources,
        }
        self.log(
            f"web corpus: {n_pages} pages -> {n_curated} curated "
            f"({len(top_domains)} top domains reported)"
        )

    def post_build_check(self) -> bool:
        f = self.report.data["funnel"]
        monotone = (
            f["pages"] >= f["after_robots_gate"] >= f["after_url_dedup"]
            >= f["after_boilerplate_gates"] >= f["after_encoding_hygiene"]
            >= f["curated"] > 0
        )
        ok = monotone and self.curated.df.count() == f["curated"]
        if not ok:
            self.log("web corpus output failed validation", "ERROR")
        return ok


if __name__ == "__main__":
    from ayeaye_spark import connector_resolver

    here = os.path.dirname(os.path.abspath(__file__))
    with connector_resolver.context(
        docs_path="/root/testdata/sf0.001/documents.parquet",
        output_path=here,
    ):
        WebCorpus().go()
