"""Committed deterministic fixtures.

``crawl_acceptance.warc.gz`` — a small synthetic crawl archive that
pins the whole crawl-ingest path end to end (catalog entry
``warc_crawl_curation``): WARC parse → HTTP projection → robots gate →
HTML extraction → canonical-URL dedup.  The archive bytes are fully
deterministic (``sources/warc.py:write_warc`` pins header order and
gzip mtime), so the committed file, a fresh :func:`ensure_crawl_fixture`
write, and the VALUES literals the DuckDB oracle replays from are all
provably the same data (``tests/test_connectors.py`` asserts byte
equality).

Crawl content (three hosts, all rows below are plain ASCII so the SQL
literal replay needs no escaping):

* ``www.alpha-site.com`` — robots with a Disallow + Allow carveout;
* ``www.beta-site.com`` — robots with a ``/*9$`` wildcard-anchor rule;
* ``www.gamma-site.com`` — NO robots file (everything allowed);
* page URL variants exercising canonicalization (tracking params,
  default port, fragment, query-order) and two disallowed pages;
* non-page records a real archive carries (warcinfo, request, an
  image response, a 404) that the pipeline must filter out.
"""

from __future__ import annotations

import os

CRAWL_FIXTURE_NAME = "crawl_acceptance.warc.gz"

# (url, html) — raw pages as served; ASCII only, no single quotes
CRAWL_PAGES: list[tuple[str, str]] = [
    ("https://www.alpha-site.com/home",
     '<html><body><h1>Alpha &amp; Home</h1><a href="/private/ok1">ok</a> '
     '<a href="https://www.beta-site.com/b/1">beta</a></body></html>'),
    ("https://www.alpha-site.com/home?utm_source=feed",
     "<html><body>Home duplicate via tracking param</body></html>"),
    ("https://www.alpha-site.com/private/ok1",
     '<html><body>Allowed carveout <a href="/home">back</a></body></html>'),
    ("https://www.alpha-site.com/private/secret",
     "<html><body>Should be blocked by robots</body></html>"),
    ("https://www.beta-site.com/b/1",
     '<html><body>Beta one <a href="/b/2">two</a> '
     '<a href="/b/9">nine</a></body></html>'),
    ("https://www.beta-site.com/b/9",
     "<html><body>Beta nine blocked by wildcard anchor</body></html>"),
    ("https://www.beta-site.com:443/b/1",
     "<html><body>Beta one via default port</body></html>"),
    ("https://www.beta-site.com/b/2#frag",
     '<html><body>Beta two <a href="https://www.gamma-site.com/solo">'
     "gamma</a></body></html>"),
    ("https://www.gamma-site.com/g?b=2&a=1",
     "<html><body>Gamma query page</body></html>"),
    ("https://www.gamma-site.com/g?a=1&b=2",
     "<html><body>Gamma query page reordered</body></html>"),
    ("https://www.gamma-site.com/solo",
     '<html><body>Gamma solo <a href="/g?a=1&b=2">g</a></body></html>'),
    ("http://www.gamma-site.com/plain9",
     "<html><body>No robots file on gamma so nine is fine</body></html>"),
]

# (host, robots.txt text)
CRAWL_ROBOTS: list[tuple[str, str]] = [
    ("www.alpha-site.com",
     "User-agent: *\nDisallow: /private/\nAllow: /private/ok*\n"),
    ("www.beta-site.com",
     "User-agent: *\nDisallow: /*9$\n"),
]


def crawl_fixture_path() -> str:
    return os.path.join(os.path.dirname(__file__), CRAWL_FIXTURE_NAME)


def crawl_fixture_records() -> list[dict]:
    """The archive's record list — shared by the committed-fixture
    writer and the byte-equality test."""
    from ..sources.warc import http_response_payload

    date = "2026-08-16T00:00:00Z"
    records: list[dict] = [
        {"warc_type": "warcinfo",
         "content_type": "application/warc-fields",
         "payload": b"software: ayeaye-fixture-crawler/1.0\r\n"},
    ]
    for host, txt in CRAWL_ROBOTS:
        records.append({
            "warc_type": "response",
            "target_uri": f"https://{host}/robots.txt",
            "warc_date": date,
            "content_type": "application/http; msgtype=response",
            "payload": http_response_payload(
                txt, content_type="text/plain"
            ),
        })
    for url, html in CRAWL_PAGES:
        records.append({
            "warc_type": "request", "target_uri": url, "warc_date": date,
            "payload": b"GET / HTTP/1.1\r\n\r\n"})
        records.append({
            "warc_type": "response",
            "target_uri": url,
            "warc_date": date,
            "content_type": "application/http; msgtype=response",
            "payload": http_response_payload(html),
        })
    # noise a real crawl carries: a binary response and a 404
    records.append({
        "warc_type": "response",
        "target_uri": "https://www.gamma-site.com/logo.png",
        "warc_date": date,
        "content_type": "application/http; msgtype=response",
        "payload": (b"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\n"
                    b"\x89PNG\r\n\x1a\nfakebytes"),
    })
    records.append({
        "warc_type": "response",
        "target_uri": "https://www.alpha-site.com/gone",
        "warc_date": date,
        "content_type": "application/http; msgtype=response",
        "payload": http_response_payload(
            "<html><body>not found</body></html>", status=404
        ),
    })
    return records


def ensure_crawl_fixture() -> str:
    """Path to the committed archive, writing it first if absent (the
    writer is byte-deterministic, so a rewrite reproduces the committed
    bytes exactly)."""
    from ..sources.warc import write_warc

    path = crawl_fixture_path()
    if not os.path.exists(path):
        write_warc(path, crawl_fixture_records())
    return path
