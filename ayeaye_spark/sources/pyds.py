"""Spark 4 Python DataSource implementations.

The reference's REST access (``restful_connector.py:19-467``) is a
driver-side client; this engine's :class:`RestfulConnector` already adds
a ``mapPartitions`` data-plane fan-out.  This module lifts that fan-out
into Spark 4's first-class extension point — ``pyspark.sql.datasource``
— so a paged REST API reads like any other source::

    register_python_datasources(spark)
    df = (spark.read.format("ayeaye_rest")
          .option("url", "http://api.host/items?page={page}")
          .option("pages", 8)
          .option("ddl", "id int, name string")
          .load())

Partition planning: one input partition per page, fetched ON THE
EXECUTORS in parallel — at scale the page count (thousands) spreads
across the cluster and the driver never touches a payload.  Each
partition's HTTP session retries 5xx like the connector does.
"""

from __future__ import annotations

import json
import time

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


class RestDataSource(DataSource):
    """``spark.read.format("ayeaye_rest")`` — paged REST GET as a source.

    Options:
      * ``url``   — GET url template containing ``{page}`` (required)
      * ``pages`` — number of pages / partitions (default 1)
      * ``ddl``   — result schema as a DDL string (required); each page
        must return a JSON array of objects (or an object with a
        ``data`` array), keyed by the schema's field names
      * ``retries`` / ``backoff`` — 5xx retry budget (defaults 3 / 0.1s)
    """

    @classmethod
    def name(cls) -> str:
        return "ayeaye_rest"

    def schema(self) -> str:
        ddl = self.options.get("ddl")
        if not ddl:
            raise ValueError("ayeaye_rest requires .option('ddl', '<schema ddl>')")
        return ddl

    def reader(self, schema) -> "RestReader":
        return RestReader(self.options, schema)

    def writer(self, schema, overwrite: bool) -> "RestWriter":
        return RestWriter(self.options, schema)


class RestReader(DataSourceReader):
    def __init__(self, options, schema):
        self.url = options.get("url")
        if not self.url:
            raise ValueError("ayeaye_rest requires .option('url', 'http://...{page}...')")
        self.pages = int(options.get("pages", 1))
        self.retries = int(options.get("retries", 3))
        self.backoff = float(options.get("backoff", 0.1))
        self.fields = [f.name for f in schema.fields]

    def partitions(self):
        return [InputPartition(p) for p in range(self.pages)]

    def read(self, partition):
        # runs on an EXECUTOR: fetch this page with the connector's 5xx
        # retry discipline, then yield schema-ordered tuples
        import urllib.request

        url = self.url.format(page=partition.value)
        last_err = None
        for attempt in range(self.retries + 1):
            try:
                with urllib.request.urlopen(url) as resp:
                    payload = json.loads(resp.read())
                break
            except Exception as exc:  # urllib raises on 5xx
                last_err = exc
                status = getattr(exc, "code", None)
                if status is not None and status < 500:
                    raise
                if attempt == self.retries:
                    raise RuntimeError(
                        f"ayeaye_rest: {url} failed after {self.retries + 1} tries"
                    ) from last_err
                time.sleep(self.backoff * (2**attempt))
        if isinstance(payload, dict):
            payload = payload.get("data", [])
        for obj in payload:
            yield tuple(obj.get(f) for f in self.fields)


class RestWriter(DataSourceWriter):
    """Executor-side REST sink: each partition POSTs its rows as ONE
    JSON-array batch to ``write_url`` (batched like the reference's
    BigQuery 1000-row buffer, ``bigquery.py:49`` — not per-row HTTP).
    ``batch_size`` caps rows per POST (default 1000)."""

    def __init__(self, options, schema):
        self.url = options.get("write_url") or options.get("url")
        if not self.url:
            raise ValueError("ayeaye_rest write requires .option('write_url', ...)")
        self.batch_size = int(options.get("batch_size", 1000))
        self.fields = [f.name for f in schema.fields]

    def write(self, iterator) -> WriterCommitMessage:
        import urllib.request

        posted = 0
        buf = []

        def flush():
            nonlocal posted
            if not buf:
                return
            body = json.dumps(buf).encode()
            req = urllib.request.Request(
                self.url, data=body, headers={"Content-Type": "application/json"}
            )
            with urllib.request.urlopen(req):
                pass
            posted += len(buf)
            buf.clear()

        for row in iterator:
            buf.append({f: row[i] for i, f in enumerate(self.fields)})
            if len(buf) >= self.batch_size:
                flush()
        flush()
        return WriterCommitMessage()


class RestStreamDataSource(DataSource):
    """``spark.readStream.format("ayeaye_rest_stream")`` — incremental
    paged ingestion: the stream offset IS the page number, advanced one
    page per micro-batch and persisted in the checkpoint, so a restart
    resumes exactly where it stopped.  This is the jar-free stand-in
    for the reference's bounded-by-offset Kafka consumption
    (``kafka_connector.py:77-137``): same contract (externally-stored
    positions, replayable ranges), HTTP instead of a broker.

    Options: ``url`` (template with ``{page}``), ``ddl``,
    ``start_page`` (default 0), ``end_page`` (exclusive; absent =
    unbounded polling).
    """

    @classmethod
    def name(cls) -> str:
        return "ayeaye_rest_stream"

    def schema(self) -> str:
        ddl = self.options.get("ddl")
        if not ddl:
            raise ValueError("ayeaye_rest_stream requires .option('ddl', ...)")
        return ddl

    def simpleStreamReader(self, schema) -> "RestStreamReader":
        return RestStreamReader(self.options, schema)


class RestStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options, schema):
        self.url = options.get("url")
        if not self.url:
            raise ValueError("ayeaye_rest_stream requires .option('url', ...)")
        self.start_page = int(options.get("start_page", 0))
        self.end_page = int(options["end_page"]) if "end_page" in options else None
        self.fields = [f.name for f in schema.fields]

    def initialOffset(self):
        return {"page": self.start_page}

    def read(self, start):
        import urllib.request

        page = start["page"]
        if self.end_page is not None and page >= self.end_page:
            return iter([]), start  # drained: offset unchanged
        with urllib.request.urlopen(self.url.format(page=page)) as resp:
            payload = json.loads(resp.read())
        if isinstance(payload, dict):
            payload = payload.get("data", [])
        rows = [tuple(obj.get(f) for f in self.fields) for obj in payload]
        return iter(rows), {"page": page + 1}


def register_python_datasources(spark) -> list[str]:
    """Register this module's Python data sources; returns their names."""
    spark.dataSource.register(RestDataSource)
    spark.dataSource.register(RestStreamDataSource)
    return [RestDataSource.name(), RestStreamDataSource.name()]
