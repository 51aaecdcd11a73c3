"""Incremental REST ingestion as a Model: Python streaming DataSource →
ORC.

Ties three engine extensions together end-to-end:

* ``ayeaye_rest_stream`` (``sources/pyds.py``) — a Spark 4 Python
  streaming DataSource whose checkpointed offset is the page number, the
  jar-free analog of the reference's bounded-by-offset Kafka consumption
  (``kafka_connector.py:77-137``);
* an ORC sink addressed by engine_url through the normal ``Connect``
  declaration;
* the Model lifecycle (checks + build + logging) around a streaming
  drain.

Re-running with the same checkpoint ingests only NEW pages — the
incremental-build pattern a scheduled production pipeline relies on.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ayeaye_spark import AccessMode, Connect, Model, register_python_datasources


class RestIngest(Model):
    """Drain a paged JSON API into an ORC dataset, resumably."""

    target = Connect(engine_url="orc://{out_path}/rest_rows", access=AccessMode.WRITE)

    # resolver-templated knobs: the API location and page budget
    api_url_template = "{api_url}"  # e.g. http://host:port/page/{page}
    pages = 3
    ddl = "id int, name string"

    def build(self):
        from ayeaye_spark.core.resolver import connector_resolver

        register_python_datasources(self.spark)
        url = connector_resolver.resolve(self.api_url_template)
        out_path = self.target.connector.local_path
        ckpt = out_path + "._checkpoint"
        stream = (
            self.spark.readStream.format("ayeaye_rest_stream")
            .option("url", url)
            .option("ddl", self.ddl)
            .option("end_page", self.pages)
            .load()
        )
        # a SimpleDataSourceStreamReader advances ONE page per
        # availableNow run (single-batch fallback) — loop runs until a
        # batch ingests nothing, i.e. the page budget is drained
        total = 0
        while True:
            q = (
                stream.writeStream.format("orc")
                .option("path", out_path)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            progress = q.lastProgress
            batch_rows = int(progress["numInputRows"]) if progress else 0
            if not batch_rows:
                break
            total += batch_rows
        self.log(f"drained {total} new rows into {out_path} (checkpoint {ckpt})")

    def post_build_check(self) -> bool:
        n = self.spark.read.orc(self.target.connector.local_path).count()
        self.add_stat("rows_ingested", n)
        self.log(f"post check: {n} rows present")
        return n >= 0
