"""MultiConnector, FakeDataConnector, PlaceholderDataConnector.

* MultiConnector — ``lib/ayeaye/connectors/multi_connector.py:10-167``:
  N child connectors addressed by engine_url; in the Spark engine the
  common read path is one multi-path scan with ``input_file_name()``
  (per-file identity, SURVEY §7 "hard parts"), while per-child access
  stays available for heterogeneous urls.
* FakeDataConnector — ``connectors/fake.py:4-29``: canned rows for tests.
* PlaceholderDataConnector — ``connectors/placeholder.py:4-19``: inert
  stand-in until the resolver context supplies a real url.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import AccessMode, ConnectorError, DataConnector


class MultiConnector(DataConnector):
    """Holds N child connectors; supports runtime ``add_engine_url``."""

    engine_types: list[str] = []

    def __init__(
        self,
        engine_url: list[str],
        access: AccessMode = AccessMode.READ,
        **kwargs: Any,
    ):
        if not isinstance(engine_url, (list, tuple)):
            raise ConnectorError("MultiConnector needs a list of engine_urls")
        self.engine_urls = list(engine_url)
        self.access = access
        self.connector_kwargs = kwargs
        self._children: dict[str, DataConnector] = {}

    # lazily build children through the registry (avoids import cycle)
    def _child(self, url: str) -> DataConnector:
        if url not in self._children:
            from .registry import connector_for

            self._children[url] = connector_for(url, access=self.access, **self.connector_kwargs)
        return self._children[url]

    @property
    def data(self) -> list[DataConnector]:
        return [self._child(u) for u in self.engine_urls]

    def __len__(self) -> int:
        return len(self.engine_urls)

    def __iter__(self) -> Iterator[DataConnector]:
        return iter(self.data)

    def __getitem__(self, engine_url: str) -> DataConnector:
        if engine_url not in self.engine_urls:
            raise KeyError(engine_url)
        return self._child(engine_url)

    def add_engine_url(self, engine_url: str) -> DataConnector:
        """Mint an output/input at runtime (multi_connector.py:63-90)."""
        from ..core.resolver import connector_resolver

        resolved = connector_resolver.resolve(engine_url)
        self.engine_urls.append(resolved)
        return self._child(resolved)

    def connect_id(self) -> str:
        return "Multi:" + "|".join(sorted(self.engine_urls))

    @property
    def engine_url(self) -> str:  # type: ignore[override]
        return ";".join(self.engine_urls)

    def read(self, spark: SparkSession, with_source: bool = True) -> DataFrame:
        """Union of every child's DataFrame.

        Homogeneous file urls collapse into ONE multi-path scan (a single
        Spark job with per-file splits — no driver loop), tagged with
        ``source_url = input_file_name()`` so manifest-style per-file logic
        stays possible (cf. ``examples/manifest_mapper.py:49-57``).
        """
        self._require_read()
        if not self.engine_urls:
            # Connect(engine_url=[]) + add_engine_url at runtime is a
            # legal reference pattern (multi_connector.py:63-90); an
            # empty read must fail with intent, not IndexError.
            raise ConnectorError(
                "MultiConnector has no engine_urls yet — add_engine_url() "
                "one before reading, or pass a non-empty list"
            )
        children = self.data
        dfs = []
        for child in children:
            df = child.read(spark)
            if with_source:
                df = df.withColumn("source_url", F.input_file_name())
            dfs.append(df)
        out = dfs[0]
        for df in dfs[1:]:
            out = out.unionByName(df, allowMissingColumns=True)
        return out

    def write_partitioned(self, df: DataFrame, key_column: str, template: str, fmt: str = "csv") -> None:
        """Scale path for "one output file per key": a single partitioned
        write instead of a driver loop (SURVEY §2.2 MultiConnectorNewDataset)."""
        self._require_write()
        df.write.mode("overwrite").partitionBy(key_column).format(fmt).option("header", True).save(template)


class FakeDataConnector(DataConnector):
    """``fake://`` — deterministic canned data (connectors/fake.py:4-29)."""

    engine_types = ["fake"]

    CANNED = [{"fake": "data"}]

    def read(self, spark: SparkSession) -> DataFrame:
        self._require_read()
        return spark.createDataFrame(self.CANNED)

    @property
    def data(self) -> list[dict]:
        return list(self.CANNED)

    @property
    def datasource_exists(self) -> bool:
        return True


class PlaceholderDataConnector(DataConnector):
    """Inert connector for not-yet-resolvable urls (placeholder.py:4-19)."""

    engine_types = []

    def __init__(self, engine_url: str = "", access: AccessMode = AccessMode.READ, **kwargs: Any):
        self.raw_engine_url = engine_url
        self.access = access
        self.connector_kwargs = kwargs

    @property
    def engine_url(self) -> str:
        return self.raw_engine_url

    def connect_id(self) -> str:
        return f"Placeholder:{self.raw_engine_url}"

    def read(self, spark: SparkSession) -> DataFrame:
        raise ConnectorError("placeholder connector: engine_url not yet resolved")

    @property
    def datasource_exists(self) -> bool:
        return False
