"""ayeaye_spark — a PySpark-native ETL/analytics engine.

Brand-new engine with the capabilities of the AyeAye ETL framework
(reference: github.com/Aye-Aye-Dev/AyeAye), re-architected Spark-first:
engine_url-addressed connectors resolve to ``spark.read``/``df.write``,
models compose lazy DataFrame transformations optimized by Catalyst, the
DAG layer derives run order from declared READ/WRITE datasets, and
LLM-scale extensions (dedup, similarity search, multimodal columns, text
analysis) are first-class operators designed for ~100 TB inputs.
"""

from .core.collection import ModelCollection, ModelGraphError, ProvenanceEdge
from .core.dataset import Connect, Dataset, DatasetHandle
from .core.engine_url import EngineUrl, EngineUrlError, parse_engine_url
from .core.manifest import AbstractManifestMapper, EngineFromManifest, ManifestMapper
from .core.model import (
    LockingMode,
    Model,
    PartitionedModel,
    PartitionOption,
    SubTaskFailed,
    TaskPartition,
)
from .core.pinnate import Pinnate
from .core.resolver import ConnectorResolver, UnresolvedUrlError, connector_resolver
from .core.session import get_spark
from .sources.base import AccessMode, ConnectorError, MissingDependencyError
from .sources.pyds import register_python_datasources
from .sources.registry import (
    connector_for,
    connector_registry,
    register_connector,
    registered_engine_types,
)

__version__ = "0.1.0"

__all__ = [
    "AbstractManifestMapper",
    "AccessMode",
    "Connect",
    "ConnectorError",
    "ConnectorResolver",
    "Dataset",
    "DatasetHandle",
    "EngineFromManifest",
    "EngineUrl",
    "EngineUrlError",
    "LockingMode",
    "ManifestMapper",
    "MissingDependencyError",
    "Model",
    "ModelCollection",
    "ModelGraphError",
    "PartitionOption",
    "PartitionedModel",
    "Pinnate",
    "ProvenanceEdge",
    "SubTaskFailed",
    "TaskPartition",
    "UnresolvedUrlError",
    "connector_for",
    "connector_registry",
    "connector_resolver",
    "get_spark",
    "parse_engine_url",
    "register_connector",
    "register_python_datasources",
    "registered_engine_types",
]
