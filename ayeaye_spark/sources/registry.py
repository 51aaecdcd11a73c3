"""engine_type → connector registry + factory.

Re-expresses the reference's plugin registry / connector factory
(``lib/ayeaye/connectors/__init__.py:21-142``): engine_types map to
connector classes, users can :func:`register_connector` their own, and
modifier prefixes (``gz+``, ``s3+``) are stripped before lookup (the
modifiers ride along on the parsed url — Spark handles gzip codecs and
``s3a://`` natively, see ``sources/base.py:spark_path``).

Wildcard urls stay a single connector here (Spark reads glob paths in one
scan); ``Dataset``/``Connect`` may still expand them into a
:class:`MultiConnector` when per-file connectors are wanted.
"""

from __future__ import annotations

from typing import Any, Type

from ..core.engine_url import EngineUrlError, split_engine_type
from .base import AccessMode, DataConnector
from .external import (
    BigQueryConnector,
    ElasticsearchConnector,
    JdbcConnector,
    KafkaConnector,
    RestfulConnector,
)
from .file_formats import (
    AvroConnector,
    CsvConnector,
    JsonConnector,
    NdjsonConnector,
    OrcConnector,
    ParquetConnector,
    TsvConnector,
    UncookedConnector,
    XmlConnector,
)
from .arrow_ipc import ArrowIpcConnector
from .multi import FakeDataConnector, MultiConnector, PlaceholderDataConnector
from .warc import WarcConnector
from .webdataset import WebDatasetConnector

_REGISTRY: dict[str, Type[DataConnector]] = {}

_KNOWN_MODIFIERS = {"gz", "gzip", "s3"}


def register_connector(connector_class: Type[DataConnector], *engine_types: str) -> None:
    """Register a connector class for its engine_types (plugin point)."""
    types = engine_types or connector_class.engine_types
    for et in types:
        _REGISTRY[et.lower()] = connector_class


_BUILTIN_CONNECTORS: tuple[Type[DataConnector], ...] = (
    CsvConnector, TsvConnector, NdjsonConnector, JsonConnector, ParquetConnector,
    OrcConnector, AvroConnector, XmlConnector,
    UncookedConnector, JdbcConnector, KafkaConnector, BigQueryConnector,
    ElasticsearchConnector, RestfulConnector, FakeDataConnector,
    WebDatasetConnector, ArrowIpcConnector, WarcConnector,
)

for cls in _BUILTIN_CONNECTORS:
    register_connector(cls)


class ConnectorPluginsRegistry:
    """Reference-parity facade (``connectors/__init__.py:21-83``) over
    the engine_type → class dict: ``register_connector(cls)``,
    publicly-readable ``registered_connectors``, and ``reset()`` back to
    the built-ins — so reference code using ``ayeaye.connector_registry``
    ports verbatim."""

    @property
    def registered_connectors(self) -> list[Type[DataConnector]]:
        seen: list[Type[DataConnector]] = []
        for c in _REGISTRY.values():
            if c not in seen:
                seen.append(c)
        return seen

    def register_connector(self, connector_cls: Type[DataConnector]) -> None:
        if not isinstance(connector_cls, type) or not issubclass(connector_cls, DataConnector):
            raise TypeError(
                "'connector_cls' should be a class (not object) and subclass of DataConnector"
            )
        register_connector(connector_cls)

    def reset(self) -> None:
        _REGISTRY.clear()
        for c in _BUILTIN_CONNECTORS:
            register_connector(c)


connector_registry = ConnectorPluginsRegistry()


def registered_engine_types() -> list[str]:
    return sorted(_REGISTRY)


def connector_class_for(engine_url: str) -> Type[DataConnector]:
    modifiers, engine_type = split_engine_type(engine_url)
    # sqlalchemy-style "dialect+driver" schemes (mysql+pymysql) are
    # registered as one compound engine_type; an exact full-scheme match
    # wins before the prefix is interpreted as a modifier chain
    full_scheme = "+".join((*modifiers, engine_type))
    if modifiers and full_scheme in _REGISTRY:
        return _REGISTRY[full_scheme]
    unknown = [m for m in modifiers if m not in _KNOWN_MODIFIERS]
    if unknown:
        raise EngineUrlError(f"unknown engine_type modifiers {unknown} in {engine_url!r}")
    try:
        return _REGISTRY[engine_type]
    except KeyError:
        raise EngineUrlError(
            f"unknown engine_type {engine_type!r}; registered: {registered_engine_types()}"
        ) from None


def connector_for(
    engine_url: str | list[str],
    access: AccessMode = AccessMode.READ,
    **kwargs: Any,
) -> DataConnector:
    """Factory: engine_url (or list → MultiConnector) → connector instance."""
    if isinstance(engine_url, (list, tuple)):
        return MultiConnector(list(engine_url), access=access, **kwargs)
    if not engine_url:
        return PlaceholderDataConnector(engine_url, access=access, **kwargs)
    cls = connector_class_for(engine_url)
    return cls(engine_url, access=access, **kwargs)
