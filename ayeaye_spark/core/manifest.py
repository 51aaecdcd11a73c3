"""Manifest-driven builds: engine_urls resolved from a manifest document.

Re-expresses the reference's common patterns (SURVEY §2.2):

* :class:`EngineFromManifest` — ``common_pattern/manifest.py:16-97``:
  a deferred callable usable as a ``Connect(engine_url=...)`` that reads a
  manifest dataset at resolve time and returns the engine_url(s) it names
  (versioned-build indirection).
* :class:`ManifestMapper` — ``common_pattern/manifest.py:100-326``:
  maps each manifest item to N input/output engine_url sets via user
  ``map_<name>`` methods; iterating yields one mapping record per item,
  and ``.<name>`` gives the full url list for a ``Connect`` declaration.
* :func:`manifest_build_context` — ``common_pattern/build_context.py:16-66``:
  load a manifest JSON into a resolver context.

All driver-side: manifests are small random-access documents (SURVEY §7
"driver-side documents"), while the per-item datasets they point at are
full Spark reads/writes.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Iterator

from .pinnate import Pinnate
from .resolver import connector_resolver


def _load_manifest_doc(engine_url: str) -> Pinnate:
    from ..sources.registry import connector_for

    resolved = connector_resolver.resolve(engine_url)
    connector = connector_for(resolved)
    return connector.data


class EngineFromManifest:
    """Deferred engine_url(s) read from a manifest dataset.

    >>> Connect(engine_url=EngineFromManifest("json://{build}/manifest.json",
    ...                                       "source_files", "ndjson"))

    At resolve time the manifest's ``field`` is read; a string becomes one
    ``engine_type://value`` url, a list becomes a list of urls (→
    MultiConnector).
    """

    def __init__(self, manifest_url: str, field: str, engine_type: str):
        self.manifest_url = manifest_url
        self.field = field
        self.engine_type = engine_type

    def __call__(self) -> str | list[str]:
        doc = _load_manifest_doc(self.manifest_url)
        value = doc[self.field]
        if isinstance(value, Pinnate):
            value = value.as_native()
        if isinstance(value, list):
            return [f"{self.engine_type}://{v}" for v in value]
        return f"{self.engine_type}://{value}"


class ManifestMapping(Pinnate):
    """One manifest item's mapped urls: attributes per ``map_*`` method."""


class ManifestMapper:
    """Maps manifest items to per-item input/output engine_urls.

    Subclass with ``map_<name>`` methods, each returning a list of
    ``(manifest_item, engine_url)`` pairs.  Then:

    * ``mapper.<name>`` → callable returning the url list (usable directly
      as ``Connect(engine_url=mapper.<name>)``);
    * ``iter(mapper)`` → one :class:`ManifestMapping` per manifest item
      with ``.<name>`` attributes (url for that item).
    """

    def __init__(self, manifest_url: str, field: str):
        self.manifest_url = manifest_url
        self.field = field
        self._doc: Pinnate | None = None

    @property
    def manifest_items(self) -> list[Any]:
        if self._doc is None:
            self._doc = _load_manifest_doc(self.manifest_url)
        value = self._doc[self.field]
        if isinstance(value, Pinnate):
            value = value.as_native()
        return value if isinstance(value, list) else [value]

    def _map_methods(self) -> dict[str, Callable[[], list[tuple[Any, str]]]]:
        found = {}
        for attr in dir(self):
            if attr.startswith("map_") and callable(getattr(self, attr)):
                found[attr[len("map_") :]] = getattr(self, attr)
        return found

    def __getattr__(self, item: str):
        methods = object.__getattribute__(self, "_map_methods")()
        if item in methods:
            method = methods[item]

            def urls() -> list[str]:
                return [connector_resolver.resolve(url) for _, url in method()]

            return urls
        raise AttributeError(item)

    def __iter__(self) -> Iterator[ManifestMapping]:
        methods = self._map_methods()
        per_name = {name: dict(method()) for name, method in methods.items()}
        for item in self.manifest_items:
            payload = {"manifest_item": item}
            for name, mapping in per_name.items():
                if item in mapping:
                    payload[name] = connector_resolver.resolve(mapping[item])
            yield ManifestMapping(payload)


def manifest_build_context(manifest_path: str, **extra: Any):
    """Resolver context loaded from a manifest JSON file (CLI pattern:
    ``python model.py path/to/manifest.json``)."""
    with open(manifest_path) as f:
        doc = json.load(f)
    doc.update(extra)
    return connector_resolver.context(**doc)


# The reference exports this class as ``AbstractManifestMapper``
# (lib/ayeaye/__init__.py:1) — keep that name importable so reference
# users' models port without edits.
AbstractManifestMapper = ManifestMapper
