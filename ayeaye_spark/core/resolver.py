"""Context resolution for templated engine_urls.

Spark-first re-expression of the reference's ``ConnectorResolver``
(AyeAye ``lib/ayeaye/connect_resolve.py:7-342``): engine_urls may contain
``{placeholder}`` variables resolved lazily from a process-wide context of

* named attributes (plain values),
* unnamed callables (each offered the url, returns it resolved or unchanged),
* secrets (named values excluded from capture/locking docs).

Everything here is driver-side pure Python — resolution happens before a
DataFrame is built, so Spark never sees an unresolved url.  Scoped contexts
(``with connector_resolver.context(...)``) mirror
``connect_resolve.py:273-342``; capture-for-locking mirrors
``connect_resolve.py:241-271`` (secrets excluded).
"""

from __future__ import annotations

import re
import threading
from typing import Any, Callable

_TEMPLATE_RE = re.compile(r"\{([A-Za-z_][A-Za-z0-9_]*)\}")


class UnresolvedUrlError(ValueError):
    """An engine_url still has {placeholders} after the resolver ran."""


class DeferredResolution:
    """Attribute access on a not-yet-available resolver attribute.

    Mirrors ``connect_resolve.py:345-382``: allows
    ``connector_resolver.my_attr.sub_attr`` to be captured before
    ``my_attr`` exists; evaluated on call/str.
    """

    def __init__(self, resolver: "ConnectorResolver", attr_chain: tuple[str, ...]):
        self._resolver = resolver
        self._attr_chain = attr_chain

    def __getattr__(self, item: str) -> "DeferredResolution":
        if item.startswith("_"):
            raise AttributeError(item)
        return DeferredResolution(self._resolver, self._attr_chain + (item,))

    def evaluate(self) -> Any:
        obj: Any = self._resolver._named[self._attr_chain[0]]
        for attr in self._attr_chain[1:]:
            obj = getattr(obj, attr)
        return obj

    def __call__(self) -> Any:
        return self.evaluate()

    def __str__(self) -> str:
        return str(self.evaluate())


class ConnectorResolver:
    """Process-wide template/url resolution context.

    The scoped-context stack is deliberately PROCESS-global (guarded by a
    lock), not thread-local: ``ModelCollection.run`` and
    ``PartitionedModel`` execute models on worker threads, and a
    ``with connector_resolver.context(...)`` opened on the driver thread
    must be visible to them (matching the reference's global resolver,
    ``connect_resolve.py:273-342``).  Concurrent *independent* contexts
    in one process are not supported — same as the reference.
    """

    def __init__(self) -> None:
        self._lock = threading.RLock()
        self._shared_stack: list[dict[str, Any]] = []
        self._base_named: dict[str, Any] = {}
        self._base_secret: dict[str, Any] = {}
        self._base_unnamed: list[Callable[[str], str]] = []

    # -- scope stack -------------------------------------------------
    def _stack(self) -> list[dict[str, Any]]:
        return self._shared_stack

    @property
    def _named(self) -> dict[str, Any]:
        merged = dict(self._base_named)
        for frame in self._stack():
            merged.update(frame.get("named", {}))
        return merged

    @property
    def _secret(self) -> dict[str, Any]:
        merged = dict(self._base_secret)
        for frame in self._stack():
            merged.update(frame.get("secret", {}))
        return merged

    @property
    def _unnamed(self) -> list[Callable[[str], str]]:
        merged = list(self._base_unnamed)
        for frame in self._stack():
            merged.extend(frame.get("unnamed", []))
        return merged

    # -- registration ------------------------------------------------
    def add(self, *callables: Callable[[str], str], **named: Any) -> None:
        """Add unnamed resolver callables and/or named attributes globally."""
        for c in callables:
            if not callable(c):
                raise TypeError("positional resolver arguments must be callable")
            self._base_unnamed.append(c)
        for k, v in named.items():
            if k in self._base_named:
                raise ValueError(f"resolver attribute {k!r} already set")
            self._base_named[k] = v

    def add_secret(self, **named: Any) -> None:
        """Named values usable in urls but excluded from capture/locking."""
        self._base_secret.update(named)

    def context(self, *callables: Callable[[str], str], **named: Any):
        """Scoped overlay: ``with connector_resolver.context(env='prod'): ...``"""
        resolver = self

        class _Ctx:
            def __enter__(self_inner):
                resolver._stack().append(
                    {"named": dict(named), "unnamed": list(callables), "secret": {}}
                )
                return resolver

            def __exit__(self_inner, *exc):
                resolver._stack().pop()
                return False

        return _Ctx()

    def brutal_reset(self) -> None:
        """Drop every registered value/callable/secret (worker isolation)."""
        self._base_named.clear()
        self._base_secret.clear()
        self._base_unnamed.clear()
        self._shared_stack.clear()

    # -- attribute access --------------------------------------------
    def __getattr__(self, item: str) -> Any:
        if item.startswith("_"):
            raise AttributeError(item)
        named = self._named
        if item in named:
            return named[item]
        return DeferredResolution(self, (item,))

    # -- resolution --------------------------------------------------
    def resolve(self, engine_url: str, *, with_secrets: bool = True) -> str:
        """Substitute every ``{var}`` in *engine_url*; raise if any remain.

        Order mirrors the reference (``connect_resolve.py:159-195``):
        unnamed callables first (each may rewrite the whole url), then
        named attributes, then secrets.
        """
        url = engine_url
        for fn in self._unnamed:
            url = fn(url)
        mapping: dict[str, Any] = dict(self._named)
        if with_secrets:
            mapping.update(self._secret)

        leftover: list[str] = []

        def _sub(m: re.Match[str]) -> str:
            key = m.group(0)[1:-1]
            if key in mapping:
                value = mapping[key]
                if isinstance(value, DeferredResolution) or callable(value):
                    value = value()
                # Single-pass: substituted values are literal text, never
                # re-scanned for further {var} placeholders.
                return str(value)
            leftover.append(key)
            return m.group(0)

        url = _TEMPLATE_RE.sub(_sub, url)
        if leftover:
            raise UnresolvedUrlError(
                f"Unresolved engine_url variables {leftover} in {engine_url!r}"
            )
        return url

    def resolve_without_secrets(self, engine_url: str) -> str:
        """Best-effort resolution that leaves secret placeholders intact."""
        url = engine_url
        for fn in self._unnamed:
            url = fn(url)

        named = self._named

        def _sub(m: re.Match[str]) -> str:
            key = m.group(0)[1:-1]
            if key in named:
                value = named[key]
                if isinstance(value, DeferredResolution) or callable(value):
                    value = value()
                return str(value)
            return m.group(0)

        return _TEMPLATE_RE.sub(_sub, url)

    def capture_context(self) -> dict[str, Any]:
        """JSON-able snapshot of the non-secret context (for locking docs and
        shipping to workers — ``connect_resolve.py:241-271``)."""
        named = {}
        for k, v in self._named.items():
            if callable(v) and not isinstance(v, DeferredResolution):
                continue  # callables are not JSON-able; reference skips them too
            named[k] = v
        return {"mapper": named}

    def apply_context(self, captured: dict[str, Any]) -> None:
        """Inverse of :meth:`capture_context` (worker-side re-injection)."""
        for k, v in captured.get("mapper", {}).items():
            self._base_named[k] = v


#: process-wide singleton, mirroring ``ayeaye.connector_resolver``
connector_resolver = ConnectorResolver()
