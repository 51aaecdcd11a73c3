"""Driver-side document shim: dict/attribute-access wrapper for manifests.

The reference's universal record type ``Pinnate`` (AyeAye
``lib/ayeaye/pinnate.py:4-308``) wraps JSON-ish payloads with recursive
attribute access.  In the Spark engine, *table* data is DataFrames — this
class survives only for small driver-side documents (manifests, summary
JSON sinks, config), per SURVEY §4.2(5).
"""

from __future__ import annotations

import json
from typing import Any, Iterator


class Pinnate:
    """Attribute + key access over a dict/list/set payload.

    >>> p = Pinnate({"a": {"b": 1}, "xs": [{"y": 2}]})
    >>> p.a.b, p["a"]["b"], p.xs[0].y
    (1, 1, 2)
    """

    def __init__(self, data: Any = None):
        if data is None:
            data = {}
        object.__setattr__(self, "_data", data)

    # -- views --------------------------------------------------------
    def as_dict(self, *fields: str) -> Any:
        """Native payload; optionally projected to *fields* (dict payloads)."""
        d = self.as_native()
        if fields:
            if not isinstance(d, dict):
                raise TypeError("field projection requires a dict payload")
            return {k: d[k] for k in fields if k in d}
        return d

    def as_native(self) -> Any:
        def _unwrap(v: Any) -> Any:
            if isinstance(v, Pinnate):
                return _unwrap(object.__getattribute__(v, "_data"))
            if isinstance(v, dict):
                return {k: _unwrap(x) for k, x in v.items()}
            if isinstance(v, list):
                return [_unwrap(x) for x in v]
            if isinstance(v, set):
                return {_unwrap(x) for x in v}
            return v

        return _unwrap(object.__getattribute__(self, "_data"))

    def as_json(self, **json_kwargs: Any) -> str:
        payload = self.as_native()
        if isinstance(payload, set):
            payload = sorted(payload, key=str)
        return json.dumps(payload, default=str, **json_kwargs)

    # -- access -------------------------------------------------------
    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, (dict,)):
            return Pinnate(value)
        if isinstance(value, list):
            return [Pinnate._wrap(v) for v in value]
        return value

    def __getattr__(self, item: str) -> Any:
        data = object.__getattribute__(self, "_data")
        if isinstance(data, dict) and item in data:
            return Pinnate._wrap(data[item])
        raise AttributeError(item)

    def __setattr__(self, key: str, value: Any) -> None:
        data = object.__getattribute__(self, "_data")
        if not isinstance(data, dict):
            raise TypeError("attribute assignment requires a dict payload")
        data[key] = value

    def __getitem__(self, key: Any) -> Any:
        return Pinnate._wrap(object.__getattribute__(self, "_data")[key])

    def __setitem__(self, key: Any, value: Any) -> None:
        object.__getattribute__(self, "_data")[key] = value

    def __contains__(self, key: Any) -> bool:
        data = object.__getattribute__(self, "_data")
        return key in data

    def __iter__(self) -> Iterator[Any]:
        data = object.__getattribute__(self, "_data")
        if isinstance(data, dict):
            return iter(data)
        return (Pinnate._wrap(v) for v in data)

    def __len__(self) -> int:
        return len(object.__getattribute__(self, "_data"))

    def keys(self):
        return object.__getattribute__(self, "_data").keys()

    def items(self):
        return ((k, Pinnate._wrap(v)) for k, v in object.__getattribute__(self, "_data").items())

    def update(self, other: "Pinnate | dict") -> None:
        payload = other.as_native() if isinstance(other, Pinnate) else other
        object.__getattribute__(self, "_data").update(payload)

    def merge(self, other: "Pinnate | dict") -> "Pinnate":
        merged = self.as_native()
        payload = other.as_native() if isinstance(other, Pinnate) else other
        merged.update(payload)
        return Pinnate(merged)

    def __eq__(self, other: Any) -> bool:
        if isinstance(other, Pinnate):
            return self.as_native() == other.as_native()
        return self.as_native() == other

    def __repr__(self) -> str:
        return f"Pinnate({object.__getattribute__(self, '_data')!r})"

    # -- pickling ------------------------------------------------------
    def __getstate__(self) -> Any:
        return object.__getattribute__(self, "_data")

    def __setstate__(self, state: Any) -> None:
        object.__setattr__(self, "_data", state)
