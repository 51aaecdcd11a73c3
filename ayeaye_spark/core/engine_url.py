"""engine_url parsing: ``modifier+engine_type://path;key=value;key2=value2``.

Re-expresses the reference's URL addressing scheme (AyeAye
``lib/ayeaye/ignition.py:84-127`` and the ``modifier+type`` split in
``lib/ayeaye/connectors/__init__.py:109-138``) as a small, dependency-free
parser.  The grammar is shared by every connector:

    engine_url   := [modifier "+"]* engine_type "://" locator [";" option]*
    option       := key "=" value

Examples
--------
    csv:///data/x.csv;encoding=latin-1;start=3;end=100
    gz+ndjson:///logs/part-*.ndjson.gz
    s3+gz+csv://bucket/key.csv.gz
    kafka://localhost/topic;start=@(2019-05-15 08:00:00);end=@(earliest)

Unlike the reference, the parsed result maps onto ``spark.read`` /
``df.write`` options; modifiers like ``gz`` are usually no-ops for Spark
(codec auto-detection) but are preserved so connectors can react.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class EngineUrlError(ValueError):
    """Raised for malformed or unresolvable engine urls."""


# unresolved {placeholder} template variables
_TEMPLATE_RE = re.compile(r"\{([A-Za-z_][A-Za-z0-9_]*)\}")

# chars that mark a wildcard / glob pattern in the locator
_WILDCARD_CHARS = ("*", "?", "[")


@dataclass
class EngineUrl:
    """Structured view of an engine_url string."""

    raw: str
    engine_type: str
    modifiers: tuple[str, ...]
    locator: str
    options: dict[str, str] = field(default_factory=dict)

    @property
    def has_wildcard(self) -> bool:
        return any(c in self.locator for c in _WILDCARD_CHARS)

    @property
    def is_template(self) -> bool:
        return bool(_TEMPLATE_RE.search(self.raw))

    def template_variables(self) -> list[str]:
        return _TEMPLATE_RE.findall(self.raw)

    def option(self, key: str, default: str | None = None) -> str | None:
        return self.options.get(key, default)

    def bool_option(self, key: str, default: bool = False) -> bool:
        v = self.options.get(key)
        if v is None:
            return default
        return v.strip().lower() in ("1", "true", "yes", "on", "")

    def int_option(self, key: str, default: int | None = None) -> int | None:
        v = self.options.get(key)
        if v is None:
            return default
        try:
            return int(v)
        except ValueError as e:
            raise EngineUrlError(f"option {key}={v!r} is not an integer in {self.raw!r}") from e

    def without_options(self) -> str:
        prefix = "+".join(self.modifiers)
        prefix = prefix + "+" if prefix else ""
        return f"{prefix}{self.engine_type}://{self.locator}"

    def __str__(self) -> str:  # round-trips the canonical form
        parts = [self.without_options()]
        parts.extend(f"{k}={v}" for k, v in self.options.items())
        return ";".join(parts)


def split_engine_type(engine_url: str) -> tuple[tuple[str, ...], str]:
    """Return ``(modifiers, engine_type)`` for a url or bare type string."""
    if "://" not in engine_url:
        raise EngineUrlError(f"engine_url missing '://': {engine_url!r}")
    scheme = engine_url.split("://", 1)[0]
    if not scheme:
        raise EngineUrlError(f"engine_url missing engine_type: {engine_url!r}")
    *modifiers, engine_type = scheme.split("+")
    return tuple(modifiers), engine_type


def parse_engine_url(engine_url: str) -> EngineUrl:
    """Parse ``modifier+type://locator;k=v;...`` into an :class:`EngineUrl`.

    ``;`` splits options from the locator.  Values may contain ``=`` (only
    the first is the separator) and the kafka-style ``@(...)`` form is kept
    verbatim.  A bare flag option (``;header``) maps to the empty string.
    """
    modifiers, engine_type = split_engine_type(engine_url)
    rest = engine_url.split("://", 1)[1]
    pieces = rest.split(";")
    locator = pieces[0]
    options: dict[str, str] = {}
    for piece in pieces[1:]:
        if not piece:
            continue
        if "=" in piece:
            k, v = piece.split("=", 1)
            options[k.strip()] = v
        else:
            options[piece.strip()] = ""
    return EngineUrl(
        raw=engine_url,
        engine_type=engine_type.lower(),
        modifiers=tuple(m.lower() for m in modifiers),
        locator=locator,
        options=options,
    )
