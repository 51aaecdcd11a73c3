"""Property-based tests (hypothesis) for the pure-Python core —
engine_url round-trips, resolver substitution, Pinnate wrap/unwrap."""

import json
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from ayeaye_spark.core.engine_url import parse_engine_url
from ayeaye_spark.core.pinnate import Pinnate
from ayeaye_spark.core.resolver import ConnectorResolver

ident = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)
locator = st.text(
    alphabet=string.ascii_letters + string.digits + "/._-", min_size=1, max_size=30
)
opt_value = st.text(
    alphabet=string.ascii_letters + string.digits + "_-.@()", max_size=12
)


@settings(max_examples=200, deadline=None)
@given(
    engine_type=ident,
    modifiers=st.lists(ident, max_size=2),
    loc=locator,
    options=st.dictionaries(ident, opt_value, max_size=3),
)
def test_engine_url_roundtrip(engine_type, modifiers, loc, options):
    prefix = "+".join(modifiers)
    url = f"{prefix + '+' if prefix else ''}{engine_type}://{loc}"
    url += "".join(f";{k}={v}" for k, v in options.items())
    parsed = parse_engine_url(url)
    assert parsed.engine_type == engine_type
    assert parsed.modifiers == tuple(modifiers)
    assert parsed.locator == loc
    for k, v in options.items():
        assert parsed.option(k) == v
    # canonical form re-parses to the same structure
    again = parse_engine_url(str(parsed))
    assert again.engine_type == parsed.engine_type
    assert again.options == parsed.options


@settings(max_examples=100, deadline=None)
@given(values=st.dictionaries(ident, st.text(string.printable, max_size=20), min_size=1, max_size=4))
def test_resolver_substitutes_every_named_value(values):
    resolver = ConnectorResolver()
    resolver.add(**values)
    template = "x://" + "/".join("{" + k + "}" for k in values)
    resolved = resolver.resolve(template)
    assert resolved == "x://" + "/".join(str(v) for v in values.values())


json_scalars = st.one_of(st.none(), st.booleans(), st.integers(), st.text(max_size=10))
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(ident, children, max_size=3),
    ),
    max_leaves=10,
)


@settings(max_examples=200, deadline=None)
@given(payload=st.dictionaries(ident, json_values, max_size=4))
def test_pinnate_roundtrip(payload):
    p = Pinnate(payload)
    assert p.as_native() == payload
    assert json.loads(p.as_json()) == json.loads(json.dumps(payload, default=str))
    for k in payload:
        wrapped = getattr(p, k)
        if isinstance(wrapped, Pinnate):
            assert wrapped.as_native() == payload[k]
