"""Property-based tests (hypothesis) for the pure compilation layers:
dialect rewriting, template parsing, driver-side rendering, interval
parsing. No SparkSession needed — these run fast and fuzz the corners
the golden tests miss."""

import json
import string

from hypothesis import given, settings
from hypothesis import strategies as st

# first-example latency (lazy imports) can trip the default 200ms deadline
settings.register_profile("repo", deadline=None)
settings.load_profile("repo")

from alerta_spark.dialect import trino_to_spark
from alerta_spark.rules import merge, parse_timedelta
from alerta_spark.templates import render_py, template_parts

ident = st.text(string.ascii_lowercase + "_", min_size=1, max_size=8)


@given(st.text(alphabet=string.printable, max_size=200))
@settings(max_examples=200)
def test_dialect_idempotent(sql):
    """Rewriting twice == rewriting once (no cascading renames)."""
    once = trino_to_spark(sql)
    assert trino_to_spark(once) == once


@given(st.lists(st.tuples(ident, st.booleans()), max_size=5))
def test_dialect_preserves_literal_payloads(parts):
    """Anything inside single-quoted literals survives verbatim."""
    lits = ["'json_extract_scalar(x)'", "'position'", "'CAST'"]
    sql = " AND ".join(f"{name} = {lits[i % 3]}" for i, (name, _) in enumerate(parts))
    out = trino_to_spark(sql)
    for lit in set(lits[: max(1, len(parts))]):
        if lit in sql:
            assert lit in out


@given(
    st.dictionaries(
        ident,
        st.one_of(st.integers(), st.text(max_size=10), st.none()),
        max_size=5,
    ),
    st.lists(ident, min_size=1, max_size=3),
)
@settings(max_examples=200)
def test_render_py_never_raises(ctx, path):
    """Silent-miss semantics: any context + any path renders without
    raising, and a missing path renders empty."""
    tmpl = "x={{" + ".".join(path) + "}}!"
    out = render_py(tmpl, ctx)
    assert out.startswith("x=") and out.endswith("!")


@given(st.text(max_size=100))
@settings(max_examples=200)
def test_template_parts_roundtrip_literals(text):
    """A template with no {{}} tokens is one literal that renders as
    itself."""
    if "{{" in text or "}}" in text:
        return
    parts = template_parts(text)
    assert all(k == "lit" for k, _ in parts)
    assert render_py(text, {}) == text


@given(
    st.integers(min_value=1, max_value=10_000),
    st.sampled_from(["seconds", "minutes", "hours", "days", "weeks"]),
)
def test_parse_timedelta_units(n, unit):
    td = parse_timedelta(f"{n} {unit}")
    secs = {"seconds": 1, "minutes": 60, "hours": 3600, "days": 86400, "weeks": 604800}
    assert td.total_seconds() == n * secs[unit]


@given(
    st.dictionaries(ident, st.integers(), max_size=4),
    st.dictionaries(ident, st.integers(), max_size=4),
)
@settings(max_examples=200)
def test_merge_overrides_win(a, b):
    out = merge(a, b)
    for k, v in a.items():
        assert out[k] == v
    for k, v in b.items():
        if k not in a:
            assert out[k] == v


@given(st.dictionaries(ident, st.one_of(st.integers(), st.text(max_size=5)), max_size=4))
@settings(max_examples=100)
def test_render_py_json_string_payload(d):
    """JSON-string payloads resolve mid-path like the engine's
    client-side decode (alerta.py:352)."""
    ctx = {"details": json.dumps(d)}
    for k, v in d.items():
        assert render_py("{{details." + k + "}}", ctx) == str(v)
