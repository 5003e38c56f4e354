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


# ---- deterministic sampling invariants (ops/sampling.py) ----------------
# Pure-python mirror of the md5-band logic so hypothesis can sweep
# thousands of (key, weights) cases without a Spark job per example.


def _py_bucket(key, salt=""):
    import hashlib

    return hashlib.md5((str(key) + salt).encode()).hexdigest()[:8]


@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=50, unique=True),
    st.lists(st.floats(min_value=0.01, max_value=10.0, allow_nan=False), min_size=1, max_size=5),
)
@settings(max_examples=200)
def test_hash_split_partition_invariants(keys, raw_weights):
    """For ANY weights and keys: thresholds are monotonically
    non-decreasing, every key lands in exactly one split, and the
    assignment depends only on (key, cumulative weights)."""
    from alerta_spark.ops.sampling import _SPACE, _threshold

    total = sum(raw_weights)
    cum, thresholds = 0.0, []
    for w in raw_weights[:-1]:
        cum += w / total
        thresholds.append(_threshold(cum))
    assert thresholds == sorted(thresholds)  # monotone bands

    def assign(key):
        b = _py_bucket(key)
        for i, t in enumerate(thresholds):
            if b < t:
                return i
        return len(raw_weights) - 1

    first = {k: assign(k) for k in keys}
    assert all(0 <= v < len(raw_weights) for v in first.values())
    # stable: a second pass agrees (pure function of the key)
    assert {k: assign(k) for k in keys} == first


@given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
@settings(max_examples=300)
def test_threshold_lexical_order_matches_numeric(fraction):
    """The hex threshold must compare lexically the way the fraction
    compares numerically — incl. the 1.0 sentinel ('g' > any hex)."""
    from alerta_spark.ops.sampling import _SPACE, _threshold

    t = _threshold(fraction)
    assert _py_bucket(12345) < t or fraction < 1.0
    if fraction < 1.0:
        assert len(t) == 8 and int(t, 16) == int(fraction * _SPACE)
    else:
        assert t == "g"


def test_skyline_is_exactly_the_nondominated_set(spark):
    """Independent checker (not the SQL oracle): on seeded random
    data with heavy ties, the skyline operator's output must equal
    the brute-force non-dominated set, computed in Python."""
    import random

    from alerta_spark.plans.catalog import queries
    from alerta_spark.sources.lake import load_table  # noqa: F401

    rng = random.Random(20260814)
    rows = [
        (i, rng.choice(["a", "b"]), float(rng.randint(0, 8)), rng.randint(0, 8))
        for i in range(120)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double, t_us long"
    )
    # reuse the operator body via the catalog function's plan shape:
    # distinct-value aggregate + running max + rejoin
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    g = df.groupBy("event_type", "value").agg(F.max("t_us").alias("_vmax"))
    w = (
        W.partitionBy("event_type")
        .orderBy(F.desc("value"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    sky_vals = (
        g.withColumn("_bh", F.max("_vmax").over(w))
        .where(F.col("_bh").isNull() | (F.col("_vmax") > F.col("_bh")))
        .select("event_type", "value", "_vmax")
    )
    got = {
        r.event_id
        for r in df.join(sky_vals, ["event_type", "value"])
        .where(F.col("t_us") == F.col("_vmax"))
        .collect()
    }

    expect = set()
    for i, et, v, t in rows:
        dominated = any(
            oet == et and ov >= v and ot >= t and (ov > v or ot > t)
            for _, oet, ov, ot in rows
        )
        if not dominated:
            expect.add(i)
    assert got == expect


def test_funnel_deadline_monotone_in_window(spark):
    """Widening the conversion window can only ADD converters; the
    unconstrained funnel is the upper bound."""
    import datetime as dt
    import random

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from alerta_spark.ops.sessions import funnel_counts

    rng = random.Random(7)
    base = dt.datetime(2026, 1, 1)
    rows = []
    for u in range(60):
        for _ in range(rng.randint(1, 6)):
            rows.append(
                Row(
                    event_id=len(rows),
                    user_id=u,
                    event_type=rng.choice(["signup", "view", "noise"]),
                    ts=base + dt.timedelta(minutes=rng.randint(0, 120)),
                )
            )
    ev = spark.createDataFrame(rows)
    steps = [
        ("signup", F.col("event_type") == "signup"),
        ("view", F.col("event_type") == "view"),
    ]

    def conv(within):
        got = {
            r.step: r.n_users
            for r in funnel_counts(ev, steps, within_minutes=within).collect()
        }
        return got["view"]

    c5, c30, c120 = conv(5), conv(30), conv(120)
    free = {
        r.step: r.n_users for r in funnel_counts(ev, steps).collect()
    }["view"]
    assert c5 <= c30 <= c120 <= free


def test_jsd_symmetry_and_bounds(spark):
    """JSD(P,Q) == JSD(Q,P) (same quantization both directions up to
    the per-term floor), and 0 <= jsd <= ln 2 on arbitrary corpora."""
    import math

    from alerta_spark.ops.dedupe import release_cached
    from alerta_spark.ops.text import token_js_divergence

    a = spark.createDataFrame(
        [(1, "x y z z q"), (2, "r s x")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(3, "x x w"), (4, "z w w t")], "doc_id long, text string"
    )
    ab = token_js_divergence(a, b).collect()[0]
    ba = token_js_divergence(b, a).collect()[0]
    release_cached()
    assert abs(ab.jsd - ba.jsd) < 1e-7
    assert -1e-12 <= ab.jsd <= math.log(2.0) + 1e-12
    assert (ab.n_terms_a, ab.n_terms_b) == (ba.n_terms_b, ba.n_terms_a)


@given(
    st.lists(
        st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
        min_size=64,
        max_size=64,
    ),
    st.integers(min_value=0, max_value=71),
)
@settings(max_examples=300)
def test_portable_lsh_sign_bits_numpy_equals_exact_ints(vec, plane):
    """The exactness argument behind the Arrow-batched integer LSH
    bucketing, fuzzed: floor(x_float64 * 1e6) components times integer
    hyperplane weights summed by float64 BLAS must equal EXACT Python
    integer arithmetic — every product < 2^53 so no accumulation can
    round, hence identical sign bits on any input in range."""
    import math

    import numpy as np

    from alerta_spark.ops.similarity import _int_hyperplane

    w = _int_hyperplane(64, plane)
    q_exact = [int(math.floor(x * 1_000_000.0)) for x in vec]
    dot_exact = sum(q * wi for q, wi in zip(q_exact, w))

    Q = np.floor(np.asarray(vec, dtype=np.float64) * 1_000_000.0)
    dot_np = float(Q @ np.asarray(w, dtype=np.float64))
    assert dot_np == float(dot_exact)
    assert (dot_np > 0) == (dot_exact > 0)


def test_parse_timedelta_abbreviated_plurals_and_strictness():
    """pd.Timedelta (the reference's parser) accepts '90 mins'/'30
    secs'/'2 hrs' and REJECTS unknown units even when mixed with known
    ones — '2 days 1 month' silently becoming 2 days would expire
    sequence state far earlier than configured."""
    import pytest

    assert parse_timedelta("90 mins").total_seconds() == 5400
    assert parse_timedelta("30 secs").total_seconds() == 30
    assert parse_timedelta("2 hrs").total_seconds() == 7200
    assert parse_timedelta("1 day, 2 hours").total_seconds() == 93600
    # trailing non-letter punctuation is tolerated (it lands in the
    # residue where only \w raises) — '3 days)' from a parenthesized
    # rule note, '1h;' from a config list
    assert parse_timedelta("3 days)").total_seconds() == 259200
    assert parse_timedelta("1h;").total_seconds() == 3600
    assert parse_timedelta("(30 min)").total_seconds() == 1800
    # ...but SIGN characters are not tolerated punctuation:
    # pd.Timedelta raises on interior signs ("only leading negative
    # signs are allowed"), and silently SUMMING '1h-30m' to 1:30:00
    # would expire state later than the author intended; a leading
    # sign raises too (a lifespan is a positive duration)
    for bad in ("1h-30m", "2 days - 1 hour", "-30m", "+1h"):
        with pytest.raises(ValueError):
            parse_timedelta(bad)
    # ...and INTERIOR punctuation between components is not tolerated
    # either (ADVICE r9): pd.Timedelta only separates components with
    # whitespace/commas, so these must raise, not silently sum
    for bad in ("1h;30m", "3 days) 1 hour", "1h.30m", "(1h) (30m)"):
        with pytest.raises(ValueError):
            parse_timedelta(bad)
    with pytest.raises(ValueError):
        parse_timedelta("2 days 1 month")
    with pytest.raises(ValueError):
        parse_timedelta("1 fortnight")


def test_parse_timedelta_compact_forms():
    """pd.Timedelta accepts compact multi-unit strings ('1h30m',
    '1d12h') with no separator between units; the unit-boundary
    lookahead must treat a following digit as a new term, while a
    following LETTER still pushes the token to the residue ('1mo'
    must raise, not parse as 1 minute)."""
    import pytest

    assert parse_timedelta("1h30m").total_seconds() == 5400
    assert parse_timedelta("1d12h").total_seconds() == 129600
    assert parse_timedelta("2w3d").total_seconds() == 2 * 604800 + 3 * 86400
    with pytest.raises(ValueError):
        parse_timedelta("1mo")
    with pytest.raises(ValueError):
        parse_timedelta("1h30x")
