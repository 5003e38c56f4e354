import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from alerta_spark.dialect import trino_to_spark


def test_json_extract_scalar_rewrite():
    assert (
        trino_to_spark("json_extract_scalar(details,'$.eventname') = 'ConsoleLogin'")
        == "get_json_object(details,'$.eventname') = 'ConsoleLogin'"
    )


def test_rewrite_skips_string_literals():
    crit = "x = 'json_extract_scalar(a)' AND json_extract_scalar(b,'$.c')=1"
    out = trino_to_spark(crit)
    assert out.startswith("x = 'json_extract_scalar(a)'")
    assert "get_json_object(b,'$.c')=1" in out


def test_case_insensitive():
    assert trino_to_spark("JSON_EXTRACT_SCALAR(d,'$.x')") == "get_json_object(d,'$.x')"


def test_cast_and_position_pass_through():
    crit = (
        "CAST(json_extract_scalar(details,'$.risk_score') as INTEGER)>80 "
        "AND position('Defaulted' IN json_extract_scalar(details,'$.risk_reasons'))=0"
    )
    out = trino_to_spark(crit)
    assert "CAST(get_json_object(details,'$.risk_score') as INTEGER)>80" in out
    assert "position('Defaulted' IN get_json_object(details,'$.risk_reasons'))=0" in out


def test_escaped_quote_in_literal():
    crit = "name = 'O''json_extract_scalar' AND json_extract_scalar(d,'$.x')='1'"
    out = trino_to_spark(crit)
    assert "'O''json_extract_scalar'" in out
    assert "get_json_object(d,'$.x')='1'" in out


def test_call_rewrites_url_and_date_functions():
    assert (
        trino_to_spark("url_extract_host(json_extract_scalar(d,'$.url')) = 'evil.example'")
        == "parse_url(get_json_object(d,'$.url'), 'HOST') = 'evil.example'"
    )
    assert trino_to_spark("date_diff('hour', ts, now()) < 2") == (
        "timestampdiff(hour, ts, now()) < 2"
    )
    assert trino_to_spark("date_add('day', 7, ts) > now()") == (
        "timestampadd(day, 7, ts) > now()"
    )
    # nested rewrites resolve
    assert trino_to_spark("date_diff('hour', ts, date_add('day', 1, ts)) > 0") == (
        "timestampdiff(hour, ts, timestampadd(day, 1, ts)) > 0"
    )
    # literals are never rewritten
    assert trino_to_spark("x = 'date_diff(''h'', a, b)'") == "x = 'date_diff(''h'', a, b)'"


def test_wider_renames():
    assert trino_to_spark("contains(tags, 'prod')") == "array_contains(tags, 'prod')"
    assert trino_to_spark("strpos(s,'a') > 0") == "instr(s,'a') > 0"
    assert trino_to_spark("approx_distinct(x) > 5") == "approx_count_distinct(x) > 5"
    assert trino_to_spark("starts_with(s,'p')") == "startswith(s,'p')"


def test_rewritten_criteria_evaluate_in_spark(spark):
    """The rewritten fragments must be valid, correct Spark SQL."""
    df = spark.createDataFrame(
        [
            {
                "url": "https://evil.example/p?id=7",
                "tags": ["prod", "web"],
                "ts": "2026-01-01 00:00:00",
            }
        ]
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["to_timestamp"]).to_timestamp("ts"))
    df.createOrReplaceTempView("dialect_t")
    sql = trino_to_spark(
        "url_extract_host(url) = 'evil.example'"
        " AND contains(tags, 'prod')"
        " AND date_diff('hour', ts, date_add('day', 1, ts)) = 24"
    )
    assert spark.sql(f"SELECT count(*) c FROM dialect_t WHERE {sql}").first()["c"] == 1


def test_alias_renames_only_call_sites():
    from alerta_spark.dialect import trino_to_spark

    # a bare column named like an aliased function must pass through
    assert trino_to_spark("contains = 'x'") == "contains = 'x'"
    assert (
        trino_to_spark("details.contains = 'y'") == "details.contains = 'y'"
    )
    # real call sites still rewrite (whitespace before '(' allowed)
    assert trino_to_spark("contains(tags, 'x')") == "array_contains(tags, 'x')"
    assert trino_to_spark("contains (tags, 'x')") == "array_contains (tags, 'x')"


def test_to_unixtime_keeps_fractional_seconds(spark):
    """Trino to_unixtime returns DOUBLE epoch seconds; a rename to
    unix_timestamp (BIGINT) silently truncated sub-second arithmetic."""
    from pyspark.sql import functions as F

    from alerta_spark.dialect import trino_to_spark

    sql = trino_to_spark("to_unixtime(b) - to_unixtime(a) > 0.5")
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00.100", "2024-01-01 00:00:00.800")],
        "a string, b string",
    ).select(
        F.col("a").cast("timestamp").alias("a"),
        F.col("b").cast("timestamp").alias("b"),
    )
    assert df.where(sql).count() == 1
    sql2 = trino_to_spark("to_unixtime(b) - to_unixtime(a) > 0.9")
    assert df.where(sql2).count() == 0


def test_unsupported_constructs_raise_named_errors():
    """TRY(...), AT TIME ZONE, and ROW/MAP constructors have no
    token-rewrite translation; the shim must name the construct and
    the Spark alternative instead of leaking Spark's raw
    ParseException (which tells a rule author nothing)."""
    import pytest

    from alerta_spark.dialect import trino_to_spark

    with pytest.raises(ValueError, match=r"TRY\(expr\).*try_cast"):
        trino_to_spark("TRY(CAST(x AS INTEGER)) > 1")
    with pytest.raises(ValueError, match="AT TIME ZONE.*from_utc_timestamp"):
        trino_to_spark("ts AT TIME ZONE 'UTC' > TIMESTAMP '2024-01-01'")
    with pytest.raises(ValueError, match=r"ROW\(.*struct"):
        trino_to_spark("ROW(a, b) = ROW(1, 2)")
    with pytest.raises(ValueError, match="MAP\\(ARRAY.*map_from_arrays"):
        trino_to_spark("cardinality(MAP(ARRAY['k'], ARRAY[v])) > 0")
    # ...but the construct names stay DATA inside string literals, and
    # ordinary identifiers that merely contain the words pass through
    assert (
        trino_to_spark("note = 'use TRY( and AT TIME ZONE here'")
        == "note = 'use TRY( and AT TIME ZONE here'"
    )
    assert trino_to_spark("retry_count > 0") == "retry_count > 0"
    assert trino_to_spark("map(k, v)['k'] = 1") == "map(k, v)['k'] = 1"


def test_array_bracket_literals_rewrite(spark):
    """Trino's ARRAY['a','b'] bracket literals rewrite to Spark's
    array('a','b') — bracket-matched, nested, string-literal aware —
    and actually evaluate."""
    from pyspark.sql import functions as F

    from alerta_spark.dialect import trino_to_spark

    assert (
        trino_to_spark("contains(ARRAY['a','b'], source)")
        == "array_contains(array('a','b'), source)"
    )
    # nested literals; subscripts inside elements balance their own
    # brackets
    assert (
        trino_to_spark("cardinality(ARRAY[ARRAY[1,2], ARRAY[3]]) > 1")
        == "cardinality(array(array(1,2), array(3))) > 1"
    )
    # 'ARRAY[' inside a string stays data; a subscripted column is not
    # an array literal
    assert (
        trino_to_spark("note = 'use ARRAY[1] here'")
        == "note = 'use ARRAY[1] here'"
    )
    assert trino_to_spark("tags[1] = 'x'") == "tags[1] = 'x'"
    # the rewritten predicate runs end-to-end
    df = spark.createDataFrame([("onelogin",), ("gsuite",)], "source string")
    got = df.where(
        F.expr(trino_to_spark("contains(ARRAY['onelogin','okta'], source)"))
    ).collect()
    assert [r["source"] for r in got] == ["onelogin"]
    # MAP(ARRAY...) is still rejected AFTER the bracket rewrite
    import pytest

    with pytest.raises(ValueError, match="map_from_arrays"):
        trino_to_spark("cardinality(MAP(ARRAY['k'], ARRAY[1])) > 0")


def test_array_literal_subscript_is_one_based(spark):
    """Trino subscripts are 1-based; a subscript directly on a bracket
    array literal must become element_at (1-based in Spark) — a plain
    Spark [] access is 0-based and would silently shift every element
    access by one."""
    from pyspark.sql import functions as F

    from alerta_spark.dialect import trino_to_spark

    sql = trino_to_spark("ARRAY['a','b'][1] = 'a'")
    assert sql == "element_at(array('a','b'), 1) = 'a'"
    df = spark.range(1)
    assert df.where(F.expr(sql)).count() == 1  # Trino: [1] is 'a'
    # chained subscripts nest: each directly-chained [i] is 1-based in
    # Trino, so each becomes its own element_at — a raw [] tail would
    # silently 0-shift (ARRAY[ARRAY[1,2]][1][1] is 1 in Trino, and a
    # raw [1] tail would have returned 2)
    sql2 = trino_to_spark("ARRAY[ARRAY[1,2]][1][1] = 1")
    assert sql2 == "element_at(element_at(array(array(1,2)), 1), 1) = 1"
    assert df.where(F.expr(sql2)).count() == 1
    sql3 = trino_to_spark("ARRAY[ARRAY[1,2]][1][2] = 2")
    assert df.where(F.expr(sql3)).count() == 1


def test_datetime_family_rewrites(spark):
    """Trino datetime surface: date_parse (MySQL %-format translated to
    a Java pattern, literal letters quoted), from_iso8601_*, and the
    ISO day_of_week numbering (Trino 1=Monday; Spark's dayofweek
    1=Sunday — a pure rename would shift every weekday criteria)."""
    import pytest

    from pyspark.sql import functions as F

    from alerta_spark.dialect import trino_to_spark

    assert (
        trino_to_spark("date_parse(s, '%Y-%m-%d %H:%i:%s')")
        == "to_timestamp(s, 'yyyy-MM-dd HH:mm:ss')"
    )
    # literal 'T' between specifiers must be pattern-quoted AND
    # SQL-escaped
    assert (
        trino_to_spark("date_parse(s, '%Y-%m-%dT%H:%i:%s')")
        == "to_timestamp(s, 'yyyy-MM-dd''T''HH:mm:ss')"
    )
    with pytest.raises(ValueError, match="unsupported date_parse specifier"):
        trino_to_spark("date_parse(s, '%Q')")
    with pytest.raises(ValueError, match="string-literal format"):
        trino_to_spark("date_parse(s, fmt_col)")

    df = spark.createDataFrame(
        [("2024-06-05T13:07:09",)], "s string"  # a Wednesday
    )
    row = df.select(
        F.expr(trino_to_spark("date_parse(s, '%Y-%m-%dT%H:%i:%s')")).alias("t"),
        F.expr(
            trino_to_spark("day_of_week(from_iso8601_timestamp(s))")
        ).alias("dow"),
        F.expr(trino_to_spark("day_of_year(from_iso8601_date('2024-02-01'))")).alias(
            "doy"
        ),
        F.expr(trino_to_spark("week(from_iso8601_date('2024-01-04'))")).alias(
            "wk"
        ),
    ).collect()[0]
    assert str(row["t"]) == "2024-06-05 13:07:09"
    assert row["dow"] == 3  # ISO: Wednesday = 3 (Spark dayofweek says 4)
    assert row["doy"] == 32
    assert row["wk"] == 1  # ISO week 1 contains Jan 4


def test_date_parse_format_corpus(spark):
    """MySQL-specifier corpus across the supported table: 12-hour
    clock, basic (separator-free) dates, day-of-year, 2-digit year,
    non-padded day — each parsed by Spark through the translated
    pattern to the expected instant."""
    from pyspark.sql import functions as F

    from alerta_spark.dialect import trino_to_spark

    cases = [
        ("05/06/2024 13:07", "%d/%m/%Y %H:%i", "2024-06-05 13:07:00"),
        ("20240605", "%Y%m%d", "2024-06-05 00:00:00"),
        ("01:07 PM", "%h:%i %p", "1970-01-01 13:07:00"),
        ("2024-6-5", "%Y-%c-%e", "2024-06-05 00:00:00"),
        ("2024 032", "%Y %j", "2024-02-01 00:00:00"),
        # multi-letter literal runs coalesce into ONE quoted span
        ("2024 at 13", "%Y at %H", "2024-01-01 13:00:00"),
        # Java-reserved punctuation ([, ], #) rides inside quoted spans
        ("[2024]#06", "[%Y]#%m", "2024-06-01 00:00:00"),
    ]
    df = spark.range(1)
    for value, fmt, expect in cases:
        sql = trino_to_spark(f"date_parse('{value}', '{fmt}')")
        got = df.select(F.expr(sql).alias("t")).collect()[0]["t"]
        assert str(got) == expect, (fmt, sql, got)


def test_date_parse_rejects_divergent_and_banned_specifiers():
    """Specifiers Spark cannot parse faithfully must raise the guided
    translation-time error, never reach the runtime parser or shift
    silently: %y (century resolution differs between MySQL and Java),
    %W/%a (Java 'E' banned for parsing), %v (week-based banned) — and
    a composite 'literal' like '%Y' || '-%m' is an expression, not a
    format."""
    import pytest

    from alerta_spark.dialect import trino_to_spark

    for fmt, why in (
        ("%y-%m-%d", "y"),
        ("%W, %d %M %Y", "W"),
        ("%a %d", "a"),
        ("%v", "v"),
    ):
        with pytest.raises(ValueError, match=f"%{why}"):
            trino_to_spark(f"date_parse(s, '{fmt}')")
    with pytest.raises(ValueError, match="single string-literal"):
        trino_to_spark("date_parse(s, '%Y' || '-%m')")


# MySQL specifier -> the DuckDB strftime specifier that RENDERS the
# identical text (DuckDB strftime is C-style: %M is minute there and
# month NAME in MySQL; %-d/%-m/%-H/%-I are DuckDB's no-pad modifiers
# for MySQL's %e/%c/%k/%l).
_MYSQL_TO_DUCKDB = {
    "%Y": "%Y", "%m": "%m", "%c": "%-m", "%d": "%d", "%e": "%-d",
    "%H": "%H", "%k": "%-H", "%h": "%I", "%l": "%-I", "%i": "%M",
    "%s": "%S", "%S": "%S", "%f": "%f", "%p": "%p", "%j": "%j",
    "%T": "%H:%M:%S", "%M": "%B", "%b": "%b",
}

_DATE_BLOCKS = [
    "%Y-%m-%d", "%Y/%c/%e", "%Y%m%d", "%d.%m.%Y",
    "%Y %j", "%e %b %Y", "%e %M %Y",
]
_TIME_BLOCKS = [
    "%H:%i:%s", "%T", "%k:%i:%s",
    "%h:%i:%s %p", "%l:%i:%s %p", "%H:%i:%s.%f",
]
_SEPS = [" ", "T", " at ", ", "]


@settings(max_examples=40, deadline=None)
@given(
    ts=st.datetimes(
        min_value=datetime.datetime(1905, 1, 1),
        max_value=datetime.datetime(2261, 12, 31),
    ),
    d_i=st.integers(0, len(_DATE_BLOCKS) - 1),
    t_i=st.integers(0, len(_TIME_BLOCKS) - 1),
    s_i=st.integers(0, len(_SEPS) - 1),
)
def test_date_parse_roundtrip_property(spark, ts, d_i, t_i, s_i):
    """Round-trip property for the supported specifier table: any
    timestamp DuckDB strftime-renders with a fully-determining MySQL
    format must parse back to the same instant through the translated
    Java pattern — covering %f six-digit fractions, %k/%l unpadded
    hours, %j day-of-year with %Y, 12-hour %h/%l with %p, month names,
    and coalesced literal separators, at every hour/day padding edge
    hypothesis finds."""
    import duckdb

    from pyspark.sql import functions as F

    import re

    mysql_fmt = _DATE_BLOCKS[d_i] + _SEPS[s_i] + _TIME_BLOCKS[t_i]
    # single-pass token substitution: sequential str.replace corrupts
    # itself (%i -> %M, which a later pass rewrites to %B month name)
    duck_fmt = re.sub(
        r"%.", lambda m: _MYSQL_TO_DUCKDB[m.group(0)], mysql_fmt
    )
    expect = ts if "%f" in mysql_fmt else ts.replace(microsecond=0)
    rendered = duckdb.sql(
        "SELECT strftime(?::TIMESTAMP, ?)", params=[expect, duck_fmt]
    ).fetchone()[0]
    sql = trino_to_spark(f"date_parse('{rendered}', '{mysql_fmt}')")
    got = spark.range(1).select(F.expr(sql).alias("t")).collect()[0]["t"]
    assert got == expect, (mysql_fmt, rendered, sql, got)


# --- property: the ARRAY-literal bracket/subscript rewriter
# (dialect.py hand-rolled parser) vs a Python evaluation of the Trino
# semantics. Elements are strings carrying the parser's worst enemies
# ('[', ']', quotes, commas, 'ARRAY[' itself) or nested arrays;
# chained subscripts are 1-based end to end.

_SUB_STRS = [
    "a", "a[b", "x]", "[", "]]", "O'neil", "1,2", "ARRAY[1]", "",
    "a][b", "']'", " [2] ",
]


def _gen_array(data, depth: int):
    """(trino_sql, python_value) for a depth-`depth` homogeneous
    nested array literal."""
    if depth == 0:
        s = data.draw(st.sampled_from(_SUB_STRS), label="leaf")
        return "'" + s.replace("'", "''") + "'", s
    n = data.draw(st.integers(min_value=1, max_value=3), label=f"n@{depth}")
    items = [_gen_array(data, depth - 1) for _ in range(n)]
    return (
        "ARRAY[" + ",".join(s for s, _ in items) + "]",
        [v for _, v in items],
    )


@settings(max_examples=25, deadline=None)
@given(data=st.data())
def test_array_subscript_rewrite_property(spark, data):
    """Property: for random nested ARRAY literals (string elements
    containing brackets/quotes/commas) with a random chain of in-range
    1-based subscripts, Spark's evaluation of the rewritten expression
    equals a Python evaluation of the Trino semantics — value-exact at
    every chain length, including the no-subscript and whole-subarray
    results."""
    from pyspark.sql import functions as F

    depth = data.draw(st.integers(min_value=1, max_value=3), label="depth")
    sql, expected = _gen_array(data, depth)
    # random chain of valid subscripts (possibly stopping early at a
    # sub-array), optional whitespace before each bracket — the
    # rewriter must treat '  [i]' as a chained subscript too
    while isinstance(expected, list) and data.draw(
        st.booleans(), label="descend"
    ):
        idx = data.draw(
            st.integers(min_value=1, max_value=len(expected)), label="idx"
        )
        pad = " " if data.draw(st.booleans(), label="pad") else ""
        sql += f"{pad}[{idx}]"
        expected = expected[idx - 1]

    out = trino_to_spark(sql)
    # the literal (and any subscript chain) was rewritten — 'ARRAY['
    # may only survive INSIDE string data
    assert out.startswith(("array(", "element_at("))
    got = spark.range(1).select(F.expr(out).alias("v")).collect()[0]["v"]
    assert got == expected, (sql, out, got, expected)
