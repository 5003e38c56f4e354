import json

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from alerta_spark.paths import path_col
from alerta_spark.templates import render_py, template_col


def test_path_col_struct_and_json(spark):
    df = spark.createDataFrame(
        [
            {"a": {"b": "x"}, "props": json.dumps({"k": 5, "nest": {"deep": "v"}})},
        ]
    )
    row = df.select(
        path_col(df, "a.b").alias("ab"),
        path_col(df, "props.k").alias("k"),
        path_col(df, "props.nest.deep").alias("deep"),
        path_col(df, "a.missing").alias("miss"),
        path_col(df, "nosuch.path").alias("nocol"),
    ).first()
    assert row["ab"] == "x"
    assert row["k"] == "5"
    assert row["deep"] == "v"
    assert row["miss"] is None
    assert row["nocol"] is None


def test_path_col_json_array_index(spark):
    """Digit segments inside a JSON-string payload compile to [i]
    (ADVICE: '$.items.0' silently NULLed; render_py resolved it) —
    both sides must agree."""
    df = spark.createDataFrame(
        [{"props": json.dumps({"items": ["a", "b", "c"], "nest": [{"k": "v"}]})}]
    )
    row = df.select(
        path_col(df, "props.items.0").alias("i0"),
        path_col(df, "props.items.2").alias("i2"),
        path_col(df, "props.nest.0.k").alias("nk"),
        path_col(df, "props.items.9").alias("miss"),
    ).first()
    assert row["i0"] == "a"
    assert row["i2"] == "c"
    assert row["nk"] == "v"
    assert row["miss"] is None


def test_split_top_and_literal_aware():
    """' and '/parens inside quoted literals neither split nor corrupt
    depth; parts come back verbatim (ADVICE fix)."""
    from alerta_spark.streaming.correlator import _split_top_and

    sql = "msg = 'fish and (chips' AND x = 1 and y = 'A AND B'"
    parts = _split_top_and(sql)
    assert parts == ["msg = 'fish and (chips'", "x = 1", "y = 'A AND B'"]

    # templated conjunct dropping keeps literals intact
    from alerta_spark.streaming.correlator import _static_criteria

    crit = "note = 'alpha and beta' AND user = '{{metadata.value}}'"
    assert _static_criteria({"criteria": crit}) == "note = 'alpha and beta'"


def test_dedupe_release_cached(spark):
    from alerta_spark.ops import dedupe

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g h")],
        "doc_id long, text string",
    )
    dedupe.ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert len(dedupe._CACHED) >= 1
    released = dedupe.release_cached()
    assert released >= 1 and dedupe._CACHED == []


def test_template_col_renders_paths_and_misses(spark):
    df = spark.createDataFrame([{"metadata": {"value": "root", "count": 2}, "x": 1}])
    root = F.struct(*[F.col(c) for c in df.columns])
    out = df.select(
        template_col(
            "User {{metadata.value}} seen {{metadata.count}} times{{missing.path}}!",
            root,
            df.schema,
        ).alias("s")
    ).first()["s"]
    assert out == "User root seen 2 times!"


def test_template_array_index(spark):
    df = spark.createDataFrame(
        [{"events": [{"details": json.dumps({"user": "alice"})}]}]
    )
    root = F.struct(*[F.col(c) for c in df.columns])
    out = df.select(
        template_col("first={{events.0.details.user}}", root, df.schema).alias("s")
    ).first()["s"]
    assert out == "first=alice"


def test_render_py_matches_column_semantics():
    ctx = {"metadata": {"value": "root", "count": 2}, "events": [{"id": 7}]}
    assert (
        render_py("{{metadata.value}}/{{metadata.count}}/{{events.0.id}}/{{nope}}", ctx)
        == "root/2/7/"
    )


def test_dict_match_nested_and_miss(spark):
    from alerta_spark.paths import dict_match

    df = spark.createDataFrame(
        [
            {"source": "onelogin", "props": json.dumps({"k": 69, "who": "root"})},
            {"source": "onelogin", "props": json.dumps({"k": 70})},
            {"source": "gsuite", "props": json.dumps({"k": 69})},
        ]
    )
    # nested subset match over the JSON-string payload
    got = df.where(dict_match(df, {"source": "onelogin", "props": {"k": 69}}))
    assert got.count() == 1 and got.first()["source"] == "onelogin"
    # a query path absent from every row matches nothing (silent miss)
    assert df.where(dict_match(df, {"props": {"nope": 1}})).count() == 0
    # empty query matches everything (vacuous AND — reference parity)
    assert df.where(dict_match(df, {})).count() == 3


def test_path_col_array_index_oob_is_null_not_throw(spark):
    """ANSI mode (default-on in Spark 4) makes element_at THROW on an
    out-of-range index; the silent-miss contract requires NULL —
    try_element_at in resolve_path's array branch."""
    from alerta_spark.paths import path_col

    df = spark.createDataFrame(
        [([{"x": 1}],)], "events array<struct<x:int>>"
    )
    rows = df.select(
        path_col(df, "events.0.x").alias("hit"),
        path_col(df, "events.5.x").alias("miss"),
    ).collect()
    assert rows[0]["hit"] == 1 and rows[0]["miss"] is None


def test_path_col_map_missing_key_is_null_not_throw(spark):
    """ANSI element_at on a map throws INVALID_MAP_KEY on a miss."""
    from alerta_spark.paths import path_col

    df = spark.createDataFrame([({"a": 1},)], "m map<string,int>")
    rows = df.select(
        path_col(df, "m.a").alias("hit"),
        path_col(df, "m.zzz").alias("miss"),
    ).collect()
    assert rows[0]["hit"] == 1 and rows[0]["miss"] is None


def test_negative_index_is_a_miss_everywhere(spark):
    """chevron (the reference renderer) gates list access on
    key.isdigit(), so 'items.-1' is a silent miss — in the column
    compiler (array AND json-string branches) and the python twin
    alike."""
    from alerta_spark.paths import path_col
    from alerta_spark.templates import render_py

    df = spark.createDataFrame(
        [([10, 20], json.dumps({"items": [1, 2, 3]}))],
        "arr array<int>, payload string",
    )
    rows = df.select(
        path_col(df, "arr.-1").alias("a"),
        path_col(df, "payload.items.-1").alias("j"),
    ).collect()
    assert rows[0]["a"] is None and rows[0]["j"] is None
    ctx = {"arr": [10, 20], "payload": {"items": [1, 2, 3]}}
    assert render_py("{{arr.-1}}", ctx) == ""
    assert render_py("{{payload.items.-1}}", ctx) == ""


def test_template_null_boolean_renders_empty(spark):
    """A NULL boolean must render '' (mustache silent miss), not a
    fabricated 'False'."""
    from alerta_spark.templates import template_col

    df = spark.createDataFrame(
        [(None, True, False)], "flag boolean, t boolean, f boolean"
    )
    row = df.select(
        template_col(
            "[{{flag}}|{{t}}|{{f}}]", F.struct("flag", "t", "f"),
            df.select("flag", "t", "f").schema,
        ).alias("s")
    ).first()
    assert row["s"] == "[|True|False]"


def test_dict_match_boolean_and_numeric_values(spark):
    """The reference compares post-json.loads PYTHON values, so
    {'enabled': True} must match payload '{"enabled": true}' (Python
    str(True)='True' would never equal the JSON token 'true'), a
    native boolean column must match too, and 1 must match 1.0
    (Python cross-type numeric equality)."""
    from alerta_spark.paths import dict_match

    df = spark.createDataFrame(
        [
            (json.dumps({"enabled": True, "n": 1}), True),
            (json.dumps({"enabled": False, "n": 2.0}), False),
        ],
        "props string, flag boolean",
    )
    assert df.where(dict_match(df, {"props": {"enabled": True}})).count() == 1
    assert df.where(dict_match(df, {"flag": True})).count() == 1
    assert df.where(dict_match(df, {"flag": False})).count() == 1
    # Python 1.0 == 1 and 2 == 2.0 — numeric compare, not string
    assert df.where(dict_match(df, {"props": {"n": 1.0}})).count() == 1
    assert df.where(dict_match(df, {"props": {"n": 2}})).count() == 1


def test_dict_match_big_int_exact(spark):
    """Integers past 2^53 (snowflake ids) must compare EXACTLY: the
    double path rounds 9007199254740993 and its even neighbors to the
    same double, fabricating matches the reference's Python == rejects.
    Fractional renderings must not round-match either (decimal cast
    ROUNDS, so the integer-pattern guard carries the semantics)."""
    import json as _json

    from alerta_spark.paths import dict_match

    big = 2**53 + 1  # 9007199254740993; float(big) == float(big - 1)
    df = spark.createDataFrame(
        [
            {"props": _json.dumps({"id": big})},
            {"props": _json.dumps({"id": big - 1})},
            {"props": '{"id": 9007199254740993.4}'},
            {"props": _json.dumps({"id": "garbage"})},
        ]
    )
    assert df.where(dict_match(df, {"props": {"id": big}})).count() == 1
    assert df.where(dict_match(df, {"props": {"id": big - 1}})).count() == 1
    # small ints keep the reference's numeric 1 == 1.0 laxity
    small = spark.createDataFrame([{"props": '{"k": 1.0}'}])
    assert small.where(dict_match(small, {"props": {"k": 1}})).count() == 1
    # a query int wider than decimal(38,0) compares as no-match,
    # never as an ANSI overflow throw
    assert df.where(dict_match(df, {"props": {"id": 10**40}})).count() == 0
    # a float-RENDERED column holding an integer the query int round-
    # trips to exactly MUST match (Python float == int is an exact
    # real comparison): 2^53 as "9007199254740992.0" / "9.00...E15"
    fl = spark.createDataFrame(
        [
            {"props": '{"id": 9007199254740992.0}'},
            {"props": '{"id": 9.007199254740992E15}'},
            {"props": '{"id": 1e20}'},
        ]
    )
    assert df.where(dict_match(df, {"props": {"id": big - 1}})).count() == 1
    assert fl.where(dict_match(fl, {"props": {"id": 2**53}})).count() == 2
    assert fl.where(dict_match(fl, {"props": {"id": 10**20}})).count() == 1
    # ...but a NON-round-tripping query int equals no double: 2^53+1
    # must not pick up the 2^53-valued float rows
    assert fl.where(dict_match(fl, {"props": {"id": big}})).count() == 0
    # two equal >38-digit integers compare EQUAL (exact string path;
    # both decimal casts NULL out but Python == is True)
    huge = spark.createDataFrame([{"props": _json.dumps({"id": 10**40 + 7})}])
    assert huge.where(dict_match(huge, {"props": {"id": 10**40 + 7}})).count() == 1
    assert huge.where(dict_match(huge, {"props": {"id": 10**40 + 9}})).count() == 0
    # a FLOAT query >= 2^53 routes through the exact branch too:
    # Python's 9007199254740993 == 9007199254740992.0 is False (exact
    # real comparison), so the lossy double cast must not round the
    # int column onto the query — the same neighboring-snowflake trap
    # as the int branch, from the other side
    q = float(2**53)  # 9007199254740992.0
    assert df.where(dict_match(df, {"props": {"id": q}})).count() == 1  # =2^53 row
    assert fl.where(dict_match(fl, {"props": {"id": q}})).count() == 2
    only_993 = spark.createDataFrame([{"props": _json.dumps({"id": big})}])
    assert only_993.where(dict_match(only_993, {"props": {"id": q}})).count() == 0


def test_dict_match_zero_fraction_decimal_rendering(spark):
    """A DECIMAL-typed column renders integral values with a zero
    fraction ("…993.00"); those are exactly-known integers and must
    take the EXACT path: routing them through the double branch would
    round "9007199254740993.00" onto the round-tripping query int
    9007199254740992 and fabricate the same neighboring-snowflake
    match the exact decimal path exists to prevent."""
    from pyspark.sql import functions as F

    from alerta_spark.paths import dict_match

    big = 2**53 + 1  # float(big) == float(big - 1)
    df = spark.createDataFrame(
        [(str(big),), (str(big - 1),)], "raw string"
    ).select(F.col("raw").cast("decimal(38,2)").alias("id"))
    # the rendering under test really is zero-fraction decimal form
    assert df.select(F.col("id").cast("string")).first()[0].endswith(".00")
    assert df.where(dict_match(df, {"id": big})).count() == 1
    # the round-tripping neighbor must NOT pick up the ".00" row for
    # big — exactly one (exact) match each, no cross-rounding
    assert df.where(dict_match(df, {"id": big - 1})).count() == 1
    # a big FLOAT query hits the exact path as well: only the row it
    # equals exactly, never the ".00"-rendered neighbor
    assert df.where(dict_match(df, {"id": float(2**53)})).count() == 1
    # >38-digit integral decimals ride the normalized string arm
    hv = 10**40 + 7
    huge = spark.createDataFrame([(f"{hv}.000",)], "id string")
    assert huge.where(dict_match(huge, {"id": hv})).count() == 1
    assert huge.where(dict_match(huge, {"id": hv + 2})).count() == 0
    # nonzero fractions still follow the reference's json.loads-then-==
    # double semantics, not the exact path
    frac = spark.createDataFrame([("9007199254740992.9",)], "id string")
    assert frac.where(dict_match(frac, {"id": 2**53})).count() == 1


# --- dict_match property: compiled Spark predicate vs an executable
# spec of its DOCUMENTED compare semantics (paths.py dict_match
# docstring: bool -> JSON rendering, numerics -> Python ==-style
# numeric laxity with the >=2^53 exact branch, strings -> string
# equality, None -> silent-miss NULL). The generator stays inside the
# documented regime: strings always contain a letter (a numeric-
# looking STRING is indistinguishable from a number after
# get_json_object — documented divergence), floats stay below 2^53.

_PM_SMALL_INTS = [-1000, -1, 0, 7, 999]
_PM_BIG_INTS = [2**53 - 1, 2**53, 2**53 + 1, 10**18, 10**40 + 7]
_PM_FLOATS = [0.5, -2.25, 123.0, 9007199254740992.0]
_PM_STRINGS = ["abc", "x1", "Z z", "O'neil", "päy"]
_PM_KEYS = ["a", "b", "c", "d", "nest"]


def _pm_scalars():
    from hypothesis import strategies as st

    return st.one_of(
        st.sampled_from(_PM_SMALL_INTS),
        st.sampled_from(_PM_BIG_INTS),
        st.sampled_from(_PM_FLOATS),
        st.sampled_from(_PM_STRINGS),
        st.booleans(),
        st.none(),
    )


def _pm_match_spec(payload, query):
    """The documented dict_match semantics, executable: used as the
    oracle for the property. Mirrors the compile rules, NOT raw Python
    == (bool vs int and str vs number laxities are documented
    non-matches)."""

    def walk(d, path):
        cur = d
        for part in path.split("."):
            if isinstance(cur, dict) and part in cur:
                cur = cur[part]
            else:
                return None  # silent miss -> NULL
        return cur

    def flat(q, prefix=""):
        for k, v in q.items():
            p = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                yield from flat(v, p)
            else:
                yield p, v

    for path, v in flat(query):
        cur = walk(payload, path)
        if v is None:
            if cur is not None:
                return False
        elif isinstance(v, bool):
            if not (isinstance(cur, bool) and cur == v):
                return False
        elif isinstance(v, (int, float)):
            if isinstance(cur, bool) or not isinstance(cur, (int, float)):
                return False
            if cur != v:  # Python's exact cross-type numeric ==
                return False
        else:
            if not (isinstance(cur, str) and cur == v):
                return False
    return True


def _pm_payloads():
    from hypothesis import strategies as st

    flat = st.dictionaries(
        st.sampled_from(_PM_KEYS[:4]), _pm_scalars(), min_size=1, max_size=4
    )
    return st.builds(
        lambda base, nested: {**base, **({"nest": nested} if nested else {})},
        flat,
        st.one_of(st.none(), flat),
    )


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_dict_match_property_vs_spec(spark, data):
    """Property: over random nested payloads and queries (values drawn
    from the payload for matches, from the same class for near-misses
    — including the 2^53±1 precision traps and >38-digit integers),
    the compiled predicate selects exactly the rows the documented
    semantics select. Exercises path descent through JSON strings,
    number re-rendering (integer, scientific, fractional), the
    decimal(38,0) exact branch, the round-tripping-double branch, and
    bool/string/None typing."""
    from alerta_spark.paths import dict_match

    payloads = data.draw(
        st.lists(_pm_payloads(), min_size=1, max_size=5), label="payloads"
    )
    # query: mix of values copied from payload 0 (match-shaped) and
    # random same-class values (miss-shaped)
    q: dict = {}
    src = payloads[0]
    for k, v in list(src.items())[:3]:
        if isinstance(v, dict):
            q[k] = {
                kk: (
                    vv
                    if data.draw(st.booleans(), label=f"keep.{k}.{kk}")
                    else data.draw(_pm_scalars(), label=f"mut.{k}.{kk}")
                )
                for kk, vv in list(v.items())[:2]
            }
        elif data.draw(st.booleans(), label=f"keep.{k}"):
            q[k] = v
        else:
            q[k] = data.draw(_pm_scalars(), label=f"mut.{k}")
    if not q:
        q = {"a": 7}

    rows = [
        {"rid": i, "props": json.dumps(p)} for i, p in enumerate(payloads)
    ]
    df = spark.createDataFrame(rows, "rid int, props string")
    got = sorted(
        r["rid"]
        for r in df.where(dict_match(df, {"props": q})).select("rid").collect()
    )
    want = sorted(
        i for i, p in enumerate(payloads) if _pm_match_spec(p, q)
    )
    assert got == want, (q, payloads, got, want)


# --- render parity property: the driver-side mustache renderer
# (render_py, used by the per-document sequence path) and the codegen
# column compiler (template_col, used by the fused/assembled paths)
# must produce identical strings for the same context — divergence
# means a fused pass writes different summaries/criteria than the
# faithful driver loop. Generator stays inside the conformant domain:
# no doubles (documented E-notation divergence), no paths terminating
# at a non-scalar (str(dict) vs struct cast), no bools inside JSON
# payloads (Python True vs JSON true).

_RP_PATHS = [
    "s", "n", "b", "nest.k", "nest.m", "arr.0", "arr.9",
    "payload.a", "payload.b", "payload.nested.x",
    "payload.items.0", "payload.items.9",
    "missing", "payload.nope.deep", "s.deeper",
]
_RP_LITS = [" ", " by ", ": ", "!", " — ", "[", "]", "#"]
_RP_STRS = ["alice", "O'neil", "a b\tc", "päy", "", "x,y", '"q"']


def _rp_ctx():
    from hypothesis import strategies as st

    return st.fixed_dictionaries(
        {
            "s": st.sampled_from(_RP_STRS),
            "n": st.integers(-(2**31), 2**31),
            "b": st.one_of(st.none(), st.booleans()),
            "nest": st.fixed_dictionaries(
                {
                    "k": st.sampled_from(_RP_STRS),
                    "m": st.integers(-100, 100),
                }
            ),
            "arr": st.lists(
                st.integers(-(2**31), 2**31), min_size=0, max_size=3
            ),
            "payload": st.fixed_dictionaries(
                {
                    "a": st.one_of(
                        st.sampled_from(_RP_STRS), st.integers(-1000, 1000)
                    ),
                    "b": st.integers(-(2**40), 2**40),
                    "nested": st.fixed_dictionaries(
                        {"x": st.sampled_from(_RP_STRS)}
                    ),
                    "items": st.lists(
                        st.one_of(
                            st.sampled_from(_RP_STRS),
                            st.integers(-1000, 1000),
                        ),
                        min_size=0,
                        max_size=3,
                    ),
                }
            ),
        }
    )


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_render_py_template_col_parity_property(spark, data):
    """Property: for random contexts (typed columns, nested structs,
    arrays, JSON-string payloads) and random templates over the
    scalar-terminal path pool (hits, misses, out-of-range indices,
    descents into scalars), render_py and template_col render the
    SAME string."""
    ctx = data.draw(_rp_ctx(), label="ctx")
    n_parts = data.draw(st.integers(1, 5), label="n_parts")
    tmpl = ""
    for i in range(n_parts):
        if data.draw(st.booleans(), label=f"isvar{i}"):
            tmpl += "{{" + data.draw(
                st.sampled_from(_RP_PATHS), label=f"var{i}"
            ) + "}}"
        else:
            tmpl += data.draw(st.sampled_from(_RP_LITS), label=f"lit{i}")

    py_ctx = dict(ctx, payload=json.dumps(ctx["payload"]))
    expected = render_py(tmpl, py_ctx)

    df = spark.createDataFrame(
        [
            (
                ctx["s"], ctx["n"], ctx["b"],
                (ctx["nest"]["k"], ctx["nest"]["m"]),
                ctx["arr"], json.dumps(ctx["payload"]),
            )
        ],
        "s string, n long, b boolean, nest struct<k:string,m:long>, "
        "arr array<long>, payload string",
    )
    root = F.struct(*[F.col(c) for c in df.columns])
    got = df.select(template_col(tmpl, root, df.schema).alias("r")).first()["r"]
    assert got == expected, (tmpl, py_ctx, got, expected)
