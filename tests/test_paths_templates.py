import json

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
