"""Data-contract semantics: report counts, dead-letter split, and the
streaming ingest gate."""

from pyspark.sql import functions as F

RULES = [
    {"kind": "not_null", "col": "u"},
    {"kind": "range", "col": "v", "lo": 0, "hi": 10},
    {"kind": "in_set", "col": "t", "values": ["a", "b"]},
    {"kind": "regex", "col": "s", "pattern": "^ok"},
    {"kind": "expr", "col": "v", "expr": "v IS NULL OR v <> 7"},
    {"kind": "unique", "col": "u"},
]

ROWS = [
    # u,   v,    t,    s
    (1, 5.0, "a", "ok-1"),      # clean
    (None, 5.0, "a", "ok-2"),   # not_null violation
    (2, -3.0, "b", "ok-3"),     # range violation
    (3, 5.0, "c", "ok-4"),      # in_set violation
    (4, 5.0, "a", "bad-5"),     # regex violation
    (5, 7.0, "a", "ok-6"),      # expr violation
    (5, 5.0, "b", "ok-7"),      # duplicate u -> unique violation only
]
SCHEMA = "u long, v double, t string, s string"


def test_validate_expectations_counts(spark):
    from alerta_spark.ops.expectations import validate_expectations

    df = spark.createDataFrame(ROWS, SCHEMA)
    rep = {r["rule_idx"]: r for r in validate_expectations(df, RULES).collect()}
    assert rep[0]["n_violations"] == 1 and rep[0]["kind"] == "not_null"
    assert rep[1]["n_violations"] == 1
    assert rep[2]["n_violations"] == 1
    assert rep[3]["n_violations"] == 1
    assert rep[4]["n_violations"] == 1
    assert rep[5]["n_violations"] == 1 and rep[5]["kind"] == "unique"
    assert rep[5]["n_checked"] == 6  # null u excluded from unique
    assert all(not rep[i]["pass"] for i in range(6))
    # a clean frame passes everything
    clean = spark.createDataFrame(ROWS[:1], SCHEMA)
    assert all(r["pass"] for r in validate_expectations(clean, RULES).collect())


def test_split_violations_tags(spark):
    from alerta_spark.ops.expectations import split_violations

    df = spark.createDataFrame(ROWS, SCHEMA)
    clean, rejected = split_violations(df, RULES)
    # duplicate-u row is row-local-clean (unique is report-only)
    assert {r["u"] for r in clean.collect()} == {1, 5}
    tags = {
        r["s"]: sorted(r["violated"]) for r in rejected.collect()
    }
    assert tags == {
        "ok-2": [0],
        "ok-3": [1],
        "ok-4": [2],
        "bad-5": [3],
        "ok-6": [4],
    }


def test_stream_contract_gate(spark, tmp_path):
    from alerta_spark.ops.expectations import stream_contract_gate

    src = str(tmp_path / "src")
    spark.createDataFrame(ROWS, SCHEMA).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)

    clean_p = str(tmp_path / "clean")
    rej_p = str(tmp_path / "rejected")
    q = stream_contract_gate(
        stream, RULES, clean_p, rej_p, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    clean = spark.read.parquet(clean_p)
    rejected = spark.read.parquet(rej_p)
    assert clean.count() == 2
    assert rejected.count() == 5
    assert "violated" in rejected.columns
    reports = spark.read.parquet(rej_p + "/_reports")
    # one report row per rule for the single batch, batch_id stamped
    assert reports.count() == len(RULES)
    assert reports.select("batch_id").distinct().count() == 1
    # dead-letter dir does not pollute the rejected dataset read
    assert set(rejected.columns) == {"u", "v", "t", "s", "violated"}
