"""Source-layer parity: S5 (concatenated-JSON splitting via the native
reader) and nano-timestamp conversion."""

import json


def test_json_blob_splitting(spark, tmp_path):
    """S5: concatenated JSON objects (no newlines) split distributedly
    (reference: brace counter at utils/helpers.py:13-32)."""
    from alerta_spark.sources.jsonblob import read_json_blobs, split_json_blocks

    blob = tmp_path / "blob.json"
    events = [{"eventid": str(i), "source": "s", "details": {"k": i}} for i in range(5)]
    blob.write_text("".join(json.dumps(e) for e in events))

    df = read_json_blobs(spark, str(blob))
    assert df.count() == 5
    assert sorted(r["eventid"] for r in df.collect()) == [str(i) for i in range(5)]

    # explicit-schema path (no inference pass)
    df2 = read_json_blobs(
        spark, str(blob), "eventid string, source string, details struct<k:long>"
    )
    assert df2.count() == 5 and df2.schema["details"].dataType.simpleString() == "struct<k:bigint>"

    # string-aware splitting: braces inside strings don't count
    tricky = '{"a": "}{", "b": {"c": "\\"{"}}{"a": "x"}'
    assert len(split_json_blocks(tricky)) == 2


def test_nano_timestamp_conversion(spark):
    """Testdata parquet carries TIMESTAMP(NANOS): the source layer must
    deliver true timestamps with microsecond truncation (DuckDB-equal)."""
    from alerta_spark.sources.lake import load_events

    df = load_events(spark, "/root/testdata/sf0.001")
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    import duckdb

    expect = duckdb.sql(
        "SELECT max(ts) FROM '/root/testdata/sf0.001/events.parquet'"
    ).fetchone()[0]
    from pyspark.sql import functions as F

    got = df.select(F.max("ts")).first()[0]
    assert got == expect


def test_schema_evolution_read_merges_new_columns(spark, tmp_path, events):
    """Lake schema evolution: a writer adds a column mid-history;
    mergeSchema reads must surface old rows with NULLs and rule
    criteria over the old columns must run unchanged."""
    from pyspark.sql import functions as F

    from alerta_spark.operators.threshold import apply_criteria

    p = str(tmp_path / "lake")
    v1 = events.select("event_id", "ts", "user_id", "event_type", "value")
    v1.where(F.col("event_id") % 2 == 0).write.mode("append").parquet(p)
    v2 = v1.where(F.col("event_id") % 2 == 1).withColumn(
        "region", F.lit("eu-west")
    )
    v2.write.mode("append").parquet(p)

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert "region" in merged.columns
    n_total = events.count()
    assert merged.count() == n_total
    assert merged.where(F.col("region").isNull()).count() == v1.where(
        F.col("event_id") % 2 == 0
    ).count()
    # criteria over pre-evolution columns still compile and run
    out = apply_criteria(merged, "event_type='purchase' AND value > 10")
    assert out.count() == events.where(
        (F.col("event_type") == "purchase") & (F.col("value") > 10)
    ).count()
