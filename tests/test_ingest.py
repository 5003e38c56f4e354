"""S5 raw-blob ingestion: the reference's concatenated-JSON splitter
(utils/helpers.py:13-32 emit_json_block), CloudTrail Records files,
and permissive JSONL/CSV feeds."""

import json

import pytest

from alerta_spark.sources.ingest import (
    load_cloudtrail_records,
    load_events_csv,
    load_events_jsonl,
    split_json_blocks,
)


def _reference_emit_json_block(blob):
    """The reference's own algorithm (naive brace counting), used as
    the parity oracle on brace-free-string payloads."""
    open_brackets = 0
    block = ""
    for c in blob:
        if c == "{":
            open_brackets += 1
        elif c == "}":
            open_brackets -= 1
        block += c
        if open_brackets == 0:
            out = block.strip()
            if out:
                yield out
            block = ""


def test_split_json_blocks_reference_parity(spark):
    """On well-formed concatenated objects (no braces inside string
    values — the reference's supported regime) the Spark splitter
    emits exactly the reference's blocks, in order."""
    objs = [
        {"eventName": "ConsoleLogin", "n": i, "nested": {"a": [1, 2, {"b": i}]}}
        for i in range(5)
    ]
    blob = "".join(json.dumps(o) for o in objs)
    df = spark.createDataFrame([(1, blob)], "blob_id long, blob string")
    got = (
        split_json_blocks(df, "blob", id_col="blob_id")
        .orderBy("block_idx")
        .collect()
    )
    want = list(_reference_emit_json_block(blob))
    assert [r["block"] for r in got] == want
    assert [json.loads(r["block"]) for r in got] == objs
    assert all(r["blob_id"] == 1 for r in got)


def test_split_json_blocks_quote_aware_divergence():
    """Documented divergence: a '{' INSIDE a json string miscounts in
    the reference's naive counter (it would never close the block);
    the quote-aware splitter parses it correctly."""
    objs = [{"msg": "open { brace"}, {"msg": "close } brace"}]
    blob = "".join(json.dumps(o) for o in objs)
    # the reference's algorithm loses both blocks here
    assert list(_reference_emit_json_block(blob)) != [
        json.dumps(o) for o in objs
    ]


def test_split_json_blocks_quote_aware_spark(spark):
    objs = [{"msg": 'open { brace "esc\\" too'}, {"msg": "close } brace"}]
    blob = "".join(json.dumps(o) for o in objs)
    df = spark.createDataFrame([(blob,)], "blob string")
    got = split_json_blocks(df, "blob").orderBy("block_idx").collect()
    assert [json.loads(r["block"]) for r in got] == objs


def test_load_cloudtrail_records(spark, tmp_path):
    """One row per Records[] element; non-cloudtrail filenames drop
    (the reference's S3 listing filter, C17 regex)."""
    doc = {
        "Records": [
            {"eventName": "ConsoleLogin", "awsRegion": "us-east-1"},
            {"eventName": "AssumeRole", "awsRegion": "us-west-2"},
        ]
    }
    good = tmp_path / "123_cloudtrail_us-east-1.json.gz"
    # Spark's json reader decompresses by extension; write plain gz
    import gzip

    with gzip.open(good, "wt") as fd:
        fd.write(json.dumps(doc))
    bad = tmp_path / "not_trail.json"
    bad.write_text(json.dumps({"Records": [{"eventName": "Nope"}]}))

    out = load_cloudtrail_records(spark, str(tmp_path)).collect()
    assert sorted(r["eventName"] for r in out) == ["AssumeRole", "ConsoleLogin"]
    assert all("cloudtrail" in r["source_file"] for r in out)


def test_load_events_jsonl_permissive(spark, tmp_path):
    from pyspark.sql import types as T

    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"event_id": 1, "event_type": "login"}\n'
        "THIS IS NOT JSON\n"
        '{"event_id": 2, "event_type": "purchase"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    df = load_events_jsonl(spark, str(p), schema=schema).cache()
    good = df.where("_corrupt_record IS NULL").collect()
    bad = df.where("_corrupt_record IS NOT NULL").collect()
    assert {r["event_id"] for r in good} == {1, 2}
    assert len(bad) == 1 and "NOT JSON" in bad[0]["_corrupt_record"]
    df.unpersist()


def test_load_events_csv_permissive(spark, tmp_path):
    from pyspark.sql import types as T

    p = tmp_path / "feed.csv"
    p.write_text(
        "event_id,event_type\n1,login\nnot_a_long,purchase\n2,logout\n"
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    df = load_events_csv(spark, str(p), schema=schema).cache()
    good = df.where("_corrupt_record IS NULL").collect()
    bad = df.where("_corrupt_record IS NOT NULL").collect()
    assert {r["event_id"] for r in good} == {1, 2}
    assert len(bad) == 1
    df.unpersist()


def test_split_json_blocks_string_id_column(spark):
    """The id column keeps its own type (a hardcoded 'long' output
    schema broke string blob ids at Arrow serialization)."""
    objs = [{"a": 1}, {"b": 2}]
    blob = "".join(json.dumps(o) for o in objs)
    df = spark.createDataFrame(
        [("s3://bucket/file1", blob)], "source_file string, blob string"
    )
    got = (
        split_json_blocks(df, "blob", id_col="source_file")
        .orderBy("block_idx")
        .collect()
    )
    assert [json.loads(r["block"]) for r in got] == objs
    assert all(r["source_file"] == "s3://bucket/file1" for r in got)


def test_load_cloudtrail_records_prunes_listing(spark, tmp_path):
    """Default path pre-filters the FILE LISTING: a non-CloudTrail
    file with a differently-shaped Records field must neither be
    parsed into the schema nor poison it."""
    import gzip

    doc = {"Records": [{"eventName": "ConsoleLogin"}]}
    good = tmp_path / "55_cloudtrail_eu-west-1.json.gz"
    with gzip.open(good, "wt") as fd:
        fd.write(json.dumps(doc))
    # Records is a STRING here — would corrupt the inferred element
    # schema if this file were read at all
    poison = tmp_path / "not_trail.json"
    poison.write_text(json.dumps({"Records": "not-an-array"}))

    out = load_cloudtrail_records(spark, str(tmp_path))
    rows = out.collect()
    assert [r["eventName"] for r in rows] == ["ConsoleLogin"]

    # and nothing CloudTrail-named at all -> loud error, not a frame
    # inferred from unrelated files
    import pytest as _pytest

    empty = tmp_path / "none"
    empty.mkdir()
    (empty / "other.json").write_text(json.dumps({"Records": []}))
    with _pytest.raises(ValueError, match="no CloudTrail-named files"):
        load_cloudtrail_records(spark, str(empty))
