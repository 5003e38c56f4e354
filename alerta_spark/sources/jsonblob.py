"""Concatenated-JSON blob source (S5).

The reference ingests streams of concatenated JSON objects (no
newlines) by counting braces (utils/helpers.py:13-32). Distributed
version: whole files land as one row each (`spark.read.text(wholetext)`
— files process in parallel, the natural unit for blob logs), an
Arrow-batched splitter emits one row per object, and the result parses
with `from_json` (explicit schema) or `spark.read.json` (inference).

The splitter is string-aware (braces inside JSON strings and escaped
quotes don't count) — a documented improvement over the reference's
naive counter.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def split_json_blocks(text: str) -> list[str]:
    """Split a concatenated-JSON string into top-level object blocks."""
    blocks: list[str] = []
    depth = 0
    start = None
    in_str = False
    esc = False
    for i, ch in enumerate(text):
        if esc:
            esc = False
            continue
        if ch == "\\":
            esc = in_str
            continue
        if ch == '"':
            in_str = not in_str
            continue
        if in_str:
            continue
        if ch == "{":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0 and start is not None:
                blocks.append(text[start : i + 1])
                start = None
    return blocks


def read_json_blobs(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    """One row per JSON object across every blob file under `path`."""
    from alerta_spark._ship import ensure_shipped

    ensure_shipped(spark)
    raw = spark.read.text(path, wholetext=True)

    out_schema = T.StructType([T.StructField("json_block", T.StringType())])

    def fn(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as _pd

        # the ONE splitter implementation (module-level above);
        # worker-side import resolves via the ensure_shipped zip
        from alerta_spark.sources.jsonblob import (
            split_json_blocks as _split,
        )

        for pdf in batches:
            out = [b for t in pdf["value"] for b in _split(t or "")]
            yield _pd.DataFrame({"json_block": out})

    blocks = raw.mapInPandas(fn, out_schema)
    if schema is not None:
        parsed = blocks.select(F.from_json("json_block", schema).alias("r")).select(
            "r.*"
        )
        return parsed
    # schema inference path: one extra pass over the block strings
    return spark.read.json(blocks.rdd.map(lambda r: r["json_block"]))
