"""Raw-blob ingestion: the reference's streaming JSON splitter and
CloudTrail file handling (S5), Spark-native.

Reference parity (utils/helpers.py:13-32 ``emit_json_block``): the
reference scans a character stream and emits a block every time the
brace depth returns to zero — splitting CONCATENATED json objects
(``{..}{..}{..}``, the shape CloudTrail-style blob drops arrive in)
without requiring newline delimiters. Here the splitter is an
Arrow-batched ``mapInPandas`` over a blob column: one pass per blob,
quote-aware (a ``{`` inside a JSON string does not change depth —
the reference's naive counter miscounts there; this is a documented
divergence in favor of correctness, identical output on every blob
whose string values contain no braces), emitting one row per block.

CloudTrail files themselves (``{"Records": [...]}``) are plain
multiline JSON: ``load_cloudtrail_records`` reads them with Spark's
native JSON source and explodes ``Records`` — no Python in that path
at all, and the filename filter is the reference's own regex
(functions/scalars.py ``is_cloudtrail``) applied to
``input_file_name()``.

JSONL / CSV event feeds load through the PERMISSIVE readers with a
captured ``_corrupt_record`` column, so one malformed line never
kills a 100 TB ingest — the bad rows are data you can route to a
quarantine sink.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def split_json_blocks(
    df: DataFrame, blob_col: str = "blob", id_col: str | None = None
) -> DataFrame:
    """Split a column of concatenated JSON objects into one row per
    object (reference ``emit_json_block`` semantics, quote-aware).

    -> [<id_col if given>, block_idx, block]
    """
    from alerta_spark._ship import ensure_shipped

    ensure_shipped(df.sparkSession)

    cols = ([id_col] if id_col else []) + [blob_col]
    slim = df.select(*cols)
    # the id column keeps ITS OWN type — hardcoding 'long' here broke
    # any string-ish blob id (e.g. input_file_name()) at Arrow
    # serialization time
    out_schema = (
        (f"{id_col} {df.schema[id_col].dataType.simpleString()}, "
         if id_col else "")
        + "block_idx long, block string"
    )

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        # the ONE splitter implementation (quote-aware brace counter);
        # worker-side import resolves via the ensure_shipped zip
        from alerta_spark.sources.jsonblob import (
            split_json_blocks as _split_blocks,
        )

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                for j, b in enumerate(_split_blocks(r[blob_col] or "")):
                    rec = {"block_idx": j, "block": b}
                    if id_col:
                        rec[id_col] = r[id_col]
                    rows.append(rec)
            cols_out = ([id_col] if id_col else []) + ["block_idx", "block"]
            yield pd.DataFrame(rows, columns=cols_out)

    return slim.mapInPandas(fn, out_schema)


def load_cloudtrail_records(
    spark: SparkSession, path: str, allow_unnamed: bool = False
) -> DataFrame:
    """Read CloudTrail-shaped files (``{"Records": [...]}``) and emit
    one row per record — the reference's per-file Records loop as one
    native multiline-JSON scan + Generate. Only files matching the
    reference's CloudTrail filename regex are kept (is_cloudtrail on
    ``input_file_name``); pass a directory and let non-matching files
    drop, exactly as the reference's S3 listing filter does.

    ``allow_unnamed=True`` additionally keeps rows whose
    ``input_file_name()`` is EMPTY (in-memory relations, some
    non-file sources). It is opt-in: empty filenames also occur for
    production non-file sources, and defaulting them in would let
    records bypass the reference's filename filter silently.

    The default path PRE-FILTERS the file listing (metadata-only)
    with the same regex before any byte is read: without this, every
    non-CloudTrail file under ``path`` was multiline-JSON parsed on
    every call just to be dropped by the post-read filter, and a
    stray file with a differently-shaped ``Records`` field could
    poison the inferred schema. The post-read filename filter stays
    (it is the semantic contract and costs nothing). With
    ``allow_unnamed=True`` the full scan is kept — unnamed rows can
    only come from sources the listing cannot see."""
    from alerta_spark.functions.scalars import (
        CLOUDTRAIL_FILENAME_RE,
        is_cloudtrail,
    )

    src: str | list[str] = path
    if not allow_unnamed:
        import re as _re

        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        names: list[str] = []
        if fs.isDirectory(hpath):
            it = fs.listFiles(hpath, True)
            while it.hasNext():
                names.append(it.next().getPath().toString())
        else:
            for st in fs.globStatus(hpath) or []:
                names.append(st.getPath().toString())
        matched = [
            n for n in names if _re.search(CLOUDTRAIL_FILENAME_RE, n)
        ]
        if not matched:
            raise ValueError(
                f"no CloudTrail-named files under {path} "
                "(C17 filename regex matched nothing)"
            )
        src = matched

    raw = spark.read.option("multiLine", "true").json(src)
    if "Records" not in raw.columns:
        raise ValueError(f"no Records[] field in JSON at {path}")
    keep = is_cloudtrail(F.col("_file"))
    if allow_unnamed:
        keep = keep | (F.col("_file") == "")
    return (
        raw.withColumn("_file", F.input_file_name())
        .where(keep)
        .select("_file", F.explode("Records").alias("record"))
        .select(F.col("_file").alias("source_file"), "record.*")
    )


def load_events_jsonl(
    spark: SparkSession, path: str, schema=None
) -> DataFrame:
    """JSONL event feed, PERMISSIVE: malformed lines land whole in
    ``_corrupt_record`` instead of failing the scan. Pass the events
    schema for a stable frame; without one Spark infers (one extra
    pass — fine for tests, pin the schema at scale)."""
    reader = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if schema is not None:
        from pyspark.sql import types as T

        s = schema
        if isinstance(s, T.StructType) and "_corrupt_record" not in s.names:
            s = T.StructType(
                list(s.fields) + [T.StructField("_corrupt_record", T.StringType())]
            )
        reader = reader.schema(s)
    return reader.json(path)


def load_events_csv(
    spark: SparkSession, path: str, schema=None, header: bool = True
) -> DataFrame:
    """CSV event feed, PERMISSIVE with ``_corrupt_record`` capture."""
    reader = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", str(header).lower())
    )
    if schema is not None:
        from pyspark.sql import types as T

        s = schema
        if isinstance(s, T.StructType) and "_corrupt_record" not in s.names:
            s = T.StructType(
                list(s.fields) + [T.StructField("_corrupt_record", T.StringType())]
            )
        reader = reader.schema(s)
    return reader.csv(path)
