"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed through Arrow-batched
``mapInPandas``.

The decode step itself (JPEG/PNG/audio codecs) is STUBBED — the
container has no imaging/audio libraries — behind
``decoder="fake"`` (deterministic: derives pseudo-metadata and a
feature vector from the bytes) or ``decoder="real"`` (raises
NotImplementedError with the library it would use). Everything
Spark-side is real and tested: the schema, the Arrow batch path, the
partitioning, and the UDF signatures — swap the decode body on a
cluster with codecs installed and nothing else changes.

Schema convention:

    media: struct<data: binary, meta: struct<kind:string, format:string,
                  width:int, height:int, duration_ms:int>>
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_DIM = 16


def attach_fake_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test/bench helper: synthesize a binary media column from an
    existing text column (deterministic bytes) + metadata."""
    data = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit("image").alias("kind"),
        F.lit("fake").alias("format"),
        (F.length(data) % 640).cast("int").alias("width"),
        (F.length(data) % 480).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )
    return df.withColumn("media", F.struct(data.alias("data"), meta.alias("meta")))


def _fake_decode(data: bytes) -> list[float]:
    """Deterministic stand-in for decode+feature-extract: FEATURE_DIM
    floats derived from the content digest."""
    d = hashlib.sha256(data or b"").digest()
    return [
        int.from_bytes(d[2 * i : 2 * i + 2], "big") / 65535.0
        for i in range(FEATURE_DIM)
    ]


def extract_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    decoder: str = "fake",
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode media and emit a feature vector per row via mapInPandas.

    Arrow moves the binary column in columnar batches; the pandas
    function is the ONLY Python in the pipeline and is replaced
    wholesale by a real decoder on a cluster with codecs.
    """
    if decoder == "real":
        raise NotImplementedError(
            "real decode requires an imaging/audio library (e.g. Pillow/"
            "torchaudio) not present in this environment; use decoder='fake'"
        )
    if decoder != "fake":
        raise ValueError(f"unknown decoder: {decoder}")

    from alerta_spark._ship import ensure_shipped

    ensure_shipped(df.sparkSession)

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    dim = FEATURE_DIM

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained (no alerta_spark import on the worker) so the
        # closure pickles by value regardless of executor PYTHONPATH
        import hashlib as _hashlib

        import pandas as _pd

        def _decode(data: bytes) -> list[float]:
            d = _hashlib.sha256(data or b"").digest()
            return [
                int.from_bytes(d[2 * i : 2 * i + 2], "big") / 65535.0
                for i in range(dim)
            ]

        for pdf in batches:
            datas = pdf["_data"]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["_id"],
                    "n_bytes": datas.map(lambda b: len(b) if b is not None else 0),
                    "features": datas.map(lambda b: _decode(b or b"")),
                }
            )

    slim = df.select(
        F.col(id_col).alias("_id"), F.col(f"{media_col}.data").alias("_data")
    )
    return slim.mapInPandas(fn, out_schema)


def media_summary(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Pure-JVM metadata projection over the media column (no decode):
    per-kind/format byte stats — the query you run before committing a
    decode pass over 100 TB."""
    return (
        df.select(
            F.col(f"{media_col}.meta.kind").alias("kind"),
            F.col(f"{media_col}.meta.format").alias("format"),
            F.length(F.col(f"{media_col}.data")).alias("n_bytes"),
        )
        .groupBy("kind", "format")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("n_bytes").alias("max_bytes"),
        )
    )


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    every_ms: int = 1000,
) -> DataFrame:
    """Video frame-sampling plumbing: expand each media row into frame
    timestamps (decode stubbed — emits frame offsets only). Shows the
    1->N mapInPandas/explode shape a real sampler uses."""
    dur = F.coalesce(F.col(f"{media_col}.meta.duration_ms"), F.lit(0))
    return df.select(
        F.col(id_col),
        F.explode(
            F.when(
                dur > 0, F.sequence(F.lit(0), dur - 1, F.lit(every_ms))
            ).otherwise(F.array(F.lit(0)))
        ).alias("frame_ms"),
    )


def resize_images(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    target: tuple[int, int] = (224, 224),
    decoder: str = "fake",
) -> DataFrame:
    """Image resize plumbing over mapInPandas: 1->1 rows, binary in /
    binary out with updated metadata. The pixel work is stubbed
    (`decoder='fake'` re-emits a deterministic digest-truncated payload
    with the target dims; `decoder='real'` names the library it
    needs) — the Arrow batch path, output schema and metadata rewrite
    are the production shape."""
    if decoder == "real":
        raise NotImplementedError(
            "real resize requires an imaging library (e.g. Pillow) not "
            "present in this environment; use decoder='fake'"
        )
    if decoder != "fake":
        raise ValueError(f"unknown decoder: {decoder}")

    from alerta_spark._ship import ensure_shipped

    ensure_shipped(df.sparkSession)

    tw, th = int(target[0]), int(target[1])
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField(
                "media",
                T.StructType(
                    [
                        T.StructField("data", T.BinaryType()),
                        T.StructField("meta", MEDIA_META),
                    ]
                ),
            ),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd

        def _resize(b):
            b = bytes(b or b"")
            # deterministic stand-in for decoded+resized pixels
            return _hl.sha256(b).digest() * 4

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["_id"],
                    "media": [
                        {
                            "data": _resize(d),
                            "meta": {
                                "kind": "image",
                                "format": "fake-resized",
                                "width": tw,
                                "height": th,
                                "duration_ms": None,
                            },
                        }
                        for d in pdf["_data"]
                    ],
                }
            )

    slim = df.select(
        F.col(id_col).alias("_id"), F.col(f"{media_col}.data").alias("_data")
    )
    return slim.mapInPandas(fn, out_schema)
