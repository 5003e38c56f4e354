"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed through Arrow-batched
``mapInPandas``.

The decode step ships two bodies behind one seam: ``decoder="fake"``
(deterministic: derives pseudo-metadata and a feature vector from the
bytes — always available) and ``decoder="real"``, which probes for
Pillow at call time (:func:`pil_available`) and routes through it when
present; in this build sandbox no imaging/audio libraries exist, so
"real" raises NotImplementedError here and the Pillow path is
exercised only on clusters that have it. Everything Spark-side is real
and tested either way: the schema, the Arrow batch path, the
partitioning, and the UDF signatures.

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


def pil_available() -> bool:
    """Probe for Pillow — the real-decoder seam. The sandbox this repo
    is built in has no imaging libraries, so ``decoder="real"`` raises
    NotImplementedError there; on a cluster with Pillow installed the
    SAME call sites route through it with no code change."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


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
    function is the ONLY Python in the pipeline. ``decoder="real"``
    routes through Pillow when it is importable (4x4 grayscale
    thumbnail -> FEATURE_DIM floats in [0,1]) and raises
    NotImplementedError when it is not (this build sandbox has no
    imaging libraries); ``decoder="fake"`` is the deterministic
    digest-derived stand-in either way.
    """
    if decoder == "real":
        if not pil_available():
            raise NotImplementedError(
                "real decode requires an imaging library (Pillow) not "
                "present in this environment; use decoder='fake'"
            )
    elif decoder != "fake":
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
    use_real = decoder == "real"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained (no alerta_spark import on the worker) so the
        # closure pickles by value regardless of executor PYTHONPATH
        import hashlib as _hashlib

        import pandas as _pd

        if use_real:
            import io as _io

            from PIL import Image as _Image

            side = int(dim**0.5)  # FEATURE_DIM=16 -> 4x4 thumbnail

            def _decode(data: bytes) -> list[float]:
                im = _Image.open(_io.BytesIO(data)).convert("L")
                px = im.resize((side, side)).getdata()
                return [p / 255.0 for p in px]

        else:

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
    binary out with updated metadata. `decoder='fake'` re-emits a
    deterministic digest-truncated payload with the target dims;
    `decoder='real'` routes through Pillow when importable (decode ->
    RGB resize -> PNG bytes) and raises NotImplementedError when not
    (this build sandbox has no imaging libraries) — the Arrow batch
    path, output schema and metadata rewrite are the production shape
    either way."""
    if decoder == "real":
        if not pil_available():
            raise NotImplementedError(
                "real resize requires an imaging library (Pillow) not "
                "present in this environment; use decoder='fake'"
            )
    elif decoder != "fake":
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

    use_real = decoder == "real"
    out_format = "png" if use_real else "fake-resized"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd

        if use_real:
            import io as _io

            from PIL import Image as _Image

            def _resize(b):
                im = _Image.open(_io.BytesIO(bytes(b or b"")))
                buf = _io.BytesIO()
                im.convert("RGB").resize((tw, th)).save(buf, format="PNG")
                return buf.getvalue()

        else:

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
                                "format": out_format,
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



def ahash64(col) -> "F.Column":
    """64-bit average-hash (aHash) of a char stream — the perceptual
    near-dup key that survives re-encoding and small edits where a
    content digest does not. The stream splits into 64 cells (cell of
    position i0 = i0*64 // n, integer arithmetic — the SAME
    formulation the oracle uses); bit_j is 1 iff cell j's mean exceeds
    the global mean, compared EXACTLY by integer cross-multiplication
    (sum_j * n > total * len_j — no division, no float), with bit 63
    as the two's-complement sign weight so the value is engine-exact
    BIGINT everywhere.

    Implementation is the module's documented genuinely-numeric case:
    a vectorized pandas UDF (codepoints via one utf-32 reinterpret,
    cell sums via np.bincount per Arrow batch). A pure column-
    expression fold computes the identical value but runs ~1000x
    slower: higher-order-function lambdas are interpreted per element,
    outside whole-stage codegen — same reason LSH bucketing is numpy
    (README '63x' note). The DuckDB oracle rebuilds every bit from the
    same integer formulation, so the UDF is hash-checked end to end.

    With real codecs the identical thresholding runs over decoded
    pixel rows.
    """
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("long")
    def _ah(series: pd.Series) -> pd.Series:
        out = []
        for txt in series:
            if not txt:
                out.append(0)
                continue
            a = np.frombuffer(
                txt.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            n = a.size
            idx = (np.arange(n, dtype=np.int64) * 64) // n
            sums = np.bincount(idx, weights=a, minlength=64).astype(np.int64)
            cnts = np.bincount(idx, minlength=64).astype(np.int64)
            total = int(a.sum())
            bits = (sums * n) > (total * cnts)
            h = 0
            for j in range(63):
                if bits[j]:
                    h += 1 << j
            if bits[63]:
                h -= 1 << 63
            out.append(h)
        return pd.Series(out, dtype="int64")

    return _ah(F.col(col) if isinstance(col, str) else col)


def media_ahash_near_dups(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    max_hamming: int = 6,
    bands: int = 4,
) -> DataFrame:
    """Perceptual near-duplicate pairs over the media column: aHash ->
    pigeonhole banding (hamming <= 6 over 64 bits means at least one
    16-bit band matches exactly) -> exact hamming verify with
    bit_count(xor). Same candidate discipline as SimHash: band-bucket
    equi-joins only, never all-pairs.

    -> [id_a, id_b, hamming]."""
    sig = df.select(
        F.col(id_col).alias("_id"),
        ahash64(F.col(media_col)["data"].cast("string")).alias("_h"),
    )
    width = 64 // bands
    banded = sig.select(
        "_id",
        "_h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.shiftrightunsigned(F.col("_h"), k * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for k in range(bands)
                ]
            )
        ).alias("b"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.b.band") == F.col("b.b.band"))
            & (F.col("a.b.key") == F.col("b.b.key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._h").alias("_ha"),
            F.col("b._h").alias("_hb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    return (
        cands.withColumn("hamming", ham.cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
