"""Deterministic sampling and dataset splitting for training-data
pipelines.

Spark's ``df.sample``/``sampleBy``/``randomSplit`` draw from a
per-task RNG: a retried or re-scheduled task can emit a DIFFERENT
subset, and two runs over the same lake disagree — which at training
scale means silent train/test leakage across pipeline versions. These
operators instead band the md5 of a stable key: membership is a pure
function of the row, so every rerun, every engine (md5 is identical
in Spark and DuckDB — the oracle checks these exactly), and every
retry agrees.

All map-only: no shuffle, no RNG state, fully pushdown-friendly
(the predicate is a string comparison on a hash prefix).

Reference provenance: the reference has no sampling tier (its engine
processes alert batches, alerta.py:168-209 caps at 1000 rows); these
are part of the training-data extension surface, same family as
ops/dedupe and ops/text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 8 hex chars = 32 bits of hash space; banding resolution 1/2^32
_SPACE = 16**8


def _threshold(fraction: float) -> str:
    """Lexical threshold for an 8-hex-char bucket. 'g' sorts after
    every hex digit, so fraction >= 1.0 keeps everything (a 9-char
    '100000000' would lexically EXCLUDE buckets starting a-f)."""
    if fraction >= 1.0:
        return "g"
    return format(int(fraction * _SPACE), "08x")


def _bucket(key: Column, salt: str) -> Column:
    """The first 8 hex chars of md5(key || salt) — an 8-char lowercase
    hex string, uniform over the 32-bit space, identical across
    engines."""
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8)


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by md5(key) prefix band.

    Deterministic: the same (key, salt) is always in or always out —
    stable under task retry, cluster resize, and engine choice.
    Different ``salt`` values draw independent samples (use a new salt
    per epoch to rotate subsets WITHOUT storing state)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return df
    return df.where(_bucket(F.col(key_col), salt) < F.lit(_threshold(fraction)))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Assign every row to exactly one named split by cumulative
    md5-prefix bands (e.g. ``{"train": .8, "eval": .1, "test": .1}``).

    The deterministic analogue of ``randomSplit``: splits are disjoint,
    cover every row, and a row's split never changes across reruns —
    the property that prevents train/test leakage when a pipeline is
    re-executed. Adds a ``split`` column."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    bucket = _bucket(F.col(key_col), salt)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = bucket < F.lit(_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def stratified_deterministic_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """``sampleBy`` made deterministic: per-stratum keep fractions via
    the same md5 banding (e.g. downsample boilerplate-heavy sources,
    keep all of scarce ones — the standard training-mix rebalance).
    Strata not listed keep ``default_fraction``."""
    bucket = _bucket(F.col(key_col), salt)
    thresh = None
    for stratum, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {stratum!r} must be in [0, 1]")
        t = F.lit(_threshold(frac))
        cond = F.col(strata_col).cast("string") == str(stratum)
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = (
        thresh.otherwise(F.lit(_threshold(default_fraction)))
        if thresh is not None
        else F.lit(_threshold(default_fraction))
    )
    return df.where(bucket < thresh)
