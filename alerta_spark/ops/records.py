"""Entity resolution survivorship: the "golden record".

After matching/dedup (fuzzy join, containment, canonical cut) the
remaining per-entity rows must collapse to ONE record; survivorship
picks, per attribute, the value from the latest row where that
attribute is present. The classic implementation is a per-attribute
window + self-join per column; here every attribute resolves inside
ONE partial+final aggregate over the key — `max` of a
(order, tiebreak, value) struct built only WHEN the value is non-null
— so the whole golden-record build is a single key exchange no matter
how many attributes survive.

Determinism: the struct comparison is lexicographic on
(order, tiebreak); with a unique tiebreak (event id) the winning row
is unique, so the result is engine-exact and the catalog entry
hash-checks against a definitional row_number oracle.

Reference provenance: no analogue (the reference stores alert docs
whole); entity-resolution extension, pairs with
dedup_fuzzy_levenshtein / keep_canonical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def golden_record(
    df: DataFrame,
    key_col: str,
    order_col: Column,
    tiebreak_col: Column,
    attrs: dict[str, Column],
) -> DataFrame:
    """-> [key, n_rows, *attrs]: per key, each attr's value from the
    latest (order, tiebreak) row where the attr is non-null (NULL if
    never present)."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for name, col in attrs.items():
        picked = F.max(
            F.when(
                col.isNotNull(),
                F.struct(
                    order_col.alias("_o"),
                    tiebreak_col.alias("_t"),
                    col.alias("_v"),
                ),
            )
        )
        aggs.append(picked.getField("_v").alias(name))
    return df.groupBy(key_col).agg(*aggs)
