"""Group-count along a dotted key path, sorted descending.

Rebuild of the reference's one aggregation operator ``mostCommon``
(utils/mostcommon.py:40-56): enumerate values at ``aggregation_key``
across events, count per value, sort by count desc.

Spark shape: hash aggregate with map-side partial aggregation +
whole-stage codegen — a single shuffle on the group key. Events whose
key path is missing contribute nothing (reference semantics,
utils/mostcommon.py:51-54). Divergence (SURVEY.md §1.4-1): the
reference matches the path as a *set* of components; we use the exact
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alerta_spark.paths import path_col


def most_common(df: DataFrame, aggregation_key: str) -> DataFrame:
    """-> DataFrame[value: string, count: long] ordered by count desc.

    The sort is a presentation detail (Counter.most_common); downstream
    trigger evaluation is order-independent, so callers that only need
    the counts can drop the orderBy and avoid the extra exchange.
    """
    key = path_col(df, aggregation_key).cast("string")
    return (
        df.where(key.isNotNull())
        .groupBy(key.alias("value"))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc("value"))
    )
