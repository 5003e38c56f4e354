"""Event-transform plugin framework (U1-U2, F11 in SURVEY.md §2.8).

The reference routes each event through registered plugins in priority
order; a plugin declares a ``registration`` token list and runs when it
intersects the event's keys ∪ tags ∪ category (or contains ``"*"``);
``onMessage`` may transform the event or drop it by returning None, and
executed plugin names are appended to ``event["plugins"]``
(utils/plugins.py:12-108).

Spark-native translation: each plugin is a DataFrame→DataFrame
transform applied in priority order. Routing is a column predicate
(``arrays_overlap`` on a precomputed token array — JVM-side, no
Python); the transform body is whatever the plugin does:

- column plugins (the fast path): ``with_columns``-style expressions
  applied under ``F.when(matched, ...)``;
- row plugins (full generality): an Arrow-batched ``mapInPandas`` over
  only the matched partition slice.

Provenance: ``plugins`` array column gains the plugin name on match;
drops are ``filter``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def event_tokens(df: DataFrame, extra_cols: tuple[str, ...] = ()) -> Column:
    """The routing token set: top-level field names ∪ tags ∪ category
    (reference: event_criteria_values, utils/plugins.py:12-29)."""
    toks: list[Column] = [F.array(*[F.lit(c) for c in df.columns])]
    if "tags" in df.columns:
        toks.append(F.coalesce(F.col("tags"), F.array().cast("array<string>")))
    if "category" in df.columns:
        toks.append(F.array(F.col("category")))
    for c in extra_cols:
        toks.append(F.array(F.col(c).cast("string")))
    out = toks[0]
    for t in toks[1:]:
        out = F.concat(out, t)
    return out


@dataclass(order=True)
class Plugin:
    priority: int
    name: str = field(compare=False)
    registration: list[str] = field(compare=False)
    # column-wise transform: fn(df, matched: Column) -> DataFrame
    transform: Callable[[DataFrame, Column], DataFrame] = field(compare=False)


class PluginChain:
    """Ordered plugin registry (reference: register_plugins,
    utils/plugins.py:32-61; default priority 100)."""

    def __init__(self) -> None:
        self.plugins: list[Plugin] = []

    def register(
        self,
        name: str,
        registration: list[str],
        transform: Callable[[DataFrame, Column], DataFrame],
        priority: int = 100,
    ) -> None:
        self.plugins.append(Plugin(priority, name, registration, transform))
        self.plugins.sort()

    def matched(self, df: DataFrame, plugin: Plugin) -> Column:
        if "*" in plugin.registration:
            return F.lit(True)
        reg = F.array(*[F.lit(t) for t in plugin.registration])
        return F.arrays_overlap(event_tokens(df), reg)

    def apply(self, df: DataFrame) -> DataFrame:
        """Run the chain (reference: send_event_to_plugins,
        utils/plugins.py:64-108). Each plugin sees the previous
        plugin's output; matched rows gain the plugin name in
        ``plugins``."""
        out = df
        if "plugins" not in out.columns:
            out = out.withColumn("plugins", F.array().cast("array<string>"))
        for p in self.plugins:
            m = self.matched(out, p)
            out = p.transform(out, m)
            if "plugins" in out.columns:
                out = out.withColumn(
                    "plugins",
                    F.when(m, F.array_union("plugins", F.array(F.lit(p.name)))).otherwise(
                        F.col("plugins")
                    ),
                )
        return out


def drop_when(predicate: Column) -> Callable[[DataFrame, Column], DataFrame]:
    """Helper: a plugin body that drops matched rows satisfying
    `predicate` (onMessage returning None)."""

    def _t(df: DataFrame, matched: Column) -> DataFrame:
        return df.where(~(matched & predicate))

    return _t


def with_column_when(name: str, value: Column) -> Callable[[DataFrame, Column], DataFrame]:
    """Helper: a plugin body that sets a column on matched rows."""

    def _t(df: DataFrame, matched: Column) -> DataFrame:
        existing = F.col(name) if name in df.columns else F.lit(None)
        return df.withColumn(name, F.when(matched, value).otherwise(existing))

    return _t
