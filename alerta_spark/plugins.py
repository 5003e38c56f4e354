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
    (reference: event_criteria_values, utils/plugins.py:12-29).

    NULL-free by construction: a NULL category (reference: skipped by
    the isinstance-str check) or a NULL tag element must not enter the
    array — ``arrays_overlap`` returns NULL (not false) when there is
    no common element and either side contains a null, and a NULL
    match bit inverts to NULL in ``drop_when``'s filter, silently
    DELETING rows the plugin never matched."""
    toks: list[Column] = [F.array(*[F.lit(c) for c in df.columns])]
    if "tags" in df.columns:
        toks.append(
            F.filter(
                F.coalesce(F.col("tags"), F.array().cast("array<string>")),
                lambda t: t.isNotNull(),
            )
        )
    if "category" in df.columns:
        toks.append(
            F.when(
                F.col("category").isNotNull(), F.array(F.col("category"))
            ).otherwise(F.array().cast("array<string>"))
        )
    for c in extra_cols:
        cast = F.col(c).cast("string")
        toks.append(
            F.when(cast.isNotNull(), F.array(cast)).otherwise(
                F.array().cast("array<string>")
            )
        )
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
        # coalesce: belt-and-braces against any NULL leaking out of
        # arrays_overlap — the match bit must be two-valued (the
        # reference's `send` is a plain bool)
        return F.coalesce(F.arrays_overlap(event_tokens(df), reg), F.lit(False))

    def apply(self, df: DataFrame) -> DataFrame:
        """Run the chain (reference: send_event_to_plugins,
        utils/plugins.py:64-108). Each plugin sees the previous
        plugin's output; matched rows gain the plugin name in
        ``plugins``.

        The match bit is MATERIALIZED as a column before the transform
        runs: the reference decides ``send`` on the PRE-transform event
        and appends the executed plugin's name unconditionally after it
        runs — re-evaluating the routing predicate against the
        transformed frame would skip provenance for any plugin that
        rewrites its own routing field (and could fail to resolve if
        the transform renames it)."""
        out = df
        if "plugins" not in out.columns:
            out = out.withColumn("plugins", F.array().cast("array<string>"))
        for p in self.plugins:
            out = out.withColumn("__matched", self.matched(out, p))
            out = p.transform(out, F.col("__matched"))
            if "plugins" in out.columns and "__matched" in out.columns:
                out = out.withColumn(
                    "plugins",
                    F.when(
                        F.col("__matched"),
                        F.array_union("plugins", F.array(F.lit(p.name))),
                    ).otherwise(F.col("plugins")),
                )
            if "__matched" in out.columns:
                out = out.drop("__matched")
        return out


def row_plugin_transform(
    on_message: Callable,
    module_file: str | None = None,
    metadata: dict | None = None,
) -> Callable[[DataFrame, Column], DataFrame]:
    """Adapt a reference-style ``onMessage(event_dict, metadata)`` row
    plugin to a chain transform (the full-generality slow path — column
    plugins should use expressions instead).

    Semantics pinned to send_event_to_plugins (reference
    utils/plugins.py:64-108): the plugin sees a dict per matched event,
    may mutate values, and returning ``None`` (or a ``(None, meta)``
    tuple) drops the event. Spark frames have a fixed schema, so value
    edits apply to existing columns only; new keys are ignored
    (documented divergence — the reference's events are schemaless
    Mongo docs).

    Arrow moves the batch; the per-row dict loop runs only over rows
    the routing predicate matched, so an unmatched partition slice
    passes through columnar.
    """

    def _t(df: DataFrame, matched: Column) -> DataFrame:
        import pandas as pd

        if module_file:
            # ship the plugin module so executors can unpickle the
            # bound method (its module is not on their sys.path)
            df.sparkSession.sparkContext.addPyFile(module_file)
        schema = df.schema
        cols = [f.name for f in schema.fields]
        # chain-internal dunder columns (e.g. the materialized match
        # bit) ride through the batch but are NOT part of the event
        # dict a reference-style plugin sees
        vis = [c for c in cols if not c.startswith("__")]
        with_m = df.withColumn("__pm", matched)

        def run(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                m = pdf["__pm"].fillna(False).astype(bool).to_numpy()
                if not m.any():
                    yield pdf[cols]
                    continue
                out_rows = []
                for i in range(len(pdf)):
                    row = pdf.iloc[i]
                    if not m[i]:
                        out_rows.append(row[cols])
                        continue
                    res = on_message(
                        {c: row[c] for c in vis}, dict(metadata or {})
                    )
                    ev = res[0] if isinstance(res, tuple) else res
                    if ev is None:
                        continue  # drop signal
                    out_rows.append(
                        pd.Series({c: ev.get(c, row[c]) for c in cols})
                    )
                yield (
                    pd.DataFrame(out_rows)[cols]
                    if out_rows
                    else pdf.iloc[0:0][cols]
                )

        return with_m.mapInPandas(run, schema)

    return _t


def register_plugins(
    directory: str, chain: PluginChain | None = None
) -> PluginChain:
    """Directory-scan plugin discovery (reference register_plugins,
    utils/plugins.py:32-61): import every module in ``directory``; a
    module exposing a ``message`` class contributes an instance whose
    ``registration`` token list routes it and whose ``priority``
    (default 100) orders it. Registration tokens are lowercased, as in
    the reference's matching loop. Import failures raise ImportError,
    matching the reference."""
    import importlib
    import os
    import pkgutil
    import sys

    chain = chain or PluginChain()
    if not os.path.exists(directory):
        return chain
    if directory not in sys.path:
        sys.path.insert(0, directory)
    for _finder, name, _ispkg in pkgutil.iter_modules([directory]):
        try:
            module = importlib.import_module(name)
            if "message" not in dir(module):
                continue
            mclass = module.message()
            mreg = mclass.registration
            if not isinstance(mreg, list):
                continue
            chain.register(
                name,
                [str(t).lower() for t in mreg],
                row_plugin_transform(
                    mclass.onMessage, getattr(module, "__file__", None)
                ),
                priority=int(getattr(mclass, "priority", 100)),
            )
        except Exception as e:
            raise ImportError(f"Unable to load module {name}") from e
    return chain


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
