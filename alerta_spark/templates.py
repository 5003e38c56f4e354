"""Mustache-template compilation.

The reference renders alert summaries / event snippets / slot criteria
with chevron (mustache) against the alert document (alerta.py:234, 291,
404-409, 453-458). Template variables are plain dotted paths —
``{{metadata.count}}``, ``{{events.0.details.user_name}}``,
``{{slots.0.events.0.details.user_name}}`` — no sections/partials are
used anywhere in the reference rule corpus.

Two implementations:

- :func:`template_col` — compiles the template to a single Column
  expression (``concat`` of literals and path lookups), so rendering
  runs JVM-side inside whole-stage codegen. Missing paths render as
  empty string (mustache semantics).
- :func:`render_py` — driver-side renderer for small state documents
  (sequence slot criteria parameterization), dict/list walking with the
  same semantics.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from alerta_spark.paths import resolve_path

_TOKEN = re.compile(r"\{\{\s*([^{}]+?)\s*\}\}")


def _fmt(col: Column, dtype: T.DataType) -> Column:
    """Render a resolved path value the way str() would.

    Booleans: when/when, NOT when/otherwise — otherwise('False') would
    swallow NULL into 'False' (a fabricated value in an alert summary)
    instead of leaving it for the coalesce to render as the mustache
    silent-miss ''. Known divergence (unexercised by the rule corpus):
    doubles outside ~1e-4..1e7 render in Spark's E-notation
    ('1.0E10') where Python str() gives '10000000000.0'."""
    if isinstance(dtype, T.BooleanType):
        s = F.when(col, "True").when(~col, "False")
    else:
        s = col.cast("string")
    return F.coalesce(s, F.lit(""))


def template_parts(template: str) -> list[tuple[str, str]]:
    """Parse into [(kind, text)] where kind is 'lit' or 'var'."""
    parts: list[tuple[str, str]] = []
    pos = 0
    for m in _TOKEN.finditer(template):
        if m.start() > pos:
            parts.append(("lit", template[pos : m.start()]))
        parts.append(("var", m.group(1)))
        pos = m.end()
    if pos < len(template):
        parts.append(("lit", template[pos:]))
    return parts


def template_col(template: str, root: Column, dtype: T.StructType) -> Column:
    """Compile `template` against a struct-typed expression `root`."""
    cols: list[Column] = []
    for kind, text in template_parts(template):
        if kind == "lit":
            cols.append(F.lit(text))
        else:
            val, vtype = resolve_path(root, dtype, [p for p in text.split(".") if p])
            cols.append(_fmt(val, vtype))
    if not cols:
        return F.lit("")
    return F.concat(*cols) if len(cols) > 1 else cols[0].cast("string")


def template_vars(template: str) -> list[str]:
    """All dotted variable paths referenced by the template."""
    return [text for kind, text in template_parts(template) if kind == "var"]


def _lookup(ctx: Any, parts: list[str]) -> Any:
    cur = ctx
    for p in parts:
        if isinstance(cur, str):
            # JSON-string payload (the lake's `details`/`props` column);
            # the reference json-decodes it client-side (alerta.py:352)
            import json

            try:
                cur = json.loads(cur)
            except (ValueError, TypeError):
                return None
        if isinstance(cur, dict):
            cur = cur.get(p)
        elif isinstance(cur, (list, tuple)) and p.isdigit():
            # positive indexes only — chevron (the reference renderer)
            # gates list access on key.isdigit(), so 'items.-1' is a
            # silent miss there, in resolve_path's array branch, and
            # here alike
            i = int(p)
            cur = cur[i] if i < len(cur) else None
        else:
            return None
        if cur is None:
            return None
    return cur


def render_py(template: str, ctx: Any) -> str:
    """Driver-side mustache render (variables only, silent miss)."""
    out: list[str] = []
    for kind, text in template_parts(template):
        if kind == "lit":
            out.append(text)
        else:
            val = _lookup(ctx, [p for p in text.split(".") if p])
            out.append("" if val is None else str(val))
    return "".join(out)
