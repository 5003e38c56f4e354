"""Trino/Presto criteria dialect → Spark SQL.

The reference ships each rule's ``criteria`` verbatim to Athena
(Trino SQL; reference: alerta.py:114-161). The observed criteria
surface (SURVEY.md §2.6 C1-C3) is:

- ``json_extract_scalar(col, '$.path')``  → Spark ``get_json_object``
- ``CAST(x AS INTEGER)``                   → identical in Spark SQL
- ``position(s IN t)``                     → identical in Spark SQL
- comparison / AND / OR / parentheses      → identical

So the shim is a single function rename plus a small alias table kept
for future Trino functions. We rewrite tokens outside of string
literals only.
"""

from __future__ import annotations

import re

# Trino function name -> Spark function name (identity entries are
# documented no-ops so the supported surface is explicit).
_FUNCTION_ALIASES = {
    "json_extract_scalar": "get_json_object",
    "json_extract": "get_json_object",
    "strpos": "instr",
    "codepoint": "ascii",
}

_TOKEN = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _split_literals(sql: str) -> list[tuple[str, bool]]:
    """Split into (chunk, is_string_literal) preserving order."""
    out: list[tuple[str, bool]] = []
    buf: list[str] = []
    i, n = 0, len(sql)
    in_str = False
    while i < n:
        ch = sql[i]
        if not in_str:
            if ch == "'":
                out.append(("".join(buf), False))
                buf = [ch]
                in_str = True
            else:
                buf.append(ch)
        else:
            buf.append(ch)
            if ch == "'":
                # '' is an escaped quote inside the literal
                if i + 1 < n and sql[i + 1] == "'":
                    buf.append("'")
                    i += 1
                else:
                    out.append(("".join(buf), True))
                    buf = []
                    in_str = False
        i += 1
    if buf:
        out.append(("".join(buf), in_str))
    return out


def trino_to_spark(criteria: str) -> str:
    """Rewrite a Trino WHERE-fragment into Spark SQL.

    Only function names are touched, and only outside string literals.
    """
    parts = []
    for chunk, is_lit in _split_literals(criteria):
        if is_lit:
            parts.append(chunk)
        else:
            parts.append(
                _TOKEN.sub(
                    lambda m: _FUNCTION_ALIASES.get(m.group(0).lower(), m.group(0)),
                    chunk,
                )
            )
    return "".join(parts)
