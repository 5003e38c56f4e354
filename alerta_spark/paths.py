"""Dotted-path resolution over DataFrame schemas.

The reference addresses nested event fields by dotted string path with
silent-miss semantics (DotDict.get -> None, utils/dotdict.py:14-22;
getValueByPath, utils/mostcommon.py:28-37). Events in the lake keep
their payload (``details`` / ``props``) as a JSON *string*, parsed
client-side (alerta.py:351-353).

Here a dotted path compiles to a Column expression:

- struct fields are walked natively (``a.b.c`` -> ``F.col("a.b.c")``);
- array index segments (``events.0.x``) -> ``element_at(col, i+1)``;
- map segments -> ``element_at(map, key)`` (NULL on miss);
- when the walk lands on a **string** column with path remaining, the
  rest resolves through ``get_json_object`` (NULL on miss) — exactly
  the reference's JSON-payload semantics;
- a path that doesn't exist at all compiles to ``lit(NULL)`` (the
  DotDict silent miss).

NOTE (documented divergence, SURVEY.md §1.4-1): the reference's
``mostCommon`` matches aggregation keys by *set* of path components
(order-insensitive). We use exact paths.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def resolve_path(expr: Column, dtype: T.DataType, parts: list[str]) -> tuple[Column, T.DataType]:
    """Walk `parts` starting from (expr, dtype); silent-miss -> lit(NULL)."""
    if not parts:
        return expr, dtype
    head, rest = parts[0], parts[1:]

    if isinstance(dtype, T.StructType):
        field = next((f for f in dtype.fields if f.name == head), None)
        if field is None:
            return F.lit(None).cast("string"), T.StringType()
        return resolve_path(expr.getField(head), field.dataType, rest)

    if isinstance(dtype, T.ArrayType):
        # POSITIVE digit indexes only — chevron (the reference's
        # renderer) gates list access on key.isdigit(), so 'items.-1'
        # is a silent miss there and must be one here (and in the
        # JSON-string branch below, and in templates._lookup — all
        # three agree). try_element_at, NOT element_at: ANSI mode
        # (default-on in Spark 4) makes element_at THROW on an
        # out-of-range index, which would abort the job where the
        # contract is NULL-on-miss.
        if head.isdigit():
            # mustache paths are 0-based; element_at is 1-based
            child = F.try_element_at(expr, F.lit(int(head) + 1))
            return resolve_path(child, dtype.elementType, rest)
        return F.lit(None).cast("string"), T.StringType()

    if isinstance(dtype, T.MapType):
        # try_element_at: ANSI element_at throws INVALID_MAP_KEY on a
        # missing key; the contract is NULL
        child = F.try_element_at(expr, F.lit(head).cast(dtype.keyType))
        return resolve_path(child, dtype.valueType, rest)

    if isinstance(dtype, T.StringType):
        # JSON-string payload: resolve the remainder via get_json_object.
        # Digit segments compile to [i] array indexes ('items.0' ->
        # '$.items[0]'), keeping template_col in agreement with the
        # python-side _lookup on array paths.
        json_path = "$"
        for p in [head] + rest:
            json_path += f"[{int(p)}]" if p.isdigit() else "." + p
        return F.get_json_object(expr, json_path), T.StringType()

    # scalar with path remaining -> miss
    return F.lit(None).cast("string"), T.StringType()


def path_col(df_or_schema: DataFrame | T.StructType, path: str) -> Column:
    """Compile a dotted path against a DataFrame/schema to a Column."""
    schema = df_or_schema.schema if isinstance(df_or_schema, DataFrame) else df_or_schema
    parts = [p for p in path.split(".") if p]
    if not parts:
        return F.lit(None).cast("string")
    head, rest = parts[0], parts[1:]
    field = next((f for f in schema.fields if f.name == head), None)
    if field is None:
        return F.lit(None).cast("string")
    expr, _ = resolve_path(F.col(head), field.dataType, rest)
    return expr


def composite_key_col(df: DataFrame, paths: list[str]) -> Column:
    """The multi-variable composite join key: the JSON array string of
    the (string-cast) path values. The doc-side twin is
    ``sequence_frames._composite_value`` — a HAND-ROLLED encoder
    mirroring Jackson's escape rules, NOT ``json.dumps`` (Python
    emits lowercase hex in ``\\uXXXX`` control-char escapes where
    Jackson emits uppercase, so a json.dumps encoder silently breaks
    the join for values containing U+000B/U+000E/U+000F/U+001A-
    U+001F; byte parity is pinned over all 32 control chars in
    tests). NULL when ANY component is NULL: each component stands
    for an equality conjunct, and SQL equality cannot match NULL.
    Shared by the fused sequence tier's event-side grouping
    (``fused_grouped(composite_keys=...)``) and the streaming
    correlators' composite correlation keys."""
    arr = F.array(*[path_col(df, p).cast("string") for p in paths])
    return F.when(~F.exists(arr, lambda x: x.isNull()), F.to_json(arr))


def path_value(expr: Column, dtype: T.DataType, path: str) -> Column:
    """Like path_col but relative to an arbitrary expression (e.g. a
    lambda variable inside transform())."""
    parts = [p for p in path.split(".") if p]
    out, _ = resolve_path(expr, dtype, parts)
    return out


def _flatten_query(query: dict, prefix: str = "") -> list[tuple[str, object]]:
    out: list[tuple[str, object]] = []
    for k, v in query.items():
        path = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.extend(_flatten_query(v, path))
        else:
            out.append((path, v))
    return out


def dict_match(df: DataFrame, query: dict) -> Column:
    """F10 ``dict_match``/``sub_dict`` (utils/dict_helpers.py:63-76): true
    when every (possibly nested) key/value in `query` is present in the
    row. Compiles to an AND of path-column comparisons — pure codegen,
    no UDF. The reference compares post-json.loads PYTHON values
    (sub_dict: ``v == d[k]``), so the compiled comparison is typed per
    query value: booleans compare against the JSON/cast rendering
    'true'/'false' (Python str(True)='True' would NEVER match — both
    get_json_object and a boolean cast yield lowercase); ints/floats
    compare numerically via try_cast (Python 1 == 1.0 is true, and
    ANSI cast of a non-numeric string must yield NULL, not throw);
    strings compare as strings."""
    pred = F.lit(True)
    for path, value in _flatten_query(query):
        col = path_col(df, path)
        if value is None:
            cond = col.isNull()
        elif isinstance(value, bool):  # BEFORE int: bool is an int
            cond = col.cast("string") == F.lit("true" if value else "false")
        elif (
            isinstance(value, (int, float))
            and (not isinstance(value, float) or math.isfinite(value))
            and abs(value) >= 2**53
            and int(value) == value
        ):
            # floats >= 2^53 are ALL integral doubles, so a big float
            # query is semantically the int query int(value): Python's
            # float == int is an exact real comparison, and routing it
            # through the lossy double cast would round an int column
            # 9007199254740993 onto the query 9007199254740992.0 —
            # the same neighboring-snowflake false positive the int
            # branch below exists to prevent
            value = int(value)
            # >= because 2^53 itself, though exactly representable,
            # shares its double with 2^53+1 — the double path would
            # match both. From 2^53 on a double cannot represent every
            # neighboring integer, so
            # the double path would match neighboring values (snowflake
            # ids differing in the low bits compare equal after
            # rounding) where the reference's Python == is exact.
            # decimal(38,0) keeps 38 exact digits. The rlike guard
            # restricts the match to integer-rendered values: without
            # it, cast-to-decimal ROUNDS ("...993.4" -> ...993), which
            # would fabricate a match Python == rejects. Garbage
            # strings try_cast to NULL and fail the match.
            # try_cast on the LITERAL side too: a query int wider than
            # 38 digits must compare as "no match" (NULL equality),
            # not throw an ANSI overflow at execution. The OR'd exact
            # string equality covers >38-digit values (both try_casts
            # NULL out, but Python == on the equal ints is True; SQL
            # NULL | true = true keeps the match).
            # Zero-fraction renderings ("…993.00", a DECIMAL-typed
            # column writing an integral value) are exactly-known
            # integers too, so they take THIS exact path, not the
            # lossy double branch below — a double cast would round
            # "9007199254740993.00" onto a neighboring round-tripping
            # query int and fabricate a match the exact comparison
            # rejects. The trailing ".0*" is stripped for the literal
            # string-equality arm (>38-digit values) so
            # "…993.00" == "…993" compares equal as the ints do.
            # DOCUMENTED DIVERGENCE (deliberate, ADVICE r9): a
            # zero-fraction rendering that reached us as a raw JSON
            # NUMBER (a non-Python producer writing fixed-point,
            # {"id": 9007199254740993.00}) would be json.loads'd by
            # the reference into a ROUNDED double and match the
            # neighbor; after the string cast that source is
            # indistinguishable from an exact DECIMAL column, and we
            # resolve the ambiguity toward exactness (never match a
            # value the stored digits say is different).
            col_str = col.cast("string")
            int_norm = F.regexp_replace(col_str, r"\.0*$", "")
            cond = col_str.rlike(r"^-?\d+(\.0*)?$") & (
                (
                    col_str.try_cast("decimal(38,0)")
                    == F.lit(str(value)).try_cast("decimal(38,0)")
                )
                | (int_norm == F.lit(str(value)))
            )
            # A double-TYPED column renders in float form
            # ("9.007199254740992E15", "1.0E20") and fails the integer
            # rlike; the reference's Python == (float vs int) is an
            # exact real comparison, true iff the double equals the
            # int exactly — expressible only when the query int round-
            # trips through double (float(value) == value): then
            # double equality against lit(float(value)) IS the exact
            # comparison. A non-round-tripping int equals NO double,
            # so that branch is correctly absent. The float-form rlike
            # (an exponent, or a fraction with a NONZERO digit) keeps
            # integer-rendered strings ("9007199254740993") AND
            # zero-fraction decimal renderings ("9007199254740993.00")
            # off this branch — both are exactly-known integers served
            # by the exact path above; the double cast would round
            # them onto a neighboring value and fabricate a match.
            try:
                exact_dbl = float(value)
                round_trips = int(exact_dbl) == value
            except OverflowError:
                round_trips = False
            if round_trips:
                cond = cond | (
                    col_str.rlike(
                        r"^-?(\d+\.?\d*|\.\d+)[eE][+-]?\d+$"
                        r"|^-?\d*\.\d*[1-9]\d*$"
                    )
                    & (col_str.try_cast("double") == F.lit(exact_dbl))
                )
        elif isinstance(value, (int, float)):
            cond = col.cast("string").try_cast("double") == F.lit(float(value))
        else:
            cond = col.cast("string") == F.lit(str(value))
        pred = pred & cond
    return pred
