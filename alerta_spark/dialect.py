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
    # wider Trino surface a rule author will reach for; pure renames
    "contains": "array_contains",  # same arg order (array, elem)
    "approx_distinct": "approx_count_distinct",
    "starts_with": "startswith",
    # identical in Spark SQL (kept out of the table, documented here):
    # position(IN), CAST/TRY_CAST, cardinality, element_at (1-based in
    # both), split_part, regexp_like/regexp_extract/regexp_replace,
    # date_trunc, from_unixtime, length/lower/upper/trim, lpad/rpad,
    # coalesce/nullif/if, arrays_overlap, array_join, chr
}

# Trino calls whose ARGUMENTS must be rewritten, not just the name.
# Template placeholders: {0},{1},... = argument text verbatim;
# {0u} = argument with surrounding single quotes stripped (Trino
# passes time units as strings, Spark's timestampadd/diff take bare
# keywords).
_CALL_REWRITES = {
    "url_extract_host": "parse_url({0}, 'HOST')",
    "url_extract_path": "parse_url({0}, 'PATH')",
    "url_extract_protocol": "parse_url({0}, 'PROTOCOL')",
    "url_extract_query": "parse_url({0}, 'QUERY')",
    "url_extract_parameter": "parse_url({0}, 'QUERY', {1})",
    "date_diff": "timestampdiff({0u}, {1}, {2})",
    "date_add": "timestampadd({0u}, {1}, {2})",
    # NOT a pure rename: Trino to_unixtime returns DOUBLE epoch seconds
    # with the fraction; Spark unix_timestamp returns BIGINT seconds,
    # which would silently truncate sub-second criteria arithmetic
    # (e.g. "to_unixtime(b) - to_unixtime(a) > 0.5" never firing)
    "to_unixtime": "(unix_micros({0}) / 1000000.0)",
    "from_iso8601_timestamp": "to_timestamp({0})",
    "from_iso8601_date": "to_date({0})",
    # Trino day numbering is ISO (1=Monday..7=Sunday); Spark's
    # dayofweek is 1=Sunday..7=Saturday — a pure rename would shift
    # every weekday criteria by one, silently
    "day_of_week": "((dayofweek({0}) + 5) % 7 + 1)",
    "dow": "((dayofweek({0}) + 5) % 7 + 1)",
    "day_of_year": "dayofyear({0})",
    "doy": "dayofyear({0})",
    "week": "weekofyear({0})",
    "week_of_year": "weekofyear({0})",
}

# Trino date_parse uses MySQL %-specifiers; Spark's to_timestamp takes
# Java DateTimeFormatter patterns. Translated per-specifier; runs of
# literal text (letters, quotes, and Java-reserved punctuation) are
# coalesced into ONE quoted span — per-character quoting would merge
# adjacent quotes into escaped quotes and corrupt multi-letter
# literals ('at' became a't').
#
# Deliberately ABSENT (translation-time error beats a runtime parser
# error or a silent shift):
#   %y  — MySQL/Trino resolve 70-99 to 1970-1999; Java 'yy' resolves
#         every two-digit year to 2000-2099 (a silent century shift)
#   %W %a — weekday names need Java 'E', which Spark bans for PARSING
#   %v %x %u — week-based fields ('w' letters), banned the same way
_MYSQL_TO_JAVA = {
    "Y": "yyyy", "m": "MM", "c": "M", "d": "dd", "e": "d",
    "H": "HH", "k": "H", "h": "hh", "l": "h", "i": "mm", "s": "ss",
    "S": "ss", "f": "SSSSSS", "p": "a", "j": "DDD", "T": "HH:mm:ss",
    "M": "MMMM", "b": "MMM",
    "%": "%",
}

_SPECIFIER_HINTS = {
    "y": "two-digit years resolve to different centuries in MySQL "
         "(70-99 -> 19xx) and Java (always 20xx); use %Y or parse with "
         "to_timestamp and post-correct the century",
    "W": "Spark bans weekday-name ('E') fields when PARSING",
    "a": "Spark bans weekday-name ('E') fields when PARSING",
    "v": "Spark bans week-based fields when parsing",
    "x": "Spark bans week-based fields when parsing",
    "u": "Spark bans week-based fields when parsing",
}

# reserved in Java patterns even though non-alphabetic: '#'/'{'/'}'
# throw at runtime, '['/']' mark OPTIONAL sections (inverting Trino's
# literal-bracket semantics) — all must ride inside quoted spans
_JAVA_QUOTED_PUNCT = set("#{}[]")


def _mysql_format_to_java(fmt: str) -> str:
    out: list[str] = []
    lit: list[str] = []

    def flush() -> None:
        if lit:
            out.append("'" + "".join(lit).replace("'", "''") + "'")
            lit.clear()

    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%" and i + 1 < len(fmt):
            spec = fmt[i + 1]
            java = _MYSQL_TO_JAVA.get(spec)
            if java is None:
                hint = _SPECIFIER_HINTS.get(
                    spec,
                    "supported specifiers are "
                    + "".join(sorted(_MYSQL_TO_JAVA)),
                )
                raise ValueError(
                    f"unsupported date_parse specifier %{spec} in format "
                    f"{fmt!r}: {hint} — or rewrite the criteria with "
                    "to_timestamp(expr, <Java pattern>)"
                )
            flush()
            out.append(java)
            i += 2
        elif ch.isalpha() or ch == "'" or ch in _JAVA_QUOTED_PUNCT:
            lit.append(ch)
            i += 1
        else:
            flush()
            out.append(ch)
            i += 1
    flush()
    return "".join(out)


def _rw_date_parse(args: list[str]) -> str:
    """Trino ``date_parse(expr, '%Y-%m-%d')`` -> Spark ``to_timestamp``
    with the format translated MySQL->Java. The format must be a string
    literal (it is in every observed rule); a computed format cannot be
    translated at compile time and raises with guidance."""
    if len(args) != 2:
        raise KeyError("date_parse takes (expr, format)")
    fmt = args[1].strip()
    # ONE string literal, not merely quote-delimited text: a composite
    # like '%Y' || '-%m' starts and ends with a quote too, and treating
    # it as a literal would emit a garbage pattern — an interior
    # unescaped quote means the argument is an expression
    if not (
        fmt.startswith("'")
        and fmt.endswith("'")
        and len(fmt) >= 2
        and "'" not in fmt[1:-1].replace("''", "")
    ):
        raise ValueError(
            "date_parse needs a single string-literal format for "
            f"MySQL->Java translation, got {fmt!r}; use "
            "to_timestamp(expr, <Java pattern>) directly for computed "
            "formats"
        )
    java = _mysql_format_to_java(fmt[1:-1].replace("''", "'"))
    # the Java pattern may itself contain single quotes (quoted literal
    # letters like 'T'); escape them for the SQL string literal
    return f"to_timestamp({args[0]}, '{java.replace(chr(39), chr(39) * 2)}')"


# callable rewrites: fname -> fn(args) -> replacement text. Every
# rewrite here must change the call's NAME (date_parse->to_timestamp)
# or it would re-match on the loop's rescan and never reach a
# fixpoint — which is why Trino's split(string, LITERAL delimiter) is
# deliberately NOT rewritten: Spark's same-named split takes a regex
# (split(x, '.') splits on every char). Rule authors should use
# split_part (literal delimiter, 1-based — identical in both engines)
# or write the regex intentionally; the divergence is documented, not
# silently "fixed" with a rewrite that corrupts itself on rescan.
_CALL_REWRITES["date_parse"] = _rw_date_parse

_TOKEN = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")

# Trino constructs the shim deliberately does NOT translate (no
# clean Spark equivalent at the token-rewrite level). Without this
# check they fall through to Spark's parser, whose raw ParseException
# ("Syntax error at or near ...") tells a rule author nothing about
# WHICH Trino construct broke or what to write instead — so name the
# construct and the supported alternative here, before the parser.
# Checked on non-literal chunks only ('AT TIME ZONE' inside a string
# stays data).
_UNSUPPORTED = [
    (
        re.compile(r"\btry\s*\(", re.IGNORECASE),
        "TRY(expr)",
        "Spark has no generic TRY(); use try_cast(expr AS type) or a "
        "try_* function (try_element_at, try_divide, try_to_timestamp)",
    ),
    (
        re.compile(r"\bat\s+time\s+zone\b", re.IGNORECASE),
        "AT TIME ZONE",
        "use from_utc_timestamp(ts, tz) / to_utc_timestamp(ts, tz) or "
        "convert_timezone(src_tz, dst_tz, ts)",
    ),
    (
        re.compile(r"\brow\s*\(", re.IGNORECASE),
        "ROW(...) constructor",
        "use struct(v1, v2, ...) or named_struct('name', value, ...)",
    ),
    (
        re.compile(r"\bmap\s*\(\s*array\b", re.IGNORECASE),
        "MAP(ARRAY[...], ARRAY[...]) constructor",
        "use map_from_arrays(keys_array, values_array) (Spark's map() "
        "takes interleaved key/value pairs, not two arrays)",
    ),
]


def _reject_unsupported(chunk: str, criteria: str) -> None:
    for rx, name, hint in _UNSUPPORTED:
        m = rx.search(chunk)
        if m:
            raise ValueError(
                f"unsupported Trino construct {name} in criteria "
                f"{criteria!r} (at {m.group(0)!r}): {hint}"
            )


_ARRAY_LIT = re.compile(r"\barray\s*\[", re.IGNORECASE)


def _rewrite_array_literals(sql: str) -> str:
    """Trino array literals use brackets (``ARRAY['a','b']``); Spark's
    constructor is ``array('a','b')``. Rewrite bracket-matched, outside
    string literals, innermost-safe via re-scan (``ARRAY[ARRAY[1]]``).
    Subscripts inside elements (``m['k']``) balance their own brackets
    so depth counting stays correct; a bare identifier followed by a
    subscript (``col[1]``) has a non-ARRAY token and passes through.

    A subscript directly ON the literal (``ARRAY['a','b'][1]``) is
    1-based in Trino but 0-based as a Spark ``[...]`` access, so it
    rewrites to ``element_at(array(...), 1)`` — Spark's element_at is
    1-based, matching Trino exactly — instead of silently shifting
    every element access by one."""
    while True:
        spans = []
        # string-literal spans, recomputed per rewrite round
        i, n = 0, len(sql)
        while i < n:
            if sql[i] == "'":
                j = i + 1
                while j < n:
                    if sql[j] == "'":
                        if j + 1 < n and sql[j + 1] == "'":
                            j += 2
                            continue
                        break
                    j += 1
                spans.append((i, j))
                i = j + 1
            else:
                i += 1
        m = None
        for cand in _ARRAY_LIT.finditer(sql):
            if not any(a <= cand.start() <= b for a, b in spans):
                m = cand
                break
        if m is None:
            return sql
        open_ = m.end() - 1  # the '['
        depth, i, in_str = 0, open_, False
        close = -1
        while i < len(sql):
            ch = sql[i]
            if in_str:
                if ch == "'":
                    if i + 1 < len(sql) and sql[i + 1] == "'":
                        i += 1
                    else:
                        in_str = False
            elif ch == "'":
                in_str = True
            elif ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    close = i
                    break
            i += 1
        if close < 0:
            return sql  # unbalanced: leave for Spark's parser to name
        body = sql[open_ + 1 : close]
        # 1-based subscripts directly on the literal -> element_at;
        # LOOPED so every directly-chained [i] nests
        # (ARRAY[ARRAY[1,2]][1][2] -> element_at(element_at(...,1),2))
        # — a raw Spark [] tail would be 0-based, a silent shift
        expr = f"array({body})"
        end = close + 1
        while True:
            j = end
            while j < len(sql) and sql[j].isspace():
                j += 1
            if j >= len(sql) or sql[j] != "[":
                break
            depth2, k, in_str2 = 0, j, False
            close2 = -1
            while k < len(sql):
                ch = sql[k]
                if in_str2:
                    if ch == "'":
                        if k + 1 < len(sql) and sql[k + 1] == "'":
                            k += 1
                        else:
                            in_str2 = False
                elif ch == "'":
                    in_str2 = True
                elif ch == "[":
                    depth2 += 1
                elif ch == "]":
                    depth2 -= 1
                    if depth2 == 0:
                        close2 = k
                        break
                k += 1
            if close2 < 0:
                break  # unbalanced tail: leave for Spark's parser
            sub = sql[j + 1 : close2]
            expr = f"element_at({expr}, {sub})"
            end = close2 + 1
        sql = sql[: m.start()] + expr + sql[end:]


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


def _split_args(argtext: str) -> list[str]:
    """Split a call's argument text on top-level commas (paren depth 0,
    outside string literals)."""
    out, buf, depth, in_str = [], [], 0, False
    i, n = 0, len(argtext)
    while i < n:
        ch = argtext[i]
        if in_str:
            buf.append(ch)
            if ch == "'":
                if i + 1 < n and argtext[i + 1] == "'":
                    buf.append("'")
                    i += 1
                else:
                    in_str = False
        elif ch == "'":
            in_str = True
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
        i += 1
    if buf or out:
        out.append("".join(buf).strip())
    return out


def _apply_call_rewrites(sql: str) -> str:
    """Rewrite Trino calls whose argument shape differs in Spark
    (paren-matched, string-literal aware; innermost-last so nested
    calls also rewrite)."""
    def _literal_spans(s: str) -> list[tuple[int, int]]:
        spans, i, n = [], 0, len(s)
        while i < n:
            if s[i] == "'":
                j = i + 1
                while j < n:
                    if s[j] == "'":
                        if j + 1 < n and s[j + 1] == "'":
                            j += 2
                            continue
                        break
                    j += 1
                spans.append((i, j))
                i = j + 1
            else:
                i += 1
        return spans

    changed = True
    while changed:
        changed = False
        low = sql.lower()
        spans = _literal_spans(sql)
        for fname, template in _CALL_REWRITES.items():
            start = 0
            while True:
                at = low.find(fname + "(", start)
                if at < 0:
                    break
                # token boundary on the left; never rewrite inside a literal
                if (
                    at > 0 and (low[at - 1].isalnum() or low[at - 1] == "_")
                ) or any(a <= at <= b for a, b in spans):
                    start = at + 1
                    continue
                open_ = at + len(fname)
                depth, i, in_str = 0, open_, False
                while i < len(sql):
                    ch = sql[i]
                    if in_str:
                        if ch == "'":
                            if i + 1 < len(sql) and sql[i + 1] == "'":
                                i += 1
                            else:
                                in_str = False
                    elif ch == "'":
                        in_str = True
                    elif ch == "(":
                        depth += 1
                    elif ch == ")":
                        depth -= 1
                        if depth == 0:
                            break
                    i += 1
                args = _split_args(sql[open_ + 1 : i])
                try:
                    if callable(template):
                        # translation rewrites (date_parse): ValueError
                        # escapes on purpose — it names the unsupported
                        # piece, which beats Spark's raw parse error
                        replacement = template(args)
                    else:
                        ctx = {str(k): a for k, a in enumerate(args)}
                        for k, a in enumerate(args):
                            ctx[f"{k}u"] = a.strip().strip("'")
                        replacement = _fmt(template, ctx)
                except (KeyError, IndexError):
                    start = at + 1
                    continue
                sql = sql[:at] + replacement + sql[i + 1 :]
                changed = True
                break
            if changed:
                break
    return sql


def _fmt(template: str, ctx: dict[str, str]) -> str:
    out = template
    # longest keys first so {0u} is not clobbered by {0}
    for k in sorted(ctx, key=len, reverse=True):
        out = out.replace("{" + k + "}", ctx[k])
    if re.search(r"\{\d+u?\}", out):
        raise KeyError("missing argument for template")
    return out


def trino_to_spark(criteria: str) -> str:
    """Rewrite a Trino WHERE-fragment into Spark SQL.

    Function renames apply only outside string literals; the few calls
    whose argument shape differs (url_extract_*, date_diff/date_add)
    are rewritten with paren-matched, literal-aware templates, and
    bracket array literals (``ARRAY['a','b']``) become Spark's
    ``array('a','b')``. Known-untranslatable Trino constructs (TRY,
    AT TIME ZONE, ROW/MAP constructors) raise a ValueError naming the
    construct and the Spark alternative instead of leaking a raw
    parser error.
    """
    original = criteria
    criteria = _rewrite_array_literals(criteria)
    criteria = _apply_call_rewrites(criteria)
    parts = []
    for chunk, is_lit in _split_literals(criteria):
        if is_lit:
            parts.append(chunk)
        else:
            _reject_unsupported(chunk, original)
            # rename only CALL sites: the token must be followed by
            # '(' (whitespace allowed). A bare identifier that happens
            # to collide with the alias table — a column literally
            # named `contains`, a struct field `starts_with` — must
            # pass through untouched or it becomes an unresolvable
            # reference.
            def _rename(m: re.Match, _chunk: str = chunk) -> str:
                new = _FUNCTION_ALIASES.get(m.group(0).lower())
                if new is None:
                    return m.group(0)
                j = m.end()
                while j < len(_chunk) and _chunk[j].isspace():
                    j += 1
                return new if j < len(_chunk) and _chunk[j] == "(" else m.group(0)

            parts.append(_TOKEN.sub(_rename, chunk))
    return "".join(parts)
