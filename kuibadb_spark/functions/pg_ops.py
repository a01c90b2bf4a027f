"""PostgreSQL operator spellings for the SQL front door.

The reference's catalog declares the pg_operator spellings (initdb seeds,
/root/reference/src/bin/initdb/main.rs:463-653); most are shared with
Spark SQL (`+ - * / % & | << >> ~ = <> < > <= >= ||`), but six are
PG-isms Spark's parser rejects. `translate()` rewrites those into Spark
equivalents before Engine.sql dispatches the statement:

    a ~~ b    →  a LIKE b            (textlike, initdb @894)
    a !~~ b   →  a NOT LIKE b        (textnlike)
    a # b     →  a ^ b               (int4xor — Spark's ^ IS xor)
    |/ x      →  sqrt(x)             (dsqrt)
    ||/ x     →  cbrt(x)             (dcbrt)
    @ x       →  abs(x)              (abs family, 5 rows)
    x !       →  factorial(x)        (postfix factorial)
    !! x      →  factorial(x)        (prefix factorial)

NOT translated: PG's `^` (power) — Spark spells `^` as xor, so silently
re-interpreting it would flip the meaning of valid Spark SQL; use
power()/pow() explicitly.

Implementation is a single left-to-right scan that skips string literals
('…' with '' escapes), quoted identifiers ("…"), and comments (-- and
/* */), so operator characters inside literals are never touched. The
prefix forms bind to the following primary expression (literal,
identifier/function-call, or parenthesized group); postfix ! binds to
the preceding primary — the same tight binding PG gives them.
"""

from __future__ import annotations

import re

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_.]*")
_NUM = re.compile(r"\d+(?:\.\d+)?")

# a `!` right after any of these is prefix NOT, never postfix factorial
# (`WHERE !(a=b)`, `WHEN !flag`, `SELECT !true`, `AND !x` …)
_KEYWORDS = frozenset(
    """AND OR NOT SELECT WHERE WHEN THEN ELSE END ON BY FROM JOIN INNER
    LEFT RIGHT FULL OUTER CROSS GROUP ORDER HAVING LIMIT OFFSET AS IN IS
    LIKE ILIKE RLIKE BETWEEN CASE DISTINCT ALL ANY SOME UNION EXCEPT
    INTERSECT EXISTS VALUES SET RETURNING USING OVER PARTITION IF
    """.split()
)


def _skip_ws(s: str, i: int) -> int:
    while i < len(s) and s[i].isspace():
        i += 1
    return i


def _read_primary(s: str, i: int) -> int:
    """Return the end index of the primary expression starting at i
    (number, identifier with optional call parens, or parenthesized
    group). Returns i unchanged if nothing parseable starts there."""
    i = _skip_ws(s, i)
    if i < len(s) and s[i] in "+-":  # signed operand: @ -7, |/ -x
        j = _read_primary(s, i + 1)
        return j if j > i + 1 else i
    # nested prefix operator: @ @0, |/ @x, !! |/y … — consume operator
    # plus ITS primary so the outer operator gets a full operand
    for op in ("||/", "|/", "!!"):
        if s.startswith(op, i):
            j = _read_primary(s, i + len(op))
            return j if j > i + len(op) else i
    if i < len(s) and s[i] == "@" and not s.startswith("@@", i):
        j = _read_primary(s, i + 1)
        return j if j > i + 1 else i
    if i >= len(s):
        return i
    if s[i] == "(":
        depth = 0
        j = i
        while j < len(s):
            if s[j] == "'":
                j = _end_of_string(s, j)
                continue
            if s[j] == "(":
                depth += 1
            elif s[j] == ")":
                depth -= 1
                if depth == 0:
                    return j + 1
            j += 1
        return len(s)
    m = _NUM.match(s, i)
    if m:
        return m.end()
    m = _IDENT.match(s, i)
    if m:
        j = _skip_ws(s, m.end())
        if j < len(s) and s[j] == "(":
            return _read_primary(s, j)  # call: ident + parenthesized args
        return m.end()
    return i


def _start_of_primary(s: str, i: int) -> int:
    """Return the start index of the primary expression ending just
    before i (scanning left); i is exclusive."""
    j = i - 1
    while j >= 0 and s[j].isspace():
        j -= 1
    if j < 0:
        return i
    if s[j] == ")":
        depth = 0
        while j >= 0:
            if s[j] == ")":
                depth += 1
            elif s[j] == "(":
                depth -= 1
                if depth == 0:
                    # include a preceding function name, if any
                    k = j - 1
                    while k >= 0 and s[k].isspace():
                        k -= 1
                    end = k + 1
                    while k >= 0 and (s[k].isalnum() or s[k] in "_."):
                        k -= 1
                    return k + 1 if k + 1 < end else j
            j -= 1
        return 0
    if s[j].isdigit() or s[j].isalnum() or s[j] in "_.":
        while j >= 0 and (s[j].isalnum() or s[j] in "_."):
            j -= 1
        return j + 1
    return i


def _end_of_string(s: str, i: int) -> int:
    """i points at the opening quote; return index after the closing
    quote (handling '' escapes)."""
    j = i + 1
    while j < len(s):
        if s[j] == "'":
            if j + 1 < len(s) and s[j + 1] == "'":
                j += 2
                continue
            return j + 1
        j += 1
    return len(s)


def translate(sql: str) -> str:
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            j = _end_of_string(sql, i)
            out.append(sql[i:j])
            i = j
        elif c == '"':
            j = sql.find('"', i + 1)
            j = n if j < 0 else j + 1
            out.append(sql[i:j])
            i = j
        elif sql.startswith("--", i):
            j = sql.find("\n", i)
            j = n if j < 0 else j
            out.append(sql[i:j])
            i = j
        elif sql.startswith("/*", i):
            j = sql.find("*/", i)
            j = n if j < 0 else j + 2
            out.append(sql[i:j])
            i = j
        elif sql.startswith("!~~", i):
            out.append(" NOT LIKE ")
            i += 3
        elif sql.startswith("~~", i):
            out.append(" LIKE ")
            i += 2
        elif sql.startswith("||/", i):
            j = _read_primary(sql, i + 3)
            out.append(f"cbrt({translate(sql[i + 3:j].strip())})")
            i = j
        elif sql.startswith("|/", i):
            j = _read_primary(sql, i + 2)
            out.append(f"sqrt({translate(sql[i + 2:j].strip())})")
            i = j
        elif sql.startswith("!!", i):
            j = _read_primary(sql, i + 2)
            out.append(f"factorial({translate(sql[i + 2:j].strip())})")
            i = j
        elif c == "#":
            out.append("^")
            i += 1
        elif c == "@" and i + 1 < n and sql[i + 1] == "@":
            out.append("@@")  # opaque (PG text-search operator) — not ours
            i += 2
        elif c == "@":
            j = _read_primary(sql, i + 1)
            operand = sql[i + 1:j].strip()
            if operand:
                out.append(f"abs({translate(operand)})")
                i = j
            else:
                out.append(c)
                i += 1
        elif c == "!" and (i + 1 >= n or sql[i + 1] not in "=~"):
            # postfix factorial (PG `5!`) vs prefix NOT (Spark `!flag`,
            # `!(a = b)`, `!true` — valid Spark SQL that must pass
            # through untouched). Disambiguate both ways: rewrite only
            # when the preceding token IS an operand (not any SQL
            # keyword) AND what follows CANNOT start an operand — a `!`
            # followed by an identifier/literal/'(' is prefix NOT.
            k = i + 1
            while k < n and sql[k].isspace():
                k += 1
            nxt = _IDENT.match(sql, k)
            if nxt and nxt.group(0).upper() in _KEYWORDS:
                # `5! AS f`, `x! FROM t`, `a! AND b`: a keyword can't
                # start an operand — the `!` is postfix
                follows_operand = False
            else:
                follows_operand = k < n and (
                    sql[k].isalnum() or sql[k] in "_('\"!@|"
                )
            prev = "".join(out)
            start = _start_of_primary(prev, len(prev))
            # `SELECT (3+2)!`: _start_of_primary treats `KEYWORD (…)` as
            # a call and swallows the keyword — peel leading keywords off
            # the operand so only the paren group is rebound
            while True:
                lead = re.match(r"\s*([A-Za-z_][\w.]*)\s+", prev[start:])
                if lead and lead.group(1).upper() in _KEYWORDS:
                    start += lead.end()
                else:
                    break
            operand = prev[start:].strip()
            # `2.5E-7!`: _start_of_primary stops at the exponent's sign,
            # leaving only the trailing digits as the operand — widen
            # leftwards over `<mantissa>[eE][+-]` so the whole literal
            # rebinds (round-5 ADVICE). The lookbehind rejects matches
            # whose "mantissa" is the tail of an identifier (`x2e+7!` is
            # column x2e plus factorial(7), not a widened literal —
            # round-6 ADVICE).
            m_exp = re.search(
                r"(?<![\w.])(?:\d+(?:\.\d*)?|\.\d+)[eE][+-]$", prev[:start]
            )
            if m_exp and re.fullmatch(r"\d+", operand or ""):
                start = m_exp.start()
                operand = prev[start:].strip()
            # `5! f` (implicit non-AS alias): an identifier follows, so
            # the generic rule reads prefix NOT — but `!` after a numeric
            # literal cannot be prefix in any SQL reading (`5 !flag` is
            # not a term), so a pure numeric operand forces postfix, as
            # PG parses it (factorial + alias). The literal pattern
            # covers every SQL numeric spelling: `5`, `5.`, `.5`,
            # `5.25`, and exponent forms `1e3` / `2.5E-7` (round-5
            # ADVICE: `1e3! f` previously fell through to prefix NOT).
            numeric_operand = bool(re.fullmatch(
                r"(?:\d+(?:\.\d*)?|\.\d+)(?:[eE][+-]?\d+)?", operand or ""
            ))
            if (
                operand
                and operand.upper() not in _KEYWORDS
                and (not follows_operand or numeric_operand)
            ):
                out = [prev[:start], f"factorial({operand})"]
            else:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)
