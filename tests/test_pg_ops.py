"""PG operator-spelling translation (reference catalog spellings,
/root/reference/src/bin/initdb/main.rs:463-653) in the SQL front door.
"""

from __future__ import annotations

import pytest

from kuibadb_spark.engine import Engine
from kuibadb_spark.functions.pg_ops import translate


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, warehouse=str(tmp_path / "wh"))


def test_translate_pure():
    assert translate("a ~~ 'x%'") == "a  LIKE  'x%'"
    assert translate("a !~~ 'x%'") == "a  NOT LIKE  'x%'"
    assert translate("3 # 5") == "3 ^ 5"
    assert translate("|/ 25") == "sqrt(25)"
    assert translate("||/ 27") == "cbrt(27)"
    assert translate("@ -7") == "abs(-7)"
    assert translate("5!") == "factorial(5)"
    assert translate("!! 4") == "factorial(4)"
    # nested prefix chains translate in one pass (and are idempotent)
    assert translate("@ @0") == "abs(abs(0))"
    assert translate("|/ @ 4") == "sqrt(abs(4))"
    assert translate("@@0") == "@@0"
    assert translate("(n + 1)!") == "factorial((n + 1))"
    # prefix `!` as NOT (valid Spark SQL) must pass through untouched —
    # only a true postfix position rewrites to factorial (round-3 ADVICE)
    assert translate("SELECT !true") == "SELECT !true"
    assert translate("WHERE !(a = b)") == "WHERE !(a = b)"
    assert translate("WHEN !flag THEN 1") == "WHEN !flag THEN 1"
    assert translate("SELECT a AND !b") == "SELECT a AND !b"
    assert translate("SELECT 5! AS f") == "SELECT factorial(5) AS f"
    # implicit (non-AS) alias after a NUMERIC literal: `!` after a number
    # cannot be prefix NOT in any reading, so PG's factorial+alias wins
    # (round-4 ADVICE); a non-numeric operand keeps the prefix-NOT reading
    assert translate("SELECT 5! f") == "SELECT factorial(5) f"
    assert translate("SELECT 2.5! f") == "SELECT factorial(2.5) f"
    # scientific / leading-dot / trailing-dot spellings are numeric
    # literals too (round-5 ADVICE: `1e3! f` fell through to prefix NOT)
    assert translate("SELECT 1e3! f") == "SELECT factorial(1e3) f"
    assert translate("SELECT .5! f") == "SELECT factorial(.5) f"
    assert translate("SELECT 5.! f") == "SELECT factorial(5.) f"
    assert translate("SELECT 2.5E-7! f") == "SELECT factorial(2.5E-7) f"
    assert translate("SELECT 1E+2! f") == "SELECT factorial(1E+2) f"
    # an identifier ending in an exponent-like tail is NOT a literal
    assert translate("SELECT x1e3! f") == "SELECT x1e3! f"
    # ... including when an operator follows the tail: `x2e+7!` is
    # column x2e plus factorial(7), NOT a widened literal `x2e+7`
    # (round-6 ADVICE: the exponent-widening regex lacked a left
    # boundary and produced `xfactorial(2e+7)`)
    assert translate("SELECT x2e+7! AS r") == "SELECT x2e+factorial(7) AS r"
    assert translate("SELECT x.5e+7! AS r") == "SELECT x.5e+factorial(7) AS r"
    # a real literal right after an operator still widens
    assert translate("SELECT y+2e+7! AS r") == "SELECT y+factorial(2e+7) AS r"
    assert translate("SELECT a! b") == "SELECT a! b"
    assert translate("SELECT a! FROM t") == "SELECT factorial(a) FROM t"
    assert translate("SELECT 5! + 3") == "SELECT factorial(5) + 3"
    assert translate("SELECT (3+2)!") == "SELECT factorial((3+2))"
    # non-PG uses stay intact
    assert translate("a != b") == "a != b"
    assert translate("x || y") == "x || y"
    assert translate("'lit ~~ # !'") == "'lit ~~ # !'"
    assert translate("-- c ~~ d\nx") == "-- c ~~ d\nx"


def test_engine_runs_pg_spellings(engine):
    row = engine.sql(
        "SELECT 5! AS f, |/ 25 AS r, ||/ 27 AS c, 3 # 5 AS x, @ -7 AS a,"
        " 'abc' ~~ 'a%' AS l, 'abc' !~~ 'b%' AS nl"
    ).collect()[0]
    assert (row.f, row.r, row.c, row.x, row.a, row.l, row.nl) == (
        120, 5.0, 3.0, 6, 7, True, True)


def test_pg_spellings_over_table(engine):
    engine.create_table("t", "a INT, s STRING")
    engine.insert(
        "t",
        engine.spark.createDataFrame([(3, "Apple"), (4, "pear")], "a INT, s STRING"),
    )
    rows = engine.sql(
        "SELECT a! AS f FROM t WHERE s ~~ 'A%'"
    ).collect()
    assert [r.f for r in rows] == [6]


def test_translate_properties():
    """Hypothesis: translate() is (a) identity on SQL without PG tokens,
    (b) idempotent, (c) never edits inside string literals."""
    from hypothesis import given, settings, strategies as st

    plain = st.text(
        alphabet="abcdefgh0123456789 _,().=<>+-*/", min_size=0, max_size=60
    )

    @given(s=plain)
    @settings(max_examples=300, deadline=None)
    def identity(s):
        assert translate(s) == s

    # '@' excluded: a dangling '@' next to another operator token is not
    # valid SQL in any dialect, and translate() is single-pass best-effort
    # there (nested VALID prefix chains are covered by the unit cases)
    @given(s=st.text(alphabet="abc 0123456789#!~|/'", min_size=0, max_size=40))
    @settings(max_examples=300, deadline=None)
    def idempotent(s):
        t1 = translate(s)
        assert translate(t1) == t1

    @given(body=st.text(alphabet="ab #!~|/@", min_size=0, max_size=20))
    @settings(max_examples=300, deadline=None)
    def literals_untouched(body):
        lit = "'" + body.replace("'", "") + "'"
        out = translate("SELECT " + lit)
        assert lit in out

    identity()
    idempotent()
    literals_untouched()
