"""Unit tests for the dotted-name expression compiler (no Spark needed)."""

import pytest

from nested_pandas_spark.nestedframe.expr import (
    QueryCompileError,
    compile_expr,
    split_assignment,
)

NESTS = {"nested": {"t", "flux", "band", "t t"}}
BASE = {"a", "b", "a a", "nested"}


def c(expr, env=None):
    return compile_expr(expr, NESTS, BASE, env)


def test_base_expr():
    out = c("a > 2")
    assert out.sql == "(`a` > 2)"
    assert not out.nests


def test_nested_expr():
    out = c("nested.t > 10")
    assert out.nests == {"nested"}
    assert out.render("x") == "(x.`t` > 10)"


def test_mixed_base_nested():
    out = c("nested.flux + b > 7")
    assert out.nests == {"nested"}
    assert out.render("x") == "((x.`flux` + `b`) > 7)"


def test_multi_layer_rejected():
    nests = {"n1": {"x"}, "n2": {"y"}}
    with pytest.raises(QueryCompileError, match="multiple structs/layers"):
        compile_expr("n1.x > n2.y", nests, set())


def test_unknown_column():
    with pytest.raises(QueryCompileError, match="Unknown column"):
        c("zzz > 1")


def test_unknown_field():
    with pytest.raises(QueryCompileError, match="no field"):
        c("nested.zzz > 1")


def test_bool_ops():
    # & / | need parentheses around comparisons, same as pandas.query
    assert c("(a > 1) & (b < 2)").sql == "((`a` > 1) AND (`b` < 2))"
    assert c("a > 1 and b < 2").sql == "((`a` > 1) AND (`b` < 2))"
    assert c("not (a > 1)").sql == "(NOT (`a` > 1))"
    assert c("(a > 1) | (b < 2)").sql == "((`a` > 1) OR (`b` < 2))"


def test_chained_comparison():
    assert c("1 < a < 3").sql == "((1 < `a`) AND (`a` < 3))"


def test_in_list():
    out = c("nested.band in ['r', 'g']")
    assert out.render("x") == "(x.`band` IN ('r', 'g'))"


def test_env_vars():
    out = c("a > @lo", env={"lo": 2.5})
    assert out.sql == "(`a` > 2.5)"
    with pytest.raises(QueryCompileError, match="Undefined local"):
        c("a > @missing")


def test_backticks():
    out = c("`a a` + b > 2")
    assert out.sql == "((`a a` + `b`) > 2)"


def test_backtick_nested_field():
    out = c("nested.`t t` > 1")
    assert out.render("x") == "(x.`t t` > 1)"


def test_funcs():
    assert c("abs(a) > 1").sql == "(abs(`a`) > 1)"
    assert c("log(a) > 0").sql == "(ln(`a`) > 0)"
    assert c("a ** 2 > 4").sql == "(power(`a`, 2) > 4)"


def test_none_comparison():
    assert c("a == None").sql == "(`a` IS NULL)"
    assert c("a != None").sql == "(`a` IS NOT NULL)"


def test_nest_len_method():
    out = c("nested.len() > 2")
    assert out.sql == "(size(`nested`) > 2)"
    assert not out.nests  # base-level expression


def test_split_assignment():
    tgt, rhs = split_assignment("c = a + b")
    assert tgt == "c" and rhs.strip() == "a + b"
    tgt, rhs = split_assignment("nested.c = nested.t * 2")
    assert tgt == "nested.c"
    tgt, rhs = split_assignment("a > b")
    assert tgt is None


def test_string_literal_escaping():
    out = c("nested.band == @v", env={"v": "it's"})
    assert "\\'" in out.render("x")


def test_string_methods():
    assert c("nested.band.lower() == 'r'").render("x") == "(lower(x.`band`) = 'r')"
    assert c("nested.band.startswith('r')").render("x") == "startswith(x.`band`, 'r')"
    assert c("nested.band.str.contains('g')").render("x") == "contains(x.`band`, 'g')"
    out = c("nested.band.len() >= 1")
    assert out.render("x") == "(length(x.`band`) >= 1)"
