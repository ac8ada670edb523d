"""Dotted-name expression compiler: nested-pandas query/eval strings -> Spark SQL.

The reference evaluates strings like ``"nested.t > 10"`` with a custom
pandas-eval resolver that flattens the targeted nest once and applies a
vectorized kernel (reference: ``src/nested_pandas/nestedframe/expr.py:24-228``,
``core.py:1526-1636``).  Here we compile the same surface language directly to
a Spark SQL expression string instead:

* base-column terms compile to (backtick-quoted) column references;
* ``nest.field`` terms compile to ``<lambdavar>.field`` references, for use
  inside a higher-order ``filter(nest, x -> ...)`` / ``transform(nest, x -> ...)``;
* mixing sub-columns of *different* nests in one expression is rejected, the
  same single-layer rule as the reference (``core.py:1613-1614``);
* backticked names (``` `a a` + b > 2 ```) and ``@env`` variables are
  supported like pandas.query (reference alias machinery ``expr.py:212-228``).

Everything stays declarative: the produced SQL goes through Catalyst and
whole-stage codegen; no Python executes per row.
"""

from __future__ import annotations

import ast
import re
from dataclasses import dataclass, field

__all__ = ["CompiledExpr", "compile_expr", "split_assignment", "QueryCompileError"]


class QueryCompileError(ValueError):
    """Raised when an expression cannot be compiled to Spark SQL."""


# pandas.eval supported math functions -> Spark SQL function names
_FUNC_MAP = {
    "sin": "sin",
    "cos": "cos",
    "tan": "tan",
    "arcsin": "asin",
    "arccos": "acos",
    "arctan": "atan",
    "arctan2": "atan2",
    "sinh": "sinh",
    "cosh": "cosh",
    "tanh": "tanh",
    "abs": "abs",
    "sqrt": "sqrt",
    "log": "ln",
    "log10": "log10",
    "log1p": "log1p",
    "exp": "exp",
    "expm1": "expm1",
    "floor": "floor",
    "ceil": "ceiling",
}

_BACKTICK_RE = re.compile(r"`([^`]*)`")
_AT_RE = re.compile(r"@([A-Za-z_][A-Za-z0-9_]*)")

# pandas Series reduction methods usable in query/eval strings (the reference
# evaluates `nested.a.max()` / `a + packed.c.median()` as GLOBAL reductions
# over the flat series, broadcast back to every row — reference
# test_nestedframe.py test_eval_funcs / test_mixed_eval_funcs). Values are the
# Spark SQL aggregate each compiles to (std/var use pandas' sample ddof=1).
_REDUCTION_MAP = {
    "min": "min",
    "max": "max",
    "sum": "sum",
    "mean": "avg",
    "median": "median",
    "std": "stddev_samp",
    "var": "var_samp",
    "count": "count",
}


def _quote_ident(name: str) -> str:
    """Quote an identifier for Spark SQL (backticks, with escaping)."""
    return "`" + name.replace("`", "``") + "`"


def _sql_literal(value: object) -> str:
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return repr(value)
    if isinstance(value, str):
        return "'" + value.replace("\\", "\\\\").replace("'", "\\'") + "'"
    raise QueryCompileError(f"Unsupported literal in expression: {value!r}")


def reduction_literal(value: object) -> str:
    """SQL literal for a computed reduction scalar (floats incl. NaN/inf,
    ints, strings, NULL, datetimes)."""
    import datetime
    import decimal
    import math

    if isinstance(value, float):
        if math.isnan(value):
            return "double('NaN')"
        if math.isinf(value):
            return "double('Infinity')" if value > 0 else "double('-Infinity')"
        # NB: a bare `3.0` literal is DECIMAL in Spark SQL — keep the scalar
        # DOUBLE so arithmetic matches the reference's float64
        return f"CAST({value!r} AS DOUBLE)"
    if isinstance(value, decimal.Decimal):
        return str(value)
    if isinstance(value, datetime.datetime):
        return f"TIMESTAMP '{value.isoformat(sep=' ')}'"
    if isinstance(value, datetime.date):
        return f"DATE '{value.isoformat()}'"
    return _sql_literal(value)


@dataclass
class CompiledExpr:
    """Result of compiling one expression string.

    ``sql`` references nested sub-columns as ``{x}.field`` where ``{x}`` is a
    placeholder for the lambda variable: call :meth:`render` to materialize.
    """

    sql: str
    nests: set[str] = field(default_factory=set)
    base_cols: set[str] = field(default_factory=set)
    # placeholder token -> (sql aggregate, nest name or None for base, column)
    # for global Series reductions; the frame binds them to literal scalars
    # (computed in one distributed agg job) before rendering
    reductions: dict[str, tuple[str, str | None, str]] = field(default_factory=dict)

    @property
    def nest(self) -> str | None:
        return next(iter(self.nests)) if self.nests else None

    def render(self, lambda_var: str = "__x") -> str:
        return self.sql.replace("\x00VAR\x00", lambda_var)

    def render_flat(self) -> str:
        """Render nested refs as bare column names (``x.f`` -> ```f```) —
        for pushing an element predicate down onto the flat child table."""
        return self.sql.replace("\x00VAR\x00.", "")


class _Compiler(ast.NodeVisitor):
    def __init__(
        self,
        nested_fields: dict[str, set[str]],
        base_columns: set[str],
        env: dict[str, object],
        alias_map: dict[str, str],
    ):
        self.nested_fields = nested_fields
        self.base_columns = base_columns
        self.env = env
        self.alias_map = alias_map  # placeholder ident -> original (possibly non-identifier) name
        self.nests_used: set[str] = set()
        self.base_used: set[str] = set()
        self.reductions: dict[str, tuple[str, str | None, str]] = {}

    def _try_reduction(self, meth: str, target: ast.AST) -> str | None:
        """`nested.c.median()` / `a.max()` — global reduction over the flat
        series (all elements of all rows) or the base column. Returns a
        placeholder token the frame later binds to the computed scalar; the
        reduction target does NOT count toward the single-layer rule (the
        result is a broadcast scalar, so `a + packed.c.median()` is a pure
        base-level expression, as in the reference)."""
        agg = _REDUCTION_MAP[meth]
        if isinstance(target, ast.Attribute) and isinstance(target.value, ast.Name):
            holder = self.alias_map.get(target.value.id, target.value.id)
            fld = self.alias_map.get(target.attr, target.attr)
            if holder in self.nested_fields:
                if fld not in self.nested_fields[holder]:
                    raise QueryCompileError(
                        f"Nested column '{holder}' has no field '{fld}'"
                    )
                token = f"\x00RED{len(self.reductions)}\x00"
                self.reductions[token] = (agg, holder, fld)
                return token
            return None
        if isinstance(target, ast.Name):
            original = self.alias_map.get(target.id, target.id)
            if original in self.base_columns:
                token = f"\x00RED{len(self.reductions)}\x00"
                self.reductions[token] = (agg, None, original)
                return token
        return None

    # -- helpers ---------------------------------------------------------
    def _resolve_name(self, name: str) -> str:
        original = self.alias_map.get(name, name)
        if name.startswith("__AT_") and name.endswith("__"):
            var = name[5:-2]
            if var not in self.env:
                raise QueryCompileError(f"Undefined local variable '@{var}'")
            return _sql_literal(self.env[var])
        if original in self.base_columns:
            self.base_used.add(original)
            return _quote_ident(original)
        if original in self.nested_fields:
            raise QueryCompileError(
                f"Nested column '{original}' used without a sub-field "
                f"(expected '{original}.<field>')"
            )
        raise QueryCompileError(f"Unknown column '{original}'")

    def _nested_ref(self, nest: str, fld: str) -> str:
        fields = self.nested_fields[nest]
        if fld not in fields:
            raise QueryCompileError(f"Nested column '{nest}' has no field '{fld}'")
        self.nests_used.add(nest)
        if len(self.nests_used) > 1:
            raise QueryCompileError(
                "Queries cannot target multiple structs/layers, write your query "
                "to only use one of: " + ", ".join(sorted(self.nests_used))
            )
        return "\x00VAR\x00." + _quote_ident(fld)

    # -- visitors --------------------------------------------------------
    def visit(self, node: ast.AST) -> str:  # type: ignore[override]
        method = "visit_" + node.__class__.__name__
        visitor = getattr(self, method, None)
        if visitor is None:
            raise QueryCompileError(f"Unsupported syntax: {node.__class__.__name__}")
        return visitor(node)

    def visit_Expression(self, node: ast.Expression) -> str:
        return self.visit(node.body)

    def visit_Constant(self, node: ast.Constant) -> str:
        return _sql_literal(node.value)

    def visit_Name(self, node: ast.Name) -> str:
        return self._resolve_name(node.id)

    def visit_Attribute(self, node: ast.Attribute) -> str:
        if isinstance(node.value, ast.Name):
            holder = self.alias_map.get(node.value.id, node.value.id)
            fld = self.alias_map.get(node.attr, node.attr)
            if holder in self.nested_fields:
                return self._nested_ref(holder, fld)
            # dotted access on a base struct column (rare) - pass through
            if holder in self.base_columns:
                self.base_used.add(holder)
                return f"{_quote_ident(holder)}.{_quote_ident(fld)}"
        raise QueryCompileError("Unsupported attribute access in expression")

    def visit_BinOp(self, node: ast.BinOp) -> str:
        left, right = self.visit(node.left), self.visit(node.right)
        op = node.op
        if isinstance(op, ast.Add):
            return f"({left} + {right})"
        if isinstance(op, ast.Sub):
            return f"({left} - {right})"
        if isinstance(op, ast.Mult):
            return f"({left} * {right})"
        if isinstance(op, ast.Div):
            return f"({left} / {right})"
        if isinstance(op, ast.Mod):
            return f"({left} % {right})"
        if isinstance(op, ast.Pow):
            return f"power({left}, {right})"
        if isinstance(op, ast.FloorDiv):
            return f"floor({left} / {right})"
        if isinstance(op, ast.BitAnd):
            return f"({left} AND {right})"
        if isinstance(op, ast.BitOr):
            return f"({left} OR {right})"
        raise QueryCompileError(f"Unsupported operator: {op.__class__.__name__}")

    def visit_BoolOp(self, node: ast.BoolOp) -> str:
        joiner = " AND " if isinstance(node.op, ast.And) else " OR "
        return "(" + joiner.join(self.visit(v) for v in node.values) + ")"

    def visit_UnaryOp(self, node: ast.UnaryOp) -> str:
        operand = self.visit(node.operand)
        if isinstance(node.op, ast.Not) or isinstance(node.op, ast.Invert):
            return f"(NOT {operand})"
        if isinstance(node.op, ast.USub):
            return f"(- {operand})"
        if isinstance(node.op, ast.UAdd):
            return operand
        raise QueryCompileError("Unsupported unary operator")

    def visit_Compare(self, node: ast.Compare) -> str:
        parts = []
        left = self.visit(node.left)
        for op, comparator in zip(node.ops, node.comparators):
            if isinstance(op, (ast.In, ast.NotIn)):
                if not isinstance(comparator, (ast.List, ast.Tuple)):
                    raise QueryCompileError("'in' requires a literal list")
                items = ", ".join(self.visit(e) for e in comparator.elts)
                neg = "NOT " if isinstance(op, ast.NotIn) else ""
                parts.append(f"({left} {neg}IN ({items}))")
                continue
            right = self.visit(comparator)
            sym = {
                ast.Eq: "=",
                ast.NotEq: "!=",
                ast.Lt: "<",
                ast.LtE: "<=",
                ast.Gt: ">",
                ast.GtE: ">=",
            }.get(op.__class__)
            if sym is None:
                raise QueryCompileError(f"Unsupported comparison: {op.__class__.__name__}")
            # NULL-safe equality against None literal
            if sym == "=" and right == "NULL":
                parts.append(f"({left} IS NULL)")
            elif sym == "!=" and right == "NULL":
                parts.append(f"({left} IS NOT NULL)")
            else:
                parts.append(f"({left} {sym} {right})")
            left = right
        return parts[0] if len(parts) == 1 else "(" + " AND ".join(parts) + ")"

    def visit_Call(self, node: ast.Call) -> str:
        # method-style: nested.len(), nested.field.isna(), str methods
        if isinstance(node.func, ast.Attribute):
            meth = node.func.attr
            target = node.func.value
            if meth in _REDUCTION_MAP and not node.args and not node.keywords:
                token = self._try_reduction(meth, target)
                if token is not None:
                    return token
            # pandas-style `.str.xxx(...)`: unwrap the `.str` accessor
            if (
                isinstance(target, ast.Attribute)
                and target.attr == "str"
            ):
                target = target.value
            if meth == "len" and isinstance(target, ast.Name):
                holder = self.alias_map.get(target.id, target.id)
                if holder in self.nested_fields:
                    # nest.len(): per-row element count of the nest itself.
                    # This is a BASE-level expression (one value per top row).
                    self.base_used.add(holder)
                    return f"size({_quote_ident(holder)})"
            if meth in ("isna", "isnull"):
                return f"({self.visit(target)} IS NULL)"
            if meth in ("notna", "notnull"):
                return f"({self.visit(target)} IS NOT NULL)"
            # string methods (subset of pandas .str / str semantics)
            tgt_sql = None
            if meth in ("lower", "upper", "strip", "len", "startswith", "endswith",
                        "contains"):
                tgt_sql = self.visit(target)
            if tgt_sql is not None:
                if meth in ("lower", "upper"):
                    return f"{meth}({tgt_sql})"
                if meth == "strip":
                    return f"trim({tgt_sql})"
                if meth == "len":
                    return f"length({tgt_sql})"
                args = [self.visit(a) for a in node.args]
                if meth == "startswith":
                    return f"startswith({tgt_sql}, {args[0]})"
                if meth == "endswith":
                    return f"endswith({tgt_sql}, {args[0]})"
                if meth == "contains":
                    return f"contains({tgt_sql}, {args[0]})"
            raise QueryCompileError(f"Unsupported method call: {meth}")
        if isinstance(node.func, ast.Name):
            fname = node.func.id
            if fname not in _FUNC_MAP:
                raise QueryCompileError(f"Unsupported function: {fname}")
            args = ", ".join(self.visit(a) for a in node.args)
            return f"{_FUNC_MAP[fname]}({args})"
        raise QueryCompileError("Unsupported call expression")

    def visit_List(self, node: ast.List) -> str:
        return "array(" + ", ".join(self.visit(e) for e in node.elts) + ")"

    def visit_Tuple(self, node: ast.Tuple) -> str:
        return self.visit_List(node)  # type: ignore[arg-type]


def _preprocess(expr: str) -> tuple[str, dict[str, str]]:
    """Replace backticked names and @vars with python-safe placeholders."""
    alias_map: dict[str, str] = {}

    def bt_sub(m: re.Match) -> str:
        key = f"__BT{len(alias_map)}__"
        alias_map[key] = m.group(1)
        return key

    out = _BACKTICK_RE.sub(bt_sub, expr)
    out = _AT_RE.sub(lambda m: f"__AT_{m.group(1)}__", out)
    return out, alias_map


def split_assignment(expr: str) -> tuple[str | None, str]:
    """Split ``"target = rhs"`` eval-style assignment; returns (target, rhs).

    Only a single top-level ``=`` that is not part of ``==``/``<=``/... counts.
    Mirrors the reference's assignment visitor (``expr.py:30-46``).
    """
    processed, alias_map = _preprocess(expr)
    try:
        tree = ast.parse(processed.strip(), mode="exec")
    except SyntaxError as exc:
        raise QueryCompileError(f"Cannot parse expression: {expr!r}") from exc
    if len(tree.body) == 1 and isinstance(tree.body[0], ast.Assign):
        assign = tree.body[0]
        if len(assign.targets) != 1:
            raise QueryCompileError("Only single-target assignment is supported")
        tgt = assign.targets[0]
        if isinstance(tgt, ast.Name):
            target = alias_map.get(tgt.id, tgt.id)
        elif isinstance(tgt, ast.Attribute) and isinstance(tgt.value, ast.Name):
            holder = alias_map.get(tgt.value.id, tgt.value.id)
            fld = alias_map.get(tgt.attr, tgt.attr)
            target = f"{holder}.{fld}"
        elif isinstance(tgt, ast.Attribute):
            # a.b.c = ... — same restriction as the reference (core.py:317-318)
            raise QueryCompileError("Only one level of nesting is supported")
        else:
            raise QueryCompileError("Unsupported assignment target")
        rhs = ast.get_source_segment(processed.strip(), assign.value)
        # restore backticks/@ placeholders in the rhs source for recompilation
        if rhs is None:
            raise QueryCompileError("Cannot extract assignment RHS")
        for key, original in alias_map.items():
            rhs = rhs.replace(key, "`" + original + "`")
        rhs = re.sub(r"__AT_([A-Za-z_][A-Za-z0-9_]*)__", r"@\1", rhs)
        return target, rhs
    return None, expr


def compile_expr(
    expr: str,
    nested_fields: dict[str, set[str]],
    base_columns: set[str],
    env: dict[str, object] | None = None,
) -> CompiledExpr:
    """Compile one (non-assignment) expression string to Spark SQL.

    Parameters
    ----------
    nested_fields : mapping of nested-column name -> set of its struct fields
    base_columns : flat column names of the frame
    env : values for ``@var`` references
    """
    processed, alias_map = _preprocess(expr)
    try:
        tree = ast.parse(processed.strip(), mode="eval")
    except SyntaxError as exc:
        raise QueryCompileError(f"Cannot parse expression: {expr!r}") from exc
    compiler = _Compiler(nested_fields, base_columns, env or {}, alias_map)
    sql = compiler.visit(tree)
    return CompiledExpr(sql=sql, nests=compiler.nests_used,
                        base_cols=compiler.base_used,
                        reductions=compiler.reductions)
