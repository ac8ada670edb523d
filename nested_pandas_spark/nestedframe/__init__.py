from .core import NestedFrame
from .expr import CompiledExpr, QueryCompileError, compile_expr, split_assignment
from .io import from_pyarrow, read_parquet
