"""nested-pandas-spark: a PySpark-native engine with the query and
data-processing capabilities of lincc-frameworks/nested-pandas.

A nested column is a Spark ``array<struct<...>>`` column; all operators are
declarative DataFrame/SQL expressions (higher-order functions, collect_list
packing, inline/posexplode unpacking) so Catalyst + Tungsten handle
optimization and execution at any scale.
"""

from .nestedframe.core import NestedFrame
from .nestedframe.expr import QueryCompileError, compile_expr
from .nestedframe.io import from_pyarrow, read_jsonl, read_parquet, to_jsonl
from .operators.packer import from_flat, from_lists, join_nested, pack
from .operators.restructure import frame_explode, split, to_flat, to_flatten_inner, to_lists
from .operators.aggregates import (
    count_nested, describe, group_describe, histogram, minmax, nest_agg,
    profile, value_counts,
)
from .operators.cleaning import dropna, fillna
from .operators.sorting import sort_values
from .operators.timeseries import (
    freq_grid, lightcurve_features, nest_acf, nest_align, structure_function,
    theil_sen,
    nest_corr, nest_cum, nest_decimate, nest_dedup, nest_describe,
    nest_diff, nest_ewm, nest_interp, nest_sample,
    nest_rolling, nest_topk, nest_wmean, nest_zscore, periodogram, phase_fold,
    rebin, sigma_clip, stetson_jk, trend_slope,
)
from .session import get_spark

__version__ = "0.1.0"

__all__ = [
    "NestedFrame",
    "QueryCompileError",
    "compile_expr",
    "read_parquet",
    "read_jsonl",
    "to_jsonl",
    "from_pyarrow",
    "pack",
    "join_nested",
    "from_flat",
    "from_lists",
    "to_flat",
    "to_lists",
    "frame_explode",
    "split",
    "to_flatten_inner",
    "count_nested",
    "describe",
    "group_describe",
    "minmax",
    "nest_agg",
    "profile",
    "value_counts",
    "histogram",
    "dropna",
    "fillna",
    "sort_values",
    "rebin",
    "phase_fold",
    "nest_diff",
    "nest_rolling",
    "sigma_clip",
    "trend_slope",
    "periodogram",
    "stetson_jk",
    "freq_grid",
    "nest_acf",
    "structure_function",
    "theil_sen",
    "lightcurve_features",
    "nest_align",
    "nest_zscore",
    "nest_topk",
    "nest_wmean",
    "nest_interp",
    "nest_corr",
    "nest_describe",
    "nest_ewm",
    "nest_cum",
    "nest_dedup",
    "nest_decimate",
    "nest_sample",
    "get_spark",
]
