"""Nested-aware parquet I/O.

Reference: ``read_parquet`` (``src/nested_pandas/nestedframe/io.py:36-212``)
with nested-column pruning (``columns=["nested.a"]`` reads only that parquet
leaf) and struct-of-lists auto-casting (``io.py:498-606``).

Spark-first: parquet nested-leaf pruning is NATIVE — with
``spark.sql.optimizer.nestedSchemaPruning.enabled`` (default on), a
``select("nested.a")`` prunes the scan's ReadSchema down to the referenced
leaf; no re-packing code needed. What we add:

* ``columns=`` handling that keeps dotted selections nested (re-packs the
  selected sub-fields under the original column name, like the reference's
  partial-load rebuild ``io.py:156-205``) — expressed as ``transform``
  projections so pruning still pushes to the scan;
* struct-of-lists -> list-of-structs auto-cast (the reference's storage
  layout, written by nested-pandas ``to_parquet``) via ``arrays_zip``;
* opt-in cast of bare ``array<T>`` columns into single-field nests
  (``autocast_list``).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import urllib.parse
import urllib.request

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.nested import is_nested_type, quote

__all__ = ["read_parquet", "from_struct_of_lists", "to_struct_of_lists",
           "from_pyarrow", "list_struct_to_struct_of_lists", "read_json",
           "read_jsonl", "to_jsonl", "read_csv", "write_parquet",
           "read_orc", "to_orc",
           "stage_remote", "select_columns"]

# Schemes Spark's Hadoop FileSystem layer serves directly (given the right
# jars on the cluster classpath); everything else goes through driver-side
# staging when fsspec can reach it.
_HADOOP_SCHEMES = {"", "file", "hdfs", "s3a", "gs", "abfs", "abfss", "wasb",
                   "wasbs", "viewfs", "o3fs", "ofs"}


def _cache_path(url: str, cache_dir: str | None, key_extra: str = "") -> str:
    root = cache_dir or os.path.join(tempfile.gettempdir(), "nps_remote_cache")
    os.makedirs(root, exist_ok=True)
    name = os.path.basename(urllib.parse.urlparse(url).path) or "remote.parquet"
    key = hashlib.md5((url + key_extra).encode()).hexdigest()[:16]
    return os.path.join(root, key + "_" + name)


# Observability for tests/tuning: url -> {"bytes_fetched", "file_size",
# "mode"} of the most recent staging transfer for that url.
STAGE_STATS: dict[str, dict] = {}


class _HttpRangeFile:
    """Minimal random-access read-only file over HTTP Range requests —
    exactly the surface pyarrow's ParquetFile needs (seek/tell/read), so the
    footer and only the selected column chunks transfer, never the whole
    object. Counts fetched bytes for observability.

    Raises ``OSError`` if the server doesn't honor Range (no 206) — callers
    fall back to a full download.
    """

    def __init__(self, url: str):
        self.url = url
        self.pos = 0
        self.bytes_fetched = 0
        req = urllib.request.Request(url, method="HEAD")
        with urllib.request.urlopen(req) as r:
            length = r.headers.get("Content-Length")
        if length is None:
            raise OSError(f"no Content-Length from {url}")
        self.size = int(length)

    # file-object protocol (what pyarrow.PythonFile consumes) -------------
    def seekable(self):
        return True

    def readable(self):
        return True

    @property
    def closed(self) -> bool:  # pyarrow probes the attribute, not a call
        return False

    def seek(self, off: int, whence: int = 0) -> int:
        if whence == 0:
            self.pos = off
        elif whence == 1:
            self.pos += off
        elif whence == 2:
            self.pos = self.size + off
        return self.pos

    def tell(self) -> int:
        return self.pos

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = self.size - self.pos
        if n == 0 or self.pos >= self.size:
            return b""
        end = min(self.pos + n, self.size) - 1
        req = urllib.request.Request(
            self.url, headers={"Range": f"bytes={self.pos}-{end}"}
        )
        with urllib.request.urlopen(req) as r:
            if r.status != 206:
                raise OSError(f"server ignored Range request ({r.status})")
            data = r.read()
        self.pos += len(data)
        self.bytes_fetched += len(data)
        return data

    def close(self):
        pass


def _stage_columns_ranged(url: str, columns: list[str], tmp: str) -> dict:
    """Fetch footer + selected top-level column chunks via HTTP ranges and
    write them as a local parquet file. Returns transfer stats."""
    import pyarrow.parquet as pq

    src = _HttpRangeFile(url)
    pf = pq.ParquetFile(src)
    table = pf.read(columns=columns)
    pq.write_table(table, tmp)
    return {
        "bytes_fetched": src.bytes_fetched,
        "file_size": src.size,
        "mode": "ranged",
    }


def stage_remote(
    url: str, cache_dir: str | None = None, columns: list[str] | None = None
) -> str:
    """Download a remote file to a local cache, once, and return its path.

    The reference's ``read_parquet`` accepts fsspec URIs (s3/https) with
    byte-range precaching — only the parquet footer and the SELECTED column
    byte ranges transfer (reference ``io.py:36-212``, precache
    ``io.py:248-255``, exercised by ``benchmarks/benchmarks.py:218-257``);
    Spark's analogue for cluster-scale data is a Hadoop-native filesystem
    (``s3a://`` with hadoop-aws on the classpath), which streams splits
    straight to executors. This helper covers the OTHER reference use case
    — a laptop-sized remote file (an HTTPS release artifact, a public S3
    object) — by staging it onto the driver's disk so any Spark deployment
    can read it without extra jars.

    ``columns`` (top-level names) enables the reference's byte-range
    behavior: the footer plus only those columns' chunks are fetched via
    HTTP Range requests (pyarrow over a ranged reader) and written as a
    pruned local file — a wide remote file with a narrow projection
    transfers a fraction of its size. Falls back to a full download when
    the server doesn't honor Range. Transfer accounting lands in
    :data:`STAGE_STATS`.

    Uses fsspec when importable (covers s3/gs/... with credentials),
    stdlib urllib otherwise (http/https only). Cached by URL (+ column
    set) hash — repeated reads don't re-download.
    """
    scheme = urllib.parse.urlparse(url).scheme
    col_key = "|cols:" + ",".join(sorted(columns)) if columns else ""
    dest = _cache_path(url, cache_dir, col_key)
    if os.path.exists(dest):
        return dest
    tmp = dest + ".tmp"
    if columns and scheme in ("http", "https"):
        try:
            STAGE_STATS[url] = _stage_columns_ranged(url, columns, tmp)
            os.replace(tmp, dest)
            return dest
        except Exception:  # noqa: BLE001 - no Range support etc: full fetch
            pass
    try:
        import fsspec  # optional: widens scheme support beyond http(s)

        if not hasattr(fsspec, "open"):  # stub/partial install
            raise ImportError("fsspec lacks open()")
        with fsspec.open(url, "rb") as src, open(tmp, "wb") as out:
            while chunk := src.read(1 << 20):
                out.write(chunk)
    except ImportError:
        if scheme not in ("http", "https"):
            raise RuntimeError(
                f"Reading '{url}' needs either the fsspec package (driver-side "
                f"staging) or a Hadoop filesystem for scheme '{scheme}' on the "
                "Spark classpath"
            ) from None
        urllib.request.urlretrieve(url, tmp)
    STAGE_STATS[url] = {
        "bytes_fetched": os.path.getsize(tmp),
        "file_size": os.path.getsize(tmp),
        "mode": "full",
    }
    os.replace(tmp, dest)  # atomic: concurrent readers never see partials
    return dest


def _resolve_paths(
    paths: list[str], cache_dir: str | None,
    columns: list[str] | None = None,
) -> list[str]:
    out = []
    for p in paths:
        scheme = urllib.parse.urlparse(p).scheme.lower()
        # Windows drive letters parse as single-char schemes; treat as local
        if len(scheme) <= 1 or scheme in _HADOOP_SCHEMES:
            out.append(p)
        else:
            out.append(stage_remote(p, cache_dir, columns=columns))
    return out


def _read_with_fs_hint(spark: SparkSession, paths: list[str]) -> DataFrame:
    """spark.read.parquet with a actionable error for missing FS connectors."""
    try:
        return spark.read.parquet(*paths)
    except Exception as exc:  # noqa: BLE001 - re-raise with packaging hint
        msg = str(exc)
        if "S3AFileSystem" in msg or "No FileSystem for scheme" in msg:
            raise RuntimeError(
                "Spark has no filesystem connector for this URI. For s3a:// "
                "add hadoop-aws to the session, e.g. "
                "spark.jars.packages=org.apache.hadoop:hadoop-aws:3.4.1 "
                "(match your Hadoop version) plus credentials via "
                "spark.hadoop.fs.s3a.*; for small remote files use an "
                "https:// URI, which stages via the driver instead."
            ) from exc
        raise


def _struct_of_lists_cols(df: DataFrame, reject: set[str]) -> list[str]:
    """Columns typed struct<a: array<...>, b: array<...>> (all fields lists)."""
    out = []
    for f in df.schema.fields:
        if f.name in reject:
            continue
        if isinstance(f.dataType, T.StructType) and f.dataType.fields and all(
            isinstance(sf.dataType, T.ArrayType) for sf in f.dataType.fields
        ):
            out.append(f.name)
    return out


def from_struct_of_lists(
    df: DataFrame, columns: list[str] | None = None, validate: bool = False
) -> DataFrame:
    """Cast struct-of-lists columns (nested-pandas' parquet layout,
    reference ``core.py:2586-2631``) to list-of-structs via ``arrays_zip``.

    ``validate=True`` raises at execution when a cell's field lists have
    different lengths (the reference's contract, ``io.py:588-597``) instead
    of arrays_zip's silent NULL padding.
    """
    from ..operators.packer import equal_length_guard

    targets = columns if columns is not None else _struct_of_lists_cols(df, set())
    for c in targets:
        dt = df.schema[c].dataType
        assert isinstance(dt, T.StructType)
        fields = [sf.name for sf in dt.fields]
        if validate and len(fields) > 1:
            df = equal_length_guard(
                df, fields, f"from_struct_of_lists('{c}')",
                extract=lambda f: F.col(f"{quote(c)}.{quote(f)}"),
            )
        zipped = F.arrays_zip(
            *[F.col(f"{quote(c)}.{quote(f)}").alias(f) for f in fields]
        )
        df = df.withColumn(c, zipped)
    return df


def to_struct_of_lists(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Cast list-of-structs nested columns to ``struct<f: array<...>, ...>``
    — the layout the reference's ``to_parquet`` writes to disk (reference
    ``core.py:2586-2631``, storage ``series/ext_array.py:929-945``).

    Inverse of :func:`from_struct_of_lists`. Pure ``transform`` projections,
    one per field — JVM-side and fully distributed (no Arrow driver pass),
    so it holds at any scale. NULL cells stay NULL.
    """
    from ..functions.nested import nested_field_names

    targets = columns if columns is not None else [
        f.name for f in df.schema.fields if is_nested_type(f.dataType)
    ]
    for c in targets:
        fields = nested_field_names(df, c)
        sol = F.struct(
            *[
                F.expr(f"transform({quote(c)}, __x -> __x.{quote(f)})").alias(f)
                for f in fields
            ]
        )
        df = df.withColumn(
            c, F.when(F.col(quote(c)).isNotNull(), sol)
        )
    return df


def _dnf_filters_to_sql(filters) -> str:
    """pyarrow DNF filter tuples -> one SQL predicate.

    ``[(col, op, val), ...]`` is a conjunction; ``[[...], [...]]`` is an
    OR of conjunctions (the exact grammar pyarrow's ``filters=`` takes,
    which the reference forwards — reference ``io.py:344``).
    """
    from .expr import _sql_literal

    def _one(t) -> str:
        if not (isinstance(t, (list, tuple)) and len(t) == 3):
            raise ValueError(f"filters: expected (column, op, value), got {t!r}")
        col, op, val = t
        q = "`" + str(col).replace("`", "``") + "`"
        op = {"=": "=", "==": "=", "!=": "!=", "<": "<", "<=": "<=",
              ">": ">", ">=": ">="}.get(op, op)
        if op in ("in", "not in"):
            items = ", ".join(_sql_literal(v) for v in val)
            return f"({q} {'NOT ' if op == 'not in' else ''}IN ({items}))"
        if op not in ("=", "!=", "<", "<=", ">", ">="):
            raise ValueError(f"filters: unsupported op {op!r}")
        return f"({q} {op} {_sql_literal(val)})"

    conj = lambda ts: "(" + " AND ".join(_one(t) for t in ts) + ")"  # noqa: E731
    if all(isinstance(t, (list, tuple)) and len(t) == 3
           and isinstance(t[0], str) for t in filters):
        return conj(filters)
    return "(" + " OR ".join(conj(group) for group in filters) + ")"


def read_parquet(
    spark: SparkSession,
    path: str | list[str],
    columns: list[str] | None = None,
    reject_nesting: str | list[str] | None = None,
    autocast_list: bool = False,
    filters: object = None,
    cache_dir: str | None = None,
    use_pandas_metadata: bool = True,
) -> DataFrame:
    """Read parquet with nested-column selection and auto-casting.

    ``filters``: SQL predicate string OR pyarrow-style DNF tuples —
    ``[("z", "<", 0.5)]`` (conjunction) or ``[[(...), (...)], [...]]``
    (OR of conjunctions), exactly what the reference's ``read_parquet``
    accepts (reference ``io.py:344`` filters kwarg, GH#492 allows
    filtering on columns NOT in ``columns=``); applied right after the
    scan, so Catalyst pushes it into the parquet read.

    ``columns`` may mix base names and dotted ``"nested.field"`` selections;
    dotted selections are re-packed under their nest (partial load,
    reference ``io.py:107-205``). Column pruning reaches the parquet
    footer either way — check ``.explain`` ReadSchema.

    Remote URIs (reference ``io.py:36-212`` takes fsspec URIs): Hadoop-native
    schemes (``hdfs://``, ``s3a://``, ``gs://``, ...) stream straight to
    executors — the scale path, needs the connector jar on the classpath
    (actionable error otherwise). ``http(s)://`` and other fsspec schemes
    stage onto the driver disk first (:func:`stage_remote`, cached in
    ``cache_dir``) — the laptop path for release artifacts and public files.
    """
    reject = set([reject_nesting] if isinstance(reject_nesting, str) else reject_nesting or [])
    # staged (non-Hadoop) remote reads fetch only the selected top-level
    # columns' byte ranges; dotted "nest.field" selections prune to their
    # nest's column chunk (leaf-level pruning then happens at the scan)
    top_cols = (
        sorted({c.split(".", 1)[0] for c in columns}) if columns else None
    )
    paths = _resolve_paths(
        [path] if isinstance(path, str) else list(path), cache_dir, top_cols
    )
    df = _read_with_fs_hint(spark, paths)
    if use_pandas_metadata:
        # Spark has no row index; "the pandas index becomes an explicit key
        # column" (docs/migration.md). A pandas-written file with an UNNAMED
        # index serializes it as __index_level_N__ — surface it under
        # pandas' own reset_index() naming instead of the serialization
        # artifact (reference restores it as the index,
        # test_io.py test_use_pandas_metadata / GH#460; named index columns
        # already carry their name; a metadata-only RangeIndex has no
        # column at all). use_pandas_metadata=False keeps raw names.
        levels = [c for c in df.columns
                  if c.startswith("__index_level_") and c.endswith("__")]
        for i, c in enumerate(sorted(levels)):
            new = "index" if len(levels) == 1 else f"level_{i}"
            if new not in df.columns:
                df = df.withColumnRenamed(c, new)
    if filters is not None and not (isinstance(filters, (list, tuple))
                                    and len(filters) == 0):
        df = df.where(filters if isinstance(filters, str)
                      else _dnf_filters_to_sql(filters))

    # auto-cast nested-pandas struct-of-lists layout
    sol = _struct_of_lists_cols(df, reject)
    if sol:
        df = from_struct_of_lists(df, sol)

    if autocast_list:
        df = _autocast_plain_lists(df, reject)

    if columns is None:
        return df
    return select_columns(df, columns)


def _autocast_plain_lists(df: DataFrame, reject: set[str]) -> DataFrame:
    """Wrap plain ``array<scalar>`` columns as single-field nested columns
    (``array<struct<name: scalar>>``) — the reference's ``autocast_list``
    (``io.py:279-306``). Shared by every reader so parquet/ORC behave
    identically; must run BEFORE column selection so dotted partial loads
    see the same nested shape either way."""
    for f in df.schema.fields:
        if (
            f.name not in reject
            and isinstance(f.dataType, T.ArrayType)
            and not isinstance(f.dataType.elementType, T.StructType)
        ):
            df = df.withColumn(
                f.name,
                F.expr(
                    f"transform({quote(f.name)}, __x -> struct(__x AS {quote(f.name)}))"
                ),
            )
    return df


def select_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """Project base names and dotted ``"nested.field"`` selections; dotted
    selections re-pack under their nest (the reference's partial-load
    shape, ``io.py:107-205``). Shared by every reader."""
    nested = {f.name for f in df.schema.fields if is_nested_type(f.dataType)}
    base_sel: list[str] = []
    per_nest: dict[str, list[str]] = {}
    for c in columns:
        if "." in c and c.split(".", 1)[0] in nested:
            nest, fld = c.split(".", 1)
            per_nest.setdefault(nest, []).append(fld)
        else:
            base_sel.append(c)
    proj = [F.col(quote(c)) for c in base_sel]
    for nest, flds in per_nest.items():
        # arrays_zip over per-leaf extractions, NOT a transform(...struct...)
        # lambda: Catalyst's nested-schema pruning sees GetArrayStructFields
        # and narrows the parquet ReadSchema to the requested leaves, but it
        # cannot see through a lambda body — the transform form silently
        # reads every field of the struct (tools/plan_audit.py guards this).
        proj.append(
            F.arrays_zip(
                *[
                    F.expr(f"{quote(nest)}.{quote(f)}").alias(f)
                    for f in flds
                ]
            ).alias(nest)
        )
    return df.select(*proj)


def to_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
    num_files: int | None = None,
) -> None:
    """Write as JSON lines (one object per row; ``array<struct>`` nests
    serialize as arrays of objects). Null fields are omitted per JSON
    convention — a round-trip restores them as NULLs.

    ``compression`` ('gzip', 'zstd' when the codec is present) and
    ``num_files`` (round-robin repartition — uniform shard sizes)
    produce the many-medium-shards layout public corpus releases use;
    gzip JSONL parallelizes at FILE grain on read (gzip is not
    splittable), so shard count IS the read parallelism."""
    out = df.repartition(num_files) if num_files else df
    w = out.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def list_struct_to_struct_of_lists(col, large_list: bool = False):
    """Convert an Arrow ``list<struct<...>>`` column to
    ``struct<f: list<...>, ...>`` (the reference's NestedDtype storage,
    reference ``series/ext_array.py:929-945``). Null cells stay null.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lens = pc.list_value_length(col).fill_null(0).to_numpy(zero_copy_only=False)
    offsets = np.concatenate([[0], np.cumsum(lens, dtype=np.int64)])
    flat = pc.list_flatten(col)  # skips null cells, aligned with lens==0
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    mk = pa.LargeListArray.from_arrays if large_list else pa.ListArray.from_arrays
    off_arr = pa.array(offsets, type=pa.int64() if large_list else pa.int32())
    names = [f.name for f in col.type.value_type]
    fields = [mk(off_arr, flat.field(n)) for n in names]
    return pa.StructArray.from_arrays(fields, names, mask=pc.is_null(col))


def from_pyarrow(
    spark: SparkSession,
    table,
    reject_nesting: str | list[str] | None = None,
    autocast_list: bool = False,
    validate: bool = False,
) -> DataFrame:
    """Load a ``pyarrow.Table`` as a nested DataFrame (reference
    ``io.py:498-572``).

    Struct-of-lists columns (the reference's NestedDtype storage, written by
    its ``to_parquet``) are cast to this engine's native ``array<struct>``
    via ``arrays_zip`` unless listed in ``reject_nesting``; with
    ``autocast_list`` bare ``array<T>`` columns become single-field nests.

    Mismatched lengths: the reference raises when a struct-of-lists cell
    has fields of different lengths (``io.py:588-597``); by default
    ``arrays_zip`` pads the shorter lists with NULLs. ``validate=True``
    restores the reference's raise — at execution, via an ``assert_true``
    predicate inside the same scan (distributed; no driver-side pass).
    """
    import pyarrow as pa

    reject = set([reject_nesting] if isinstance(reject_nesting, str)
                 else reject_nesting or [])
    # large_list/large_string aren't accepted by Spark's Arrow ingest — downcast
    casts = {}
    for f in table.schema:
        if pa.types.is_large_list(f.type):
            casts[f.name] = pa.list_(f.type.value_type)
        elif pa.types.is_large_string(f.type):
            casts[f.name] = pa.string()
        elif pa.types.is_struct(f.type) and any(
            pa.types.is_large_list(sf.type) for sf in f.type
        ):
            casts[f.name] = pa.struct(
                [
                    pa.field(sf.name, pa.list_(sf.type.value_type))
                    if pa.types.is_large_list(sf.type) else sf
                    for sf in f.type
                ]
            )
    if casts:
        table = table.cast(
            pa.schema([pa.field(f.name, casts.get(f.name, f.type))
                       for f in table.schema])
        )
    df = spark.createDataFrame(table)
    sol = _struct_of_lists_cols(df, reject)
    if sol:
        df = from_struct_of_lists(df, sol, validate=validate)
    if autocast_list:
        for f in df.schema.fields:
            if (
                f.name not in reject
                and isinstance(f.dataType, T.ArrayType)
                and not isinstance(f.dataType.elementType, T.StructType)
            ):
                df = df.withColumn(
                    f.name,
                    F.expr(
                        f"transform({quote(f.name)}, __x -> struct(__x AS {quote(f.name)}))"
                    ),
                )
    return df


def read_json(
    spark: SparkSession,
    path: str | list[str],
    schema: str | T.StructType | None = None,
    autocast_list: bool = False,
    columns: list[str] | None = None,
    filters: str | None = None,
    **options,
) -> DataFrame:
    """Read JSON(L) with the same nested-column surface as
    :func:`read_parquet` (beyond the reference, which is parquet-only).
    JSON arrays of objects arrive natively as ``array<struct>``;
    ``autocast_list`` wraps bare arrays into single-field nests;
    ``columns`` supports dotted partial loads; ``filters`` applies right
    after the scan. JSON has no column chunks, so pruning saves parse
    work, not bytes read — convert long-lived corpora to parquet for
    real pruning.

    Always pass ``schema`` at scale — schema inference scans the data twice,
    and inference can widen types on dirty data.
    """
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(*([path] if isinstance(path, str) else path))
    if filters:
        df = df.where(filters)
    if columns is not None:
        df = select_columns(df, columns)
    if autocast_list:
        for f in df.schema.fields:
            if isinstance(f.dataType, T.ArrayType) and not isinstance(
                f.dataType.elementType, T.StructType
            ):
                df = df.withColumn(
                    f.name,
                    F.expr(
                        f"transform({quote(f.name)}, __x -> struct(__x AS {quote(f.name)}))"
                    ),
                )
    return df


# JSONL is the training-data interchange name for the same format
read_jsonl = read_json


def read_csv(
    spark: SparkSession,
    path: str | list[str],
    schema: str | T.StructType | None = None,
    header: bool = True,
    **options,
) -> DataFrame:
    """Read CSV (flat — CSV has no nested representation; pack afterwards
    with ``join_nested``/``from_flat``)."""
    reader = spark.read.options(header=str(header).lower(), **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(*([path] if isinstance(path, str) else path))


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: str | list[str] | None = None,
    max_records_per_file: int | None = None,
    layout: str = "list_struct",
    **options,
) -> None:
    """Parquet writer with the scale knobs surfaced: hive-style partitioning
    (prunes whole directories at read time) and per-file row caps (keeps
    files splittable-friendly and small enough for object-store ranged
    reads).

    ``layout``: ``"list_struct"`` (native — what this engine reads fastest)
    or ``"struct_of_lists"`` — the byte layout the reference's ``to_parquet``
    writes (reference ``core.py:2586-2631``), so the written file loads
    directly into a reference ``NestedFrame``; our ``read_parquet``
    auto-casts it back on read either way.
    """
    if layout not in ("list_struct", "struct_of_lists"):
        raise ValueError(f"Unknown parquet layout: {layout!r}")
    if layout == "struct_of_lists":
        df = to_struct_of_lists(df)
    writer = df.write.mode(mode).options(**options)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        writer = writer.partitionBy(*cols)
    writer.parquet(path)


def read_orc(
    spark: SparkSession,
    path: str | list[str],
    columns: list[str] | None = None,
    filters: str | None = None,
    reject_nesting: str | list[str] | None = None,
    autocast_list: bool = False,
    **options,
) -> DataFrame:
    """Read ORC with the same nested-column surface as :func:`read_parquet`
    (beyond the reference, which is parquet-only). ORC stores
    ``array<struct>`` natively and supports columnar projection +
    predicate pushdown, so ``columns`` (dotted names allowed) and
    ``filters`` prune at the scan just like parquet
    (``spark.sql.orc.enableVectorizedReader`` is on by default).

    ``autocast_list`` / ``reject_nesting`` run before column selection via
    the same helper as :func:`read_parquet`, so dotted partial loads see
    the identical nested shape from both readers.
    """
    reject = set(
        [reject_nesting] if isinstance(reject_nesting, str) else reject_nesting or []
    )
    df = spark.read.options(**options).orc(
        *([path] if isinstance(path, str) else path)
    )
    if filters:
        df = df.where(filters)
    if autocast_list:
        df = _autocast_plain_lists(df, reject)
    if columns is not None:
        df = select_columns(df, columns)
    return df


def to_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: str | list[str] | None = None,
    **options,
) -> None:
    """Write ORC (nested ``array<struct>`` columns serialize natively)."""
    writer = df.write.mode(mode).options(**options)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        writer = writer.partitionBy(*cols)
    writer.orc(path)
