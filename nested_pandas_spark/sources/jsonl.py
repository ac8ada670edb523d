"""JSONL corpus source/sink — the LLM-corpus interchange format.

Public corpus releases (Dolma, RedPajama, FineWeb dumps, OpenWebText)
ship as gzip/zstd-compressed JSON-Lines; this is the thin, contract-
pinning wrapper over Spark's native distributed json reader/writer:

* ``read_jsonl`` — explicit schema REQUIRED (schema inference is a
  full extra pass over 100 TB and silently unions drifting types;
  refusing it here is the contract). Non-conforming lines are kept in
  ``_corrupt_record`` when ``keep_corrupt=True`` instead of vanishing.
* ``write_jsonl`` — codec-suffixed part files via Spark's text/json
  writer; gzip and (when the cluster has the codec) zstd.

Spark parallelizes gzip'd JSONL at FILE grain (gzip is not splittable
— one task per file), which is exactly how the public corpora are
shaped: many ~100-500 MB shards. The reader preserves that parallelism
as long as the input is many files; a single 1 TB .gz would serialize,
so ``read_jsonl`` warns in the docstring rather than hiding it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["read_jsonl", "write_jsonl"]


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    *,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Distributed JSONL read with a mandatory schema.

    ``keep_corrupt=True`` adds a ``_corrupt_record`` string column
    (PERMISSIVE mode) holding any non-conforming raw line; the default
    drops malformed lines (DROPMALFORMED) — choose explicitly, never
    silently."""
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    if keep_corrupt:
        schema = T.StructType(
            list(schema.fields)
            + [T.StructField("_corrupt_record", T.StringType())]
        )
        reader = spark.read.schema(schema).option("mode", "PERMISSIVE")
        reader = reader.option("columnNameOfCorruptRecord", "_corrupt_record")
    else:
        reader = spark.read.schema(schema).option("mode", "DROPMALFORMED")
    return reader.json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    compression: str | None = "gzip",
    num_files: int | None = None,
) -> None:
    """Write JSONL shards; ``num_files`` sets the shard count (a
    round-robin repartition — uniform shard sizes, the shape public
    corpus releases use)."""
    out = df.repartition(num_files) if num_files else df
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
