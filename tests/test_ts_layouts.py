"""The events table has shipped as TIMESTAMP(NANOS) in one testdata drop and
TIMESTAMP(MICROS) in another; the entry contract's reader must normalize both
to the same canonical int64-nanosecond column."""

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def layout_dirs(tmp_path_factory):
    src = "/root/testdata/sf0.001/events.parquet"
    tbl = pq.read_table(src)
    ts = tbl.column("ts")
    idx = tbl.schema.get_field_index("ts")
    us = tmp_path_factory.mktemp("events_us")
    ns = tmp_path_factory.mktemp("events_ns")
    if pa.types.is_timestamp(ts.type):
        base = tbl.set_column(idx, "ts", ts.cast(pa.timestamp("us")))
    else:  # int64 nanos on disk
        base = tbl.set_column(
            idx, "ts", ts.cast(pa.int64()).cast(pa.timestamp("ns"))
        )
    pq.write_table(
        base.set_column(idx, "ts", base.column("ts").cast(pa.timestamp("us"))),
        f"{us}/events.parquet",
    )
    pq.write_table(
        base.set_column(idx, "ts", base.column("ts").cast(pa.timestamp("ns"))),
        f"{ns}/events.parquet",
        store_schema=False,  # expose the physical TIMESTAMP(NANOS) annotation
    )
    # the other tables aren't needed; _t only reads events here
    return str(us), str(ns)


def test_entry_reader_normalizes_both_layouts(spark, layout_dirs):
    import __spark_entry__ as E

    us_dir, ns_dir = layout_dirs
    a = E._t(spark, us_dir, "events")
    b = E._t(spark, ns_dir, "events")
    assert dict(a.dtypes)["ts"] == "bigint"
    assert dict(b.dtypes)["ts"] == "bigint"
    ra = sorted((r["event_id"], r["ts"]) for r in a.select("event_id", "ts").collect())
    rb = sorted((r["event_id"], r["ts"]) for r in b.select("event_id", "ts").collect())
    assert ra == rb  # identical canonical nanos from either physical layout


def test_stream_reader_handles_both_layouts(spark, layout_dirs):
    from nested_pandas_spark.streaming import events as ev

    counts = []
    for i, d in enumerate(layout_dirs):
        stream = ev.read_event_stream(spark, d)
        out = ev.hourly_rollup(stream)
        name = f"layout_sink_{i}"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        counts.append(spark.table(name).count())
    assert counts[0] == counts[1] > 0  # same windows from either layout
