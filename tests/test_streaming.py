"""Streaming operators: batch/stream parity and stateful ops.

Strategy: copy the driver's events parquet into a stream-source dir, run
each operator once as a stream (trigger=availableNow -> memory sink) and
once as plain batch on the same data, and require identical results.
"""

import shutil

import pytest
from pyspark.sql import functions as F

from nested_pandas_spark.streaming import events as ev

SRC = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(SRC, d / "part-0.parquet")
    return str(d)


@pytest.fixture(scope="module")
def batch_events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(SRC)


def _run_stream(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_hourly_rollup_stream_matches_batch(spark, stream_dir, batch_events):
    stream = ev.read_event_stream(spark, stream_dir)
    got = _run_stream(spark, ev.hourly_rollup(stream), "hourly").toPandas()
    want = ev.hourly_rollup(batch_events).toPandas()
    key = ["hour_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert (got["n"].values == want["n"].values).all()
    assert (got["max_value"].values == want["max_value"].values).all()


def test_sessionize_stream_matches_batch(spark, stream_dir, batch_events):
    stream = ev.read_event_stream(spark, stream_dir)
    got = _run_stream(spark, ev.sessionize(stream), "sessions").toPandas()
    want = ev.sessionize(batch_events).toPandas()
    key = ["user_id", "session_start"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert (got["n_events"].values == want["n_events"].values).all()


def test_running_user_totals_stateful(spark, stream_dir, batch_events):
    stream = ev.read_event_stream(spark, stream_dir)
    q = (
        ev.running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("totals").toPandas()
    # final state per user must equal the batch totals
    want = (
        batch_events.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .toPandas()
    )
    got_last = got.groupby("user_id").last()
    want = want.set_index("user_id")
    for uid in want.index:
        assert got_last.loc[uid, "n_events"] == want.loc[uid, "n_events"]


def test_stream_interval_join_matches_batch(spark, stream_dir, batch_events):
    def split(df):
        clicks = df.where(F.col("event_type") == "click")
        signups = df.where(F.col("event_type") == "signup").select(
            "user_id", "ts", F.col("event_id").alias("signup_event")
        )
        return clicks, signups

    sc, ss = split(ev.read_event_stream(spark, stream_dir))
    joined = ev.stream_interval_join(sc, ss, on="user_id",
                                     right_cols=["signup_event"])
    q = (
        joined.writeStream.format("memory")
        .queryName("ivj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("ivj").select("event_id", "signup_event_right").toPandas()

    bc, bs = split(batch_events)
    want = ev.stream_interval_join(bc, bs, on="user_id",
                                   right_cols=["signup_event"]) \
        .select("event_id", "signup_event_right").toPandas()
    key = ["event_id", "signup_event_right"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert (got.values == want.values).all()


def test_stream_dedup(spark, stream_dir, batch_events, tmp_path):
    import shutil

    # duplicate the stream source so every event appears twice
    d = tmp_path / "dup_stream"
    d.mkdir()
    shutil.copy(SRC, d / "a.parquet")
    shutil.copy(SRC, d / "b.parquet")
    stream = ev.read_event_stream(spark, str(d))
    q = (
        ev.stream_dedup(stream, keys=["event_id"])
        .writeStream.format("memory")
        .queryName("dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup").count()
    want = batch_events.count()
    assert got == want  # each duplicated event emitted once


def test_checkpointed_restart_processes_each_file_once(spark, tmp_path):
    """Exactly-once across restarts: a file-sink stream with a checkpoint,
    stopped and restarted with a new input file, must emit every input
    file's rows exactly once — the recovery contract a production
    ingest pipeline relies on (checkpoint tracks consumed files; the
    restarted query resumes from the log, not from scratch)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    import os

    os.makedirs(src)
    shutil.copy(SRC, f"{src}/batch1.parquet")
    base = spark.read.parquet(SRC)
    n1 = base.count()

    def run_once():
        stream = ev.read_event_stream(spark, src)
        q = (
            ev.with_event_time(stream)
            .select("event_id", "user_id", "event_time")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(out).count() == n1

    # second input file arrives while the query is DOWN; restart from the
    # same checkpoint: batch1 must not be reprocessed
    second = base.limit(500)
    n2 = second.count()
    second.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage2"))
    import glob

    part = glob.glob(str(tmp_path / "stage2" / "*.parquet"))[0]
    shutil.copy(part, f"{src}/batch2.parquet")
    run_once()

    got = spark.read.parquet(out)
    assert got.count() == n1 + n2
    # every event id appears exactly (occurrences in src) times — no dups
    dup_check = (
        got.groupBy("event_id").count().where(F.col("count") > 2).count()
    )
    assert dup_check == 0


def test_windowed_rollup_stream_equals_batch(spark, tmp_path):
    import shutil
    import uuid

    from nested_pandas_spark.streaming import events as evs

    src = "/root/testdata/sf0.001/events.parquet"
    d = tmp_path / "ev"
    d.mkdir()
    shutil.copy(src, d / "part-0.parquet")
    batch = evs.windowed_rollup(
        spark.read.parquet(str(d)), keys=["user_id"], window="1 day")
    name = "wr_" + uuid.uuid4().hex[:8]
    q = (
        evs.windowed_rollup(evs.read_event_stream(spark, str(d)),
                            keys=["user_id"], window="1 day")
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {(r["window_start"], r["user_id"]): (r["n"], r["min_value"])
           for r in spark.table(name).collect()}
    want = {(r["window_start"], r["user_id"]): (r["n"], r["min_value"])
            for r in batch.collect()}
    assert got == want


def test_stream_dedup_against_matches_batch(spark, tmp_path):
    """stream_dedup_against (continuous-ingest dedup vs a static accepted
    corpus) must admit exactly the fingerprint set the batch
    dedup_against admits — delivered across TWO micro-batches so the
    second copy of every document is absorbed by the state store."""
    from nested_pandas_spark.pipeline.dedup import dedup_against
    from nested_pandas_spark.pipeline.text import fingerprint

    docs_src = "/root/testdata/sf0.001/documents.parquet"
    docs = spark.read.parquet(docs_src)
    ref = docs.where(F.col("doc_id") % 4 == 0)
    new_batch = docs.where(F.col("doc_id") % 4 != 0)

    d = tmp_path / "docs_stream"
    d.mkdir()
    shutil.copy(docs_src, d / "a.parquet")
    shutil.copy(docs_src, d / "b.parquet")
    stream = (
        spark.readStream.option("maxFilesPerTrigger", "1")
        .schema(docs.schema)
        .parquet(str(d))
        .where(F.col("doc_id") % 4 != 0)
    )
    surv = ev.stream_dedup_against(stream, ref, text_col="text")
    q = (
        surv.writeStream.format("memory")
        .queryName("sda")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["fp"]
        for r in spark.table("sda")
        .select(fingerprint("text").alias("fp"))
        .collect()
    }
    want = {
        r["fp"]
        for r in dedup_against(new_batch, ref)
        .select(fingerprint("text").alias("fp"))
        .collect()
    }
    assert got == want and len(got) > 0
    # every admitted fingerprint exactly once despite double delivery
    assert spark.table("sda").count() == len(got)
    # batch degrade path: same fingerprint set
    batch_surv = ev.stream_dedup_against(new_batch, ref, text_col="text")
    got_b = {r["fp"] for r in
             batch_surv.select(fingerprint("text").alias("fp")).collect()}
    assert got_b == want


def test_stream_neardup_against_matches_batch(spark, tmp_path):
    """stream_neardup_against (continuous-ingest MinHash near-dup vs a
    static accepted corpus) must admit exactly the rows with NO
    cross-corpus LSH candidate per the batch generator
    lsh_candidate_pairs_between — delivered across TWO micro-batches;
    the filter is stateless so both deliveries survive identically."""
    from nested_pandas_spark.pipeline.dedup import lsh_candidate_pairs_between

    docs_src = "/root/testdata/sf0.001/documents.parquet"
    docs = spark.read.parquet(docs_src)
    ref = docs.where(F.col("doc_id") % 4 == 0)
    new_batch = docs.where(F.col("doc_id") % 4 != 0)

    d = tmp_path / "neardup_stream"
    d.mkdir()
    shutil.copy(docs_src, d / "a.parquet")
    shutil.copy(docs_src, d / "b.parquet")
    stream = (
        spark.readStream.option("maxFilesPerTrigger", "1")
        .schema(docs.schema)
        .parquet(str(d))
        .where(F.col("doc_id") % 4 != 0)
    )
    surv = ev.stream_neardup_against(stream, ref, text_col="text")
    q = (
        surv.writeStream.format("memory")
        .queryName("snda")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r["doc_id"] for r in spark.table("snda").select("doc_id").collect()}
    cand = {
        r["new_id"]
        for r in lsh_candidate_pairs_between(new_batch, ref).collect()
    }
    allnew = {r["doc_id"] for r in new_batch.select("doc_id").collect()}
    want = allnew - cand
    assert got == want and len(got) > 0 and len(cand) > 0
    # stateless filter: both micro-batch deliveries survive -> 2x rows
    assert spark.table("snda").count() == 2 * len(got)
    # batch degrade path: same surviving set
    got_b = {
        r["doc_id"]
        for r in ev.stream_neardup_against(new_batch, ref).select("doc_id").collect()
    }
    assert got_b == want
