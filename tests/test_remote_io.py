"""Remote-filesystem parquet reads (http staging + s3a guidance).

Matches the reference's remote-I/O surface (reference ``io.py:36-212`` takes
fsspec URIs; its e2e test reads remote ZTF parquet over HTTPS) without
needing network: a local http.server stands in for the remote store.
"""

import http.server
import os
import threading

import pytest

from nested_pandas_spark.nestedframe.io import read_parquet, stage_remote


class _CountingHandler(http.server.SimpleHTTPRequestHandler):
    hits = {}

    def log_message(self, *a):  # silence request logging
        pass

    def do_GET(self):
        _CountingHandler.hits[self.path] = _CountingHandler.hits.get(self.path, 0) + 1
        super().do_GET()


@pytest.fixture(scope="module")
def http_store(spark, objects, tmp_path_factory):
    root = tmp_path_factory.mktemp("remote_store")
    # single-file parquet so one GET serves the whole dataset
    objects.coalesce(1).write.mode("overwrite").parquet(str(root / "obj_dir"))
    part = next(p for p in os.listdir(root / "obj_dir") if p.endswith(".parquet"))
    os.rename(root / "obj_dir" / part, root / "objects.parquet")

    handler = lambda *a, **kw: _CountingHandler(*a, directory=str(root), **kw)  # noqa: E731
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_read_parquet_over_http(spark, objects, http_store, tmp_path):
    url = f"{http_store}/objects.parquet"
    df = read_parquet(spark, url, cache_dir=str(tmp_path))
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, objects.collect()))


def test_http_staging_is_cached(spark, http_store, tmp_path):
    url = f"{http_store}/objects.parquet"
    _CountingHandler.hits.clear()
    read_parquet(spark, url, cache_dir=str(tmp_path)).count()
    read_parquet(spark, url, cache_dir=str(tmp_path)).count()
    assert _CountingHandler.hits.get("/objects.parquet") == 1


def test_stage_remote_rejects_unreachable_scheme(tmp_path, monkeypatch):
    import builtins

    real_import = builtins.__import__

    def no_fsspec(name, *a, **kw):
        if name == "fsspec":
            raise ImportError("fsspec not installed")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_fsspec)
    with pytest.raises(RuntimeError, match="fsspec|Hadoop"):
        stage_remote("s3://bucket/key.parquet", cache_dir=str(tmp_path))


def test_s3a_error_mentions_hadoop_aws(spark):
    with pytest.raises(RuntimeError, match="hadoop-aws"):
        read_parquet(spark, "s3a://some-bucket/data.parquet")


def test_local_paths_untouched(spark, objects, tmp_path):
    p = str(tmp_path / "local.parquet")
    objects.write.mode("overwrite").parquet(p)
    assert read_parquet(spark, p).count() == objects.count()
