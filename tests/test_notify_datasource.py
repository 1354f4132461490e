"""The telegram write format (sources/notify_datasource.py): batch and
streaming writes must POST the reference's exact sendMessage shape —
exercised against a REAL local HTTP server (api_base injection, same
doctrine as test_notify.py), including the failure contract (exhausted
retries fail the write) and option validation."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest
from pyspark.sql import Row

from airflow_scraping_etl_tutorial_spark.sources.notify_datasource import register


class _Recorder(BaseHTTPRequestHandler):
    requests: list[tuple[str, dict]] = []
    always_fail = False

    def do_POST(self):  # noqa: N802
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        type(self).requests.append((self.path, body))
        self.send_response(500 if type(self).always_fail else 200)
        self.end_headers()
        self.wfile.write(b"{}")

    def log_message(self, *a):
        pass


@pytest.fixture
def http_server():
    _Recorder.requests = []
    _Recorder.always_fail = False
    srv = HTTPServer(("0.0.0.0", 0), _Recorder)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", _Recorder
    srv.shutdown()


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def test_batch_write_posts_sendmessage_per_row(spark, http_server):
    base, rec = http_server
    df = spark.createDataFrame(
        [Row(text="day 20220819 loaded"), Row(text="day 20220822 loaded")]
    )
    (
        df.coalesce(1)
        .write.format("telegram")
        .option("token", "TOK")
        .option("chat_id", "chat42")
        .option("api_base", base)
        .mode("append")
        .save()
    )
    assert len(rec.requests) == 2
    paths = {p for p, _ in rec.requests}
    assert paths == {"/botTOK/sendMessage"}  # the reference URL shape
    texts = sorted(b["text"] for _, b in rec.requests)
    assert texts == ["day 20220819 loaded", "day 20220822 loaded"]
    assert all(b["chat_id"] == "chat42" for _, b in rec.requests)


def test_stream_write_delivers_each_epoch(spark, http_server, tmp_path):
    base, rec = http_server
    src = str(tmp_path / "alerts_in")
    spark.createDataFrame([Row(text="alert: wrong arity")]).write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema("text string").parquet(src)
    q = (
        stream.writeStream.format("telegram")
        .option("token", "T")
        .option("chat_id", "c")
        .option("api_base", base)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert [b["text"] for _, b in rec.requests] == ["alert: wrong arity"]


def test_exhausted_retries_fail_the_write(spark, http_server):
    base, rec = http_server
    rec.always_fail = True
    df = spark.createDataFrame([Row(text="boom")])
    with pytest.raises(Exception, match="(?i)notification|delivery|failed"):
        (
            df.write.format("telegram")
            .option("token", "T")
            .option("chat_id", "c")
            .option("api_base", base)
            .option("retries", "1")
            .option("retry_delay_s", "0.01")
            .mode("append")
            .save()
        )
    assert len(rec.requests) == 2  # initial + 1 retry, then the task fails


def test_missing_credentials_fail_loudly(spark):
    df = spark.createDataFrame([Row(text="x")])
    with pytest.raises(Exception, match="token"):
        df.write.format("telegram").mode("append").save()


def test_null_text_fails_instead_of_sending_none(spark, http_server):
    """A NULL message is an upstream bug — the sink must raise, never
    POST the literal string 'None' to the chat."""
    base, rec = http_server
    df = spark.createDataFrame([("ok",), (None,)], "text string")
    with pytest.raises(Exception, match="(?i)null.*text"):
        (
            df.coalesce(1)
            .write.format("telegram")
            .option("token", "T")
            .option("chat_id", "c")
            .option("api_base", base)
            .mode("append")
            .save()
        )
    assert all(b["text"] != "None" for _, b in rec.requests)
    # whole-partition validation BEFORE the first POST (round-10
    # ADVICE): the 'ok' row sharing the NULL's partition must never be
    # delivered — otherwise Spark's task retries on this deterministic
    # failure would re-send it once per attempt (duplicate alerts)
    assert rec.requests == []


def test_reference_dag_as_pure_formats(spark, http_server):
    """Capstone: the reference's crawl -> clean -> notify DAG expressed
    ENTIRELY as Spark formats — read format('twse'), the declarative
    pipeline transforms, write format('telegram') — with the success
    message shape of Final_app.py's templated text."""
    from pyspark.sql import functions as F

    from airflow_scraping_etl_tutorial_spark.pipeline.investment import (
        clean_long,
    )
    from airflow_scraping_etl_tutorial_spark.sources.twse_datasource import (
        register as register_twse,
    )

    register_twse(spark)
    base, rec = http_server
    raw = spark.read.format("twse").option("dates", "20220819").load()
    summary = (
        clean_long(raw)
        .groupBy("dt")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.concat(
                F.lit("day "), F.col("dt"), F.lit(" loaded ("),
                F.col("n_rows"), F.lit(" rows)"),
            ).alias("text")
        )
    )
    (
        summary.write.format("telegram")
        .option("token", "T")
        .option("chat_id", "c")
        .option("api_base", base)
        .mode("append")
        .save()
    )
    assert [b["text"] for _, b in rec.requests] == ["day 20220819 loaded (4 rows)"]
