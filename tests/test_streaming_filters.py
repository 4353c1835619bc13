"""Stateless corpus-hygiene operators over Structured Streaming: the same
gopher_quality / gopher_repetition / unigram-free column algebra that runs
in batch must run unchanged on a readStream source and produce identical
rows — the property that lets a crawl-ingest stream apply quality gates
in-flight without a separate code path. (Stateful streaming — dedup,
sessionization — has its own suites; this pins the map-only ops.)"""

import pytest
from pyspark.sql import functions as F

from tika_xapian_spark.operators import textstats as T
from tika_xapian_spark.operators import weburl as W


@pytest.fixture(scope="module")
def doc_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream_docs")
    rows = [
        (i,
         ("the cat sat with the dog and they watched cats play games "
          "outside today under warm sun number %d" % i)
         if i % 3 else "x " * 5 + f"### spam{i}")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # several files so the stream sees multiple batches with maxFilesPerTrigger
    df.repartition(4).write.parquet(str(base / "docs"))
    return str(base / "docs"), df


def _run_stream(spark, src_dir, transform, checkpoint_dir):
    stream_in = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = transform(stream_in)
    q = (
        out.writeStream.format("memory")
        .queryName("hygiene_out")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table("hygiene_out")


def test_gopher_quality_streams_equal_batch(spark, doc_dir, tmp_path):
    src, df = doc_dir
    fn = lambda d: T.gopher_quality(d, key="doc_id", min_words=10, min_stop=1)  # noqa: E731
    got = {
        r["doc"]: tuple(r)
        for r in _run_stream(spark, src, fn, str(tmp_path / "ck")).collect()
    }
    want = {r["doc"]: tuple(r) for r in fn(df).collect()}
    assert got == want
    # both pass/fail classes present (the gate actually discriminates)
    passes = {r[-1] for r in want.values()}
    assert passes == {0, 1}


def test_gopher_repetition_streams_equal_batch(spark, doc_dir, tmp_path):
    src, df = doc_dir
    fn = lambda d: T.gopher_repetition(d, key="doc_id")  # noqa: E731
    got = {
        r["doc"]: tuple(r)
        for r in _run_stream(spark, src, fn, str(tmp_path / "ck2")).collect()
    }
    want = {r["doc"]: tuple(r) for r in fn(df).collect()}
    assert got == want


def test_canonical_url_streams(spark, tmp_path):
    base = tmp_path / "urls"
    rows = [
        (i, f"HTTPS://www.h{i % 3}.com:443/p{i}?utm_source=x&a={i}")
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    df.repartition(2).write.parquet(str(base))
    stream_in = (
        spark.readStream.schema("doc_id long, url string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(base))
    )
    out = stream_in.select(
        "doc_id", W.canonical_url("url").alias("c"), W.host_of("url").alias("h")
    )
    q = (
        out.writeStream.format("memory")
        .queryName("url_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: (r["c"], r["h"]) for r in spark.table("url_out").collect()}
    for i in range(12):
        assert got[i] == (
            f"https://h{i % 3}.com/p{i}?a={i}",
            f"h{i % 3}.com",
        )


def test_pii_scrub_streams_equal_batch(spark, tmp_path):
    from tika_xapian_spark.operators.pii import pii_scrub

    rows = [
        (i, f"call 555-{i:04d} or mail a{i}@ex{i % 3}.example.org "
            f"from 10.0.0.{i % 250} about doc {i}")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "pii_docs")
    df.repartition(3).write.parquet(src)

    stream_in = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        pii_scrub(stream_in, "text")
        .writeStream.format("memory")
        .queryName("pii_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id: tuple(r) for r in spark.table("pii_out").collect()}
    want = {r.doc_id: tuple(r) for r in pii_scrub(df, "text").collect()}
    assert got == want
    assert all(r[-4:-1] == (1, 1, 1) for r in want.values())  # counts found


def test_encoding_anomalies_streams_equal_batch(spark, tmp_path):
    from tika_xapian_spark.operators.textstats import encoding_anomalies

    rows = [
        (i, ("clean ascii text %d" % i) if i % 2 else "bad � ch\x07unk Ã©")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "enc_docs")
    df.repartition(2).write.parquet(src)

    stream_in = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        encoding_anomalies(stream_in, key="doc_id")
        .writeStream.format("memory")
        .queryName("enc_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc: tuple(r) for r in spark.table("enc_out").collect()}
    want = {r.doc: tuple(r) for r in encoding_anomalies(df, key="doc_id").collect()}
    assert got == want
    assert {r[-1] for r in want.values()} == {0, 1}  # both classes present
