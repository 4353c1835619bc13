"""Resumable, checkpointed index construction with per-partition lineage
metrics (north rule: "resumable from checkpoint with per-partition lineage +
metrics"; SURVEY.md §2.1 S5, §5.2 T-resume).

Two mechanisms, mirroring what a 10^12-row run needs:

  bucketed batch (index_resumable)
      Work is sharded by url-hash bucket (the same bucket(url) layout the
      docs table is partitioned by at scale, so each unit prunes to its own
      files). Each bucket commits atomically: postings parquet first, then a
      _done marker; a restart skips every marked bucket, so the job is
      idempotent under kill/retry — the DataFrame analogue of the
      reference's single durable db.commit() (/root/reference/src/main.rs:102),
      except commits are per-shard to bound re-work.

  Structured Streaming (stream_index)
      readStream over the pages table + Trigger.availableNow +
      checkpointLocation: Spark's own write-ahead offset log provides
      exactly-once restart. foreachBatch writes postings per micro-batch.
      There is no event-time semantics to preserve (the reference is a batch
      CLI, SURVEY.md §2.6) — streaming here is purely for resumability.

Lineage: one metrics row per processing unit (bucket or micro-batch):
(unit, n_pages, n_ok, n_error, n_postings, wall_sec) appended to
``<out>/_metrics`` — enough to audit which input slice produced which output
files, and to spot skew (a hot host inflates one bucket's wall_sec).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_pages
from ..operators.index import (
    _doc_postings_df,
    bucket_col,
    explode_doc_postings,
    make_doc_postings_udf,
)

DOC_FIELD_ARGS = (
    "author", "date", "filename", "full_path", "title", "subtitle", "tags", "body",
)


def _postings_of(docs: DataFrame) -> DataFrame:
    udf = make_doc_postings_udf(stem=True)
    carrier = _doc_postings_df(
        docs, "url", udf(*[F.col(c) for c in DOC_FIELD_ARGS])
    )
    return explode_doc_postings(carrier)


def _marker(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, "_checkpoints", f"bucket_{bucket:05d}.done")


def completed_buckets(out_dir: str, n_buckets: int) -> set[int]:
    return {b for b in range(n_buckets) if os.path.exists(_marker(out_dir, b))}


def index_resumable(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_buckets: int = 16,
) -> dict:
    """Extract+index ``pages`` into ``out_dir/postings/bucket=N``, skipping
    buckets whose _done marker exists. Returns a summary dict."""
    os.makedirs(os.path.join(out_dir, "_checkpoints"), exist_ok=True)
    done = completed_buckets(out_dir, n_buckets)
    processed, skipped = [], sorted(done)
    with_bucket = pages.withColumn("bucket", bucket_col("url", n_buckets))

    for b in range(n_buckets):
        if b in done:
            continue
        t0 = time.time()
        shard = with_bucket.filter(F.col("bucket") == b).drop("bucket")
        docs = extract_pages(shard)
        ok = docs.filter(F.col("status") == "ok")
        n_pages = docs.count()
        n_ok = ok.count()
        postings = _postings_of(ok)
        path = os.path.join(out_dir, "postings", f"bucket={b}")
        postings.write.mode("overwrite").parquet(path)
        n_postings = spark.read.parquet(path).count()
        wall = time.time() - t0
        metrics_row = {
            "unit": b,
            "n_pages": n_pages,
            "n_ok": n_ok,
            "n_error": n_pages - n_ok,
            "n_postings": n_postings,
            "wall_sec": round(wall, 3),
        }
        spark.createDataFrame(
            [metrics_row],
            "unit int, n_pages long, n_ok long, n_error long, n_postings long, wall_sec double",
        ).write.mode("append").parquet(os.path.join(out_dir, "_metrics"))
        # atomic-enough commit: marker written only after data + metrics land
        with open(_marker(out_dir, b), "w") as f:
            json.dump(metrics_row, f)
        processed.append(b)

    return {
        "processed": processed,
        "skipped": skipped,
        "out": os.path.join(out_dir, "postings"),
    }


def upsert_postings(
    spark: SparkSession,
    out_dir: str,
    new_pages: DataFrame,
    n_buckets: int = 16,
) -> dict:
    """Re-index semantics: the reference's ``replace_document(Q<id>, doc)``
    upsert (/root/reference/src/main.rs:138-140) over the bucketed postings
    layout. Only buckets containing changed urls are rewritten:

      1. bucket the incoming pages by url hash;
      2. for each touched bucket: drop existing postings of the incoming
         urls (anti-join), union the freshly built postings, overwrite that
         bucket's files; untouched buckets are never read or written.

    This is the parquet stand-in for Iceberg ``MERGE INTO idx.postings ON
    t.doc = s.doc`` — same row-level semantics, coarser (bucket-level)
    commit granularity."""
    with_bucket = new_pages.withColumn("bucket", bucket_col("url", n_buckets))
    touched = [
        r["bucket"] for r in with_bucket.select("bucket").distinct().collect()
    ]
    import shutil as _sh

    rewritten = []
    for b in sorted(touched):
        shard_pages = with_bucket.filter(F.col("bucket") == b).drop("bucket")
        docs = extract_pages(shard_pages).filter(F.col("status") == "ok")
        fresh = _postings_of(docs)
        path = os.path.join(out_dir, "postings", f"bucket={b}")
        if os.path.exists(path):
            existing = spark.read.parquet(path)
            new_urls = fresh.select("doc").distinct()
            merged = existing.join(new_urls, "doc", "left_anti").unionByName(fresh)
        else:
            merged = fresh
        # write beside, then swap — the lazy plan still reads the old files
        merged.write.mode("overwrite").parquet(path + ".tmp")
        _sh.rmtree(path, ignore_errors=True)
        os.rename(path + ".tmp", path)
        rewritten.append(b)
    return {"rewritten_buckets": rewritten}


def read_postings(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "postings"))


def read_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "_metrics"))


def stream_index(
    spark: SparkSession,
    pages_path: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
) -> None:
    """Structured Streaming ingest with availableNow + checkpoint: process
    whatever is in the source and stop; a restart resumes from the offset log
    and never reprocesses committed files."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_stream_checkpoint")
    static = spark.read.parquet(pages_path)
    stream = spark.readStream.schema(static.schema).parquet(pages_path)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        docs = extract_pages(batch_df).filter(F.col("status") == "ok")
        postings = _postings_of(docs)
        postings.write.mode("append").parquet(os.path.join(out_dir, "postings"))
        n = batch_df.count()
        batch_df.sparkSession.createDataFrame(
            [{"unit": batch_id, "n_pages": n}], "unit long, n_pages long"
        ).write.mode("append").parquet(os.path.join(out_dir, "_metrics"))

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
