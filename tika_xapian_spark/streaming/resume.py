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
      checkpointLocation: Spark's offset log makes restarts at-least-once,
      and each micro-batch writes to a deterministic batch=<id> directory
      with overwrite, so replays are idempotent — effective exactly-once.
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
    explode_fused_carrier,
    extract_index_carrier,
    make_doc_postings_udf,
)

DOC_FIELD_ARGS = (
    "author", "date", "filename", "full_path", "title", "subtitle", "tags", "body",
)


def _postings_of(docs: DataFrame) -> DataFrame:
    """Postings from an already-extracted docs frame (upsert/stream paths
    that need the extracted fields elsewhere use this; the pure indexing
    path uses the fused extract_index_carrier instead)."""
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

    from pyspark.sql import Observation

    for b in range(n_buckets):
        if b in done:
            continue
        t0 = time.time()
        shard = with_bucket.filter(F.col("bucket") == b).drop("bucket")
        # All lineage counts ride the single write action as CollectMetrics
        # nodes (df.observe) — extraction (the dominant cost) runs exactly
        # once per bucket, where counting docs/ok/postings with separate
        # .count() actions would re-run the extract UDF 3x. The fused
        # extract+tokenize carrier keeps html/body inside one Python worker.
        doc_obs = Observation(f"docs_b{b}")
        post_obs = Observation(f"postings_b{b}")
        carrier = extract_index_carrier(shard).observe(
            doc_obs,
            F.count(F.lit(1)).alias("n_pages"),
            F.sum((F.col("status") == "ok").cast("long")).alias("n_ok"),
        )
        postings = explode_fused_carrier(carrier).observe(
            post_obs, F.count(F.lit(1)).alias("n_postings")
        )
        path = os.path.join(out_dir, "postings", f"bucket={b}")
        postings.write.mode("overwrite").parquet(path)
        n_pages = doc_obs.get["n_pages"]
        n_ok = doc_obs.get["n_ok"] or 0
        n_postings = post_obs.get["n_postings"]
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
    store=None,
) -> dict:
    """Re-index semantics: the reference's ``replace_document(Q<id>, doc)``
    upsert (/root/reference/src/main.rs:138-140) over the bucketed postings
    layout.

    With an IcebergStore (sources/tables.py) this is a MERGE of the fresh
    postings followed by a DELETE of the docs' stale terms — two snapshot
    commits, ordered to fail safe: a crash between them leaves a doc with a
    superset of its terms (still findable, replace completes on retry),
    never a vanished doc. On the parquet stand-in, only buckets containing
    changed urls are rewritten:

      1. bucket the incoming pages by url hash;
      2. for each touched bucket: drop existing postings of the incoming
         urls (anti-join), union the freshly built postings, overwrite that
         bucket's files; untouched buckets are never read or written.

    Same row-level semantics as ``MERGE INTO idx.postings ON t.doc = s.doc``,
    coarser (bucket-level) commit granularity."""
    from ..sources.tables import IcebergStore

    if isinstance(store, IcebergStore):
        # persist: the fused extract (the dominant cost) is referenced by
        # both statements and would re-execute per reference otherwise
        fresh = explode_fused_carrier(extract_index_carrier(new_pages)).persist()
        try:
            fresh.createOrReplaceTempView("_upsert_src")
            # 1) upsert all fresh rows (doc stays findable throughout);
            # 2) drop stale (doc, term) rows the doc no longer contains.
            # A crash between the commits leaves a superset, never a gap.
            store.upsert(fresh, "postings", key_cols=["doc", "term"])
            spark.sql(
                f"DELETE FROM {store.qualified('postings')} t WHERE t.doc IN "
                "(SELECT doc FROM _upsert_src) AND NOT EXISTS ("
                "SELECT 1 FROM _upsert_src s WHERE s.doc = t.doc AND s.term = t.term)"
            )
        finally:
            fresh.unpersist()
        return {"rewritten_buckets": "iceberg-merge"}
    with_bucket = new_pages.withColumn("bucket", bucket_col("url", n_buckets))
    touched = [
        r["bucket"] for r in with_bucket.select("bucket").distinct().collect()
    ]
    import shutil as _sh

    rewritten = []
    for b in sorted(touched):
        path = os.path.join(out_dir, "postings", f"bucket={b}")
        _recover_bucket(path)
        shard_pages = with_bucket.filter(F.col("bucket") == b).drop("bucket")
        fresh = explode_fused_carrier(extract_index_carrier(shard_pages))
        if os.path.exists(path):
            existing = spark.read.parquet(path)
            new_urls = fresh.select("doc").distinct()
            merged = existing.join(new_urls, "doc", "left_anti").unionByName(fresh)
        else:
            merged = fresh
        # Write into _staging (an underscore-prefixed sibling Spark's file
        # index ignores, so crash leftovers are never read as live partition
        # directories), then swap with the old data renamed aside first: a
        # crash at any point leaves a recoverable state and never a
        # double-counted bucket. _recover_bucket rolls forward/back.
        tmp, old = _staging_paths(out_dir, b)
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        _sh.rmtree(old, ignore_errors=True)
        rewritten.append(b)
    return {"rewritten_buckets": rewritten}


def _staging_paths(out_dir: str, bucket: int) -> tuple[str, str]:
    staging = os.path.join(out_dir, "_staging")
    os.makedirs(staging, exist_ok=True)
    return (
        os.path.join(staging, f"bucket-{bucket}.tmp"),
        os.path.join(staging, f"bucket-{bucket}.old"),
    )


def _recover_bucket(path: str) -> None:
    """Roll a bucket forward/back after a crash mid-swap in upsert_postings.

    Invariants of the swap protocol: ``.tmp`` is never complete until its
    rename (so it is always safe to discard); ``.old`` is the previous good
    data and is only deleted after the new data is in place. Both live under
    ``_staging`` where no reader ever sees them.
    """
    import shutil as _sh

    out_dir = os.path.dirname(os.path.dirname(path))
    b = int(path.rsplit("=", 1)[-1])
    tmp, old = _staging_paths(out_dir, b)
    if os.path.exists(tmp):
        _sh.rmtree(tmp, ignore_errors=True)  # incomplete write
    if os.path.exists(old):
        if os.path.exists(path):
            _sh.rmtree(old, ignore_errors=True)  # swap completed
        else:
            os.rename(old, path)  # crashed between the two renames


def recover_postings(out_dir: str) -> None:
    """Roll every bucket swap and any interrupted compaction forward/back —
    cheap directory scan, run by read_postings so readers never observe a
    mid-operation state."""
    staging = os.path.join(out_dir, "_staging")
    if not os.path.isdir(staging):
        return
    for name in os.listdir(staging):
        if name.startswith("bucket-"):
            b = int(name.split("-", 1)[1].split(".")[0])
            _recover_bucket(os.path.join(out_dir, "postings", f"bucket={b}"))
    if any(n.startswith("compact") for n in os.listdir(staging)):
        _finish_compaction(out_dir)


def read_postings(spark: SparkSession, out_dir: str) -> DataFrame:
    recover_postings(out_dir)  # never serve a mid-swap bucket state
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

    from pyspark.sql import Observation

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once: a crash after the write but before
        # the offset commit replays this batch_id on restart. Writing each
        # batch to its own deterministic batch=<id> directory with overwrite
        # makes the replay idempotent (effective exactly-once), the same
        # trick Iceberg uses via commit-dedup on batch_id.
        obs = Observation(f"batch_{batch_id}")
        carrier = extract_index_carrier(batch_df).observe(
            obs, F.count(F.lit(1)).alias("n_pages")
        )
        postings = explode_fused_carrier(carrier)
        postings.write.mode("overwrite").parquet(
            os.path.join(out_dir, "postings", f"batch={batch_id}")
        )
        batch_df.sparkSession.createDataFrame(
            [{"unit": batch_id, "n_pages": obs.get["n_pages"]}],
            "unit long, n_pages long",
        ).write.mode("overwrite").parquet(
            os.path.join(out_dir, "_metrics", f"batch={batch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _committed_batch_ids(checkpoint_dir: str) -> set[int]:
    commits = os.path.join(checkpoint_dir, "commits")
    if not os.path.isdir(commits):
        return set()
    return {
        int(f) for f in os.listdir(commits) if not f.startswith(".") and f.isdigit()
    }


def compact_stream_postings(
    spark: SparkSession,
    out_dir: str,
    n_buckets: int | None = None,  # kept for CLI compat; partitioning unused
    checkpoint_dir: str | None = None,
) -> dict:
    """Merge COMMITTED ``batch=<id>`` directories into one — the small-files
    compaction that follows streaming ingest at scale (thousands of tiny
    batch files otherwise dominate scan planning).

    Safe to interleave with further stream_index runs:
      - only batches recorded in the checkpoint's offset-commit log are
        folded; an uncommitted (possibly replayed) batch keeps its own
        directory, so the replay-overwrite idempotence is preserved;
      - the merged data lands back in the SAME batch=<min folded id>
        partition scheme, so subsequent batch writes stay layout-compatible;
      - crash recovery: the merged directory is swapped in before any
        source directory is deleted, with a pending-deletes marker in
        ``_staging`` that recover_postings() (run by every read) rolls
        forward — a crash can leave extra work, never lost or doubled rows.

    Rows inside the merged directory are clustered by term for row-group
    pruning. Concurrent compactions are not supported (same contract as any
    table-maintenance job)."""
    import json as _json

    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_stream_checkpoint")
    src = os.path.join(out_dir, "postings")
    # Roll a previously crashed compaction forward/back BEFORE listing batch
    # dirs: rerunning the compact CLI is a natural retry path that never goes
    # through read_postings. Without this, a crash between the two swap
    # renames loses the min-id batch (its dir is parked as compacted.old),
    # and a crash after the swap but before source deletion double-counts
    # the folded dirs in the new merge.
    _finish_compaction(out_dir)
    committed = _committed_batch_ids(checkpoint_dir)
    batch_dirs = {
        int(d.split("=", 1)[1]): os.path.join(src, d)
        for d in os.listdir(src)
        if d.startswith("batch=")
    }
    fold = sorted(b for b in batch_dirs if b in committed)
    if len(fold) < 2:
        return {"out": src, "folded": [], "n_files": _count_parquet(src)}
    target_id = fold[0]
    target = batch_dirs[target_id]
    staging = os.path.join(out_dir, "_staging")
    os.makedirs(staging, exist_ok=True)
    tmp = os.path.join(staging, "compacted.tmp")
    old = os.path.join(staging, "compacted.old")
    pending = os.path.join(staging, "compact-pending.json")
    merged = spark.read.parquet(*[batch_dirs[b] for b in fold])
    (
        merged.repartition(F.col("term"))
        .sortWithinPartitions("term", "doc")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    # marker first: after the swap below, these directories' rows live in
    # the target and must be deleted; recover_postings rolls this forward
    with open(pending, "w") as f:
        _json.dump({"target": target, "delete": [batch_dirs[b] for b in fold[1:]]}, f)
    os.rename(target, old)
    os.rename(tmp, target)
    _finish_compaction(out_dir)
    return {
        "out": src,
        "folded": fold,
        "target": f"batch={target_id}",
        "n_files": _count_parquet(src),
    }


def _count_parquet(path: str) -> int:
    return sum(
        1 for _, _, files in os.walk(path) for f in files if f.endswith(".parquet")
    )


def _finish_compaction(out_dir: str) -> None:
    """Roll a (possibly crashed) compaction forward or back. Invariants:
    the pending marker exists for the whole danger window; ``compacted.old``
    is the pre-swap target (its rows are a subset of the merged data, so
    discarding it post-swap loses nothing); pre-swap crashes (tmp still in
    _staging) just discard the tmp."""
    import json as _json
    import shutil as _sh

    staging = os.path.join(out_dir, "_staging")
    tmp = os.path.join(staging, "compacted.tmp")
    old = os.path.join(staging, "compacted.old")
    pending = os.path.join(staging, "compact-pending.json")
    if not os.path.exists(pending):
        _sh.rmtree(tmp, ignore_errors=True)
        _sh.rmtree(old, ignore_errors=True)
        return
    with open(pending) as f:
        plan = _json.load(f)
    if os.path.exists(tmp):
        # crashed before (or during) the swap: target still original if old
        # absent -> abort cleanly; old present means mid-swap -> roll back
        if os.path.exists(old) and not os.path.exists(plan["target"]):
            os.rename(old, plan["target"])
        _sh.rmtree(tmp, ignore_errors=True)
        os.remove(pending)
        _sh.rmtree(old, ignore_errors=True)
        return
    # swap completed: roll forward — delete folded sources and the old copy
    for d in plan["delete"]:
        _sh.rmtree(d, ignore_errors=True)
    _sh.rmtree(old, ignore_errors=True)
    os.remove(pending)
