"""T-resume: kill/restart mid-index — completed buckets are skipped and the
final postings equal a clean run (SURVEY.md §5.2)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from tika_xapian_spark.sources.pages import synth_pages
from tika_xapian_spark.streaming import resume as R

N = 256
N_BUCKETS = 8


@pytest.fixture()
def outdirs(tmp_path):
    return str(tmp_path / "partial"), str(tmp_path / "clean")


def _postings_set(spark, out_dir):
    df = R.read_postings(spark, out_dir)
    return {
        (r["doc"], r["term"], r["wdf"], tuple(r["positions"] or []))
        for r in df.collect()
    }


def test_resume_skips_completed_and_matches_clean(spark, outdirs):
    partial_dir, clean_dir = outdirs
    pages = synth_pages(spark, N)

    # clean run
    summary_clean = R.index_resumable(spark, pages, clean_dir, N_BUCKETS)
    assert summary_clean["skipped"] == []
    assert sorted(summary_clean["processed"]) == list(range(N_BUCKETS))

    # simulate a crash: run, then delete the markers of the last 5 buckets
    # AND their data (as if they never committed)
    R.index_resumable(spark, pages, partial_dir, N_BUCKETS)
    for b in range(3, N_BUCKETS):
        os.remove(R._marker(partial_dir, b))
        shutil.rmtree(
            os.path.join(partial_dir, "postings", f"bucket={b}"), ignore_errors=True
        )

    # restart: buckets 0-2 skipped, 3-7 reprocessed
    summary = R.index_resumable(spark, pages, partial_dir, N_BUCKETS)
    assert summary["skipped"] == [0, 1, 2]
    assert summary["processed"] == list(range(3, N_BUCKETS))

    assert _postings_set(spark, partial_dir) == _postings_set(spark, clean_dir)


def test_metrics_lineage(spark, tmp_path):
    out = str(tmp_path / "m")
    pages = synth_pages(spark, N)
    R.index_resumable(spark, pages, out, 4)
    m = R.read_metrics(spark, out)
    rows = {r["unit"]: r for r in m.collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert sum(r["n_pages"] for r in rows.values()) == N
    # every 8th synthetic page is the error case
    assert sum(r["n_error"] for r in rows.values()) == N // 8
    assert all(r["n_postings"] > 0 for r in rows.values())


def test_noop_on_fully_complete(spark, tmp_path):
    out = str(tmp_path / "full")
    pages = synth_pages(spark, N)
    R.index_resumable(spark, pages, out, 4)
    summary = R.index_resumable(spark, pages, out, 4)
    assert summary["processed"] == []
    assert summary["skipped"] == [0, 1, 2, 3]


def test_stream_index_resumes_via_checkpoint(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "stream_out")
    synth_pages(spark, 128).write.parquet(src)

    R.stream_index(spark, src, out)
    n1 = R.read_postings(spark, out).count()
    assert n1 > 0

    # second invocation with the same checkpoint: no new files -> no growth
    R.stream_index(spark, src, out)
    assert R.read_postings(spark, out).count() == n1

    # new files arrive -> only they are processed
    synth_pages(spark, 64).withColumn(
        "url", F.concat(F.lit("https://new/"), F.col("url"))
    ).write.mode("append").parquet(src)
    R.stream_index(spark, src, out)
    assert R.read_postings(spark, out).count() > n1


def test_stream_index_replay_is_idempotent(spark, tmp_path):
    # foreachBatch is at-least-once: simulate a crash after the batch write
    # but before the offset commit by deleting the last commit marker — the
    # restart must REPLAY that batch, and the deterministic batch=<id>
    # overwrite must leave the postings byte-identical (no duplicates).
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    synth_pages(spark, 128).write.parquet(src)
    R.stream_index(spark, src, out, checkpoint_dir=ckpt)
    before = _postings_set(spark, out)

    commits = sorted(
        f for f in os.listdir(os.path.join(ckpt, "commits")) if not f.startswith(".")
    )
    os.remove(os.path.join(ckpt, "commits", commits[-1]))  # un-commit last batch
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    R.stream_index(spark, src, out, checkpoint_dir=ckpt)  # replays it
    assert _postings_set(spark, out) == before


def test_resume_runs_two_jobs_per_bucket(spark, tmp_path):
    # Lineage counts ride the single write action as CollectMetrics
    # (df.observe): per bucket exactly 2 jobs run — the postings write and
    # the tiny metrics-row write. The round-1 implementation ran 5 (extract
    # re-executed by docs.count(), ok.count(), and an output re-read).
    pages = synth_pages(spark, N)
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    R.index_resumable(spark, pages, str(tmp_path / "jobs"), n_buckets=4)
    n_jobs = len(tracker.getJobIdsForGroup(None)) - before
    assert n_jobs <= 2 * 4, n_jobs


def _multi_batch_stream(spark, tmp_path, n_chunks=3, n=96):
    """stream_index over several source files -> several batch dirs."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    pages = synth_pages(spark, n).collect()
    chunk = len(pages) // n_chunks
    schema = synth_pages(spark, 1).schema
    for i in range(n_chunks):
        part = pages[i * chunk : (i + 1) * chunk] if i < n_chunks - 1 else pages[i * chunk :]
        spark.createDataFrame(part, schema).coalesce(1).write.mode("append").parquet(src)
        R.stream_index(spark, src, out)
    return src, out


def test_compact_stream_postings_preserves_rows(spark, tmp_path):
    src, out = _multi_batch_stream(spark, tmp_path)
    before = _postings_set(spark, out)
    summary = R.compact_stream_postings(spark, out)
    assert len(summary["folded"]) >= 2
    assert _postings_set(spark, out) == before
    # folded source dirs are gone; the merged target remains
    import os as _os

    dirs = [d for d in _os.listdir(_os.path.join(out, "postings")) if d.startswith("batch=")]
    assert len(dirs) < len(summary["folded"]) + 1 or len(summary["folded"]) == 0


def test_stream_resumes_after_compaction(spark, tmp_path):
    # ingest -> compact -> MORE ingest: layout stays compatible and the
    # postings equal a never-compacted run over the same input
    src, out = _multi_batch_stream(spark, tmp_path)
    R.compact_stream_postings(spark, out)
    extra = synth_pages(spark, 32).withColumn(
        "url", F.concat(F.lit("https://later/"), F.col("url"))
    )
    extra.coalesce(1).write.mode("append").parquet(src)
    R.stream_index(spark, src, out)
    got = _postings_set(spark, out)

    clean_out = str(tmp_path / "clean_out")
    R.stream_index(spark, src, clean_out)
    assert got == _postings_set(spark, clean_out)


def test_compaction_crash_recovery(spark, tmp_path):
    import json
    import os as _os
    import shutil as _sh

    src, out = _multi_batch_stream(spark, tmp_path)
    before = _postings_set(spark, out)
    R.compact_stream_postings(spark, out)
    after = _postings_set(spark, out)
    assert after == before
    # simulate a crash right after the swap: re-create the pending marker
    # with an already-deleted source list — recovery must be idempotent
    staging = _os.path.join(out, "_staging")
    _os.makedirs(staging, exist_ok=True)
    with open(_os.path.join(staging, "compact-pending.json"), "w") as f:
        json.dump(
            {"target": _os.path.join(out, "postings", "batch=0"),
             "delete": [_os.path.join(out, "postings", "batch=999")]},
            f,
        )
    assert _postings_set(spark, out) == before  # read triggers recovery
    assert not _os.path.exists(_os.path.join(staging, "compact-pending.json"))


def test_compact_rerun_recovers_mid_swap_crash(spark, tmp_path):
    """Rerunning compact (the CLI retry path) after a crash BETWEEN the two
    swap renames must first roll back — otherwise the min-id batch's rows
    (parked as _staging/compacted.old with the target dir absent) are lost."""
    import json
    import os as _os

    src, out = _multi_batch_stream(spark, tmp_path)
    before = _postings_set(spark, out)
    committed = sorted(R._committed_batch_ids(_os.path.join(out, "_stream_checkpoint")))
    target = _os.path.join(out, "postings", f"batch={committed[0]}")
    staging = _os.path.join(out, "_staging")
    _os.makedirs(staging, exist_ok=True)
    # simulate: tmp written, marker written, first rename done, crash
    spark.read.parquet(target).write.mode("overwrite").parquet(
        _os.path.join(staging, "compacted.tmp")
    )
    with open(_os.path.join(staging, "compact-pending.json"), "w") as f:
        json.dump(
            {"target": target,
             "delete": [_os.path.join(out, "postings", f"batch={b}")
                        for b in committed[1:]]},
            f,
        )
    _os.rename(target, _os.path.join(staging, "compacted.old"))
    summary = R.compact_stream_postings(spark, out)  # retry path
    assert set(summary["folded"]) == set(committed)
    assert _postings_set(spark, out) == before


def test_compact_rerun_recovers_post_swap_crash(spark, tmp_path):
    """Rerunning compact after a crash AFTER the swap but BEFORE source
    deletion must roll forward first — otherwise the folded batch dirs are
    merged a second time on top of the already-merged target (doubled rows)."""
    import json
    import os as _os
    import shutil as _sh

    src, out = _multi_batch_stream(spark, tmp_path)
    before = _postings_set(spark, out)
    committed = sorted(R._committed_batch_ids(_os.path.join(out, "_stream_checkpoint")))
    target = _os.path.join(out, "postings", f"batch={committed[0]}")
    folded_dirs = [_os.path.join(out, "postings", f"batch={b}") for b in committed[1:]]
    staging = _os.path.join(out, "_staging")
    _os.makedirs(staging, exist_ok=True)
    # simulate the post-swap window: target holds the merged data, old copy
    # parked, pending marker present, sources NOT yet deleted
    merged = spark.read.parquet(target, *folded_dirs)
    merged.write.mode("overwrite").parquet(_os.path.join(staging, "swapin.tmp"))
    _os.rename(target, _os.path.join(staging, "compacted.old"))
    _os.rename(_os.path.join(staging, "swapin.tmp"), target)
    with open(_os.path.join(staging, "compact-pending.json"), "w") as f:
        json.dump({"target": target, "delete": folded_dirs}, f)
    summary = R.compact_stream_postings(spark, out)  # retry path
    assert _postings_set(spark, out) == before
    # roll-forward deleted the folded sources before the new listing
    for d in folded_dirs:
        assert not _os.path.exists(d)
