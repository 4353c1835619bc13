"""Stream-stream interval join (streaming/joins.py): the two-stream
watermarked range join must equal the batch range join, and the staged
micro-batching must actually exercise cross-batch join state."""

import os

import pytest
from pyspark.sql import functions as F

from tika_xapian_spark.streaming.joins import (
    interval_join_pairs,
    run_stream_interval_join,
)

SF = "/root/testdata/sf0.001"


class TestStreamIntervalJoin:
    @pytest.fixture(scope="class")
    def result(self, spark, tmp_path_factory):
        work = str(tmp_path_factory.mktemp("sij"))
        df = run_stream_interval_join(spark, f"{SF}/events.parquet", work)
        return work, df.collect()

    def test_equals_batch_range_join(self, spark, result):
        _, got = result
        want = interval_join_pairs(
            spark.read.parquet(f"{SF}/events.parquet")
        ).collect()
        key = lambda r: (r.purchase_id, r.click_id)
        assert sorted(map(key, got)) == sorted(map(key, want))
        assert len(got) == len(want)
        by_key = {key(r): r.gap_us for r in want}
        assert all(by_key[key(r)] == r.gap_us for r in got)

    def test_pairs_cross_micro_batches(self, spark, tmp_path):
        """A pair whose click and purchase are in DIFFERENT chunk files
        must still be emitted — the click has to survive in the join
        state buffer across the micro-batch boundary. The split is staged
        deterministically: cut exactly between a known in-window pair's
        click and purchase (the sf corpus's pairs are minutes apart, so
        quantile chunking almost never straddles one)."""
        from tika_xapian_spark.streaming.joins import (
            run_stream_interval_join_on_dir,
        )

        ev = spark.read.parquet(f"{SF}/events.parquet")
        target = min(
            interval_join_pairs(ev).collect(), key=lambda r: r.purchase_ts
        )
        cut = target.click_ts  # click in file 1 (<= cut), purchase in file 2
        inp = str(tmp_path / "input")
        os.makedirs(inp)
        ev.filter(F.col("ts") <= cut).coalesce(1).write.parquet(
            os.path.join(inp, "part1")
        )
        ev.filter(F.col("ts") > cut).coalesce(1).write.parquet(
            os.path.join(inp, "part2")
        )
        # flatten: FileStreamSource reads files, order by mtime == staging order
        for i, d in enumerate(("part1", "part2")):
            src = next(
                f
                for f in os.listdir(os.path.join(inp, d))
                if f.endswith(".parquet")
            )
            os.rename(
                os.path.join(inp, d, src), os.path.join(inp, f"chunk-{i}.parquet")
            )
        got = run_stream_interval_join_on_dir(
            spark, inp, str(tmp_path / "work")
        ).collect()
        want = interval_join_pairs(ev).collect()
        key = lambda r: (r.purchase_id, r.click_id)
        assert sorted(map(key, got)) == sorted(map(key, want))
        assert (target.purchase_id, target.click_id) in set(map(key, got))

    def test_interval_bound_discriminates(self, spark, result):
        """The 1-hour bound must exclude some same-user ordered pairs, or
        the range condition would be untested on this corpus."""
        _, got = result
        ev = spark.read.parquet(f"{SF}/events.parquet")
        c = ev.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("u"), F.col("ts").alias("cts")
        )
        p = ev.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("u"), F.col("ts").alias("pts")
        )
        all_ordered = c.join(p, "u").filter(F.col("pts") >= F.col("cts")).count()
        assert len(got) < all_ordered
