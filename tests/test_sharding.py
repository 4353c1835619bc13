"""Rendezvous sharding invariants: movement only TO the new shard, bounded
movement fraction, determinism, and the zero-shuffle map-only plan."""

import pytest
from pyspark.sql import functions as F

from tika_xapian_spark.operators.sharding import shard_assignment, shard_of


class TestRendezvous:
    @pytest.fixture(scope="class")
    def assign(self, spark):
        docs = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
        return shard_assignment(docs, "doc_id", n_shards=8).collect()

    def test_every_move_lands_on_the_new_shard(self, assign):
        # THE rendezvous property: growing 8 -> 9 only ever moves a key
        # to shard 8 (its 0..7 draws are unchanged, so a changed argmax
        # means the new draw won)
        for r in assign:
            if r["moved"]:
                assert r["shard_next"] == 8, r
            else:
                assert r["shard"] == r["shard_next"]

    def test_movement_fraction_near_one_ninth(self, assign):
        moved = sum(r["moved"] for r in assign)
        # expectation 1/9 ≈ 222 of 2000; allow generous noise band
        assert 130 <= moved <= 320, moved

    def test_balanced_within_reason(self, assign):
        from collections import Counter

        sizes = Counter(r["shard"] for r in assign)
        assert set(sizes) == set(range(8))
        assert max(sizes.values()) < 2 * min(sizes.values())

    def test_shards_in_range(self, assign):
        assert all(0 <= r["shard"] < 8 for r in assign)
        assert all(0 <= r["shard_next"] < 9 for r in assign)

    def test_deterministic_and_seed_sensitive(self, spark):
        docs = spark.range(0, 100).select(F.col("id").alias("doc_id"))
        a = [r["shard"] for r in docs.select(
            shard_of("doc_id", 8).alias("shard")).collect()]
        b = [r["shard"] for r in docs.select(
            shard_of("doc_id", 8).alias("shard")).collect()]
        c = [r["shard"] for r in docs.select(
            shard_of("doc_id", 8, seed="other").alias("shard")).collect()]
        assert a == b
        assert a != c

    def test_map_only_plan(self, spark):
        docs = spark.range(0, 10).select(F.col("id").alias("doc_id"))
        plan = (
            shard_assignment(docs, "doc_id", n_shards=8)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_n_shards_validated(self, spark):
        with pytest.raises(ValueError):
            shard_of("doc_id", 0)
