"""Bloom prefilter (operators/bloom.py): the composed op must equal the
exact operator bit-for-bit (the verify join removes false positives), the
prefilter must never drop a true member, and the plan must stay map-side
(broadcast word joins, no corpus shuffle before the survival filter)."""

import pytest
from pyspark.sql import functions as F

from tika_xapian_spark.operators import bloom as B
from tika_xapian_spark.operators import dedup as D


@pytest.fixture(scope="module")
def corpus(spark):
    # 120 docs over a mixed vocab: some share probe shingles, most don't
    rows = [
        (i, f"w{i % 17} alpha beta w{(i * 5) % 23} gamma delta w{i % 7}")
        for i in range(120)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestEquivalence:
    def test_composed_equals_exact(self, spark, corpus):
        corpus_sh = D.shingles_df(corpus, key="doc_id")
        probe_sh = D.shingles_df(
            corpus.filter(F.col("doc_id") < 4), key="doc_id"
        )
        exact = {
            (r.doc, r.n_probe_hits, r.first_hit)
            for r in D.contamination_hits(corpus_sh, probe_sh).collect()
        }
        bloomed = {
            (r.doc, r.n_probe_hits, r.first_hit)
            for r in B.contamination_hits_bloom(corpus_sh, probe_sh).collect()
        }
        assert bloomed == exact and len(exact) > 0

    def test_tiny_bitmap_forces_false_positives_still_exact(self, spark, corpus):
        # m = 64 bits for dozens of probe keys: nearly every word saturates,
        # the prefilter passes almost everything — the verify join must
        # still reduce it to the exact answer
        corpus_sh = D.shingles_df(corpus, key="doc_id")
        probe_sh = D.shingles_df(
            corpus.filter(F.col("doc_id") < 4), key="doc_id"
        )
        exact = sorted(
            map(tuple, D.contamination_hits(corpus_sh, probe_sh).collect())
        )
        got = sorted(
            map(
                tuple,
                B.contamination_hits_bloom(
                    corpus_sh, probe_sh, m_bits=64
                ).collect(),
            )
        )
        assert got == exact


class TestPrefilter:
    def test_never_drops_a_true_member(self, spark):
        keys = spark.createDataFrame(
            [(f"k{i}",) for i in range(200)], "shingle string"
        )
        bloom = B.bloom_words(keys, "shingle", m_bits=4096)
        # every build key must survive its own filter (no false negatives)
        surv = B.bloom_prefilter(keys, "shingle", bloom, m_bits=4096)
        assert surv.count() == 200

    def test_small_bitmap_filters_most_non_members(self, spark):
        probe = spark.createDataFrame(
            [(f"p{i}",) for i in range(50)], "shingle string"
        )
        others = spark.createDataFrame(
            [(f"q{i}",) for i in range(2000)], "shingle string"
        )
        m = B.next_pow2(B.BITS_PER_KEY * 50)
        bloom = B.bloom_words(probe, "shingle", m_bits=m)
        fp = B.bloom_prefilter(others, "shingle", bloom, m_bits=m).count()
        # fpp ≈ 0.5% at 16 bits/key, k=3 — allow 10x headroom
        assert fp <= 100, fp

    def test_rejects_non_power_of_two(self, spark):
        df = spark.createDataFrame([("a",)], "shingle string")
        with pytest.raises(ValueError):
            B.bloom_words(df, "shingle", m_bits=1000)


class TestPlanShape:
    def test_word_joins_broadcast_no_corpus_shuffle(self, spark, corpus):
        corpus_sh = D.shingles_df(corpus, key="doc_id")
        probe_sh = D.shingles_df(
            corpus.filter(F.col("doc_id") < 4), key="doc_id"
        )
        out = B.contamination_hits_bloom(corpus_sh, probe_sh)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the k word joins broadcast by construction (explicit hint) —
        # that's the map-side prefilter contract
        assert plan.count("BroadcastHashJoin") >= len(B.DEFAULT_SEEDS), plan
        # the verify join is deliberately hint-free: it may plan as a
        # shuffle join (that IS the scale path for huge probe sets) and
        # AQE converts it to broadcast when the probe side is tiny
        assert plan.count("SortMergeJoin") <= 1, plan
        assert "Python" not in plan, plan
        out.collect()
        final = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in final.split("== Initial Plan ==")[0], final


class TestBloomFlag:
    """Keep-side form: bloom_flag must never flag a true member false
    (no false negatives), and a saturated bitmap plus exact anti-join
    must still equal the plain anti-join."""

    def test_members_always_flagged(self, spark):
        members = spark.createDataFrame(
            [(f"k{i}",) for i in range(50)], "key string"
        )
        m = B.next_pow2(B.BITS_PER_KEY * 50)
        bloom = B.bloom_words(members, "key", m)
        flagged = B.bloom_flag(members, "key", bloom, m)
        assert flagged.filter(~F.col("might_contain")).count() == 0

    def test_miss_is_definite(self, spark):
        """A row flagged False is guaranteed absent from the probe set —
        the property that makes the fast-keep branch sound."""
        members = spark.createDataFrame(
            [(f"k{i}",) for i in range(40)], "key string"
        )
        others = spark.createDataFrame(
            [(f"x{i}",) for i in range(200)], "key string"
        )
        m = B.next_pow2(B.BITS_PER_KEY * 40)
        bloom = B.bloom_words(members, "key", m)
        fast_dropped = (
            B.bloom_flag(others, "key", bloom, m)
            .filter(~F.col("might_contain"))
        )
        # none of the definite-miss rows may actually be a member
        assert fast_dropped.join(members, "key").count() == 0
        # and the bitmap is sized so most non-members miss fast
        assert fast_dropped.count() > 150

    def test_blocklist_filter_equals_plain_anti_join(self, spark):
        from tika_xapian_spark.operators.weburl import host_blocklist_filter, host_of

        pages = spark.createDataFrame(
            [(i, f"https://h{i % 31}.example.com/p{i}") for i in range(300)],
            "doc_id long, url string",
        )
        block = spark.createDataFrame(
            [(f"h{i}.example.com",) for i in range(0, 31, 3)], "host string"
        )
        got = sorted(
            r.doc_id for r in host_blocklist_filter(pages, block).collect()
        )
        want = sorted(
            r.doc_id
            for r in pages.withColumn("host", host_of("url"))
            .join(block, "host", "left_anti")
            .collect()
        )
        assert got == want and 0 < len(want) < 300

    def test_flag_stage_is_map_side(self, spark):
        """The per-seed word joins must all be broadcast LEFT joins — the
        corpus never shuffles to be tested."""
        corpus = spark.createDataFrame(
            [(f"k{i}",) for i in range(100)], "key string"
        )
        probe = spark.createDataFrame(
            [(f"k{i}",) for i in range(10)], "key string"
        )
        m = B.next_pow2(B.BITS_PER_KEY * 10)
        bloom = B.bloom_words(probe, "key", m)
        plan = (
            B.bloom_flag(corpus, "key", bloom, m)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("BroadcastHashJoin") == len(B.DEFAULT_SEEDS), plan
        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
