"""Link-graph goldens: integer PageRank hand-checked on a tiny graph
(including the dangling-mass rule) and the anchor-profile tie rule."""

import pytest
from pyspark.sql import functions as F

from tika_xapian_spark.operators import linkgraph as LG


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, w long")


class TestPagerank:
    def test_one_round_hand_computed(self, spark):
        # A -> B, A -> C, B -> A, C -> A; N=3, init=333333, base=50000
        e = _edges(spark, [("A", "B", 1), ("A", "C", 1),
                           ("B", "A", 1), ("C", "A", 1)])
        got = {r["host"]: r["rank_micro"]
               for r in LG.pagerank(e, n_iter=1).collect()}
        # into A: 333333//1 + 333333//1 = 666666 -> 50000 + 85*666666//100
        assert got["A"] == 50000 + (85 * 666666) // 100   # 616666
        # into B (and C): 333333//2 = 166666 -> 50000 + 85*166666//100
        assert got["B"] == got["C"] == 50000 + (85 * 166666) // 100

    def test_dangling_node_keeps_base_only(self, spark):
        # D has no out-links: its mass is dropped (simplified variant),
        # but D itself still appears and everyone keeps >= base.
        e = _edges(spark, [("A", "D", 1), ("D2", "A", 1), ("A", "D2", 1)])
        got = {r["host"]: r["rank_micro"]
               for r in LG.pagerank(e, n_iter=3).collect()}
        assert set(got) == {"A", "D", "D2"}
        base = (15 * 1_000_000) // (100 * 3)
        assert all(v >= base for v in got.values())
        # total mass leaks through D but never exceeds the budget
        assert sum(got.values()) <= 1_000_000

    def test_duplicate_edges_fold_into_weight(self, spark):
        # A->B listed twice == A->B with w=2 (and A->C w=1): weighted split
        e2 = _edges(spark, [("A", "B", 1), ("A", "B", 1), ("A", "C", 1),
                            ("B", "A", 1), ("C", "A", 1)])
        ew = _edges(spark, [("A", "B", 2), ("A", "C", 1),
                            ("B", "A", 1), ("C", "A", 1)])
        r2 = sorted(map(tuple, LG.pagerank(e2, n_iter=2).collect()))
        rw = sorted(map(tuple, LG.pagerank(ew, n_iter=2).collect()))
        assert r2 == rw
        got = dict(r2)
        assert got["B"] > got["C"]  # 2/3 of A's mass vs 1/3

    def test_n_iter_validated(self, spark):
        e = _edges(spark, [("A", "B", 1)])
        with pytest.raises(ValueError):
            LG.pagerank(e, n_iter=0)

    def test_flat_lineage_no_reexecution_blowup(self, spark):
        # 8 rounds on a 64-node ring must stay cheap: each round is
        # checkpointed, so the final plan does not nest 8 joins deep.
        rows = [(f"h{i}", f"h{(i + 1) % 64}", 1) for i in range(64)]
        out = LG.pagerank(_edges(spark, rows), n_iter=8).collect()
        assert len(out) == 64
        # ring is symmetric: every node converges to the same rank
        assert len({r["rank_micro"] for r in out}) == 1


class TestAnchorProfile:
    def test_counts_and_tie_rule(self, spark):
        rows = [
            (1, "u1", "alpha"), (2, "u1", "alpha"), (3, "u1", "beta"),
            (4, "u1", "beta"),  # tie alpha=2 beta=2 -> greatest anchor wins
            (5, "u2", "solo"),
        ]
        links = spark.createDataFrame(rows, "src long, dst_url string, anchor string")
        out = {r["dst_url"]: r for r in LG.anchor_profile(links).collect()}
        u1 = out["u1"]
        assert (u1["n_links"], u1["n_anchors"]) == (4, 2)
        assert (u1["top_anchor"], u1["top_anchor_links"]) == ("beta", 2)
        assert (out["u2"]["n_links"], out["u2"]["top_anchor"]) == (1, "solo")

    def test_no_window_in_plan(self, spark):
        links = spark.createDataFrame(
            [(1, "u", "a")], "src long, dst_url string, anchor string"
        )
        plan = (
            LG.anchor_profile(links)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in plan
        assert "partial_max" in plan


class TestTextrankKeywords:
    def test_high_degree_word_ranks_first(self, spark, tmp_path):
        """A word adjacent to every other word accumulates rank from all
        of them: 'hub' must outrank the leaf words, and the leaf words
        (symmetric by construction) must tie exactly — integer PageRank
        is bit-deterministic, so a tie is a hard equality."""
        import shutil

        from tika_xapian_spark.plans.data_queries import (
            q_text_textrank_keywords,
        )

        docs = spark.createDataFrame(
            [(1, "aa hub bb hub cc hub dd hub aa")],
            "doc_id long, text string",
        )
        sf = str(tmp_path)
        docs.write.parquet(f"{sf}/documents.parquet")
        out = q_text_textrank_keywords(spark, sf).collect()
        assert out[0].word == "hub"
        leaf = {r.word: r.rank_micro for r in out if r.word != "hub"}
        assert set(leaf) == {"aa", "bb", "cc", "dd"}
        assert len(set(leaf.values())) <= 2  # aa appears twice as endpoint
        assert leaf["bb"] == leaf["cc"] == leaf["dd"]
        shutil.rmtree(f"{sf}/documents.parquet")
