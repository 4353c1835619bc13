"""Write-time ANN index tables: the written bucket/cell columns must agree
with the in-plan recomputation (same results), and the probe must be a
partition-PRUNED scan — the property that makes ANN viable at 10^9 vectors
(scanning (1+n_probe)/2^n_planes of the files, not all of them)."""

import numpy as np
import pytest

from tika_xapian_spark.operators import similarity as SIM
from tika_xapian_spark.operators.ann_index import AnnIndex


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((8, 64)) * 4.0  # 64d: covers LSH_DIMS range
    rows = [
        (i, [float(x) for x in centers[i % 8] + rng.standard_normal(64) * 0.3])
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), rows


@pytest.fixture(scope="module")
def built(corpus, tmp_path_factory):
    df, rows = corpus
    base = str(tmp_path_factory.mktemp("ann") / "idx")
    idx = AnnIndex.build(df, base)
    return idx, df, rows


class TestParityWithInPlan:
    """Reading the written table must give byte-identical results to the
    in-plan forms that recompute the bucket per row."""

    def test_multiprobe(self, built):
        idx, df, rows = built
        q = rows[1][1]
        want = [(r["vec_id"], r["cos_micro"])
                for r in SIM.multiprobe_cosine_topk(df, q, 15).collect()]
        got = [(r["vec_id"], r["cos_micro"])
               for r in idx.multiprobe_topk(q, 15).collect()]
        assert got == want

    def test_ivf(self, built):
        idx, df, rows = built
        q = rows[2][1]
        want = [(r["vec_id"], r["cos_micro"])
                for r in SIM.ivf_cosine_topk(df, q, 15).collect()]
        got = [(r["vec_id"], r["cos_micro"]) for r in idx.ivf_topk(q, 15).collect()]
        assert got == want

    def test_lsh(self, built):
        idx, df, rows = built
        q = rows[3][1]
        want = [(r["vec_id"], r["cos_micro"])
                for r in SIM.lsh_cosine_topk(df, q, 15).collect()]
        got = [(r["vec_id"], r["cos_micro"]) for r in idx.lsh_topk(q, 15).collect()]
        assert got == want

    def test_read_roundtrip(self, built, spark):
        idx, df, rows = built
        reopened = AnnIndex.read(spark, idx.base_dir)
        assert reopened.planes == idx.planes
        assert reopened.centroids == idx.centroids
        q = rows[4][1]
        assert [r["vec_id"] for r in reopened.multiprobe_topk(q, 10).collect()] == [
            r["vec_id"] for r in idx.multiprobe_topk(q, 10).collect()
        ]


class TestPrunedPlans:
    def test_multiprobe_is_partition_pruned(self, built):
        idx, df, rows = built
        plan = plan_of(idx.multiprobe_topk(rows[0][1], 10))
        # the hbucket IN-list is a PartitionFilter (pruned at planning),
        # not a post-scan Filter
        pf = plan.split("PartitionFilters:")[1].split("]")[0]
        assert "hbucket" in pf
        assert "ArrowEvalPython" not in plan  # no Python anywhere

    def test_ivf_is_partition_pruned(self, built):
        idx, df, rows = built
        plan = plan_of(idx.ivf_topk(rows[0][1], 10))
        pf = plan.split("PartitionFilters:")[1].split("]")[0]
        assert "cell" in pf

    def test_lsh_filter_is_pushed(self, built):
        idx, df, rows = built
        plan = plan_of(idx.lsh_topk(rows[0][1], 10))
        assert "PushedFilters:" in plan
        pushed = plan.split("PushedFilters:")[1].split("]")[0]
        assert "sbucket" in pushed

    def test_probe_fraction_really_prunes(self, built):
        idx, df, rows = built
        frac = idx.probe_fraction(rows[0][1])
        assert 0.0 < frac < 0.6  # scans a minority of leaf partitions


class TestUpsert:
    """Incremental maintenance: build, upsert (replace + add), probe stays
    partition-pruned and returns the post-upsert truth without a corpus
    rewrite."""

    @pytest.fixture()
    def upserted(self, corpus, tmp_path_factory, spark):
        df, rows = corpus
        base = str(tmp_path_factory.mktemp("ann_up") / "idx")
        idx = AnnIndex.build(df, base)
        # replace vec 0 with a very different vector (lands in another
        # cell/hbucket than its original) and add two brand-new ids
        rng = np.random.default_rng(77)
        new_rows = [
            (0, [float(x) for x in rng.standard_normal(64) * 5.0]),
            (1000, [float(x) for x in rng.standard_normal(64)]),
            (1001, [float(x) for x in rng.standard_normal(64)]),
        ]
        new_df = spark.createDataFrame(
            new_rows, "vec_id long, embedding array<float>"
        )
        idx.upsert(new_df)
        return idx, df, rows, dict(new_rows)

    def test_replace_and_add_by_id(self, upserted):
        idx, df, rows, new = upserted
        live = {
            r["vec_id"]: r[idx.vec_col] for r in idx.vectors().collect()
        }
        assert len(live) == 300 + 2  # replaced id not duplicated
        # replaced id serves the NEW vector
        assert live[0] == pytest.approx(new[0])
        assert 1000 in live and 1001 in live

    def test_results_match_full_recompute(self, upserted, spark):
        idx, df, rows, new = upserted
        merged = {r[0]: r[1] for r in rows}
        merged.update(new)
        truth_df = spark.createDataFrame(
            sorted(merged.items()), "vec_id long, embedding array<float>"
        )
        q = rows[5][1]
        want = [
            (r["vec_id"], r["cos_micro"])
            for r in SIM.ivf_cosine_topk(truth_df, q, 15).collect()
        ]
        got = [
            (r["vec_id"], r["cos_micro"])
            for r in idx.ivf_topk(q, 15).collect()
        ]
        assert got == want

    def test_probe_still_partition_pruned(self, upserted):
        idx, df, rows, new = upserted
        plan = plan_of(idx.multiprobe_topk(rows[0][1], 10))
        pf = plan.split("PartitionFilters:")[1].split("]")[0]
        assert "hbucket" in pf
        # the tombstone side is a broadcast, never a shuffle join
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_reopen_sees_upsert(self, upserted, spark):
        idx, df, rows, new = upserted
        reopened = AnnIndex.read(spark, idx.base_dir)
        assert reopened.gen == 1
        live = {
            r["vec_id"]: r[idx.vec_col]
            for r in reopened.vectors().collect()
        }
        assert live[0] == pytest.approx(new[0])
        assert len(live) == 302

    def test_compact_folds_tombstones(self, upserted, spark):
        import os

        idx, df, rows, new = upserted
        before = {
            r["vec_id"]: r[idx.vec_col] for r in idx.vectors().collect()
        }
        vec_dir = os.path.join(idx.base_dir, "vectors")
        files_before = {
            d: sorted(os.listdir(os.path.join(vec_dir, d, h)))
            for d in os.listdir(vec_dir)
            if d.startswith("cell=")
            for h in os.listdir(os.path.join(vec_dir, d))
            if h.startswith("hbucket=")
        }
        idx.compact()
        # tombstones gone; live set identical
        assert not os.path.isdir(os.path.join(idx.base_dir, "deletes"))
        after = {
            r["vec_id"]: r[idx.vec_col] for r in idx.vectors().collect()
        }
        assert after.keys() == before.keys()
        assert after[0] == pytest.approx(new[0])
        # base now serves the truth with NO merge side (fresh read, no
        # deletes dir -> plain scan)
        raw = {
            r["vec_id"]
            for r in spark.read.parquet(vec_dir).collect()
        }
        assert raw == set(before.keys())  # shadowed copy physically gone
        # idempotent no-op afterwards
        idx.compact()
        assert {
            r["vec_id"] for r in idx.vectors().collect()
        } == set(before.keys())

    def test_second_upsert_shadows_first(self, upserted, spark):
        idx, df, rows, new = upserted
        final_vec = [1.0] + [0.0] * 63
        idx.upsert(
            spark.createDataFrame(
                [(1000, final_vec)], "vec_id long, embedding array<float>"
            )
        )
        live = {
            r["vec_id"]: r[idx.vec_col] for r in idx.vectors().collect()
        }
        assert len(live) == 302
        assert live[1000] == pytest.approx(final_vec)


def test_compact_drops_fully_shadowed_leaf(corpus, tmp_path_factory, spark):
    """When EVERY row of a cell=/hbucket= leaf is tombstone-shadowed (all
    its ids were upserted with vectors that land elsewhere), the dynamic
    partition overwrite writes zero survivor rows for that leaf and so never
    touches its files. compact() must physically remove the leaf — otherwise
    dropping the tombstones resurrects the stale vectors."""
    import os

    df, rows = corpus
    base = str(tmp_path_factory.mktemp("ann_shadow") / "idx")
    idx = AnnIndex.build(df, base)
    vec_dir = os.path.join(base, "vectors")

    # map every leaf to its resident ids (partition columns come back on a
    # plain read of the partitioned layout)
    raw = spark.read.parquet(vec_dir).select("vec_id", "cell", "hbucket").collect()
    by_leaf = {}
    for r in raw:
        by_leaf.setdefault((r["cell"], r["hbucket"]), []).append(r["vec_id"])
    victim_leaf, victim_ids = min(by_leaf.items(), key=lambda kv: (len(kv[1]), kv[0]))
    # donor vector from a DIFFERENT leaf: re-stamping an identical vector
    # reproduces the donor's cell/hbucket, so every replacement row lands
    # outside the victim leaf and the victim ends up fully shadowed
    donor_leaf = next(k for k in by_leaf if k != victim_leaf)
    donor_vec = dict(rows)[by_leaf[donor_leaf][0]]
    idx.upsert(
        spark.createDataFrame(
            [(i, donor_vec) for i in victim_ids],
            "vec_id long, embedding array<float>",
        )
    )
    live_before = {r["vec_id"]: r["embedding"] for r in idx.vectors().collect()}
    assert len(live_before) == 300  # replaced in place, no new ids

    idx.compact()

    assert not os.path.isdir(os.path.join(base, "deletes"))
    # the victim leaf's files are gone from disk
    victim_dir = os.path.join(
        vec_dir, f"cell={victim_leaf[0]}", f"hbucket={victim_leaf[1]}"
    )
    assert not os.path.isdir(victim_dir)
    # raw scan serves each id exactly once (no resurrected stale copies) and
    # the moved ids carry the donor vector
    raw_after = spark.read.parquet(vec_dir).collect()
    ids_after = [r["vec_id"] for r in raw_after]
    assert sorted(ids_after) == sorted(live_before.keys())
    vec_after = {r["vec_id"]: r["embedding"] for r in raw_after}
    for i in victim_ids:
        assert vec_after[i] == pytest.approx(donor_vec)
    # reopen parity
    reopened = AnnIndex.read(spark, base)
    assert {
        r["vec_id"] for r in reopened.vectors().collect()
    } == set(live_before.keys())


def test_empty_corpus_build_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty corpus"):
        AnnIndex.build(df, "/tmp/ann_empty_never_written")
