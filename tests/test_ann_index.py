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


def test_empty_corpus_build_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty corpus"):
        AnnIndex.build(df, "/tmp/ann_empty_never_written")
