"""Index storage layout and scale-behavior checks: bucket-partitioned write/
read roundtrip, partition pruning on term lookups, salted repartition spread,
and plan shape (pushed filters, broadcast joins)."""

import pytest
from pyspark.sql import functions as F

from tika_xapian_spark.operators import search as S
from tika_xapian_spark.operators.index import (
    InvertedIndex,
    bucket_col,
    salted_repartition,
)

CORPUS = [(i, f"spark join word{i % 7} merge") for i in range(1, 101)]


@pytest.fixture(scope="module")
def written_index(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("idx"))
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    idx = InvertedIndex.build_from_body(docs, key="doc_id", stem=True)
    idx.write(base)
    yield base, idx
    idx.unpersist()


def test_roundtrip(spark, written_index):
    base, idx = written_index
    postings = spark.read.parquet(f"{base}/postings")
    assert postings.count() == idx.postings.count()
    doc_stats = spark.read.parquet(f"{base}/doc_stats")
    assert doc_stats.count() == idx.n_docs


def test_term_lookup_prunes_partitions(spark, written_index):
    base, _ = written_index
    postings = spark.read.parquet(f"{base}/postings")
    # bucket predicate == partition value -> partition pruning at scan
    target = postings.filter(F.col("term") == "Zspark").withColumn(
        "b", bucket_col("term")
    )
    bucket = target.select("b").first()["b"]
    pruned = postings.filter(
        (F.col("term_bucket") == bucket) & (F.col("term") == "Zspark")
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan or "PartitionFilters" in plan
    assert pruned.count() == 100  # every doc contains spark


def test_salted_repartition_spreads_hot_key(spark):
    # one hot host: 90% of rows share the key
    rows = [(f"hot" if i < 900 else f"cold{i}", i) for i in range(1000)]
    df = spark.createDataFrame(rows, "host string, i long").repartition(4)
    out = salted_repartition(df, "host", 16, salt=8)
    sizes = (
        out.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .count()
        .collect()
    )
    biggest = max(r["count"] for r in sizes)
    # unsalted, the hot key would put >=900 rows in one partition
    assert biggest < 500
    assert out.count() == 1000


def test_query_plan_uses_broadcast_and_topk(spark, written_index):
    _, idx = written_index
    df = S.top_k(S.score_terms(idx, ["Zspark", "Zmerg"]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    # no sort-merge join should appear for tiny broadcast sides
    assert "SortMergeJoin" not in plan


def test_fused_carrier_equals_two_stage_pipeline(spark):
    from pyspark.sql import functions as F

    from tika_xapian_spark.operators.extract import extract_pages
    from tika_xapian_spark.operators.index import (
        _doc_postings_df,
        explode_doc_postings,
        explode_fused_carrier,
        extract_index_carrier,
        make_doc_postings_udf,
    )
    from tika_xapian_spark.sources.pages import synth_pages

    pages = synth_pages(spark, 400)
    carrier = extract_index_carrier(pages)
    fused = {
        (r["doc"], r["term"], r["wdf"], tuple(r["positions"] or []))
        for r in explode_fused_carrier(carrier).collect()
    }
    docs = extract_pages(pages)
    ok = docs.filter(F.col("status") == "ok")
    udf = make_doc_postings_udf(stem=True)
    two_stage = explode_doc_postings(
        _doc_postings_df(
            ok,
            "url",
            udf(
                F.col("author"), F.col("date"), F.col("filename"),
                F.col("full_path"), F.col("title"), F.col("subtitle"),
                F.col("tags"), F.col("body"),
            ),
        )
    )
    two = {
        (r["doc"], r["term"], r["wdf"], tuple(r["positions"] or []))
        for r in two_stage.collect()
    }
    assert fused == two
    # the quarantine channel survives fusion
    assert (
        carrier.filter("status <> 'ok'").count()
        == docs.filter("status <> 'ok'").count()
    )
