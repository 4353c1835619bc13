"""Bucketed-table co-located joins: the claim "pre-bucket both sides of a
recurring join and the shuffle disappears" proven on the physical plan.

At 100 TB the doc-keyed joins this engine runs repeatedly (postings x
candidates, features x labels, embeddings x metadata) each pay a full
shuffle per query unless both sides are written bucketed on the join key.
Spark only exploits bucket layout through the catalog (``bucketBy`` +
``saveAsTable`` — plain parquet paths carry no bucket metadata), which is
how the Iceberg ``bucket(N, col)`` partition transform behaves on a real
deployment; the parquet-dir stand-ins elsewhere in this repo write the
bucket id as a partition COLUMN instead, which prunes scans but cannot
remove join shuffles. This suite pins both halves of the story:

  - bucketed x bucketed on the bucket key -> ZERO Exchange in the join;
  - the same data unbucketed -> both sides shuffle.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97).alias("feature"),
    )
    labels = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("label"),
    )
    spark.sql("DROP TABLE IF EXISTS bj_docs")
    spark.sql("DROP TABLE IF EXISTS bj_labels")
    (
        docs.write.mode("overwrite")
        .bucketBy(8, "doc_id")
        .sortBy("doc_id")
        .saveAsTable("bj_docs")
    )
    (
        labels.write.mode("overwrite")
        .bucketBy(8, "doc_id")
        .sortBy("doc_id")
        .saveAsTable("bj_labels")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS bj_docs")
    spark.sql("DROP TABLE IF EXISTS bj_labels")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    a = spark.table("bj_docs")
    b = spark.table("bj_labels")
    joined = a.join(b, "doc_id").groupBy("label").agg(
        F.sum("feature").alias("s")
    )
    # disable broadcast so the join strategy itself is under test
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            a.join(b, "doc_id")._jdf.queryExecution().executedPlan().toString()
        )
        # both sides read bucketed: the sort-merge join needs NO shuffle
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # and results are right
        got = {r["label"]: r["s"] for r in joined.collect()}
        want = {}
        for i in range(2000):
            want[i % 7] = want.get(i % 7, 0) + (i % 97)
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_same_join_shuffles_both_sides(spark, tmp_path):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("feature")
    )
    labels = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("label")
    )
    docs.write.parquet(str(tmp_path / "d"))
    labels.write.parquet(str(tmp_path / "l"))
    a = spark.read.parquet(str(tmp_path / "d"))
    b = spark.read.parquet(str(tmp_path / "l"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            a.join(b, "doc_id")._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") >= 2  # the cost bucketing removes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
