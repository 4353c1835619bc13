"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: extract+index+search end-to-end at sf0.001.
``queries()`` / ``oracle_sql()`` — operator registry vs DuckDB oracles
(see tika_xapian_spark/plans/doc_queries.py and plans/oracles.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the stemmed posting index over sf0.001 documents and
    run a ranked free-text search (the reference TUI's core operation as a
    batch DataFrame job)."""
    from tika_xapian_spark.plans.doc_queries import q_search_or

    return q_search_or(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tika_xapian_spark.plans.data_queries import DATA_QUERIES
    from tika_xapian_spark.plans.doc_queries import QUERIES
    from tika_xapian_spark.plans.rel_queries import REL_QUERIES

    return {**QUERIES, **DATA_QUERIES, **REL_QUERIES}


def oracle_sql() -> dict[str, str]:
    from tika_xapian_spark.plans.data_queries import data_oracle_sqls
    from tika_xapian_spark.plans.doc_queries import oracle_sqls
    from tika_xapian_spark.plans.rel_queries import rel_oracle_sqls

    return {**oracle_sqls(), **data_oracle_sqls(), **rel_oracle_sqls()}
