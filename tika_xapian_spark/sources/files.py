"""File-mode source (SURVEY.md §2.1 S1): the reference globs local Markdown
files (/root/reference/src/util.rs:5-35, config key ``source-glob``). The
table-mode path (pages parquet) is the scale path; this adapter gives
file-for-file parity using Spark's binaryFile source — each matched file
becomes one pages-shaped row (url = file path, html = raw bytes), so the
whole extract->index pipeline runs unchanged on a directory of .md files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_file_glob(
    spark: SparkSession,
    glob_path: str,
    lang: str = "en",
) -> DataFrame:
    """Glob files into the pages schema (url, warc_ts, html, text, lang).

    ``glob_path`` supports ``~`` expansion and glob patterns via the
    binaryFile reader's pathGlobFilter-style paths, matching the reference's
    shellexpand + glob behavior (src/util.rs:29-31)."""
    expanded = os.path.expanduser(glob_path)
    df = spark.read.format("binaryFile").load(expanded)
    return df.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.col("content").cast("string").alias("text"),
        F.lit(lang).alias("lang"),
    )
