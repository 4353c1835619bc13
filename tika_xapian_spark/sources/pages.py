"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md §1).

Schema matches the north-rule input hint (BASELINE.json):
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``.

Generation is distributed (``spark.range`` + ``mapInPandas`` — no driver-side
row loop) and purely a function of the row id, so any subset of rows is
reproducible on any executor with no shared RNG state. Hosts follow a
Zipf(1.2) distribution over 64 hosts to exercise skew handling.

Payload cases (cycled by ``i % 8``; tagged in the url path so expected outputs
are derivable — FIXTURES.md §1):
  0 fm-basic        reference's documented example (src/tika_document.rs:9-18)
  1 fm-tags-scalar  ``tags: tika`` scalar -> 1-element list
  2 fm-no-filename  filename backfilled from url basename
  3 fm-date-colon   RFC3339 dates (Z / +05:30 offset)
  4 fm-subtitle     subtitle present (indexed under XS)
  5 fm-body-edges   CRLF / interior --- / empty / multibyte / emoji bodies
  6 no-frontmatter  parse error -> error channel
  7 html-page       nav/footer boilerplate + one main-content article
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

N_HOSTS = 64
ZIPF_S = 1.2
_BASE_TS = datetime(2021, 6, 22, 12, 48, 16, tzinfo=timezone.utc)

CASE_TAGS = [
    "fm-basic",
    "fm-tags-scalar",
    "fm-no-filename",
    "fm-date-colon",
    "fm-subtitle",
    "fm-body-edges",
    "no-frontmatter",
    "html-page",
]

_EDGE_BODIES = [
    b"\n\nleading blank lines body\n",
    b"trailing newlines body\n\n\n",
    b"crlf line one\r\nline two\r\n",
    b"before\n---\nafter the inner delimiter\n",
    b"",
    b"utf8 \xc3\xbcn\xc3\xafc\xc3\xb8d\xc3\xa9 \xe4\xb8\xad\xe6\x96\x87\n",
    b"emoji \xf0\x9f\x8e\x89\xf0\x9f\x9a\x80 done\n",
]

# Zipf(1.2) CDF over 64 hosts, precomputed once.
_ZIPF_W = (1.0 / np.arange(1, N_HOSTS + 1) ** ZIPF_S)
_ZIPF_CDF = np.cumsum(_ZIPF_W) / _ZIPF_W.sum()

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

EXPECTED_SCHEMA = StructType(
    PAGES_SCHEMA.fields
    + [
        StructField("exp_status", StringType()),
        StructField("exp_body_bytes", BinaryType()),
        StructField("exp_author", StringType()),
        StructField("exp_title", StringType()),
        StructField("exp_subtitle", StringType()),
        StructField("exp_date", StringType()),
        StructField("exp_tags", ArrayType(StringType())),
        StructField("exp_filename", StringType()),
    ]
)


def _host(i: int) -> int:
    # deterministic pseudo-uniform from the row id (Knuth multiplicative hash)
    u = ((i * 2654435761) & 0xFFFFFFFF) / 2**32
    return int(np.searchsorted(_ZIPF_CDF, u)) + 1


def _fm(body: bytes, *lines: str) -> bytes:
    head = "\n".join(["---", *lines, "---"]).encode("utf-8")
    return head + b"\n" + body


def gen_row(i: int) -> dict:
    case = i % 8
    tag = CASE_TAGS[case]
    h = _host(i)
    ext = "html" if case == 7 else "md"
    url = f"https://host{h:02d}.example/{tag}/note{i}.{ext}"
    ts = datetime.fromtimestamp(_BASE_TS.timestamp() + i, tz=timezone.utc)

    author = f"Author {i % 17}"
    title = f"Example note {i}"
    exp: dict = {
        "exp_status": "ok",
        "exp_author": author,
        "exp_title": title,
        "exp_subtitle": "",
        "exp_date": "2021-06-22T16:48:16+00:00",
        "exp_tags": ["tika", f"t{i % 5}"],
        "exp_filename": f"note{i}.md",
    }

    if case == 0:
        body = f"Some note here formatted with Markdown syntax {i}\n".encode()
        payload = _fm(
            b"\n" + body,
            f"author: {author}",
            "date: 2021-06-22T12:48:16-0400",
            "tags:",
            "- tika",
            f"- t{i % 5}",
            f"title: {title}",
        )
        exp["exp_body_bytes"] = b"\n" + body
    elif case == 1:
        body = f"scalar tag body {i}\n".encode()
        payload = _fm(
            body,
            f"author: {author}",
            "date: 2021-06-22T12:48:16-0400",
            "tags: tika",
            f"title: {title}",
        )
        exp["exp_body_bytes"] = body
        exp["exp_tags"] = ["tika"]
    elif case == 2:
        body = f"no filename body {i}\n".encode()
        payload = _fm(
            body,
            f"author: {author}",
            "date: 2021-06-22T12:48:16-0400",
            "tags:",
            "- tika",
            f"- t{i % 5}",
            f"title: {title}",
        )
        exp["exp_body_bytes"] = body
        # backfilled from url basename (src/tika_document.rs:117-119)
        exp["exp_filename"] = f"note{i}.md"
    elif case == 3:
        body = f"rfc3339 date body {i}\n".encode()
        date = "2021-06-22T16:48:16Z" if i % 2 else "2021-06-22T22:18:16+05:30"
        payload = _fm(
            body,
            f"author: {author}",
            f"date: {date}",
            "tags:",
            "- tika",
            f"- t{i % 5}",
            f"title: {title}",
        )
        exp["exp_body_bytes"] = body
    elif case == 4:
        body = f"subtitle body {i}\n".encode()
        payload = _fm(
            body,
            f"author: {author}",
            "date: 2021-06-22T12:48:16-0400",
            "tags:",
            "- tika",
            f"- t{i % 5}",
            f"title: {title}",
            f"subtitle: Subtitle {i}",
        )
        exp["exp_body_bytes"] = body
        exp["exp_subtitle"] = f"Subtitle {i}"
    elif case == 5:
        body = _EDGE_BODIES[(i // 8) % len(_EDGE_BODIES)]
        payload = _fm(
            body,
            f"author: {author}",
            "date: 2021-06-22T12:48:16-0400",
            "tags:",
            "- tika",
            f"- t{i % 5}",
            f"title: {title}",
        )
        exp["exp_body_bytes"] = body
    elif case == 6:
        payload = f"Plain text without frontmatter {i}\n".encode()
        exp = {
            "exp_status": "error",
            "exp_author": None,
            "exp_title": None,
            "exp_subtitle": None,
            "exp_date": None,
            "exp_tags": None,
            "exp_filename": None,
            "exp_body_bytes": None,
        }
    else:  # case 7: html
        heading = f"Example Article {i}"
        para = (
            f"This is the main article body of page {i}. It has enough of the "
            "most common words that the classifier can see it is real prose "
            "and not a menu of links, because it was written for a reader."
        )
        payload = (
            "<!DOCTYPE html><html><head><title>Page {i}</title></head><body>"
            "<nav><a href='/'>Home</a> <a href='/about'>About</a> "
            "<a href='/contact'>Contact</a></nav>"
            "<div class='content'><h1>{heading}</h1>"
            "<p>{para}</p></div>"
            "<footer><a href='/terms'>Terms</a> <a href='/privacy'>Privacy"
            "</a></footer></body></html>"
        ).format(i=i, heading=heading, para=para).encode("utf-8")
        exp = {
            "exp_status": "ok",
            "exp_author": "",
            "exp_title": f"Page {i}",
            "exp_subtitle": "",
            "exp_date": None,
            "exp_tags": [],
            "exp_filename": f"note{i}.html",
            "exp_body_bytes": f"{heading}\n{para}".encode("utf-8"),
        }

    return {
        "url": url,
        "warc_ts": ts,
        "html": payload,
        "text": payload.decode("utf-8", errors="replace"),
        "lang": "en",
        **exp,
    }


def synth_pages(
    spark: SparkSession,
    n: int,
    with_expected: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic pages table of ``n`` rows."""
    schema = EXPECTED_SCHEMA if with_expected else PAGES_SCHEMA
    cols = [f.name for f in schema.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [gen_row(int(i)) for i in pdf["id"]]
            out = pd.DataFrame(rows)
            yield out[cols]

    if partitions is None:
        # enough splits to keep every core busy through the downstream
        # extract/tokenize UDF stages (~4k rows per task)
        partitions = max(spark.sparkContext.defaultParallelism, n // 4000, 1)
    rng = spark.range(0, n, numPartitions=partitions)
    return rng.mapInPandas(gen, schema=schema)
