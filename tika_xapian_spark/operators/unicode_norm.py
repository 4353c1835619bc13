"""Unicode NFC normalization profile — extraction-hygiene pass for web
text.

Crawled HTML mixes composed and decomposed codepoint sequences for the
same visible text (editors emit NFC, some CMSes and mac filesystems emit
NFD, entity decoding yields singletons like U+2126 OHM SIGN): every
downstream exact-hash operation — exact dedup, url grouping, substring
spans, token counts — silently splits on the encoding difference unless
the corpus is normalized first. This pass maps text to NFC and reports
what changed.

Spark has no JVM-side Unicode-normalization builtin, so this is an honest
Arrow-batched Python pass (`mapInPandas`, one evaluation per row — the
whole profile is computed inside ONE batch function, never as separate
UDF columns Catalyst could re-inline per reference). Zero shuffle,
map-only: at 10^12 rows it pipelines with the extraction scan. The DuckDB
oracle runs utf8proc's `nfc_normalize` against Python's `unicodedata` —
two independent implementations of the same Unicode standard, so a
normalization bug in either cannot cancel.
"""

from __future__ import annotations

import unicodedata
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

PROFILE_SCHEMA = (
    "doc_id long, changed int, chars_before long, chars_after long, "
    "norm_text string"
)


def _nfc_batch(ids: pd.Series, texts: pd.Series) -> pd.DataFrame:
    """Pure batch body (factored out for pandas-level tests)."""
    raw = texts.fillna("")
    norm = raw.map(lambda s: unicodedata.normalize("NFC", s))
    return pd.DataFrame(
        {
            "doc_id": ids,
            "changed": (norm != raw).astype("int32"),
            "chars_before": raw.str.len().astype("int64"),
            "chars_after": norm.str.len().astype("int64"),
            "norm_text": norm,
        }
    )


def nfc_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document NFC normalization: (doc_id, changed, chars_before,
    chars_after, norm_text). One mapInPandas pass; NULL text normalizes
    to the empty string (matches the extractor's quarantine contract)."""
    src = df.select(df[id_col].alias("doc_id"), df[text_col].alias("text"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _nfc_batch(pdf["doc_id"], pdf["text"])

    return src.mapInPandas(run, PROFILE_SCHEMA)
