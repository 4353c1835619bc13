"""Posting-list index construction (SURVEY.md §2.1 S4-S5, §2.2 T4, §2.3).

Replaces the reference's local Xapian database (/root/reference/src/main.rs:114-143)
with columnar posting-list DataFrames/tables:

  postings(doc, term, wdf, positions)   — K11 wdf; positions of unstemmed terms
  doc_stats(doc, doclen)                — doclen = sum of wdf over ALL terms of
                                          the doc (incl. Z-stems), Xapian's
                                          document-length definition
  term_stats(term, df, cf, max_wdf)     — collection frequencies for BM25 R1
                                          and the WAND-style max-score bound

Scale design (100 TB / 10^12 rows):
  - term generation is one Arrow pandas UDF returning array<struct<term,pos>>
    + JVM-side explode — no per-row Python, no driver involvement;
  - the single wide shuffle is groupBy(doc, term); doc-skew (hot hosts) is
    handled by AQE skew splitting plus an optional salt on the doc key;
  - ``term_bucket``/``doc_bucket`` columns (hash-bucketing) are written as
    partition columns so `term = X` probes prune to 1/B of files — the
    DataFrame equivalent of Iceberg's `bucket(B, term)` partition transform
    (no Iceberg runtime is available in this sandbox; the layout is the same).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..functions import tokenizer as tok

# Per-document PRE-AGGREGATED postings: a document's tokens are already
# colocated inside the UDF batch, so (term -> wdf, positions) is computed
# there and the expensive groupBy(doc, term) shuffle + collect_list
# disappears entirely. doclen comes out as a scalar the same way. The only
# shuffle left in index construction is the light term_stats aggregation.
# This is the map-side-combine design that survives 10^12 rows: posting
# construction is embarrassingly parallel per document.
DOC_POSTINGS_SCHEMA = StructType(
    [
        StructField("terms", ArrayType(StringType())),
        StructField("wdfs", ArrayType(IntegerType())),
        StructField("positions", ArrayType(ArrayType(IntegerType()))),
        StructField("doclen", IntegerType()),
    ]
)

N_BUCKETS = 64  # bucket count for term/doc hash partitioning

# Reference field order — /root/reference/src/main.rs:123-133
DOC_FIELD_PREFIXES = [
    ("A", "author"),
    ("D", "date"),
    ("F", "filename"),
    ("F", "full_path"),
    ("S", "title"),
    ("XS", "subtitle"),
    # K per tag, then unprefixed body — handled specially below
]


def assemble_fields(author, date, filename, full_path, title, subtitle, tags, body):
    """The (prefix, text) field list in reference order — K per tag, then
    the unprefixed body, sharing one position counter (K8). Single source of
    truth for the two-stage UDF and the fused carrier: editing field order
    or adding a field here keeps both pipelines in lockstep."""
    fields = [
        ("A", author or ""),
        ("D", date or ""),
        ("F", filename or ""),
        ("F", full_path or ""),
        ("S", title or ""),
        ("XS", subtitle or ""),
    ]
    if tags is not None:  # arrives as list OR numpy array (pandas UDF)
        for one_tag in tags:
            fields.append(("K", one_tag or ""))
    fields.append(("", body or ""))
    return fields


def _doc_postings(fields: list[tuple[str, str]], stem: bool) -> dict:
    """Per-document posting aggregation (K11 wdf + positions), sorted by term
    for deterministic output.

    Fused form of ``tok.index_document`` + aggregation: emits the identical
    term/wdf/position/doclen set without materializing the intermediate
    Token list (this loop dominates the index-build pipeline; equivalence to
    index_document is property-tested in tests/test_properties.py). ASCII
    fast paths replace the per-token utf-8 encode and unicodedata lookups."""
    if not stem:
        toks = _index_document_nostem(fields)
        agg: dict[str, list] = {}
        for t in toks:
            e = agg.get(t.term)
            if e is None:
                agg[t.term] = e = [0, []]
            e[0] += 1
            if t.pos is not None:
                e[1].append(t.pos)
        terms = sorted(agg)
        return {
            "terms": terms,
            "wdfs": [agg[t][0] for t in terms],
            "positions": [agg[t][1] for t in terms],
            "doclen": len(toks),
        }

    agg = {}
    pos = 0
    n_toks = 0
    stem_cached = tok._stem_cached
    should_stem = tok._should_stem
    for prefix, text in fields:
        if not text:
            continue
        # chunk-cached scan: punctuation no longer drops the whole doc to
        # the slow exact scanner, and Zipf-repeated chunks skip it entirely
        for term in tok.scan_terms_chunked(text):
            # K7: >64 *bytes* dropped; len() short-circuits the encode for
            # anything comfortably inside the cap
            if len(term) > 16 and len(term.encode("utf-8")) > tok.MAX_TERM_BYTES:
                continue
            pos += 1
            n_toks += 1
            t = prefix + term
            e = agg.get(t)
            if e is None:
                agg[t] = e = [1, [pos]]
            else:
                e[0] += 1
                e[1].append(pos)
            # K9 should_stem: first codepoint Ll/Lt/Lm/Lo — ASCII fast path
            c0 = term[0]
            if "a" <= c0 <= "z":
                pass  # Ll — stem
            elif c0.isascii() or not should_stem(term):
                continue  # ASCII digit/upper/underscore, or non-Ll/Lt/Lm/Lo
            stemmed = stem_cached(term)
            if not stemmed:
                continue
            n_toks += 1
            zt = "Z" + prefix + stemmed
            e = agg.get(zt)
            if e is None:
                agg[zt] = e = [1, []]
            else:
                e[0] += 1
        # positions share one counter across fields (K8)
    terms = sorted(agg)
    return {
        "terms": terms,
        "wdfs": [agg[t][0] for t in terms],
        "positions": [agg[t][1] for t in terms],
        "doclen": n_toks,
    }


def _index_document_nostem(fields: list[tuple[str, str]]) -> list[tok.Token]:
    """STEM_NONE profile: positional terms only, no Z-stems
    (TermGenerator strategy STEM_NONE — termgenerator_internal.cc:269-282)."""
    out: list[tok.Token] = []
    pos = 0
    for prefix, text in fields:
        if not text:
            continue
        for term in tok.scan_terms(text):
            if len(term.encode("utf-8")) > tok.MAX_TERM_BYTES:
                continue
            pos += 1
            out.append(tok.Token(prefix + term, pos, False))
    return out


def make_body_postings_udf(stem: bool = True):
    """Per-doc aggregated postings over a single body column."""

    @pandas_udf(DOC_POSTINGS_SCHEMA)
    def _udf(body: pd.Series) -> pd.DataFrame:
        return pd.DataFrame([_doc_postings([("", b or "")], stem) for b in body])

    return _udf


def make_doc_postings_udf(stem: bool = True):
    """Per-doc aggregated postings over the full extracted-document fields
    (reference field order, shared positions — K8)."""

    @pandas_udf(DOC_POSTINGS_SCHEMA)
    def _udf(
        author: pd.Series,
        date: pd.Series,
        filename: pd.Series,
        full_path: pd.Series,
        title: pd.Series,
        subtitle: pd.Series,
        tags: pd.Series,
        body: pd.Series,
    ) -> pd.DataFrame:
        out = []
        for a, d, fn, fp, ti, su, tg, bo in zip(
            author, date, filename, full_path, title, subtitle, tags, body
        ):
            fields = assemble_fields(a, d, fn, fp, ti, su, tg, bo)
            out.append(_doc_postings(fields, stem))
        return pd.DataFrame(out)

    return _udf


def _doc_postings_df(docs: DataFrame, key: str, udf_col: Column) -> DataFrame:
    """(doc, p:struct<terms,wdfs,positions,doclen>) carrier frame."""
    return docs.select(F.col(key).alias("doc"), udf_col.alias("p"))


def explode_doc_postings(carrier: DataFrame) -> DataFrame:
    """carrier -> postings(doc, term, wdf, positions, doclen), no shuffle.

    doclen rides every posting row — the same denormalization Xapian's
    postlist entries use (each chert/glass entry stores wdf AND doclen), so
    BM25 scoring is a pure map over the postings scan with NO doc_stats
    join: at 10^12 docs that join would shuffle the full doc-stats side per
    query. Storage cost is one RLE-friendly int per posting."""
    return (
        carrier.select(
            "doc",
            F.col("p.doclen").cast("long").alias("doclen"),
            F.explode(F.arrays_zip("p.terms", "p.wdfs", "p.positions")).alias("e"),
        )
        .select(
            "doc",
            F.col("e.terms").alias("term"),
            F.col("e.wdfs").alias("wdf"),
            F.col("e.positions").alias("positions"),
            "doclen",
        )
    )


def doc_stats_from_carrier(carrier: DataFrame) -> DataFrame:
    """doclen without any shuffle — it was computed inside the UDF."""
    return carrier.select("doc", F.col("p.doclen").cast("long").alias("doclen"))


# Fused extract+tokenize carrier: url, error channel, and the per-doc
# aggregated postings as flat parallel-array columns (no nested struct —
# cheaper Arrow transfer).
FUSED_CARRIER_SCHEMA = StructType(
    [
        StructField("doc", StringType()),
        StructField("status", StringType()),
        StructField("error", StringType()),
        StructField("terms", ArrayType(StringType())),
        StructField("wdfs", ArrayType(IntegerType())),
        StructField("positions", ArrayType(ArrayType(IntegerType()))),
        StructField("doclen", IntegerType()),
    ]
)


def extract_index_carrier(pages: DataFrame, stem: bool = True) -> DataFrame:
    """ONE mapInPandas pass from raw pages to the per-doc postings carrier.

    The two-stage pipeline (extract_pages mapInPandas, then the postings
    pandas UDF) pays a full extra Arrow round trip: every extracted field is
    serialized back to the JVM only to be shipped straight into the next
    Python stage, and the body text crosses the boundary twice for nothing.
    Fusing both stages keeps the html payload and the extracted body inside
    one Python worker; only url + status/error + the aggregated postings
    arrays (what the index actually needs) are serialized out. Extraction
    semantics are exactly parse_page's; postings exactly _doc_postings' —
    equivalence to the two-stage path is pinned in tests.

    Error rows keep the quarantine channel (status/error with null postings)
    so lineage counts ride the same pass via df.observe."""
    cols = [f.name for f in FUSED_CARRIER_SCHEMA.fields]

    def run(batches):
        from .extract import parse_page

        for pdf in batches:
            rows = []
            for u, h in zip(pdf["url"], pdf["html"]):
                d = parse_page(u, h)
                if d["status"] != "ok":
                    rows.append(
                        {
                            "doc": u,
                            "status": d["status"],
                            "error": d["error"],
                            "terms": None,
                            "wdfs": None,
                            "positions": None,
                            "doclen": None,
                        }
                    )
                    continue
                fields = assemble_fields(
                    d["author"], d["date"], d["filename"], d["full_path"],
                    d["title"], d["subtitle"], d["tags"], d["body"],
                )
                p = _doc_postings(fields, stem)
                rows.append(
                    {
                        "doc": u,
                        "status": "ok",
                        "error": None,
                        "terms": p["terms"],
                        "wdfs": p["wdfs"],
                        "positions": p["positions"],
                        "doclen": p["doclen"],
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return pages.mapInPandas(run, FUSED_CARRIER_SCHEMA)


def explode_fused_carrier(carrier: DataFrame) -> DataFrame:
    """fused carrier -> postings(doc, term, wdf, positions, doclen), ok rows
    only, no shuffle. doclen denormalized per posting — see
    explode_doc_postings."""
    return (
        carrier.filter(F.col("status") == "ok")
        .select(
            "doc",
            F.col("doclen").cast("long").alias("doclen"),
            F.explode(F.arrays_zip("terms", "wdfs", "positions")).alias("e"),
        )
        .select(
            "doc",
            F.col("e.terms").alias("term"),
            F.col("e.wdfs").alias("wdf"),
            F.col("e.positions").alias("positions"),
            "doclen",
        )
    )


def bucket_col(col: str | Column, n: int = N_BUCKETS) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(n)).cast("int")


def salted_repartition(
    df: DataFrame, key: str, n_partitions: int, salt: int = 8
) -> DataFrame:
    """Skew-safe repartition: hot key values (e.g. one host dominating a
    Common-Crawl slice — the Zipf hosts of the fixtures) are spread over
    ``salt`` partitions instead of landing on one. The salt column is
    derived deterministically from the row's own key hash + a rotation, so
    no RNG state is involved, and it is dropped after the exchange.

    Use before the extraction/tokenization map stages when the source layout
    clusters by host; AQE's skew-join splitting covers the join side, this
    covers the map side."""
    salted = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col(key), F.spark_partition_id()), F.lit(salt)).cast("int"),
    )
    return salted.repartition(n_partitions, F.col(key), F.col("_salt")).drop("_salt")


def build_doc_stats(postings: DataFrame) -> DataFrame:
    if "doclen" in postings.columns:  # denormalized layout: no re-summing
        return postings.groupBy("doc").agg(
            F.max("doclen").cast("long").alias("doclen")
        )
    return postings.groupBy("doc").agg(F.sum("wdf").cast("long").alias("doclen"))


def build_term_stats(postings: DataFrame) -> DataFrame:
    # postings is unique per (doc, term) so df = count(*)
    return postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("wdf").cast("long").alias("cf"),
        F.max("wdf").cast("int").alias("max_wdf"),
    )


# Xapian's spelling fragment scheme (XC backends/glass/glass_spelling.cc
# toggle_word): Head 'H'+first2, Tail 'T'+last2, Bookends 'B'+first+last for
# words of <= 4 chars (covers middle-pair transposition / middle-char edits
# that change every interior trigram), Middles 'M'+each trigram for words of
# > 2 chars. Words must be >= 2 chars (Xapian asserts word.size() > 1).
_FRAG_EXPR = """
array_distinct(concat(
  array(concat('H', substring(term, 1, 2)),
        concat('T', substring(term, length(term) - 1, 2))),
  CASE WHEN length(term) <= 4
       THEN array(concat('B', substring(term, 1, 1),
                         substring(term, length(term), 1)))
       ELSE cast(array() as array<string>) END,
  CASE WHEN length(term) > 2
       THEN transform(sequence(1, length(term) - 2),
                      i -> concat('M', substring(term, i, 3)))
       ELSE cast(array() as array<string>) END
))
"""


def build_vocab_frag(term_stats: DataFrame) -> DataFrame:
    """Xapian's persistent spelling table analogue (K12/Q19): vocabulary
    terms exploded to spelling fragments (the H/T/B/M scheme of
    xapian-core's spelling B-tree — see _FRAG_EXPR), keyed by fragment for
    blocked candidate lookup. Z-stems are excluded — the spelling dictionary
    holds surface forms. Built once per index (spelling_table()) and written
    by InvertedIndex.write alongside term_stats; rebuilding it per query
    would be a full-vocabulary explode per keystroke."""
    vocab = term_stats.filter(
        ~F.col("term").startswith("Z") & (F.length("term") >= 2)
    )
    return vocab.select(
        "term", "df", F.explode(F.expr(_FRAG_EXPR)).alias("frag")
    )


@dataclass
class InvertedIndex:
    """The index tables + cached collection-level stats."""

    postings: DataFrame
    doc_stats: DataFrame
    term_stats: DataFrame
    n_docs: int
    avg_len: float
    # persistent spelling table (build_vocab_frag): loaded by read() when
    # written, else built+persisted once on first spelling query
    vocab_frag: DataFrame | None = None

    def spelling_table(self) -> DataFrame:
        if self.vocab_frag is None:
            self.vocab_frag = build_vocab_frag(self.term_stats).persist()
        return self.vocab_frag

    @classmethod
    def from_carrier(cls, carrier: DataFrame, persist: bool = True) -> "InvertedIndex":
        """Shuffle-free build from the per-doc aggregated postings carrier:
        postings and doc_stats are pure map-side projections; only term_stats
        aggregates (one light shuffle)."""
        if persist:
            carrier = carrier.persist()
        postings = explode_doc_postings(carrier)
        doc_stats = doc_stats_from_carrier(carrier)
        term_stats = build_term_stats(postings)
        if persist:
            term_stats = term_stats.persist()
        row = doc_stats.agg(
            F.count(F.lit(1)).alias("n"), F.avg("doclen").alias("avg")
        ).collect()[0]
        return cls(
            postings=postings,
            doc_stats=doc_stats,
            term_stats=term_stats,
            n_docs=int(row["n"] or 0),
            avg_len=float(row["avg"] or 0.0),
        )

    @classmethod
    def from_fused_carrier(cls, carrier: DataFrame, persist: bool = True) -> "InvertedIndex":
        """Index from the fused extract+tokenize carrier
        (extract_index_carrier): quarantine rows drop here; postings and
        doc_stats are pure map-side projections. With ``persist`` the
        carrier is cached before the stats action, so the extraction UDF
        executes exactly ONCE even though three tables reference the
        carrier — the same single-execution discipline as
        streaming/resume.py (pinned in test_plan_shapes)."""
        if persist:
            carrier = carrier.persist()
        ok = carrier.filter(F.col("status") == "ok")
        postings = explode_fused_carrier(carrier)
        doc_stats = ok.select("doc", F.col("doclen").cast("long").alias("doclen"))
        term_stats = build_term_stats(postings)
        if persist:
            term_stats = term_stats.persist()
        row = doc_stats.agg(
            F.count(F.lit(1)).alias("n"), F.avg("doclen").alias("avg")
        ).collect()[0]
        return cls(
            postings=postings,
            doc_stats=doc_stats,
            term_stats=term_stats,
            n_docs=int(row["n"] or 0),
            avg_len=float(row["avg"] or 0.0),
        )

    @classmethod
    def build_from_body(
        cls, docs: DataFrame, key: str, body_col: str = "text", stem: bool = True,
        persist: bool = True,
    ) -> "InvertedIndex":
        udf = make_body_postings_udf(stem)
        carrier = _doc_postings_df(docs, key, udf(F.col(body_col)))
        return cls.from_carrier(carrier, persist)

    @classmethod
    def build_from_extracted(
        cls, docs: DataFrame, key: str = "url", stem: bool = True, persist: bool = True
    ) -> "InvertedIndex":
        udf = make_doc_postings_udf(stem)
        carrier = _doc_postings_df(
            docs.filter(F.col("status") == "ok"),
            key,
            udf(
                F.col("author"),
                F.col("date"),
                F.col("filename"),
                F.col("full_path"),
                F.col("title"),
                F.col("subtitle"),
                F.col("tags"),
                F.col("body"),
            ),
        )
        return cls.from_carrier(carrier, persist)

    def unpersist(self) -> None:
        for df in (self.postings, self.doc_stats, self.term_stats, self.vocab_frag):
            if df is None:
                continue
            try:
                df.unpersist()
            except Exception:
                pass

    @classmethod
    def read(cls, spark, base_dir: str, store=None) -> "InvertedIndex":
        """Reopen a written index. Collection stats come from doc_stats (two
        tiny aggregations); the bucket partition columns stay available for
        pruned point lookups."""
        if store is None:
            from ..sources.tables import ParquetDirStore

            store = ParquetDirStore(base_dir)
        postings = store.read_table(spark, "postings").drop("term_bucket")
        doc_stats = store.read_table(spark, "doc_stats").drop("doc_bucket")
        term_stats = store.read_table(spark, "term_stats")
        try:  # older indexes lack the table (or carry the pre-round-4
            # plain-trigram layout under "vocab_tri"): rebuilt lazily instead
            vocab_frag = store.read_table(spark, "vocab_frag")
        except Exception:
            vocab_frag = None
        row = doc_stats.agg(
            F.count(F.lit(1)).alias("n"), F.avg("doclen").alias("avg")
        ).collect()[0]
        return cls(
            postings=postings,
            doc_stats=doc_stats,
            term_stats=term_stats,
            n_docs=int(row["n"] or 0),
            avg_len=float(row["avg"] or 0.0),
            vocab_frag=vocab_frag,
        )

    def write(self, base_dir: str, store=None) -> None:
        """Write bucket-partitioned index tables (Iceberg-shaped layout: the
        partition columns are hash buckets, so term/doc point lookups prune
        to 1/N of files — SURVEY.md §4 predicate-pushdown row).

        ``store`` is the table-format seam (sources/tables.py): default is
        the parquet stand-in rooted at ``base_dir``; pass an IcebergStore on
        a real cluster for snapshot-commit writes of the same tables."""
        if store is None:
            from ..sources.tables import ParquetDirStore

            store = ParquetDirStore(base_dir)
        store.write_table(
            # term-sorted within each bucket file: parquet row-group min/max
            # stats then satisfy the pushed `term IN (...)` probe by skipping
            # every non-matching group — the columnar analogue of Xapian's
            # term-ordered postlist B-tree. Unsorted files leave every row
            # group's term range spanning the whole dictionary, making the
            # pushdown a no-op.
            self.postings.withColumn("term_bucket", bucket_col("term"))
            .repartition("term_bucket")
            .sortWithinPartitions("term", "doc"),
            "postings",
            partition_by=["term_bucket"],
        )
        store.write_table(
            self.doc_stats.withColumn("doc_bucket", bucket_col("doc"))
            .repartition("doc_bucket"),
            "doc_stats",
            partition_by=["doc_bucket"],
        )
        # term-sorted for the same row-group pruning on the dictionary probe
        store.write_table(
            self.term_stats.sort("term"), "term_stats"
        )
        # persistent spelling table: fragment-clustered so the per-query
        # point lookup (frag IN (...)) prunes row groups, the parquet
        # analogue of xapian's fragment-keyed spelling B-tree
        store.write_table(
            build_vocab_frag(self.term_stats)
            .repartition(F.col("frag"))
            .sortWithinPartitions("frag", "term"),
            "vocab_frag",
        )
