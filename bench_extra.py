#!/usr/bin/env python
"""Round-7 optimization harness (NOT the driver's frozen bench.py).

Per-query wall timing + formatted-plan capture for any subset of the
registry, at any SF dir, mirroring bench.py's methodology (warm pass, then
min-of-N timed .collect() runs) so numbers are comparable with the frozen
bench's per-query section.  Also supports the guide §1.4 noop-sink isolation
mode (--noop) to time computation without driver-side result collection.

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 --queries a,b,c \
      [--noop] [--trials 2] [--plans plans/r07 --suffix before]

Prints one JSON line: {"sf": ..., "queries": {name: sec}, "walls": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

BENCH_DEFAULT = [
    # the frozen bench.py run_queries list (keep in sync manually)
    "search_or", "search_and", "search_phrase", "search_near", "search_adj",
    "search_wildcard", "collapse_best_per_source", "dedup_minhash_pairs",
    "dedup_substring_spans", "text_simhash", "gopher_repetition",
    "text_unigram_logppl", "url_dedup", "ann_cosine_topk",
    "ann_multiprobe_topk", "spelling_suggest", "text_quality",
    "tfidf_top_terms", "text_bigram_logppl", "text_char_entropy",
    "pack_sequences", "bpe_merges", "bpe_encode", "web_pagerank",
    "cap_per_host", "text_bigram_novelty", "embedding_kmeans_step",
    "quality_classifier_score", "dsir_importance", "embedding_semdedup",
    "cms_heavy_hitters", "search_hybrid_rrf", "bitext_margin_pairs",
    "dedup_containment_pairs", "text_zipf_fit", "tpch_pricing_summary",
    "tpch_revenue_forecast", "tpch_waiting_suppliers", "events_sessionized",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--plans", default="", help="dir for explain captures")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import bench as B
    from tika_xapian_spark.plans import doc_queries as dq
    from tika_xapian_spark.plans.data_queries import DATA_QUERIES
    from tika_xapian_spark.plans.rel_queries import REL_QUERIES

    names = ([q for q in args.queries.split(",") if q]
             if args.queries else BENCH_DEFAULT)
    registry = {**dq.QUERIES, **DATA_QUERIES, **REL_QUERIES}

    spark = B.build_session(args.cpus)
    dq.get_index(spark, args.sf)  # amortized, like bench.py
    out: dict[str, float] = {}
    walls: dict[str, list[float]] = {}
    try:
        for name in names:
            fn = registry[name]
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            df = fn(spark, args.sf)
            if args.plans:
                os.makedirs(args.plans, exist_ok=True)
                with open(os.path.join(args.plans,
                                       f"{name}_{args.suffix}.txt"), "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))

            def run() -> None:
                d = fn(spark, args.sf)
                if args.noop:
                    d.write.format("noop").mode("overwrite").save()
                else:
                    d.collect()

            run()  # warm (plan compile, broadcast build)
            trials = []
            for _ in range(args.trials):
                t0 = time.time()
                run()
                trials.append(round(time.time() - t0, 3))
            walls[name] = trials
            out[name] = min(trials)
            print(f"[bench_extra] {name}: {out[name]} {trials}",
                  file=sys.stderr)
            spark.sparkContext.setJobDescription(None)
    finally:
        spark.stop()
    print(json.dumps({"sf": args.sf, "noop": args.noop,
                      "queries": out, "walls": walls}))


if __name__ == "__main__":
    main()
