#!/usr/bin/env python
"""Optimization measurement harness (guide §1; r15, reused for r16).

For each named query (default: the heaviest bench rows), in bench-shaped
sessions: warm-up + median-of-3 timed passes with BOTH the bench action
(count()) and the noop sink (guide §1.4 — computes every column, no
column-pruning shortcut), plus `.explain("formatted")` captured to
plans/r15/<query>_<tag>.txt. Job descriptions are set per query
(guide §1.5).

Usage:
  python scripts/opt_measure.py [--tag before|after] [--sf DIR] [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "q_crawl_curation",
    "q_graph_pagerank_dangling",
    "q_graph_hits",
    "q_graph_ppr",
    "q_doc_allpairs_join",
    "q_unigram_pieces",
    "q_graph_pagerank",
    "q_doc_minhash_join",
    "q_media_exif_stats",
    "q_simhash_near_dups",
    "q_media_avi_stats",
    "q_doc_contained",
    "q_embedding_ivf_topk",
    "q_doc_bloom_prefilter",
    "q_graph_pagerank_weighted",
    "q_semantic_dedup",
    "q_ts_theil_sen",
    "q_doc_cluster_split",
    "q_unigram_tokenize",
    "q_media_flac_stats",
]

RECYCLE_EVERY = 8


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--round", default="r16", dest="round_dir")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-noop", action="store_true")
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    names = args.queries or DEFAULT_QUERIES

    from incremental_github_data_pipeline_spark.queries import load_all
    from incremental_github_data_pipeline_spark.session import get_spark

    registry = load_all()
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.round_dir,
    )
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    spark = None
    for i, name in enumerate(names):
        if i % RECYCLE_EVERY == 0:
            if spark is not None:
                spark.stop()
            spark = get_spark(app_name=f"opt-measure-g{i // RECYCLE_EVERY}")
            spark.sparkContext.setLogLevel("ERROR")
        fn = registry[name].fn
        rec: dict = {}
        spark.sparkContext.setJobDescription(f"{name}: warmup")
        t0 = time.time()
        fn(spark, args.sf).count()
        rec["warmup_count"] = round(time.time() - t0, 3)
        passes = []
        for p in range(3):
            spark.sparkContext.setJobDescription(f"{name}: count pass {p}")
            t0 = time.time()
            fn(spark, args.sf).count()
            passes.append(time.time() - t0)
        rec["count_med"] = round(statistics.median(passes), 3)
        if not args.no_noop:
            passes = []
            for p in range(3):
                spark.sparkContext.setJobDescription(
                    f"{name}: noop pass {p}")
                t0 = time.time()
                (fn(spark, args.sf)
                 .write.format("noop").mode("overwrite").save())
                passes.append(time.time() - t0)
            rec["noop_med"] = round(statistics.median(passes), 3)
        spark.sparkContext.setJobDescription(None)
        if not args.no_plans:
            plan = fn(spark, args.sf)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
            with open(
                os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(plan)
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
        path = os.path.join(plans_dir, f"measure_{args.tag}.json")
        existing = {}
        if os.path.exists(path):
            with open(path) as fh:
                existing = json.load(fh)
        existing.update(out)
        with open(path, "w") as fh:
            json.dump(existing, fh, indent=1, sort_keys=True)
    if spark is not None:
        spark.stop()
    print(f"done tag={args.tag}")


if __name__ == "__main__":
    main()
