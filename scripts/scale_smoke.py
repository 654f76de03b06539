#!/usr/bin/env python
"""Scale smoke: replicate the sf0.1 fact tables Nx (default 10x ≈ 6M
lineitem rows, ~sf1) into /tmp and run the headline queries — evidence
that the plans hold as data grows, not just at test scale.

Replicas offset the order keys (join semantics preserved: every
replica's lineitems join their replica's orders); dimensions stay
as-is, so dim joins must remain broadcast while fact-fact joins grow.
Documents replicate with offset doc_ids (near-dup structure repeats).

Usage: python scripts/scale_smoke.py [N_REPLICAS]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from incremental_github_data_pipeline_spark.queries import load_all  # noqa: E402
from incremental_github_data_pipeline_spark.session import get_spark  # noqa: E402
from incremental_github_data_pipeline_spark.sources.readers import read_table  # noqa: E402

SRC = "/root/testdata/sf0.1"
KEY_STRIDE = 10**9

QUERIES = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q06_forecast_revenue",
    "q10_returned_items",
    "q18_large_orders",
    "q_dedup_keep_last",
    "q_sessionize",
    "q_minhash_near_dups",
    "q_embedding_topk_arrow",
    "q_doc_repetition",
    "q_doc_top_terms",
    "q_doc_decontaminate",
    "q_doc_incremental_dedup",
    "q_dedup_clusters",
    "q_doc_remove_spans",
    "q_doc_curation_funnel",
    # round-4 operators
    "q_doc_paragraph_dedup",
    "q_doc_tfidf_top",
    "q_doc_minhash_join",
    "q_doc_bloom_prefilter",
    # time-series family: replicas multiply events WITHIN the same
    # 30-day span, so the resample grid stays fixed-size (the design
    # claim: grid cost is span-, not row-, sensitive) while the
    # pre-aggregate / moments scans grow Nx
    "q_ts_resample_ffill",
    "q_ts_time_weighted",
    "q_ts_zscore_outliers",
    # PQ ANN after the Arrow-encode change
    "q_embedding_pq_topk",
    # round-5 operators: regex URL scan, posting-list build,
    # boilerplate detection, sequential-per-key EWMA fold, Gram matrix
    "q_url_domain_stats",
    "q_doc_inverted_index",
    "q_doc_boilerplate_lines",
    "q_ts_ewma",
    "q_embedding_gram",
    # BPE: rounds run on the VOCABULARY (replicas multiply word freqs,
    # not word types), so per-round cost should stay ~flat with N
    "q_bpe_merges",
    # late round-5 additions: hash-ring sampling (corpus never
    # shuffles), heavy-key diagnostic (map-combined counts)
    "q_doc_negatives",
    "q_skew_report",
    # NOT in the default sweep: q_doc_allpairs_join. Replication makes
    # every document a 10-way identical clique, so the EXACT join's
    # true-pair output explodes quadratically (2,878 pairs at 1x ->
    # 20.7M at 10x, measured 323s = ~64k verified pairs/s) — an
    # output-size effect, not an algorithmic one; see SCALE.md for the
    # analysis and why production funnels run exact_dedup first.
]


def replicate(spark, name: str, n: int, out_dir: Path, key_cols: list[str],
              partition_cols: int = 64) -> None:
    target = out_dir / f"{name}.parquet"
    if target.exists():
        return
    df = read_table(spark, SRC, name)
    rep = df.withColumn(
        "_rep", F.explode(F.array(*[F.lit(i) for i in range(n)]))
    )
    for kc in key_cols:
        rep = rep.withColumn(kc, F.col(kc) + F.col("_rep").cast("long") * KEY_STRIDE)
    rep.drop("_rep").repartition(partition_cols).write.mode("overwrite").parquet(
        str(target)
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = set(sys.argv[2:])  # optional query-name filter (big-N runs)
    out_dir = Path(f"/tmp/spark_graft_scale_x{n}")
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    replicate(spark, "lineitem", n, out_dir, ["l_orderkey"])
    replicate(spark, "orders", n, out_dir, ["o_orderkey"])
    replicate(spark, "events", n, out_dir, ["event_id"])
    replicate(spark, "documents", n, out_dir, ["doc_id"], partition_cols=32)
    replicate(spark, "embeddings", n, out_dir, ["vec_id"], partition_cols=32)
    for dim in ("customer", "supplier", "part", "nation", "region"):
        target = out_dir / f"{dim}.parquet"
        if not target.exists():
            read_table(spark, SRC, dim).write.mode("overwrite").parquet(str(target))

    registry = load_all()
    timings = {}
    for name in QUERIES:
        if only and name not in only:
            continue
        fn = registry[name].fn
        try:
            fn(spark, str(out_dir)).count()  # warm-up
            t0 = time.time()
            rows = fn(spark, str(out_dir)).count()
            timings[name] = {"sec": round(time.time() - t0, 2), "rows": rows}
        except Exception as e:  # record and continue: one blow-up must
            # not erase the whole sweep's evidence
            timings[name] = {"error": str(e).split("\n")[0][:200]}
        print(f"# {name}: {timings[name]}", file=sys.stderr)
    if not only or "cc_distributed" in only:
        timings["cc_distributed"] = cc_distributed_case(spark, str(out_dir))
    print(json.dumps({"replicas": n, "queries": timings}))
    spark.stop()


def cc_distributed_case(spark, sf_dir: str) -> dict:
    """Exercise the DISTRIBUTED connected-components branch past the
    500k-edge driver gate (VERDICT r3 task 6): the real corpus's
    verified pair list stays candidate-sized, so we (a) force the
    distributed path on the real gram-pair graph (threshold=0), and
    (b) run a synthetic adversarial graph — 1M+ edges arranged as long
    CHAINS (diameter 1000, the worst case for plain min-propagation) —
    to measure the path-halving round count and per-round cost."""
    from incremental_github_data_pipeline_spark.operators.dedup import (
        connected_components,
        gram_overlap_pairs,
    )

    out = {}
    # (a) real pair list, distributed branch forced
    docs = read_table(spark, sf_dir, "documents")
    pairs = gram_overlap_pairs(docs, id_col="doc_id", text_col="text")
    st: dict = {}
    t0 = time.time()
    n_labeled = connected_components(
        pairs, local_threshold=0, stats=st
    ).count()
    out["forced_real"] = {
        "sec": round(time.time() - t0, 2), "labeled": n_labeled, **st,
    }
    # (b) synthetic 1M-edge chain graph: 1000 chains x 1000 nodes
    chain_len, n_chains = 1000, 1000
    edges = spark.range(chain_len * n_chains).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    ).filter((F.col("id_a") + 1) % chain_len != 0)
    st = {}
    t0 = time.time()
    labels = connected_components(edges, stats=st)
    n_comp = labels.select("component").distinct().count()
    out["synthetic_chains"] = {
        "sec": round(time.time() - t0, 2), "components": n_comp, **st,
    }
    assert n_comp == n_chains, f"expected {n_chains} components, got {n_comp}"
    return out


if __name__ == "__main__":
    main()
