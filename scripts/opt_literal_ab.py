#!/usr/bin/env python
"""r16 (VERDICT r15 task 8): one-off A/B proving the r15 centroid/PQ
literal rewrite (one array<double> literal per centroid instead of
``dim`` literal children) matters at a size where the r15 bench
(16 cells x 64 dims) measured neutral: 256 cells x 256 dims — the
shape a real IVF deployment ships.

Both forms build the same assign-nearest-cell expression over the same
deterministic vectors; timed phases are (a) DataFrame construction +
analysis (df.schema forces the analyzer) and (b) one count() action.
Values are asserted equal, so the A/B is also an equivalence check.

Usage: python scripts/opt_literal_ab.py [--cells 256] [--dims 256]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def centroid_literal_old(cent_rows):
    # the pre-r15 form: one F.lit per ELEMENT (dims literal children
    # per centroid -> cells*dims expression nodes)
    return F.array(
        *[
            F.struct(
                F.lit(cell).alias("cell"),
                F.array(*[F.lit(float(x)) for x in cent]).alias("cent"),
            )
            for cell, cent in cent_rows
        ]
    )


def centroid_literal_new(cent_rows):
    # the r15 form (operators/similarity._centroid_literal)
    return F.array(
        *[
            F.struct(
                F.lit(cell).alias("cell"),
                F.lit([float(x) for x in cent])
                .cast("array<double>")
                .alias("cent"),
            )
            for cell, cent in cent_rows
        ]
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=256)
    ap.add_argument("--dims", type=int, default=256)
    ap.add_argument("--rows", type=int, default=2000)
    args = ap.parse_args()

    from incremental_github_data_pipeline_spark.operators.similarity import (
        cosine_similarity,
    )
    from incremental_github_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="opt-literal-ab")
    spark.sparkContext.setLogLevel("ERROR")

    cent_rows = [
        (
            c,
            [((c * 31 + d * 7) % 97) / 97.0 + 0.01 for d in range(args.dims)],
        )
        for c in range(args.cells)
    ]
    vecs = spark.range(args.rows).select(
        F.col("id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(args.dims - 1)),
            lambda d: ((F.col("id") * 13 + d * 5) % 89).cast("double")
            / 89.0
            + 0.01,
        ).alias("v"),
    ).localCheckpoint(eager=True)  # input identical + pre-materialized

    results = {}
    sums = {}
    for tag, builder in (
        ("old_per_element", centroid_literal_old),
        ("new_array_literal", centroid_literal_new),
    ):
        build_times, run_times = [], []
        for _ in range(3):
            t0 = time.time()
            arr = builder(cent_rows)
            best = F.array_max(
                F.transform(
                    arr,
                    lambda s: F.struct(
                        cosine_similarity(F.col("v"), s["cent"]).alias(
                            "sim"
                        ),
                        s["cell"].alias("cell"),
                    ),
                )
            )
            df = vecs.select("id", best["cell"].alias("cell"))
            df.schema  # force analysis
            build_times.append(time.time() - t0)
            t0 = time.time()
            agg = df.agg(F.sum(F.col("cell") * F.col("id"))).collect()[0][0]
            run_times.append(time.time() - t0)
        results[tag] = {
            "analyze_med": round(statistics.median(build_times), 3),
            "action_med": round(statistics.median(run_times), 3),
        }
        sums[tag] = agg
    assert sums["old_per_element"] == sums["new_array_literal"], sums
    print(json.dumps({
        "cells": args.cells, "dims": args.dims,
        "checksum_equal": True, **results,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
