#!/usr/bin/env python
"""Supplementary benchmarks (bench.py is measurement-frozen; extra
evidence lives here, cited from OPTIMIZATION_r06.md / BENCH.md).

--join-scaling: the join-family scaling number with the serial floor
removed AT THE SOURCE. bench.py's --scaling amplifies via N-way
self-unions, which grows the DRIVER'S serial planning cost with the
amplification factor (a 16..64-branch union plan), so the family's
raw 2->8 ratio is dominated by a floor that the amplification itself
inflates — measured floors via the two-point fit: knn ~3.5 s,
pip_salted ~0.8 s at MULT=16; at MULT=64 the knn floor grows to
~15 s. Here the page side is amplified by ONE explode over a
sequence literal (single scan, single Generate, constant planning
cost), which reproduces the per-row work without the plan blowup.
Same queries, same operators, same noop-sink min-of-N protocol.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from bench import BENCH_PAGES, _fixtures  # noqa: E402  (frozen harness reused)


def _amplified_pages(spark, mult: int):
    from pyspark.sql import functions as F

    paths = _fixtures()
    pages = spark.read.parquet(paths["pages"]).select("url", "lon", "lat")
    if mult <= 1:
        return pages
    # one Generate, one scan: url is re-keyed per replica so the
    # exploded column is referenced (an unreferenced explode would be
    # pruned) and page keys stay distinct
    return pages.withColumn(
        "_r", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
    ).select(
        F.concat_ws("#", F.col("url"), F.col("_r")).alias("url"), "lon", "lat"
    )


def run_level(cpus: int, mult: int, runs: int) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from rio_toa_spark.session import get_spark

    spark = get_spark(
        app_name="bench_extra_join",
        master="local[%d]" % cpus,
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F  # noqa: F401

    from rio_toa_spark.operators.spatial_join import (
        knn_join,
        pip_join,
        scene_footprints,
        tile_footprints,
    )
    from rio_toa_spark.operators.textstats import with_extracted_text

    paths = _fixtures()
    tiles = spark.read.parquet(paths["tiles"])
    scenes = spark.read.parquet(paths["scenes"])
    pages = _amplified_pages(spark, mult)
    raw_pages = spark.read.parquet(paths["pages"])

    queries = {
        "pip_pages_scenes": lambda: pip_join(
            pages, scene_footprints(scenes), level=7
        ).select("url", "scene_id"),
        "pip_pages_tiles_salted": lambda: pip_join(
            pages, tile_footprints(tiles), level=7, strategy="salted"
        ).select("url", "tile_id"),
        "knn_pages_tiles": lambda: knn_join(pages, tiles, k=3, strategy="broadcast"),
        # extract_text reads html, which the explode-amplified frame
        # drops; amplify with the same single-Generate shape over html
        "extract_text_all_pages": lambda: with_extracted_text(
            raw_pages.select("url", "html")
            .withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))))
            .drop("_r")
            if mult > 1
            else raw_pages
        ).select("url", "extracted_text"),
    }

    spark.range(1000).selectExpr("sum(id)").collect()  # warm JVM
    timings = {}
    for name, build in queries.items():
        samples = []
        for _ in range(max(runs, 1)):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        if len(samples) > 1:
            samples = samples[1:]
        timings[name] = round(min(samples), 3)
    total = round(sum(timings.values()), 3)
    n_rows = BENCH_PAGES * mult
    out = {
        "cpus": cpus,
        "mult": mult,
        "queries": timings,
        "total_sec": total,
        "join_input_rows_per_sec": round(
            3 * n_rows / sum(timings[q] for q in (
                "pip_pages_scenes", "pip_pages_tiles_salted", "knn_pages_tiles"))
        ),
    }
    spark.stop()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--join-scaling", action="store_true")
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--mult", type=int, default=16)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--level", type=int, default=0, help="(internal) run one level")
    args = ap.parse_args()

    if args.level:
        print(json.dumps(run_level(args.level, args.mult, args.runs)))
        return
    if not args.join_scaling:
        ap.error("nothing to do: pass --join-scaling")
    levels = [int(x) for x in args.levels.split(",")]
    results = {}
    for cpus in levels:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--level", str(cpus),
             "--mult", str(args.mult), "--runs", str(args.runs)],
            capture_output=True, text=True, check=True, cwd=_REPO,
            env=dict(os.environ),
        )
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
    lo, hi = levels[0], levels[-1]
    eff = {
        name: round(
            (results[lo]["queries"][name] / results[hi]["queries"][name]) / (hi / lo), 3
        )
        for name in results[lo]["queries"]
    }
    fam = ("pip_pages_scenes", "pip_pages_tiles_salted", "knn_pages_tiles")
    fam_eff = round(
        (sum(results[lo]["queries"][q] for q in fam)
         / sum(results[hi]["queries"][q] for q in fam)) / (hi / lo), 3,
    )
    print(json.dumps({
        "levels": results,
        "per_query_efficiency": eff,
        "join_family_efficiency": fam_eff,
    }))


if __name__ == "__main__":
    main()
