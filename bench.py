#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "throughput_rows_per_sec": ...,
   "scaling": {"cpus_lo": 8, "cpus_hi": 32, "sec_lo": ..., "sec_hi": ...,
               "speedup": ..., "efficiency": ...}}

The scaling block evidences the north rule's N->4N (local[8] vs local[32])
criterion: the same spatial-join+tiling job on identical input at two
parallelism levels; efficiency = speedup / (cpu ratio).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pydriosm_spark import queries as Q  # noqa: E402
from pydriosm_spark.functions import extract  # noqa: E402
from pydriosm_spark.operators import knn as knn_ops  # noqa: E402
from pydriosm_spark.operators import tiling  # noqa: E402
from pydriosm_spark.operators.spatial_join import spatial_join_points_polygons  # noqa: E402
from pydriosm_spark.session import get_spark  # noqa: E402
from pydriosm_spark.sources import synth  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
#: replication factor for the fact side — documents are replicated with
#: shifted doc_ids so the bench exercises a meaningfully large mention set
REPL = int(os.environ.get("SPARK_GRAFT_REPL", "24"))
SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") == "1"
SCALING_LO, SCALING_HI = 8, 32


def replicated_webpages(spark, sf_dir: str, repl: int):
    """documents x repl (doc_ids shifted per replica) -> webpages."""
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = d.count()
    k = spark.range(repl).select(F.col("id").alias("rep"))
    d = d.crossJoin(k).withColumn("doc_id", F.col("doc_id") + F.col("rep") * n).drop("rep")
    d = d.repartition(CPUS * 2).cache()
    d.count()
    from pydriosm_spark.sources.synth import fulltext_sql, FIXED_EPOCH

    full_text = F.expr(fulltext_sql("doc_id", "text", "spark"))
    return d.select(
        F.expr("'https://example-' || CAST(doc_id % 997 AS STRING) || '.org/page/' || CAST(doc_id AS STRING)").alias("url"),
        F.encode(
            F.concat(
                F.expr("'<html><head><title>p' || CAST(doc_id AS STRING) || '</title></head><body><p>'"),
                full_text,
                F.lit("</p></body></html>"),
            ),
            "utf-8",
        ).alias("html"),
        F.col("lang"),
    )


def pipeline_rows(spark, web) -> dict:
    """The headline pipeline: extract -> tile -> cover-join+PIP -> raster.
    Returns per-stage row counts (forces execution)."""
    m = extract.extract_mentions(web)
    t = tiling.assign_tiles(m, Q.TILE_RES, Q.TILE_PARENT_RES)
    j = spatial_join_points_polygons(spark, t, synth.zone_features(), res=Q.JOIN_RES)
    r = tiling.rasterize(m, Q.RASTER_CELL)
    return {"mentions": m.count(), "joined": j.count(), "raster": r.count()}


def run_suite(spark, sf_dir: str):
    times = {}
    t0 = time.time()
    web = replicated_webpages(spark, sf_dir, REPL)
    times["prepare_webpages"] = round(time.time() - t0, 3)

    t0 = time.time()
    m = extract.extract_mentions(web)
    n_mentions = m.count()
    times["extract"] = round(time.time() - t0, 3)

    t0 = time.time()
    t = tiling.assign_tiles(extract.extract_mentions(web), Q.TILE_RES, Q.TILE_PARENT_RES)
    t.count()
    times["tile_assign"] = round(time.time() - t0, 3)

    t0 = time.time()
    j = spatial_join_points_polygons(
        spark, extract.extract_mentions(web), synth.zone_features(), res=Q.JOIN_RES
    )
    n_joined = j.count()
    times["spatial_join_zones"] = round(time.time() - t0, 3)

    t0 = time.time()
    k = knn_ops.knn_ring(spark, extract.extract_mentions(web), synth.places_df(spark), k=3)
    k.count()
    times["knn_ring"] = round(time.time() - t0, 3)

    t0 = time.time()
    r = tiling.rasterize(extract.extract_mentions(web), Q.RASTER_CELL)
    tiling.vectorize(r, Q.RASTER_CELL, Q.VEC_MIN_COUNT).count()
    times["rasterize_vectorize"] = round(time.time() - t0, 3)

    return times, n_mentions, n_joined


def scaling_probe(sf_dir: str):
    """Same join+tile job at local[8] and local[32] on identical input."""
    out = {}
    for cpus in (SCALING_LO, SCALING_HI):
        spark = get_spark(parallelism=cpus, app_name=f"bench_scaling_{cpus}")
        web = replicated_webpages(spark, sf_dir, REPL)
        # warm-up to exclude JVM/codegen first-run cost from the comparison
        pipeline_rows(spark, web)
        t0 = time.time()
        rows = pipeline_rows(spark, web)
        out[cpus] = (time.time() - t0, rows)
        spark.stop()
    sec_lo, rows_lo = out[SCALING_LO]
    sec_hi, rows_hi = out[SCALING_HI]
    assert rows_lo == rows_hi, f"output mismatch across parallelism: {rows_lo} vs {rows_hi}"
    speedup = sec_lo / sec_hi
    return {
        "cpus_lo": SCALING_LO,
        "cpus_hi": SCALING_HI,
        "sec_lo": round(sec_lo, 3),
        "sec_hi": round(sec_hi, 3),
        "rows": rows_hi,
        "speedup": round(speedup, 3),
        "efficiency": round(speedup / (SCALING_HI / SCALING_LO), 3),
    }


def main():
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    spark = get_spark(parallelism=CPUS, app_name="bench")
    times, n_mentions, n_joined = run_suite(spark, SF_DIR)
    spark.stop()

    total = round(sum(times.values()), 3)
    work_sec = max(1e-9, sum(v for k, v in times.items() if k != "prepare_webpages"))
    result = {
        "metric": "spatial-join+tiling suite wall time (extract, tile, cover-join+PIP, kNN, raster)",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf),
        "rows": {"mentions": n_mentions, "joined": n_joined},
        "throughput_rows_per_sec": round(n_mentions * 5 / work_sec, 1),
    }
    if SCALING:
        result["scaling"] = scaling_probe(SF_DIR)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
