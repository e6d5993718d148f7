#!/usr/bin/env python
"""Round-6 measurement harness (guide section 1): isolates every bench
query with the noop sink, dumps .explain("formatted") per query, and
breaks the two most expensive operators (dedup_minhash_lsh, knn_cell)
into phases.  NOT the graded bench — bench.py stays frozen; this file
exists so OPTIMIZATION_r06.md can cite isolated numbers and plan files.

Usage:
  python bench_extra.py [--plans-dir plans/r06] [--suffix before|after]
                        [--only name1,name2] [--trials N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPL = int(os.environ.get("SPARK_GRAFT_REPL", "24"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--only", default=None)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    from pyspark.sql import functions as F

    import bench as B
    from pydriosm_spark import queries as Q
    from pydriosm_spark.functions import extract
    from pydriosm_spark.operators import dedup, knn as knn_ops, similarity, tiling
    from pydriosm_spark.operators.spatial_join import spatial_join_points_polygons
    from pydriosm_spark.queries_media import (
        q_audio_features,
        q_media_image,
        q_video_frame_sample,
    )
    from pydriosm_spark.queries_text import q_text_profile
    from pydriosm_spark.session import get_spark
    from pydriosm_spark.sources import synth

    spark = get_spark(parallelism=CPUS, app_name="bench_extra")
    sc = spark.sparkContext

    web = B._webpages_from(B._replicated_docs(spark, SF_DIR, REPL, CPUS * 2), CPUS).cache()
    web.count()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    builders = {
        "extract": lambda: extract.extract_mentions(web),
        "tile_assign": lambda: tiling.assign_tiles(
            extract.extract_mentions(web), Q.TILE_RES, Q.TILE_PARENT_RES
        ),
        "spatial_join_zones": lambda: spatial_join_points_polygons(
            spark, extract.extract_mentions(web), synth.zone_features(), res=Q.JOIN_RES
        ),
        "knn_cell": lambda: knn_ops.knn_cell(
            spark, extract.extract_mentions(web), synth.places_df(spark), k=3
        ),
        "knn_auto": lambda: knn_ops.knn_auto(
            spark, extract.extract_mentions(web), synth.places_df(spark), k=3
        ),
        "rasterize_vectorize": lambda: tiling.vectorize(
            tiling.rasterize(extract.extract_mentions(web), Q.RASTER_CELL),
            Q.RASTER_CELL,
            Q.VEC_MIN_COUNT,
        ),
        "dedup_minhash_lsh": lambda: dedup.minhash_lsh_pairs(docs, jaccard_e6_min=100_000),
        "simhash": lambda: dedup.simhash_signature(docs).select(
            F.max("simhash"), F.count(F.lit(1))
        ),
        "cosine_topk": lambda: similarity.cosine_topk_bruteforce(spark, emb, k=5),
        "text_profile": lambda: q_text_profile(spark, SF_DIR),
        "media_image": lambda: q_media_image(spark, SF_DIR),
        "media_audio": lambda: q_audio_features(spark, SF_DIR),
        "media_video": lambda: q_video_frame_sample(spark, SF_DIR),
    }

    out = {}
    for name, build in builders.items():
        if only and name not in only:
            continue
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = build()
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
        best = None
        for _ in range(args.trials):
            sc.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            noop(build())
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        sc.setJobDescription(None)
        out[name] = round(best, 3)

    # --- phase breakdown: dedup_minhash_lsh -------------------------------
    if only is None or "minhash_phases" in only:
        ph = {}
        for pname, pbuild in [
            ("shingles", lambda: dedup.shingles_exploded(docs)),
            ("signatures", lambda: dedup.minhash_signatures(docs)),
        ]:
            best = None
            for _ in range(args.trials):
                sc.setJobDescription(f"minhash_phase:{pname}")
                t0 = time.time()
                noop(pbuild())
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            ph[pname] = round(best, 3)
        sc.setJobDescription(None)
        out["minhash_phases"] = ph

    print(json.dumps({"sf_dir": SF_DIR, "isolated": out}))
    spark.stop()


if __name__ == "__main__":
    main()
