#!/usr/bin/env python
"""Regenerate PLANS.md: the physical plans of the headline queries with
commentary — the `.explain("formatted")` evidence the engine's plan-shape
tests enforce (tests/test_plans.py)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pydriosm_spark.functions import extract
from pydriosm_spark.operators import dedup, tiling
from pydriosm_spark.operators.spatial_join import spatial_join_points_polygons
from pydriosm_spark.queries_rel import q_pricing_summary
from pydriosm_spark.session import get_spark
from pydriosm_spark.sources import synth

SF = "/root/testdata/sf0.001"


def fmt(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString().strip()


def main():
    spark = get_spark(parallelism=8, app_name="plans_doc")
    m = extract.extract_mentions(synth.webpages(spark, SF))

    sections = [
        (
            "Extraction (html -> text -> mentions)",
            "Single whole-stage-codegen pass: scan -> string exprs -> regexp -> "
            "posexplode. **No Exchange, no Python** — enforced by "
            "`test_extraction_plan_has_no_shuffle_and_no_python`.",
            m,
        ),
        (
            "Spatial join (flat cover broadcast + PIP refine)",
            "The only Exchange is the BroadcastExchange of the cover; the fact "
            "side is scanned once; a single ArrowEvalPython stage carries the "
            "ray-cast refine with the full-cell short-circuit.",
            spatial_join_points_polygons(spark, m, synth.zone_features(), res=17),
        ),
        (
            "Rasterize (partial+final hash agg)",
            "Map-side partial aggregation bounds the shuffle by |cells|, not "
            "|points|.",
            tiling.rasterize(m, 3000),
        ),
        (
            "MinHash signatures (explode + 16 codegen min-aggs)",
            "One md5 per shingle; the 16 band minima ride a single hash "
            "aggregate (no interpreted higher-order lambdas — measured ~10x "
            "slower).",
            dedup.minhash_signatures(spark.read.parquet(f"{SF}/documents.parquet")),
        ),
        (
            "TPC-H Q1-style pricing summary",
            "Filter pushed to the parquet scan; HashAggregate partial+final.",
            q_pricing_summary(spark, SF),
        ),
        (
            "SimHash signatures (explode + one 61-aggregate codegen hash agg)",
            "The 60 bit-count sums + token count run in a single partial+final "
            "hash aggregate over exploded tokens; the md5 hash is projected "
            "once per token (Catalyst would re-evaluate a bound expression "
            "inside each aggregate otherwise).  Replaced 60 interpreted "
            "filter() HOF passes per row.",
            dedup.simhash_signature(spark.read.parquet(f"{SF}/documents.parquet")),
        ),
        (
            "Guided multi-probe LSH ANN (bucket equi-join + Arrow re-rank)",
            "Buckets come from ONE int64 matmul per Arrow batch (plane count "
            "SELF-SIZED from N: planes ~ log2(N/64)); the query side emits 7 "
            "distance-guided probes per table (base + single/pair flips of the "
            "3 lowest-|dot| planes), candidates are an equi-join on (table, "
            "bucket), and the exact re-rank is one vectorized pandas UDF over "
            "integer-quantized vectors — bit-identical to the DuckDB oracle, "
            "which re-derives the plane count from count(*).",
            __import__("pydriosm_spark.operators.similarity", fromlist=["similarity"]).cosine_topk_lsh(
                spark, spark.read.parquet(f"{SF}/embeddings.parquet"), dim=64
            ),
        ),
        (
            "Fused per-doc text profile (one explode, one 65-column hash agg)",
            "langid's four stopword conditional-sums ride the simhash "
            "aggregation's exploded token stream: the whole profile is ONE "
            "Generate + one partial+final hash aggregate (|docs| x 65 longs "
            "shuffle) + one doc_id equi-join to the scalar projection.  "
            "Locked by `test_text_profile_single_explode_single_agg`.",
            __import__("pydriosm_spark.queries_text", fromlist=["queries_text"]).q_text_profile(
                spark, SF
            ),
        ),
        (
            "City-bbox catalogue join (integer cover -> broadcast -> refine)",
            "The BBBike-style flow: each catalogue bbox explodes to its integer "
            "grid cover cells (a tiny dim — broadcast), mentions equi-join on "
            "cell and the exact half-open range check refines.  Pure integer "
            "arithmetic: zero Python stages; the only shuffle is the final "
            "per-city aggregation.  Locked by "
            "`test_bbox_city_join_broadcasts_catalogue_no_python`.",
            __import__("pydriosm_spark.queries", fromlist=["queries"]).q_bbox_cities(spark, SF),
        ),
    ]

    out = [
        "# PLANS — physical plans of the headline operators",
        "",
        "Auto-generated by `python make_plans_doc.py` (plan SHAPES are",
        "regression-locked by tests/test_plans.py; this file is the",
        "human-readable snapshot).",
        "",
    ]
    for title, note, df in sections:
        out += [f"## {title}", "", note, "", "```", fmt(df), "```", ""]
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
