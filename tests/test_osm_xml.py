"""OSM XML (.osm.bz2) reader: format-equivalence with the PBF path —
identical content encoded both ways must produce identical primitives
and identical features in every layer (the reference's own .osm.bz2
reader is an unfinished stub; ours completes SURVEY §2 S9)."""

import bz2
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pydriosm_spark.sources import osm_xml, pbf  # noqa: E402
from tests.pbf_encode_util import PbfBuilder  # noqa: E402


def _fixture_builder() -> PbfBuilder:
    b = PbfBuilder()
    # significant + insignificant nodes
    b.node(1, 52.0, 0.0, {"name": "alpha", "amenity": "pub"})
    b.node(2, 52.0, 0.001, {"created_by": "bot"})  # insignificant
    b.node(3, 52.001, 0.001)
    b.node(4, 52.001, 0.0)
    # line way + polygon way (closed + building)
    b.way(10, [1, 2, 3], {"highway": "residential", "name": "high st"})
    b.way(11, [1, 2, 3, 4, 1], {"building": "yes"})
    # route relation + multipolygon relation + generic relation
    b.relation(20, [("way", 10, "")], {"type": "route", "route": "bus"})
    b.relation(21, [("way", 11, "outer")], {"type": "multipolygon", "natural": "wood"})
    b.relation(22, [("node", 1, "label"), ("way", 10, "")], {"type": "site", "name": "spot"})
    return b


def _to_xml(b: PbfBuilder) -> bytes:
    out = ['<?xml version="1.0" encoding="UTF-8"?>', '<osm version="0.6" generator="test">']
    for nid, lat, lon, tags in b.nodes:
        if tags:
            out.append(f'  <node id="{nid}" lat="{lat}" lon="{lon}">')
            out += [f'    <tag k="{k}" v="{v}"/>' for k, v in tags.items()]
            out.append("  </node>")
        else:
            out.append(f'  <node id="{nid}" lat="{lat}" lon="{lon}"/>')
    for wid, refs, tags in b.ways:
        out.append(f'  <way id="{wid}">')
        out += [f'    <nd ref="{r}"/>' for r in refs]
        out += [f'    <tag k="{k}" v="{v}"/>' for k, v in tags.items()]
        out.append("  </way>")
    for rid, members, tags in b.rels:
        out.append(f'  <relation id="{rid}">')
        out += [f'    <member type="{t}" ref="{m}" role="{r}"/>' for t, m, r in members]
        out += [f'    <tag k="{k}" v="{v}"/>' for k, v in tags.items()]
        out.append("  </relation>")
    out.append("</osm>")
    return "\n".join(out).encode()


def test_xml_and_pbf_primitives_identical():
    b = _fixture_builder()
    from_pbf = pbf.parse_pbf(b.build())
    from_xml = osm_xml.parse_osm_xml(_to_xml(b))
    assert from_xml == from_pbf


def test_xml_and_pbf_layers_identical():
    b = _fixture_builder()
    n1, w1, r1 = pbf.parse_pbf(b.build())
    n2, w2, r2 = osm_xml.parse_osm_xml(bz2.compress(_to_xml(b)))  # via bz2
    for name, asm in pbf.LAYER_ASSEMBLERS.items():
        assert asm(n1, w1, r1) == asm(n2, w2, r2), name


def test_read_osm_bz2_spark_surface(spark, tmp_path):
    b = _fixture_builder()
    p = tmp_path / "mini.osm.bz2"
    p.write_bytes(bz2.compress(_to_xml(b)))
    dfs = osm_xml.read_osm_bz2(spark, str(p))
    counts = {name: df.count() for name, df in dfs.items()}
    assert counts == {
        "points": 1,            # only node 1 is significant
        "lines": 1,             # way 10
        "multilinestrings": 1,  # route relation 20
        "multipolygons": 2,     # relation 21 + standalone polygon way 11
        "other_relations": 1,   # site relation 22
    }
    row = dfs["points"].first()
    assert row["id"] == 1
    # amenity is not a points column -> folds into the hstore
    assert row["properties"]["other_tags"] == '"amenity"=>"pub"'
    assert row["properties"]["name"] == "alpha"
