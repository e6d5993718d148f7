"""Exact-value transform parity with the reference's own test corpus
(/root/reference/tests/test_reader.py:17-156) — same inputs, same
expected WKT strings and dicts, against our from-scratch implementation."""

from pydriosm_spark.functions.transforms import (
    geojson_to_wkt,
    parse_hstore,
    point_as_polygon,
)


def test_point_wkt():
    g = {"type": "Point", "coordinates": [-0.5134241, 52.6555853]}
    assert geojson_to_wkt(g) == "POINT (-0.5134241 52.6555853)"


def test_geometry_collection_wkt():
    g = {
        "type": "GeometryCollection",
        "geometries": [
            {"type": "Point", "coordinates": [-0.5096176, 52.6605168]},
            {"type": "Point", "coordinates": [-0.5097337, 52.6605812]},
        ],
    }
    assert (
        geojson_to_wkt(g)
        == "GEOMETRYCOLLECTION (POINT (-0.5096176 52.6605168), POINT (-0.5097337 52.6605812))"
    )


def test_point_as_polygon_degenerate_ring():
    coords = [[[[-0.6920145, 52.6753268], [-0.6920145, 52.6753268]]]]
    assert point_as_polygon(coords) == [
        [
            [
                [-0.6920145, 52.6753268],
                [-0.6920145, 52.6753268],
                [-0.6920145, 52.6753268],
            ]
        ]
    ]


def test_multipolygon_ring_per_polygon_quirk():
    # the reference turns EVERY ring into its own polygon
    g = {
        "type": "MultiPolygon",
        "coordinates": [[[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]], [[5.0, 5.0], [6.0, 5.0], [6.0, 6.0]]]],
    }
    assert geojson_to_wkt(g) == (
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))"
    )


def test_multipolygon_degenerate_through_wkt():
    g = {
        "type": "MultiPolygon",
        "coordinates": [[[[-0.6920145, 52.6753268], [-0.6920145, 52.6753268]]]],
    }
    assert geojson_to_wkt(g) == (
        "MULTIPOLYGON (((-0.6920145 52.6753268, -0.6920145 52.6753268, "
        "-0.6920145 52.6753268, -0.6920145 52.6753268)))"
    )


def test_hstore_single():
    assert parse_hstore('"odbl"=>"clean"') == {"odbl": "clean"}


def test_hstore_multi_and_br():
    s = '"naptan:StopAreaCode"=>"270G02701525","note"=>"a<br>b"'
    assert parse_hstore(s) == {"naptan:StopAreaCode": "270G02701525", "note": "a b"}


def test_hstore_none_passthrough():
    assert parse_hstore(None) is None
    assert parse_hstore("") == ""


def test_hstore_value_with_comma_inside():
    # commas only split between quote-boundary pairs
    s = '"addr"=>"1, High Street","k"=>"v"'
    assert parse_hstore(s) == {"addr": "1, High Street", "k": "v"}