"""Error-path behavior: malformed inputs fail loudly where corruption
means wrong data (binary formats), and pass through as null where the
reference does (hstore None, empty text)."""

import pytest

from pydriosm_spark.functions.transforms import geojson_to_wkt, parse_hstore
from pydriosm_spark.functions.naming import InvalidNameError, validate_layer_names
from pydriosm_spark.geometry.wkt import parse_wkt
from pydriosm_spark.sources import pbf, shp


def test_wkt_parser_rejects_garbage():
    for bad in ["", "POINT", "CIRCLE (1 2)", "POINT (a b", "POLYGON 1 2"]:
        with pytest.raises(ValueError):
            parse_wkt(bad)


def test_geojson_rejects_unknown_type():
    with pytest.raises(ValueError):
        geojson_to_wkt({"type": "Hyperbola", "coordinates": [1, 2]})


def test_hstore_lenient_paths():
    # None/empty passthrough, and unquoted trailing junk folds into the
    # value — byte-faithful to the reference's regex semantics
    # (transformer.py:366-378), verified: same expressions, same result
    assert parse_hstore(None) is None
    assert parse_hstore('"k"=>"v",junk') == {"k": 'v",junk'}


def test_shp_parser_rejects_non_shapefile():
    with pytest.raises(ValueError):
        shp.parse_shp(b"\x00" * 200)
    with pytest.raises(ValueError):
        shp.parse_shp(b"tiny")
    assert shp.parse_dbf(b"") == []


def test_pbf_parser_rejects_garbage():
    with pytest.raises(Exception):
        pbf.parse_pbf(b"not a pbf file at all" * 10)


def test_fuzzy_names_raise_with_candidates():
    with pytest.raises(InvalidNameError) as e:
        validate_layer_names("qqqq")
    assert "did you mean" in str(e.value)


def test_media_kernel_rejects_wrong_magic(spark):
    import pandas as pd

    from pydriosm_spark.multimodal import media as M

    bogus = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "kind": ["image"], "payload": [b"JPEGnotreally"]})
    )
    with pytest.raises(Exception):
        M.image_features(bogus).collect()