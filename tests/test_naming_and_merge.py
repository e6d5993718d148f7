"""Naming semantics (fuzzy layer resolution, table-name sanitization) and
partitioned sinks (per-geom-type / per-fclass writes)."""

import os

import pytest

from pydriosm_spark.functions.naming import (
    InvalidNameError,
    find_similar_str,
    sanitize_table_name,
    validate_layer_names,
)
from pydriosm_spark.operators.merge import write_by_feature_class, write_by_geom_type
from pydriosm_spark.sources import layers
from tests.conftest import SF_SMOKE


def test_fuzzy_layer_resolution():
    assert validate_layer_names("railway") == ["railways"]
    assert validate_layer_names(["Building", "WATER"]) == ["buildings", "water"]
    assert validate_layer_names("all") == sorted(validate_layer_names(None))
    assert validate_layer_names("multipolygon", family="pbf") == ["multipolygons"]
    with pytest.raises(InvalidNameError):
        validate_layer_names("zzzzqqqq")


def test_find_similar_str_gate():
    assert find_similar_str("raillways", ["railways", "roads"]) == "railways"
    assert find_similar_str("xyz", ["railways"], cutoff=0.9) is None


def test_sanitize_table_name():
    assert sanitize_table_name("greater london") == "greater_london"
    assert sanitize_table_name("bremen!, (de)") == "bremen_de"
    long = "x" * 80
    s = sanitize_table_name(long)
    # reference truncates to the first 60 chars + '..' (ios/utils.py:118)
    assert len(s) == 62 and s.endswith("..")


def test_partitioned_sinks(spark, tmp_path):
    lf = layers.layer_features(spark, SF_SMOKE)
    out1 = str(tmp_path / "by_layer")
    write_by_geom_type(lf, out1, geom_type_col="layer")
    dirs = {d for d in os.listdir(out1) if d.startswith("layer=")}
    assert dirs == {f"layer={n}" for n in layers.LAYERS}
    # partition pruning round-trip
    back = spark.read.parquet(out1).filter("layer = 'points'")
    assert back.count() == lf.filter("layer = 'points'").count()

    out2 = str(tmp_path / "by_fclass")
    write_by_feature_class(lf, out2)
    assert any(d.startswith("fclass=rail") for d in os.listdir(out2))