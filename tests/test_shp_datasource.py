"""spark.read.format("osmshp") — record-striped shapefile DataSource
must equal the whole-file parser row-for-row on the real Geofabrik
fixture, including .dbf attributes fetched by random access."""

import json
import os
import zipfile

import pytest

ZIP_PATH = "/root/reference/tests/data/rutland/rutland-latest-free.shp.zip"
needs_fixture = pytest.mark.skipif(
    not os.path.exists(ZIP_PATH), reason="reference fixture absent"
)


@pytest.fixture(scope="module")
def shp_dir(tmp_path_factory):
    """Extract two real layers (with .shx/.dbf sidecars) to a directory."""
    d = tmp_path_factory.mktemp("shp")
    zf = zipfile.ZipFile(ZIP_PATH)
    wanted = [
        m for m in zf.namelist()
        if any(m.endswith(f"{layer}_free_1{ext}") for layer in
               ("gis_osm_railways", "gis_osm_natural")
               for ext in (".shp", ".shx", ".dbf"))
    ]
    assert len(wanted) == 6, wanted
    for m in wanted:
        (d / os.path.basename(m)).write_bytes(zf.read(m))
    return str(d)


@pytest.fixture(scope="module")
def registered(spark):
    from pydriosm_spark.sources.shp_datasource import OsmShpDataSource

    spark.dataSource.register(OsmShpDataSource)
    return spark


def _rows(df):
    return {
        (r["layer"], r["record_idx"]): (
            r["shape_type"],
            tuple(tuple(p) for p in r["coordinates"]),
            tuple(r["parts"]),
            json.loads(r["fields"]),
        )
        for r in df.collect()
    }


@needs_fixture
def test_osmshp_striped_equals_whole_file(registered, shp_dir):
    spark = registered
    from pydriosm_spark.sources import shp as S
    from pydriosm_spark.sources.readers import layer_name_of_member

    df = spark.read.format("osmshp").option("n_tasks", "4").load(shp_dir)
    got = _rows(df)

    want = {}
    for f in sorted(os.listdir(shp_dir)):
        if not f.endswith(".shp"):
            continue
        layer = layer_name_of_member(f) or f[:-4]
        shapes = S.parse_shp(open(os.path.join(shp_dir, f), "rb").read())
        recs = S.parse_dbf(open(os.path.join(shp_dir, f[:-4] + ".dbf"), "rb").read())
        for i, (st, pts, parts) in enumerate(shapes):
            want[(layer, i)] = (
                st,
                tuple((float(x), float(y)) for x, y in pts),
                tuple(parts),
                json.loads(json.dumps(recs[i] if i < len(recs) else {}, default=str)),
            )
    assert len(want) > 500  # real data, both layers
    assert got == want
    # 2 files x 4 stripes planned
    assert df.rdd.getNumPartitions() == 8


@needs_fixture
def test_parse_shx_matches_sequential_walk(shp_dir):
    """The .shx random-access map must point exactly at every record the
    sequential parser visits (same count, parseable content at each
    offset)."""
    from pydriosm_spark.sources import shp as S

    f = next(
        os.path.join(shp_dir, x) for x in sorted(os.listdir(shp_dir)) if x.endswith(".shp")
    )
    buf = open(f, "rb").read()
    shapes = S.parse_shp(buf)
    index = S.parse_shx(open(f[:-4] + ".shx", "rb").read())
    assert len(index) == len(shapes)
    for (off, ln), want in zip(index, shapes):
        assert S.parse_shp_record(buf[off : off + ln]) == want


@needs_fixture
def test_osmshp_write_round_trip(registered, shp_dir, tmp_path):
    """df.write.format('osmshp') -> read back with the same format:
    geometry round-trips exactly (float64 binary), attributes by value,
    and the commit protocol leaves _SUCCESS + a row-count manifest."""
    spark = registered
    src = spark.read.format("osmshp").load(shp_dir)
    out = str(tmp_path / "sink")
    src.write.format("osmshp").mode("overwrite").save(out)

    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    manifest = json.load(open(os.path.join(out, "_manifest.json")))
    n_src = src.count()
    assert manifest["rows"] == n_src
    assert all(f.endswith(".shp") for f in manifest["files"])

    back = spark.read.format("osmshp").load(out)
    # record_idx/src_file re-key per output file; compare content multisets
    def key(df):
        rows = sorted(
            (
                r["layer"].split("-")[-1] if "-" in r["layer"] else r["layer"],
                r["shape_type"],
                tuple(tuple(p) for p in r["coordinates"]),
                tuple(r["parts"]),
                tuple(sorted(json.loads(r["fields"]).items(), key=str)),
            )
            for r in df.collect()
        )
        return rows

    a, b = key(src), key(back)
    assert len(b) == n_src
    assert [x[1:3] for x in a] == [x[1:3] for x in b]  # geometry exact
    assert a == b  # attributes too (fixture fields are str/int-valued)


@needs_fixture
def test_osmshp_wkt_geometry_option(registered, shp_dir):
    """option('geometry', 'wkt') appends the reconstructed WKT column —
    the reference's emulate_gpd=True geometry surface — equal to
    shape_to_wkt over the raw parse for every record."""
    from pydriosm_spark.functions.transforms import shape_to_wkt

    spark = registered
    df = spark.read.format("osmshp").option("geometry", "wkt").option(
        "n_tasks", "4"
    ).load(shp_dir)
    assert "geometry_wkt" in df.columns
    rows = df.collect()
    assert len(rows) > 500
    for r in rows[:200]:
        want = shape_to_wkt(
            r["shape_type"],
            [tuple(p) for p in r["coordinates"]],
            list(r["parts"]) or None,
        )
        assert r["geometry_wkt"] == want
    assert all(r["geometry_wkt"].startswith(("LINESTRING", "MULTILINESTRING", "POLYGON", "POINT"))
               for r in rows)
