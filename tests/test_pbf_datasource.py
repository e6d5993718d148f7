"""spark.read.format("osmpbf") — the registered Python DataSource must
equal the function surfaces byte-for-byte (VERDICT r4 item 4), with the
blob index built on executors and multi-file inputs handled without any
driver-side per-file loop."""

import os
import shutil

import pytest

PBF_PATH = "/root/reference/tests/data/rutland/rutland-latest.osm.pbf"
needs_fixture = pytest.mark.skipif(
    not os.path.exists(PBF_PATH), reason="reference fixture absent"
)


@pytest.fixture(scope="module")
def registered(spark):
    from pydriosm_spark.sources.pbf_datasource import OsmPbfDataSource

    spark.dataSource.register(OsmPbfDataSource)
    return spark


def _points_key(df):
    return {
        int(r["id"]): (r["lon"], r["lat"], dict(r["properties"]))
        for r in df.collect()
    }


@needs_fixture
def test_datasource_points_byte_identical_to_function_surface(registered):
    spark = registered
    from pydriosm_spark.sources import pbf

    via_fmt = spark.read.format("osmpbf").option("layer", "points").option(
        "n_tasks", "8"
    ).load(PBF_PATH)
    want = _points_key(pbf.read_pbf_points_layer(spark, PBF_PATH))
    got = _points_key(via_fmt)
    assert got == want
    # the format string really planned 8 stripes (one read task each)
    assert via_fmt.rdd.getNumPartitions() == 8


@needs_fixture
def test_datasource_lines_layer_matches_read_pbf(registered):
    spark = registered
    from pydriosm_spark.sources import pbf

    via_fmt = spark.read.format("osmpbf").option("layer", "lines").load(PBF_PATH)
    want = {
        int(r["id"]): (r["geometry"], dict(r["properties"]))
        for r in pbf.read_pbf(spark, PBF_PATH, ["lines"])["lines"].collect()
    }
    got = {
        int(r["id"]): (r["geometry"], dict(r["properties"]))
        for r in via_fmt.collect()
    }
    assert got == want


@needs_fixture
def test_multi_file_index_and_datasource_read(registered, tmp_path):
    """A directory of several PBFs: the executor-side index covers every
    file (blob_ranges_df plans no driver loop), and the DataSource reads
    the union with src_file distinguishing the copies."""
    spark = registered
    from pydriosm_spark.sources import pbf

    d = tmp_path / "lake"
    d.mkdir()
    for name in ("a.osm.pbf", "b.osm.pbf"):
        shutil.copy(PBF_PATH, d / name)

    # distributed index: one row per blob per file, built on executors
    idx = pbf.index_blobs_distributed(spark, str(d)).collect()
    per_file = {}
    for r in idx:
        per_file.setdefault(os.path.basename(r["path"]), []).append(
            (r["start"], r["length"], r["block_type"])
        )
    assert set(per_file) == {"a.osm.pbf", "b.osm.pbf"}
    want_idx = pbf.index_blobs(PBF_PATH)
    for f, rows in per_file.items():
        assert sorted(rows) == sorted(want_idx)

    n_single = pbf.read_pbf_points_layer(spark, PBF_PATH).count()
    df = spark.read.format("osmpbf").option("layer", "points").option(
        "n_tasks", "4"
    ).load(str(d))
    from pyspark.sql import functions as F

    counts = {
        os.path.basename(r["src_file"]): r["n"]
        for r in df.groupBy("src_file").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {"a.osm.pbf": n_single, "b.osm.pbf": n_single}


@needs_fixture
def test_split_primitives_still_byte_identical_after_executor_indexing(spark):
    """blob_ranges_df now builds its index executor-side; the splittable
    primitives scan must stay equal to a whole-file parse."""
    from pydriosm_spark.sources import pbf

    prims = pbf.read_pbf_primitives_split(spark, PBF_PATH, n_tasks=4)
    node_ids = sorted(
        r["id"] for r in prims.filter("kind = 'node'").select("id").collect()
    )
    with open(PBF_PATH, "rb") as f:
        n, w, r = pbf.parse_pbf(f.read())
    assert node_ids == sorted(nd[0] for nd in n)


def test_datasource_rejects_unknown_layer(registered):
    with pytest.raises(Exception, match="unknown layer"):
        registered.read.format("osmpbf").option("layer", "nope").load("/tmp").schema


@needs_fixture
def test_streaming_pbf_ingest_exactly_once(spark, tmp_path):
    """Continuous PBF ingest (the download-loop replacement): a file
    lands -> availableNow drain decodes it; a second file lands -> the
    SAME checkpoint drains only the new one; union equals the batch
    read of both, exactly once."""
    import shutil

    from pyspark.sql import functions as F

    from pydriosm_spark.sources import pbf

    src = tmp_path / "landing"
    src.mkdir()
    sink = str(tmp_path / "points_out")
    ckpt = str(tmp_path / "ckpt")
    shutil.copy(PBF_PATH, src / "a.osm.pbf")

    def drain():
        q = (
            pbf.read_pbf_points_layer_stream(spark, str(src))
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    drain()
    n_single = pbf.read_pbf_points_layer(spark, PBF_PATH).count()
    assert spark.read.parquet(sink).count() == n_single

    shutil.copy(PBF_PATH, src / "b.osm.pbf")
    drain()  # same checkpoint: only b processed
    got = spark.read.parquet(sink)
    assert got.count() == 2 * n_single
    per_file = {
        os.path.basename(r["f"]): r["n"]
        for r in got.select(
            F.element_at(F.split("src_file", "/"), -1).alias("f")
        ).groupBy("f").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_file == {"a.osm.pbf": n_single, "b.osm.pbf": n_single}
    # content equality: ids per file match the batch surface
    ids = sorted(
        r["id"] for r in got.filter(F.col("src_file").endswith("a.osm.pbf")).collect()
    )
    want = sorted(r["id"] for r in pbf.read_pbf_points_layer(spark, PBF_PATH).collect())
    assert ids == want


@needs_fixture
def test_pbf_validate_quarantines_corrupt_files(spark, tmp_path):
    """pbf_validate: the intact fixture passes shallow AND deep; each
    corruption mode earns its specific verdict from the bytes."""
    import shutil

    from pydriosm_spark.sources import pbf

    d = tmp_path / "lake"
    d.mkdir()
    shutil.copy(PBF_PATH, d / "good.osm.pbf")
    raw = open(PBF_PATH, "rb").read()
    (d / "short.osm.pbf").write_bytes(raw[:2])
    (d / "trunc.osm.pbf").write_bytes(raw[: len(raw) // 2])
    bad = bytearray(raw)
    bad[0:4] = (1 << 30).to_bytes(4, "big")  # absurd header length
    (d / "frame.osm.pbf").write_bytes(bytes(bad))
    # valid framing but garbage payload: stomp an OSMData blob body
    idx = pbf.index_blobs(PBF_PATH)
    s, ln, _bt = next(r for r in idx if r[2] == "OSMData")
    deep_bad = bytearray(raw)
    deep_bad[s + ln - 64 : s + ln] = b"\xff" * 64
    (d / "deepbad.osm.pbf").write_bytes(bytes(deep_bad))

    got = {
        os.path.basename(r["path"]): (r["valid"], r["reason"])
        for r in pbf.pbf_validate(spark, str(d)).collect()
    }
    assert got["good.osm.pbf"] == (True, None)
    assert got["short.osm.pbf"] == (False, "too_short")
    assert got["trunc.osm.pbf"][0] is False and got["trunc.osm.pbf"][1] in (
        "truncated", "bad_framing"
    )
    assert got["frame.osm.pbf"] == (False, "bad_framing")
    # shallow validation cannot see inside the blob...
    assert got["deepbad.osm.pbf"][0] is True
    # ...deep validation can
    deep = {
        os.path.basename(r["path"]): (r["valid"], r["reason"])
        for r in pbf.pbf_validate(spark, str(d), deep=True).collect()
    }
    assert deep["good.osm.pbf"] == (True, None)
    assert deep["deepbad.osm.pbf"] == (False, "undecodable_block")


@needs_fixture
def test_streaming_layer_ingest_multipolygons(spark, tmp_path):
    """Any-layer streaming ingest: multipolygons (whole-file member
    context) drained with availableNow equals the batch read_pbf
    surface."""
    import shutil

    from pydriosm_spark.sources import pbf

    src = tmp_path / "landing"
    src.mkdir()
    shutil.copy(PBF_PATH, src / "a.osm.pbf")
    sink = str(tmp_path / "mp_out")
    q = (
        pbf.read_pbf_layer_stream(spark, str(src), "multipolygons")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["id"], r["geometry"]): dict(r["properties"])
        for r in spark.read.parquet(sink).collect()
    }
    want = {
        (r["id"], r["geometry"]): dict(r["properties"])
        for r in pbf.read_pbf(spark, PBF_PATH, ["multipolygons"])["multipolygons"].collect()
    }
    assert got == want and len(got) > 1000

    import pytest as _p

    with _p.raises(ValueError, match="unknown layer"):
        pbf.read_pbf_layer_stream(spark, str(src), "nope")


@needs_fixture
def test_datasource_relation_layer_streams_and_matches_distributed(registered):
    """VERDICT r4 item 2: the relation-layer path must (a) equal
    relation_layers_distributed feature-for-feature on the fixture and
    (b) never whole-file fh.read() — it streams blob-by-blob under a
    loud size guard."""
    spark = registered
    from pydriosm_spark.sources import pbf

    via_fmt = (
        spark.read.format("osmpbf").option("layer", "multipolygons").load(PBF_PATH)
    )
    got = {
        int(r["id"]): (r["geometry"], dict(r["properties"]))
        for r in via_fmt.collect()
    }
    dist = pbf.relation_layers_distributed(spark, PBF_PATH).filter(
        "layer = 'multipolygons'"
    )
    want = {
        int(r["id"]): (r["geometry"], dict(r["properties"]))
        for r in dist.collect()
    }
    assert got == want and len(got) > 1000


@needs_fixture
def test_datasource_relation_layer_size_guard(registered):
    """Files over max_file_bytes are rejected LOUDLY with a pointer to
    the distributed assemblers, not silently OOM'd one task at a time."""
    import pytest as _p

    spark = registered
    df = (
        spark.read.format("osmpbf")
        .option("layer", "multipolygons")
        .option("max_file_bytes", "1024")
        .load(PBF_PATH)
    )
    with _p.raises(Exception, match="relation_layers_distributed"):
        df.count()
    # splittable layers are unaffected by the guard
    n = (
        spark.read.format("osmpbf")
        .option("layer", "points")
        .option("max_file_bytes", "1024")
        .load(PBF_PATH)
        .count()
    )
    assert n > 5000


def test_pbf_listing_empty_landing_dir_is_not_an_error(spark, tmp_path):
    """A landing directory polled BETWEEN file drops holds zero PBFs —
    an ingest loop must see files=0, not crash (the r4 raise-on-empty
    was meant for glob typos, where it still fires)."""
    import pytest

    from pydriosm_spark.sources import pbf

    d = tmp_path / "landing"
    d.mkdir()
    assert pbf.pbf_validate(spark, str(d)).count() == 0
    # a glob matching nothing still raises (typo'd pattern)
    with pytest.raises(Exception, match="[Nn]o PBF files|does not exist|PATH_NOT_FOUND"):
        pbf._pbf_listing(spark, str(tmp_path / "nope" / "*.pbf")).count()
