"""SQL surface parity: every SQL-defined function equals the engine's
own kernels/builders on the same inputs, and a full spatial query runs
in PURE spark.sql through them."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pydriosm_spark.cells import quadcell
from pydriosm_spark.functions import text as T
from pydriosm_spark.functions.naming import sanitize_table_name
from pydriosm_spark.sqlfns import register_sql_functions


@pytest.fixture(scope="module")
def sqlfns(spark):
    names = register_sql_functions(spark)
    assert "qc_cell" in names and "osm_langid" in names
    return spark


def test_qc_cell_matches_kernel_and_builder(sqlfns):
    spark = sqlfns
    rng = np.random.RandomState(3)
    pts = [(float(lon), float(lat)) for lon, lat in
           zip(rng.uniform(-180, 180, 200), rng.uniform(-90, 90, 200))]
    pts += [(-180.0, -90.0), (180.0, 90.0), (0.0, 0.0), (179.9999999, 89.9999999)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    df.createOrReplaceTempView("pts")
    for res in (0, 5, 14, 17, 29):
        got = [r["c"] for r in spark.sql(
            f"SELECT qc_cell(lon, lat, {res}) AS c FROM pts").collect()]
        want_np = [int(quadcell.cell_id(lon, lat, res)) for lon, lat in pts]
        want_expr = [r["c"] for r in df.select(
            F.expr(quadcell.cell_expr("lon", "lat", res)).alias("c")).collect()]
        assert got == want_np == want_expr, res


def test_qc_components_parent_bounds(sqlfns):
    spark = sqlfns
    rng = np.random.RandomState(5)
    cells = [int(quadcell.cell_id(float(lon), float(lat), 17)) for lon, lat in
             zip(rng.uniform(-180, 180, 100), rng.uniform(-90, 90, 100))]
    df = spark.createDataFrame([(c,) for c in cells], "cell bigint")
    df.createOrReplaceTempView("cells")
    rows = spark.sql(
        "SELECT cell, qc_res(cell) r, qc_x(cell) x, qc_y(cell) y, "
        "qc_parent(cell, 12) p, qc_bounds(cell) b FROM cells"
    ).collect()
    for r in rows:
        c = r["cell"]
        assert r["r"] == int(quadcell.cell_res(c))
        x, y = quadcell.cell_xy(c)
        assert (r["x"], r["y"]) == (int(x), int(y))
        assert r["p"] == int(quadcell.parent(c, 12))
        b = quadcell.cell_bounds(c)
        got_b = (r["b"]["min_lon"], r["b"]["min_lat"], r["b"]["max_lon"], r["b"]["max_lat"])
        assert got_b == tuple(float(v) for v in b)


def test_text_functions_match_python_rules(sqlfns):
    spark = sqlfns
    docs = [
        "the quick brown fox, and the lazy dog!",
        "der hund und die katze ist hier",
        "  spaced   out\ttabs\nand newlines  ",
        "numbers 123 and sym#bols %done",
    ]
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    df.createOrReplaceTempView("docs")
    rows = spark.sql(
        "SELECT text, osm_ntokens(text) nt, osm_bpe_tokens(text) bp, "
        "osm_fingerprint(text) fp, osm_langid(text) lang FROM docs"
    ).collect()
    want = df.select(
        "text",
        F.expr(f"CAST({T.ntokens_sql('text', 'spark')} AS BIGINT)").alias("nt"),
        F.expr(f"CAST({T.bpe_token_count_sql('text', 'spark')} AS BIGINT)").alias("bp"),
        F.expr(T.fingerprint_sql("text", "spark")).alias("fp"),
        F.expr(T.langid_sql("text", "spark")).alias("lang"),
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, want))
    assert {r["lang"] for r in rows} >= {"en", "de"}


def test_osm_slug_matches_python(sqlfns):
    spark = sqlfns
    names = [
        "Isle of Man", "bad/chars:here!", "  many   spaces  ",
        "x" * 80, ("word " * 20).strip(),
    ]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    df.createOrReplaceTempView("names")
    got = {r["name"]: r["s"] for r in
           spark.sql("SELECT name, osm_slug(name) s FROM names").collect()}
    for n in names:
        assert got[n] == sanitize_table_name(n), n


def test_pure_sql_spatial_join(sqlfns):
    """The flagship join shape written entirely in spark.sql: points get
    qc_cell ids, a cell-keyed zone cover joins on equality — the
    ST_Contains-as-cover-join rewrite SURVEY §7 deferred, expressed by a
    user directly with the SQL vocabulary (no DataFrame code)."""
    spark = sqlfns
    # 3 zone cells at res 8 and points inside/outside them
    zone_pts = [(10.2, 20.6, 1), (10.9, 20.8, 1), (-50.5, -30.5, 2)]
    out_pts = [(120.0, 60.0,), (-120.0, 0.0,)]
    spark.createDataFrame(
        [(float(a), float(b)) for a, b, *_ in zone_pts] + list(out_pts),
        "lon double, lat double",
    ).createOrReplaceTempView("pp")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW zones AS "
        "SELECT qc_cell(10.5, 20.5, 8) AS cell, 1 AS zone_id "
        "UNION ALL SELECT qc_cell(-50.5, -30.5, 8), 2"
    )
    got = spark.sql(
        "SELECT z.zone_id, count(*) AS n FROM pp "
        "JOIN zones z ON qc_cell(pp.lon, pp.lat, 8) = z.cell "
        "GROUP BY z.zone_id ORDER BY z.zone_id"
    ).collect()
    # res-8 cells are 1.4 x 0.7 degrees: both zone-1 points share the
    # (10.5, 20.5) cell, the zone-2 point its own; outsiders drop
    assert [(r["zone_id"], r["n"]) for r in got] == [(1, 2), (2, 1)]
    # and the whole thing stays JVM-side
    p = spark.sql(
        "SELECT qc_cell(lon, lat, 8) c FROM pp"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in p and "BatchEvalPython" not in p


def test_qc_children_matches_kernel(sqlfns):
    spark = sqlfns
    cells = [int(quadcell.cell_id(lon, lat, r)) for lon, lat, r in
             [(-0.5, 52.6, 14), (10.0, -30.0, 5), (0.0, 0.0, 0)]]
    df = spark.createDataFrame([(c,) for c in cells], "cell bigint")
    df.createOrReplaceTempView("cc")
    rows = spark.sql("SELECT cell, qc_children(cell) AS kids FROM cc").collect()
    for r in rows:
        assert sorted(r["kids"]) == sorted(quadcell.children(r["cell"]))
        # children are one resolution finer and parent back to the cell
        # (SQL UDFs can't sit directly under Generate — materialize the
        # array in a subquery first, then explode the column)
        back = spark.sql(
            f"SELECT qc_parent(k, CAST(qc_res({r['cell']}) AS INT)) p "
            f"FROM (SELECT qc_children({r['cell']}) AS kids) "
            f"LATERAL VIEW explode(kids) t AS k"
        ).collect()
        assert {x["p"] for x in back} == {r["cell"]}
