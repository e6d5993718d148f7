"""Golden-file regression gate (FIXTURES.md §5): canonical outputs of the
headline queries at sf0.001, materialized from the independent DuckDB
oracle and committed to the repo.  Guards against silent semantic drift
across rounds — any change to the frozen synthesis constants or operator
semantics trips this immediately.

Regenerate (only after an intentional semantic change):
    python tests/test_golden.py regen
"""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_SMOKE  # noqa: E402
from tests.oracle_util import canon, duck_conn  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
GOLDEN_QUERIES = [
    "extract_mentions",
    "tile_assign",
    "spatial_join_zones",
    "knn_ring",
    "rasterize",
    "layer_geojson_wkt",
    "dedup_minhash_lsh",
    "text_profile",
]


def _oracle_frames():
    from pydriosm_spark import queries as Q

    reg = Q.registry()
    con = duck_conn(SF_SMOKE)
    try:
        for name in GOLDEN_QUERIES:
            _fn, sql = reg[name]
            yield name, canon(con.execute(sql).df())
    finally:
        con.close()


def regen():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, df in _oracle_frames():
        df.to_parquet(os.path.join(GOLDEN_DIR, f"{name}.parquet"), index=False)
        print(f"wrote {name}: {len(df)} rows")


@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_spark_output_matches_committed_golden(spark, name):
    from pydriosm_spark import queries as Q

    path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
    assert os.path.exists(path), f"golden missing — run `python tests/test_golden.py regen`"
    want = pd.read_parquet(path)
    fn, _sql = Q.registry()[name]
    got = canon(fn(spark, SF_SMOKE).toPandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        regen()