"""Property test for the claim every ANN oracle rests on: kernel-side
numpy quantization (`similarity._qmat`) is bit-equal to the SQL
`round(x * QUANT)` form in BOTH engines, for arbitrary float32 inputs
including exact .5 boundaries, negatives, zeros, and denormal-ish
values."""

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from pydriosm_spark.operators.similarity import QUANT, _qmat, quantize_sql


def _duck_quant(vals: list) -> list:
    con = duckdb.connect()
    try:
        expr = quantize_sql("v", "duckdb")
        return con.execute(
            f"SELECT {expr} FROM (SELECT ?::FLOAT[] AS v)", [vals]
        ).fetchone()[0]
    finally:
        con.close()


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1.0, max_value=1.0, allow_nan=False, width=32
        ),
        min_size=1,
        max_size=16,
    )
)
def test_qmat_equals_duckdb_quantization(vals):
    f32 = np.array(vals, dtype=np.float32)
    ours = _qmat(pd.Series([f32]))[0].tolist()
    duck = [int(x) for x in _duck_quant([float(v) for v in f32])]
    assert ours == duck, (vals, ours, duck)


def test_qmat_exact_half_boundaries():
    """Values whose product with QUANT is exactly k + 0.5 must round
    half-away in both paths."""
    # 2.5e-6 * 1e6 = 2.5 exactly (2.5e-6 is a dyadic-scaled value? use
    # values constructed so v * QUANT hits .5 exactly in float64)
    vals = np.array([3.5 / QUANT, -3.5 / QUANT, 0.5 / QUANT, -0.5 / QUANT], dtype=np.float32)
    # float32 rounding of the inputs is applied identically to both paths
    ours = _qmat(pd.Series([vals]))[0].tolist()
    duck = [int(x) for x in _duck_quant([float(v) for v in vals])]
    assert ours == duck
