"""Differential gate: every registered query vs its DuckDB oracle at
sf0.01 — the same check the driver runs for CORRECTNESS_r{N}.json."""

import pytest

from pydriosm_spark import queries
from tests.oracle_util import compare
from tests.conftest import SF_CORRECT


@pytest.mark.parametrize("name", sorted(queries.registry().keys()))
def test_query_matches_oracle(spark, name):
    fn, sql = queries.registry()[name]
    if sql is None:
        df = fn(spark, SF_CORRECT)
        assert df.count() >= 0
        return
    compare(fn(spark, SF_CORRECT), sql, SF_CORRECT)


def test_coarse_ivf_matches_oracle(spark):
    """The opt-in hierarchical IVF stage-0 (r5) vs its own mirrored
    oracle — not a registry entry (the registry is pinned at the driver
    gate's 50 queries), so the cross-engine proof lives here."""
    from pydriosm_spark import queries_text as QT
    from pydriosm_spark.operators import similarity

    df = similarity.cosine_topk_ivf(
        spark, QT._emb(spark, SF_CORRECT), k=QT.TOPK, coarse=True
    )
    compare(df, QT.oracle_ann_ivf(coarse=True), SF_CORRECT)
    # the aggressive clustered-corpus setting (explicit narrow s_probe)
    # must stay cross-engine exact too — the oracle renders the literal
    df2 = similarity.cosine_topk_ivf(
        spark, QT._emb(spark, SF_CORRECT), k=QT.TOPK, coarse=True, s_probe=2
    )
    compare(df2, QT.oracle_ann_ivf(coarse=True, s_probe=2), SF_CORRECT)
