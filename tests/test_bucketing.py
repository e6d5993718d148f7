"""Bucketed co-located joins: pre-bucketing both sides of a recurring
join key eliminates the per-query shuffle — the storage-layout lever the
engine prescribes for repeated large-large joins at 100 TB (e.g. mention
x mention self-joins, or joining two mention-derived tables on doc key).
"""

import pytest


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("wh")
    from pydriosm_spark.functions import extract
    from pydriosm_spark.sources import synth
    from tests.conftest import SF_SMOKE

    m = extract.extract_mentions(synth.webpages(spark, SF_SMOKE))
    (
        m.write.format("parquet")
        .bucketBy(8, "doc_id")
        .sortBy("doc_id")
        .option("path", str(wh / "mentions_bucketed"))
        .mode("overwrite")
        .saveAsTable("mentions_bucketed")
    )
    (
        m.groupBy("doc_id")
        .count()
        .write.format("parquet")
        .bucketBy(8, "doc_id")
        .option("path", str(wh / "doc_counts_bucketed"))
        .mode("overwrite")
        .saveAsTable("doc_counts_bucketed")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS mentions_bucketed")
    spark.sql("DROP TABLE IF EXISTS doc_counts_bucketed")


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try:
        j = spark.table("mentions_bucketed").join(
            spark.table("doc_counts_bucketed"), "doc_id"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan  # co-located: no shuffle
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))


def test_unbucketed_join_shuffles_for_contrast(spark, warehouse):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("mentions_bucketed").repartition(4)  # strip bucketing info
        b = spark.table("doc_counts_bucketed").repartition(4)
        plan = a.join(b, "doc_id")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))