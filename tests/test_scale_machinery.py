"""Scale machinery: salted shuffle join equivalence, checkpoint/resume
idempotency + lineage, streaming/batch equivalence."""

import pandas as pd
import pytest

from pydriosm_spark.functions import extract
from pydriosm_spark.operators.spatial_join import spatial_join_points_polygons
from pydriosm_spark.plans.checkpoint import PartitionedCheckpoint
from pydriosm_spark.sources import synth
from pydriosm_spark.streaming.windowed import run_stream_available_now, windowed_event_counts
from tests.conftest import SF_SMOKE


def _canon(df):
    p = df.toPandas()
    return p[sorted(p.columns)].sort_values(sorted(p.columns), ignore_index=True)


def test_salted_shuffle_join_equals_broadcast(spark):
    m = extract.extract_mentions(synth.webpages(spark, SF_SMOKE))
    zones = synth.zone_features()
    a = spatial_join_points_polygons(spark, m, zones, res=17, mode="broadcast")
    b = spatial_join_points_polygons(
        spark, m, zones, res=17, mode="shuffle_salted", target_rows_per_task=50
    )  # tiny target => salting actually engages on this data
    pd.testing.assert_frame_equal(_canon(a), _canon(b), check_dtype=False)


def test_checkpoint_resume_idempotent(spark, tmp_path):
    from pyspark.sql import functions as F

    m = extract.extract_mentions(synth.webpages(spark, SF_SMOKE)).withColumn(
        "part", F.col("doc_id") % 8
    )
    base = str(tmp_path / "ckpt")
    ck = PartitionedCheckpoint(base, "part")

    # first run dies after 3 partition commits
    with pytest.raises(RuntimeError, match="injected failure"):
        ck.run(m, run_id="r1", fail_after=3)
    committed_after_crash = set(ck.committed())
    assert len(committed_after_crash) == 3

    # resume: completes the rest, touches nothing already committed
    n_parts = m.select("part").distinct().count()
    res = ck.run(m, run_id="r2")
    assert {str(v) for v in res.skipped_partitions} == committed_after_crash
    assert len(res.written_partitions) == n_parts - 3

    # a third run is a full no-op
    res3 = ck.run(m, run_id="r3")
    assert res3.written_partitions == [] and res3.rows_written == 0

    # final state == the input, and lineage row counts match the data
    got = _canon(ck.read(spark).drop("part"))
    want = _canon(m.drop("part"))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    lineage = ck.lineage(spark).toPandas()
    assert int(lineage["rows"].sum()) == len(want)
    assert set(lineage["committed_at_run"]) == {"r1", "r2"}


def test_streaming_matches_batch(spark, tmp_path):
    import shutil

    # the streaming file source wants a directory of files
    events_dir = tmp_path / "events_stream"
    events_dir.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", events_dir / "part-0.parquet")
    events = str(events_dir)
    run_stream_available_now(spark, events, str(tmp_path / "sckpt"), "stream_windows_t")
    got = _canon(spark.sql("select * from stream_windows_t"))
    want = _canon(windowed_event_counts(spark.read.parquet(events)))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)