"""Per-partition checkpointed writes with lineage + row-count metrics,
resumable idempotently.

The reference's ancestor of this contract is its chunk-wise append import
with ``if_exists`` fail/replace/append semantics and its pickle-cache
short-circuit (/root/reference/pydriosm/ios/_ios.py:1026-1143,
/root/reference/pydriosm/reader/_reader.py:358-362): work already
materialized is never recomputed.  Here the unit of commit is a
*partition* of the output table:

* data lands under ``<base>/data/<part_col>=<value>/`` (Hive layout),
* a manifest line ``{partition, rows, committed_at_run}`` is appended to
  ``<base>/_manifest.jsonl`` only after the partition's files are fully
  written — the manifest is the source of truth,
* on resume, committed partitions are skipped; partitions that were
  mid-write when the job died are **rewritten whole** (dynamic partition
  overwrite), so the final state is identical to a single clean run.

On a real deployment the manifest role is played by Iceberg's snapshot
commit (``overwritePartitions``) and the lineage table by the snapshot
summary; this module keeps the same commit protocol over plain parquet
so it runs anywhere.  Lineage rows double as the per-partition metrics
feed (row counts per stage per partition).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class CommitResult:
    written_partitions: list
    skipped_partitions: list
    rows_written: int


class PartitionedCheckpoint:
    def __init__(self, base_dir: str, partition_col: str):
        self.base = base_dir
        self.col = partition_col
        self.data_dir = os.path.join(base_dir, "data")
        self.manifest_path = os.path.join(base_dir, "_manifest.jsonl")
        os.makedirs(self.data_dir, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    def committed(self) -> dict:
        """partition value (as str) -> manifest entry."""
        out = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    if line.strip():
                        e = json.loads(line)
                        out[str(e["partition"])] = e
        return out

    def _append_manifest(self, entries: list[dict]) -> None:
        with open(self.manifest_path, "a") as f:
            for e in entries:
                f.write(json.dumps(e) + "\n")

    # -- write -------------------------------------------------------------
    def run(
        self,
        df: DataFrame,
        run_id: str = "run",
        fail_after: int | None = None,
    ) -> CommitResult:
        """Write every not-yet-committed partition of ``df``; skip
        committed ones.  ``fail_after`` aborts after N partition commits
        (test hook simulating a mid-job crash).

        Partitions are committed one Spark job each — the commit
        granularity the resume contract requires (at scale each "job"
        is one Iceberg partition overwrite; batching several partitions
        per commit is a trivial extension).
        """
        spark = df.sparkSession
        done = self.committed()
        values = [
            r[0]
            for r in df.select(self.col).distinct().orderBy(self.col).collect()
        ]
        # A NULL partition value would silently vanish (filter(col == NULL)
        # matches nothing) while the manifest committed 'None' with rows=0 —
        # breaking the "resume state identical to a clean run" contract.
        # Reject up front; callers must map nulls to a sentinel themselves.
        if any(v is None for v in values):
            raise ValueError(
                f"partition column {self.col!r} contains NULL values; "
                "map them to an explicit sentinel before checkpointing"
            )
        skipped = [v for v in values if str(v) in done]
        todo = [v for v in values if str(v) not in done]

        written, rows_total = [], 0
        df = df.cache()
        try:
            for i, v in enumerate(todo):
                if fail_after is not None and i >= fail_after:
                    raise RuntimeError(f"injected failure after {fail_after} partitions")
                part_dir = os.path.join(self.data_dir, f"{self.col}={v}")
                part_df = df.filter(F.col(self.col) == F.lit(v)).drop(self.col)
                # overwrite => a partition half-written by a dead run is
                # replaced wholesale; idempotent by construction
                part_df.write.mode("overwrite").parquet(part_dir)
                n = spark.read.parquet(part_dir).count()  # read-back verify
                self._append_manifest(
                    [{"partition": str(v), "rows": n, "committed_at_run": run_id}]
                )
                written.append(v)
                rows_total += n
        finally:
            df.unpersist()
        return CommitResult(written, skipped, rows_total)

    def drop(self, partitions=None) -> list:
        """Drop partitions (data + manifest entries) — the engine's DDL
        analogue of the reference's cascade table drops
        (/root/reference/pydriosm/ios/_ios.py:1780-2009).  ``None`` drops
        everything.  Returns the dropped partition values."""
        import shutil

        done = self.committed()
        targets = list(done) if partitions is None else [str(p) for p in partitions]
        dropped = []
        for v in targets:
            if v not in done:
                continue
            shutil.rmtree(os.path.join(self.data_dir, f"{self.col}={v}"), ignore_errors=True)
            dropped.append(v)
        keep = [e for k, e in done.items() if k not in set(dropped)]
        with open(self.manifest_path, "w") as f:
            for e in keep:
                f.write(json.dumps(e) + "\n")
        return dropped

    # -- read --------------------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.option("basePath", self.data_dir).parquet(
            *[
                os.path.join(self.data_dir, f"{self.col}={v}")
                for v in self.committed()
            ]
        )

    def lineage(self, spark: SparkSession) -> DataFrame:
        """The lineage/metrics sidecar as a DataFrame."""
        rows = [
            (e["partition"], e["rows"], e["committed_at_run"])
            for e in self.committed().values()
        ]
        return spark.createDataFrame(
            rows, f"{self.col} string, rows long, committed_at_run string"
        )
