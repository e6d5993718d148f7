"""Similarity search over embedding columns (`array<float>`).

* ``cosine_topk_bruteforce`` — exact top-k neighbors: the embedding
  index is broadcast as one numpy matrix; queries stream through
  ``mapInPandas`` and each Arrow batch does a single BLAS matmul.
  This is the right plan while the *index* side fits an executor
  (~10^6 x 64 floats = 256 MB); the query side scales without bound.

* ``cosine_topk_lsh`` — the scale path: random-hyperplane LSH buckets
  (deterministic integer planes), candidates = bucket collisions across
  any of ``n_tables`` rotated plane sets, exact re-rank of candidates.
  Recall < 1 by construction; verified against brute force in tests
  (the driver records a rows-only check for it).

At 10^12-scale the LSH variant shards the index by bucket and co-
partitions queries by the same bucket fn — a shuffle-light equi-join;
brute force remains the per-bucket re-rank kernel.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_PLANES = 6
N_TABLES = 8


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def cosine_topk_bruteforce(
    spark: SparkSession,
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs exact top-k (self excluded): (vec_id, rank, neighbor_id)."""
    pdf = emb.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = _norm_rows(np.array(pdf[vec_col].tolist(), dtype=np.float64))
    bc = spark.sparkContext.broadcast((ids, mat))

    schema = f"{id_col} long, rank long, neighbor_id long"

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bids, bmat = bc.value
        order = np.argsort(bids, kind="stable")
        sids, smat = bids[order], bmat[order]
        for pdf_b in batches:
            q_ids = pdf_b[id_col].to_numpy()
            q = _norm_rows(np.array(pdf_b[vec_col].tolist(), dtype=np.float64))
            sims = q @ smat.T  # one BLAS call per Arrow batch
            out_id, out_rank, out_nb = [], [], []
            for r in range(sims.shape[0]):
                row = sims[r]
                mask = sids != q_ids[r]
                cand_ids = sids[mask]
                cand_sims = row[mask]
                # sort by (-sim, neighbor_id): deterministic tie-break
                idx = np.lexsort((cand_ids, -cand_sims))[:k]
                out_id.extend([q_ids[r]] * len(idx))
                out_rank.extend(range(1, len(idx) + 1))
                out_nb.extend(cand_ids[idx])
            yield pd.DataFrame(
                {id_col: out_id, "rank": out_rank, "neighbor_id": out_nb}
            )

    return emb.select(id_col, vec_col).mapInPandas(compute, schema)


def _planes(dim: int, table: int) -> np.ndarray:
    """Deterministic integer 'random' hyperplanes (no RNG: reproducible
    across engines/runs)."""
    i = np.arange(N_PLANES)[:, None]
    d = np.arange(dim)[None, :]
    return (((i * 131 + d * 17 + table * 257) % 97) - 48).astype(np.float64)


def lsh_buckets(
    emb: DataFrame, dim: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, table, bucket): sign-pattern bucket per plane table —
    computed natively via aggregate() over the embedding array."""
    out = emb.select(id_col, vec_col)
    buckets = []
    for t in range(N_TABLES):
        P = _planes(dim, t)
        bits = []
        for p in range(N_PLANES):
            coef = ", ".join(f"{c:.1f}D" for c in P[p])
            dot = (
                f"aggregate(zip_with({vec_col}, array({coef}), (a, b) -> CAST(a AS DOUBLE) * b), "
                f"0.0D, (acc, x) -> acc + x)"
            )
            bits.append(f"(CASE WHEN {dot} > 0.0D THEN {1 << p} ELSE 0 END)")
        buckets.append(F.expr("(" + " + ".join(bits) + ")").alias(f"b{t}"))
    wide = out.select(id_col, *buckets)
    tables = F.array(*[F.struct(F.lit(t).alias("table"), F.col(f"b{t}").alias("bucket")) for t in range(N_TABLES)])
    return wide.select(id_col, F.explode(tables).alias("tb")).select(
        id_col, F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket")
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 16,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic Lloyd k-means over the embedding column: centroids
    init by id-stride (no RNG), each iteration = one mapInPandas
    assignment pass (BLAS argmax vs broadcast centroids) + one groupBy
    average.  At 10^9 vectors this is the standard Spark k-means shape;
    here the update step averages driver-side since k is tiny."""
    pdf = emb.select(id_col, vec_col).toPandas().sort_values(id_col, ignore_index=True)
    mat = _norm_rows(np.array(pdf[vec_col].tolist(), dtype=np.float64))
    stride = max(1, len(mat) // k)
    cents = mat[::stride][:k].copy()
    for _ in range(iterations):
        sims = mat @ cents.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = mat[m].mean(axis=0)
        cents = _norm_rows(cents)
    return cents


def cosine_topk_ivf(
    spark: SparkSession,
    emb: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: k-means coarse quantizer -> inverted lists keyed by
    centroid -> each query probes its ``n_probe`` nearest lists ->
    exact re-rank of candidates.  Approximate (recall-gated in tests);
    at scale the lists shard the index and queries co-partition by
    probed list id — an equi-join, never a cross join."""
    import pandas as pd

    cents = kmeans_fit(emb, k=n_lists, id_col=id_col, vec_col=vec_col)
    bc = spark.sparkContext.broadcast(cents)

    assign_schema = f"{id_col} long, list_id int"

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = bc.value
        for b in batches:
            q = _norm_rows(np.array(b[vec_col].tolist(), dtype=np.float64))
            yield pd.DataFrame({id_col: b[id_col], "list_id": np.argmax(q @ C.T, axis=1)})

    probe_schema = f"{id_col} long, list_id int"

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = bc.value
        for b in batches:
            q = _norm_rows(np.array(b[vec_col].tolist(), dtype=np.float64))
            top = np.argsort(-(q @ C.T), axis=1)[:, :n_probe]
            n = len(b)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(b[id_col].to_numpy(), n_probe),
                    "list_id": top.ravel(),
                }
            )

    vecs = emb.select(id_col, vec_col)
    index = vecs.mapInPandas(assign, assign_schema)  # inverted lists
    probes = vecs.mapInPandas(probe, probe_schema).withColumnRenamed(id_col, "qid")

    cand = probes.join(index, "list_id").filter(F.col("qid") != F.col(id_col)).select(
        "qid", F.col(id_col).alias("nid")
    ).distinct()

    qv = vecs.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    nv = vecs.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    scored = cand.join(qv, "qid").join(nv, "nid")
    dot = "aggregate(zip_with(qv, nv, (a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
    nrm = (
        "sqrt(aggregate(transform(qv, a -> CAST(a AS DOUBLE) * CAST(a AS DOUBLE)), 0.0D, (acc, x) -> acc + x)) * "
        "sqrt(aggregate(transform(nv, a -> CAST(a AS DOUBLE) * CAST(a AS DOUBLE)), 0.0D, (acc, x) -> acc + x))"
    )
    scored = scored.withColumn("sim", F.expr(f"{dot} / greatest({nrm}, 1e-300)"))
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias(id_col), "rank", F.col("nid").alias("neighbor_id"))
    )


def cosine_topk_lsh(
    spark: SparkSession,
    emb: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k via LSH candidates + exact re-rank (approximate)."""
    b = lsh_buckets(emb, dim, id_col, vec_col)
    a = b.select(F.col(id_col).alias("qid"), "table", "bucket")
    c = b.select(F.col(id_col).alias("nid"), "table", "bucket")
    cand = a.join(c, ["table", "bucket"]).filter(F.col("qid") != F.col("nid")).select(
        "qid", "nid"
    ).distinct()

    vecs = emb.select(id_col, vec_col)
    qv = vecs.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    nv = vecs.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    scored = cand.join(qv, "qid").join(nv, "nid")

    dot = "aggregate(zip_with(qv, nv, (a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
    nrm = (
        "sqrt(aggregate(transform(qv, a -> CAST(a AS DOUBLE) * CAST(a AS DOUBLE)), 0.0D, (acc, x) -> acc + x)) * "
        "sqrt(aggregate(transform(nv, a -> CAST(a AS DOUBLE) * CAST(a AS DOUBLE)), 0.0D, (acc, x) -> acc + x))"
    )
    scored = scored.withColumn("sim", F.expr(f"{dot} / greatest({nrm}, 1e-300)"))
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias(id_col), "rank", F.col("nid").alias("neighbor_id"))
    )
