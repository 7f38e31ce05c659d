"""Similarity search over embedding columns: brute-force cosine top-k and an
LSH-bucketed approximate variant (the scale path).

Embeddings are ``array<float>`` columns; all math runs as JVM higher-order
functions (``zip_with`` / ``aggregate``) — no Python, no collect except the
k-row result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

import numpy as np


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm2(a: Column) -> Column:
    return F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)


def as_double(a: Column) -> Column:
    return F.transform(a, lambda x: x.cast("double"))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id=None,
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector."""
    q = [float(v) for v in query_vec]
    qcol = F.array(*[F.lit(v) for v in q])
    qn = float(np.sqrt(sum(v * v for v in q)))
    e = emb.withColumn("__d", as_double(F.col(vec_col)))
    cos = F.round(_dot(F.col("__d"), qcol) / (F.sqrt(_norm2(F.col("__d"))) * F.lit(qn)), 6)
    out = e.select(id_col, cos.alias("cos_sim"))
    if exclude_id is not None:
        out = out.where(F.col(id_col) != exclude_id)
    return out.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def random_hyperplanes(dim: int, n_planes: int = 16, seed: int = 7) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.normal(0, 1, (n_planes, dim)).tolist()


def with_lsh_bucket(
    emb: DataFrame,
    planes: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-of-projection LSH: bucket = bits of sign(v · plane_i). Vectors in
    the same bucket are cosine-similar with high probability; ANN search then
    only scans the query's bucket (plus optional neighboring buckets)."""
    d = as_double(F.col(vec_col))
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        pcol = F.array(*[F.lit(float(x)) for x in p])
        bit = (_dot(d, pcol) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return emb.withColumn("lsh_bucket", bucket)


def lsh_topk(
    emb_bucketed: DataFrame,
    query_vec: list[float],
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: compute the query's bucket driver-side, scan only that
    bucket (partition-prunable if the table is written partitioned by
    bucket), brute-force within it."""
    q = np.asarray(query_vec, dtype=np.float64)
    bucket = 0
    for i, p in enumerate(planes):
        if float(np.dot(q, np.asarray(p))) > 0:
            bucket |= 1 << i
    cand = emb_bucketed.where(F.col("lsh_bucket") == bucket)
    return cosine_topk(cand, list(map(float, q)), k, id_col, vec_col)
