"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline (pure JVM-side
`aggregate`/`zip_with` — no Python in the hot path), plus an LSH
(random-hyperplane) bucketed variant as the 100 TB scale path: buckets
shrink the candidate set from all-pairs to per-bucket, the rerank is
the same JVM cosine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn(
        "_norm",
        F.sqrt(
            F.aggregate(
                vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
            )
        ),
    )


def cosine_col(a_col: str, b_col: str, na_col: str, nb_col: str):
    return _dot(F.col(a_col), F.col(b_col)) / (F.col(na_col) * F.col(nb_col))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast queries, JVM-side dot
    products, ranking window with deterministic (score desc, id asc)
    tie-break. Self-matches excluded."""
    base = with_norm(embeddings, vec_col).select(
        F.col(id_col).alias("item_id"),
        F.col(vec_col).cast("array<double>").alias("item_vec"),
        F.col("_norm").alias("item_norm"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
        F.col("_norm").alias("q_norm"),
    )
    scored = base.crossJoin(F.broadcast(q)).filter(
        F.col("item_id") != F.col("query_id")
    ).withColumn(
        "cosine",
        F.round(
            _dot(F.col("q_vec"), F.col("item_vec")) / (F.col("q_norm") * F.col("item_norm")),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("item_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "item_id", "cosine")
    )


def hyperplane_signatures(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket per vector (sign bits packed to int).
    Deterministic planes from a seeded RNG, broadcast in the closure."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim)).astype(np.float64)

    def kernel(batches):
        for pdf in batches:
            mat = np.stack([np.asarray(v, np.float64) for v in pdf[vec_col]])
            bits = (mat @ planes.T) > 0
            bucket = np.zeros(len(pdf), np.int64)
            for i in range(n_planes):
                bucket |= bits[:, i].astype(np.int64) << i
            yield pd.DataFrame({id_col: pdf[id_col], "bucket": bucket})

    return embeddings.select(id_col, vec_col).mapInPandas(
        kernel, f"{id_col} long, bucket long"
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 10,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: multi-table hyperplane LSH candidate union + exact
    cosine rerank. Recall < 1 by design; the scale path when a
    broadcast cross join is no longer feasible."""
    cands = None
    for t in range(n_tables):
        sig_e = hyperplane_signatures(embeddings, dim, n_planes, seed=100 + t, id_col=id_col, vec_col=vec_col)
        sig_q = hyperplane_signatures(queries, dim, n_planes, seed=100 + t, id_col=id_col, vec_col=vec_col)
        c = sig_e.withColumnRenamed(id_col, "item_id").join(
            sig_q.withColumnRenamed(id_col, "query_id"), "bucket"
        ).select("query_id", "item_id")
        cands = c if cands is None else cands.unionByName(c)
    cands = cands.filter(F.col("query_id") != F.col("item_id")).distinct()

    base = with_norm(embeddings, vec_col).select(
        F.col(id_col).alias("item_id"),
        F.col(vec_col).cast("array<double>").alias("item_vec"),
        F.col("_norm").alias("item_norm"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
        F.col("_norm").alias("q_norm"),
    )
    scored = cands.join(base, "item_id").join(F.broadcast(q), "query_id").withColumn(
        "cosine",
        F.round(
            _dot(F.col("q_vec"), F.col("item_vec")) / (F.col("q_norm") * F.col("item_norm")),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("item_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "item_id", "cosine")
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup pass).
    Small-scale exact implementation (self cross join); the LSH bucket
    prefilter above is the drop-in at scale."""
    base = with_norm(embeddings, vec_col).select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("va"),
        F.col("_norm").alias("na"),
    )
    other = with_norm(embeddings, vec_col).select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("vb"),
        F.col("_norm").alias("nb"),
    )
    return (
        base.join(other, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
