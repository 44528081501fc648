"""IVF-PQ: product-quantized approximate nearest neighbour — the
memory-scale path of the ANN family (brute force / LSH / IVF / IVF-PQ).

At 10^12 embeddings the raw vectors (64 x float32 = 256 B) cannot stay
hot; product quantization stores 8 one-byte-ish codes per vector (32x
compression here: 8 subspaces x 16 centroids) and scores candidates
with an asymmetric-distance (ADC) table lookup — 8 adds per pair
instead of a 64-dim dot product, against state that fits in memory.

Everything after codebook training runs in EXACT INTEGER arithmetic:
vectors and centroids are quantized to a fixed-point grid
(floor(x * SCALE + 0.5), SCALE = 10^6), so subspace distances, code
assignment (argmin, ties to the lowest code), and ADC sums are
associative bigint math — partition-order invariant and bit-identical
between Spark and the DuckDB oracle.  A float PQ would tie-break codes
on the last ulp of a dot product and could never be hash-verified.

Scale notes:
  * Training is the standard IVF recipe: quantizer fitted driver-side
    on a bounded deterministic sample (lowest ids), broadcast as plain
    Python constants into the Arrow kernels.
  * Encoding is one map-only Arrow pass; the code table it emits is
    the only state the search needs (plus the tiny codebook).
  * Search: coarse-cluster candidate join (reusing the IVF kernels),
    then a JVM-side aggregate over the per-query lookup table — no
    Python in the scoring hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _spread
from .similarity import _assign_clusters, train_ivf_centroids

SCALE = 10**6


def _quantize(x: np.ndarray) -> np.ndarray:
    """Fixed-point grid: floor(x * SCALE + 0.5) as int64 — the same
    expression the oracle uses (FLOOR is identical everywhere;
    round-half-even vs half-away never enters)."""
    return np.floor(np.asarray(x, np.float64) * SCALE + 0.5).astype(np.int64)


def _seq_norm(x: np.ndarray) -> np.ndarray:
    """Row norms via an explicit LEFT FOLD over dimensions.  On unit
    vectors ADC's L2^2 is 2 - 2*cos, so normalizing first makes the PQ
    ranking track the cosine baseline — but the norm is a float
    reduction, and numpy's pairwise summation orders it differently
    from DuckDB's list_reduce; a last-ulp difference here could flip a
    FLOOR grid cell.  Folding left-to-right on both engines makes every
    intermediate IEEE-identical."""
    acc = np.zeros(len(x), np.float64)
    for j in range(x.shape[1]):
        acc = acc + x[:, j] * x[:, j]
    return np.maximum(np.sqrt(acc), 1e-12)


def _quantize_unit(x: np.ndarray) -> np.ndarray:
    """Normalize (sequential-fold norm) then snap to the integer grid.
    Operation order matches the oracle exactly: (x / norm) * SCALE."""
    x = np.asarray(x, np.float64)
    xn = x / _seq_norm(x)[:, None]
    return np.floor(xn * SCALE + 0.5).astype(np.int64)


def pq_train_codebook(
    embeddings: DataFrame,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 10,
    sample_rows: int = 20_000,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Per-subspace L2 k-means on the deterministic lowest-id sample,
    then centroids snapped to the integer grid.  Returns int64 array
    (m, ksub, dim/m).  Deterministic: seeded init, fixed iterations —
    both engines share the result as constants."""
    pdf = (
        embeddings.select(id_col, vec_col).orderBy(id_col).limit(sample_rows).toPandas()
    )
    x = np.stack([np.asarray(v, np.float64) for v in pdf[vec_col]])
    return pq_fit_codebook_np(x, m=m, ksub=ksub, n_iter=n_iter, seed=seed)


def pq_fit_codebook_np(
    x: np.ndarray, m: int = 8, ksub: int = 16, n_iter: int = 10, seed: int = 0
) -> np.ndarray:
    """The pure fit, shared by the Spark trainer above and the driver
    oracle (which refits the identical codebook from the same parquet
    sample — the shared-constants pattern of the IVF/semdedup oracles).
    One rng stream across subspaces: the s-th init consumes the s-th
    choice() call."""
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    x = np.asarray(x, np.float64) / _seq_norm(np.asarray(x, np.float64))[:, None]
    rng = np.random.default_rng(seed)
    books = []
    for s in range(m):
        sub = x[:, s * dsub : (s + 1) * dsub]
        cent = sub[rng.choice(len(sub), size=ksub, replace=False)].copy()
        for _ in range(n_iter):
            d = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(ksub):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books.append(_quantize(cent))
    return np.stack(books)  # (m, ksub, dsub) int64


def _sq_dists_int(sub: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Exact integer squared distances (rows, ksub); accumulation order
    is irrelevant for integers, so plain einsum-free numpy is fine."""
    diff = sub[:, None, :] - cents[None, :, :]
    return (diff * diff).sum(axis=2)


def pq_encode(
    embeddings: DataFrame,
    codebook: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec) -> (id, codes array<int>): one map-only Arrow pass.
    codes[s] = argmin over the subspace codebook of the exact integer
    squared distance, ties to the lowest code."""
    m, ksub, dsub = codebook.shape
    cb = codebook  # captured

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            xi = _quantize_unit(
                np.stack([np.asarray(v, np.float64) for v in pdf[vec_col]])
            )
            codes = np.empty((len(pdf), m), np.int32)
            for s in range(m):
                d = _sq_dists_int(xi[:, s * dsub : (s + 1) * dsub], cb[s])
                codes[:, s] = d.argmin(axis=1)  # first occurrence = lowest code
            yield pd.DataFrame({id_col: pdf[id_col], "codes": list(codes.tolist())})

    return _spread(embeddings.select(id_col, vec_col)).mapInPandas(
        kernel, f"{id_col} long, codes array<int>"
    )


def _query_luts(
    queries: DataFrame, codebook: np.ndarray, id_col: str, vec_col: str
) -> DataFrame:
    """(id, vec) -> (query_id, lut array<array<long>>): the ADC lookup
    table, lut[s][c] = integer squared distance from the query's s-th
    subvector to codebook[s][c].  m*ksub longs per query — broadcast
    state."""
    m, ksub, dsub = codebook.shape
    cb = codebook

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            xi = _quantize_unit(
                np.stack([np.asarray(v, np.float64) for v in pdf[vec_col]])
            )
            luts = []
            for r in range(len(pdf)):
                lut = [
                    _sq_dists_int(xi[r : r + 1, s * dsub : (s + 1) * dsub], cb[s])[0]
                    .astype(np.int64)
                    .tolist()
                    for s in range(m)
                ]
                luts.append(lut)
            yield pd.DataFrame({"query_id": pdf[id_col], "lut": luts})

    return queries.select(id_col, vec_col).mapInPandas(
        kernel, "query_id long, lut array<array<long>>"
    )


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    codebook: np.ndarray | None = None,
) -> DataFrame:
    """IVF-PQ ANN top-k: coarse-cluster candidate generation (the IVF
    probe join), then ADC scoring — a JVM aggregate doing m table
    lookups per candidate pair over the broadcast per-query LUTs; the
    raw vectors are never touched after encoding.  Returns
    (query_id, rank, item_id, adc_dist), adc_dist ascending (it is a
    squared distance in grid units), ties to the lowest item_id."""
    if centroids is None:
        centroids = train_ivf_centroids(
            embeddings, n_clusters, vec_col=vec_col, id_col=id_col
        )
    if codebook is None:
        codebook = pq_train_codebook(
            embeddings, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col
        )
    items = _assign_clusters(embeddings, centroids, 1, id_col, vec_col, "item_id")
    probes = _assign_clusters(queries, centroids, nprobe, id_col, vec_col, "query_id")
    cands = (
        probes.join(items, "cluster")
        .filter(F.col("query_id") != F.col("item_id"))
        .select("query_id", "item_id")
        .distinct()
    )
    codes = pq_encode(embeddings, codebook, id_col, vec_col).withColumnRenamed(
        id_col, "item_id"
    )
    luts = _query_luts(queries, codebook, id_col, vec_col)
    mm = codebook.shape[0]
    scored = (
        cands.join(codes, "item_id")
        .join(F.broadcast(luts), "query_id")
        .withColumn(
            "adc_dist",
            F.expr(
                f"aggregate(sequence(0, {mm - 1}), 0L, (acc, s) -> acc + lut[s][codes[s]])"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("item_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "item_id", "adc_dist")
    )


def _sql_bigint_list(v) -> str:
    return "[" + ", ".join(str(int(x)) for x in v) + "]"


def ivfpq_oracle_sql(
    coarse: np.ndarray,
    codebook: np.ndarray,
    n_queries: int = 10,
    k: int = 5,
    nprobe: int = 4,
) -> str:
    """DuckDB replica of ivfpq_topk: the coarse centroids (DOUBLE[]) and
    the integer codebook (BIGINT[]) are embedded as literals; DuckDB
    independently recomputes item/probe assignment, the integer code
    assignment (ROW_NUMBER over (dist, code) == numpy argmin first
    tie), and the ADC sum by direct subspace distances — arithmetic
    identical to the LUT lookups because both ARE
    sqdist(q_sub, codebook[s][code])."""
    m, ksub, dsub = codebook.shape
    cvals = ",\n".join(
        f"({c}, CAST({_sql_double_list(coarse[c])} AS DOUBLE[]))"
        for c in range(len(coarse))
    )
    bvals = ",\n".join(
        f"({s}, {c}, CAST({_sql_bigint_list(codebook[s][c])} AS BIGINT[]))"
        for s in range(m)
        for c in range(ksub)
    )
    return f"""
WITH cents(cluster, cv) AS (VALUES
{cvals}),
cb(s, c, bv) AS (VALUES
{bvals}),
emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
xi AS (
  -- unit-normalize with a LEFT-FOLD norm (list_reduce), the same
  -- order _seq_norm accumulates in — see that docstring
  SELECT vec_id,
         list_transform(v, x -> CAST(FLOOR(x / nrm * {SCALE} + 0.5) AS BIGINT))
           AS iv
  FROM (SELECT vec_id, v,
               GREATEST(SQRT(list_reduce(
                   list_prepend(0.0, list_transform(v, y -> y * y)),
                   (a, b) -> a + b)), 1e-12) AS nrm
        FROM emb)),
sims AS (
  SELECT e.vec_id, c.cluster, list_dot_product(e.v, c.cv) AS sim
  FROM emb e CROSS JOIN cents c),
item_assign AS (
  SELECT vec_id AS item_id, cluster FROM (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, cluster) AS rn
    FROM sims) WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, cluster FROM (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, cluster) AS rn
    FROM sims WHERE vec_id < {n_queries}) WHERE rn <= {nprobe}),
cands AS (
  SELECT DISTINCT p.query_id, i.item_id
  FROM probes p JOIN item_assign i ON p.cluster = i.cluster
  WHERE i.item_id != p.query_id),
subdist AS (
  SELECT x.vec_id, b.s, b.c,
         CAST(list_sum(list_transform(range(1, {dsub} + 1),
              j -> (x.iv[b.s * {dsub} + j] - b.bv[j])
                 * (x.iv[b.s * {dsub} + j] - b.bv[j]))) AS BIGINT) AS d
  FROM xi x CROSS JOIN cb b),
enc AS (
  SELECT vec_id AS item_id, s, c AS code FROM (
    SELECT vec_id, s, c,
           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn
    FROM subdist) WHERE rn = 1),
adc AS (
  SELECT ca.query_id, ca.item_id, CAST(SUM(qd.d) AS BIGINT) AS adc_dist
  FROM cands ca
  JOIN enc e ON e.item_id = ca.item_id
  JOIN subdist qd ON qd.vec_id = ca.query_id AND qd.s = e.s AND qd.c = e.code
  GROUP BY ca.query_id, ca.item_id),
r AS (
  SELECT query_id, item_id, adc_dist,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adc_dist ASC, item_id ASC) AS rank
  FROM adc)
SELECT query_id, rank, item_id, adc_dist FROM r WHERE rank <= {k}
ORDER BY query_id, rank
"""


def _sql_double_list(v) -> str:
    return "[" + ", ".join(repr(float(x)) for x in v) + "]"
