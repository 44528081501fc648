"""Iterative PageRank over a link graph, in fixed-point integer
arithmetic so the result is bit-reproducible across engines and
partitionings.

Floating-point PageRank sums in-neighbor contributions in partition
order, which varies run to run — the ranks drift in the last ulp and a
cross-engine value-hash gate can never pass.  Scaling the unit mass to
an integer budget (default 10^12) and using only integer multiply /
integer divide makes every iteration an exact, associative recurrence:
Spark at any parallelism, DuckDB, and a single-threaded replay all
produce identical bigint ranks.  (The same trick is what makes
distributed PageRank auditable in production: fixed-point state can be
checksummed across cluster sizes.)

Scale notes:
  * The edge table (with out-degrees attached) is the loop invariant:
    joined once per iteration on src, aggregated on dst.  Both are
    plain hash-shuffle joins/aggs; the dst aggregation combines
    map-side, so a celebrity node with 10^8 in-links costs one partial
    sum per task, not a single hot reducer.
  * Ranks are localCheckpoint-ed each iteration — Pregel-style
    materialization that truncates the 2-joins-per-iteration lineage
    (8 iterations would otherwise stack a 16-join plan).
  * At 10^12 edges the per-iteration shuffles dominate; pre-bucketing
    edges by src (sources/table.py layout rewrite) removes the src-side
    exchange, leaving one shuffle per iteration.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _splitmix, _spread


def synth_citation_edges(
    docs: DataFrame, id_col: str = "doc_id", out_degree: int = 3,
    n: int | None = None,
) -> DataFrame:
    """Deterministic citation graph over contiguous node ids 0..N-1:
    node i links to splitmix64(i*31 + k) mod N for k = 1..out_degree
    (multi-edges and self-loops kept — both engines treat them
    identically).  One map-only Arrow kernel; no shuffle.  Callers that
    already know the node count pass `n` to skip the count job."""
    if n is None:
        n = docs.count()  # driver scalar (a count, not a collect)

    def kernel(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(np.int64).view(np.uint64)
            srcs, dsts = [], []
            with np.errstate(over="ignore"):
                for k in range(1, out_degree + 1):
                    h = _splitmix(ids * np.uint64(31) + np.uint64(k))
                    srcs.append(ids.view(np.int64))
                    dsts.append((h % np.uint64(n)).astype(np.int64))
            yield pd.DataFrame(
                {"src": np.concatenate(srcs), "dst": np.concatenate(dsts)}
            )

    return _spread(docs.select(id_col)).mapInPandas(kernel, "src long, dst long")


def pagerank_fixed_point(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    iters: int = 8,
    total: int = 10**12,
    damp_num: int = 17,
    damp_den: int = 20,
    n: int | None = None,
) -> DataFrame:
    """PageRank after `iters` synchronous iterations, exact fixed-point:

        r_0(v)   = total div N
        r_t+1(v) = (total * (den-num) div den) div N
                   + sum over in-edges (u,v) of
                     ((r_t(u) * num div den) div deg(u))

    All divisions are integer (positive operands, so Spark `div` ==
    DuckDB `//`), every sum is an integer sum — associative, hence
    partition-order invariant.  Dangling nodes (out-degree 0) simply
    leak their damped mass, the standard simplification; total mass is
    then <= `total` but the recurrence stays exact.

    Returns (id_col, rank_fp) — ranks in units of total^-1."""
    if n is None:
        n = nodes.count()
    base = (total * (damp_den - damp_num)) // damp_den // n
    deg = edges.groupBy(src).agg(F.count("*").alias("out_deg"))
    # loop invariant: edges with degree attached, pre-shuffled on src so
    # each iteration's rank join reuses the exchange. A LAZY
    # localCheckpoint (not persist + count): it caches identically on
    # first compute and is reclaimed when the plan is GC'd, but issues
    # no synchronous materialization job — the whole 8-iteration
    # recurrence now executes as ONE job at action time instead of
    # 10 driver-blocking jobs at plan-build time (each job round-trip
    # costs ~100 ms at local[32]; on a cluster, a scheduler barrier).
    edeg = edges.join(deg, src).repartition(F.col(src)).localCheckpoint(
        eager=False
    )
    nodes = nodes.localCheckpoint(eager=False)  # read once, joined 9x

    # pin LongType: total//n can fit int32, and int32 * damp_num would
    # then overflow under ANSI
    ranks = nodes.select(
        F.col(id_col), F.lit(total // n).cast("long").alias("rank_fp")
    )
    contrib = F.expr(f"(rank_fp * {damp_num}) div {damp_den} div out_deg")
    for _ in range(iters):
        sums = (
            edeg.join(ranks, edeg[src] == ranks[id_col])
            .select(F.col(dst).alias(id_col), contrib.alias("c"))
            .groupBy(id_col)
            .agg(F.sum("c").alias("s"))
        )
        # lazy checkpoint: still truncates lineage (each iteration's
        # plan reads the previous one as a materialized-on-first-use
        # leaf) without forcing a per-iteration job
        ranks = (
            nodes.join(sums, id_col, "left")
            .select(
                F.col(id_col),
                (
                    F.lit(base).cast("long")
                    + F.coalesce(F.col("s"), F.lit(0).cast("long"))
                ).alias("rank_fp"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def pagerank_sql(
    doc_table: str = "documents",
    id_col: str = "doc_id",
    out_degree: int = 3,
    iters: int = 8,
    total: int = 10**12,
    damp_num: int = 17,
    damp_den: int = 20,
    k: int = 20,
) -> str:
    """DuckDB oracle: the same graph synthesis (splitmix64 mod N) and
    the same integer recurrence unrolled as `iters` chained CTEs —
    aggregation inside a recursive CTE is not portable SQL, but a
    fixed iteration count needs no recursion."""
    from .sketch import _splitmix_sql_fragment

    ks = ", ".join(f"({i})" for i in range(1, out_degree + 1))
    sm = _splitmix_sql_fragment(f"CAST(id * 31 + k AS UBIGINT)::UHUGEINT")
    base = f"(({total} * {damp_den - damp_num}) // {damp_den} // (SELECT n FROM nn))"
    parts = [
        f"nodes AS (SELECT {id_col} AS id FROM {doc_table})",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        f"""edges AS (
  SELECT id AS src,
         CAST(({sm}) % (SELECT n FROM nn)::UHUGEINT AS BIGINT) AS dst
  FROM nodes, (VALUES {ks}) AS ks(k))""",
        "deg AS (SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src)",
        f"r0 AS (SELECT id, {total} // (SELECT n FROM nn) AS rank_fp FROM nodes)",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""c{t} AS (
  SELECT e.dst AS id,
         CAST(SUM((r.rank_fp * {damp_num}) // {damp_den} // d.out_deg)
              AS BIGINT) AS s
  FROM edges e JOIN deg d USING (src) JOIN r{t - 1} r ON r.id = e.src
  GROUP BY e.dst)"""
        )
        parts.append(
            f"""r{t} AS (
  SELECT n.id, {base} + COALESCE(c.s, 0) AS rank_fp
  FROM nodes n LEFT JOIN c{t} c USING (id))"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT id AS {id_col}, rank_fp FROM r{iters}
ORDER BY rank_fp DESC, {id_col} LIMIT {k}"""
    )
