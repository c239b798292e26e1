"""Web-graph analytics beyond the KG pipeline: integer-quantized HITS.

Kleinberg's HITS assigns every node a hub score (points at good
authorities) and an authority score (pointed at by good hubs) — the
classic crawl-prioritization / seed-ranking signal next to PageRank
(which ``kg.pagerank_quantized`` covers).  Float HITS with L2
normalization is unportable across engines, so — like the quantized
PageRank — this variant is exact-integer:

- scores live in units of ``scale`` (default 1000 = milli);
- each half-step is ``new[v] = sum over edges of the other score``,
  then re-quantized by the CURRENT MAX: ``(raw * scale) DIV max(raw)``
  (max-norm instead of L2 — same fixpoint direction, pure int64);
- a FIXED iteration count unrolls into plain joins, so the DuckDB twin
  (:func:`hits_oracle_sql`) replays the identical arithmetic CTE by CTE
  and value-hashes match bit-for-bit.

Scale shape: the edge list is the only big table; per iteration the
score table (<= |nodes| rows, already aggregated) broadcasts into one
edge join + one groupBy — the standard iterative-join pattern, 2
bounded shuffles per iteration, no driver-side loops over data.  The
max used for re-quantization is a 1-row aggregate (broadcast
crossJoin), never a collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hits_scores(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 2,
    scale: int = 1000,
) -> DataFrame:
    """(node, auth, hub) integer HITS scores after ``iters`` rounds.

    Edges are deduplicated first (HITS is defined on the simple graph).
    Nodes with no in-edges get auth=0, no out-edges hub=0."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    hub = nodes.select("node", F.lit(scale).cast("long").alias("score"))

    def half_step(scores: DataFrame, join_on: str, group_on: str) -> DataFrame:
        raw = (
            e.join(
                F.broadcast(scores),
                e[join_on] == scores["node"],
            )
            .groupBy(e[group_on].alias("node"))
            .agg(F.sum("score").alias("raw"))
        )
        mx = raw.agg(F.max("raw").alias("mx"))
        return raw.crossJoin(F.broadcast(mx)).select(
            "node", F.expr(f"(raw * {scale}) DIV mx").alias("score")
        )

    auth = None
    for _ in range(iters):
        auth = half_step(hub, "src", "dst")
        hub = half_step(auth, "dst", "src")

    return (
        nodes.join(
            auth.select("node", F.col("score").alias("auth")), "node", "left"
        )
        .join(hub.select("node", F.col("score").alias("hub")), "node", "left")
        .select(
            "node",
            F.coalesce("auth", F.lit(0)).cast("long").alias("auth"),
            F.coalesce("hub", F.lit(0)).cast("long").alias("hub"),
        )
    )


def hits_oracle_sql(
    edges_sql: str, iters: int = 2, scale: int = 1000
) -> str:
    """DuckDB twin of :func:`hits_scores`: ``edges_sql`` must yield
    (src, dst); returns (node, auth, hub).  The iteration loop unrolls
    into one pair of CTEs per round — identical integer arithmetic."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    ctes = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}) "
        "WHERE src IS NOT NULL AND dst IS NOT NULL)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        f"h0 AS (SELECT node, {scale}::BIGINT AS score FROM nodes)",
    ]
    prev_hub = "h0"
    for t in range(1, iters + 1):
        ctes.append(
            f"a{t}r AS (SELECT e.dst AS node, SUM(s.score) AS raw "
            f"FROM e JOIN {prev_hub} s ON e.src = s.node GROUP BY 1)"
        )
        ctes.append(
            f"a{t} AS (SELECT node, (raw * {scale}) // "
            f"(SELECT MAX(raw) FROM a{t}r) AS score FROM a{t}r)"
        )
        ctes.append(
            f"h{t}r AS (SELECT e.src AS node, SUM(s.score) AS raw "
            f"FROM e JOIN a{t} s ON e.dst = s.node GROUP BY 1)"
        )
        ctes.append(
            f"h{t} AS (SELECT node, (raw * {scale}) // "
            f"(SELECT MAX(raw) FROM h{t}r) AS score FROM h{t}r)"
        )
        prev_hub = f"h{t}"
    return (
        "WITH " + ",\n".join(ctes) + f"""
        SELECT nodes.node AS node,
               CAST(COALESCE(a.score, 0) AS BIGINT) AS auth,
               CAST(COALESCE(h.score, 0) AS BIGINT) AS hub
        FROM nodes
        LEFT JOIN a{iters} AS a ON nodes.node = a.node
        LEFT JOIN h{iters} AS h ON nodes.node = h.node
    """
    )
