"""Graph operators over DataFrames (SURVEY §2.13 scale extension; the
iterative-algebra sibling of dedup.connected_components).

``graph_pagerank`` — PageRank by power iteration over the bipartite
customer <-> part purchase graph (edges from orders x lineitem, both
directions, so every node has out-degree >= 1 and no dangling mass).

All rank arithmetic is INTEGER (micro-rank units, contribution =
(rank * 85) // (100 * degree)): floating-point PageRank is reduction-
order-dependent and can never hash-match across engines or cluster
sizes; integer quantization makes every iteration exact and portable, at
a rank resolution of 1e-12 of the initial mass (far below any ranking
decision). The DuckDB oracle is the SAME recurrence unrolled into chained
CTEs — iteration-for-iteration bit equality.

Scale shape: the edge list is built once (one orders<->lineitem shuffle,
distinct), degree is one small aggregate, and each iteration is ONE
shuffle (join ranks on src, groupBy dst) over the edge table — the
standard Pregel-on-DataFrame plan. Lineage is truncated per round
(localCheckpoint; pass checkpoint_dir for a cluster-grade reliable
checkpoint, as in connected_components), so the physical plan stays O(1)
per iteration instead of O(3^t). Partitioning both the edge table and the
rank table by the join key would co-locate successive iterations on a
real cluster (bucketing; AQE handles the local case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as WindowSpec
from pyspark.sql import functions as F

from ..sources.tables import load_table

PR_ITERS = 5
PR_SCALE = 10**12  # initial integer rank mass per node
PR_DAMP_NUM = 85  # damping 0.85 as an integer ratio
PR_DAMP_DEN = 100
PR_BASE = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
TOP_RANKED = 50


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (customer, part) purchase pairs as a symmetric directed
    edge list. Node ids encode the side: customer -> 2k, part -> 2k+1."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    cp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_partkey") * 2 + 1).alias("p"),
        )
        .distinct()
    )
    return cp.select(F.col("c").alias("src"), F.col("p").alias("dst")).union(
        cp.select(F.col("p").alias("src"), F.col("c").alias("dst"))
    )


def pagerank(
    edges: DataFrame,
    iters: int = PR_ITERS,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 8,
) -> DataFrame:
    """(src, dst) directed edges (every src must have out-degree >= 1)
    -> (node, rank) after ``iters`` integer power iterations.

    Unlike connected components (labels referenced 3x per round ->
    3^rounds plan without truncation), each iteration references ``ranks``
    exactly ONCE, so the logical plan grows linearly — the whole
    iteration chain runs as one multi-stage job. Only the edge+degree
    table (consumed every round) is materialized up front, and ranks are
    truncated every ``checkpoint_every`` rounds as a long-run guard
    (plan-analysis cost and scheduler lineage, not correctness)."""
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _truncate(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    # degree via a window over ONE src shuffle — a groupBy+self-join would
    # evaluate the (join+distinct) edge lineage twice before materializing
    e = edges.select("src", "dst")
    ed = _truncate(
        e.withColumn(
            "deg", F.count(F.lit(1)).over(WindowSpec.partitionBy("src"))
        )
    )
    # init ranks from ed (already hash-partitioned by src -> the distinct
    # reuses that exchange). Per-iteration join strategy is left to AQE:
    # it broadcasts the rank table while it fits and falls back to a
    # shuffle join (the honest 100 TB plan, where bucketing both tables
    # on the node key removes the per-round exchange) when it doesn't.
    ranks = ed.select(F.col("src").alias("node")).distinct().withColumn(
        "rank", F.lit(PR_SCALE)
    )
    for i in range(iters):
        contrib = ed.join(
            ranks.select(F.col("node").alias("src"), "rank"), "src"
        ).select(
            "dst",
            # div (integer division), NOT `/`: float division + cast
            # truncates differently between engines near-integer quotients
            F.expr(
                f"(rank * {PR_DAMP_NUM}) div ({PR_DAMP_DEN} * deg)"
            ).alias("c"),
        )
        ranks = (
            contrib.groupBy("dst")
            .agg((F.lit(PR_BASE) + F.sum("c")).cast("long").alias("rank"))
            .select(F.col("dst").alias("node"), "rank")
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iters:
            ranks = _truncate(ranks)
    return ranks


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 nodes of the purchase graph by PageRank, deterministic
    tie-break on node id; side decoded back to a label."""
    ranks = pagerank(_edges(spark, sf_dir))
    return (
        ranks.select(
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("part"))
            .alias("side"),
            (F.col("node") / 2).cast("long").alias("entity_id"),
            "rank",
        )
        .orderBy(F.desc("rank"), F.asc("side"), F.asc("entity_id"))
        .limit(TOP_RANKED)
    )


def _oracle_pagerank() -> str:
    """The same integer recurrence unrolled into chained CTEs."""
    its = []
    prev = "r0"
    for t in range(1, PR_ITERS + 1):
        its.append(
            f"""r{t} AS (
  SELECT ed.dst AS node,
         CAST({PR_BASE} + SUM((r.rank * {PR_DAMP_NUM})
           // ({PR_DAMP_DEN} * ed.deg)) AS BIGINT) AS rank
  FROM ed JOIN {prev} r ON ed.src = r.node
  GROUP BY ed.dst
)"""
        )
        prev = f"r{t}"
    chain = ",\n".join(its)
    return f"""
WITH cp AS (
  SELECT DISTINCT o.o_custkey * 2 AS c, l.l_partkey * 2 + 1 AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), e AS (
  SELECT c AS src, p AS dst FROM cp
  UNION ALL
  SELECT p AS src, c AS dst FROM cp
), deg AS (
  SELECT src, COUNT(*) AS deg FROM e GROUP BY src
), ed AS (
  SELECT e.src, e.dst, d.deg FROM e JOIN deg d USING (src)
), r0 AS (
  SELECT DISTINCT src AS node, CAST({PR_SCALE} AS BIGINT) AS rank FROM e
),
{chain}
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'part' END AS side,
       node // 2 AS entity_id,
       rank
FROM {prev}
ORDER BY rank DESC, side ASC, entity_id ASC
LIMIT {TOP_RANKED}
"""


QUERIES = {
    "graph_pagerank": (q_graph_pagerank, _oracle_pagerank()),
}
