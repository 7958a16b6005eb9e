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
standard Pregel-on-DataFrame plan. Only the up-front tables (edges with
degree, the node universe) are checkpoint-truncated — they are consumed
every round; the rank chain grows linearly (each iteration references
ranks exactly once) and is truncated every ``checkpoint_every`` rounds as
a long-run lineage guard (``localCheckpoint`` locally; pass
``checkpoint_dir`` for a cluster-grade reliable checkpoint, as in
connected_components). ``pagerank_bucketed`` is the cluster path for the
per-round join: the degree-annotated edge table is written ONCE bucketed
by ``src``, after which every iteration's rank join is exchange-free on
both sides (the bucketed scan provides hash(src); the previous round's
aggregation provides hash(node)) — the only per-iteration shuffle left is
the irreducible message aggregation by ``dst`` (plan-pinned in
tests/test_bucketing.py::test_bucketed_pagerank_iteration_join_is_exchange_free).
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


def _has_source_only_nodes(ed: DataFrame) -> bool:
    """True iff some node has out-edges but no in-edges. One-time bounded
    driver probe (isEmpty = limit-1 scan) — the same discipline as the
    connected-components fixpoint probe; NOT a per-row collect."""
    srcs = ed.select(F.col("src").alias("node")).distinct()
    dsts = ed.select(F.col("dst").alias("node")).distinct()
    return not srcs.join(dsts, "node", "left_anti").isEmpty()


def _power_iterate(
    ed: DataFrame,
    iters: int,
    truncate,
    checkpoint_every: int,
    reseed: bool,
) -> DataFrame:
    """The shared integer power-iteration loop over a degree-annotated
    edge table ``ed`` (src, dst, deg).

    With ``reseed`` (required when some node has out-edges but no
    in-edges), every round rebuilds the rank table from the full
    src-union-dst node universe with a left join, so such a node keeps
    its teleport-base rank (and keeps contributing) instead of silently
    dropping out after round 1. When every contributor also receives
    (e.g. the symmetric bipartite query graph), the direct aggregation is
    the same function minus a per-round join and the universe build, so
    callers that know their graph (or the one-time probe) pick the cheap
    path. Nodes with in-edges only (sinks) accumulate rank but contribute
    none — their dangling mass is NOT redistributed, which is why the API
    requires out-degree >= 1 for every src."""
    if reseed:
        nodes = truncate(
            ed.select(F.col("src").alias("node"))
            .union(ed.select(F.col("dst").alias("node")))
            .distinct()
        )
        ranks = nodes.withColumn("rank", F.lit(PR_SCALE))
    else:
        # no source-only nodes => src-set == receiving universe; on a
        # src-bucketed/partitioned ed this distinct needs no exchange
        ranks = (
            ed.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("rank", F.lit(PR_SCALE))
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
        if reseed:
            agg = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
            ranks = nodes.join(
                agg.select(F.col("dst").alias("node"), "s"), "node", "left"
            ).select(
                "node",
                (F.lit(PR_BASE) + F.coalesce(F.col("s"), F.lit(0)))
                .cast("long")
                .alias("rank"),
            )
        else:
            ranks = (
                contrib.groupBy("dst")
                .agg(
                    (F.lit(PR_BASE) + F.sum("c")).cast("long").alias("rank")
                )
                .select(F.col("dst").alias("node"), "rank")
            )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iters:
            ranks = truncate(ranks)
    return ranks


def pagerank(
    edges: DataFrame,
    iters: int = PR_ITERS,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 8,
    reseed: bool | None = None,
) -> DataFrame:
    """(src, dst) directed edges (every src must have out-degree >= 1)
    -> (node, rank) after ``iters`` integer power iterations over the
    full src-union-dst node universe.

    ``reseed`` — whether a per-round re-seed join is needed to keep
    source-only nodes (out-edges, no in-edges) alive; ``None`` (default)
    probes the edge table once, callers that know their graph shape pass
    False (symmetric graphs) or True to skip the probe.

    Unlike connected components (labels referenced 3x per round ->
    3^rounds plan without truncation), each iteration references ``ranks``
    exactly ONCE, so the logical plan grows linearly — the whole
    iteration chain runs as one multi-stage job. The edge+degree table
    (consumed every round) is materialized up front; ranks are truncated
    every ``checkpoint_every`` rounds as a long-run guard (plan-analysis
    cost and scheduler lineage, not correctness)."""
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _truncate(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    # degree via a window over ONE src shuffle — a groupBy+self-join would
    # evaluate the (join+distinct) edge lineage twice before materializing.
    # (Measured alternative at sf0.1: checkpoint the distinct pair set,
    # degrees as two small aggregates joined back — 7.3 s warm vs 5.0 s
    # for this plan; the extra materialization + join costs more than the
    # window sort. The r4 bench's apparent +29% on this query was JIT
    # warm-up at its new bench position, not plan cost: after ~10 warm-up
    # queries this plan reproduces the r3 2.98 s exactly, which is why
    # bench.py now runs untimed warm-up executions per query.)
    e = edges.select("src", "dst")
    ed = _truncate(
        e.withColumn(
            "deg", F.count(F.lit(1)).over(WindowSpec.partitionBy("src"))
        )
    )
    if reseed is None:
        reseed = _has_source_only_nodes(ed)
    return _power_iterate(ed, iters, _truncate, checkpoint_every, reseed)


def pagerank_bucketed(
    spark: SparkSession,
    edges: DataFrame,
    table_name: str = "pr_edges_bucketed",
    iters: int = PR_ITERS,
    n_buckets: int | None = None,
    checkpoint_every: int = 8,
    reseed: bool | None = None,
    reuse_table: bool = False,
) -> DataFrame:
    """Same recurrence, cluster-grade per-round plan: the degree-annotated
    edge table is written ONCE as a managed table bucketed (and sorted) by
    ``src``, so every iteration's rank join needs NO exchange on either
    side — the bucketed scan arrives hash-partitioned on src, and the
    previous round's aggregation output arrives hash-partitioned on node.
    The bucket count must equal ``spark.sql.shuffle.partitions`` (default)
    for the two partitionings to align.

    ``reuse_table``: the bucketed write is an INGEST-TIME artifact — on a
    cluster it happens once and every subsequent PageRank run reads it.
    With True, a table this session already built (same name, readable)
    is reused, so steady-state timings reflect what a cluster pays per
    run; the first call still pays the build. Callers own name-per-
    dataset hygiene (q_graph_pagerank_bucketed tags the name with the sf
    directory)."""
    import os
    import shutil
    from urllib.parse import urlparse

    from .bucketing import write_bucketed

    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    from ..sources.tables import artifact_verified, mark_artifact_verified

    ed_b = None
    if reuse_table and spark.catalog.tableExists(table_name):
        try:
            ed_b = spark.table(table_name)
            # readable probe; rebuild on any doubt. Once per session per
            # table (optimization r15) — the name carries the fixture
            # fingerprint, so a verified table stays verified.
            if not artifact_verified(spark, f"table:{table_name}"):
                ed_b.limit(1).count()
                mark_artifact_verified(spark, f"table:{table_name}")
        except Exception:
            ed_b = None
    if ed_b is None:
        # the in-memory catalog forgets tables across sessions while their
        # warehouse directories persist; clear both so the one-time write
        # is reproducible (DDL-level maintenance, not a data-path action)
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(os.path.join(wh, table_name.lower()), ignore_errors=True)
        e = edges.select("src", "dst")
        ed = e.withColumn(
            "deg", F.count(F.lit(1)).over(WindowSpec.partitionBy("src"))
        )
        write_bucketed(ed, table_name, "src", n_buckets, sort_col="src")
        ed_b = spark.table(table_name)

    def _truncate(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=True)

    if reseed is None:
        reseed = _has_source_only_nodes(ed_b)
    return _power_iterate(ed_b, iters, _truncate, checkpoint_every, reseed)


def _top_ranked(ranks: DataFrame) -> DataFrame:
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


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 nodes of the purchase graph by PageRank, deterministic
    tie-break on node id; side decoded back to a label. The union-built
    edge list is symmetric by construction, so the source-only probe is
    statically answered (reseed=False)."""
    return _top_ranked(pagerank(_edges(spark, sf_dir), reseed=False))


def q_graph_pagerank_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical result to q_graph_pagerank (same oracle) through the
    bucketed-edge plan — proves the exchange-free iteration join end to
    end. The sf-tagged edge table builds on first call in a session and
    is reused after (the ingest-time amortization the operator exists
    for); warm timings therefore measure the per-run iteration cost.

    The reuse-table name carries an identity fingerprint of the ABSOLUTE
    sf path plus the parquet inputs' (size, mtime) stats, so two sf dirs
    sharing a basename — or a fixture regenerated in place — can never
    silently serve stale ranks: any such change yields a different table
    name and triggers a rebuild."""
    import hashlib
    import os
    import re

    base = os.path.abspath(sf_dir.rstrip("/"))
    ident = [base]
    for t in ("orders.parquet", "lineitem.parquet"):
        try:
            st = os.stat(os.path.join(base, t))
            ident.append(f"{t}:{st.st_size}:{st.st_mtime_ns}")
        except OSError:
            ident.append(f"{t}:absent")
    fp = hashlib.sha256("|".join(ident).encode()).hexdigest()[:10]
    tag = re.sub(r"[^0-9A-Za-z]", "_", os.path.basename(base))
    return _top_ranked(
        pagerank_bucketed(
            spark,
            _edges(spark, sf_dir),
            f"pr_edges_b_{tag}_{fp}",
            reseed=False,
            reuse_table=True,
        )
    )


def _oracle_pagerank() -> str:
    """The same integer recurrence unrolled into chained CTEs. (The
    engine re-seeds every round from the full node universe; on this
    symmetric graph every node receives contributions each round, so the
    groupBy-only oracle recurrence is the identical function.)"""
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
    "graph_pagerank_bucketed": (q_graph_pagerank_bucketed, _oracle_pagerank()),
}
