"""Graph-analytics suite: PageRank over the customer↔supplier
trading graph (edges from lineitem⋈orders, both directions so the
walk is well-defined on the bipartite structure).

Scale notes (100 TB posture): each PageRank iteration is one
edge-shuffle (contributions grouped by destination) joined against
the rank vector — the canonical distributed form; the rank and
degree tables are node-sized. Cross-engine determinism follows the
repo's staging idiom: per-edge contributions are rounded to 12 dp
and summed as DECIMAL(28,12), so the per-node sum is exact and
order-free on both engines, and the damping update is one shared
double tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from epe_data_wrangling_spark.catalog import CatalogQuery, make_registrar
from epe_data_wrangling_spark.sources.tables import load_table

QUERIES: dict[str, CatalogQuery] = {}
query = make_registrar(QUERIES)

PR_ITERS = 3
PR_DAMPING = 0.85  #: teleport = 1 - damping


def _pagerank_oracle() -> str:
    stage = "CAST(SUM(CAST(round(r.r / d.deg, 12) AS DECIMAL(28,12))) AS DOUBLE)"
    parts = [
        """
    WITH base AS (SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
                  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS (SELECT src, dst FROM base UNION ALL SELECT dst, src FROM base),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn)"""
    ]
    for i in range(1, PR_ITERS + 1):
        parts.append(f"""
    s{i} AS (SELECT e.dst AS node, {stage} AS s
             FROM edges e JOIN r{i - 1} r ON e.src = r.node
                          JOIN outdeg d ON e.src = d.src
             GROUP BY e.dst),
    r{i} AS (SELECT nodes.node,
                    {1 - PR_DAMPING} / nn.n + {PR_DAMPING} * COALESCE(s{i}.s, 0.0) AS r
             FROM nodes CROSS JOIN nn LEFT JOIN s{i} ON nodes.node = s{i}.node)""")
    parts.append(f"""
    SELECT node, round(r, 10) AS pagerank FROM r{PR_ITERS}
    """)
    return ",".join(parts[:1] + parts[1:-1]) + parts[-1]


def _trading_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected customer↔supplier edge list induced by line items
    (both directions, so the walk is well-defined on the bipartite
    structure). Node ids are PACKED BIGINTS (customer k → 2k,
    supplier k → 2k+1): every per-iteration shuffle and join then
    carries 8-byte longs instead of ~8-char strings (smaller shuffle
    rows, cheaper hashing/compares); the public 'c{{k}}'/'s{{k}}'
    labels are reconstructed only in the final projection
    (`_node_label`), so the oracle's string ids — and the result
    hash — are untouched. Rank values are id-representation-
    independent by construction (the decimal contribution staging
    depends only on graph structure)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    base = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey").cast("bigint") * 2).alias("src"),
            (F.col("l_suppkey").cast("bigint") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return base.unionAll(base.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def _node_label(node: F.Column) -> F.Column:
    """Packed bigint node id back to the oracle's 'c{{k}}'/'s{{k}}'
    (shiftright = exact integer halving, no double round trip)."""
    return F.when(
        node % 2 == 0, F.concat(F.lit("c"), F.shiftright(node, 1).cast("string"))
    ).otherwise(F.concat(F.lit("s"), F.shiftright(node, 1).cast("string")))


@query("pagerank_trading_graph", oracle=_pagerank_oracle())
def pagerank_trading_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank, {PR_ITERS} full iterations (damping {PR_DAMPING}),
    over the undirected customer↔supplier graph induced by line items
    — 'which parties anchor the trading network'. Runs
    operators.graph.pagerank in BROADCAST mode (rank÷degree share
    vector broadcast into the edge scan → map-side contribution + ONE
    shuffle per iteration, the groupBy on dst) — the fast path while
    the rank vector fits an executor (~16k nodes here; valid to
    ~10^8). Contributions are 12-dp-decimal-staged so both engines
    sum exactly; isolated parties (no line items) are outside the
    walk by construction. The matching DuckDB oracle unrolls the same
    {PR_ITERS} iterations; the beyond-broadcast twin
    (`pagerank_partitioned_edges`) shares it verbatim."""
    from epe_data_wrangling_spark.operators.graph import pagerank

    edges = _trading_edges(spark, sf_dir)
    r = pagerank(edges, iters=PR_ITERS, damping=PR_DAMPING, mode="broadcast")
    return r.select(_node_label(F.col("node")).alias("node"), "pagerank")


@query("pagerank_partitioned_edges", headline=True, oracle=_pagerank_oracle())
def pagerank_partitioned_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME PageRank (identical oracle, bit-identical result) in
    the beyond-broadcast physical form for >10^8-node graphs where
    the rank vector no longer fits an executor: edges are
    hash-partitioned on src ONCE and the co-location is reused every
    iteration — rank is produced keyed by node (= next iteration's
    src, alias-aware partitioning carries hash(node) through the
    rename), so the share⋈edges join is a zero-exchange
    ShuffledHashJoin and no join REQUIRES a node-sized broadcast:
    with broadcasts disabled and AQE off (the >10⁸-node regime,
    pinned in tests/test_plans.py) the plan has zero
    BroadcastHashJoins and exactly ONE exchange per iteration — the
    contribution groupBy(dst). (Under the default session AQE may
    still elect to broadcast a node-sized side it measures as small
    at runtime — a correct choice exactly when the side is in fact
    small.) The decimal contribution staging makes the result
    invariant to the partitioning change, which is what lets both
    physical forms share one oracle."""
    from epe_data_wrangling_spark.operators.graph import pagerank

    edges = _trading_edges(spark, sf_dir)
    r = pagerank(edges, iters=PR_ITERS, damping=PR_DAMPING, mode="partitioned")
    return r.select(_node_label(F.col("node")).alias("node"), "pagerank")


STRONG_TIE_MIN = 4  #: (customer, supplier) interactions for an edge


@query(
    "graph_strong_tie_components",
    oracle=f"""
    WITH RECURSIVE pair AS (
      SELECT 'c' || o_custkey AS u, 's' || l_suppkey AS v
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_custkey, l_suppkey HAVING COUNT(*) >= {STRONG_TIE_MIN}),
    sym AS (SELECT u, v FROM pair UNION SELECT v, u FROM pair),
    nodes AS (SELECT DISTINCT u AS node FROM sym),
    reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT s.u, reach.r FROM sym s JOIN reach ON s.v = reach.node),
    comp AS (SELECT node, MIN(r) AS rep FROM reach GROUP BY node)
    SELECT rep,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(CASE WHEN node LIKE 'c%' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_customers,
           CAST(SUM(CASE WHEN node LIKE 's%' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_suppliers
    FROM comp GROUP BY rep
    """,
)
def graph_strong_tie_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the STRONG-TIE trading graph (pairs
    with ≥ {STRONG_TIE_MIN} line items — thresholding is what makes a
    dense bipartite graph sparse enough that components mean
    something: trading communities, not one giant blob). Reuses the
    dedup clustering operator (operators.dedup.connected_components:
    iterative min-label propagation, localCheckpoint per round,
    early fixpoint stop, raises on non-convergence) on a non-dedup
    graph — per-component size and customer/supplier mix. The oracle
    computes the same min-reachable-id with a recursive CTE; the
    fixpoint is unique, so the iterative and recursive forms must
    agree exactly. Scale: edge building is one partial-agg shuffle;
    each propagation round is a node-sized join + aggregate, rounds
    bounded by component diameter (tiny under thresholding)."""
    from epe_data_wrangling_spark.operators.dedup import connected_components

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= STRONG_TIE_MIN)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("u"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("v"),
        )
    )
    comp = connected_components(edges, "u", "v")
    return comp.groupBy("rep").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.when(F.col("node").startswith("c"), 1).otherwise(0)).alias("n_customers"),
        F.sum(F.when(F.col("node").startswith("s"), 1).otherwise(0)).alias("n_suppliers"),
    )


COTRADE_MIN = 3  #: (customer, supplier) interactions for a strong tie


@query(
    "graph_cotrade_clustering",
    oracle=f"""
    WITH pair AS (
      SELECT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_custkey, l_suppkey HAVING COUNT(*) >= {COTRADE_MIN}),
    ss AS (SELECT DISTINCT a.s AS s1, b.s AS s2
           FROM pair a JOIN pair b ON a.c = b.c AND a.s < b.s),
    tri AS (SELECT e1.s1 AS u, e1.s2 AS v, e2.s2 AS w
            FROM ss e1 JOIN ss e2 ON e1.s2 = e2.s1
                       JOIN ss e3 ON e1.s1 = e3.s1 AND e2.s2 = e3.s2),
    part AS (SELECT u AS s FROM tri UNION ALL SELECT v FROM tri
             UNION ALL SELECT w FROM tri),
    tcnt AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n_triangles
             FROM part GROUP BY s),
    deg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS degree FROM
              (SELECT s1 AS s FROM ss UNION ALL SELECT s2 FROM ss) z
            GROUP BY s)
    SELECT d.s AS s_suppkey, d.degree,
           COALESCE(t.n_triangles, 0) AS n_triangles,
           CASE WHEN d.degree >= 2
                THEN round(2.0 * COALESCE(t.n_triangles, 0)
                           / (d.degree * (d.degree - 1)), 6)
                ELSE 0.0 END AS clustering_coef
    FROM deg d LEFT JOIN tcnt t ON d.s = t.s
    """,
)
def graph_cotrade_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier triangle counts and local clustering coefficient
    over the co-trade projection (suppliers linked when they share a
    ≥{COTRADE_MIN}-line-item customer) — the canonical distributed
    triangle enumeration: ordered edges (s1 < s2) joined edge⋈edge on
    the shared endpoint then closed by a third edge lookup, so each
    triangle is emitted exactly once and candidate volume is Σ deg²
    over the THRESHOLDED graph (the strong-tie filter is what keeps
    the projection sparse; an unthresholded bipartite projection is
    quadratic in customers' supplier fan-out). Coefficient =
    2T / d(d−1), the graph-cohesion feature for entity-risk scoring.
    Shuffles carry supplier-id pairs only."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pair = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= COTRADE_MIN)
        .select("c", "s")
    )
    ss = (
        pair.alias("a")
        .join(pair.alias("b"), (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .distinct()
        .localCheckpoint(eager=True)  # edge list reused by 3 join sides + degrees
    )
    tri = (
        ss.alias("e1")
        .join(ss.alias("e2"), F.col("e1.s2") == F.col("e2.s1"))
        .join(
            ss.alias("e3"),
            (F.col("e1.s1") == F.col("e3.s1")) & (F.col("e2.s2") == F.col("e3.s2")),
        )
        .select(F.col("e1.s1").alias("u"), F.col("e1.s2").alias("v"), F.col("e2.s2").alias("w"))
    )
    part = (
        tri.select(F.col("u").alias("s"))
        .unionAll(tri.select(F.col("v").alias("s")))
        .unionAll(tri.select(F.col("w").alias("s")))
    )
    tcnt = part.groupBy("s").agg(F.count(F.lit(1)).alias("n_triangles"))
    deg = (
        ss.select(F.col("s1").alias("s"))
        .unionAll(ss.select(F.col("s2").alias("s")))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        deg.join(tcnt, "s", "left")
        .select(
            F.col("s").alias("s_suppkey"),
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    2.0 * F.coalesce("n_triangles", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1)),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coef"),
        )
    )


_RECURSIVE_BFS_SQL = f"""
    WITH RECURSIVE pair AS (
      SELECT 'c' || CAST(o_custkey AS STRING) AS u,
             's' || CAST(l_suppkey AS STRING) AS v
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_custkey, l_suppkey HAVING COUNT(*) >= {STRONG_TIE_MIN}),
    sym AS (SELECT u, v FROM pair UNION ALL SELECT v, u FROM pair),
    walk(node, dist) AS (
      SELECT DISTINCT u, 0 FROM pair WHERE u = (SELECT MIN(u) FROM pair)
      UNION ALL
      SELECT s.v, walk.dist + 1
      FROM sym s JOIN walk ON s.u = walk.node
      WHERE walk.dist < 4),
    best AS (SELECT node, MIN(dist) AS dist FROM walk GROUP BY node)
    SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_nodes,
           MIN(node) AS min_node, MAX(node) AS max_node
    FROM best GROUP BY dist
"""


@query("sql_recursive_cte_bfs", oracle=_RECURSIVE_BFS_SQL)
def sql_recursive_cte_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's RECURSIVE CTE (SPARK-24497, new in 4.0) driven
    through the SQL surface: depth-bounded breadth-first reachability
    from the lexicographically-first customer over the strong-tie
    trading graph (ties ≥ {STRONG_TIE_MIN} line items — the
    thresholding that keeps the bipartite graph sparse), min-dist
    dedup after the walk. ONE engine-neutral SQL string is both the
    Spark plan and the DuckDB oracle, so the new iterative execution
    path must agree with a mature recursive-CTE implementation
    row-for-row. UNION ALL + depth guard is the Spark-supported
    recursion form (UNION-distinct fixpoints are not yet in 4.1);
    walk count is bounded by Σ deg^4 over the thresholded graph —
    sparse by construction, and the per-level frontier join shuffles
    only (node, dist) pairs."""
    from epe_data_wrangling_spark.sources.tables import register_views

    register_views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_RECURSIVE_BFS_SQL)
