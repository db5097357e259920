"""Graph queries: PageRank centrality over the order-trade bipartite graph.

Beyond-reference family (the reference has no graph path; SURVEY.md §2.11):
link-graph centrality is a core web-corpus curation signal at 100 TB, and
the iterative join/agg loop here is the DataFrame scaffold every such
algorithm shares. The integer micro-unit quantization in
``operators/graph.py`` makes the iteration bit-reproducible, so the whole
3-round computation is oracle-checked exactly — the DuckDB twin unrolls the
rounds as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spark.operators.graph import (
    DAMPING_MICRO,
    UNIT,
    pagerank_quantized,
)
from data_engineering_project_spark.plans.catalog import register
from data_engineering_project_spark.sources.tables import load_table

_ITERATIONS = 3
_BASE = UNIT - DAMPING_MICRO


def _symmetrize(base: DataFrame) -> DataFrame:
    """Undirected edge view of a deduped (src, dst) frame — map-side
    explode of both orientations, ONE lineage (r14, extending the r13
    graph_degree_distribution fix to every trade-graph loop consumer):
    ``base.union(base.select(swapped))`` computed the JOIN+DISTINCT
    subtree TWICE because the swap projection collapses into the distinct
    aggregate's output and the union branches stop being identical
    subtrees, so ReuseExchange cannot fire. Identical edge multiset: the
    parity encoding makes forward/reverse collisions impossible, and
    neither form deduplicates across orientations
    (tools/ab_pagerank_build.py: sf0.5 marginal 3.88 -> 3.26 s on the
    pagerank consumer; every downstream consumer is order-independent
    aggregation/joins)."""
    return base.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("src"), F.col("dst").alias("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")


def _round_cte(prev: str, cur: str) -> str:
    """One unrolled PageRank round: contributions from ``prev`` → ``cur``."""
    return f"""
    {cur} AS (
        SELECT n.node,
               CAST({_BASE} + ({DAMPING_MICRO} * COALESCE(s.s, 0)) // {UNIT}
                    AS BIGINT) AS rank_micro
        FROM nodes n
        LEFT JOIN (
            SELECT e.dst AS node, SUM(r.rank_micro // d.deg) AS s
            FROM edges e
            JOIN {prev} r ON e.src = r.node
            JOIN deg d ON e.src = d.node
            GROUP BY e.dst
        ) s ON n.node = s.node
    )"""


_ROUNDS = ",".join(_round_cte(f"r{i}", f"r{i + 1}") for i in range(_ITERATIONS))

_PAGERANK_SQL = f"""
    WITH base AS (
        SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (
        SELECT src, dst FROM base
        UNION ALL
        SELECT dst AS src, src AS dst FROM base
    ),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
    nodes AS (SELECT node FROM deg),
    r0 AS (SELECT node, CAST({UNIT} AS BIGINT) AS rank_micro FROM nodes),
    {_ROUNDS}
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
               AS node_type,
           node // 2 AS entity_id,
           rank_micro
    FROM r{_ITERATIONS}
"""


@register(
    "graph_pagerank_trade",
    sql=_PAGERANK_SQL,
    doc="PageRank (3 rounds, damping 0.85) over the undirected customer ⇄ "
    "supplier trade graph derived from orders ⋈ lineitem. Integer "
    "micro-unit arithmetic (operators/graph.py) makes the iterative "
    "computation order-independent, so the DuckDB oracle unrolls the "
    "rounds and hash-matches exactly — rare for an iterative float "
    "algorithm. The loop-invariant edge⋈degree table is cached "
    "hash(src)-partitioned + src-sorted, so each round's join moves ONLY "
    "the |nodes|-sized rank table; the sole per-round shuffle is the "
    "contribution groupBy(dst) (plan-asserted: "
    "test_plan_quality.py::test_pagerank_iteration_never_reshuffles_edges). "
    "Lineage truncated per round via localCheckpoint; caches released "
    "eagerly after the final round.",
    tags=("graph", "iterative", "curation"),
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    base = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    # Undirected: both directions via map-side explode (reversed edges
    # cannot collide with forward ones — the parity encoding differs per
    # side); see _symmetrize for why not union-of-swapped.
    edges = _symmetrize(base)
    ranks = pagerank_quantized(edges, iterations=_ITERATIONS)
    return ranks.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("node div 2").alias("entity_id"),
        "rank_micro",
    )


def _bfs_round(prev: str, cur: str) -> str:
    """One unrolled BFS round: relax every edge from the closed set."""
    return f"""
    {cur} AS (
        SELECT node, CAST(min(hops) AS INTEGER) AS hops
        FROM (
            SELECT node, hops FROM {prev}
            UNION ALL
            SELECT e.dst AS node, p.hops + 1 AS hops
            FROM edges e JOIN {prev} p ON e.src = p.node
        )
        GROUP BY node
    )"""


_BFS_ROUNDS = 3

_BFS_SQL = f"""
    WITH base AS (
        SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (
        SELECT src, dst FROM base
        UNION ALL
        SELECT dst AS src, src AS dst FROM base
    ),
    d0 AS (
        SELECT min(src) AS node, CAST(0 AS INTEGER) AS hops FROM base
    ),
    {",".join(_bfs_round(f"d{i}", f"d{i + 1}") for i in range(_BFS_ROUNDS))}
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
               AS node_type,
           node // 2 AS entity_id,
           hops
    FROM d{_BFS_ROUNDS}
"""


@register(
    "graph_bfs_hops_trade",
    sql=_BFS_SQL,
    doc="Bounded breadth-first search: minimum hop distance from the "
    "lowest-keyed trading customer to every node reachable in ≤3 hops of "
    "the undirected customer ⇄ supplier graph (orders ⋈ lineitem). The "
    "neighborhood-expansion primitive behind 'related entities within k "
    "links' and graph-based contamination tracing. Hop counts are exact "
    "integers reduced by min — order-independent, so the DuckDB oracle "
    "unrolls the rounds and hash-matches exactly (the PageRank "
    "precedent). Loop scaffold shared with `pagerank_quantized`: edges "
    "hash-partitioned+sorted+persisted once, each round exchanges only "
    "the distance table, lineage truncated per round "
    "(operators/graph.py:bfs_hops).",
    tags=("graph", "iterative", "bfs"),
)
def graph_bfs_hops_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineering_project_spark.operators.graph import bfs_hops

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    base = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = _symmetrize(base)
    sources = base.agg(F.min("src").alias("node"))
    dist = bfs_hops(edges, sources, rounds=_BFS_ROUNDS)
    return dist.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("node div 2").alias("entity_id"),
        "hops",
    )


def _lpa_round(prev: str, cur: str) -> str:
    """One unrolled synchronous LPA round with the deterministic
    (count desc, label asc) winner rule."""
    return f"""
    {cur} AS (
        SELECT l.node,
               coalesce(w.new_label, l.label) AS label
        FROM {prev} l
        LEFT JOIN (
            SELECT node, label AS new_label FROM (
                SELECT e.dst AS node, p.label,
                       row_number() OVER (
                           PARTITION BY e.dst
                           ORDER BY count(*) DESC, p.label ASC
                       ) AS rn
                FROM edges e JOIN {prev} p ON e.src = p.node
                GROUP BY e.dst, p.label
            ) WHERE rn = 1
        ) w ON w.node = l.node
    )"""


_LPA_ROUNDS = 3

_LPA_SQL = f"""
    WITH base AS (
        SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (
        SELECT src, dst FROM base
        UNION ALL
        SELECT dst AS src, src AS dst FROM base
    ),
    l0 AS (
        SELECT node, node AS label FROM (
            SELECT DISTINCT src AS node FROM edges
            UNION
            SELECT DISTINCT dst FROM edges
        )
    ),
    {",".join(_lpa_round(f"l{i}", f"l{i + 1}") for i in range(_LPA_ROUNDS))},
    sizes AS (
        SELECT label, CAST(count(*) AS BIGINT) AS community_size
        FROM l{_LPA_ROUNDS} GROUP BY label
    )
    SELECT CASE WHEN l.node % 2 = 0 THEN 'customer' ELSE 'supplier' END
               AS node_type,
           l.node // 2 AS entity_id,
           l.label AS community,
           s.community_size
    FROM l{_LPA_ROUNDS} l JOIN sizes s ON s.label = l.label
"""


@register(
    "graph_lpa_communities",
    sql=_LPA_SQL,
    doc="Community detection by synchronous label propagation over the "
    "undirected customer ⇄ supplier trade graph (3 rounds): every node "
    "adopts its in-neighbors' most frequent label, ties to the SMALLEST "
    "label, isolated-in-degree nodes keep theirs — the determinism "
    "restatement that makes an oracle possible at all (textbook "
    "async/random-order LPA is run-dependent). Labels are integer node "
    "ids and the winner rule is a total order, so the DuckDB oracle "
    "unrolls the rounds and hash-matches exactly (the "
    "PageRank/BFS precedent). Each round: one join against the "
    "once-partitioned cached edges, a (dst,label) count whose shuffle "
    "is bounded by |edges|, and a keyed window — no global sort. "
    "Community sizes join back from the final round's label table. "
    "operators/graph.py:label_propagation.",
    tags=("graph", "iterative", "community"),
)
def graph_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineering_project_spark.operators.graph import (
        label_propagation,
    )

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    base = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = _symmetrize(base)
    labels = label_propagation(edges, rounds=_LPA_ROUNDS)
    sizes = labels.groupBy("label").agg(
        F.count("*").cast("bigint").alias("community_size")
    )
    return labels.join(F.broadcast(sizes), "label").select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("node div 2").alias("entity_id"),
        F.col("label").alias("community"),
        "community_size",
    )


_KCORE_K = 4
_KCORE_ROUNDS = 3


def _kcore_round(prev: str, cur: str) -> str:
    """One unrolled peeling round: survivors of ``prev`` keep only edges
    whose BOTH endpoints still have degree >= k."""
    return f"""
    k_{cur} AS (
        SELECT src FROM (
            SELECT src, count(*) AS deg FROM {prev} GROUP BY src
        ) WHERE deg >= {_KCORE_K}
    ),
    {cur} AS (
        SELECT a.src, a.dst FROM {prev} a
        WHERE a.src IN (SELECT src FROM k_{cur})
          AND a.dst IN (SELECT src FROM k_{cur})
    )"""


_KCORE_SQL = (
    f"""
    WITH base AS (
        SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    a0 AS (
        SELECT src, dst FROM base
        UNION ALL
        SELECT dst AS src, src AS dst FROM base
    ),
    """
    + ",".join(
        _kcore_round(f"a{i}", f"a{i + 1}") for i in range(_KCORE_ROUNDS)
    )
    + f"""
    SELECT CASE WHEN src % 2 = 0 THEN 'customer' ELSE 'supplier' END
               AS node_type,
           src // 2 AS entity_id,
           CAST(count(*) AS BIGINT) AS deg
    FROM a{_KCORE_ROUNDS}
    GROUP BY src
    """
)


@register(
    "graph_kcore_trade",
    sql=_KCORE_SQL,
    doc=f"Bounded k-core decomposition (k={_KCORE_K}, {_KCORE_ROUNDS} "
    "peeling rounds) of the undirected customer ⇄ supplier trade graph — "
    "the dense-subgraph extractor behind spam-cluster and community-"
    "kernel mining on link corpora. Each round drops nodes of degree < k "
    "and restricts edges to survivors; everything is integer counting and "
    "set restriction, so the rounds unroll into exact chained CTEs (the "
    "BFS/LPA oracle device). The edge set shrinks monotonically — at "
    "100 TB the peeling cost DECREASES per round, and each round is one "
    "degree shuffle plus two node-key semi-joins (operators/graph.py:"
    "kcore_peel; lineage truncated per round via localCheckpoint).",
    tags=("graph", "iterative", "curation"),
)
def graph_kcore_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineering_project_spark.operators.graph import kcore_peel

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    base = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = _symmetrize(base)
    core = kcore_peel(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS)
    return core.select(
        F.when(F.col("src") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("src div 2").alias("entity_id"),
        "deg",
    )


@register(
    "graph_degree_distribution",
    sql="""
    WITH base AS (
        SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (
        SELECT src, dst FROM base
        UNION ALL
        SELECT dst AS src, src AS dst FROM base
    ),
    deg AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY src)
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
               AS node_type,
           CAST(length(bin(CAST(d AS BIGINT))) - 1 AS INTEGER) AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(d) AS BIGINT) AS min_degree,
           CAST(max(d) AS BIGINT) AS max_degree
    FROM deg GROUP BY node_type, log2_bucket
    """,
    doc="Degree distribution of the trade graph in power-of-two buckets "
    "(bucket k holds degrees in [2^k, 2^(k+1))) — the first diagnostic "
    "run on any link corpus: a heavy tail here is what decides salting, "
    "AQE skew handling, and whether PageRank's contribution shuffle needs "
    "a hot-key path. Bucketing uses the BINARY-STRING length of the "
    "degree, not floor(log2(d)) — integer-exact and engine-portable, "
    "where float log2 could straddle a bucket boundary by one ulp between "
    "engines. One degree aggregation, then a ~|buckets| rollup.",
    tags=("graph", "profile", "skew"),
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    base = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    # r13 (guide §1.3 plan reading): the old
    # base.union(base.select(swapped)) computed the JOIN+DISTINCT subtree
    # TWICE — the swap projection collapses into the distinct aggregate's
    # output, so the union branches stop being identical subtrees and
    # ReuseExchange cannot fire. One lineage instead: each deduped pair
    # explodes map-side into both directions, then one partial-agg'd
    # groupBy. Marginal 2.4 → 0.32 s at sf0.5 (tools/ab_degree_dist.py;
    # a persist of the pair frame measured 0.78 — the explode needs no
    # cache memory and wins anyway).
    edges = base.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    return (
        deg.groupBy(
            F.when(F.col("src") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            (F.length(F.bin(F.col("d").cast("bigint"))) - 1)
            .cast("int")
            .alias("log2_bucket"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_nodes"),
            F.min("d").cast("bigint").alias("min_degree"),
            F.max("d").cast("bigint").alias("max_degree"),
        )
    )


@register(
    "graph_adamic_adar",
    sql="""
    WITH e AS (
        SELECT o_custkey AS c, l_suppkey AS s
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1, 2
        HAVING count(DISTINCT o_orderkey) >= 2
    ),
    deg AS (SELECT s, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY s),
    w AS (
        SELECT s, CAST(floor(1000000.0 / ln(CAST(d AS DOUBLE)) + 0.5) AS BIGINT)
                  AS w_unats
        FROM deg WHERE d >= 2
    ),
    pairs AS (
        SELECT a.c AS cust_a, b.c AS cust_b, w.w_unats
        FROM e a JOIN e b ON a.s = b.s AND a.c < b.c
        JOIN w ON w.s = a.s
    )
    SELECT cust_a, cust_b,
           CAST(count(*) AS BIGINT) AS n_common,
           ROUND(CAST(sum(w_unats) AS DOUBLE) / 1000000, 6) AS aa_score
    FROM pairs
    GROUP BY 1, 2
    HAVING count(*) >= 3
    """,
    doc="Adamic-Adar link prediction over the customer-supplier trade "
    "graph — the neighbor-weighted common-contact score (score(u,v) = "
    "Σ_{shared s} 1/ln(deg(s))): rare shared suppliers say more than "
    "ubiquitous ones. The missing-link family next to "
    "`suppliers_cooccurrence` (raw counts) and `parts_triangle_affinity` "
    "(closed triangles). Scale shape: candidate pairs come from a "
    "postings-style self-join on the shared supplier — cost Σ deg², NOT "
    "|V|² — after a repeat-interaction prune (≥2 distinct orders per "
    "edge) that removes one-off noise edges and, with it, the worst hub "
    "fan-out; the 1/ln(deg) weight also makes the surviving hubs the "
    "least informative, which is why the standard production variant of "
    "this operator caps or drops hubs rather than enumerating their "
    "pairs. Determinism: each supplier's weight floor-quantizes to "
    "integer micro-units BEFORE the per-pair sum (integer addition is "
    "order-independent; summing raw 1/ln doubles across a shuffle is "
    "not), and the ≥3-common-neighbor floor keeps the output a stable, "
    "meaningful candidate set.",
    tags=("graph", "linkpred", "join"),
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .agg(F.countDistinct("o_orderkey").alias("n_ord"))
        .filter(F.col("n_ord") >= 2)
        .select("c", "s")
    )
    # e feeds three consumers (degree count + both sides of the pair
    # self-join); without a persist each one replays the orders⋈lineitem
    # join — three full fact scans at 100 TB instead of one
    e = e.persist()
    deg = e.groupBy("s").agg(F.count("*").cast("bigint").alias("d"))
    w = deg.filter(F.col("d") >= 2).select(
        "s",
        F.floor(F.lit(1_000_000.0) / F.log(F.col("d").cast("double")) + F.lit(0.5))
        .cast("bigint")
        .alias("w_unats"),
    )
    a = e.select(F.col("c").alias("cust_a"), "s")
    b = e.select(F.col("c").alias("cust_b"), "s")
    pairs = (
        a.join(b, "s")
        .filter(F.col("cust_a") < F.col("cust_b"))
        .join(F.broadcast(w), "s")
    )
    return (
        pairs.groupBy("cust_a", "cust_b")
        .agg(
            F.count("*").cast("bigint").alias("n_common"),
            F.round(F.sum("w_unats").cast("double") / 1_000_000, 6).alias(
                "aa_score"
            ),
        )
        .filter(F.col("n_common") >= 3)
    )


@register(
    "graph_clustering_coeff",
    sql="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
        SELECT a.l_partkey AS p1, b.l_partkey AS p2
        FROM op a
        JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= 2
    ),
    deg AS (
        SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
            SELECT p1 AS v FROM e UNION ALL SELECT p2 FROM e
        ) GROUP BY 1
    ),
    tri AS (
        SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
        FROM e e1
        JOIN e e2 ON e1.p2 = e2.p1
        JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
    ),
    tcnt AS (
        SELECT v, CAST(count(*) AS BIGINT) AS n_tri FROM (
            SELECT a AS v FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ) GROUP BY 1
    )
    SELECT d.v AS part_key,
           d.deg,
           COALESCE(t.n_tri, 0) AS n_triangles,
           ROUND(CAST(2 * COALESCE(t.n_tri, 0) AS DOUBLE)
                 / (d.deg * (d.deg - 1)), 6) AS clustering_coeff
    FROM deg d LEFT JOIN tcnt t ON t.v = d.v
    WHERE d.deg >= 2
    """,
    doc="Local clustering coefficient per part over the weight-thresholded "
    "co-purchase graph (same >= 2-order edge set as "
    "`parts_triangle_affinity`): C(v) = 2*tri(v) / (deg(v)*(deg(v)-1)), "
    "the 'are my neighbors also neighbors' density that separates "
    "genuine product communities from hub-and-spoke accessories — the "
    "per-node refinement of the global triangle count. Reuses the "
    "join-free edge build (per-order sorted distinct-part arrays -> "
    "array-side pair unfold -> weight filter; one scan, two shuffles) "
    "and the p1<p2-oriented wedge join that enumerates each triangle "
    "exactly once; degrees fall out of the SAME cached edge list, so "
    "the extra cost over the triangle query is one small groupBy and a "
    "broadcast-sized left join on the node table. Exact integer "
    "triangle/degree counts; one float division per node at the end.",
    tags=("graph", "join", "profile"),
)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    pairs = per_order.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) -> "
                "transform(slice(ps, i + 2, size(ps)), "
                "y -> struct(x AS p1, y AS p2))))"
            )
        ).alias("e")
    )
    edges = (
        pairs.groupBy(F.col("e.p1").alias("p1"), F.col("e.p2").alias("p2"))
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= 2)
        .select("p1", "p2")
        .persist()
    )
    deg = (
        edges.select(F.col("p1").alias("v"))
        .unionAll(edges.select(F.col("p2").alias("v")))
        .groupBy("v")
        .agg(F.count("*").cast("bigint").alias("deg"))
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.p2") == F.col("e2.p1"))
        .join(
            e3,
            (F.col("e3.p1") == F.col("e1.p1"))
            & (F.col("e3.p2") == F.col("e2.p2")),
        )
        .select(
            F.col("e1.p1").alias("a"),
            F.col("e1.p2").alias("b"),
            F.col("e2.p2").alias("c"),
        )
    )
    corners = (
        tri.select(F.col("a").alias("v"))
        .unionAll(tri.select(F.col("b").alias("v")))
        .unionAll(tri.select(F.col("c").alias("v")))
    )
    tcnt = corners.groupBy("v").agg(
        F.count("*").cast("bigint").alias("n_tri")
    )
    n_tri = F.coalesce(F.col("n_tri"), F.lit(0)).cast("bigint")
    return (
        deg.filter(F.col("deg") >= 2)
        .join(tcnt, "v", "left")
        .select(
            F.col("v").alias("part_key"),
            "deg",
            n_tri.alias("n_triangles"),
            F.round(
                (n_tri * 2).cast("double")
                / (F.col("deg") * (F.col("deg") - 1)),
                6,
            ).alias("clustering_coeff"),
        )
    )


@register(
    "graph_assortativity",
    sql="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
        SELECT a.l_partkey AS p1, b.l_partkey AS p2
        FROM op a
        JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= 2
    ),
    deg AS (
        SELECT v, CAST(count(*) AS HUGEINT) AS d FROM (
            SELECT p1 AS v FROM e UNION ALL SELECT p2 FROM e
        ) GROUP BY 1
    ),
    ends AS (
        SELECT da.d AS x, db.d AS y
        FROM e JOIN deg da ON da.v = e.p1 JOIN deg db ON db.v = e.p2
    ),
    sym AS (
        SELECT x, y FROM ends UNION ALL SELECT y AS x, x AS y FROM ends
    ),
    m AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               sum(x) AS sx, sum(x * x) AS sxx, sum(x * y) AS sxy
        FROM sym
    )
    SELECT CAST(n / 2 AS BIGINT) AS n_edges,
           ROUND(CAST(n * sxy - sx * sx AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS assortativity
    FROM m
    """,
    doc="Degree assortativity of the thresholded co-purchase graph — "
    "Newman's r: the Pearson correlation of endpoint degrees over every "
    "edge, counted in both orientations (positive = hubs buddy with "
    "hubs, negative = hub-and-spoke; drives whether graph partitioning "
    "or hub-replication is the right 100 TB layout). Same cached edge "
    "list as the triangle/clustering queries; degrees join back onto the "
    "edges (two hash joins on node id), and the statistic collapses to "
    "exact HUGEINT/DECIMAL38 moments (n, Σx, Σx², Σxy — symmetry makes "
    "Σy/Σy² redundant) with one float division at the end, bit-identical "
    "across engines.",
    tags=("graph", "profile", "stats"),
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    pairs = per_order.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) -> "
                "transform(slice(ps, i + 2, size(ps)), "
                "y -> struct(x AS p1, y AS p2))))"
            )
        ).alias("e")
    )
    edges = (
        pairs.groupBy(F.col("e.p1").alias("p1"), F.col("e.p2").alias("p2"))
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= 2)
        .select("p1", "p2")
        .persist()
    )
    dec38 = "decimal(38,0)"
    deg = (
        edges.select(F.col("p1").alias("v"))
        .unionAll(edges.select(F.col("p2").alias("v")))
        .groupBy("v")
        .agg(F.count("*").cast(dec38).alias("d"))
    )
    da = deg.select(F.col("v").alias("p1"), F.col("d").alias("x"))
    db = deg.select(F.col("v").alias("p2"), F.col("d").alias("y"))
    ends = edges.join(da, "p1").join(db, "p2").select("x", "y")
    sym = ends.select("x", "y").unionAll(
        ends.select(F.col("y").alias("x"), F.col("x").alias("y"))
    )
    m = sym.agg(
        F.count("*").cast(dec38).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx = F.col("n"), F.col("sx")
    return m.select(
        (n / 2).cast("bigint").alias("n_edges"),
        F.round(
            (n * F.col("sxy") - sx * sx).cast("double")
            / (n * F.col("sxx") - sx * sx).cast("double"),
            6,
        ).alias("assortativity"),
    )
