"""Distributed graph analytics over DataFrame edge lists.

The reference has no graph surface; this extends the engine's iterative-
algorithm family (connected components in ``operators.dedup``) with weighted
PageRank — the standard "importance over an interaction graph" primitive a
training-data pipeline uses for source/document authority weighting.

Scale shape: each iteration is one equi-join (ranks ⋈ edges on src) and one
hash-aggregate (sum contributions by dst) — exactly the primitives AQE
already plans well. Rank state is one row per node, edges are the fact;
``localCheckpoint`` cuts lineage each round so the plan stays constant-size
no matter how many iterations run. At web scale the same loop holds; you
pre-partition edges by src so every round's join is co-located (see
``bucketing.py``), making each iteration a single shuffle of the (small)
rank frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from data_engineering_nd_spark.catalog import load
from data_engineering_nd_spark.registry import query

# Max row count of a node-sized score/label vector that the iterative
# operators may broadcast into their checkpointed edge scan. A rank row is
# ~16 bytes of data (long id + double) — 4M rows builds a relation in the
# low hundreds of MB, inside the guide's broadcast comfort zone and far
# from the 8 GB / 512M-row hard cap. Above it the per-round join falls
# back to the shuffle path (the score vector is exchanged; the edge side
# is exchanged once per round, which is the correct trade once the vector
# no longer fits every executor). Parameterised so a cluster deployment
# can raise it with driver/executor memory (VERDICT r14 #2/#3).
_BCAST_NODE_LIMIT_CONF = "spark.graft.graph.broadcastNodeLimit"
_BCAST_NODE_LIMIT_DEFAULT = 4_000_000


def _bcast_limit(df: DataFrame) -> int:
    try:
        return int(
            df.sparkSession.conf.get(
                _BCAST_NODE_LIMIT_CONF, str(_BCAST_NODE_LIMIT_DEFAULT)
            )
        )
    except ValueError:
        return _BCAST_NODE_LIMIT_DEFAULT


def _gated_broadcast(df: DataFrame, n_rows: int | None) -> DataFrame:
    """Broadcast hint a node-count-sized frame ONLY when its (observed)
    row count is known to fit ``spark.graft.graph.broadcastNodeLimit``.

    The iterative graph operators learn their node counts for free — the
    counts ride the loop's own materialization jobs via ``Observation`` —
    so the gate costs nothing. Returning the frame unhinted restores the
    shuffle join, which is the right plan once the vector outgrows what a
    driver/executor can hold (an ungated ``F.broadcast`` of a node vector
    is an OOM at 10^9-node scale)."""
    if n_rows is not None and n_rows <= _bcast_limit(df):
        return F.broadcast(df)
    return df


def _loop_exec_conf(spark: SparkSession, broadcasting: bool):
    """Execution conf for a gated-broadcast iteration loop.

    When the broadcast gate is OPEN, every exchange inside the loop is
    provably tiny — the score/label vector fits a broadcast, and the only
    shuffles carry node-count-bounded partial-aggregate rows — so AQE's
    per-exchange re-planning (one driver round-trip per stage, the
    measured floor of these loops at bench scale) buys nothing; disable
    it for the loop's actions. When the gate is CLOSED (the vector
    outgrew the broadcast limit), AQE stays on: coalescing and skew
    handling earn their keep on rank-vector-sized exchanges. The switch
    therefore scales with the data, not with the local core count."""
    from contextlib import nullcontext

    from data_engineering_nd_spark.catalog import scoped_conf

    if broadcasting:
        return scoped_conf(spark, "spark.sql.adaptive.enabled", "false")
    return nullcontext()


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Weighted PageRank with dangling-mass redistribution.

    ``edges`` may repeat (src, dst) — multiplicity acts as edge weight.
    Convention: ranks sum to N (each node starts at 1.0), so
    rank' = (1 - d) + d * (in-contributions + dangling_mass / N).
    Fixed iteration count for deterministic output shape; convergence for
    typical graphs is well inside 10-20 rounds.
    """
    from pyspark.sql.window import Window

    # Loop-invariant work, done ONCE and materialized. (localCheckpoint
    # surfaces as Scan ExistingRDD with UnknownPartitioning — r14 plan
    # capture — so the per-round join must NOT rely on a preserved src
    # partitioning; the loop below broadcasts the rank vector into the
    # edge scan instead, and the edges never move again.) Normalization
    # by the source's total outgoing weight uses a window over the src
    # partitioning instead of a separate aggregate + self-join: one
    # shuffle fewer in setup, and exact — the weights are integer counts,
    # so the window sum is order-independent.
    w_src = Window.partitionBy("src")
    e_norm = (
        edges.groupBy(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        .repartition("src")
        .select(
            "src", "dst", (F.col("w") / F.sum("w").over(w_src)).alias("nw")
        )
        .localCheckpoint()
    )
    # nodes derive from the CHECKPOINTED frame — the (often expensive)
    # upstream of `edges` is never re-run.
    nodes = (
        e_norm.select(F.col("src").alias("id"))
        .union(e_norm.select(F.col("dst").alias("id")))
        .distinct()
        .repartition("id")
        .localCheckpoint()
    )
    # Loop-invariant: the dangling-node SET is fixed by the edges. When it
    # is empty (e.g. any symmetrized/undirected graph), dangling mass is
    # identically zero every round — skip the per-round mass aggregate AND
    # the contribs materialization (contribs is then consumed exactly once,
    # so the whole iteration folds into ONE action: join + agg + left-join,
    # halving per-round job-scheduling overhead). Both invariant counts
    # come from ONE job.
    srcs = e_norm.select(F.col("src").alias("id")).distinct()
    dsts = e_norm.select(F.col("dst").alias("id")).distinct()
    stats = (
        nodes.join(srcs.withColumn("__has_out", F.lit(1)), "id", "left")
        .join(dsts.withColumn("__has_in", F.lit(1)), "id", "left")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("__has_out").isNull(), F.lit(1))).alias("d"),
            F.count(F.when(F.col("__has_in").isNull(), F.lit(1))).alias("ni"),
        )
        .collect()[0]
    )
    n_nodes, n_dangling, n_no_in = stats["n"], stats["d"], stats["ni"]

    ranks = nodes.select("id", F.lit(1.0).alias("rank")).localCheckpoint()

    with _loop_exec_conf(edges.sparkSession, n_nodes <= _bcast_limit(edges)):
        for it in range(iterations):
            # One equi-join + one hash-agg: contributions flowing into each
            # dst. The node-sized rank vector BROADCASTS into the checkpointed
            # edge scan (gated on the observed node count — see
            # _gated_broadcast): the edge side never re-shuffles, and the only
            # Exchange per round carries the partial-aggregate output
            # (node-count-sized rows). The ungated shape exchanged BOTH sides
            # every round — an edge-sized shuffle write per iteration (r15
            # plan capture: SortMergeJoin with two Exchanges).
            rb = _gated_broadcast(ranks, n_nodes)
            contribs = (
                rb.join(e_norm, rb.id == e_norm.src)
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum(F.col("rank") * F.col("nw")).alias("c"))
            )
            if n_dangling:
                # localCheckpoint: contribs feeds BOTH the dangling-mass
                # aggregate and the rank update — materialize once instead of
                # running the join+agg twice. Dangling mass without touching
                # the rank frame again: every non-dangling source's rank flows
                # fully into contribs (its nw sums to 1), so
                # sum(contribs) = N - dangling_mass.
                contribs = contribs.localCheckpoint()
                dmass = contribs.agg(
                    (F.lit(float(n_nodes)) - F.coalesce(F.sum("c"), F.lit(0.0))).alias(
                        "dm"
                    )
                )
                inflow = F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dm") / F.lit(
                    float(n_nodes)
                )
                # contribs is node-count-bounded: same gate as the rank
                # vector (with AQE off in the gated loop an unhinted join
                # would revert to a per-round SortMergeJoin of both sides)
                updated = nodes.join(
                    _gated_broadcast(contribs, n_nodes), "id", "left"
                ).crossJoin(F.broadcast(dmass))
            elif n_no_in:
                inflow = F.coalesce(F.col("c"), F.lit(0.0))
                updated = nodes.join(
                    _gated_broadcast(contribs, n_nodes), "id", "left"
                )
            else:
                # Every node has in-edges (always true for symmetrized
                # graphs): contribs already covers all of `nodes`, so the
                # per-round nodes ⋈ contribs left join is an identity — skip
                # it. Each iteration is then exactly one co-partitioned join
                # + one hash-agg.
                inflow = F.col("c")
                updated = contribs
            ranks = updated.select(
                "id",
                (F.lit(1.0 - damping) + F.lit(damping) * inflow).alias("rank"),
            )
            # Checkpoint every K rounds, not every round: K lazy iterations
            # fold into ONE submitted job (one analysis/AQE pass, K chained
            # join+agg stages) instead of K jobs — driver-side per-action
            # overhead dominates tiny iterative workloads. The dangling path
            # still materializes contribs each round (its aggregate is an
            # action-forcing broadcast), so K only applies to the pure plan.
            if (it + 1) % checkpoint_every == 0 or it == iterations - 1:
                ranks = ranks.localCheckpoint()
    return ranks


@query("graph_pagerank_topk")  # oracle registered below (unrolled iterations)
def graph_pagerank_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 nodes of the customer↔supplier interaction graph by PageRank.

    Edges: one per distinct (customer, supplier) trading relationship in the
    fact (orders ⋈ lineitem), in both directions so rank flows through the
    bipartite graph. Node ids are disambiguated by parity (2k / 2k+1).
    Accuracy is pinned by tests/test_graph.py against a dense power-iteration
    oracle AND hash-verified against a 10-iteration unrolled SQL mirror
    (see _register_pagerank_oracle below): cross-engine float drift after
    10 rounds is ~1e-13, far inside the 6-dp rounding.
    """
    li = load(spark, "lineitem", sf_dir)
    orders = load(spark, "orders", sf_dir)
    rel = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cust_node"),
            (F.col("l_suppkey") * 2 + 1).alias("supp_node"),
        )
        .distinct()
    )
    edges = rel.select(
        F.col("cust_node").alias("src"), F.col("supp_node").alias("dst")
    ).union(rel.select(F.col("supp_node").alias("src"), F.col("cust_node").alias("dst")))
    ranks = pagerank(edges, iterations=10)
    return (
        ranks.select(
            "id",
            F.when(F.col("id") % 2 == 0, F.lit("customer")).otherwise(F.lit("supplier")).alias("kind"),
            F.round("rank", 6).alias("rank"),
        )
        .orderBy(F.desc("rank"), "id")
        .limit(20)
    )


@query(
    "graph_degree_distribution",
    oracle="""
    WITH rel AS (
        SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    deg AS (SELECT cust, COUNT(*) AS degree FROM rel GROUP BY cust)
    SELECT degree, COUNT(*) AS n_customers
    FROM deg GROUP BY degree ORDER BY degree
    """,
)
def graph_degree_distribution_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the customer->supplier trading graph (how
    many distinct suppliers each customer touches). Two hash-aggs back to
    back — the skew-detection profile run before any iterative graph
    algorithm, because the max-degree node bounds the per-round shuffle
    fan-in of PageRank/CC. Hash-matched against the oracle (exact integer
    aggregation, unlike the iterative double accumulation above)."""
    li = load(spark, "lineitem", sf_dir)
    orders = load(spark, "orders", sf_dir)
    rel = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    deg = rel.groupBy("cust").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("degree")
    )


def triangle_stats(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Exact triangle census of an undirected graph given as unique
    (a < b) edge pairs: one row with node/edge/wedge/triangle counts and
    the global clustering coefficient (3T / open+closed wedges).

    Scale shape — the degree-ordered join (Suri & Vassilvitskii's MR
    triangle counting): every edge is oriented from its lower-(degree, id)
    endpoint to the higher one, so each node's OUT-degree is O(sqrt(E))
    regardless of in-degree — the wedge join explodes hubs by their
    out-neighborhood only, which bounds intermediate rows by E^1.5 instead
    of sum(deg^2). Three hash joins + three 1-row aggregates; no iteration,
    no driver data pull."""
    # The edge frame feeds FIVE consumers (degree, both wedge sides, the
    # closing join, the edge count); its upstream is often a join+distinct
    # over a fact table — materialize once, like pagerank's e_norm.
    e = edges.select(F.col(a).alias("u"), F.col(b).alias("v")).localCheckpoint()
    deg = (
        e.select(F.col("u").alias("id"))
        .unionAll(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint()
    )
    ed = (
        e.join(deg.select(F.col("id").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("d").alias("dv")), "v")
    )
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # arcs is read three times (two wedge sides + closing); checkpoint the
    # orientation join once — |arcs| = |edges|, a narrow 3-column frame.
    arcs = ed.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("dst_deg"),
    ).localCheckpoint()
    x, y = arcs.alias("x"), arcs.alias("y")
    wedges = x.join(y, "src").filter(
        (F.col("x.dst_deg") < F.col("y.dst_deg"))
        | (
            (F.col("x.dst_deg") == F.col("y.dst_deg"))
            & (F.col("x.dst") < F.col("y.dst"))
        )
    ).select(F.col("x.dst").alias("w_a"), F.col("y.dst").alias("w_b"))
    closing = arcs.select(F.col("src").alias("w_a"), F.col("dst").alias("w_b"))
    tri = wedges.join(closing, ["w_a", "w_b"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
    node_stats = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint").alias("n_wedges"),
    )
    edge_cnt = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (
        node_stats.crossJoin(edge_cnt)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
            ).alias("global_clustering"),
        )
    )


@query(
    "graph_triangle_count",
    # The oracle closes triangles by id order (s1<s2<s3 triple join) —
    # a different orientation than Spark's degree order, but the same
    # exact COUNT, so equality here also validates the orientation logic.
    oracle="""
    WITH co AS (
        SELECT DISTINCT a.l_suppkey AS s1, b.l_suppkey AS s2,
               a.l_orderkey AS ok
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ),
    e AS (SELECT s1, s2 FROM co GROUP BY s1, s2 HAVING COUNT(*) >= 5),
    deg AS (
        SELECT id, COUNT(*) AS d
        FROM (SELECT s1 AS id FROM e UNION ALL SELECT s2 FROM e)
        GROUP BY id
    ),
    tri AS (
        SELECT COUNT(*) AS t
        FROM e x
        JOIN e y ON x.s1 = y.s1 AND x.s2 < y.s2
        JOIN e z ON z.s1 = x.s2 AND z.s2 = y.s2
    )
    SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
        (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
        (SELECT CAST(t AS BIGINT) FROM tri) AS n_triangles,
        (SELECT round(3.0 * t / (SELECT SUM(d * (d - 1) // 2) FROM deg), 6)
         FROM tri) AS global_clustering
    """,
)
def graph_triangle_count_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the supplier co-occurrence graph: suppliers are
    adjacent when they ship line items in >= 5 common orders (the support
    floor keeps the graph sparse as SF grows — at sf0.1 it keeps ~10% of
    co-occurring pairs). Triangle density + clustering coefficient is the
    profile run before community detection, and the wedge/triangle ratio
    is the standard skew diagnostic for the dedup cluster graphs above."""
    li = load(spark, "lineitem", sf_dir)
    a = li.select("l_orderkey", F.col("l_suppkey").alias("s1"))
    b = li.select("l_orderkey", F.col("l_suppkey").alias("s2"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("s1") < F.col("s2"))
        .select("s1", "s2", "l_orderkey")
        .distinct()
    )
    edges = (
        pairs.groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 5)
        .select("s1", "s2")
    )
    return triangle_stats(edges, "s1", "s2")


def _register_pagerank_oracle() -> None:
    """Hash-verify PageRank itself: the 10 fixed iterations unroll into 10
    chained (MATERIALIZED) CTEs — DuckDB would otherwise inline each CTE at
    every reference and re-scan parquet dozens of times. Cross-engine float
    drift is ~1e-13 after 10 rounds while ranks round to 6 dp, so the
    value hash is stable; verified equal at sf0.01 before registration."""
    from data_engineering_nd_spark.registry import ORACLE_SQL

    sql = """
    WITH rel AS MATERIALIZED (
        SELECT DISTINCT o.o_custkey * 2 AS cust, l.l_suppkey * 2 + 1 AS supp
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS MATERIALIZED (
        SELECT cust AS src, supp AS dst FROM rel
        UNION ALL SELECT supp, cust FROM rel
    ),
    w AS (SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS wt FROM edges GROUP BY 1, 2),
    outw AS (SELECT src, SUM(wt) AS ow FROM w GROUP BY 1),
    enorm AS MATERIALIZED (SELECT w.src, w.dst, wt / ow AS nw FROM w JOIN outw USING (src)),
    nodes AS MATERIALIZED (
        SELECT DISTINCT src AS id FROM edges UNION SELECT DISTINCT dst AS id FROM edges
    ),
    nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT id, 1.0 AS rank FROM nodes)
    """
    for i in range(10):
        sql += f""",
    c{i} AS MATERIALIZED (
        SELECT e.dst AS id, SUM(r.rank * e.nw) AS c
        FROM r{i} r JOIN enorm e ON r.id = e.src GROUP BY e.dst
    ),
    d{i} AS (SELECT nn.n - COALESCE((SELECT SUM(c) FROM c{i}), 0.0) AS dm FROM nn),
    r{i + 1} AS MATERIALIZED (
        SELECT nodes.id, 0.15 + 0.85 * (COALESCE(c{i}.c, 0.0) + d{i}.dm / nn.n) AS rank
        FROM nodes LEFT JOIN c{i} ON nodes.id = c{i}.id, d{i}, nn
    )
    """
    sql += """
    SELECT id,
           CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
           round(rank, 6) AS rank
    FROM r10 ORDER BY rank DESC, id LIMIT 20
    """
    ORACLE_SQL["graph_pagerank_topk"] = sql


_register_pagerank_oracle()


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et al.
    2007), made deterministic: every node starts labelled with its own id;
    each round every node adopts the label that is most frequent among its
    neighbours, ties broken by the SMALLEST label. Fixed synchronous rounds
    (no random visit order) so the result is a pure function of the edge
    set — which is what lets the driver value-hash it against an unrolled
    SQL mirror.

    Scale shape: identical to :func:`pagerank` — the undirected edge frame
    is materialized hash-partitioned by ``src`` ONCE, then each round is
    one equi-join (labels ⋈ edges) plus two hash-aggregates (count labels
    per (node, label), then arg-max per node via a single ``max(struct)``
    — no window, so no per-node sort). Label state is one row per node;
    the edges never move after round 0.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .union(edges.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
        .distinct()
        .repartition("src")
        .localCheckpoint()
    )
    labels = (
        e.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("lab"))
        .localCheckpoint()
    )
    for _ in range(iterations):
        labels = (
            e.join(labels, e.src == labels.id)
            .groupBy(F.col("dst").alias("nid"), "lab")
            .agg(F.count(F.lit(1)).alias("c"))
            # arg-max by (count DESC, label ASC) without a window: max of
            # (c, -lab) picks the highest count, then the smallest label.
            .groupBy(F.col("nid").alias("id"))
            .agg(F.max(F.struct(F.col("c"), (-F.col("lab")).alias("neg"))).alias("m"))
            .select("id", (-F.col("m.neg")).alias("lab"))
            .localCheckpoint()
        )
    return labels


@query("graph_label_propagation")  # oracle registered below (unrolled rounds)
def graph_label_propagation_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community labels over the jaccard-0.5 near-dup pair graph (the same
    edge set `dedup_cluster_assignment`/`dedup_cluster_star` compute
    connected components on): 5 synchronous label-propagation rounds.
    Where CC answers "what is transitively connected", LPA answers "what
    is densely connected" — on chained near-dup graphs it splits long
    weak chains that CC merges, which is the safer clustering to feed a
    keep-one-per-cluster dedup resolution. Hash-verified against a
    5-round unrolled SQL mirror sharing the pair CTEs with the cluster
    oracles, so CC-vs-LPA differences are attributable to the algorithm,
    never the edge set."""
    from data_engineering_nd_spark.operators.dedup import jaccard_pairs

    docs = load(spark, "documents", sf_dir).filter(F.col("doc_id") < 200)
    pairs = jaccard_pairs(docs, "doc_id", "text", "lang", threshold=0.5)
    labels = label_propagation(pairs, "id_a", "id_b", iterations=5)
    return labels.select(
        F.col("id").alias("doc_id"), F.col("lab").alias("community")
    )


def _register_label_propagation_oracle() -> None:
    """5 synchronous rounds unroll into 5 chained MATERIALIZED CTEs; each
    round is exact integer arithmetic (COUNT + arg-max with a total
    tie-break), so Spark and DuckDB agree bit-for-bit."""
    from data_engineering_nd_spark.operators.dedup import PAIR_EDGE_CTES
    from data_engineering_nd_spark.registry import ORACLE_SQL

    sql = "\n    WITH" + PAIR_EDGE_CTES + """,
    l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS lab FROM edges)
    """
    for i in range(5):
        sql += f""",
    l{i + 1} AS MATERIALIZED (
        SELECT id, lab FROM (
            SELECT e.dst AS id, l.lab, COUNT(*) AS c,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.dst
                       ORDER BY COUNT(*) DESC, l.lab ASC) AS rn
            FROM edges e JOIN l{i} l ON e.src = l.id
            GROUP BY e.dst, l.lab
        ) WHERE rn = 1
    )
    """
    sql += """
    SELECT id AS doc_id, lab AS community FROM l5
    """
    ORACLE_SQL["graph_label_propagation"] = sql


_register_label_propagation_oracle()


def common_neighbor_candidates(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int | None = 256,
) -> DataFrame:
    """Link prediction by neighborhood overlap: for every NON-adjacent node
    pair with at least one common neighbor, the common-neighbor count and
    the neighborhood-Jaccard score. On a near-dup pair graph these are the
    "two clusters that almost touch" — the candidates a dedup pipeline
    re-scores with the expensive exact similarity before deciding whether
    to merge clusters CC kept apart.

    Scale shape: one wedge self-join (adjacency ⋈ adjacency on the shared
    endpoint) + one hash-agg + one anti-join against the edge set. The
    wedge join is quadratic per NODE (sum of deg^2), not per graph —
    ``max_degree`` drops hub nodes as wedge centers (a hub connecting
    everything predicts nothing anyway), bounding the join output by
    n * max_degree exactly like the LSH hot-bucket cap."""
    adj = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    ).localCheckpoint()
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    centers = adj.join(deg, "u")
    if max_degree is not None:
        centers = centers.filter(F.col("deg") <= max_degree)
    w1 = centers.select(F.col("u").alias("w"), F.col("v").alias("a"))
    w2 = centers.select(F.col("u").alias("w"), F.col("v").alias("b"))
    wedges = (
        w1.join(w2, "w")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common_neighbors"))
    )
    # keep only non-adjacent pairs (the edge itself is already known)
    non_adj = wedges.join(
        adj.select(F.col("u").alias("a"), F.col("v").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    da = deg.select(F.col("u").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("u").alias("b"), F.col("deg").alias("deg_b"))
    return (
        non_adj.join(da, "a")
        .join(db, "b")
        .select(
            F.col("a").alias("id_a"),
            F.col("b").alias("id_b"),
            "common_neighbors",
            F.round(
                F.col("common_neighbors").cast("double")
                / (
                    F.col("deg_a") + F.col("deg_b") - F.col("common_neighbors")
                ).cast("double"),
                6,
            ).alias("nb_jaccard"),
        )
    )


@query(
    "graph_common_neighbors",
    oracle=None,  # registered below (shares the pair CTEs)
)
def graph_common_neighbors_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-repair candidates over the jaccard-0.5 near-dup graph: pairs
    of docs that are NOT direct near-dups but share near-dup neighbors."""
    from data_engineering_nd_spark.operators.dedup import jaccard_pairs

    docs = load(spark, "documents", sf_dir).filter(F.col("doc_id") < 200)
    pairs = jaccard_pairs(docs, "doc_id", "text", "lang", threshold=0.5)
    # max_degree=None: the DuckDB oracle has no hub cap, so the gated query
    # must not apply one either (ADVICE r05 #1 — the default 256 was a
    # silent no-op only because the doc_id<200 gate bounds degree at 199).
    # Production callers keep the default cap.
    return common_neighbor_candidates(
        pairs, "id_a", "id_b", max_degree=None
    ).orderBy(F.desc("common_neighbors"), "id_a", "id_b")


def _register_common_neighbors_oracle() -> None:
    from data_engineering_nd_spark.operators.dedup import PAIR_EDGE_CTES
    from data_engineering_nd_spark.registry import ORACLE_SQL

    ORACLE_SQL["graph_common_neighbors"] = (
        "\n    WITH" + PAIR_EDGE_CTES + r""",
    deg AS (SELECT src AS u, COUNT(*) AS deg FROM edges GROUP BY src),
    wedges AS (
        SELECT w1.dst AS a, w2.dst AS b, COUNT(*) AS common_neighbors
        FROM edges w1 JOIN edges w2 ON w1.src = w2.src AND w1.dst < w2.dst
        GROUP BY 1, 2
    ),
    non_adj AS (
        SELECT w.* FROM wedges w
        WHERE NOT EXISTS (
            SELECT 1 FROM edges e WHERE e.src = w.a AND e.dst = w.b
        )
    )
    SELECT n.a AS id_a, n.b AS id_b, n.common_neighbors,
           round(CAST(n.common_neighbors AS DOUBLE)
                 / CAST(da.deg + db.deg - n.common_neighbors AS DOUBLE), 6)
               AS nb_jaccard
    FROM non_adj n
    JOIN deg da ON da.u = n.a
    JOIN deg db ON db.u = n.b
    ORDER BY n.common_neighbors DESC, id_a, id_b
    """
    )


_register_common_neighbors_oracle()


def kcore(
    edges: DataFrame,
    k: int = 2,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 6,
) -> DataFrame:
    """k-core peeling: repeatedly remove nodes with degree < k (and their
    edges) for a FIXED number of synchronous rounds; returns surviving
    (id, degree). The k-core is the standard "dense enough to trust"
    subgraph filter — run on a near-dup graph it separates genuine
    duplicate families from incidental one-edge bridges before clustering.

    Fixed rounds keep the result a pure function of the edge set (the SQL
    mirror unrolls the same rounds); on real corpora peeling converges in
    a handful of rounds because degrees only shrink. Per round: one
    degree hash-agg + two semi-joins — the CC/LPA template. At 100 TB the
    edge frame is the fact; it shrinks monotonically, and each round's
    semi-join keys on node id only."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .union(edges.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(rounds):
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("src")
        e = (
            e.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .localCheckpoint()
        )
    return (
        e.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
        .filter(F.col("degree") >= k)
    )


@query("graph_kcore")  # oracle registered below (unrolled rounds)
def graph_kcore_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the jaccard-0.5 near-dup graph: the nodes that survive
    when one-edge bridges are peeled away — the trustworthy duplicate
    families."""
    from data_engineering_nd_spark.operators.dedup import jaccard_pairs

    docs = load(spark, "documents", sf_dir).filter(F.col("doc_id") < 200)
    pairs = jaccard_pairs(docs, "doc_id", "text", "lang", threshold=0.5)
    return kcore(pairs, k=2, src="id_a", dst="id_b").select(
        F.col("id").alias("doc_id"), "degree"
    )


def _register_kcore_oracle() -> None:
    from data_engineering_nd_spark.operators.dedup import PAIR_EDGE_CTES
    from data_engineering_nd_spark.registry import ORACLE_SQL

    sql = "\n    WITH" + PAIR_EDGE_CTES + """,
    e0 AS MATERIALIZED (SELECT src, dst FROM edges)
    """
    for i in range(6):
        sql += f""",
    k{i} AS MATERIALIZED (
        SELECT src FROM e{i} GROUP BY src HAVING COUNT(*) >= 2
    ),
    e{i + 1} AS MATERIALIZED (
        SELECT e.src, e.dst FROM e{i} e
        WHERE e.src IN (SELECT src FROM k{i})
          AND e.dst IN (SELECT src FROM k{i})
    )
    """
    sql += """
    SELECT src AS doc_id, CAST(COUNT(*) AS BIGINT) AS degree
    FROM e6 GROUP BY src HAVING COUNT(*) >= 2
    """
    ORACLE_SQL["graph_kcore"] = sql


_register_kcore_oracle()


# ---------------------------------------------------------------------------
# Multi-source BFS: hop distance from a seed set, the remaining classic of
# the iterative family (PageRank, CC, LPA, k-core, triangles are covered).
# A pipeline uses this as "trust radius" / taint propagation: how many dup-
# graph hops is a document from a known-good (or known-bad) seed set.
# ---------------------------------------------------------------------------


def bfs_layers(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 4,
) -> DataFrame:
    """Minimum hop distance (<= max_hops) from any seed, as (id, dist).

    Frontier expansion: each round joins the CURRENT FRONTIER (not the
    whole visited set) to the edges and anti-joins out already-visited
    nodes, so round cost is frontier-sized — the standard distributed BFS.
    localCheckpoint cuts lineage per round (constant-size plan); the loop
    stops early when a frontier empties. Seeds not present in the edge
    set still appear at dist 0.

    Scale shape: hop-bounded joins on node id; pre-partition edges by src
    (bucketing.py) to co-locate every round's join at cluster scale.
    Distances are exact minima because expansion is level-synchronous: a
    node first reached in round h cannot have a shorter path."""
    dist = (
        seeds.select(F.col(seeds.columns[0]).alias("id"))
        .distinct()
        .withColumn("dist", F.lit(0))
        .localCheckpoint()
    )
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    frontier = dist
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["id"] == e["src"])
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(dist, "id", "left_anti")
            .withColumn("dist", F.lit(hop))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return dist


@query(
    "graph_bfs_layers",
    oracle=None,  # registered below (shares the pair CTEs)
)
def graph_bfs_layers_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance (<= 4) from the doc_id % 10 == 0 seed nodes over the
    jaccard-0.5 near-dup graph — the same edge set every other gated graph
    query verifies against. The oracle is the recursive-SQL minimum-hop
    closure, so layer assignment (not just reachability) is value-hashed."""
    from data_engineering_nd_spark.operators.dedup import jaccard_pairs

    docs = load(spark, "documents", sf_dir).filter(F.col("doc_id") < 200)
    pairs = jaccard_pairs(docs, "doc_id", "text", "lang", threshold=0.5)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    seeds = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .filter(F.col("doc_id") % 10 == 0)
    )
    return bfs_layers(edges, seeds, max_hops=4).select(
        F.col("id").alias("doc_id"), F.col("dist").cast("int").alias("dist")
    )


def shortest_paths(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    max_hops: int = 4,
) -> DataFrame:
    """Hop-bounded weighted shortest distance from any seed, as
    (id, dist) — Bellman-Ford with the frontier optimization, the
    weighted extension of :func:`bfs_layers` (VERDICT r07 task #5).

    Round k relaxes only nodes IMPROVED in round k-1 (candidates from
    unchanged nodes were already offered last round and are subsumed), so
    round cost is frontier-sized, not graph-sized. After round k the
    distances are exactly the minima over paths of <= k edges — the
    classic Bellman-Ford invariant, which is also what the recursive-CTE
    oracle enumerates — so the bounded run is layer-exact, not an
    approximation of the unbounded answer. localCheckpoint per round
    keeps the plan constant-size; the loop stops early once no distance
    improves (guaranteed <= |V|-1 rounds on negative-cycle-free graphs;
    negative EDGES are fine, this is Bellman-Ford, not Dijkstra).

    Scale shape: two shuffles per round, both on node id (frontier ⋈
    edges, then the per-node min). Pre-partition edges by ``src``
    (bucketing.py) to co-locate every round's join at cluster scale."""
    dist = (
        seeds.select(F.col(seeds.columns[0]).alias("id"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight).cast("long").alias("w"),
    )
    frontier = dist
    for _ in range(max_hops):
        cand = (
            frontier.join(e, frontier["id"] == e["src"])
            .select(
                F.col("dst").alias("id"),
                (frontier["dist"] + e["w"]).alias("cand"),
            )
            .groupBy("id")
            .agg(F.min("cand").alias("cand"))
        )
        j = dist.join(cand, "id", "full_outer")
        improved = (
            j.filter(F.col("dist").isNull() | (F.col("cand") < F.col("dist")))
            .select("id", F.col("cand").alias("dist"))
            .localCheckpoint()
        )
        if improved.isEmpty():
            break
        # least() skips nulls: keeps the old best, the new offer, or both
        dist = j.select(
            "id", F.least("dist", "cand").alias("dist")
        ).localCheckpoint()
        frontier = improved
    return dist


@query(
    "graph_shortest_paths",
    oracle=None,  # registered below (shares the pair CTEs)
)
def graph_shortest_paths_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest distance (<= 4 hops) from the doc_id % 10 == 0
    seeds over the jaccard-0.5 near-dup graph, with content-derived
    integer weights w = (id_a + id_b) % 5 + 1 (symmetric, exact in both
    engines — no float accumulation along paths). The oracle enumerates
    all <= 4-edge paths via a recursive CTE and takes per-node minima, so
    the DISTANCES are value-hashed, not just reachability."""
    from data_engineering_nd_spark.operators.dedup import jaccard_pairs

    docs = load(spark, "documents", sf_dir).filter(F.col("doc_id") < 200)
    pairs = jaccard_pairs(
        docs, "doc_id", "text", "lang", threshold=0.5
    ).withColumn(
        "w", (F.col("id_a") + F.col("id_b")) % 5 + 1
    )
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "w"
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"), "w")
    )
    seeds = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .filter(F.col("doc_id") % 10 == 0)
    )
    return shortest_paths(edges, seeds, max_hops=4).select(
        F.col("id").alias("doc_id"), F.col("dist").cast("bigint").alias("dist")
    )


def _register_shortest_paths_oracle() -> None:
    from data_engineering_nd_spark.operators.dedup import PAIR_EDGE_CTES
    from data_engineering_nd_spark.registry import ORACLE_SQL

    # UNION (set) recursion over (id, d, hops) states: finite because d is
    # a bounded integer sum and hops <= 4; identical-state paths dedup.
    ORACLE_SQL["graph_shortest_paths"] = (
        "\n    WITH RECURSIVE" + PAIR_EDGE_CTES + r""",
    wedges AS (
        SELECT src, dst, (src + dst) % 5 + 1 AS w FROM edges
    ),
    reach(id, d, hops) AS (
        SELECT DISTINCT src, CAST(0 AS BIGINT), 0 FROM edges
        WHERE src % 10 = 0
        UNION
        SELECT e.dst, r.d + e.w, r.hops + 1
        FROM wedges e JOIN reach r ON e.src = r.id
        WHERE r.hops < 4
    )
    SELECT id AS doc_id, CAST(MIN(d) AS BIGINT) AS dist
    FROM reach GROUP BY id
    """
    )


_register_shortest_paths_oracle()


def _register_bfs_oracle() -> None:
    from data_engineering_nd_spark.operators.dedup import PAIR_EDGE_CTES
    from data_engineering_nd_spark.registry import ORACLE_SQL

    ORACLE_SQL["graph_bfs_layers"] = (
        "\n    WITH RECURSIVE" + PAIR_EDGE_CTES + r""",
    reach(id, d) AS (
        SELECT DISTINCT src, 0 FROM edges WHERE src % 10 = 0
        UNION
        SELECT e.dst, r.d + 1
        FROM edges e JOIN reach r ON e.src = r.id
        WHERE r.d < 4
    )
    SELECT id AS doc_id, CAST(MIN(d) AS INT) AS dist
    FROM reach GROUP BY id
    """
    )


_register_bfs_oracle()


# ---------------------------------------------------------------------------
# Personalized PageRank: rank relative to a SOURCE SET — the random walk
# restarts at the sources instead of uniformly, so high scores mean "close
# to these nodes through many short paths". The recommendation / related-
# items primitive (pins "customers like these" in the trading graph).
# ---------------------------------------------------------------------------


def personalized_pagerank(
    edges: DataFrame,
    sources,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 4,
) -> DataFrame:
    """PPR with restart to the uniform distribution over ``sources`` —
    a 1-column frame of node ids (rows outside the graph are ignored),
    or a callable nodes -> frame evaluated against the materialized node
    set (so selecting sources costs no second pass over the edge
    upstream).
    Ranks are probabilities (sum to 1): r' = d * (inflow + dangling_mass
    * restart) + (1 - d) * restart.

    Same loop skeleton as :func:`pagerank` (edges normalized and
    checkpointed ONCE, co-partitioned join per round), plus a
    frontier-style optimization global PageRank can't use: nodes the walk
    has not reached yet hold rank exactly 0.0, and the per-round join
    filters them out — early rounds touch only the sources'
    neighborhood, not the graph (the same work-proportional-to-frontier
    property as bfs_layers)."""
    from pyspark.sql.window import Window

    w_src = Window.partitionBy("src")
    e_norm = (
        edges.groupBy(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        .repartition("src")
        .select(
            "src", "dst", (F.col("w") / F.sum("w").over(w_src)).alias("nw")
        )
        .localCheckpoint()
    )
    ob_n = Observation()
    nodes = (
        e_norm.select(F.col("src").alias("id"))
        .union(e_norm.select(F.col("dst").alias("id")))
        .distinct()
        .repartition("id")
        .observe(ob_n, F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    # node count rides the checkpoint materialization (no extra job);
    # it gates the per-round broadcast of the reached-set-sized rank
    # vector, which can grow to at most n_nodes rows
    n_nodes = int(ob_n.get["n"])
    if callable(sources):
        # derive the source set from the CHECKPOINTED node frame — the
        # (often expensive) upstream of `edges` is evaluated exactly
        # once, never a second time for the sources
        sources = sources(nodes)
    ob_s = Observation()
    rs = (
        nodes.join(
            sources.select(F.col(sources.columns[0]).alias("id")).distinct(),
            "id",
        )
        .observe(ob_s, F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    # source count rides the checkpoint job too (was a separate .count())
    n_s = int(ob_s.get["n"])
    if n_s == 0:
        raise ValueError("no source node is present in the graph")
    restart_frame = rs.select("id", F.lit(1.0 / n_s).alias("restart"))

    # loop-invariant, measured once (same trick as pagerank): with no
    # dangling nodes the walk loses no mass, dm is IDENTICALLY zero —
    # skip the per-round mass aggregate AND the contribs checkpoint, so
    # checkpoint_every lazy rounds fold into one submitted job. (The
    # near-zero float residue 1 - sum(c) is NOT the same as true zero:
    # the branch must be structural, and the gated oracle commits to the
    # same branch for the symmetrized trading graph.)
    n_dangling = nodes.join(
        e_norm.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    ).count()

    # SPARSE rank representation through the loop: a node the walk has
    # not reached would hold exactly 0.0 and contribute nothing, so it
    # simply has no row — the per-round update is contribs FULL OUTER
    # restart (both frames are reached-set-sized, co-partitioned on id),
    # never a join against the dense node set. Sparse rows are > 0 by
    # construction (c is a sum of positive terms, restart positive), so
    # no explicit nonzero filter is needed. Zeros materialize ONCE at
    # the end.
    ranks = restart_frame.select(
        "id", F.col("restart").alias("rank")
    ).localCheckpoint()

    with _loop_exec_conf(
        edges.sparkSession, n_nodes <= _bcast_limit(edges)
    ):
        for it in range(iterations):
            if not n_dangling:
                # mass-conserving fast path, one exchange per round (global
                # pagerank's fast shape): the restart injection rides INTO
                # the contribution stream as 5 extra pre-agg rows, so the
                # per-dst sum directly yields d*inflow + (1-d)*rs — no
                # second join or agg. (Distributing d into the sum and the
                # in-sum accumulation order differ from the oracle's
                # d*SUM(..) + .. by ~1e-16/round — the same float-order
                # class the 6-8dp rounding already absorbs for pagerank.)
                # the reached-set-sized rank vector broadcasts into the
                # checkpointed edge scan (gated on the observed node count,
                # its upper bound): the edge side never re-shuffles and the
                # round's one Exchange carries partial-aggregate output only
                ranks = (
                    _gated_broadcast(ranks, n_nodes)
                    .join(e_norm, F.col("id") == F.col("src"))
                    .select(
                        F.col("dst").alias("id"),
                        (F.lit(damping) * F.col("rank") * F.col("nw")).alias("t"),
                    )
                    .unionByName(
                        restart_frame.select(
                            "id",
                            (F.lit(1.0 - damping) * F.col("restart")).alias("t"),
                        )
                    )
                    .groupBy("id")
                    .agg(F.sum("t").alias("rank"))
                )
                if (it + 1) % checkpoint_every == 0 or it == iterations - 1:
                    ranks = ranks.localCheckpoint()
                continue
            # dangling path: every non-dangling unit of rank lands in
            # contribs, so the dangling mass is 1 - sum(c) — no second pass
            # over ranks; contribs feeds both the mass aggregate and the
            # update, so materialize it once
            contribs = (
                _gated_broadcast(ranks, n_nodes)
                .join(e_norm, F.col("id") == F.col("src"))
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum(F.col("rank") * F.col("nw")).alias("c"))
                .localCheckpoint()
            )
            dmass = contribs.agg(
                (F.lit(1.0) - F.coalesce(F.sum("c"), F.lit(0.0))).alias("dm")
            )
            restart = F.coalesce(F.col("restart"), F.lit(0.0))
            ranks = (
                contribs.join(restart_frame, "id", "full")
                .crossJoin(F.broadcast(dmass))
                .select(
                    "id",
                    (
                        F.lit(damping)
                        * (
                            F.coalesce(F.col("c"), F.lit(0.0))
                            + F.col("dm") * restart
                        )
                        + F.lit(1.0 - damping) * restart
                    ).alias("rank"),
                )
            )
            if (it + 1) % checkpoint_every == 0 or it == iterations - 1:
                ranks = ranks.localCheckpoint()
    # densify once: unreached nodes surface with rank exactly 0.0
    return nodes.join(ranks, "id", "left").select(
        "id", F.coalesce(F.col("rank"), F.lit(0.0)).alias("rank")
    )


@query("graph_personalized_pagerank")  # oracle registered below (unrolled)
def graph_personalized_pagerank_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-15 nodes by PPR from the 5 lowest-id customer nodes of the
    customer↔supplier trading graph — "who is close to these customers".
    Same bipartite edges as graph_pagerank_topk; the oracle unrolls the
    10 iterations into materialized CTEs with bit-identical float
    arithmetic (drift ~1e-15 against 8-dp rounding)."""
    li = load(spark, "lineitem", sf_dir)
    orders = load(spark, "orders", sf_dir)
    rel = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cust_node"),
            (F.col("l_suppkey") * 2 + 1).alias("supp_node"),
        )
        .distinct()
    )
    edges = rel.select(
        F.col("cust_node").alias("src"), F.col("supp_node").alias("dst")
    ).union(
        rel.select(F.col("supp_node").alias("src"), F.col("cust_node").alias("dst"))
    )
    # the 5 lowest-id customer nodes, read off the operator's own
    # materialized node set (every cust_node is in it by construction) —
    # no second evaluation of the fact join
    sources = lambda nodes: (  # noqa: E731
        nodes.filter(F.col("id") % 2 == 0).orderBy("id").limit(5)
    )
    ranks = personalized_pagerank(edges, sources, iterations=10)
    return (
        ranks.select(
            "id",
            F.when(F.col("id") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("kind"),
            F.round("rank", 8).alias("ppr"),
        )
        .orderBy(F.desc("ppr"), "id")
        .limit(15)
    )


def _register_ppr_oracle() -> None:
    """Unrolled-iteration SQL mirror of graph_personalized_pagerank —
    the same MATERIALIZED-CTE construction as _register_pagerank_oracle,
    with the restart vector over the 5 lowest-id customer nodes."""
    from data_engineering_nd_spark.registry import ORACLE_SQL

    sql = """
    WITH rel AS MATERIALIZED (
        SELECT DISTINCT o.o_custkey * 2 AS cust, l.l_suppkey * 2 + 1 AS supp
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS MATERIALIZED (
        SELECT cust AS src, supp AS dst FROM rel
        UNION ALL SELECT supp, cust FROM rel
    ),
    w AS (SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS wt FROM edges GROUP BY 1, 2),
    outw AS (SELECT src, SUM(wt) AS ow FROM w GROUP BY 1),
    enorm AS MATERIALIZED (SELECT w.src, w.dst, wt / ow AS nw FROM w JOIN outw USING (src)),
    nodes AS MATERIALIZED (
        SELECT DISTINCT src AS id FROM edges UNION SELECT DISTINCT dst AS id FROM edges
    ),
    srcset AS MATERIALIZED (
        SELECT cust AS id FROM (SELECT DISTINCT cust FROM rel) ORDER BY cust LIMIT 5
    ),
    ns AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS k FROM srcset),
    restart AS MATERIALIZED (
        SELECT nodes.id,
               CASE WHEN srcset.id IS NOT NULL THEN 1.0 / ns.k ELSE 0.0 END AS rs
        FROM nodes LEFT JOIN srcset ON nodes.id = srcset.id, ns
    ),
    r0 AS (SELECT id, rs AS rank FROM restart)
    """
    # the symmetrized trading graph has NO dangling nodes (every node has
    # an out-edge), so the walk conserves mass structurally and the
    # update omits the dangling term — the SAME branch the operator
    # takes from its measured n_dangling == 0 (a float 1 - SUM(c)
    # residue here would NOT be zero, so both engines must commit to the
    # structural decision, not the arithmetic one)
    for i in range(10):
        sql += f""",
    c{i} AS MATERIALIZED (
        SELECT e.dst AS id, SUM(r.rank * e.nw) AS c
        FROM r{i} r JOIN enorm e ON r.id = e.src AND r.rank <> 0.0
        GROUP BY e.dst
    ),
    r{i + 1} AS MATERIALIZED (
        SELECT restart.id,
               0.85 * COALESCE(c{i}.c, 0.0) + 0.15 * restart.rs AS rank
        FROM restart LEFT JOIN c{i} ON restart.id = c{i}.id
    )
    """
    sql += """
    SELECT id,
           CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
           round(rank, 8) AS ppr
    FROM r10 ORDER BY ppr DESC, id LIMIT 15
    """
    ORACLE_SQL["graph_personalized_pagerank"] = sql


_register_ppr_oracle()


# ---------------------------------------------------------------------------
# Resource-allocation link prediction: the common-neighbors refinement that
# DISCOUNTS hub neighbors — RA(a,b) = sum over common neighbors w of
# 1/deg(w) (Zhou, Lu, Zhang 2009). A shared 3-degree neighbor is strong
# evidence two nodes belong together; a shared 10000-degree hub is noise.
# Unlike Adamic-Adar (1/ln deg) the per-neighbor term is a RATIONAL, so
# the score can be kept in exact integers end-to-end: no ln(), no float
# accumulation — the same estimator-determinism discipline as HLL/KMV.
# ---------------------------------------------------------------------------


def resource_allocation_candidates(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int | None = 256,
) -> DataFrame:
    """RA-scored link prediction over non-adjacent pairs: each wedge
    center w contributes floor(1e9 / deg(w)) — an exact BIGINT — to its
    endpoint pair, so the per-pair score sum is order-free and
    engine-exact; ra_score is the single e9 down-cast at the end.

    Scale shape: identical to :func:`common_neighbor_candidates` (one
    wedge self-join on the center + hash-agg + anti-join vs the edge
    set), with the same ``max_degree`` hub cap bounding the wedge join at
    n * max_degree. The RA term makes the cap principled as well as
    cheap: the dropped hubs are exactly the centers whose contribution
    1/deg is smallest."""
    adj = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    ).localCheckpoint()
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    centers = adj.join(deg, "u")
    if max_degree is not None:
        centers = centers.filter(F.col("deg") <= max_degree)
    centers = centers.withColumn(
        "ra_term_e9", F.expr("CAST(1000000000 DIV deg AS BIGINT)")
    )
    w1 = centers.select("u", F.col("v").alias("a"), "ra_term_e9")
    w2 = centers.select(F.col("u").alias("u2"), F.col("v").alias("b"))
    wedges = (
        w1.join(w2, w1["u"] == w2["u2"])
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum("ra_term_e9").cast("bigint").alias("ra_e9"),
        )
    )
    non_adj = wedges.join(
        adj.select(F.col("u").alias("a"), F.col("v").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    return non_adj.select(
        F.col("a").alias("id_a"),
        F.col("b").alias("id_b"),
        "common_neighbors",
        "ra_e9",
        (F.col("ra_e9").cast("double") / F.lit(1000000000.0)).alias("ra_score"),
    )


@query(
    "graph_resource_allocation",
    oracle=None,  # registered below (shares the pair CTEs)
)
def graph_resource_allocation_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RA link prediction over the jaccard-0.5 near-dup graph — the
    hub-discounted upgrade of graph_common_neighbors, same candidate set,
    exact-integer scores. max_degree=None mirrors the oracle (no hub cap;
    the doc_id < 200 gate bounds degree — see graph_common_neighbors)."""
    from data_engineering_nd_spark.operators.dedup import jaccard_pairs

    docs = load(spark, "documents", sf_dir).filter(F.col("doc_id") < 200)
    pairs = jaccard_pairs(docs, "doc_id", "text", "lang", threshold=0.5)
    return resource_allocation_candidates(
        pairs, "id_a", "id_b", max_degree=None
    ).orderBy(F.desc("ra_e9"), "id_a", "id_b")


def _register_resource_allocation_oracle() -> None:
    from data_engineering_nd_spark.operators.dedup import PAIR_EDGE_CTES
    from data_engineering_nd_spark.registry import ORACLE_SQL

    ORACLE_SQL["graph_resource_allocation"] = (
        "\n    WITH" + PAIR_EDGE_CTES + r""",
    degs AS (SELECT src AS u, COUNT(*) AS deg FROM edges GROUP BY src),
    wedges AS (
        SELECT e1.dst AS a, e2.dst AS b, e1.src AS w
        FROM edges e1 JOIN edges e2
          ON e1.src = e2.src AND e1.dst < e2.dst
    ),
    scored AS (
        SELECT wg.a, wg.b,
               COUNT(*) AS common_neighbors,
               CAST(SUM(1000000000 // d.deg) AS BIGINT) AS ra_e9
        FROM wedges wg JOIN degs d ON wg.w = d.u
        GROUP BY wg.a, wg.b
    )
    SELECT s.a AS id_a, s.b AS id_b, s.common_neighbors, s.ra_e9,
           CAST(s.ra_e9 AS DOUBLE) / 1000000000.0 AS ra_score
    FROM scored s
    LEFT JOIN edges e ON s.a = e.src AND s.b = e.dst
    WHERE e.src IS NULL
    """
    )


_register_resource_allocation_oracle()


# ---------------------------------------------------------------------------
# Local clustering coefficient: per-node "how clique-like is my
# neighborhood" — 2*triangles(v) / (deg(v)*(deg(v)-1)). The node-level
# refinement of graph_triangle_count's global census, and the standard
# community-structure / spam-farm feature. Exact integer triangle and
# degree counts; one rounded division per node.
# ---------------------------------------------------------------------------


def clustering_coefficient(
    edges: DataFrame, pairs: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node local clustering coefficient from an undirected edge list
    (``edges`` holds both directions; ``pairs`` the canonical a<b form).

    tri(v) counts neighbor pairs (u < w) that are themselves an edge: a
    wedge self-join on the center (u < w kills the double count) closed
    by a semi-join against the canonical pair list. deg(v) is one
    hash-agg. Nodes with deg < 2 report 0 by convention.

    Scale shape: the wedge join is deg^2 per center — at 100 TB cap or
    sample hub neighborhoods exactly as triangle_stats does (hub cap
    bounds the wedge fan-out; the census stays exact on the non-hub
    mass). The closing semi-join is an equi-join on (u, w), partitioned
    by the pair key, never a cross join."""
    e1 = edges.select(F.col(src).alias("center"), F.col(dst).alias("u"))
    e2 = edges.select(F.col(src).alias("center"), F.col(dst).alias("w"))
    wedges = e1.join(e2, "center").filter(F.col("u") < F.col("w"))
    closed = wedges.join(
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("w")),
        ["u", "w"],
        "semi",
    )
    tri = closed.groupBy("center").agg(F.count(F.lit(1)).alias("n_tri"))
    deg = edges.groupBy(src).agg(F.countDistinct(dst).alias("degree"))
    joined = deg.withColumnRenamed(src, "center").join(tri, "center", "left")
    return joined.select(
        F.col("center"),
        F.col("degree").cast("bigint").alias("degree"),
        F.coalesce(F.col("n_tri"), F.lit(0)).cast("bigint").alias("n_triangles"),
        F.when(F.col("degree") >= 2, F.lit(2.0) * F.coalesce(F.col("n_tri"), F.lit(0))
               / (F.col("degree").cast("double") * (F.col("degree").cast("double") - F.lit(1.0))))
        .otherwise(F.lit(0.0))
        .alias("coeff_raw"),
    )


@query(
    "graph_clustering_coefficient",
    oracle=None,  # registered below (shares the pair CTEs)
)
def graph_clustering_coefficient_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Local clustering coefficient over the jaccard-0.5 near-dup graph
    (same gated edge set as BFS/shortest-paths/PPR). Near-dup clusters
    are near-cliques, so coefficients land near 1 — and the value hash
    pins the exact triangle/degree integers plus the rounded ratio."""
    from data_engineering_nd_spark.functions.numeric import round_half_up
    from data_engineering_nd_spark.operators.dedup import jaccard_pairs

    docs = load(spark, "documents", sf_dir).filter(F.col("doc_id") < 200)
    pairs = jaccard_pairs(docs, "doc_id", "text", "lang", threshold=0.5)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    out = clustering_coefficient(edges, pairs)
    return out.select(
        F.col("center").alias("doc_id"),
        "degree",
        "n_triangles",
        round_half_up(F.col("coeff_raw"), 6).alias("clustering_coeff"),
    )


def _register_clustering_coefficient_oracle() -> None:
    from data_engineering_nd_spark.operators.dedup import PAIR_EDGE_CTES
    from data_engineering_nd_spark.registry import ORACLE_SQL

    ORACLE_SQL["graph_clustering_coefficient"] = (
        "\n    WITH RECURSIVE" + PAIR_EDGE_CTES + r""",
    deg AS (
        SELECT src AS id, COUNT(DISTINCT dst) AS degree FROM edges GROUP BY 1
    ),
    tri AS (
        SELECT e1.src AS id, COUNT(*) AS n_tri
        FROM edges e1
        JOIN edges e2 ON e1.src = e2.src AND e1.dst < e2.dst
        JOIN pairs p ON p.id_a = e1.dst AND p.id_b = e2.dst
        GROUP BY 1
    )
    SELECT d.id AS doc_id,
           CAST(d.degree AS BIGINT) AS degree,
           CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_triangles,
           CASE WHEN d.degree >= 2
                THEN floor(2.0 * COALESCE(t.n_tri, 0)
                           / (CAST(d.degree AS DOUBLE) * (CAST(d.degree AS DOUBLE) - 1.0))
                           * 1000000.0 + 0.5) / 1000000.0
                ELSE 0.0 END AS clustering_coeff
    FROM deg d LEFT JOIN tri t ON t.id = d.id
    """
    )


_register_clustering_coefficient_oracle()


# ---------------------------------------------------------------------------
# Strongly connected components: Orzan coloring (forward max-color fixpoint,
# backward root-marking, peel, repeat) with degree-trim acceleration
# ---------------------------------------------------------------------------


def scc(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_peels: int = 20,
    max_inner: int = 50,
) -> DataFrame:
    """Strongly connected components of a DIRECTED graph — (id, scc_id)
    with scc_id = the MAX member id. The distributed coloring algorithm
    (Orzan 2004; the Pregel/GraphX SCC shape), not Tarjan (inherently
    sequential, driver-sided):

    per peel round:
    1. TRIM: nodes with no in-edges or no out-edges in the live subgraph
       cannot sit on a cycle -> singleton SCCs, removed in a cheap
       fixpoint (kills the long condensation tails that would otherwise
       cost one full coloring round EACH).
    2. COLOR forward to fixpoint: c(v) = max(c(v), c(u)) over live edges
       u->v. Convergence witness: sum(c) strictly increases until fixed.
       After the fixpoint c(u) = max id that reaches u, so an SCC's
       members all share c = their own max member (a node m has
       c(m) >= m, hence the shared color IS a member).
    3. MARK backward from roots (c(r) = r) along SAME-COLOR edges: a
       marked u both reaches r (the backward walk) and is reached by r
       (its color), so marked(r) = exactly SCC(r). Extract, peel, repeat
       on the remainder (whose colors are now stale -> recolored next
       round).

    Every step is an equi-join + hash-agg with a localCheckpoint per
    iteration (constant plan size); inner fixpoints run <= the live
    subgraph's diameter, outer peels <= the condensation depth that
    survives trimming. Both loops carry convergence-or-raise guards —
    never a silent wrong answer. Self-loops are fine (singleton with a
    cycle still gets scc_id = its own id).

    Job shape: every fixpoint's convergence witness (row count / color
    sum) rides the checkpoint materialization itself via ``observe`` —
    one submitted job per iteration, not a checkpoint job plus a
    separate count/agg action."""
    e_all = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    ob_n = Observation()
    live_nodes = (
        e_all.select(F.col("src").alias("id"))
        .union(e_all.select(F.col("dst").alias("id")))
        .distinct()
        .observe(ob_n, F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    n_live = ob_n.get["n"]
    live_edges = e_all
    # Start from an EMPTY (id, scc_id) frame rather than None so an empty
    # edge set returns an empty DataFrame, not None (ADVICE r08) — callers
    # .select on the result unconditionally.
    out = live_nodes.filter(F.lit(False)).select(
        "id", F.col("id").alias("scc_id")
    )

    def _acc(res, part):
        return res.unionByName(part).localCheckpoint()

    # gate once on the starting node count: live_nodes only shrinks,
    # so every broadcast inside the loop is within the same bound
    with _loop_exec_conf(edges.sparkSession, n_live <= _bcast_limit(edges)):
        for _ in range(max_peels):
            if n_live == 0:
                return out
            # -- 1. trim fixpoint ---------------------------------------------
            for _t in range(max_inner):
                has_out = live_edges.select(F.col("src").alias("id")).distinct()
                has_in = live_edges.select(F.col("dst").alias("id")).distinct()
                ob_k = Observation()
                keep = (
                    live_nodes.join(
                        _gated_broadcast(has_out, n_live), "id", "left_semi"
                    )
                    .join(_gated_broadcast(has_in, n_live), "id", "left_semi")
                    .observe(ob_k, F.count(F.lit(1)).alias("n"))
                    .localCheckpoint()
                )
                n_keep = ob_k.get["n"]
                if n_keep == n_live:
                    break
                trimmed = live_nodes.join(keep, "id", "left_anti")
                out = _acc(out, trimmed.select("id", F.col("id").alias("scc_id")))
                live_nodes, n_live = keep, n_keep
                live_edges = (
                    live_edges.join(
                        _gated_broadcast(
                            live_nodes.select(F.col("id").alias("src")), n_live
                        ),
                        "src",
                    )
                    .join(
                        _gated_broadcast(
                            live_nodes.select(F.col("id").alias("dst")), n_live
                        ),
                        "dst",
                    )
                    .select("src", "dst")
                    .localCheckpoint()
                )
            else:
                raise RuntimeError("scc: trim fixpoint exceeded max_inner")
            if n_live == 0:
                return out
            # -- 2. forward max-color fixpoint --------------------------------
            ob_c0 = Observation()
            colors = (
                live_nodes.select("id", F.col("id").alias("c"))
                .observe(ob_c0, F.sum("c").alias("s"))
                .localCheckpoint()
            )
            prev = ob_c0.get["s"]
            for _i in range(max_inner):
                incoming = live_edges.join(
                    _gated_broadcast(
                        colors.select(F.col("id").alias("src"), F.col("c")),
                        n_live,
                    ),
                    "src",
                ).select(F.col("dst").alias("id"), "c")
                ob_c = Observation()
                colors = (
                    colors.unionByName(incoming)
                    .groupBy("id")
                    .agg(F.max("c").alias("c"))
                    .observe(ob_c, F.sum("c").alias("s"))
                    .localCheckpoint()
                )
                cur = ob_c.get["s"]
                if cur == prev:
                    break
                prev = cur
            else:
                raise RuntimeError("scc: coloring fixpoint exceeded max_inner")
            # -- 3. backward marking from roots along same-color edges --------
            same_color = (
                live_edges.join(
                    _gated_broadcast(
                        colors.select(
                            F.col("id").alias("src"), F.col("c").alias("cs")
                        ),
                        n_live,
                    ),
                    "src",
                )
                .join(
                    _gated_broadcast(
                        colors.select(
                            F.col("id").alias("dst"), F.col("c").alias("cd")
                        ),
                        n_live,
                    ),
                    "dst",
                )
                .filter(F.col("cs") == F.col("cd"))
                .select("src", "dst", F.col("cs").alias("c"))
                .localCheckpoint()
            )
            ob_m0 = Observation()
            marked = (
                colors.filter(F.col("c") == F.col("id"))
                .observe(ob_m0, F.count(F.lit(1)).alias("n"))
                .localCheckpoint()
            )
            prev_n = ob_m0.get["n"]
            for _i in range(max_inner):
                new = same_color.join(
                    _gated_broadcast(
                        marked.select(F.col("id").alias("dst"), F.col("c")),
                        n_live,
                    ),
                    ["dst", "c"],
                ).select(F.col("src").alias("id"), "c")
                ob_m = Observation()
                marked = (
                    marked.unionByName(new)
                    .distinct()
                    .observe(ob_m, F.count(F.lit(1)).alias("n"))
                    .localCheckpoint()
                )
                cur_n = ob_m.get["n"]
                if cur_n == prev_n:
                    break
                prev_n = cur_n
            else:
                raise RuntimeError("scc: marking fixpoint exceeded max_inner")
            out = _acc(out, marked.select("id", F.col("c").alias("scc_id")))
            ob_l = Observation()
            live_nodes = (
                live_nodes.join(marked, "id", "left_anti")
                .observe(ob_l, F.count(F.lit(1)).alias("n"))
                .localCheckpoint()
            )
            n_live = ob_l.get["n"]
            live_edges = (
                live_edges.join(
                    _gated_broadcast(
                        live_nodes.select(F.col("id").alias("src")), n_live
                    ),
                    "src",
                )
                .join(
                    _gated_broadcast(
                        live_nodes.select(F.col("id").alias("dst")), n_live
                    ),
                    "dst",
                )
                .select("src", "dst")
                .localCheckpoint()
            )
    raise RuntimeError(
        f"scc: {max_peels} peel rounds did not exhaust the graph — "
        "condensation depth exceeds the budget; raise max_peels"
    )


@query(
    "graph_scc",
    oracle="""
    WITH RECURSIVE rel AS (
        SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s,
               o.o_custkey % 3 AS tc, l.l_suppkey % 3 AS ts
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_custkey % 13 = 0 AND l.l_suppkey % 2 = 0
    ),
    edges AS (
        SELECT c AS src, s AS dst FROM rel WHERE tc <= ts
        UNION
        SELECT s AS src, c AS dst FROM rel WHERE tc = ts
    ),
    nodes AS (
        SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges
    ),
    reach AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
    ),
    mutual AS (
        SELECT r1.src AS u, r1.dst AS v
        FROM reach r1 JOIN reach r2
          ON r2.src = r1.dst AND r2.dst = r1.src
    )
    SELECT n.id,
           CAST(GREATEST(n.id, COALESCE(MAX(m.v), n.id)) AS BIGINT)
               AS scc_id
    FROM nodes n LEFT JOIN mutual m ON m.u = n.id
    GROUP BY n.id
    """,
)
def graph_scc_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCCs of the DIRECTED tiered trading graph: nodes sit in tier
    key%3; within a tier both edge directions exist (cycles), across
    tiers only low->high (a DAG between tiers). Ground truth therefore
    has exactly one non-trivial SCC per tier plus a singleton tail —
    structure that exercises every stage of the coloring algorithm:
    multi-peel extraction (foreign colors flow across the tier DAG),
    backward marking inside each tier, and degree-trim on the tail. The
    oracle computes membership from the recursive transitive closure
    (mutual reachability), so the value hash proves membership AND the
    max-member scc_id convention, node by node."""
    li = load(spark, "lineitem", sf_dir)
    orders = load(spark, "orders", sf_dir)
    rel = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter((F.col("o_custkey") % 13 == 0) & (F.col("l_suppkey") % 2 == 0))
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
            (F.col("o_custkey") % 3).alias("tc"),
            (F.col("l_suppkey") % 3).alias("ts"),
        )
        .distinct()
    )
    edges = rel.filter(F.col("tc") <= F.col("ts")).select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionByName(
        rel.filter(F.col("tc") == F.col("ts")).select(
            F.col("s").alias("src"), F.col("c").alias("dst")
        )
    )
    return scc(edges).select("id", F.col("scc_id").cast("bigint").alias("scc_id"))


# ---------------------------------------------------------------------------
# HITS (hubs & authorities): the directed link-analysis dual of PageRank —
# mutually recursive scores over a directed graph (Kleinberg 1999)
# ---------------------------------------------------------------------------


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 8,
) -> DataFrame:
    """Hub and authority scores by alternating power iteration:
    a(v) = sum of h(u) over in-edges, h(u) = sum of a(v) over out-edges,
    each side sum-normalized per round (the L1 variant — one aggregate
    instead of a sqrt). Returns (id, hub, authority) with 0.0 for the
    side a node does not participate in.

    Scale shape per round: the node-sized score vector BROADCASTS into
    the checkpointed edge scan (the edge side never shuffles — the old
    shape exchanged edge-sized contribution streams every half-round),
    the hash-agg exchanges only its partial-aggregate output (node-
    count-sized rows), and the L1 normalization total rides the same
    job via ``observe`` → literal divisor. The old shape additionally
    ran the full edge-join TWICE per half-round (once under the
    broadcast-total subtree, once in the checkpoint) — ~135 driver
    round-trips for 8 rounds; this shape runs ~2 jobs per half-round.
    On the bipartite trading graph hubs are customers and authorities
    suppliers, so the two score vectors never mix; on a general digraph
    both sides exist for every node. The broadcast is GATED on the score
    vector's observed row count (``_gated_broadcast``) — each half-round
    learns the next vector's exact size for free from the same observe,
    and the first hub vector is bounded by an approx-distinct-src count
    riding the edge checkpoint — so at cluster scale the same shape
    degrades to a shuffle join instead of a driver OOM once the score
    vector outgrows a broadcast (VERDICT r14 #2)."""
    ob_e = Observation()
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .observe(
            ob_e, F.approx_count_distinct("src", rsd=0.02).alias("n_src")
        )
        .localCheckpoint()
    )
    # 2% rsd estimate, inflated 25% for gate headroom (HLL error has
    # heavier-than-Gaussian tails at specific cardinalities) — only the
    # FIRST broadcast uses it; exact per-round counts ride the loop's
    # observes
    n_hub = int(ob_e.get["n_src"] * 1.25)
    hub = e.select("src").distinct().select(
        F.col("src").alias("id"), F.lit(1.0).alias("h")
    )
    auth = None
    with _loop_exec_conf(edges.sparkSession, n_hub <= _bcast_limit(edges)):
        for _ in range(iterations):
            ob_a = Observation()
            a_raw = (
                e.join(
                    _gated_broadcast(
                        hub.select(F.col("id").alias("src"), "h"), n_hub
                    ),
                    "src",
                )
                .groupBy("dst")
                .agg(F.sum("h").alias("raw"))
                .observe(
                    ob_a,
                    F.sum("raw").alias("tot"),
                    F.count(F.lit(1)).alias("n"),
                )
                .localCheckpoint()
            )
            a_tot = float(ob_a.get["tot"])
            n_auth = int(ob_a.get["n"])
            auth = a_raw.select(
                F.col("dst").alias("id"),
                (F.col("raw") / F.lit(a_tot)).alias("a"),
            )
            ob_h = Observation()
            h_raw = (
                e.join(
                    _gated_broadcast(
                        auth.select(F.col("id").alias("dst"), "a"), n_auth
                    ),
                    "dst",
                )
                .groupBy("src")
                .agg(F.sum("a").alias("raw"))
                .observe(
                    ob_h,
                    F.sum("raw").alias("tot"),
                    F.count(F.lit(1)).alias("n"),
                )
                .localCheckpoint()
            )
            h_tot = float(ob_h.get["tot"])
            n_hub = int(ob_h.get["n"])
            hub = h_raw.select(
                F.col("src").alias("id"),
                (F.col("raw") / F.lit(h_tot)).alias("h"),
            )
    return hub.join(auth, "id", "full_outer").select(
        "id",
        F.coalesce("h", F.lit(0.0)).alias("hub"),
        F.coalesce("a", F.lit(0.0)).alias("authority"),
    )


def _register_hits_oracle() -> None:
    """Unrolled 8-round mirror (the pagerank-oracle pattern): every round
    CTE is MATERIALIZED so DuckDB computes it once instead of inlining
    the chain exponentially. Cross-engine float drift after 8 rounds is
    ~1e-14 while scores round to 6 dp."""
    from data_engineering_nd_spark.registry import ORACLE_SQL

    sql = """
    WITH rel AS MATERIALIZED (
        SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    h0 AS (SELECT DISTINCT src AS id, 1.0 AS h FROM rel)
    """
    for i in range(8):
        sql += f""",
    ar{i} AS MATERIALIZED (
        SELECT e.dst, SUM(h.h) AS raw
        FROM rel e JOIN h{i} h ON h.id = e.src GROUP BY e.dst
    ),
    a{i} AS MATERIALIZED (
        SELECT dst AS id, raw / (SELECT SUM(raw) FROM ar{i}) AS a FROM ar{i}
    ),
    hr{i} AS MATERIALIZED (
        SELECT e.src, SUM(a.a) AS raw
        FROM rel e JOIN a{i} a ON a.id = e.dst GROUP BY e.src
    ),
    h{i + 1} AS MATERIALIZED (
        SELECT src AS id, raw / (SELECT SUM(raw) FROM hr{i}) AS h FROM hr{i}
    )
    """
    sql += """
    , final AS (
        SELECT COALESCE(h.id, a.id) AS id,
               COALESCE(h.h, 0.0) AS hub,
               COALESCE(a.a, 0.0) AS authority
        FROM h8 h FULL OUTER JOIN a7 a ON a.id = h.id
    ),
    ranked AS (
        SELECT CASE WHEN id % 2 = 0 THEN 'hub' ELSE 'authority' END AS kind,
               id,
               CASE WHEN id % 2 = 0 THEN hub ELSE authority END AS score,
               row_number() OVER (
                   PARTITION BY id % 2
                   ORDER BY round(CASE WHEN id % 2 = 0 THEN hub
                                       ELSE authority END, 6) DESC, id)
                   AS rnk
        FROM final
    )
    SELECT kind, id, round(score, 6) AS score, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 10
    """
    ORACLE_SQL["graph_hits"] = sql


@query("graph_hits")
def graph_hits_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 hubs (customers) and top-10 authorities (suppliers) of the
    directed trading graph after 8 HITS rounds — a high-authority
    supplier is one bought from by high-hub customers, and vice versa,
    which is exactly the mutual-reinforcement signal degree counting
    misses. Oracle: the unrolled 8-round SQL mirror (pagerank pattern),
    so the iteration itself — joins, normalizations, and the final
    ranking — is value-hashed, not just row-counted."""
    from pyspark.sql.window import Window

    li = load(spark, "lineitem", sf_dir)
    orders = load(spark, "orders", sf_dir)
    rel = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    scores = hits(rel, iterations=8)
    kind = F.when(F.col("id") % 2 == 0, F.lit("hub")).otherwise(
        F.lit("authority")
    )
    score = F.when(F.col("id") % 2 == 0, F.col("hub")).otherwise(
        F.col("authority")
    )
    # rank on the ROUNDED score: the trading graph produces mass ties
    # (customers with identical edge profiles get identical scores up to
    # summation order), and raw-ulp ordering diverges across engines
    w = Window.partitionBy(F.col("id") % 2).orderBy(
        F.desc(F.round("score", 6)), "id"
    )
    return (
        scores.select(kind.alias("kind"), "id", score.alias("score"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("kind", "id", F.round("score", 6).alias("score"),
                F.col("rnk").cast("int").alias("rnk"))
    )


_register_hits_oracle()


# ---------------------------------------------------------------------------
# Community detection: deterministic synchronous modularity-gain moves
# (the Louvain phase-1 local-move rule made engine-reproducible;
# Blondel et al. 2008, "Fast unfolding of communities in large networks")
# ---------------------------------------------------------------------------

def modularity_communities(edges: DataFrame, rounds: int = 4) -> DataFrame:
    """Louvain-style community labels by BOUNDED synchronous
    modularity-gain moves (VERDICT r08 task #6). ``edges`` must carry
    BOTH directions of each undirected edge (src, dst), no self-loops.

    Each round, every node evaluates moving to each neighbor community
    (plus staying) and takes the best by the Louvain local-move gain —
    ranked on the EXACT-INTEGER numerator ``2m*k_ic - k_i * tot'_c``
    (tot'_c = community degree with the node itself removed), ties
    broken by smallest community id.  No float enters the ranking, so
    the trajectory is bit-reproducible across engines (the graph_hits
    raw-ulp lesson applied before the fact); all nodes move
    simultaneously and the round count is FIXED, so the unrolled SQL
    mirror replays it exactly.

    100 TB shape: each round is two equi-joins (edge->label, label->
    degree) + two hash-aggs + one per-node window over the node's own
    candidate communities (bounded by its degree) — candidate volume is
    O(E) per round; localCheckpoint per round keeps the plan constant.
    Full Louvain adds graph-coarsening phases on top of this move rule;
    the bounded one-phase form keeps the oracle exact."""
    from pyspark.sql.window import Window

    ob_m = Observation()
    und = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .observe(ob_m, F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    ob_n = Observation()
    deg = (
        und.groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
        .withColumnRenamed("src", "id")
        .observe(ob_n, F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    # edge count (for m) and node count (broadcast gate) ride the two
    # setup checkpoints via observe — no separate .count() job
    m = int(ob_m.get["n"]) // 2
    n_nodes = int(ob_n.get["n"])
    labels = deg.select("id", F.col("id").alias("c")).localCheckpoint()
    with _loop_exec_conf(edges.sparkSession, n_nodes <= _bcast_limit(edges)):
        for _ in range(rounds):
            # node-sized label vector broadcasts into the checkpointed edge
            # scan (gated on the observed node count): the edge side never
            # re-shuffles, the per-(id, c) agg exchanges partial output only
            kic = (
                und.join(
                    _gated_broadcast(
                        labels.withColumnRenamed("id", "dst"), n_nodes
                    ),
                    "dst",
                )
                .select(F.col("src").alias("id"), "c")
                .groupBy("id", "c")
                .agg(F.count(F.lit(1)).cast("long").alias("kic"))
            )
            # every frame below is node-count-bounded (labels/deg/cur are
            # one row per node, tot one per community); with AQE off for
            # the gated loop they must carry their own broadcast hints —
            # the same gate — or the planner reverts to sort-merge joins
            tot = (
                labels.join(_gated_broadcast(deg, n_nodes), "id")
                .groupBy("c")
                .agg(F.sum("k").cast("long").alias("tot"))
            )
            # candidates = every neighbor community (kic) plus the node's
            # own community with kic defaulted to 0. One FULL OUTER join
            # on (id, c) produces exactly the old kic ∪ stay DISTINCT
            # multiset — kic-only rows, the own-community row when it has
            # neighbors (identical values on both sides, so the overlap
            # row the distinct used to fold is emitted once), and the
            # own-community-with-0 row otherwise — while evaluating the
            # edge join ONCE (the union referenced kic twice, and a join
            # subtree without an exchange is re-executed, not reused).
            cand = kic.join(labels, ["id", "c"], "full").select(
                "id",
                "c",
                F.coalesce("kic", F.lit(0)).cast("long").alias("kic"),
            )
            cur = labels.withColumnRenamed("c", "cur")
            scored = (
                cand.join(_gated_broadcast(tot, n_nodes), "c")
                .join(_gated_broadcast(deg, n_nodes), "id")
                .join(_gated_broadcast(cur, n_nodes), "id")
                .withColumn(
                    "gain",
                    F.lit(2 * m) * F.col("kic")
                    - F.col("k")
                    * (
                        F.col("tot")
                        - F.when(
                            F.col("c") == F.col("cur"), F.col("k")
                        ).otherwise(F.lit(0))
                    ),
                )
            )
            w = Window.partitionBy("id").orderBy(F.desc("gain"), F.asc("c"))
            labels = (
                scored.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("id", "c")
                .localCheckpoint()
            )
    return labels


def _register_louvain_oracle() -> None:
    """Unrolled 4-round SQL mirror (the graph_hits pattern): every round's
    k_ic / community-degree / candidate / argmax CTE is MATERIALIZED so
    DuckDB cannot re-inline the chain exponentially."""
    from data_engineering_nd_spark.registry import ORACLE_SQL

    sql = """
    WITH rel AS MATERIALIZED (
        SELECT DISTINCT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_custkey % 7 = 0
    ),
    und AS MATERIALIZED (
        SELECT a AS src, b AS dst FROM rel
        UNION ALL
        SELECT b AS src, a AS dst FROM rel
    ),
    deg AS MATERIALIZED (
        SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS k
        FROM und GROUP BY src
    ),
    mm AS (SELECT COUNT(*) // 2 AS m FROM und),
    l0 AS MATERIALIZED (SELECT id, id AS c FROM deg)
    """
    for i in range(4):
        sql += f""",
    kic{i} AS MATERIALIZED (
        SELECT e.src AS id, lb.c, CAST(COUNT(*) AS BIGINT) AS kic
        FROM und e JOIN l{i} lb ON lb.id = e.dst
        GROUP BY e.src, lb.c
    ),
    tot{i} AS MATERIALIZED (
        SELECT lb.c, CAST(SUM(d.k) AS BIGINT) AS tot
        FROM l{i} lb JOIN deg d ON d.id = lb.id GROUP BY lb.c
    ),
    cand{i} AS MATERIALIZED (
        SELECT id, c, kic FROM kic{i}
        UNION
        SELECT lb.id, lb.c, CAST(COALESCE(k2.kic, 0) AS BIGINT)
        FROM l{i} lb LEFT JOIN kic{i} k2
          ON k2.id = lb.id AND k2.c = lb.c
    ),
    l{i + 1} AS MATERIALIZED (
        SELECT id, c FROM (
            SELECT cd.id, cd.c,
                   ROW_NUMBER() OVER (
                       PARTITION BY cd.id
                       ORDER BY 2 * mm.m * cd.kic - d.k *
                                (t.tot - CASE WHEN cd.c = lb.c
                                              THEN d.k ELSE 0 END) DESC,
                                cd.c ASC) AS rn
            FROM cand{i} cd
            JOIN tot{i} t ON t.c = cd.c
            JOIN deg d ON d.id = cd.id
            JOIN l{i} lb ON lb.id = cd.id
            CROSS JOIN mm
        ) z WHERE rn = 1
    )
    """
    sql += """
    , ei AS MATERIALIZED (
        SELECT ls.c, COUNT(*) // 2 AS e_internal
        FROM und e
        JOIN l4 ls ON ls.id = e.src
        JOIN l4 ld ON ld.id = e.dst
        WHERE ls.c = ld.c
        GROUP BY ls.c
    ),
    comm AS MATERIALIZED (
        SELECT lb.c AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(d.k) AS BIGINT) AS tot_degree,
               CAST(SUM(CAST(concat('0x', substr(md5(CAST(lb.id AS VARCHAR)),
                                                 1, 10)) AS BIGINT))
                    AS BIGINT) AS member_checksum
        FROM l4 lb JOIN deg d ON d.id = lb.id GROUP BY lb.c
    ),
    fullc AS (
        SELECT co.community, co.n_nodes,
               CAST(COALESCE(ei.e_internal, 0) AS BIGINT) AS e_internal,
               co.tot_degree, co.member_checksum
        FROM comm co LEFT JOIN ei ON ei.c = co.community
    ),
    qnum AS (
        SELECT SUM(4 * mm.m * f.e_internal
                   - f.tot_degree * f.tot_degree) AS num,
               4 * mm.m * mm.m AS den
        FROM fullc f CROSS JOIN mm GROUP BY mm.m
    )
    SELECT f.community, f.n_nodes, f.e_internal, f.tot_degree,
           f.member_checksum, CAST(f.rnk AS INT) AS rnk,
           ROUND(CAST(q.num AS DOUBLE) / CAST(q.den AS DOUBLE), 6)
               AS q_modularity
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY n_nodes DESC, community ASC)
                        AS rnk
          FROM fullc) f
    CROSS JOIN qnum q
    WHERE f.rnk <= 15
    """
    ORACLE_SQL["graph_louvain"] = sql


@query("graph_louvain")
def graph_louvain_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 communities (by size) of the symmetrized customer-supplier
    trading graph after 4 deterministic modularity-gain rounds, with the
    exact-integer move rule of :func:`modularity_communities` and the
    global modularity Q (one exact-BIGINT division, rounded at the
    display edge).  The %7 customer slice bounds the fixture graph; the
    oracle is the unrolled 4-round SQL mirror, so the move trajectory
    itself — not just the final grouping — is value-hashed."""
    from pyspark.sql.window import Window

    li = load(spark, "lineitem", sf_dir)
    orders = load(spark, "orders", sf_dir)
    rel = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("o_custkey") % 7 == 0)
        .select(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .distinct()
    )
    und = rel.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        rel.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    labels = modularity_communities(und, rounds=4)
    undc = und.localCheckpoint()
    m = undc.count() // 2
    deg = (
        undc.groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
        .withColumnRenamed("src", "id")
    )
    from data_engineering_nd_spark.functions.hashing import md5_prefix_long

    comm = (
        labels.join(deg, "id")
        .groupBy(F.col("c").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("k").cast("bigint").alias("tot_degree"),
            F.sum(md5_prefix_long(F.col("id").cast("string")))
            .cast("bigint")
            .alias("member_checksum"),
        )
    )
    ei = (
        undc.join(
            labels.select(F.col("id").alias("src"), F.col("c").alias("cs")),
            "src",
        )
        .join(
            labels.select(F.col("id").alias("dst"), F.col("c").alias("cd")),
            "dst",
        )
        .filter(F.col("cs") == F.col("cd"))
        .groupBy(F.col("cs").alias("community"))
        .agg(F.expr("count(1) div 2").cast("bigint").alias("e_internal"))
    )
    fullc = comm.join(ei, "community", "left").select(
        "community",
        "n_nodes",
        F.coalesce("e_internal", F.lit(0)).cast("bigint").alias("e_internal"),
        "tot_degree",
        "member_checksum",
    )
    qrow = fullc.agg(
        F.sum(
            F.lit(4 * m) * F.col("e_internal")
            - F.col("tot_degree") * F.col("tot_degree")
        ).alias("num")
    ).select(
        F.round(
            F.col("num").cast("double") / F.lit(float(4 * m * m)), 6
        ).alias("q_modularity")
    )
    w = Window.orderBy(F.desc("n_nodes"), F.asc("community"))
    # agg first, then rank over the community-sized aggregate (q95 lesson)
    return (
        fullc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 15)
        .withColumn("rnk", F.col("rnk").cast("int"))
        .crossJoin(F.broadcast(qrow))
    )


_register_louvain_oracle()


@query(
    "graph_assortativity",
    oracle="""
    WITH rel AS (
        SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    degc AS (SELECT cust, COUNT(*) AS dx FROM rel GROUP BY cust),
    degs AS (SELECT supp, COUNT(*) AS dy FROM rel GROUP BY supp),
    e AS (
        SELECT dx, dy FROM rel
        JOIN degc USING (cust) JOIN degs USING (supp)
    ),
    m AS (
        SELECT COUNT(*) AS n, SUM(dx) AS sx, SUM(dy) AS sy,
               SUM(dx * dy) AS sxy, SUM(dx * dx) AS sxx,
               SUM(dy * dy) AS syy
        FROM e
    )
    SELECT CAST(n AS BIGINT) AS n_edges,
           CAST(sx AS BIGINT) AS sum_cust_degree,
           CAST(sy AS BIGINT) AS sum_supp_degree,
           CAST(floor(
               CAST(n * sxy - sx * sy AS DOUBLE) * 1000000.0
               / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                      * CAST(n * syy - sy * sy AS DOUBLE))
               + 0.5
           ) AS BIGINT) AS assortativity_e6
    FROM m
    """,
)
def graph_assortativity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the customer-supplier trading graph —
    the Pearson correlation of endpoint degrees over edges (Newman's
    mixing coefficient): negative means hubs trade with leaves
    (disassortative, the typical commerce shape), positive means hubs
    cluster. THE one-number structure probe run before choosing a
    partitioning/skew strategy for iterative algorithms, alongside the
    degree distribution.

    Exactness: all five moments accumulate as exact integers (DECIMAL
    sums); the single closed-form division crosses to DOUBLE once in
    the SAME operation order both engines. Scale shape: two degree
    hash-aggs, two hash joins back onto the edge list, one 1-row agg —
    no iteration, no windows."""
    li = load(spark, "lineitem", sf_dir)
    orders = load(spark, "orders", sf_dir)
    rel = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_suppkey").alias("supp"),
        )
        .distinct()
    )
    degc = rel.groupBy("cust").agg(F.count(F.lit(1)).alias("dx"))
    degs = rel.groupBy("supp").agg(F.count(F.lit(1)).alias("dy"))
    e = rel.join(degc, "cust").join(degs, "supp")
    m = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("dx").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("dy").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("dx") * F.col("dy")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("dx") * F.col("dx")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("dy") * F.col("dy")).cast("decimal(38,0)")).alias("syy"),
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_edges"),
        F.col("sx").cast("bigint").alias("sum_cust_degree"),
        F.col("sy").cast("bigint").alias("sum_supp_degree"),
        F.floor(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .cast("double")
            * 1000000.0
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                .cast("double")
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
                .cast("double")
            )
            + 0.5
        ).cast("bigint").alias("assortativity_e6"),
    )
