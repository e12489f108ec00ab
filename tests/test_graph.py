"""PageRank correctness vs a dense numpy power-iteration oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_engineering_nd_spark.operators.graph import graph_pagerank_topk_query, pagerank

SF_DIR = "/root/testdata/sf0.001"


def numpy_pagerank(edges, n, damping=0.85, iterations=10):
    """Dense reference: same convention (ranks sum to n, dangling mass
    redistributed uniformly)."""
    W = np.zeros((n, n))
    for s, d in edges:
        W[s, d] += 1.0
    out = W.sum(axis=1)
    r = np.ones(n)
    for _ in range(iterations):
        contrib = np.zeros(n)
        for s in range(n):
            if out[s] > 0:
                contrib += r[s] * W[s] / out[s]
        dangling = r[out == 0].sum()
        r = (1 - damping) + damping * (contrib + dangling / n)
    return r


@pytest.mark.parametrize(
    "edges,n",
    [
        # chain with a hub and a dangling node
        ([(0, 1), (1, 2), (2, 0), (3, 0), (4, 0), (0, 5)], 6),
        # weighted (repeated) edges + two components
        ([(0, 1), (0, 1), (1, 0), (2, 3), (3, 2), (3, 4)], 5),
        # NO dangling nodes but node 3 has no in-edges — exercises the
        # middle `elif n_no_in` branch (coalesce-only path, no dangling
        # mass redistribution); ADVICE r05 #4
        ([(0, 1), (1, 2), (2, 0), (3, 1)], 4),
    ],
)
def test_pagerank_matches_numpy(spark, edges, n):
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["id"]: r["rank"]
        for r in pagerank(df, iterations=10).collect()
    }
    want = numpy_pagerank(edges, n)
    # nodes with no edges at all never enter the frame; check the ones present
    for node, rank in got.items():
        assert abs(rank - want[node]) < 1e-9, (node, rank, want[node])
    # total mass over present nodes matches the oracle's over the same nodes
    assert abs(sum(got.values()) - want[list(got)].sum()) < 1e-9


def test_pagerank_deterministic_across_runs(spark):
    edges = [(0, 1), (1, 2), (2, 0), (0, 2)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    a = sorted(pagerank(df, iterations=8).collect())
    b = sorted(pagerank(df, iterations=8).collect())
    assert a == b


def test_pagerank_topk_query_shape(spark):
    out = graph_pagerank_topk_query(spark, SF_DIR)
    rows = out.collect()
    assert len(rows) == 20
    assert [f.name for f in out.schema.fields] == ["id", "kind", "rank"]
    # ranks positive, sorted desc
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r["kind"] in ("customer", "supplier") for r in rows)
    # suppliers are far fewer than customers -> they concentrate rank; the
    # top of the list should contain at least one supplier
    assert any(r["kind"] == "supplier" for r in rows[:5])


def test_triangle_stats_known_graph(spark):
    """K4 + a pendant vertex: 4 triangles, wedge count from degrees, and
    the clustering coefficient follows exactly."""
    from data_engineering_nd_spark.operators.graph import triangle_stats

    # K4 on {1,2,3,4} (all 6 edges) plus pendant 5-1
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5)]
    df = spark.createDataFrame(edges, ["a", "b"])
    row = triangle_stats(df, "a", "b").collect()[0]
    assert row.n_nodes == 5 and row.n_edges == 7
    assert row.n_triangles == 4
    # degrees: 1->4, 2/3/4->3, 5->1 ; wedges = C(4,2)+3*C(3,2)+0 = 6+9 = 15
    assert row.n_wedges == 15
    assert row.global_clustering == round(12 / 15, 6)


def test_triangle_stats_triangle_free(spark):
    """A star has many wedges but zero triangles — exercises the hub
    orientation path (all arcs point away from the low-degree leaves)."""
    from data_engineering_nd_spark.operators.graph import triangle_stats

    df = spark.createDataFrame([(0, i) for i in range(1, 9)], ["a", "b"])
    row = triangle_stats(df, "a", "b").collect()[0]
    assert row.n_triangles == 0
    assert row.n_wedges == 28  # C(8,2) at the hub
    assert row.global_clustering == 0.0


def test_label_propagation_two_cliques(spark):
    """Two 3-cliques joined by one bridge edge: LPA labels each clique by
    its minimum id; the bridge is not enough for either side to flip."""
    from data_engineering_nd_spark.operators.graph import label_propagation

    clique_a = [(0, 1), (0, 2), (1, 2)]
    clique_b = [(10, 11), (10, 12), (11, 12)]
    edges = spark.createDataFrame(clique_a + clique_b + [(2, 10)], ["src", "dst"])
    labels = {r["id"]: r["lab"] for r in label_propagation(edges, iterations=5).collect()}
    assert labels[0] == labels[1] == labels[2] == 0
    assert labels[10] == labels[11] == labels[12]
    assert labels[10] != labels[0]


def test_label_propagation_tie_breaks_to_smallest(spark):
    """A node with two equally-frequent neighbour labels adopts the
    smallest — the determinism contract the SQL mirror relies on."""
    from data_engineering_nd_spark.operators.graph import label_propagation

    # node 5 bridges singleton neighbours 1 and 2 (tie at count 1 each)
    edges = spark.createDataFrame([(1, 5), (2, 5)], ["src", "dst"])
    labels = {r["id"]: r["lab"] for r in label_propagation(edges, iterations=1).collect()}
    assert labels[5] == 1


def test_label_propagation_deterministic(spark):
    from data_engineering_nd_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (2, 4)], ["src", "dst"]
    )
    a = sorted(label_propagation(edges, iterations=4).collect())
    b = sorted(label_propagation(edges, iterations=4).collect())
    assert a == b


def test_common_neighbor_candidates_path_graph(spark):
    """Path 0-1-2: 0 and 2 share neighbor 1, are non-adjacent -> one
    candidate with cn=1 and neighborhood jaccard 1/1 (deg 1 + deg 1 - 1)."""
    from data_engineering_nd_spark.operators.graph import common_neighbor_candidates

    edges = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
    rows = common_neighbor_candidates(edges).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"], r["common_neighbors"]) == (0, 2, 1)
    assert abs(r["nb_jaccard"] - 1.0) < 1e-9


def test_common_neighbor_candidates_excludes_existing_edges(spark):
    """In a triangle every pair is adjacent -> no candidates."""
    from data_engineering_nd_spark.operators.graph import common_neighbor_candidates

    edges = spark.createDataFrame([(0, 1), (1, 2), (0, 2)], ["src", "dst"])
    assert common_neighbor_candidates(edges).count() == 0


def test_common_neighbor_candidates_degree_cap_drops_hub_wedges(spark):
    """A star hub above max_degree stops being a wedge center, so its
    leaves are no longer proposed as candidates."""
    from data_engineering_nd_spark.operators.graph import common_neighbor_candidates

    star = [(99, i) for i in range(5)]
    edges = spark.createDataFrame(star, ["src", "dst"])
    assert common_neighbor_candidates(edges, max_degree=None).count() == 10
    assert common_neighbor_candidates(edges, max_degree=4).count() == 0


def test_kcore_peels_tails_keeps_cliques(spark):
    """Triangle + pendant chain: the 2-core is exactly the triangle; the
    chain (all degree<=... after peeling) disappears entirely."""
    from data_engineering_nd_spark.operators.graph import kcore

    tri = [(0, 1), (1, 2), (0, 2)]
    chain = [(2, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(tri + chain, ["src", "dst"])
    got = {r["id"]: r["degree"] for r in kcore(edges, k=2).collect()}
    assert got == {0: 2, 1: 2, 2: 2}


def test_kcore_empty_when_forest(spark):
    """Trees have no 2-core."""
    from data_engineering_nd_spark.operators.graph import kcore

    edges = spark.createDataFrame([(0, 1), (1, 2), (1, 3)], ["src", "dst"])
    assert kcore(edges, k=2).count() == 0


def test_bfs_layers_hand_graph(spark):
    """Distances on a hand-built graph: chain 0-1-2-3-4-5 plus a shortcut
    0-3 and an unreachable island {8,9}; seed = {0}. Level-synchronous
    expansion must take the SHORTER of chain vs shortcut and stop at
    max_hops."""
    from pyspark.sql import functions as F  # noqa: F401

    from data_engineering_nd_spark.operators.graph import bfs_layers

    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 3), (8, 9)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(0,)], ["id"])
    got = {
        r["id"]: r["dist"] for r in bfs_layers(edges, seeds, max_hops=3).collect()
    }
    assert got == {0: 0, 1: 1, 3: 1, 2: 2, 4: 2, 5: 3}  # island unreached


def test_bfs_seed_without_edges_kept_at_zero(spark):
    from data_engineering_nd_spark.operators.graph import bfs_layers

    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    seeds = spark.createDataFrame([(7,)], ["id"])
    got = {r["id"]: r["dist"] for r in bfs_layers(edges, seeds).collect()}
    assert got == {7: 0}


def test_shortest_paths_prefers_cheap_multi_hop_route(spark):
    """Weighted semantics: the cheapest path may use MORE hops than the
    hop-minimal one (w=10 direct vs 1+1 detour) — exactly what separates
    shortest_paths from bfs_layers."""
    from data_engineering_nd_spark.operators.graph import shortest_paths

    edges = spark.createDataFrame(
        [("a", "b", 10), ("a", "c", 1), ("c", "b", 1)],
        "src string, dst string, w long",
    )
    seeds = spark.createDataFrame([("a",)], ["id"])
    got = {r.id: r.dist for r in shortest_paths(edges, seeds).collect()}
    assert got == {"a": 0, "b": 2, "c": 1}


def test_shortest_paths_is_hop_bounded_and_layer_exact(spark):
    """After k rounds the distances are minima over <= k-edge paths: a
    5-edge unit chain with a w=100 shortcut resolves to 100 at
    max_hops=4 and to 5 once the bound admits the long path."""
    from data_engineering_nd_spark.operators.graph import shortest_paths

    chain = [(f"n{i}", f"n{i+1}", 1) for i in range(5)]
    edges = spark.createDataFrame(
        chain + [("n0", "n5", 100)], "src string, dst string, w long"
    )
    seeds = spark.createDataFrame([("n0",)], ["id"])
    at4 = {r.id: r.dist for r in shortest_paths(edges, seeds, max_hops=4).collect()}
    assert at4["n5"] == 100 and at4["n4"] == 4
    at5 = {r.id: r.dist for r in shortest_paths(edges, seeds, max_hops=5).collect()}
    assert at5["n5"] == 5


def test_shortest_paths_multi_source_and_early_stop(spark):
    from data_engineering_nd_spark.operators.graph import shortest_paths

    edges = spark.createDataFrame(
        [("a", "m", 3), ("b", "m", 1), ("m", "z", 1)],
        "src string, dst string, w long",
    )
    seeds = spark.createDataFrame([("a",), ("b",)], ["id"])
    # max_hops far beyond the diameter: early stop, still exact
    got = {r.id: r.dist for r in shortest_paths(edges, seeds, max_hops=10).collect()}
    assert got == {"a": 0, "b": 0, "m": 1, "z": 2}


def numpy_ppr(edges, n, sources, damping=0.85, iterations=10):
    """Dense PPR reference: ranks are probabilities (sum to 1), restart
    uniform over sources, dangling mass re-injected via the restart."""
    W = np.zeros((n, n))
    for s, d in edges:
        W[s, d] += 1.0
    out = W.sum(axis=1)
    rs = np.zeros(n)
    rs[list(sources)] = 1.0 / len(sources)
    r = rs.copy()
    for _ in range(iterations):
        contrib = np.zeros(n)
        for s in range(n):
            if out[s] > 0:
                contrib += r[s] * W[s] / out[s]
        dangling = r[out == 0].sum()
        r = damping * (contrib + dangling * rs) + (1 - damping) * rs
    return r


@pytest.mark.parametrize(
    "edges,n,sources",
    [
        # chain+hub+dangling; restart at one end
        ([(0, 1), (1, 2), (2, 0), (3, 0), (4, 0), (0, 5)], 6, [0]),
        # two components; sources only in the first -> second stays at 0
        ([(0, 1), (0, 1), (1, 0), (2, 3), (3, 2), (3, 4)], 5, [0, 1]),
        # NO dangling nodes -> exercises the mass-conserving fast branch
        # (no per-round dmass aggregate; lazy-chained rounds)
        ([(0, 1), (1, 2), (2, 0), (2, 1)], 3, [0]),
    ],
)
def test_personalized_pagerank_matches_numpy(spark, edges, n, sources):
    from data_engineering_nd_spark.operators.graph import personalized_pagerank

    df = spark.createDataFrame(edges, ["src", "dst"])
    src_df = spark.createDataFrame([(s,) for s in sources], ["id"])
    got = {
        r["id"]: r["rank"]
        for r in personalized_pagerank(df, src_df, iterations=10).collect()
    }
    want = numpy_ppr(edges, n, sources)
    for node, rank in got.items():
        assert abs(rank - want[node]) < 1e-12, (node, rank, want[node])
    # probability mass: total over present nodes == oracle total
    assert abs(sum(got.values()) - want[list(got)].sum()) < 1e-12
    # unreachable component carries exactly zero
    reachable = want > 0
    for node, rank in got.items():
        if not reachable[node]:
            assert rank == 0.0


def test_resource_allocation_scores_exact(spark):
    """Path graph 1-2-3 plus hub 9 connected to 1 and 3: pair (1,3) gets
    RA contributions from center 2 (deg 2) and center 9 (deg 2); the hub
    cap drops high-degree centers from the wedge join."""
    from data_engineering_nd_spark.operators.graph import (
        resource_allocation_candidates,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 9), (3, 9)], ["src", "dst"]
    )
    out = {
        (r.id_a, r.id_b): r
        for r in resource_allocation_candidates(edges, max_degree=None).collect()
    }
    # only non-adjacent pair with common neighbors: (1,3) via 2 and 9
    assert set(out) == {(1, 3), (2, 9)}
    r13 = out[(1, 3)]
    assert r13.common_neighbors == 2
    assert r13.ra_e9 == 2 * (10**9 // 2)  # both centers have degree 2
    assert r13.ra_score == 1.0
    # (2,9) via centers 1 and 3 (deg 2 each) as well
    assert out[(2, 9)].ra_e9 == 10**9

    capped = {
        (r.id_a, r.id_b): r
        for r in resource_allocation_candidates(edges, max_degree=1).collect()
    }
    assert capped == {}  # every center has degree 2 > cap


def test_clustering_coefficient_triangle_plus_pendant(spark):
    """K3 with a pendant: interior coefficients hit the closed-form
    values; the pendant and degree-1 nodes report 0."""
    import pandas as pd

    from data_engineering_nd_spark.operators.graph import clustering_coefficient

    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [1, 1, 2, 1], "id_b": [2, 3, 3, 4]})
    )
    edges = pairs.select(
        pairs.id_a.alias("src"), pairs.id_b.alias("dst")
    ).unionByName(pairs.select(pairs.id_b.alias("src"), pairs.id_a.alias("dst")))
    out = {r.center: r for r in clustering_coefficient(edges, pairs).collect()}
    assert (out[1].degree, out[1].n_triangles) == (3, 1)
    assert abs(out[1].coeff_raw - 1 / 3) < 1e-9
    assert (out[2].degree, out[2].n_triangles, out[2].coeff_raw) == (2, 1, 1.0)
    assert (out[3].degree, out[3].n_triangles, out[3].coeff_raw) == (2, 1, 1.0)
    assert (out[4].degree, out[4].n_triangles, out[4].coeff_raw) == (1, 0, 0.0)


def test_scc_known_components_and_trim(spark):
    """Two cycles joined by a one-way bridge, a self-loop, and a sink:
    membership and the max-member scc_id convention are exact."""
    from data_engineering_nd_spark.operators.graph import scc

    edges = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 1),        # SCC {1,2,3} -> 3
            (3, 5),                        # one-way bridge
            (5, 6), (6, 5),                # SCC {5,6} -> 6
            (1, 9),                        # 9 is a sink -> singleton
            (7, 7), (6, 7),                # self-loop singleton -> 7
        ],
        "src long, dst long",
    )
    got = {r.id: r.scc_id for r in scc(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 5: 6, 6: 6, 9: 9, 7: 7}


def test_scc_pure_dag_is_all_singletons(spark):
    from data_engineering_nd_spark.operators.graph import scc

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    got = {r.id: r.scc_id for r in scc(edges).collect()}
    assert got == {1: 1, 2: 2, 3: 3, 4: 4}


def test_hits_mutual_reinforcement(spark):
    """The authority pointed to by both hubs outranks the single-hub
    one; the hub covering both authorities outranks the single-edge
    hub; scores sum-normalize to 1 per side."""
    from data_engineering_nd_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [(1, 2), (1, 4), (3, 2)], "src long, dst long"
    )
    out = {r.id: r for r in hits(edges, iterations=8).collect()}
    assert out[2].authority > out[4].authority
    assert out[1].hub > out[3].hub
    assert abs(sum(r.authority for r in out.values()) - 1.0) < 1e-9
    assert abs(sum(r.hub for r in out.values()) - 1.0) < 1e-9
    # pure hubs have zero authority and vice versa in a bipartite graph
    assert out[1].authority == 0.0 and out[2].hub == 0.0


def test_relational_division_requires_full_cover(spark, tmp_path):
    import pandas as pd

    from data_engineering_nd_spark.analytics import q99_relational_division

    sf = tmp_path / "sf"
    sf.mkdir()
    rows = [
        (1, 10, "A"), (2, 10, "B"),            # cust 10 covers both -> in
        (3, 20, "A"),                          # cust 20 misses B -> out
        (4, 30, "B"), (5, 30, "B"), (6, 30, "A"),  # cust 30 in, 3 orders
    ]
    pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_orderpriority"]
    ).to_parquet(str(sf / "orders.parquet"))
    out = {r.o_custkey: r for r in q99_relational_division(spark, str(sf)).collect()}
    assert set(out) == {10, 30}
    assert out[30].n_orders == 3 and out[30].n_classes == 2


def test_modularity_communities_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge: the deterministic
    modularity-gain moves put each clique in one community, and the
    trajectory is reproducible (same labels on a second run)."""
    from data_engineering_nd_spark.operators.graph import (
        modularity_communities,
    )

    def clique(ids):
        return [(a, b) for a in ids for b in ids if a != b]

    pairs = clique([1, 2, 3, 4]) + clique([11, 12, 13, 14]) + [(4, 11), (11, 4)]
    und = spark.createDataFrame(pairs, ["src", "dst"])
    lab = {r.id: r.c for r in modularity_communities(und, rounds=4).collect()}
    assert len({lab[i] for i in [1, 2, 3, 4]}) == 1
    assert len({lab[i] for i in [11, 12, 13, 14]}) == 1
    assert lab[1] != lab[11]
    lab2 = {r.id: r.c for r in modularity_communities(und, rounds=4).collect()}
    assert lab == lab2


def test_broadcast_gate_fallback_matches_broadcast_path(spark):
    """VERDICT r14 #3: the node-vector broadcasts inside the iterative
    loops are gated on spark.graft.graph.broadcastNodeLimit. Forcing the
    limit to 0 must exercise the shuffle-join fallback (and keep AQE on
    for the loop) and produce the same scores/labels as the broadcast
    path up to float round-off."""
    from data_engineering_nd_spark.operators.graph import (
        _BCAST_NODE_LIMIT_CONF,
        hits,
        pagerank,
    )

    pairs = [(1, 2), (2, 1), (2, 3), (3, 1), (3, 4), (4, 2), (1, 4)]
    edges = spark.createDataFrame(pairs, ["src", "dst"])

    def run_all():
        pr = {r.id: round(r.rank, 9) for r in pagerank(edges, iterations=4).collect()}
        hs = {
            r.id: (round(r.hub, 9), round(r.authority, 9))
            for r in hits(edges, iterations=3).collect()
        }
        return pr, hs

    broadcast_path = run_all()
    # limit 0 drops the hint AND autoBroadcastJoinThreshold=-1 stops the
    # planner re-broadcasting the tiny sides on its own — the fallback
    # actually executes shuffle joins (different accumulation grouping)
    spark.conf.set(_BCAST_NODE_LIMIT_CONF, "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fallback_path = run_all()
    finally:
        spark.conf.unset(_BCAST_NODE_LIMIT_CONF)
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert broadcast_path == fallback_path
