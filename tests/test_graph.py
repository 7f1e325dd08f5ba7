"""Graph-operator tests: PageRank correctness on hand-checkable graphs
plus the driver-query contract on real testdata.

The numeric oracle here is the textbook recurrence computed in pure
Python on the same adjacency — independent of both Spark and DuckDB
(the DuckDB unrolled-CTE twin is exercised by jobs/sweep_oracles.py and
the driver gate).
"""

from __future__ import annotations

import pytest

from text_extractor_for_bioeconomic_products_spark.operators.graph import (
    PR_DAMPING,
    PR_ITERS,
    pagerank,
    q_pagerank_suppliers,
)


def _python_pagerank(edge_list, iters=PR_ITERS, d=PR_DAMPING):
    adj = {}
    for a, b in edge_list:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = len(adj)
    ranks = {u: 1.0 / n for u in adj}
    for _ in range(iters):
        nxt = {}
        for u in adj:
            mass = sum(ranks[v] / len(adj[v]) for v in adj[u])
            nxt[u] = (1.0 - d) / n + d * mass
        ranks = nxt
    return ranks


@pytest.mark.parametrize(
    "edge_list",
    [
        # path graph: ends must rank below the middle
        [(1, 2), (2, 3)],
        # star: hub dominates
        [(0, 1), (0, 2), (0, 3), (0, 4)],
        # two triangles bridged by one edge
        [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)],
        # duplicate + reversed + self edges must not change the graph
        [(1, 2), (2, 1), (1, 1), (2, 3), (2, 3)],
    ],
)
def test_pagerank_matches_python_recurrence(spark, edge_list):
    df = spark.createDataFrame(edge_list, "u long, v long")
    got = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    want = _python_pagerank(edge_list)
    assert set(got) == set(want)
    for node, rank in want.items():
        assert got[node] == pytest.approx(rank, abs=1e-12)


def test_pagerank_mass_conserved_and_degree(spark):
    edge_list = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
    rows = pagerank(spark.createDataFrame(edge_list, "u long, v long")).collect()
    # symmetric graph with no dangling nodes: total mass stays 1.0
    assert sum(r["rank"] for r in rows) == pytest.approx(1.0, abs=1e-9)
    deg = {r["node"]: r["degree"] for r in rows}
    assert deg == {1: 3, 2: 2, 3: 3, 4: 2}


def test_pagerank_suppliers_contract(spark, sf001_dir):
    """Driver-query shape on real testdata: one row per supplier that
    ships ≥1 lineitem, ranks positive, hubs (higher degree) carry more
    mass in aggregate than leaves."""
    rows = q_pagerank_suppliers(spark, sf001_dir).collect()
    assert rows
    keys = [r["s_suppkey"] for r in rows]
    assert len(keys) == len(set(keys))
    assert all(r["pagerank"] > 0 for r in rows)
    by_deg = sorted(rows, key=lambda r: r["degree"])
    lo = by_deg[: len(rows) // 3] or by_deg
    hi = by_deg[-(len(rows) // 3):] or by_deg
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    assert mean([r["pagerank"] for r in hi]) >= mean(
        [r["pagerank"] for r in lo]
    )


def test_pagerank_empty_graph_raises(spark):
    """A graph with only self-edges has no rankable nodes — refuse
    loudly instead of dividing by zero."""
    from text_extractor_for_bioeconomic_products_spark.operators.graph import (
        pagerank,
    )

    df = spark.createDataFrame([(1, 1)], "u long, v long")
    with pytest.raises(ValueError, match="no non-self edges"):
        pagerank(df)


def test_bfs_distances_planted(spark):
    """BFS layers on a hand-checkable graph: path 1-2-3-4-5 plus a
    shortcut 1-4 — node 4 is 1 hop (via shortcut), 5 is 2; and the
    horizon binds: with rounds=1 node 5 is unreached."""
    from text_extractor_for_bioeconomic_products_spark.operators.graph import (
        bfs_distances,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4)], "u long, v long"
    )
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, 1).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 1, 5: 2}
    one_round = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, 1, rounds=1).collect()
    }
    assert one_round == {1: 0, 2: 1, 4: 1}


def test_graph_distances_census_consistency(spark, sf001_dir):
    """Driver-query contract: exactly one source node at dist 0, layer
    counts sum to the graph's node count, distances within horizon."""
    from text_extractor_for_bioeconomic_products_spark.operators.graph import (
        BFS_ROUNDS,
        q_graph_distances,
    )

    rows = q_graph_distances(spark, sf001_dir).collect()
    census = {r["dist"]: r["n_nodes"] for r in rows}
    assert census[0] == 1
    assert all(-1 <= d <= BFS_ROUNDS for d in census)
    assert sum(census.values()) > 1


def _python_lpa(edge_list, rounds=3):
    adj = {}
    for a, b in edge_list:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {u: u for u in adj}
    for _ in range(rounds):
        nxt = {}
        for u in adj:
            counts = {}
            for v in adj[u]:
                counts[labels[v]] = counts.get(labels[v], 0) + 1
            nxt[u] = min(counts, key=lambda l: (-counts[l], l))
        labels = nxt
    return labels


@pytest.mark.parametrize(
    "edge_list",
    [
        # two triangles + bridge: communities must stay distinct
        [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10), (3, 10)],
        # star: leaves adopt the hub's label family
        [(0, 1), (0, 2), (0, 3), (0, 4)],
        # path with duplicate/reversed/self edges
        [(1, 2), (2, 1), (1, 1), (2, 3), (3, 4)],
    ],
)
def test_label_propagation_matches_python(spark, edge_list):
    from text_extractor_for_bioeconomic_products_spark.operators.graph import (
        label_propagation,
    )

    df = spark.createDataFrame(edge_list, "u long, v long")
    got = {r["node"]: r["label"] for r in label_propagation(df).collect()}
    assert got == _python_lpa(edge_list)


def test_graph_communities_census_contract(spark, sf001_dir):
    """Census sanity on real testdata: sizes positive, total node count
    equals the graph's node count."""
    from text_extractor_for_bioeconomic_products_spark.operators.graph import (
        q_graph_communities,
    )

    rows = q_graph_communities(spark, sf001_dir).collect()
    assert rows
    assert all(r["community_size"] >= 1 and r["n_communities"] >= 1 for r in rows)


def test_triangle_census_hand_graph(spark):
    """K4 minus one edge: 5 edges, 2 triangles, wedges Σ C(deg,2) =
    C(3,2)+C(3,2)+C(2,2)+C(2,2) = 8, clustering = 6/8.  Duplicate and
    reversed input edges must not change anything."""
    from text_extractor_for_bioeconomic_products_spark.operators.graph import (
        triangle_census,
    )

    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4),
             (2, 1),        # reversed duplicate
             (1, 2)]        # exact duplicate
    df = spark.createDataFrame(edges, "u long, v long")
    r = triangle_census(df).collect()[0]
    assert (r["n_nodes"], r["n_edges"]) == (4, 5)
    assert r["n_wedges"] == 8
    assert r["n_triangles"] == 2
    assert r["clustering"] == 0.75


def test_triangle_census_triangle_free_graph(spark):
    """A star graph has wedges but zero triangles — the orientation
    must not fabricate closures."""
    from text_extractor_for_bioeconomic_products_spark.operators.graph import (
        triangle_census,
    )

    star = [(0, i) for i in range(1, 6)]
    r = triangle_census(
        spark.createDataFrame(star, "u long, v long")
    ).collect()[0]
    assert r["n_triangles"] == 0
    assert r["n_wedges"] == 10  # C(5,2) at the hub
    assert r["clustering"] == 0.0
