"""Unit invariants for operators/graph.py on hand-built graphs."""

from mobilityduck_spark.operators import graph as G


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangle_stats_known_graph(spark):
    # K4 (4 triangles) plus a pendant edge; duplicates/reversed/self
    # edges must canonicalize away
    pairs = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (2, 1), (3, 3), (4, 5), (5, 4),
    ]
    row = G.triangle_stats(_edges(spark, pairs)).collect()[0]
    assert row.n_nodes == 5 and row.n_edges == 7
    # degrees: 3,3,3,4,1 -> wedges = 3+3+3+6+0
    assert row.n_wedges == 15
    assert row.n_triangles == 4


def test_node_triangle_counts_corners(spark):
    pairs = [(1, 2), (1, 3), (2, 3), (3, 4)]  # one triangle on {1,2,3}
    got = {
        r.node: r.n_triangles
        for r in G.node_triangle_counts(_edges(spark, pairs)).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}


def test_max_degree_drops_hub(spark):
    # star center 0 with 5 leaves + triangle {1,2,3}: capping degree at
    # 4 removes the hub (and its wedges) but keeps the triangle
    pairs = [(0, i) for i in range(1, 6)] + [(1, 2), (1, 3), (2, 3)]
    row = G.triangle_stats(_edges(spark, pairs), max_degree=4).collect()[0]
    assert row.n_triangles == 1
    assert row.n_nodes == 3 and row.n_edges == 3
