"""Connected-components clustering vs a pure-Python union-find oracle."""

import random

from name_matching_spark.operators.cluster import (
    cluster_matches,
    connected_components,
)


def _uf_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # canonical min-id component labels
    return {x: min(y for y in parent if find(y) == find(x)) for x in parent}


def test_connected_components_chain_and_islands(spark):
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["component"]
           for r in connected_components(df).collect()}
    assert got == _uf_oracle(edges)


def test_connected_components_random_graph(spark):
    rng = random.Random(7)
    nodes = list(range(120))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(90)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["component"]
           for r in connected_components(df).collect()}
    assert got == _uf_oracle(edges)


def test_cluster_matches_threshold(spark):
    matches = spark.createDataFrame(
        [(1, 2, 99.0), (2, 3, 10.0), (4, 5, 97.0)],
        "a_id long, b_id long, score double")
    got = {r["id"]: r["component"]
           for r in cluster_matches(matches, threshold=95.0).collect()}
    # edge (2,3) filtered out by threshold
    assert got == {1: 1, 2: 1, 4: 4, 5: 4}


def test_connected_components_string_ids(spark):
    edges = [("https://a", "https://b"), ("https://b", "https://c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["id"]: r["component"]
           for r in connected_components(df).collect()}
    assert set(got.values()) == {"https://a"}
