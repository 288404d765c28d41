"""Connected components (duplicate clustering): hand-built graphs plus a
property test against a brute-force union-find reference."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from bigdatapipelinepysparksqlserver_spark.operators.dedup import connected_components


def _components_bruteforce(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def test_chain_and_islands(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)]
    got = {
        r.doc_id: r.component
        for r in connected_components(
            spark.createDataFrame(edges, "id1 long, id2 long")
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_long_chain_converges(spark):
    # a path graph has maximal diameter for its size — worst case for
    # min-label propagation round count
    n = 12
    edges = [(i, i + 1) for i in range(n)]
    got = {
        r.doc_id: r.component
        for r in connected_components(
            spark.createDataFrame(edges, "id1 long, id2 long")
        ).collect()
    }
    assert got == {i: 0 for i in range(n + 1)}


@settings(max_examples=5, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
    )
)
def test_components_equal_union_find(spark, edges):
    expected = _components_bruteforce(edges)
    got = {
        r.doc_id: r.component
        for r in connected_components(
            spark.createDataFrame(edges, "id1 long, id2 long")
        ).collect()
    }
    assert got == expected
