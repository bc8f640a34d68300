"""Connected-components dedup clustering vs a python union-find oracle."""

from __future__ import annotations

from ocr_cezam_spark.operators.dedup import connected_components, dedup_clusters


def _union_find(pairs):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_components_match_union_find(spark):
    # chain 1-2-3, pair 10-11, triangle 20-21-22, chain 30-31-32-33
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22),
             (30, 31), (31, 32), (32, 33)]
    pairs = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == _union_find(edges)


def test_long_chain_converges(spark):
    # path graph of diameter 14 (> the old silent cap of 10): label
    # propagation must run to fixpoint, not stop early with wrong labels
    edges = [(i, i + 1) for i in range(15)]
    pairs = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {i: 0 for i in range(16)}


def test_unconverged_raises(spark):
    import pytest

    edges = [(i, i + 1) for i in range(6)]
    pairs = spark.createDataFrame(edges, "a long, b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2)


def test_dedup_clusters_on_cloned_docs(spark):
    # fully disjoint vocabularies per doc: no shared shingles, so the only
    # candidate pairs are the exact clones
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(8)), "s")
            for i in range(20)]
    rows += [(i + 100, rows[i][1], "s") for i in range(20)]  # exact clones
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    clusters = {r["component"]: (r["n_members"], r["max_member"])
                for r in dedup_clusters(docs).collect()}
    # every doc pairs with its clone: component i -> {i, i+100}
    assert len(clusters) == 20
    for i in range(20):
        assert clusters[i] == (2, i + 100)
