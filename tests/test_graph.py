"""PageRank over the host link graph (operators/graph.py)."""

from __future__ import annotations

import numpy as np

from ocr_cezam_spark.operators import graph


def test_pagerank_matches_numpy_power_iteration(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")]
    links = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["host"]: r["rank"]
           for r in graph.pagerank(links, iters=4).collect()}

    hosts = sorted({h for e in edges for h in e})
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    outd = np.zeros(n)
    for s, _ in edges:
        outd[idx[s]] += 1
    m = np.zeros((n, n))
    for s, d in edges:
        m[idx[d], idx[s]] += 1.0 / outd[idx[s]]
    r = np.full(n, 1.0 / n)
    for _ in range(4):
        r = 0.15 / n + 0.85 * (m @ r)
    for h in hosts:
        assert abs(got[h] - r[idx[h]]) < 1e-8, h
    # sink-free sanity: c has the most in-links -> highest rank
    assert got["c"] == max(got.values())


def test_pagerank_no_inlink_host_keeps_teleport_mass(spark):
    links = spark.createDataFrame([("x", "y")], ["src", "dst"])
    got = {r["host"]: r["rank"]
           for r in graph.pagerank(links, iters=2).collect()}
    assert got["x"] == round(0.15 / 2, 8)
    assert got["y"] > got["x"]
