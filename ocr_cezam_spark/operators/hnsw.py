"""Graph-based ANN (HNSW-style) as the third 10^9-vector path beside
IVF (simsearch.py) and PQ/ADC (pq.py).

Layout: vectors are IVF-bucketed by nearest centroid (the same projection
as simsearch.ivf_assign), then each bucket holds a small hierarchical
navigable small-world graph searched greedily — the classic two-level
"IVF to route, graph to search" architecture. Spark mapping:

- routing is the existing centroid argmin projection (no join);
- per-bucket search runs in ONE cogrouped ``applyInPandas``: vectors
  grouped by centroid_id cogrouped with the probes routed to that bucket
  (multi-probe, nprobe buckets per probe), so the graph for a bucket is
  built and searched once per micro-partition, entirely in numpy;
- global top-k per probe is a final window over the per-bucket
  candidates (bounded: ef results per probe per bucket).

Build: deterministic INCREMENTAL insertion with a multi-layer skip-list
hierarchy (HNSW, Malkov & Yashunin) — each node's layer count is drawn
from the paper's geometric distribution, but DETERMINISTICALLY from an
md5 hash of its id (P(level >= l) = degree^-l), so the structure is a
pure function of (ids, vectors) with no RNG state. Vectors enter in id
order; each insertion greedily descends from the current top entry point
through the layers above its own level (ef=1), then beam-searches each
of its layers for its ``graph_degree`` nearest, connects
bidirectionally, and over-degree nodes prune to their best
``graph_degree`` neighbors by (sim desc, id asc). O(b·log b)-shaped
work and O(b·degree) total memory across all layers (the expected layer
population halves-or-better per level) — no b×b similarity matrix is
ever materialized, so million-vector buckets build in bounded memory.

Search descends the hierarchy the same way: greedy ef=1 from the top
entry down to layer 1, then a beam of width ``ef`` at layer 0.
Similarities are computed LAZILY (only for visited nodes) in both build
and search, so the number of distance evaluations — surfaced via the
optional ``stats`` counter, pytest-asserted below the flat-graph cost on
large buckets — is O(log b + ef·degree)-shaped, not O(b).

Everything in the bucket kernel is row-order-insensitive: rows sort by
id before any numpy op (levels are id-hash functions, so they commute
with the sort), because at cluster scale the order pandas groups arrive
in is NOT deterministic across runs/executors. Search ties break on
(similarity desc, id asc); the entry point is the first-inserted node
of the highest occupied layer (= smallest id among them — insertion is
in id order).

The bucket kernel (`_build_graph` + `_bucket_search`) is module-level
pure numpy shared by the Spark closure AND tools/freeze_hnsw_golden.py,
which freezes the expected rows into golden/hnsw_topk.parquet — the same
frozen-golden discipline as extract_text: the DuckDB oracle reads the
golden while Spark recomputes through cogroup/window distribution, so
any distribution nondeterminism (bucket routing, multi-probe dedup,
row order) shows up as a hash mismatch.
"""

from __future__ import annotations

import hashlib
import heapq
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812

from ocr_cezam_spark.functions.numeric import round_he

from .simsearch import (
    Centroids, _dist_entries, _dot, _to_double, probe_cents, seed_centroids,
)

_LEVEL_CAP = 32  # safety bound; P(level >= 32) <= 2^-32 even at deg=2


def _node_level(nid: int, mult: float) -> int:
    """Deterministic HNSW level for a node id: the paper's geometric
    draw floor(-ln(u) * mL) with u derived from md5(id) instead of an
    RNG, so levels are a pure function of the id (permutation- and
    partitioning-invariant). mult = 1/ln(degree) gives
    P(level >= l) = degree^-l."""
    if mult <= 0.0:
        return 0
    h = int.from_bytes(
        hashlib.md5(str(int(nid)).encode("ascii")).digest()[:8], "big"
    )
    u = (h + 0.5) / 2.0**64
    return min(int(-math.log(u) * mult), _LEVEL_CAP)


def _build_graph(unit, ids, deg: int, ef_build: int, levels=None):
    """Deterministic incremental HNSW build over unit vectors SORTED BY
    id. Returns ``(layers, levels, entry)``:

    - ``layers[0]`` — list of neighbor index lists, one per node (the
      base NSW graph every node belongs to);
    - ``layers[l]`` for l >= 1 — dict {node_idx: [neighbor_idx, ...]}
      holding only the nodes whose level >= l (expected fraction
      deg^-l of the bucket);
    - ``levels[i]`` — node i's top layer;
    - ``entry`` — index of the search entry point (first-inserted node
      of the highest layer).

    Nodes insert in id order. An insertion at level li greedily descends
    (ef=1) from the entry through layers above li, then per layer
    li..0 takes its ``deg`` nearest from a lazy beam search over the
    nodes already in that layer (sims computed only for visited nodes —
    the no-b×b property), connects bidirectionally, and prunes any
    over-degree node to its best ``deg`` by (sim desc, id asc).

    ``levels`` overrides the id-hash level assignment — the pytest
    ablation hook ([0]*b reproduces the r5 single-layer NSW)."""
    import numpy as np

    b = len(ids)
    if levels is None:
        mult = 1.0 / math.log(deg) if deg > 1 else 0.0
        levels = [_node_level(int(ids[i]), mult) for i in range(b)]
    layers: list = [[[] for _ in range(b)]]  # layer 0: dense list

    def ensure_layer(l: int) -> None:
        while len(layers) <= l:
            layers.append({})

    entry = 0
    entry_level = levels[0]
    ensure_layer(entry_level)
    for l in range(1, entry_level + 1):
        layers[l][0] = []

    def beam_search(s, start: int, l: int, ef: int,
                    guard=None) -> list[tuple[float, int]]:
        """Lazy beam of width ``ef`` at layer ``l`` seeded at ``start``
        (must be a member of layer l); returns (sim, idx) best-first.
        ``guard(j)`` filters admissible nodes (build-time: j < i)."""
        nb_map = layers[l]
        visited = {start}
        cand = [(-s(start), ids[start], start)]
        result: list = [(s(start), -ids[start], start)]
        while cand:
            negs, _tid, cur = heapq.heappop(cand)
            if len(result) >= ef and -negs < result[0][0]:
                break
            for nb in nb_map[cur]:
                if nb in visited or (guard is not None and not guard(nb)):
                    continue
                visited.add(nb)
                sv = s(nb)
                if (len(result) < ef or sv > result[0][0]
                        or (sv == result[0][0] and -ids[nb] > result[0][1])):
                    heapq.heappush(cand, (-sv, ids[nb], nb))
                    heapq.heappush(result, (sv, -ids[nb], nb))
                    if len(result) > ef:
                        heapq.heappop(result)
        return sorted(((sv, idx) for sv, _nid, idx in result),
                      key=lambda t: (-t[0], ids[t[1]]))

    def prune(x: int, l: int) -> None:
        # M_max0 = 2M at layer 0 (Malkov & Yashunin): the base layer
        # keeps twice the degree so hub nodes stay navigable after the
        # bidirectional connects; upper layers cap at deg.
        cap = 2 * deg if l == 0 else deg
        nb_map = layers[l]
        cur = nb_map[x]
        if len(cur) > cap:
            scored = sorted(
                ((float(np.dot(unit[x], unit[j])), j) for j in cur),
                key=lambda t: (-t[0], ids[t[1]]),
            )
            nb_map[x] = [j for _sv, j in scored[:cap]]

    for i in range(1, b):
        li = levels[i]
        sims: dict[int, float] = {}

        def s(j: int, _sims=sims, _i=i) -> float:
            v = _sims.get(j)
            if v is None:
                v = float(np.dot(unit[j], unit[_i]))
                _sims[j] = v
            return v

        ensure_layer(li)
        # greedy ef=1 descent through layers above this node's level
        cur = entry
        for l in range(entry_level, li, -1):
            improved = True
            while improved:
                improved = False
                best_s, best_j = s(cur), cur
                for nb in layers[l][cur]:
                    sv = s(nb)
                    if sv > best_s or (sv == best_s and ids[nb] < ids[best_j]):
                        best_s, best_j = sv, nb
                if best_j != cur:
                    cur, improved = best_j, True
        # connect at each of this node's layers, top-down
        for l in range(min(li, entry_level), -1, -1):
            if l > 0:
                layers[l].setdefault(i, [])
            if l == 0 and i <= deg:
                found = list(range(i))  # bootstrap: connect to all prior
            else:
                res = beam_search(s, cur, l, ef_build,
                                  guard=lambda j, _i=i: j < _i)
                found = [idx for _sv, idx in res[:deg]]
                cur = res[0][1] if res else cur
            nb_map = layers[l]
            for j in found:
                if j not in nb_map[i]:
                    nb_map[i].append(j)
                if i not in nb_map[j]:
                    nb_map[j].append(i)
                    prune(j, l)
            prune(i, l)
        if li > entry_level:
            # register in the new top layers (sole member: no neighbors)
            for l in range(entry_level + 1, li + 1):
                layers[l].setdefault(i, [])
            entry, entry_level = i, li
    return layers, levels, entry


def _bucket_search(ids, vecs, probe_ids, probe_vecs,
                   deg: int, beam: int, stats: dict | None = None,
                   flat: bool = False):
    """Pure-numpy bucket kernel: build the HNSW graph over (ids, vecs),
    hierarchy-descend + beam-search it for every probe, return
    (probe_id, nb_id, sim_raw) parallel lists. Sorts by id first —
    row-order-insensitive. Shared by the Spark cogroup closure and the
    golden freeze twin. ``stats`` (optional) accumulates
    ``{"sims": <distance evaluations>, "hops": <nodes expanded>}``
    across probes — the cost model the hierarchy pytest asserts on.
    ``flat=True`` forces every node to level 0 (the r5 single-layer
    design) — pytest ablation only."""
    import numpy as np

    order = np.argsort(ids, kind="stable")
    ids = np.asarray(ids)[order]
    v = np.stack(vecs)[order].astype(np.float64)
    norms = np.linalg.norm(v, axis=1)
    norms[norms == 0.0] = 1.0
    unit = v / norms[:, None]
    layers, levels, entry = _build_graph(
        unit, ids, deg, ef_build=max(beam, 2 * deg),
        levels=[0] * len(ids) if flat else None)
    top = len(layers) - 1
    out_pid, out_nid, out_sim = [], [], []
    for probe_id, p in zip(probe_ids, probe_vecs):
        p = np.asarray(p, dtype=np.float64)
        pn = np.linalg.norm(p) or 1.0
        q = p / pn
        psims: dict[int, float] = {}

        def s(j: int) -> float:
            sv = psims.get(j)
            if sv is None:
                sv = float(np.dot(unit[j], q))
                psims[j] = sv
            return sv

        # greedy ef=1 descent from the top layer down to layer 1
        cur = entry
        hops = 0
        for l in range(top, 0, -1):
            if l > levels[cur]:
                continue
            improved = True
            while improved:
                improved = False
                hops += 1
                best_s, best_j = s(cur), cur
                for nb in layers[l][cur]:
                    sv = s(nb)
                    if sv > best_s or (sv == best_s and ids[nb] < ids[best_j]):
                        best_s, best_j = sv, nb
                if best_j != cur:
                    cur, improved = best_j, True
        # beam of width ``beam`` at layer 0
        nbrs0 = layers[0]
        visited = {cur}
        cand = [(-s(cur), ids[cur], cur)]
        result: list = [(s(cur), -ids[cur], cur)]
        while cand:
            negs, _tid, node = heapq.heappop(cand)
            if len(result) >= beam and -negs < result[0][0]:
                break
            hops += 1
            for nb in nbrs0[node]:
                nb = int(nb)
                if nb in visited:
                    continue
                visited.add(nb)
                sv = s(nb)
                # admit on strict improvement OR an equal-sim neighbor
                # with a SMALLER id than the incumbent worst — the
                # documented (sim desc, id asc) tie-break; result[0]
                # is the min by (s, -id), i.e. the tie's larger id
                if (len(result) < beam or sv > result[0][0]
                        or (sv == result[0][0]
                            and -ids[nb] > result[0][1])):
                    heapq.heappush(cand, (-sv, ids[nb], nb))
                    heapq.heappush(result, (sv, -ids[nb], nb))
                    if len(result) > beam:
                        heapq.heappop(result)
        if stats is not None:
            stats["sims"] = stats.get("sims", 0) + len(psims)
            stats["hops"] = stats.get("hops", 0) + hops
        for sv, _nid, idx in result:
            if ids[idx] != probe_id:
                out_pid.append(int(probe_id))
                out_nid.append(int(ids[idx]))
                out_sim.append(float(sv))
    return out_pid, out_nid, out_sim


def _bucketed(emb: DataFrame, cents: Centroids, probe_ids: list[int],
              nprobe: int, id_col: str, vec_col: str):
    base = emb.select(
        F.col(id_col).alias("nb_id"), _to_double(F.col(vec_col)).alias("v")
    ).withColumn("_vv", _dot(F.col("v"), F.col("v")))
    assigned = base.withColumn(
        "centroid_id",
        F.array_min(_dist_entries(F.col("v"), cents, F.col("_vv")))["cid"],
    ).select("nb_id", "v", "centroid_id")
    probes_expr = probe_cents(F.col("v"), cents, F.col("_vv"), nprobe)
    probes = base.filter(F.col("nb_id").isin(probe_ids)).select(
        F.col("nb_id").alias("probe_id"),
        F.col("v").alias("p"),
        F.explode(probes_expr).alias("centroid_id"),
    )
    return assigned, probes


def hnsw_topk(emb: DataFrame, probe_ids: list[int], k: int = 3,
              n_centroids: int = 8, nprobe: int = 2,
              graph_degree: int = 8, ef: int = 16,
              id_col: str = "vec_id", vec_col: str = "embedding",
              centroids: Centroids | None = None) -> DataFrame:
    """Top-k nearest neighbors by cosine for each probe id, via HNSW
    hierarchy search inside the probe's ``nprobe`` nearest IVF buckets.

    ``graph_degree`` = neighbors per node per layer; ``ef`` = layer-0
    beam width (and the per-bucket candidate budget fed to the global
    top-k window)."""
    import pandas as pd

    cents = centroids or seed_centroids(emb, n_centroids, id_col, vec_col)
    assigned, probes = _bucketed(emb, cents, probe_ids, nprobe, id_col, vec_col)

    deg, beam = graph_degree, ef

    def search(key, vec_pdf, probe_pdf):
        if vec_pdf.empty or probe_pdf.empty:
            return pd.DataFrame(
                {"probe_id": pd.Series([], dtype="int64"),
                 "nb_id": pd.Series([], dtype="int64"),
                 "sim_raw": pd.Series([], dtype="float64")}
            )
        out_pid, out_nid, out_sim = _bucket_search(
            vec_pdf["nb_id"].to_numpy(), vec_pdf["v"].to_numpy(),
            probe_pdf["probe_id"].to_numpy(), probe_pdf["p"].to_numpy(),
            deg, beam,
        )
        return pd.DataFrame(
            {"probe_id": out_pid, "nb_id": out_nid, "sim_raw": out_sim}
        )

    cand = (
        assigned.groupBy("centroid_id")
        .cogroup(probes.groupBy("centroid_id"))
        .applyInPandas(search, "probe_id long, nb_id long, sim_raw double")
        .dropDuplicates(["probe_id", "nb_id"])  # multi-probe overlap
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim_raw"), F.asc("nb_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("probe_id", "rank", "nb_id", round_he("sim_raw", 4).alias("cosine"))
    )
