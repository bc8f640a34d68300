"""Graph-based ANN (NSW/HNSW-style) as the third 10^9-vector path beside
IVF (simsearch.py) and PQ/ADC (pq.py).

Layout: vectors are IVF-bucketed by nearest centroid (the same projection
as simsearch.ivf_assign), then each bucket holds a small navigable
neighbor graph searched greedily — the classic two-level "IVF to route,
graph to search" architecture. Spark mapping:

- routing is the existing centroid argmin projection (no join);
- per-bucket search runs in ONE cogrouped ``applyInPandas``: vectors
  grouped by centroid_id cogrouped with the probes routed to that bucket
  (multi-probe, nprobe buckets per probe), so the graph for a bucket is
  built and searched once per micro-partition, entirely in numpy;
- global top-k per probe is a final window over the per-bucket
  candidates (bounded: ef results per probe per bucket).

Build: deterministic INCREMENTAL insertion (NSW-style, Malkov et al.) —
vectors enter in id order; each new vector greedy-searches the graph
built so far for its ``graph_degree`` nearest, connects bidirectionally,
and over-degree nodes prune to their best ``graph_degree`` neighbors by
(sim desc, id asc). O(b·log b)-shaped work and O(b·degree) memory — no
b×b similarity matrix is ever materialized, so million-vector buckets
build in bounded memory (the r4 design-point O(b²) build is gone).

Everything in the bucket kernel is row-order-insensitive: rows sort by id
before any numpy op, because at cluster scale the order pandas groups
arrive in is NOT deterministic across runs/executors. Search ties break
on (similarity desc, id asc); the search entry point is the bucket
medoid (max cosine to the bucket mean, ties by id).

The bucket kernel (`_build_graph` + `_bucket_search`) is module-level
pure numpy shared by the Spark closure AND tools/freeze_hnsw_golden.py,
which freezes the expected rows into golden/hnsw_topk.parquet — the same
frozen-golden discipline as extract_text: the DuckDB oracle reads the
golden while Spark recomputes through cogroup/window distribution, so
any distribution nondeterminism (bucket routing, multi-probe dedup,
row order) shows up as a hash mismatch.
"""

from __future__ import annotations

import heapq

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812

from ocr_cezam_spark.functions.numeric import round_he

from .simsearch import (
    Centroids, _dist_entries, _dot, _to_double, probe_cents, seed_centroids,
)


def _build_graph(unit, ids, deg: int, ef_build: int) -> list:
    """Deterministic incremental NSW build over unit vectors SORTED BY id.

    Returns per-node neighbor index lists. Nodes insert in row order (= id
    order); node i's candidates come from a lazy greedy beam search over
    the graph of nodes [0, i) (sims computed only for visited nodes — the
    no-b×b property), seeded at node 0. Bidirectional connect, then any
    node above ``deg`` neighbors keeps its best ``deg`` by (sim desc,
    id asc)."""
    import numpy as np

    b = len(ids)
    nbrs: list[list[int]] = [[] for _ in range(b)]

    def lazy_search(q, upto: int) -> list[tuple[float, int]]:
        """Greedy beam over nodes [0, upto); returns (sim, idx) best-first.
        Same admission/termination rule as the query search below."""
        sims: dict[int, float] = {}

        def s(j: int) -> float:
            v = sims.get(j)
            if v is None:
                v = float(np.dot(unit[j], q))
                sims[j] = v
            return v

        entry = 0
        visited = {entry}
        cand = [(-s(entry), ids[entry], entry)]
        result: list = [(s(entry), -ids[entry], entry)]
        while cand:
            negs, _tid, cur = heapq.heappop(cand)
            if len(result) >= ef_build and -negs < result[0][0]:
                break
            for nb in nbrs[cur]:
                if nb in visited or nb >= upto:
                    continue
                visited.add(nb)
                sv = s(nb)
                if (len(result) < ef_build or sv > result[0][0]
                        or (sv == result[0][0] and -ids[nb] > result[0][1])):
                    heapq.heappush(cand, (-sv, ids[nb], nb))
                    heapq.heappush(result, (sv, -ids[nb], nb))
                    if len(result) > ef_build:
                        heapq.heappop(result)
        return sorted(((sv, idx) for sv, _nid, idx in result),
                      key=lambda t: (-t[0], ids[t[1]]))

    def prune(x: int) -> None:
        if len(nbrs[x]) > deg:
            scored = sorted(
                ((float(np.dot(unit[x], unit[j])), j) for j in nbrs[x]),
                key=lambda t: (-t[0], ids[t[1]]),
            )
            nbrs[x] = [j for _sv, j in scored[:deg]]

    for i in range(1, b):
        if i <= deg:
            cand = list(range(i))
        else:
            cand = [idx for _sv, idx in lazy_search(unit[i], i)[:deg]]
        for j in cand:
            if j not in nbrs[i]:
                nbrs[i].append(j)
            if i not in nbrs[j]:
                nbrs[j].append(i)
                prune(j)
        prune(i)
    return nbrs


def _bucket_search(ids, vecs, probe_ids, probe_vecs,
                   deg: int, beam: int):
    """Pure-numpy bucket kernel: build the NSW graph over (ids, vecs),
    greedy-search it for every probe, return (probe_id, nb_id, sim_raw)
    parallel lists. Sorts by id first — row-order-insensitive. Shared by
    the Spark cogroup closure and the golden freeze twin."""
    import numpy as np

    order = np.argsort(ids, kind="stable")
    ids = np.asarray(ids)[order]
    v = np.stack(vecs)[order].astype(np.float64)
    norms = np.linalg.norm(v, axis=1)
    norms[norms == 0.0] = 1.0
    unit = v / norms[:, None]
    b = len(ids)
    # deterministic entry point: medoid = max cosine to the bucket mean
    mean = unit.mean(axis=0)
    entry = int(np.lexsort((ids, -(unit @ mean)))[0])
    nbrs = _build_graph(unit, ids, deg, ef_build=max(beam, 2 * deg))
    out_pid, out_nid, out_sim = [], [], []
    for probe_id, p in zip(probe_ids, probe_vecs):
        p = np.asarray(p, dtype=np.float64)
        pn = np.linalg.norm(p) or 1.0
        psims = (unit @ p) / pn
        # greedy best-first search, beam-bounded
        visited = {entry}
        cand = [(-psims[entry], ids[entry], entry)]
        result: list = []  # min-heap of (sim, -id, idx)
        heapq.heappush(result, (psims[entry], -ids[entry], entry))
        while cand:
            negs, _tid, cur = heapq.heappop(cand)
            if result and len(result) >= beam and -negs < result[0][0]:
                break
            for nb in nbrs[cur]:
                nb = int(nb)
                if nb in visited:
                    continue
                visited.add(nb)
                s = psims[nb]
                # admit on strict improvement OR an equal-sim neighbor
                # with a SMALLER id than the incumbent worst — the
                # documented (sim desc, id asc) tie-break; result[0]
                # is the min by (s, -id), i.e. the tie's larger id
                if (len(result) < beam or s > result[0][0]
                        or (s == result[0][0]
                            and -ids[nb] > result[0][1])):
                    heapq.heappush(cand, (-s, ids[nb], nb))
                    heapq.heappush(result, (s, -ids[nb], nb))
                    if len(result) > beam:
                        heapq.heappop(result)
        for s, _nid, idx in result:
            if ids[idx] != probe_id:
                out_pid.append(int(probe_id))
                out_nid.append(int(ids[idx]))
                out_sim.append(float(s))
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
    """Top-k nearest neighbors by cosine for each probe id, via greedy
    NSW graph search inside the probe's ``nprobe`` nearest IVF buckets.

    ``graph_degree`` = neighbors per node; ``ef`` = beam width (and the
    per-bucket candidate budget fed to the global top-k window)."""
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
