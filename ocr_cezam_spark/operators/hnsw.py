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

Honesty note on build cost: the per-bucket k-NN graph here is built by
exact within-bucket distances (O(b^2) per bucket) — correct and bounded
at the tested design point where buckets are thousands of vectors;
production-scale builds swap in incremental insertion (O(b log b)) with
the SAME search path. The search is deterministic: ties break on
(similarity desc, id asc), entry point is the bucket medoid.

Approximate by construction, so the check is a recall-vs-brute-force
pytest (like the IVF and PQ paths' recall tests), not a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812

from .simsearch import (
    Centroids, _dist_entries, _dot, _to_double, probe_cents, seed_centroids,
)


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
    import heapq

    import numpy as np
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
        ids = vec_pdf["nb_id"].to_numpy()
        v = np.stack(vec_pdf["v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(v, axis=1)
        norms[norms == 0.0] = 1.0
        unit = v / norms[:, None]
        b = len(ids)
        # deterministic entry point: medoid = max cosine to the bucket mean
        mean = unit.mean(axis=0)
        entry = int(np.lexsort((ids, -(unit @ mean)))[0])
        # k-NN graph (exact within bucket; see module docstring)
        sims = unit @ unit.T
        np.fill_diagonal(sims, -np.inf)
        nbr_n = min(deg, b - 1)
        if nbr_n <= 0:
            nbrs = np.zeros((b, 0), dtype=np.int64)
        else:
            # argpartition then exact sort of the partitioned head, ties
            # broken by id for determinism
            part = np.argpartition(-sims, nbr_n - 1, axis=1)[:, :nbr_n]
            rows = np.arange(b)[:, None]
            order = np.lexsort((ids[part], -sims[rows, part]), axis=1)
            nbrs = part[rows, order]
        out_pid, out_nid, out_sim = [], [], []
        for prow in probe_pdf.itertuples(index=False):
            p = np.asarray(prow.p, dtype=np.float64)
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
                if ids[idx] != prow.probe_id:
                    out_pid.append(prow.probe_id)
                    out_nid.append(ids[idx])
                    out_sim.append(float(s))
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
        .select("probe_id", "rank", "nb_id", F.round("sim_raw", 4).alias("cosine"))
    )
