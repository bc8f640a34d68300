"""Freeze the hnsw_ann_topk golden from a PURE-PYTHON twin (no Spark).

hnsw_topk is deterministic by construction — ties break on (sim desc,
id asc), the entry point is the bucket medoid, and the bucket kernel
sorts rows by id — so its expected output is computable outside Spark:
this twin replicates the IVF routing (sequential-fold float dots, the
exact op order of simsearch._dot / _dist_entries) in pure Python and
reuses the SAME module-level numpy bucket kernel
(ocr_cezam_spark.operators.hnsw._bucket_search) the Spark closure runs,
then freezes the per-sf expected rows into golden/hnsw_topk.parquet.
The DuckDB oracle selects the slice matching the embeddings table it
was handed via a content checksum (sum of truncated first coordinates —
sf0.001 and sf0.01 both have 500 rows, so count alone cannot key).

What the golden checks, per the repo's golden discipline: that Spark's
DISTRIBUTION of the kernel (cogroup bucketing, multi-probe routing,
dedup, global top-k window) never changes a row — bucket kernel
correctness itself is covered by the recall/determinism pytests.

Run: python tools/freeze_hnsw_golden.py  (writes golden/hnsw_topk.parquet)
"""

from __future__ import annotations

import math
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_cezam_spark.operators.hnsw import _bucket_search  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden"
)
PROBES = [0, 1, 2, 3, 4]  # queries._PROBES
K, N_CENTROIDS, NPROBE, DEG, EF = 3, 8, 2, 8, 16


def fold_dot(a: list[float], b: list[float]) -> float:
    """Sequential left-to-right acc + x*y — the exact op order of
    simsearch._dot's F.aggregate fold (and DuckDB list_dot_product)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def emb_checksum(vecs: list[list[float]]) -> int:
    """SQL twin: SELECT sum(CAST(embedding[1] * 1e6 AS BIGINT)) — both
    sides truncate toward zero."""
    return sum(int(v[0] * 1e6) for v in vecs)


def hnsw_twin(ids: list[int], vecs: list[list[float]]):
    # seed centroids: first K vectors by id (simsearch.seed_centroids)
    by_id = sorted(zip(ids, vecs))
    cents = [(int(i), v) for i, v in by_id[:N_CENTROIDS]]
    cdots = {cid: fold_dot(c, c) for cid, c in cents}

    assigned: dict[int, tuple[list[int], list[list[float]]]] = {}
    routed: dict[int, tuple[list[int], list[list[float]]]] = {}
    for i, v in zip(ids, vecs):
        vv = fold_dot(v, v)
        # same arithmetic order as _dist_entries: (vv - 2*(v.c)) + (c.c)
        dists = [(vv - 2 * fold_dot(v, c) + cdots[cid], cid)
                 for cid, c in cents]
        best_cid = min(dists)[1]
        assigned.setdefault(best_cid, ([], []))
        assigned[best_cid][0].append(i)
        assigned[best_cid][1].append(v)
        if i in PROBES:
            for _d, cid in sorted(dists)[:NPROBE]:
                routed.setdefault(cid, ([], []))
                routed[cid][0].append(i)
                routed[cid][1].append(v)

    cand: dict[tuple[int, int], float] = {}
    for cid, (pids, pvecs) in routed.items():
        if cid not in assigned:
            continue
        bids, bvecs = assigned[cid]
        out_pid, out_nid, out_sim = _bucket_search(
            bids, bvecs, pids, pvecs, DEG, EF
        )
        for p, n, s in zip(out_pid, out_nid, out_sim):
            cand[(p, n)] = s  # multi-probe overlap: same bucket, same sim

    rows = []
    for p in PROBES:
        hits = sorted(
            ((s, n) for (pp, n), s in cand.items() if pp == p),
            key=lambda t: (-t[0], t[1]),
        )[:K]
        for rank, (s, n) in enumerate(hits, 1):
            cosine = math.floor(s * 10000.0 + 0.5) / 10000.0
            rows.append((p, rank, n, cosine))
    return rows


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    data = {"emb_key": [], "probe_id": [], "rank": [], "nb_id": [],
            "cosine": []}
    for sf_dir in SF_DIRS:
        t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        ids = [int(x) for x in t.column("vec_id").to_pylist()]
        vecs = [[float(x) for x in v] for v in
                t.column("embedding").to_pylist()]
        key = emb_checksum(vecs)
        rows = hnsw_twin(ids, vecs)
        print(f"{sf_dir}: n={len(ids)} key={key} golden_rows={len(rows)}")
        for p, rank, n, cosine in rows:
            data["emb_key"].append(key)
            data["probe_id"].append(p)
            data["rank"].append(rank)
            data["nb_id"].append(n)
            data["cosine"].append(cosine)
    schema = pa.schema([
        ("emb_key", pa.int64()), ("probe_id", pa.int64()),
        ("rank", pa.int64()), ("nb_id", pa.int64()),
        ("cosine", pa.float64()),
    ])
    pq.write_table(pa.table(data, schema=schema),
                   os.path.join(OUT, "hnsw_topk.parquet"))
    print(f"wrote {os.path.join(OUT, 'hnsw_topk.parquet')}")


if __name__ == "__main__":
    main()
