"""Product-quantization (PQ) ANN sketch — the 10^9-vector scale path.

Splits the d=64 embedding into M=8 subvectors of 8 dims; each subspace has
a K=16-entry codebook (deterministic seed: subvectors of the first K
vectors — the same convention as the IVF seed centroids; Lloyd refinement
can be layered exactly like simsearch.train_centroids). A vector is stored
as 8 one-byte codes — an 8-byte sketch instead of 256 bytes of floats — so
a candidate scan at 10^9 vectors streams the codes column only.

Query = asymmetric distance computation (ADC): the probe stays full
precision; per subspace, its distance to each of the 16 codebook entries
is precomputed driver-side into a 8x16 table (tiny — like any k-means
state), broadcast, and the per-candidate distance is 8 table lookups + 7
adds — a pure projection over the codes column, no vector math in the
scan. Encoding itself is an argmin projection per subspace (array_min
over (dist, code) structs; no join, no window), identical in shape to
simsearch.ivf_assign.

Float parity with the DuckDB oracle: encoding distances use the
``a.a - 2 a.b + b.b`` identity; the Spark ADC tables are computed in
Python with explicit left-to-right accumulation, while the oracle derives
its dtt CTE with list_dot_product over the same embeddings view — parity
therefore rests on the same sequential-fold equivalence (Python loop ==
Spark aggregate fold == DuckDB list_dot_product) that every other
simsearch oracle in this suite relies on, and the 8-term ADC sum is an
explicit left-to-right chain in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812

from ocr_cezam_spark.functions.numeric import round_he

from .simsearch import _dot, _lit_vec, _self_dot, _to_double

PQ_M = 8       # subspaces
PQ_SUBDIM = 8  # dims per subspace (M * SUBDIM = embedding dim)
PQ_K = 16      # codes per subspace

Codebooks = list[list[list[float]]]  # [mi][ki] -> subvector


def pq_codebooks(emb: DataFrame, id_col: str = "vec_id",
                 vec_col: str = "embedding", k: int = PQ_K,
                 m: int = PQ_M, subdim: int = PQ_SUBDIM) -> Codebooks:
    """Deterministic seed codebooks: subvectors of the first K vectors."""
    rows = (
        emb.filter(F.col(id_col) < k)
        .select(F.col(id_col).alias("ki"), _to_double(F.col(vec_col)).alias("v"))
        .orderBy("ki")
        .collect()
    )
    vecs = [[float(x) for x in r["v"]] for r in rows]
    return [
        [vec[mi * subdim:(mi + 1) * subdim] for vec in vecs]
        for mi in range(m)
    ]


def train_codebooks(emb: DataFrame, codebooks: Codebooks | None = None,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    iters: int = 1, subdim: int = PQ_SUBDIM) -> Codebooks:
    """Lloyd refinement per subspace: encode (projection), then new code
    vector = mean of assigned subvectors (one groupBy on (mi, code)).
    Empty cells keep their previous entry. K*M*subdim floats of driver
    state — the standard PQ training loop, distributed."""
    cb = codebooks or pq_codebooks(emb, id_col, vec_col)
    m = len(cb)
    for _ in range(iters):
        enc = pq_encode(emb, cb, id_col, vec_col, subdim)
        base = emb.select(
            F.col(id_col).alias("nb_id"), _to_double(F.col(vec_col)).alias("v")
        )
        exploded = (
            enc.join(base, "nb_id")
            .select("v", F.posexplode("codes").alias("mi", "code"))
            .select(
                "mi",
                "code",
                *[
                    F.element_at(
                        F.slice(F.col("v"), F.col("mi") * subdim + 1, subdim),
                        j + 1,
                    ).alias(f"d{j}")
                    for j in range(subdim)
                ],
            )
        )
        rows = exploded.groupBy("mi", "code").agg(
            *[F.avg(f"d{j}").alias(f"d{j}") for j in range(subdim)]
        ).collect()
        means = {
            (int(r["mi"]), int(r["code"])): [float(r[f"d{j}"]) for j in range(subdim)]
            for r in rows
        }
        cb = [
            [means.get((mi, ki), cb[mi][ki]) for ki in range(len(cb[mi]))]
            for mi in range(m)
        ]
    return cb


def _sub_code(sub: F.Column, svv: F.Column,
              cb_mi: list[list[float]]) -> F.Column:
    """argmin code for one subspace: array_min over (dist, code) structs —
    ties break to the smaller code, same as ORDER BY dd ASC, ki ASC.
    ``sub``/``svv`` are materialized columns, so the K per-code distances
    share one subvector slice and one self-dot. The codebook enters as one
    literal array-of-arrays with a 2-arg transform (element, index) — the
    K-fold inlined struct form made Catalyst analysis dominate wall time."""
    cb_arr = F.array(*[_lit_vec(c) for c in cb_mi])
    entries = F.transform(
        cb_arr,
        lambda c, ki: F.struct(
            (svv - 2 * _dot(sub, c) + _dot(c, c)).alias("dist"),
            ki.cast("int").alias("code"),
        ),
    )
    return F.array_min(entries)["code"]


def pq_encode(emb: DataFrame, codebooks: Codebooks | None = None,
              id_col: str = "vec_id", vec_col: str = "embedding",
              subdim: int = PQ_SUBDIM) -> DataFrame:
    """(id, codes array<int> length M) — the stored sketch.

    Staged projections: subvectors first, their self-dots second, argmin
    third — each many-times-referenced non-cheap expression lands in its
    own projection so CollapseProject cannot re-inline it K times."""
    cb = codebooks or pq_codebooks(emb, id_col, vec_col)
    m = len(cb)
    base = emb.select(
        F.col(id_col).alias("nb_id"), _to_double(F.col(vec_col)).alias("v")
    )
    subs = base.select(
        "nb_id",
        *[
            F.slice(F.col("v"), mi * subdim + 1, subdim).alias(f"_s{mi}")
            for mi in range(m)
        ],
    )
    with_svv = subs.select(
        "nb_id",
        *[F.col(f"_s{mi}") for mi in range(m)],
        *[
            _dot(F.col(f"_s{mi}"), F.col(f"_s{mi}")).alias(f"_svv{mi}")
            for mi in range(m)
        ],
    )
    codes = F.array(
        *[
            _sub_code(F.col(f"_s{mi}"), F.col(f"_svv{mi}"), cb[mi])
            for mi in range(m)
        ]
    )
    return with_svv.select("nb_id", codes.alias("codes"))


def adc_tables(probe_vecs: dict[int, list[float]], codebooks: Codebooks,
               subdim: int = PQ_SUBDIM) -> dict[int, list[list[float]]]:
    """probe_id -> [mi][ki] ADC distance, computed once driver-side with
    the same identity + sequential accumulation as the engines."""
    out: dict[int, list[list[float]]] = {}
    for pid, vec in probe_vecs.items():
        table = []
        for mi, cb_mi in enumerate(codebooks):
            ps = vec[mi * subdim:(mi + 1) * subdim]
            pvv = _self_dot(ps)
            row = []
            for c in cb_mi:
                dot_pc = 0.0
                for x, y in zip(ps, c):
                    dot_pc = dot_pc + x * y
                row.append(pvv - 2 * dot_pc + _self_dot(c))
            table.append(row)
        out[pid] = table
    return out


def pq_topk(emb: DataFrame, probe_ids: list[int], k: int = 5,
            codebooks: Codebooks | None = None, id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """ADC top-k: scan the codes column, 8 lookups + 7 adds per candidate."""
    spark = emb.sparkSession
    cb = codebooks or pq_codebooks(emb, id_col, vec_col)
    probe_rows = (
        emb.filter(F.col(id_col).isin(probe_ids))
        .select(F.col(id_col).alias("pid"), _to_double(F.col(vec_col)).alias("v"))
        .collect()
    )
    tables = adc_tables(
        {int(r["pid"]): [float(x) for x in r["v"]] for r in probe_rows}, cb
    )
    probes = spark.createDataFrame(
        [(pid, table) for pid, table in sorted(tables.items())],
        "probe_id long, dt array<array<double>>",
    )
    enc = pq_encode(emb, cb, id_col, vec_col)
    joined = enc.crossJoin(F.broadcast(probes)).filter(
        F.col("nb_id") != F.col("probe_id")
    )
    # left fold from 0.0: 0.0 + d0 is exact, so the sum order equals the
    # oracle's explicit d0 + d1 + ... + d7 chain bit-for-bit
    adc = F.aggregate(
        F.zip_with("codes", "dt", lambda c, row: F.element_at(row, c + 1)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("probe_id").orderBy(F.asc("adc_raw"), F.asc("nb_id"))
    return (
        joined.select("probe_id", "nb_id", adc.alias("adc_raw"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("probe_id", "rank", "nb_id", round_he("adc_raw", 4).alias("adc"))
    )
