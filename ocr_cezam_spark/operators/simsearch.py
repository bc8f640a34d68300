"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline; IVF bucketing is the
scale path (assign to nearest of K centroids, search within the bucket —
the shuffle is on centroid_id, cutting the candidate set by ~K).

Dot products use zip_with + aggregate (JVM-side higher-order functions —
no Python). Distances use the algebraic identity
``|a-b|^2 = a.a - 2 a.b + b.b`` so the same float operation order is
reproducible in the DuckDB oracle (list_dot_product three times).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812


def _to_double(col) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(emb: DataFrame, probe_ids: list[int], k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k: broadcast the probe set against the full
    table; rank per probe. One shuffle (the window) on probe_id."""
    base = emb.select(
        F.col(id_col).alias("nb_id"), _to_double(F.col(vec_col)).alias("v")
    )
    probes = base.filter(F.col("nb_id").isin(probe_ids)).select(
        F.col("nb_id").alias("probe_id"), F.col("v").alias("p")
    )
    joined = base.crossJoin(F.broadcast(probes)).filter(
        F.col("nb_id") != F.col("probe_id")
    )
    sim = _dot(F.col("p"), F.col("v")) / (
        F.sqrt(_dot(F.col("p"), F.col("p"))) * F.sqrt(_dot(F.col("v"), F.col("v")))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim_raw"), F.asc("nb_id"))
    return (
        joined.select("probe_id", "nb_id", sim.alias("sim_raw"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("probe_id", "rank", "nb_id", F.round("sim_raw", 4).alias("cosine"))
    )


def embedding_near_dup_pairs(emb: DataFrame, threshold: float = 0.99,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    A perturbed clone of every vector (first component * 1.01, id+10000)
    guarantees true near-dups exist; pairs above threshold are emitted.
    At scale the all-pairs stage is replaced by IVF/LSH blocking
    (ivf_assign) — here the candidate set is the broadcast clone join."""
    base = emb.select(
        F.col(id_col).alias("a"), _to_double(F.col(vec_col)).alias("va")
    )
    clones = base.select(
        (F.col("a") + 10_000).alias("b"),
        F.concat(
            F.transform(F.slice("va", 1, 1), lambda x: x * 1.01),
            F.slice("va", 2, 100_000),
        ).alias("vb"),
    )
    both = base.unionByName(
        clones.select(F.col("b").alias("a"), F.col("vb").alias("va"))
    )
    left = both.select(F.col("a"), F.col("va"))
    right = both.select(F.col("a").alias("b"), F.col("va").alias("vb"))
    sim = _dot(F.col("va"), F.col("vb")) / (
        F.sqrt(_dot(F.col("va"), F.col("va"))) * F.sqrt(_dot(F.col("vb"), F.col("vb")))
    )
    return (
        left.join(right, F.col("a") < F.col("b"))
        .select("a", "b", sim.alias("sim_raw"))
        .filter(F.col("sim_raw") >= threshold)
        .select("a", "b", F.round("sim_raw", 4).alias("cosine"))
    )


def ivf_assign(emb: DataFrame, n_centroids: int = 8,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF bucketing: centroids = first K vectors (deterministic seed set);
    each vector goes to its nearest centroid by squared L2."""
    base = emb.select(
        F.col(id_col).alias("vid"), _to_double(F.col(vec_col)).alias("v")
    )
    cents = base.filter(F.col("vid") < n_centroids).select(
        F.col("vid").alias("centroid_id"), F.col("v").alias("c")
    )
    dist = (
        _dot(F.col("v"), F.col("v"))
        - 2 * _dot(F.col("v"), F.col("c"))
        + _dot(F.col("c"), F.col("c"))
    )
    w = Window.partitionBy("vid").orderBy(F.asc("dist"), F.asc("centroid_id"))
    assigned = (
        base.crossJoin(F.broadcast(cents))
        .select("vid", "centroid_id", dist.alias("dist"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return assigned.select("vid", "centroid_id", F.round("dist", 3).alias("dist"))


def ivf_topk(emb: DataFrame, probe_ids: list[int], k: int = 3,
             n_centroids: int = 8, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """IVF-bucketed ANN: each probe searches ONLY its nearest centroid's
    bucket — the scale path where the candidate set shrinks ~n_centroids-
    fold (vs cosine_topk's brute force). Join keys: centroid_id."""
    assigned = ivf_assign(emb, n_centroids, id_col, vec_col)
    base = emb.select(
        F.col(id_col).alias("nb_id"), _to_double(F.col(vec_col)).alias("v")
    ).join(assigned.select(F.col("vid").alias("nb_id"), "centroid_id"), "nb_id")
    probes = base.filter(F.col("nb_id").isin(probe_ids)).select(
        F.col("nb_id").alias("probe_id"),
        F.col("v").alias("p"),
        F.col("centroid_id"),
    )
    cands = base.join(F.broadcast(probes), "centroid_id").filter(
        F.col("nb_id") != F.col("probe_id")
    )
    sim = _dot(F.col("p"), F.col("v")) / (
        F.sqrt(_dot(F.col("p"), F.col("p"))) * F.sqrt(_dot(F.col("v"), F.col("v")))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim_raw"), F.asc("nb_id"))
    return (
        cands.select("probe_id", "centroid_id", "nb_id", sim.alias("sim_raw"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("probe_id", "centroid_id", "rank", "nb_id",
                F.round("sim_raw", 4).alias("cosine"))
    )


def ivf_bucket_stats(emb: DataFrame, n_centroids: int = 8) -> DataFrame:
    # min/max instead of avg: they are order-independent, so the cross-engine
    # value is bit-stable (avg sums floats in partition order and can flip a
    # rounding boundary).
    return (
        ivf_assign(emb, n_centroids)
        .groupBy("centroid_id")
        .agg(
            F.count("*").alias("n_assigned"),
            F.min("dist").alias("min_dist"),
            F.max("dist").alias("max_dist"),
        )
        .orderBy("centroid_id")
    )
