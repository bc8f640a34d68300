"""Round-7 continuation operators: HITS hubs/authorities (graph.hits),
KMV set-operation sketches (sketch.kmv_*), asymmetric containment
near-dup (dedup.containment_pairs) and passage chunking
(textstats.chunk_passages / chunk_dedup_stats)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ocr_cezam_spark.operators import dedup, graph, sketch, textstats


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------

def _np_hits(edges, iters):
    hosts = sorted({h for e in edges for h in e})
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    a_mat = np.zeros((n, n))
    for s, d in set(edges):  # distinct edges, adjacency semantics
        a_mat[idx[s], idx[d]] = 1.0
    hub = np.ones(n)
    auth = None
    for _ in range(iters):
        auth = a_mat.T @ hub
        auth /= auth.sum()
        hub = a_mat @ auth
        hub /= hub.sum()
    return ({h: auth[idx[h]] for h in hosts},
            {h: hub[idx[h]] for h in hosts})


def test_hits_matches_numpy_power_iteration(spark):
    edges = [("h1", "a1"), ("h1", "a2"), ("h1", "a3"),
             ("h2", "a1"), ("h2", "a2"), ("a3", "a1"),
             # parallel edge: must collapse to one (adjacency semantics)
             ("h1", "a1")]
    links = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["host"]: (r["auth"], r["hub"])
           for r in graph.hits(links, iters=3).collect()}
    auth, hub = _np_hits(edges, 3)
    for h in auth:
        assert abs(got[h][0] - auth[h]) < 1e-7, (h, got[h][0], auth[h])
        assert abs(got[h][1] - hub[h]) < 1e-7, (h, got[h][1], hub[h])
    # structure: a1 is the best-endorsed authority, h1 the best hub,
    # and pure authorities have zero hub score (the asymmetry PageRank
    # cannot express)
    assert got["a1"][0] == max(v[0] for v in got.values())
    assert got["h1"][1] == max(v[1] for v in got.values())
    assert got["a1"][1] == 0.0 and got["a2"][1] == 0.0
    assert got["h1"][0] == 0.0 and got["h2"][0] == 0.0


def test_hits_empty_graph(spark):
    links = spark.createDataFrame([], "src string, dst string")
    assert graph.hits(links).count() == 0


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------

def _keys_df(spark, n, grp="g"):
    return spark.range(n).select(
        F.concat(F.lit("key"), F.col("id")).alias("k"),
        F.lit(grp).alias("grp"),
    )


def test_kmv_exact_branch_below_k(spark):
    row = sketch.kmv_distinct(_keys_df(spark, 10), "k", "grp", k=16).first()
    assert row["n_hashes"] == 10
    assert row["est_distinct"] == 10.0


def test_kmv_estimator_accuracy(spark):
    # deterministic (md5), so this pins the actual estimate; the bound
    # is the statistical one (rel err ~ 1/sqrt(k-2) ~ 9% at k=128;
    # 3 sigma < 30%)
    row = sketch.kmv_distinct(_keys_df(spark, 2000), "k", "grp",
                              k=128).first()
    assert row["n_hashes"] == 128
    assert abs(row["est_distinct"] - 2000) / 2000 < 0.3


def test_kmv_null_keys_ignored(spark):
    df = spark.createDataFrame(
        [("a", "g"), (None, "g"), ("b", "g")], "k string, grp string")
    row = sketch.kmv_distinct(df, "k", "grp", k=8).first()
    assert row["n_hashes"] == 2 and row["est_distinct"] == 2.0


def test_kmv_merge_invariant_bit_identical(spark):
    df = spark.range(500).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"),
        (F.col("id") % 7).cast("string").alias("shard"),
    )
    row = sketch.kmv_merge(df, "k", "shard", k=32).first()
    assert row["sketches_equal"] == 1
    assert row["est_merged"] == row["est_whole"]
    assert row["n_shards"] == 7


def test_kmv_overlap_exact_small_sets(spark):
    a = spark.range(0, 30).select(F.concat(F.lit("u"), "id").alias("k"))
    b = spark.range(20, 50).select(F.concat(F.lit("u"), "id").alias("k"))
    row = sketch.kmv_overlap(a, b, "k", k=64).first()
    assert row["est_a"] == 30.0 and row["est_b"] == 30.0
    assert row["est_union"] == 50.0
    assert row["est_intersection"] == 10.0
    assert row["jaccard_est"] == 0.2


def test_kmv_overlap_estimator_regime(spark):
    # 3000 keys per side, 1500 shared -> jaccard 1/3, union 4500
    a = spark.range(0, 3000).select(F.concat(F.lit("u"), "id").alias("k"))
    b = spark.range(1500, 4500).select(F.concat(F.lit("u"), "id").alias("k"))
    row = sketch.kmv_overlap(a, b, "k", k=256).first()
    assert abs(row["est_union"] - 4500) / 4500 < 0.25
    assert abs(row["jaccard_est"] - 1 / 3) < 0.15
    assert abs(row["est_intersection"] - 1500) / 1500 < 0.4


# ---------------------------------------------------------------------------
# containment_pairs
# ---------------------------------------------------------------------------

def _contain_docs(spark):
    long_text = " ".join(f"w{i}" for i in range(40))
    excerpt = " ".join(f"w{i}" for i in range(20))  # strict prefix
    other = " ".join(f"x{i}" for i in range(40))
    return spark.createDataFrame(
        [(1, long_text), (2, excerpt), (3, other)],
        "doc_id long, text string",
    )


def test_containment_detects_excerpt_jaccard_misses(spark):
    rows = dedup.containment_pairs(_contain_docs(spark),
                                   threshold=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["a"], r["b"]) == (1, 2)
    # every excerpt shingle is in the original -> containment_b = 1.0,
    # while Jaccard sits near |B|/|A| — the asymmetric case
    assert r["containment_b"] == 1.0
    assert r["jaccard"] < 0.5
    assert r["containment_a"] < 0.5


def test_containment_df_cap_drops_boilerplate_shingles(spark):
    # one 3-word phrase shared by 25 docs: with max_df=20 the phrase is
    # a stop-shingle and generates NO candidate pairs
    docs = spark.createDataFrame(
        [(i, f"shared common phrase unique{i} tail{i} end{i}")
         for i in range(25)],
        "doc_id long, text string",
    )
    assert dedup.containment_pairs(docs, max_df=20, threshold=0.1)\
        .count() == 0
    # raising the cap above the phrase's df brings the pairs back
    assert dedup.containment_pairs(docs, max_df=30, threshold=0.1)\
        .count() > 0


# ---------------------------------------------------------------------------
# chunk_passages / chunk_dedup_stats
# ---------------------------------------------------------------------------

def test_chunk_geometry_and_reconstruction(spark):
    n_tok, chunk, stride = 100, 32, 24
    text = " ".join(f"t{i}" for i in range(n_tok))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        textstats.chunk_passages(docs, chunk, stride).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # starts at every stride multiple below n
    assert [r["start_tok"] for r in rows] == [0, 24, 48, 72, 96]
    # every chunk except the remainder is full-size; token offsets align
    for r in rows:
        toks = r["chunk_text"].split(" ")
        assert toks[0] == f"t{r['start_tok']}"
        assert r["n_tokens"] == len(toks) == min(chunk,
                                                 n_tok - r["start_tok"])
    # stride-prefix reconstruction: concatenating the first `stride`
    # tokens of each chunk plus the final remainder yields the doc
    rebuilt = []
    for r in rows:
        rebuilt.extend(r["chunk_text"].split(" ")[:stride])
    rebuilt.extend(rows[-1]["chunk_text"].split(" ")[stride:])
    assert rebuilt == text.split(" ")


def test_chunk_short_doc_single_chunk(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    rows = textstats.chunk_passages(docs, chunk=32, stride=24).collect()
    assert len(rows) == 1
    assert rows[0]["n_tokens"] == 3 and rows[0]["chunk_text"] == "a b c"


def test_chunk_exact_stride_multiple_no_empty_tail(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(48)))],
        "doc_id long, text string",
    )
    rows = textstats.chunk_passages(docs, chunk=32, stride=24).collect()
    assert [r["start_tok"] for r in sorted(rows, key=lambda r: r["chunk_idx"])] \
        == [0, 24]
    assert all(r["n_tokens"] > 0 for r in rows)


def test_chunk_dedup_flags_shared_boilerplate(spark):
    bp = " ".join(f"bp{i}" for i in range(48))
    docs = spark.createDataFrame(
        [(i, bp + " " + " ".join(f"d{i}w{j}" for j in range(30)))
         for i in range(4)]
        + [(9, " ".join(f"solo{j}" for j in range(60)))],
        "doc_id long, text string",
    )
    got = {r["id"]: r for r in
           textstats.chunk_dedup_stats(docs, 32, 24).collect()}
    for i in range(4):  # shared 48-token prefix -> first chunk collides
        assert got[i]["n_dup_chunks"] >= 1, i
    assert got[9]["dup_frac"] == 0.0


# ---------------------------------------------------------------------------
# script_profile / crawl_text_churn
# ---------------------------------------------------------------------------

def test_script_profile_dominant_and_fractions(spark):
    docs = spark.createDataFrame(
        [(1, "hello plain english words"),
         (2, "Привет мир русский текст"),
         (3, "你好世界 こんにちは"),
         (4, "مرحبا بالعالم"),
         (5, "1234 5678 --- :::"),
         (6, "mixed Привет hello world text")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           textstats.script_profile(docs).collect()}
    assert got[1]["script"] == "latin" and got[1]["frac_latin"] == 1.0
    assert got[2]["script"] == "cyrillic" and got[2]["n_latin"] == 0
    assert got[3]["script"] == "cjk"
    assert got[4]["script"] == "arabic"
    assert got[5]["script"] == "none"
    assert got[5]["frac_latin"] == 0.0 and got[5]["n_latin"] == 0
    # mixed doc: latin letters outnumber the 6 cyrillic ones
    assert got[6]["script"] == "latin"
    assert got[6]["n_cyrillic"] == 6
    assert 0 < got[6]["frac_cyrillic"] < got[6]["frac_latin"]


def test_script_profile_accented_latin_counts(spark):
    docs = spark.createDataFrame(
        [(1, "Voilà déjà naïve œuvre")], "doc_id long, text string")
    r = textstats.script_profile(docs).first()
    # à é à ï œ all count as latin; × ÷ would not (excluded from class)
    assert r["n_latin"] == len("Voilà déjà naïve œuvre") - 3  # 3 spaces
    assert r["script"] == "latin"


def test_crawl_text_churn_grades_drift(spark):
    base = " ".join(f"w{i}" for i in range(30))
    old = spark.createDataFrame(
        [("u1", base), ("u2", base), ("u3", base), ("u4", base)],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [("u1", base),                             # unchanged
         ("u2", base + " tiny appended tail"),     # small drift
         ("u3", " ".join(f"z{i}" for i in range(30))),  # rewrite
         ("u5", base)],                            # added url: excluded
        "url string, text string",
    )
    got = {r["url"]: r for r in
           dedup.crawl_text_churn(old, new).collect()}
    assert set(got) == {"u1", "u2", "u3"}  # inner-join contract
    assert got["u1"]["jaccard"] == 1.0 and got["u1"]["drifted"] == 0
    assert 0.5 < got["u2"]["jaccard"] < 1.0 and got["u2"]["drifted"] == 0
    assert got["u3"]["jaccard"] == 0.0 and got["u3"]["drifted"] == 1
