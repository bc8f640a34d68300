"""Product-quantization ANN: encoding shape, ADC vs exact L2 recall, and
Lloyd training improvement. Everything is deterministic (seed codebooks =
first-K subvectors), so the asserted recalls are exact, not flaky."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F  # noqa: N812

from ocr_cezam_spark.operators import pq

EMB = "/root/testdata/sf0.01/embeddings.parquet"
PROBES = [0, 1, 2, 3, 4]


def _exact_l2_topk(emb, probes, k=5):
    base = emb.select(
        F.col("vec_id").alias("nb_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    pr = base.filter(F.col("nb_id").isin(probes)).select(
        F.col("nb_id").alias("probe_id"), F.col("v").alias("p")
    )
    dist = F.aggregate(
        F.zip_with("p", "v", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("probe_id").orderBy(F.asc("l2"), F.asc("nb_id"))
    rows = (
        base.crossJoin(F.broadcast(pr))
        .filter(F.col("nb_id") != F.col("probe_id"))
        .select("probe_id", "nb_id", dist.alias("l2"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .collect()
    )
    out: dict = {}
    for r in rows:
        out.setdefault(r["probe_id"], set()).add(r["nb_id"])
    return out


def _recall(res, exact):
    approx: dict = {}
    for r in res.collect():
        approx.setdefault(r["probe_id"], set()).add(r["nb_id"])
    return sum(len(exact[p] & approx.get(p, set())) for p in exact) / sum(
        len(v) for v in exact.values()
    )


def test_pq_encode_shape_and_determinism(spark):
    emb = spark.read.parquet(EMB)
    a = {r["nb_id"]: r["codes"] for r in pq.pq_encode(emb).collect()}
    b = {r["nb_id"]: r["codes"] for r in pq.pq_encode(emb).collect()}
    assert a == b and len(a) == emb.count()
    for codes in list(a.values())[:20]:
        assert len(codes) == pq.PQ_M
        assert all(0 <= c < pq.PQ_K for c in codes)


def test_pq_adc_recall_and_training(spark):
    emb = spark.read.parquet(EMB)
    exact = _exact_l2_topk(emb, PROBES)
    seeded = _recall(pq.pq_topk(emb, PROBES, k=5), exact)
    trained_cb = pq.train_codebooks(emb, iters=2)
    trained = _recall(pq.pq_topk(emb, PROBES, k=5, codebooks=trained_cb), exact)
    # an 8-byte sketch over 64 random-ish dims: modest recall is expected;
    # training must help and clear a floor
    assert trained >= seeded - 1e-9, (trained, seeded)
    assert trained >= 0.25, (trained, seeded)
