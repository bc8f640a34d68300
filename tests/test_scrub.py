"""Corpus-hygiene operators: PII redaction, mojibake repair, benchmark
decontamination, URL blocklist filtering (operators/scrub.py)."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: N812

from ocr_cezam_spark.operators import scrub


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_pii_redact_masks_and_counts(spark):
    rows = [
        (1, "write to jean.dupont+x@mail.example.fr or call 06 12 34 56 78"),
        (2, "server at 192.168.1.7 and 10.0.0.255, intl +33 6 98 76 54 32"),
        (3, "nothing sensitive here"),
    ]
    out = {r["doc_id"]: r for r in scrub.pii_redact(_docs(spark, rows)).collect()}
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ips"]) == (1, 1, 0)
    assert out[1]["text_redacted"] == "write to [EMAIL] or call [PHONE]"
    assert (out[2]["n_emails"], out[2]["n_phones"], out[2]["n_ips"]) == (0, 1, 2)
    assert out[2]["text_redacted"] == "server at [IP] and [IP], intl [PHONE]"
    assert out[3]["text_redacted"] == rows[2][1]
    assert (out[3]["n_emails"], out[3]["n_phones"], out[3]["n_ips"]) == (0, 0, 0)


def test_mojibake_roundtrip_restores_original(spark):
    original = "Un été à l'hôtel: «déjà vu», ça gêne d'être sûr — 25° où?"
    # corrupt = what a latin-1 misdecode of the UTF-8 bytes produces,
    # restricted to the MOJIBAKE_MAP repertoire (the em-dash stays)
    corrupt = original
    pairs = ([(g, b) for b, g in scrub.MOJIBAKE_MAP if b.startswith("Â")]
             + [(g, b) for b, g in scrub.MOJIBAKE_MAP if b.startswith("Ã")])
    for good, bad in pairs:
        corrupt = corrupt.replace(good, bad)
    assert corrupt != original
    out = scrub.fix_mojibake(_docs(spark, [(1, corrupt)])).collect()[0]
    assert out["text_fixed"] == original
    assert out["n_fixed"] == sum(original.count(g) for _, g in scrub.MOJIBAKE_MAP)


def test_mojibake_deep_repairs_double_encoding(spark):
    """Double-encoded text (UTF-8 bytes mis-decoded as latin-1 TWICE) is
    invisible to the constant chain — its 2-char patterns don't occur —
    but the deep (mapInArrow, ftfy-style) path peels both layers."""
    original = "café «déjà» 25° — naïve"

    def corrupt_once(s: str) -> str:
        return s.encode("utf-8").decode("latin-1")

    double = corrupt_once(corrupt_once(original))
    assert "Ã©" not in double  # the chain's patterns are absent
    rows = _docs(spark, [(1, double), (2, "plain ascii"), (3, None)])
    shallow = {r["doc_id"]: r for r in scrub.fix_mojibake(rows).collect()}
    assert shallow[1]["text_fixed"] != original  # chain can't fix it
    deep = {r["doc_id"]: r
            for r in scrub.fix_mojibake(rows, deep=True).collect()}
    assert deep[1]["text_fixed"] == original
    assert deep[1]["n_fixed"] == len(double) - len(original)
    # ascii untouched, nulls pass through
    assert deep[2]["text_fixed"] == "plain ascii" and deep[2]["n_fixed"] == 0
    assert deep[3]["text_fixed"] is None
    # single-encoded input repairs identically to the chain's repertoire
    single = corrupt_once(original)
    got = scrub.fix_mojibake(
        _docs(spark, [(1, single)]), deep=True).collect()[0]
    assert got["text_fixed"] == original
    # idempotent: clean text is a fixpoint
    again = scrub.fix_mojibake(
        _docs(spark, [(1, original)]), deep=True).collect()[0]
    assert again["text_fixed"] == original and again["n_fixed"] == 0


def test_decontaminate_flags_only_leaked_docs(spark):
    passage = "alpha beta gamma delta epsilon zeta eta theta iota"  # 9 words
    corpus = _docs(spark, [
        (1, "clean words only none shared with anything else at all"),
        (2, "leaked document containing the passage " + passage),
        (3, "short"),
    ])
    bench = _docs(spark, [(100, "benchmark doc holds " + passage + " verbatim")])
    out = {r["doc_id"]: r["n_hits"]
           for r in scrub.decontaminate(corpus, bench, n=8).collect()}
    # 9-word passage -> 2 pure 8-grams shared between bench and doc 2
    assert out == {2: 2}


def test_url_blocklist_filter_drops_sites_and_ads_paths(spark):
    pages = spark.createDataFrame(
        [
            (1, "https://www.good.example.com/p/1"),
            (2, "https://www.bad.example.com/p/2"),
            (3, "https://sub.good.example.com/p/ads/3"),
            (4, "https://other.example.org/x"),
        ],
        ["doc_id", "url"],
    )
    block = scrub.blocklist_of(spark, ["bad.example.com"])
    kept = scrub.url_blocklist_filter(pages, block).select("doc_id", "site")
    got = {(r["doc_id"], r["site"]) for r in kept.collect()}
    assert got == {(1, "good.example.com"), (4, "other.example.org")}


def test_scrub_plans_stay_native(spark):
    """No Python UDF (BatchEvalPython) in any scrub plan; the blocklist
    join broadcasts."""
    docs = _docs(spark, [(1, "a b c d e f g h i j")])
    plans = [
        scrub.pii_redact(docs)._jdf.queryExecution().executedPlan().toString(),
        scrub.fix_mojibake(docs)._jdf.queryExecution().executedPlan().toString(),
        scrub.decontaminate(docs, docs)._jdf.queryExecution()
        .executedPlan().toString(),
    ]
    for p in plans:
        assert "BatchEvalPython" not in p
    pages = docs.select(
        "doc_id",
        F.concat(F.lit("https://a"), F.col("doc_id").cast("string"),
                 F.lit(".example.com/p")).alias("url"),
    )
    bl = scrub.url_blocklist_filter(pages, scrub.blocklist_of(spark, ["x.y"]))
    bp = bl._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in bp and "LeftAnti" in bp


def test_pii_redact_idempotent_and_matches_re_oracle(spark):
    """Seeded 200-text grid: Spark counts match an independent Python `re`
    evaluation of the same patterns, and redaction is idempotent (the
    mask tokens never re-match any pattern)."""
    import random
    import re as _re

    rng = random.Random(42)
    frags = [
        lambda i: f"user{i}@mail{i % 7}.example.org",
        lambda i: "0" + str(1 + i % 9) + " 11 22 33 44",
        lambda i: f"+33 {1 + i % 9}2 33 44 55 66",
        lambda i: f"10.{i % 256}.0.{(i * 7) % 256}",
        lambda i: f"plain word{i} no pii",
        lambda i: f"edge{i}.dot. 300.300.300.300 0A 12",
    ]
    rows = []
    for i in range(200):
        parts = [frags[rng.randrange(len(frags))](i)
                 for _ in range(rng.randrange(1, 5))]
        rows.append((i, " ".join(parts)))
    df = _docs(spark, rows)
    out = {r["doc_id"]: r for r in scrub.pii_redact(df).collect()}
    for i, text in rows:
        for kind, pat, _ in scrub.PII_PATTERNS:
            assert out[i][f"n_{kind}s"] == len(_re.findall(pat, text)), (
                i, kind, text)
    again = spark.createDataFrame(
        [(i, out[i]["text_redacted"]) for i, _ in rows], ["doc_id", "text"])
    out2 = {r["doc_id"]: r for r in scrub.pii_redact(again).collect()}
    for i, _ in rows:
        assert out2[i]["text_redacted"] == out[i]["text_redacted"]
        assert (out2[i]["n_emails"], out2[i]["n_phones"],
                out2[i]["n_ips"]) == (0, 0, 0)


def test_mojibake_repair_idempotent(spark):
    texts = ["déjà vu « ok » 3°",
             "plain ascii stays put", "Ã©tÃ©"]
    df = _docs(spark, list(enumerate(texts)))
    once = {r["doc_id"]: r["text_fixed"]
            for r in scrub.fix_mojibake(df).collect()}
    twice_in = spark.createDataFrame(
        sorted(once.items()), ["doc_id", "text"])
    twice = {r["doc_id"]: r for r in scrub.fix_mojibake(twice_in).collect()}
    for k, v in once.items():
        assert twice[k]["text_fixed"] == v
        assert twice[k]["n_fixed"] == 0
