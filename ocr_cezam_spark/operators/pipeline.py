"""End-to-end C4-style corpus cleaning — the composition showpiece: the
individual operators (paragraph-level boilerplate dedup, exact document
dedup, token/Gopher quality gates) chained into ONE declarative plan that
Catalyst optimizes as a whole. No collects, no barriers: the paragraph
frequency aggregation, the digest keeper aggregation and the two quality
projections all pipeline; at 100 TB the only shuffles are the three key
aggregations/joins (paragraph digest, doc digest, doc id).

Order matters and mirrors production pipelines (C4, CCNet, RefinedWeb):
boilerplate is removed FIRST so document digests and quality stats are
computed over the cleaned text (two docs differing only in boilerplate
ARE duplicates; a page that is 90% boilerplate should be judged on its
10% content).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from .dedup import paragraph_dedup
from .textstats import gopher_quality, token_quality


def clean_corpus(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", max_freq: int = 5) -> DataFrame:
    """Boilerplate-paragraph dedup -> empty-doc drop -> exact document
    dedup on the CLEANED text (min-id keeper wins) -> token-quality and
    Gopher gates. Returns the surviving documents with their quality
    stats (doc id, n_tokens, stopword_ratio, avg_word_len, mean_word_len,
    alpha_word_frac)."""
    cleaned = paragraph_dedup(docs, id_col, text_col, max_freq)
    c = cleaned.filter(F.col("text_dedup") != "").select(
        F.col(id_col), F.col("text_dedup").alias(text_col)
    )
    keepers = (
        c.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(F.min(id_col).alias("keeper"))
    )
    reps = c.join(
        keepers.select(F.col("keeper").alias(id_col)), id_col, "left_semi"
    )
    # The quality gates tokenize on single spaces; the reassembled text
    # joins paragraphs with '\n', which would otherwise merge the words
    # around every boundary into one token (and count the newline as a
    # word character). Dedup keeps the '\n' form — layout is part of
    # content identity — only the stats input flattens separators.
    gated = reps.withColumn(text_col, F.translate(F.col(text_col), "\n", " "))
    tq = token_quality(gated, id_col, text_col).filter(
        F.col("quality_ok") == 1
    ).select(id_col, "n_tokens", "stopword_ratio", "avg_word_len")
    gq = gopher_quality(gated, id_col, text_col).filter(
        F.col("passes") == 1
    ).select(id_col, "mean_word_len", "alpha_word_frac")
    return tq.join(gq, id_col)
