"""Corpus language-model scoring operators: statistical stand-ins for
perplexity-based quality filtering (CCNet-style) that need no trained
model — the corpus scores itself.

Scale design: token/bigram instances are never re-shuffled as instances.
Per-doc term counts partial-agg map-side; the corpus model tables
(bigram counts, context marginals) re-aggregate those COUNTS on their
own keys; scalar corpus totals ride along as 1-row broadcasts. Model
tables exceed broadcast size at 100 TB, so the tf-model joins are left
to AQE (same contract as llm_tfidf_top_terms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _token_arrays(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, ts): the lowercase a-z token array per document — the shared
    tokenization convention of the unigram/tf-idf entries."""
    return docs.select(
        id_col,
        F.filter(
            F.split(
                F.trim(F.regexp_replace(F.lower(text_col), "[^a-z]", " ")),
                " +",
            ),
            lambda x: F.length(x) >= 1,
        ).alias("ts"),
    )


def bigram_surprisal(
    docs: DataFrame, id_col: str, text_col: str, k: float = 0.5
) -> DataFrame:
    """Per-document mean -ln p(w2|w1) under the corpus's own bigram
    distribution with add-k smoothing (V = distinct context words): the
    conditional upgrade of unigram surprisal — low = fluent word order,
    high = shuffled/noisy text that unigram statistics cannot
    distinguish.

    Adjacent pairs come from zipping each token array with its own tail
    (``arrays_zip`` over two slices) — a NARROW per-row fan-out; no
    window/shuffle is needed to line up neighbours.

    Returns ``(id_col, n_bigrams, avg_bigram_surprisal)``; documents
    with fewer than two tokens have no bigrams and are absent.
    """
    toks = _token_arrays(docs, id_col, text_col).filter(F.size("ts") >= 2)
    pairs = toks.select(
        id_col,
        F.explode(
            F.arrays_zip(
                F.slice("ts", 1, F.size("ts") - 1).alias("w1"),
                F.slice("ts", 2, F.size("ts") - 1).alias("w2"),
            )
        ).alias("pr"),
    ).select(id_col, F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2"))
    tf = pairs.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    bg = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("cbg"))
    ctx = bg.groupBy("w1").agg(F.sum("cbg").alias("cw1"))
    vocab = ctx.agg(F.count(F.lit(1)).alias("v"))
    kl = F.lit(float(k))
    # fold the context marginal into the MODEL-sized bg table first, so
    # the large per-doc tf table exchanges once (on (w1, w2)) instead of
    # twice — joining ctx onto tf directly would re-shuffle every tf row
    # a second time on w1
    model = bg.join(ctx, "w1")
    p = (F.col("cbg") + kl) / (F.col("cw1") + kl * F.col("v"))
    return (
        tf.join(model, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.round(-F.sum(F.col("tf") * F.log(p)) / F.sum("tf"), 6).alias(
                "avg_bigram_surprisal"
            ),
        )
    )
