"""Round-10 optimization internals: the byte-level normalizer, the
Mersenne mod fold, the rolling-hash shingle pass, and the cdc md5 move
must be EXACT twins of the JVM expressions they replaced — these tests
pin each equivalence on adversarial inputs (the oracle gates then cover
the composed operators end-to-end)."""

from __future__ import annotations

from pyspark.sql import functions as F

# inputs chosen to stress every normalization edge: runs of spaces, tabs /
# newlines (deleted, NOT treated as spaces), leading/trailing space runs,
# punctuation, digits, unicode (multi-byte chars must vanish), empty, and
# an all-junk string that normalizes to ''
NORM_CASES = [
    "The  quick   brown fox!",
    "  leading and trailing   ",
    "tabs\tand\nnewlines\r\nhere",
    "digits 123 mixed 4a5b",
    "punctuation, only: ;#$%^&*()",
    "unicode éü中文 between words",
    "ÉMIXED Case Ümläut",
    "",
    "!!!???...",
    " ",
    "a",
    "word",
]


def test_np_norm_bytes_twins_normalize_text(spark):
    from big_data_player_analysis_spark.functions.text import normalize_text
    from big_data_player_analysis_spark.operators.dedup import _np_norm_bytes

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(NORM_CASES)], "i long, t string"
    )
    jvm = {
        r.i: r.n
        for r in df.select("i", normalize_text(F.col("t")).alias("n")).collect()
    }
    for i, s in enumerate(NORM_CASES):
        py = _np_norm_bytes(s.lower()).tobytes().decode("utf-8")
        assert py == jvm[i], (s, py, jvm[i])


def test_np_norm_bytes_null_is_empty():
    from big_data_player_analysis_spark.operators.dedup import _np_norm_bytes

    assert _np_norm_bytes(None).size == 0


def test_mersenne_mod_exact():
    import numpy as np

    from big_data_player_analysis_spark.operators.dedup import (
        MINHASH_PRIME,
        _np_mod_mersenne31,
    )

    rng = np.random.default_rng(20260818)
    x = rng.integers(0, 1 << 62, size=100_000, dtype=np.int64)
    # boundary values: 0, p-1, p, p+1, 2^31, 2^62-1, multiples of p
    edges = np.array(
        [0, MINHASH_PRIME - 1, MINHASH_PRIME, MINHASH_PRIME + 1, 1 << 31,
         (1 << 62) - 1, 7 * MINHASH_PRIME, MINHASH_PRIME * MINHASH_PRIME],
        dtype=np.int64,
    )
    for arr in (x, edges):
        assert (_np_mod_mersenne31(arr) == arr % MINHASH_PRIME).all()


def test_minhash_signature_values_unchanged_by_rewrite(spark):
    """The r10 signature pipeline (byte norm + unique + Mersenne folds)
    must produce bit-identical signatures to the straightforward r9 math
    ((a*h+b) % p over ALL positions of the JVM-normalized text)."""
    import numpy as np

    from big_data_player_analysis_spark.functions.text import normalize_text
    from big_data_player_analysis_spark.operators.dedup import (
        MINHASH_A,
        MINHASH_B,
        MINHASH_PRIME,
        MINHASH_SHINGLE_BASE,
        _lowered,
        minhash_signatures,
    )

    k = 8
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again  and AGAIN!",
        "completely different content with other words entirely here",
        "short",  # < k after normalization -> excluded
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc: list(r.sig)
        for r in minhash_signatures(_lowered(df, "doc_id", "text"), k).collect()
    }
    norms = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", normalize_text(F.col("text")).alias("n")
        ).collect()
    }
    A = np.asarray(MINHASH_A, dtype=np.int64)[:, None]
    B = np.asarray(MINHASH_B, dtype=np.int64)[:, None]
    powers = MINHASH_SHINGLE_BASE ** np.arange(k, dtype=np.int64)
    for i, t in enumerate(texts):
        raw = np.frombuffer(norms[i].encode("utf-8"), dtype=np.uint8)
        if raw.size < k:
            assert i not in got
            continue
        win = np.lib.stride_tricks.sliding_window_view(raw, k).astype(np.int64)
        h = (win @ powers) % MINHASH_PRIME
        ref = ((A * h[None, :] + B) % MINHASH_PRIME).min(axis=1)
        assert got[i] == list(ref), i
    # normalization-equivalent docs sign identically
    assert got[0] == got[1]


def test_shingle_hash_udf_distinct_counts_match_char_shingles(spark):
    """n = size(h) must equal the char_shingles distinct-shingle count —
    the jaccard denominator the oracle computes over shingle TEXT."""
    from big_data_player_analysis_spark.functions.text import char_shingles
    from big_data_player_analysis_spark.operators.dedup import _shingle_hash_udf

    texts = NORM_CASES + [
        "aaaaaaaaaaaaaaaaaaaa",  # heavy within-doc duplication
        "the cat sat on the mat the cat sat on the mat",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "i long, t string"
    )
    for k in (3, 8, 32):
        rows = df.select(
            "i",
            F.size(char_shingles(F.col("t"), k)).alias("n_ref"),
            F.size(_shingle_hash_udf(k)(F.lower(F.col("t")))).alias("n_new"),
        ).collect()
        for r in rows:
            assert r.n_new == max(r.n_ref, 0), (r.i, k, r.n_ref, r.n_new)


def test_bpe_token_ids_zero_exchange_beyond_scatter(spark):
    """The r10 per-document encode must stay narrow: the only allowed
    exchange is the optional round-robin scatter — the former
    explode + vocab join + per-doc regroup shape exchanged the whole
    tokenized corpus (105.6 MB sf1 shuffle-write, SHUFFLE.md)."""
    import io
    import re
    from contextlib import redirect_stdout

    from big_data_player_analysis_spark.plans.bpe import bpe_token_ids

    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "a dog ran far"), (3, "")],
        "doc_id long, text string",
    )
    out = bpe_token_ids(df, "doc_id", "text", [("t", "h"), ("th", "e")])
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    nodes = set(re.findall(r"\(\d+\) Exchange", p))
    assert len(nodes) <= 1, f"bpe encode grew exchanges: {nodes}"
    if nodes:
        assert "RoundRobinPartitioning" in p  # only the scatter
    rows = {r.doc_id: (list(r.token_ids), r.n_words, r.n_tokens)
            for r in out.collect()}
    assert set(rows) == {1, 2}  # zero-word doc 3 absent, like the old shape
    assert rows[1][1] == 3 and rows[1][2] == len(rows[1][0])


def test_cdc_chunk_md5_matches_jvm_md5(spark):
    """cdc_chunks' Python-side hashlib md5 must equal the JVM
    md5(substr(normalize_text(text), start, len)) it replaced, chunk for
    chunk."""
    from big_data_player_analysis_spark.functions.text import normalize_text
    from big_data_player_analysis_spark.operators.chunking import cdc_chunks

    texts = NORM_CASES + [
        "the quick brown fox jumps over the lazy dog " * 8,
        "abc123 " * 40,
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )
    chunks = cdc_chunks(df, "doc_id", "text")
    normed = df.select(
        "doc_id", normalize_text(F.coalesce(F.col("text"), F.lit(""))).alias("norm")
    )
    joined = chunks.join(normed, "doc_id").withColumn(
        "jvm_md5",
        F.expr("md5(substr(norm, CAST(start AS INT), CAST(chunk_len AS INT)))"),
    )
    bad = joined.filter(F.col("chunk_md5") != F.col("jvm_md5")).count()
    assert bad == 0
    assert chunks.count() > len(texts)  # multi-chunk docs actually split
