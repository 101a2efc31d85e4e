"""Cross-document repetition removal — the C4-style curation pass that
deletes boilerplate repeated across a corpus (navigation chrome, license
headers, templated sentences) while keeping each document's unique prose.

Unit of repetition: non-overlapping W-token windows ("lines" for a corpus
whose documents carry no newlines). A window that occurs in >= min_docs
DISTINCT documents is boilerplate; every occurrence of it is removed and
each document's text is rebuilt from its surviving windows in order.

Scale design (100 TB):
  * windowing is the same narrow split+sequence+explode+slice plan as
    operators/chunking.py — no shuffle, windows stay on their scan split;
  * the document-frequency aggregate shuffles one xxhash64 PER DISTINCT
    (doc, window) pair — 8-byte keys, partial-aggregated map-side; the
    window *text* never shuffles;
  * the frequent-window set is the output of a `>= min_docs` filter over
    that aggregate. Its size is bounded by n_windows/min_docs — a bound
    that is only small when min_docs is meaningfully large (C4 removes
    lines occurring >= 3 times; at min_docs=2 the bound is HALF the
    corpus, billions of hashes on a web crawl). The removal join is
    therefore SIZE-GATED (round-3 verdict): the frequent set is counted
    (it is persisted — the count and the join share the aggregate), and
    only if it is under ``broadcast_max_rows`` does the LEFT ANTI join
    take a broadcast hint (corpus-side window stream never exchanged);
    above the gate it runs as a plain shuffle anti-join — AQE still
    converts it to a broadcast at runtime if the set turns out small,
    but an unbounded set can no longer OOM the driver via a forced hint;
  * the rebuild (round-9) never shuffles window text at all: only the
    BOILERPLATE occurrences (doc_id, widx — bounded by duplicated
    windows, tiny under the min_docs contract) group per document, and
    the per-doc bad-index array joins back onto the corpus row (AQE
    broadcast when small) where a hash-based array_except cuts the
    windows in place. The pre-r9 shape re-assembled documents with a
    groupBy over surviving window TEXT — a corpus-sized exchange for
    rows that already sat together on one partition.

Identity of a window is its xxhash64 on the Spark side (the SQL oracle
groups on the window text itself): distinct windows collide with
P ~ n^2/2^65, negligible at any corpus size this engine targets — same
equivalence argument as operators/dedup.py:_verify_jaccard.

The reference has no text operators (its string work is whitespace field
splitting, reference exercise_1.py:41); this is mandated extension surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window

from big_data_player_analysis_spark.caching import tracked_persist
from pyspark.sql import functions as F

REPEAT_WINDOW_TOKENS = 8  # tokens per window
# Windows in >= this many distinct docs are removed. 3 is the C4 default
# (Raffel et al. 2020 drop lines occurring >= 3 times in the corpus) AND the
# knob that keeps the frequent set broadcast-small: at min_docs=2 the
# frequent-set bound n_windows/min_docs is half the corpus.
REPEAT_MIN_DOCS = 3
# Broadcast the frequent-window set only below this row count: 4M int64
# hashes ~ 32 MB serialized — comfortably inside executor/driver budgets.
# Above it the anti-join falls back to a shuffle (AQE may still broadcast
# at runtime if the actual bytes are small).
REPEAT_BROADCAST_MAX_ROWS = 4_000_000


def _windows(df: DataFrame, id_col: str, text_col: str, w: int) -> DataFrame:
    """(doc_id, n_windows, widx, wtext): non-overlapping w-token windows.
    Empty/NULL text yields one empty window, so every document survives
    to the rebuild (curation filters, not this pass, decide to drop)."""
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    n = F.ceil(F.size(toks) / F.lit(float(w))).cast("long")
    exploded = df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_toks"),
        n.alias("n_windows"),
        F.explode(F.sequence(F.lit(0), n - 1)).alias("widx"),
    )
    return exploded.select(
        "doc_id",
        "n_windows",
        F.col("widx").cast("long").alias("widx"),
        F.array_join(
            F.slice(F.col("_toks"), F.col("widx") * w + 1, w), " "
        ).alias("wtext"),
    )


def remove_repeated_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window_tokens: int = REPEAT_WINDOW_TOKENS,
    min_docs: int = REPEAT_MIN_DOCS,
    broadcast_max_rows: int = REPEAT_BROADCAST_MAX_ROWS,
    scatter: bool = True,
) -> DataFrame:
    """(doc_id, clean_text, n_windows, n_removed): text rebuilt without
    windows that appear in >= min_docs distinct documents. A document all
    of whose windows are boilerplate comes back with clean_text = ''.

    The frequent-set anti-join is size-gated: the set is persisted and
    counted (one extra cheap job over the persisted aggregate — the join
    reuses the cache), and the broadcast hint is applied only under
    ``broadcast_max_rows``. min_docs=2 on a web corpus makes the set
    unbounded (round-3 verdict); pass broadcast_max_rows=0 to force the
    shuffle anti-join unconditionally.

    CALLER CONTRACT for ``scatter=False`` (round-9 ADVICE): the input is
    read by TWO subtrees (the window-hash stream and the rebuild side),
    and this function only persists the input when ITS OWN scatter
    exchange fired. With scatter=False — or when the heuristic sees an
    already-wide input and skips — the caller must hand in a persisted /
    checkpointed frame, or the input's entire upstream lineage executes
    twice. The in-repo composed caller (llm_curation_pipeline) lazily
    localCheckpoints its gated frame for exactly this reason; a raw
    file-backed scan is also fine (two scans of the same parquet, no
    recomputation)."""
    if window_tokens <= 0 or min_docs < 2:
        raise ValueError("need window_tokens > 0 and min_docs >= 2")
    # Persisted: the window table is read twice (frequent-set aggregate,
    # the boilerplate-occurrence probe), and without the persist each
    # read re-executed the tokenise/explode AND every upstream stage of
    # the input (in the curation pipeline that is the whole quality/
    # language gate). Round-9: the persisted stream is (doc_id, widx,
    # whash) ONLY — window TEXT no longer needs to survive the scan (see
    # the rebuild below), which shrinks the cached bytes to three int64s
    # per window.
    from big_data_player_analysis_spark.operators.dedup import _scatter

    # scatter=False for composed callers whose input is already spread
    # (the curation pipeline scatters its train side once up front — the
    # file-list heuristic cannot see that through the intervening
    # projections and would re-exchange the text)
    spread = _scatter(df) if scatter else df
    if spread is not df:
        # the scatter actually fired (compact input): persist it, because
        # TWO consumers read the text (the window-hash stream and the
        # rebuild side) and each would otherwise re-run the round-robin
        # exchange — measured at composed sf1 as a second 12 MB raw-text
        # shuffle, MORE than the rebuild rewrite saved. A 100 TB input
        # skips the scatter (and this persist) entirely; a compact input
        # is by definition the case where caching its text is cheap, and
        # the pre-r9 shape cached strictly more (the exploded window
        # table, text included).
        spread = tracked_persist(spread)
    wins = (
        _windows(spread, id_col, text_col, window_tokens)
        .select("doc_id", "widx", F.xxhash64("wtext").alias("whash"))
        .transform(tracked_persist)
    )
    frequent = (
        wins.select("doc_id", "whash")
        .distinct()
        .groupBy("whash")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= F.lit(min_docs))
        .select("whash")
        .transform(tracked_persist)
    )
    if broadcast_max_rows > 0 and frequent.count() <= broadcast_max_rows:
        frequent = F.broadcast(frequent)
    # ROUND-9 REBUILD (guide §2.3 "shuffle keys, not payloads"): the old
    # rebuild anti-joined the persisted window TEXT against the frequent
    # set and re-assembled documents with a groupBy(doc_id) collect_list —
    # shuffling every surviving window's text (~the whole corpus) just to
    # bring rows that ALREADY sat on one partition back together. Instead,
    # ship only the BOILERPLATE occurrences: semi-join the (doc_id, widx,
    # whash) stream against the frequent set and collect each document's
    # bad window indices (duplicated-occurrence-sized, tiny by the
    # min_docs contract), then join that array back onto the corpus row
    # (AQE broadcasts the bad side when small; a pathological bad set
    # degrades to the keyed shuffle join the old shape always paid) and
    # cut windows with a codegen'd index filter. Corpus text now moves
    # through ZERO exchanges beyond the optional scatter.
    bad = (
        wins.join(frequent, "whash", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_set("widx").alias("_bad"))
    )
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    n = F.ceil(F.size(toks) / F.lit(float(window_tokens))).cast("long")
    base = spread.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_toks"),
        n.alias("n_windows"),
    )
    # array_except is hash-set based (O(n + |bad|), order-preserving over
    # its first argument) — a per-element array_contains scan would be
    # O(n * |bad|) on a boilerplate-heavy document
    kept_idx = F.array_except(
        F.sequence(F.lit(0).cast("long"), F.col("n_windows") - 1),
        F.coalesce(F.col("_bad"), F.array().cast("array<long>")),
    )
    w = window_tokens
    return (
        base.join(bad, "doc_id", "left")
        .select(
            "doc_id",
            F.array_join(
                F.transform(
                    kept_idx,
                    lambda i: F.array_join(
                        F.slice(F.col("_toks"), i * w + 1, w), " "
                    ),
                ),
                " ",
            ).alias("clean_text"),
            "n_windows",
            (F.col("n_windows") - F.size(kept_idx).cast("long")).alias(
                "n_removed"
            ),
        )
    )


# ------------------------------------------------------------------ spans

SPAN_WINDOW_TOKENS = 10  # k for OVERLAPPING k-token windows
SPAN_MIN_COUNT = 2  # a window occurring >= this many times corpus-wide is dup


def _duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window_tokens: int,
    min_count: int,
    broadcast_max_rows: int,
):
    """Shared span builder for duplicate_span_profile (report) and
    remove_duplicate_spans (rewrite): returns (base, spans) where base is
    (doc_id, _text, n_tokens) and spans is the merged maximal duplicated
    intervals (doc_id, s, e) — the full scale design is documented on
    duplicate_span_profile, whose machinery this is."""
    _impl_doc = """Exact-substring duplication profile (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499): every
    OVERLAPPING ``window_tokens``-token window occurring >= ``min_count``
    times in the whole corpus (all occurrences counted, including repeats
    within one document) marks its token interval as duplicated; per
    document the intervals are merged into maximal spans.

    Returns (doc_id, n_tokens, n_dup_tokens, n_spans, dup_frac) — the
    profile a curation run thresholds on (and the exact span bounds a
    removal pass would cut; this entry reports rather than rewrites, the
    rewrite is ``remove_repeated_windows``'s job for the non-overlapping
    case).

    Scale design (100 TB):
      * window identity is a 64-bit ROLLING POLYNOMIAL over the canonical
        window text's bytes, computed for ALL positions of a document in
        ONE vectorized Arrow pandas_udf (prefix-sum closed form: with odd
        base B invertible mod 2^64, hash(span [a,b)) = B^(b-1) *
        (S[b-1] - S[a-1]) where S is the cumsum of byte[j] * B^(-j) —
        O(n) total per doc, not O(n*k), and zero per-window allocation).
        A first JVM form (xxhash64 over sliced token-hash arrays) was
        correct but interpreted expression trees (transform/slice are not
        codegen'd) allocated per window and went 12x super-linear at the
        16x probe; this is the same measured lesson as minhash_signatures
        (dedup.py:285). The narrow windowing stage emits only (doc_id,
        position, int64) triples. Lee et al. build a suffix array on one
        machine; the distributed trade is O(n) vectorized hash work per
        doc for O(1) shuffle bytes per window occurrence.
      * the occurrence-count aggregate shuffles one int64 per window
        position, partial-aggregated map-side; the duplicated-hash set is
        SIZE-GATED (same policy as remove_repeated_windows) before the
        semi join back onto the position stream.
      * interval merging is gaps-and-islands over (doc_id, position) — a
        shuffle proportional to DUPLICATED positions only, not the corpus.
    Hash collisions conflate distinct windows with P ~ n^2/2^65 (same
    equivalence argument as the module docstring); the SQL oracle groups
    window text itself.
    """
    del _impl_doc
    if window_tokens <= 1 or min_count < 2:
        raise ValueError("need window_tokens > 1 and min_count >= 2")
    from big_data_player_analysis_spark.operators.dedup import _scatter

    df = _scatter(df)  # the rolling-hash Arrow pass is CPU-bound per doc
    k = window_tokens
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        F.size(toks).cast("long").alias("n_tokens"),
    )

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _window_hashes(texts: pd.Series) -> pd.Series:
        import re as _re

        import numpy as np

        B = np.uint64(0x9E3779B97F4A7C15)  # odd -> invertible mod 2^64
        BINV = np.uint64(pow(int(B), -1, 1 << 64))
        # exact twin of the engine-side F.split(F.trim(text), r"\s+"):
        # trim strips SPACES only, and Java's \s is the ASCII class —
        # str.split() would also cut on Unicode whitespace (NBSP etc.),
        # desynchronizing window positions from n_tokens
        _ws = _re.compile(r"\s+", _re.ASCII)
        out = []
        for s in texts:
            tk = _ws.split((s or "").strip(" "))
            if len(tk) < k:
                out.append([])
                continue
            raw = np.frombuffer(" ".join(tk).encode("utf-8"), dtype=np.uint8)
            raw64 = raw.astype(np.uint64)
            m = raw64.size
            # wrapping power tables [1, B, ..., B^(m-1)] (uint64 cumprod
            # overflow wraps silently — that IS the mod-2^64 arithmetic)
            binv_pow = np.concatenate(
                ([np.uint64(1)], np.cumprod(np.full(m - 1, BINV, dtype=np.uint64)))
            )
            b_pow = np.concatenate(
                ([np.uint64(1)], np.cumprod(np.full(m - 1, B, dtype=np.uint64)))
            )
            S = np.cumsum(raw64 * binv_pow, dtype=np.uint64)
            sp = np.where(raw == 32)[0]
            starts = np.concatenate(([0], sp + 1))  # byte start of token i
            ends = np.concatenate((sp, [m]))  # byte end (excl) of token i
            a = starts[: len(tk) - k + 1]
            b = ends[k - 1 :]
            s_hi = S[b - 1]
            s_lo = np.where(a > 0, S[np.maximum(a, 1) - 1], np.uint64(0))
            out.append((b_pow[b - 1] * (s_hi - s_lo)).astype(np.int64))
        return pd.Series(out)

    # asNondeterministic (guide §4.4): InferFiltersFromGenerate derives a
    # `size(_wh) > 0 AND isnotnull(_wh)` predicate from the posexplode and
    # pushes it below the scatter exchange — duplicating the WHOLE rolling-
    # hash UDF (one ArrowEvalPython below the exchange feeding only the
    # filter, a second above it recomputing the arrays; verified in
    # plans/r09/llm_substring_dup_spans_before.txt nodes 6/11). The hash is
    # genuinely deterministic; the mark only forbids the optimizer from
    # cloning it.
    _hashes = _window_hashes.asNondeterministic()

    # Persisted: the position stream is consumed by TWO subtrees (the
    # dup-set aggregate and the semi-join probe), and without the persist
    # each re-ran the CPU-bound Arrow hash pass over the whole corpus —
    # the same double-scan remove_repeated_windows' persist already
    # prevents for its window table. Rows are narrow (doc_id, p, whash)
    # int64 triples, O(token positions).
    wins = (
        base.filter(F.col("n_tokens") >= k)
        .select("doc_id", _hashes("_text").alias("_wh"))
        .select(
            "doc_id",
            F.posexplode("_wh").alias("p", "whash"),
        )
        .select("doc_id", F.col("p").cast("long").alias("p"), "whash")
        .transform(tracked_persist)
    )
    dup = (
        wins.groupBy("whash")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= F.lit(min_count))
        .select("whash")
        .transform(tracked_persist)
    )
    if broadcast_max_rows > 0 and dup.count() <= broadcast_max_rows:
        dup = F.broadcast(dup)
    pos = wins.join(dup, "whash", "left_semi").select(
        "doc_id", "p", (F.col("p") + k).alias("e")
    )
    prev = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cur = Window.partitionBy("doc_id").orderBy("p")
    islands = pos.withColumn(
        "isl",
        F.sum(
            F.when(
                F.col("p") > F.coalesce(F.max("e").over(prev), F.lit(-1)), 1
            ).otherwise(0)
        ).over(cur),
    )
    spans = islands.groupBy("doc_id", "isl").agg(
        F.min("p").alias("s"), F.max("e").alias("e")
    ).select("doc_id", "s", "e")
    return base, spans


def duplicate_span_profile(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window_tokens: int = SPAN_WINDOW_TOKENS,
    min_count: int = SPAN_MIN_COUNT,
    broadcast_max_rows: int = REPEAT_BROADCAST_MAX_ROWS,
) -> DataFrame:
    """Exact-substring duplication PROFILE (Lee et al. 2021 EXACTSUBSTR):
    (doc_id, n_tokens, n_dup_tokens, n_spans, dup_frac) — the report a
    curation run thresholds on. Span machinery and the full 100 TB design
    notes live in _duplicate_spans; remove_duplicate_spans below is the
    rewrite pass over the same spans."""
    base, spans = _duplicate_spans(
        df, id_col, text_col, window_tokens, min_count, broadcast_max_rows
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.sum(F.col("e") - F.col("s")).alias("n_dup_tokens"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    return base.select("doc_id", "n_tokens").join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_dup_tokens", F.lit(0)).cast("long").alias("n_dup_tokens"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        (
            F.coalesce("n_dup_tokens", F.lit(0)).cast("double")
            / F.col("n_tokens")
        ).alias("dup_frac"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window_tokens: int = SPAN_WINDOW_TOKENS,
    min_count: int = SPAN_MIN_COUNT,
    broadcast_max_rows: int = REPEAT_BROADCAST_MAX_ROWS,
) -> DataFrame:
    """Exact-substring duplication REMOVAL — the rewrite half of Lee et
    al. 2021's EXACTSUBSTR pipeline: every token inside a merged
    duplicated span is cut and the text rebuilt from the surviving tokens
    in order (single-space rejoin, the same canonical-whitespace contract
    as remove_repeated_windows' rebuild). Documents shorter than the
    window or with no duplicated span come back unchanged (modulo the
    whitespace canonicalization).

    Returns (doc_id, clean_text, n_tokens, n_removed_tokens).

    Scale shape: _duplicate_spans' machinery (one narrow Arrow
    rolling-hash pass, size-gated dup-set semi join, gaps-and-islands
    merge over DUPLICATED positions only) plus ONE keyed join of the
    per-doc span arrays back onto the corpus — span arrays are
    duplicated-region-sized, and the token cut is a codegen'd
    higher-order filter (index lambda + exists over the span structs), no
    Python in the rewrite path."""
    base, spans = _duplicate_spans(
        df, id_col, text_col, window_tokens, min_count, broadcast_max_rows
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("s", "e"))).alias("_spans")
    )
    toks = F.split(F.trim(F.coalesce(F.col("_text"), F.lit(""))), r"\s+")
    joined = base.join(per_doc, "doc_id", "left").select(
        "doc_id", "n_tokens", toks.alias("_toks"), "_spans"
    )
    kept = F.filter(
        F.col("_toks"),
        lambda t, i: ~F.exists(
            F.col("_spans"), lambda sp: (i >= sp["s"]) & (i < sp["e"])
        ),
    )
    return joined.select(
        "doc_id",
        F.when(F.col("_spans").isNull(), F.array_join(F.col("_toks"), " "))
        .otherwise(F.array_join(kept, " "))
        .alias("clean_text"),
        "n_tokens",
        F.when(F.col("_spans").isNull(), F.lit(0).cast("long"))
        .otherwise(F.col("n_tokens") - F.size(kept).cast("long"))
        .alias("n_removed_tokens"),
    )


# ------------------------------------------------------- within-doc profile

# The Gopher within-document repetition signals (Rae et al. 2021,
# "Scaling Language Models: ... Gopher", arXiv:2112.11446 §A1.1): a
# document dominated by one repeated 3/4-gram, or whose higher-order
# n-grams are mostly duplicates, is boilerplate/template spam that the
# shape bounds and unigram/bigram shares (functions/text.py
# QUALITY_FILTER_RULES) cannot see. Defaults follow the paper's table:
# top-n-gram share for the low orders, duplicated-n-gram fraction for a
# higher order. Fractions are over GRAM POSITIONS (count/positions, the
# same denominator as _top_share) rather than Gopher's character
# fraction — position fraction is tokenizer-stable and oracle-exact,
# and orders documents identically for run-dominated repetition.
REPETITION_TOP_NS = (3, 4)
REPETITION_DUP_N = 6


def repetition_profile(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_ns: tuple[int, ...] = REPETITION_TOP_NS,
    dup_n: int = REPETITION_DUP_N,
) -> DataFrame:
    """(doc_id, n_tokens, top{n}_share ..., dup{dup_n}_frac): within-doc
    repetition profile over normalized word n-grams. top{n}_share is the
    share of n-gram positions taken by the document's most frequent
    n-gram; dup{dup_n}_frac the share of dup_n-gram positions whose gram
    occurs more than once in the document. 0.0 when the document has
    fewer than n tokens.

    Scale shape (round-9 optimization): the profile is a pure PER-DOCUMENT
    function, so it is computed with ZERO exchanges — one narrow scan
    projection per row, no explode-to-rows, no groupBy, no join-back. Per
    order n the gram xxhash64 array is sorted (array_sort, O(m log m)
    JVM) and run-lengths over the sorted array give every count the old
    grouped form aggregated: mx = longest run, dup positions = total minus
    singleton runs. The first form (explode (doc, n, gh) triples -> two
    hash aggregates -> join back onto the corpus) moved O(tokens) rows
    through THREE exchanges plus a join exchange to compute a quantity
    that never leaves its document — at 100 TB that is the whole corpus'
    token stream shuffled three times for nothing (guide §2.4); measured
    at sf0.1 it was also 6x slower (3.7 s -> 0.6 s, plans/r09). Per-task
    memory is bounded by the document's own gram count — the same bound
    the explode form's scan already carried.

    Gram identity is multi-argument xxhash64 over the n tokens (tokens are
    whitespace-split, so the tuple identity equals the space-joined text
    identity): distinct grams collide with P ~ n^2/2^65 (the module
    equivalence argument); the SQL oracle groups gram text itself.
    Fractions are ratios of small integers (IEEE-exact in any engine),
    portable-rounded like quality_score."""
    from big_data_player_analysis_spark.functions.text import ws_tokens_norm

    ns = sorted({*top_ns, dup_n})

    def _bind(col: F.Column, f) -> F.Column:
        # let-bind (char_shingles' trick): evaluate `col` once and pass it
        # as a lambda variable — ProjectCollapsing would otherwise inline
        # an alias into every use site and re-evaluate it
        return F.transform(F.array(col), f)[0]

    def _gram_hashes(toks: F.Column, n: int) -> F.Column:
        # multi-argument xxhash64 over the n tokens directly: no per-gram
        # concat_ws string allocation (measured ~30% of the gram+sort cost
        # at sf0.1); tokens are whitespace-split so the n-tuple identity
        # equals the joined-text identity the SQL oracle groups on
        def at(i: F.Column) -> F.Column:
            return F.xxhash64(*[F.element_at(toks, i + j) for j in range(n)])

        return F.transform(F.sequence(F.lit(1), F.size(toks) - n + 1), at)

    def _run_stats(ghs: F.Column) -> F.Column:
        """struct(mx, dup, tot) from one sorted run-length scan: sort the
        gram hashes, mark run starts (first position or value change),
        run length = gap to the next start."""

        def with_sorted(srt: F.Column) -> F.Column:
            tot = F.size(srt)
            starts = F.filter(
                F.sequence(F.lit(1), tot),
                # STRUCTURAL guard (round-9 ADVICE): CaseWhen only
                # evaluates the otherwise-branch when i > 1, so the
                # element_at(srt, i - 1) index is always >= 1 — the
                # previous Or form relied on undocumented short-circuit
                # order to dodge try_element_at's INVALID_INDEX_OF_ZERO
                lambda i: F.when(i == F.lit(1), F.lit(True)).otherwise(
                    F.element_at(srt, i) != F.element_at(srt, i - 1)
                ),
            )

            def with_starts(st: F.Column) -> F.Column:
                lens = F.zip_with(
                    st,
                    F.concat(
                        F.slice(st, 2, F.size(st) - 1), F.array(tot + 1)
                    ),
                    lambda s, e: e - s,
                )

                def with_lens(ln: F.Column) -> F.Column:
                    return F.struct(
                        F.array_max(ln).alias("mx"),
                        (
                            tot
                            - F.size(F.filter(ln, lambda l: l == F.lit(1)))
                        ).alias("dup"),
                        tot.alias("tot"),
                    )

                return _bind(lens, with_lens)

            return _bind(starts, with_starts)

        return _bind(F.array_sort(ghs), with_sorted)

    def _profile(toks: F.Column) -> F.Column:
        fields = [F.size(toks).cast("long").alias("n_tokens")]
        for n in ns:
            fields.append(
                F.when(
                    F.size(toks) >= n, _run_stats(_gram_hashes(toks, n))
                ).alias(f"s{n}")
            )
        return F.struct(*fields)

    def _p6(x: F.Column) -> F.Column:  # portable round (quality_score)
        return F.floor(x * 1e6 + F.lit(0.5)) / 1e6

    # explode(array(struct)): the Generate node is a projection barrier, so
    # the profile struct is computed ONCE per row — extracting fields from
    # a plain struct column would re-inline the whole expression per field
    prof = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array(_bind(ws_tokens_norm(F.col(text_col)), _profile))
        ).alias("_p"),
    )
    sel = [F.col("doc_id"), F.col("_p.n_tokens").alias("n_tokens")]
    for n in top_ns:
        sel.append(
            F.coalesce(
                _p6(F.col(f"_p.s{n}.mx") / F.col(f"_p.s{n}.tot").cast("double")),
                F.lit(0.0),
            ).alias(f"top{n}_share")
        )
    sel.append(
        F.coalesce(
            _p6(
                F.col(f"_p.s{dup_n}.dup")
                / F.col(f"_p.s{dup_n}.tot").cast("double")
            ),
            F.lit(0.0),
        ).alias(f"dup{dup_n}_frac")
    )
    return prof.select(*sel)
