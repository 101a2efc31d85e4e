"""Round-3 curation-tier operators: cross-document repetition removal,
deterministic sharding, source mixing weights, embedding dimension stats —
each checked against hand-computed expectations on tiny inline frames plus
invariants on the driver's synthetic tables."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_player_analysis_spark.catalog import load_table
from big_data_player_analysis_spark.operators.repetition import (
    duplicate_span_profile,
    remove_repeated_windows,
)
from big_data_player_analysis_spark.operators.sampling import (
    apply_mix,
    hex_bucket,
    shard_assign,
    source_mix_weights,
)
from big_data_player_analysis_spark.operators.similarity import embedding_dim_stats


class TestRemoveRepeatedWindows:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_boilerplate_removed_everywhere_unique_kept(self, spark):
        boiler = "a b c d"  # window_tokens=4 -> exactly one window
        rows = [
            (1, f"{boiler} u1 u2 u3 u4"),
            (2, f"{boiler} v1 v2 v3 v4"),
            (3, "w1 w2 w3 w4"),
        ]
        out = {
            r.doc_id: r
            for r in remove_repeated_windows(
                self._df(spark, rows), "doc_id", "text", window_tokens=4, min_docs=2
            ).collect()
        }
        assert out[1].clean_text == "u1 u2 u3 u4"
        assert out[2].clean_text == "v1 v2 v3 v4"
        assert out[3].clean_text == "w1 w2 w3 w4"
        assert out[1].n_windows == 2 and out[1].n_removed == 1
        assert out[3].n_removed == 0

    def test_within_doc_repeat_not_removed(self, spark):
        # the same window twice in ONE doc is not cross-doc boilerplate
        rows = [(1, "a b a b"), (2, "c d c d")]
        out = {
            r.doc_id: r
            for r in remove_repeated_windows(
                self._df(spark, rows), "doc_id", "text", window_tokens=2, min_docs=2
            ).collect()
        }
        assert out[1].clean_text == "a b a b" and out[1].n_removed == 0

    def test_fully_boilerplate_doc_survives_empty(self, spark):
        rows = [(1, "a b"), (2, "a b"), (3, "x y")]
        out = {
            r.doc_id: r
            for r in remove_repeated_windows(
                self._df(spark, rows), "doc_id", "text", window_tokens=2, min_docs=2
            ).collect()
        }
        assert out[1].clean_text == "" and out[1].n_removed == 1
        assert out[2].clean_text == ""
        assert out[3].clean_text == "x y"

    def test_null_and_empty_text_preserved(self, spark):
        rows = [(1, None), (2, ""), (3, "x y")]
        out = remove_repeated_windows(
            self._df(spark, rows), "doc_id", "text", window_tokens=2, min_docs=2
        )
        got = {r.doc_id: r for r in out.collect()}
        assert set(got) == {1, 2, 3}
        # NULL and '' both tokenize to [''] -> the same empty window in 2
        # docs -> removed as boilerplate; the docs themselves survive
        assert got[1].clean_text == "" and got[2].clean_text == ""
        assert got[3].clean_text == "x y"

    def test_window_order_preserved(self, spark):
        # surviving windows must reassemble in original order
        rows = [(1, "k1 k2 b1 b2 k3 k4"), (2, "b1 b2 z1 z2")]
        out = {
            r.doc_id: r.clean_text
            for r in remove_repeated_windows(
                self._df(spark, rows), "doc_id", "text", window_tokens=2, min_docs=2
            ).collect()
        }
        assert out[1] == "k1 k2 k3 k4"

    def test_frequent_join_is_broadcast_semi(self, spark):
        # round-9 rebuild: the frequent probe is a broadcast LEFT SEMI
        # onto the narrow (doc_id, widx, whash) stream; window text never
        # joins or shuffles (the old broadcast LeftAnti regrouped text)
        df = self._df(spark, [(1, "a b"), (2, "a b")])
        out = remove_repeated_windows(df, "doc_id", "text", window_tokens=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan

    def test_sf_corpus_removal_monotone(self, spark, sf_small):
        docs = load_table(spark, sf_small, "documents")
        out = remove_repeated_windows(docs, "doc_id", "text")
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_removed").alias("removed"),
            F.sum((F.col("n_removed") > F.col("n_windows")).cast("int")).alias("bad"),
        ).first()
        assert agg.n == docs.count()  # every document survives
        assert agg.bad == 0


class TestDuplicateSpanProfile:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    @staticmethod
    def _profile(rows, k=3, min_count=2):
        """Brute-force reference: mark every overlapping k-window occurring
        >= min_count times corpus-wide, merge intervals per doc."""
        toks = {d: t.split() for d, t in rows}
        from collections import Counter

        c = Counter(
            tuple(ts[p : p + k])
            for ts in toks.values()
            for p in range(len(ts) - k + 1)
        )
        out = {}
        for d, ts in toks.items():
            ivs = [
                (p, p + k)
                for p in range(len(ts) - k + 1)
                if c[tuple(ts[p : p + k])] >= min_count
            ]
            spans = []
            for s, e in ivs:
                if spans and s <= spans[-1][1]:
                    spans[-1][1] = max(spans[-1][1], e)
                else:
                    spans.append([s, e])
            out[d] = (len(ts), sum(e - s for s, e in spans), len(spans))
        return out

    def test_off_grid_alignment_found(self, spark):
        # the shared trigram sits at positions 1 and 4 — different
        # alignments, invisible to a non-overlapping window grid
        rows = [(1, "u1 a b c u2 u3 u4"), (2, "v1 v2 v3 v4 a b c v5")]
        got = {
            r.doc_id: (r.n_tokens, r.n_dup_tokens, r.n_spans)
            for r in duplicate_span_profile(
                self._df(spark, rows), "doc_id", "text", window_tokens=3
            ).collect()
        }
        assert got == self._profile(rows)

    def test_within_doc_repeat_counts(self, spark):
        # Lee et al. count ALL occurrences: a doc repeating its own
        # substring is duplicated even if no other doc shares it
        rows = [(1, "x y z q1 q2 x y z"), (2, "r1 r2 r3 r4 r5")]
        got = {
            r.doc_id: (r.n_tokens, r.n_dup_tokens, r.n_spans)
            for r in duplicate_span_profile(
                self._df(spark, rows), "doc_id", "text", window_tokens=3
            ).collect()
        }
        assert got == self._profile(rows)
        assert got[1][1] == 6 and got[1][2] == 2  # two disjoint 3-token spans
        assert got[2] == (5, 0, 0)

    def test_overlapping_windows_merge_to_one_span(self, spark):
        # a 5-token shared run yields 3 overlapping dup trigrams -> 1 span
        rows = [(1, "p q r s t u1"), (2, "v1 p q r s t")]
        got = {
            r.doc_id: (r.n_dup_tokens, r.n_spans)
            for r in duplicate_span_profile(
                self._df(spark, rows), "doc_id", "text", window_tokens=3
            ).collect()
        }
        assert got == {1: (5, 1), 2: (5, 1)}

    def test_short_and_null_docs_profiled_zero(self, spark):
        rows = [(1, "a b"), (2, None), (3, "a b c d")]
        got = {
            r.doc_id: (r.n_tokens, r.n_dup_tokens, r.n_spans, r.dup_frac)
            for r in duplicate_span_profile(
                self._df(spark, rows), "doc_id", "text", window_tokens=3
            ).collect()
        }
        assert got[1] == (2, 0, 0, 0.0)
        assert got[2] == (1, 0, 0, 0.0)  # NULL -> [''] like the line dedup
        assert got[3] == (4, 0, 0, 0.0)

    def test_random_corpus_matches_bruteforce(self, spark):
        import random

        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(12)]
        rows = [
            (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40))))
            for d in range(60)
        ]
        got = {
            r.doc_id: (r.n_tokens, r.n_dup_tokens, r.n_spans)
            for r in duplicate_span_profile(
                self._df(spark, rows), "doc_id", "text", window_tokens=4
            ).collect()
        }
        assert got == self._profile(rows, k=4)

    def test_dup_set_join_size_gated(self, spark):
        df = self._df(spark, [(1, "a b c d"), (2, "a b c d")])
        plan = (
            duplicate_span_profile(df, "doc_id", "text", window_tokens=2)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
        plan_gated = (
            duplicate_span_profile(
                df, "doc_id", "text", window_tokens=2, broadcast_max_rows=0
            )
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "LeftSemi" in plan_gated


class TestShardAssign:
    def test_matches_python_md5(self, spark):
        df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
        got = {r.doc_id: (r.shard, r.pos) for r in shard_assign(df, "doc_id", 8).collect()}
        # independent python recomputation
        items = []
        for i in range(200):
            h = hashlib.md5(str(i).encode()).hexdigest()
            items.append((int(h[:4], 16) % 8, h, i))
        expect_shard = {i: s for s, _, i in items}
        pos = {}
        for s in range(8):
            members = sorted((h, i) for s2, h, i in items if s2 == s)
            for p, (_, i) in enumerate(members):
                pos[i] = p
        for i in range(200):
            assert got[i] == (expect_shard[i], pos[i]), i

    def test_stable_under_repartition(self, spark):
        df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
        a = shard_assign(df, "doc_id", 16).select("doc_id", "shard", "pos")
        b = shard_assign(df.repartition(13), "doc_id", 16).select(
            "doc_id", "shard", "pos"
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_pos_dense_per_shard(self, spark):
        df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
        out = shard_assign(df, "doc_id", 4)
        per = (
            out.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"),
                 F.min("pos").alias("mn"), F.countDistinct("pos").alias("nd"))
            .collect()
        )
        assert {r.shard for r in per} <= set(range(4))
        for r in per:
            assert r.mn == 0 and r.mx == r.n - 1 and r.nd == r.n

    def test_roughly_balanced(self, spark):
        df = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
        counts = [r.n for r in shard_assign(df, "doc_id", 8)
                  .groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()]
        assert len(counts) == 8
        assert max(counts) < 2 * min(counts)

    def test_bucketed_pos_matches_direct_at_every_bucket_count(self, spark):
        """The round-9 bucket-offset rewrite (round-8 verdict ask #5): pos
        must be row-identical to the single-bucket per-shard window at
        every forced bucket count, including more buckets than rows."""
        df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
        direct = sorted(
            map(tuple, shard_assign(df, "doc_id", 4, n_buckets=1).collect())
        )
        for nb in (None, 2, 7, 64, 1024):
            got = sorted(
                map(tuple, shard_assign(df, "doc_id", 4, n_buckets=nb).collect())
            )
            assert got == direct, nb

    def test_bucketed_pos_is_shard_parallel(self, spark):
        """With buckets forced, the row_number window must partition on
        (shard, _bkt) — more than n_shards-way parallel — and the offsets
        join must be broadcast."""
        df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
        plan = (
            shard_assign(df, "doc_id", 4, n_buckets=8)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert re.search(r"row_number\(\)[^\n]*windowspecdefinition\(shard#\d+L, _bkt#\d+", plan)
        assert "BroadcastHashJoin" in plan

    def test_hex_bucket_range_and_validation(self, spark):
        df = spark.range(0, 100).select(hex_bucket(F.col("id")).alias("b"))
        r = df.agg(F.min("b"), F.max("b")).first()
        assert 0 <= r[0] and r[1] < 65536
        with pytest.raises(ValueError):
            shard_assign(spark.range(1).withColumnRenamed("id", "k"), "k", 0)


class TestSourceMixWeights:
    def test_uniform_target_hand_computed(self, spark):
        rows = [
            (1, "a b c d", "web"),   # 4 tokens
            (2, "e f", "web"),       # 2
            (3, "g h i j k l", "books"),  # 6
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = {r.source: r for r in source_mix_weights(df, "source", "text").collect()}
        assert out["web"].n_docs == 2 and out["web"].n_tokens == 6
        assert out["books"].n_tokens == 6
        assert out["web"].share == 0.5 and out["books"].share == 0.5
        # uniform target over 2 sources = 0.5 -> weight 1.0 for both
        assert out["web"].weight == 1.0 and out["books"].weight == 1.0

    def test_explicit_target_shares(self, spark):
        rows = [(1, "a b c", "web"), (2, "d", "books")]  # web 3/4, books 1/4
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = {
            r.source: r
            for r in source_mix_weights(
                df, "source", "text", target_shares={"web": 0.25, "books": 0.75}
            ).collect()
        }
        assert out["web"].weight == pytest.approx(0.25 / 0.75, abs=1e-6)
        assert out["books"].weight == pytest.approx(0.75 / 0.25, abs=1e-6)

    def test_shares_sum_to_one_on_corpus(self, spark, sf_small):
        docs = load_table(spark, sf_small, "documents")
        tot = source_mix_weights(docs, "source", "text").agg(F.sum("share")).first()[0]
        assert tot == pytest.approx(1.0, abs=1e-4)


class TestEmbeddingDimStats:
    def test_hand_computed(self, spark):
        rows = [(1, [1.0, 10.0]), (2, [3.0, 30.0]), (3, [5.0, 20.0])]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = {r.dim: r for r in embedding_dim_stats(df, "embedding").collect()}
        assert out[0].n == 3 and out[0].mean == 3.0
        assert out[0].std == pytest.approx(math.sqrt(8 / 3), abs=1e-6)
        assert out[0].min_val == 1.0 and out[0].max_val == 5.0
        assert out[1].mean == 20.0

    def test_matches_numpy_on_corpus(self, spark, sf_small):
        emb = load_table(spark, sf_small, "embeddings")
        M = np.array([list(r.embedding) for r in emb.collect()], dtype=np.float64)
        out = {r.dim: r for r in embedding_dim_stats(emb, "embedding").collect()}
        assert len(out) == M.shape[1]
        for d in range(M.shape[1]):
            assert out[d].mean == pytest.approx(M[:, d].mean(), abs=1e-5)
            assert out[d].std == pytest.approx(M[:, d].std(), abs=1e-5)


class TestPackSequences:
    def _pack(self, spark, rows, budget, n_groups=1):
        from big_data_player_analysis_spark.operators.chunking import pack_sequences

        df = spark.createDataFrame(rows, "doc_id long, nt long")
        return pack_sequences(df, "doc_id", "nt", budget=budget, n_groups=n_groups)

    def test_next_fit_hand_computed(self, spark):
        # single stream: docs in id order with budget 10
        rows = [(1, 4), (2, 5), (3, 3), (4, 10), (5, 1)]
        out = {r.doc_id: (r.pack_id, r.off) for r in
               self._pack(spark, rows, budget=10).collect()}
        # 4+5=9 fits; +3 overflows -> pack1; 3+10 overflows -> pack2(10);
        # +1 overflows -> pack3
        assert out[1] == (0, 0) and out[2] == (0, 4)
        assert out[3] == (1, 0)
        assert out[4] == (2, 0)
        assert out[5] == (3, 0)

    def test_oversized_doc_gets_own_pack_never_dropped(self, spark):
        rows = [(1, 50), (2, 2), (3, 2)]
        out = {r.doc_id: (r.pack_id, r.off) for r in
               self._pack(spark, rows, budget=10).collect()}
        assert out[1] == (0, 0)  # overflowing pack, kept
        assert out[2] == (1, 0) and out[3] == (1, 2)

    def test_budget_respected_except_oversized(self, spark, sf_small):
        from big_data_player_analysis_spark.catalog import load_table
        from big_data_player_analysis_spark.operators.chunking import pack_sequences

        docs = load_table(spark, sf_small, "documents").select(
            "doc_id",
            F.size(F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"))
            .cast("long").alias("nt"),
        )
        out = pack_sequences(docs, "doc_id", "nt", budget=256, n_groups=8)
        joined = out.join(docs, "doc_id")
        # every doc placed exactly once
        assert out.count() == docs.count()
        assert out.select("doc_id").distinct().count() == docs.count()
        # within-pack extent: off + nt <= budget unless the doc sits alone
        # at off 0 (oversized)
        bad = joined.filter(
            (F.col("off") + F.col("nt") > 256) & (F.col("off") > 0)
        ).count()
        assert bad == 0
        # packs are dense per group: ids 0..max with no gaps
        per = (
            out.groupBy("grp")
            .agg(F.countDistinct("pack_id").alias("n"), F.max("pack_id").alias("mx"))
            .collect()
        )
        for r in per:
            assert r.n == r.mx + 1

    def test_deterministic_under_repartition(self, spark):
        rows = [(i, (i * 7) % 23 + 1) for i in range(200)]
        a = self._pack(spark, rows, budget=40, n_groups=4).collect()
        df = spark.createDataFrame(rows, "doc_id long, nt long").repartition(11)
        from big_data_player_analysis_spark.operators.chunking import pack_sequences

        b = pack_sequences(df, "doc_id", "nt", budget=40, n_groups=4).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestApplyMix:
    def test_oversample_and_downsample_epochs(self, spark):
        # web: 60 docs x 1 token, books: 20 docs x 1 token -> shares
        # 0.75/0.25; uniform target 0.5 -> weights web 2/3, books 2.0
        rows = [(i, "w", "web") for i in range(60)] + [
            (i + 1000, "b", "books") for i in range(20)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = apply_mix(df, "doc_id", "source", "text").collect()
        per_doc: dict[int, int] = {}
        for r in out:
            assert r.epoch >= 0
            per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + 1
        # every books doc gets exactly 2 epochs (weight exactly 2.0)
        for i in range(20):
            assert per_doc.get(i + 1000, 0) == 2
        # web docs get 0 or 1 epochs; total ~ 2/3 * 60 = 40
        n_web = sum(v for d, v in per_doc.items() if d < 1000)
        assert all(v == 1 for d, v in per_doc.items() if d < 1000)
        assert 25 <= n_web <= 55  # uniform bucket, loose bound at n=60

    def test_deterministic_and_partition_stable(self, spark):
        rows = [(i, "x y z", "web" if i % 3 else "books") for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        a = sorted(map(tuple, apply_mix(df, "doc_id", "source", "text").collect()))
        b = sorted(
            map(
                tuple,
                apply_mix(df.repartition(7), "doc_id", "source", "text").collect(),
            )
        )
        assert a == b

    def test_epochs_are_dense_from_zero(self, spark):
        rows = [(1, "a", "s1"), (2, "b c d e f g h i j", "s2")]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = apply_mix(df, "doc_id", "source", "text").collect()
        by_doc: dict[int, list[int]] = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r.epoch)
        for d, es in by_doc.items():
            assert sorted(es) == list(range(len(es)))


class TestCdcChunks:
    """Content-defined chunking: reconstruction, document preservation, and
    the defining edit-shift boundary stability property."""

    def _chunks(self, spark, rows):
        from big_data_player_analysis_spark.operators.chunking import cdc_chunks

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return cdc_chunks(df, "doc_id", "text").collect()

    def test_chunks_tile_the_document(self, spark):
        import hashlib
        import random
        import re

        rng = random.Random(3)
        text = "".join(rng.choice("abcdefgh 012") for _ in range(2000))
        norm = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", "", text.lower())).strip()
        out = sorted(self._chunks(spark, [(1, text)]), key=lambda r: r.chunk_id)
        assert out[0].start == 1
        pos = 1
        for r in out:
            assert r.start == pos
            piece = norm[r.start - 1 : r.start - 1 + r.chunk_len]
            assert hashlib.md5(piece.encode()).hexdigest() == r.chunk_md5
            pos += r.chunk_len
        assert pos - 1 == len(norm)  # chunks tile the whole normalized text
        assert len(out) > 3  # boundaries actually fired on 2000 chars

    def test_short_and_empty_docs_preserved(self, spark):
        out = self._chunks(spark, [(1, "tiny"), (2, ""), (3, None)])
        by_doc = {r.doc_id: r for r in out}
        assert set(by_doc) == {1, 2, 3}
        assert by_doc[1].chunk_len == 4
        assert by_doc[2].chunk_len == 0 and by_doc[3].chunk_len == 0

    def test_edit_shift_keeps_downstream_chunk_hashes(self, spark):
        """Prepending text must leave every chunk after the first
        content-defined boundary byte-identical (same md5 multiset tail) —
        the property offset-based chunking cannot have, and the reason CDC
        exists."""
        import random

        rng = random.Random(11)
        body = "".join(rng.choice("abcdefgh 012") for _ in range(3000))
        shifted = "zz9 " + body
        base = {r.chunk_md5 for r in self._chunks(spark, [(1, body)])}
        edit = {r.chunk_md5 for r in self._chunks(spark, [(1, shifted)])}
        shared = base & edit
        # everything beyond the first boundary after the edit is shared
        assert len(shared) >= max(1, len(base) - 2)
        assert base != edit  # the head chunk did change


def test_remove_duplicate_spans_matches_profile(spark):
    """The rewrite and the report must agree: n_removed_tokens equals the
    profile's n_dup_tokens per doc, and surviving tokens are exactly the
    complement of the merged spans."""
    from big_data_player_analysis_spark.operators.repetition import (
        duplicate_span_profile,
        remove_duplicate_spans,
    )

    rows = [
        (0, "a b c d e f g h i j unique zero tail"),
        (1, "a b c d e f g h i j other one ending"),
        (2, "totally different words without any shared window at all"),
        (3, "tiny"),
        (4, None),
        (5, "x y a b c d e f g h i j z"),  # shared run mid-document
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    prof = {r.doc_id: r for r in duplicate_span_profile(
        df, "doc_id", "text", window_tokens=5, min_count=2).collect()}
    out = {r.doc_id: r for r in remove_duplicate_spans(
        df, "doc_id", "text", window_tokens=5, min_count=2).collect()}
    assert set(out) == set(prof)
    for did, r in out.items():
        assert r.n_removed_tokens == prof[did].n_dup_tokens, did
        # kept + removed account for every token
        kept = len(r.clean_text.split()) if r.clean_text else 0
        assert kept + r.n_removed_tokens == prof[did].n_tokens or (
            r.clean_text == "" and prof[did].n_tokens - r.n_removed_tokens <= 1
        ), did  # empty-text doc: split('') counts one empty token
    # the shared 10-token run disappears from every carrier
    for did in (0, 1, 5):
        assert "a b c d e f g h i j" not in out[did].clean_text
    # untouched docs come back whitespace-canonical but content-identical
    assert out[2].clean_text == rows[2][1]


def test_remove_duplicate_spans_preserves_document_set(spark, sf_small):
    """Every document survives (possibly empty) — curation filters, not
    the rewriter, decide to drop."""
    from big_data_player_analysis_spark.catalog import load_table
    from big_data_player_analysis_spark.operators.repetition import (
        remove_duplicate_spans,
    )

    docs = load_table(spark, sf_small, "documents")
    out = remove_duplicate_spans(docs, "doc_id", "text")
    assert out.count() == docs.count()
