"""profile_table unit tests: null/distinct accounting, approx mode, and
input validation."""

from __future__ import annotations

import pytest

from big_data_player_analysis_spark.operators.profiling import profile_table


def test_hand_computed(spark):
    rows = [(1, "a"), (2, "a"), (3, None), (None, "b")]
    df = spark.createDataFrame(rows, "k long, s string")
    out = {r.column: r for r in profile_table(df, ["k", "s"]).collect()}
    assert out["k"].n_rows == 4 and out["k"].n_nulls == 1
    assert out["k"].n_distinct == 3
    assert (out["k"].min_val, out["k"].max_val) == ("1", "3")
    assert out["s"].n_nulls == 1 and out["s"].n_distinct == 2
    assert (out["s"].min_val, out["s"].max_val) == ("a", "b")


def test_approx_mode_close(spark):
    df = spark.range(0, 5000).selectExpr("id", "id % 37 AS m")
    out = {r.column: r for r in profile_table(df, ["id", "m"], approx=True).collect()}
    # default HLL++ rsd is 0.05 at ONE sigma; allow 3 sigma
    assert abs(out["id"].n_distinct - 5000) / 5000 < 0.15
    assert abs(out["m"].n_distinct - 37) <= 4


def test_validation(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="not in DataFrame"):
        profile_table(df, ["nope"])
    with pytest.raises(ValueError, match="must not be empty"):
        profile_table(df, [])


class TestHeavyHittersMG:
    def _items(self, spark, counts, parts=4):
        rows = [(x,) for x, c in counts.items() for _ in range(c)]
        return spark.createDataFrame(rows, "gram string").repartition(parts)

    def test_exact_answer_hand_computed(self, spark):
        from big_data_player_analysis_spark.operators.profiling import (
            heavy_hitters_mg,
        )

        # N = 100; phi = 0.1 -> threshold ceil(10) = 10
        counts = {"hot": 40, "warm": 10, "edge": 9, **{f"c{i}": 1 for i in range(41)}}
        out = {
            r.gram: r.n
            for r in heavy_hitters_mg(
                self._items(spark, counts), "gram", phi=0.1, k=20
            ).collect()
        }
        assert out == {"hot": 40, "warm": 10}  # edge=9 < 10 excluded

    def test_tiny_k_still_exact(self, spark):
        """k counters per PARTITION can be far below the distinct count —
        the candidate union + exact verify must still return the exact
        heavy set (MG summaries only generate candidates)."""
        from big_data_player_analysis_spark.operators.profiling import (
            heavy_hitters_mg,
        )

        counts = {"dom": 300, **{f"x{i}": 2 for i in range(200)}}  # N=700
        # phi=0.35 -> T=245; k=5 per partition, 201 distinct items
        out = {
            r.gram: r.n
            for r in heavy_hitters_mg(
                self._items(spark, counts, parts=8), "gram", phi=0.35, k=5
            ).collect()
        }
        assert out == {"dom": 300}

    def test_partitioning_invariance(self, spark):
        from big_data_player_analysis_spark.operators.profiling import (
            heavy_hitters_mg,
        )

        counts = {"a": 50, "b": 30, "c": 19, **{f"z{i}": 1 for i in range(1)}}
        for parts in (1, 3, 16):
            out = {
                r.gram: r.n
                for r in heavy_hitters_mg(
                    self._items(spark, counts, parts=parts), "gram", phi=0.2, k=10
                ).collect()
            }
            assert out == {"a": 50, "b": 30}, parts  # T = ceil(20) = 20

    def test_phi_k_contract_enforced(self, spark):
        from big_data_player_analysis_spark.operators.profiling import (
            heavy_hitters_mg,
        )

        df = spark.createDataFrame([("x",)], "gram string")
        with pytest.raises(ValueError, match="phi"):
            heavy_hitters_mg(df, "gram", phi=0.0005, k=1000)  # phi <= 1/(k+1)
        with pytest.raises(ValueError, match="phi"):
            heavy_hitters_mg(df, "gram", phi=1.5, k=10)


class TestBottomKQuantiles:
    def test_exact_when_sample_covers_all(self, spark):
        from big_data_player_analysis_spark.operators.profiling import (
            bottomk_sample_quantiles,
        )

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(101)], "k long, v double"
        )
        got = {
            r.q: r.estimate
            for r in bottomk_sample_quantiles(
                df, "v", "k", k=500, quantiles=(0.5, 0.9)
            ).collect()
        }
        assert got == {0.5: 50.0, 0.9: 90.0}

    def test_partitioning_invariance(self, spark):
        """The sample is a pure function of the keys: any partitioning of
        the input must yield the identical sample and estimates."""
        from big_data_player_analysis_spark.operators.profiling import (
            bottomk_sample_quantiles,
        )

        rows = [(i, float((i * 37) % 1000)) for i in range(2000)]
        outs = []
        for parts in (1, 7, 32):
            df = spark.createDataFrame(rows, "k long, v double").repartition(parts)
            outs.append(
                sorted(
                    (r.q, r.estimate, r.sample_n)
                    for r in bottomk_sample_quantiles(df, "v", "k", k=256).collect()
                )
            )
        assert outs[0] == outs[1] == outs[2]
        assert all(n == 256 for _, _, n in outs[0])

    def test_sample_estimate_near_exact(self, spark):
        """O(1/sqrt(k)) rank error: with k=512 over a uniform 0..9999
        value set the p50/p90 estimates must land within a few percentile
        ranks of the exact answer."""
        from big_data_player_analysis_spark.operators.profiling import (
            bottomk_sample_quantiles,
        )

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(10000)], "k long, v double"
        )
        got = {
            r.q: r.estimate
            for r in bottomk_sample_quantiles(
                df, "v", "k", k=512, quantiles=(0.5, 0.9)
            ).collect()
        }
        assert abs(got[0.5] - 5000) < 1000  # ~4.4 rank-percent stderr at k=512
        assert abs(got[0.9] - 9000) < 700
