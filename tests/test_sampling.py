

class TestWeightedSample:
    def test_weight_proportional_and_deterministic(self, spark):
        """E-S sampling must (a) strongly prefer heavy rows, (b) be a pure
        function of (key, seed, weight) — identical across invocations."""
        from tika_xapian_spark.operators.sampling import weighted_sample

        rows = [(i, "s", 1000 if i % 2 == 0 else 10) for i in range(1000)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, w long")
        out1 = weighted_sample(df, "doc_id", "lang", "w", k=100).collect()
        out2 = weighted_sample(df, "doc_id", "lang", "w", k=100).collect()
        assert [r.doc_id for r in out1] == [r.doc_id for r in out2]
        heavy = sum(1 for r in out1 if r.weight == 1000)
        # weight ratio 1001:11 (~91x) -> expected heavy share ~>95%;
        # assert a loose floor
        assert heavy >= 85, heavy

    def test_small_stratum_returns_all(self, spark):
        from tika_xapian_spark.operators.sampling import weighted_sample

        rows = [(i, "t", 5) for i in range(7)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, w long")
        out = weighted_sample(df, "doc_id", "lang", "w", k=20).collect()
        assert len(out) == 7


class TestTemperatureMix:
    def _mix(self, spark, sizes, alpha=0.5):
        from tika_xapian_spark.operators.sampling import temperature_mix

        rows = [
            (f"{s}-{i}", s) for s, n in sizes.items() for i in range(n)
        ]
        df = spark.createDataFrame(rows, "doc_id string, src string")
        return {
            r.stratum: r for r in temperature_mix(df, "src", alpha).collect()
        }

    def test_weights_sum_exactly_and_flatten(self, spark):
        out = self._mix(spark, {"big": 900, "small": 9})
        assert sum(r.weight_micro for r in out.values()) == 1_000_000
        # natural shares: 990099 / 9901; sqrt flattening: 30/33 vs 3/33
        assert out["small"].weight_micro > 9_901
        assert out["big"].weight_micro < 990_099
        # sqrt(900)=30, sqrt(9)=3 -> exact 10:1 score ratio
        assert out["big"].score_micro == 30_000_000
        assert out["small"].score_micro == 3_000_000
        # boost: small is upsampled (>1x), big downsampled (<1x)
        assert out["small"].boost_micro > 1_000_000
        assert out["big"].boost_micro < 1_000_000

    def test_uniform_strata_uniform_weights(self, spark):
        out = self._mix(spark, {f"s{i}": 50 for i in range(8)})
        ws = sorted(r.weight_micro for r in out.values())
        assert sum(ws) == 1_000_000
        assert ws[-1] - ws[0] <= 1  # largest remainder spreads the slack

    def test_alpha_validation(self, spark):
        import pytest as _pt

        from tika_xapian_spark.operators.sampling import temperature_mix

        df = spark.createDataFrame([("a", "s")], "doc_id string, src string")
        with _pt.raises(ValueError):
            temperature_mix(df, "src", alpha=0.0)
        with _pt.raises(ValueError):
            temperature_mix(df, "src", alpha=1.5)


class TestTokenBudgetPlan:
    def test_exact_targets_and_ceil_epochs(self, spark):
        """4 two-token docs in A vs 1 one-token doc in B, alpha=0.5:
        scores 2e6/1e6, largest-remainder weights 666667/333333; at a
        300-token budget the targets floor to 200/99 and epochs ceil to
        25 (200/8) and 99 (99/1) — every step exact integers."""
        from pyspark.sql import functions as F

        from tika_xapian_spark.operators.dedup import tokens_col
        from tika_xapian_spark.operators.sampling import token_budget_plan

        docs = spark.createDataFrame(
            [(i, "a b", "A") for i in range(4)] + [(9, "c", "B")],
            "doc_id long, text string, source string",
        )
        got = {
            r.stratum: (r.weight_micro, r.tokens_avail, r.target_tokens, r.epochs)
            for r in token_budget_plan(
                docs, "source", F.size(tokens_col("text")).cast("long"), 300
            ).collect()
        }
        assert got == {"A": (666667, 8, 200, 25), "B": (333333, 1, 99, 99)}

    def test_zero_token_stratum_excluded_and_big_budget_exact(self, spark):
        """A stratum of empty-text docs gets weight but no tokens: it is
        EXCLUDED (matching the oracle's token aggregation, which produces
        no row for it) instead of emitting NULL epochs; and a 15T-token
        budget must not wrap int64 (the split multiply is exact)."""
        from pyspark.sql import functions as F

        from tika_xapian_spark.operators.dedup import tokens_col
        from tika_xapian_spark.operators.sampling import token_budget_plan

        docs = spark.createDataFrame(
            [(1, "a b c d", "A"), (2, "  ", "B")],
            "doc_id long, text string, source string",
        )
        big = 15_000_000_000_000
        rows = token_budget_plan(
            docs, "source", F.size(tokens_col("text")).cast("long"), big
        ).collect()
        assert [r.stratum for r in rows] == ["A"]
        r = rows[0]
        assert r.target_tokens == big * r.weight_micro // 1_000_000 > 0
        assert r.epochs == (r.target_tokens + 3) // 4

        import pytest as _pytest

        with _pytest.raises(ValueError, match="budget"):
            token_budget_plan(
                docs, "source", F.size(tokens_col("text")).cast("long"), -1
            )
