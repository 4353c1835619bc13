

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
