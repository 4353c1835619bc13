"""NFC profile: pandas-level golden cases (no Spark needed for the batch
body) plus the Spark plumbing (schema, null handling, map-only plan)."""

import pandas as pd

from tika_xapian_spark.operators.unicode_norm import _nfc_batch, nfc_profile


class TestBatchBody:
    def test_golden_cases(self):
        out = _nfc_batch(
            pd.Series([0, 1, 2, 3]),
            pd.Series([
                "é",        # combining acute -> é (2 chars -> 1)
                "Ω ohm",     # OHM SIGN singleton -> Ω (same length)
                "fi ﬁ",      # ligature: NFC must NOT touch it
                "plain ascii",
            ]),
        )
        assert list(out["changed"]) == [1, 1, 0, 0]
        assert list(out["chars_before"]) == [2, 5, 4, 11]
        assert list(out["chars_after"]) == [1, 5, 4, 11]
        assert out["norm_text"][0] == "é"
        assert out["norm_text"][1][0] == "Ω"
        assert out["norm_text"][2] == "fi ﬁ"

    def test_null_text_is_empty(self):
        out = _nfc_batch(pd.Series([7]), pd.Series([None]))
        assert (out["changed"][0], out["chars_before"][0]) == (0, 0)
        assert out["norm_text"][0] == ""


class TestSparkPlumbing:
    def test_roundtrip_and_map_only_plan(self, spark):
        df = spark.createDataFrame(
            [(1, "áb"), (2, None)], "doc_id long, text string"
        )
        prof = nfc_profile(df)
        rows = {r["doc_id"]: r for r in prof.collect()}
        assert rows[1]["norm_text"] == "áb"
        assert rows[1]["changed"] == 1
        assert rows[2]["norm_text"] == ""
        plan = prof._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan          # map-only: pipelines with scan
        assert plan.count("MapInPandas") == 1  # the whole profile, one pass
