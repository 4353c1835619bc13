"""N-step conversion funnel (operators/funnel.py): the generalized fold
must reproduce hand-computed truths on crafted event streams — including a
4-step funnel — and its mechanically-generated oracle SQL must agree with
the DataFrame result on the same data (the r5-verdict "funnel-of-N for
free" requirement)."""

import datetime as dt

import duckdb
import pandas as pd
import pytest

from tika_xapian_spark.operators.funnel import (
    conversion_funnel,
    funnel_oracle_sql,
    step_frames,
)


def ts(h, m=0):
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(hours=h, minutes=m)


@pytest.fixture(scope="module")
def events4(spark):
    rows = [
        # user 1: full conversion, each step within 24h of the previous
        (1, "view", ts(0)), (1, "signup", ts(1)),
        (1, "click", ts(2)), (1, "purchase", ts(3)),
        # user 2: clicks BEFORE signing up -> stops at signup (ordering!)
        (2, "view", ts(0)), (2, "click", ts(1)), (2, "signup", ts(2)),
        (2, "purchase", ts(2, 30)),  # purchase without a qualifying click
        # user 3: converts but the click lands 25h after signup -> window
        # kills step 3 (and so step 4)
        (3, "view", ts(0)), (3, "signup", ts(1)),
        (3, "click", ts(26)), (3, "purchase", ts(27)),
        # user 4: two clicks, the FIRST qualifying one anchors the
        # purchase window: purchase at +23h from click#1 qualifies
        (4, "view", ts(0)), (4, "signup", ts(0, 30)), (4, "click", ts(1)),
        (4, "click", ts(20)), (4, "purchase", ts(23)),
        # user 5: never viewed -> not even step 1
        (5, "signup", ts(0)), (5, "click", ts(1)), (5, "purchase", ts(2)),
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )


STEPS4 = ("view", "signup", "click", "purchase")


class TestFourStepFunnel:
    def test_counts_match_hand_truth(self, events4):
        got = {
            r["step"]: r["n_users"]
            for r in conversion_funnel(events4, STEPS4).collect()
        }
        assert got == {
            "1_view": 4,      # users 1-4
            "2_signup": 4,    # users 1-4 (user 2 signs up after view)
            "3_click": 2,     # users 1, 4 (2 clicked too early, 3 too late)
            "4_purchase": 2,  # users 1, 4
        }

    def test_step_frames_carry_first_qualifying_ts(self, events4):
        frames = step_frames(events4, STEPS4)
        clicks = {r["user_id"]: r["t"] for r in frames[2].collect()}
        # user 4's qualifying click is the FIRST one (+1h), not the second
        assert clicks[4] == ts(1)

    def test_oracle_sql_agrees_on_same_data(self, events4):
        pdf = events4.toPandas()
        con = duckdb.connect()
        con.register("events", pdf)
        want = {
            s: int(n)
            for s, n in con.execute(funnel_oracle_sql(STEPS4)).fetchall()
        }
        got = {
            r["step"]: r["n_users"]
            for r in conversion_funnel(events4, STEPS4).collect()
        }
        assert got == want

    def test_single_step_and_empty_steps(self, events4):
        got = conversion_funnel(events4, ("purchase",)).collect()
        assert [(r["step"], r["n_users"]) for r in got] == [("1_purchase", 5)]
        with pytest.raises(ValueError):
            conversion_funnel(events4, ())

    def test_custom_window(self, events4):
        # 2-hour window: user 4's purchase (+22h after click) drops out
        got = {
            r["step"]: r["n_users"]
            for r in conversion_funnel(events4, STEPS4, window="2 hours").collect()
        }
        assert got["4_purchase"] == 1  # only user 1


class TestThreeStepRegression:
    """The driver query's shape: the generalized builder must equal the
    hand-written r5 three-join form (pinned by the oracle parity suite;
    here just the label contract)."""

    def test_labels(self, events4):
        labels = [
            r["step"]
            for r in conversion_funnel(
                events4, ("signup", "click", "purchase")
            ).collect()
        ]
        assert labels == ["1_signup", "2_click", "3_purchase"]
