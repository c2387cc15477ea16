"""As-of join and sessionization operators (operators/temporal.py)."""

import datetime as dt

import pytest

from rust_geo_booleanop_spark.operators import asof_join, sessionize

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def quotes(spark):
    # right side: (key, time, value) with a same-timestamp tie at m=30
    rows = [
        (1, _ts(0), 100),
        (1, _ts(10), 101),
        (1, _ts(30), 102),
        (1, _ts(30), 103),  # tie: greater quote_id wins
        (2, _ts(5), 200),
        (3, _ts(99), 300),  # key never probed
    ]
    return spark.createDataFrame(rows, "sym long, qts timestamp, quote_id long")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        (0, 1, _ts(9)),    # -> 100 (10:00 not yet)
        (1, 1, _ts(10)),   # -> 101 (inclusive bound)
        (2, 1, _ts(30)),   # -> 103 (tie broken by quote_id)
        (3, 1, _ts(500)),  # -> 103 (carry forward)
        (4, 2, _ts(4)),    # no quote yet -> dropped (inner as-of)
        (5, 2, _ts(6)),    # -> 200
        (6, 4, _ts(50)),   # key with no quotes -> dropped
    ]
    return spark.createDataFrame(rows, "trade_id long, sym long, tts timestamp")


class TestAsofJoin:
    def test_semantics(self, trades, quotes):
        out = asof_join(
            trades, quotes,
            left_key="sym", right_key="sym",
            left_time="tts", right_time="qts",
            right_cols=["quote_id"], right_tie="quote_id",
        )
        got = {r.trade_id: r.asof_quote_id for r in out.collect()}
        assert got == {0: 100, 1: 101, 2: 103, 3: 103, 5: 200}

    def test_null_right_columns_stay_atomic(self, spark):
        """A NULL in one right column must not splice values from an older
        right row into the as-of match."""
        rdf = spark.createDataFrame(
            [(1, _ts(1), 10, 100, 200), (1, _ts(2), 11, None, 500)],
            "k long, rt timestamp, rid long, a long, b long",
        )
        ldf = spark.createDataFrame([(0, 1, _ts(3))], "lid long, k long, lt timestamp")
        out = asof_join(
            ldf, rdf, left_key="k", right_key="k",
            left_time="lt", right_time="rt",
            right_cols=["rid", "a", "b"], right_tie="rid",
        ).collect()
        assert len(out) == 1
        r = out[0]
        # the match is the t=2 row AS A WHOLE: a stays NULL, not backfilled
        assert (r.asof_rid, r.asof_a, r.asof_b) == (11, None, 500)

    def test_matches_brute_force_on_events(self, spark):
        import random

        rng = random.Random(11)
        right = [(rng.randrange(5), _ts(rng.randrange(0, 1000)), i) for i in range(200)]
        left = [(i, rng.randrange(6), _ts(rng.randrange(0, 1000))) for i in range(100)]
        rdf = spark.createDataFrame(right, "k long, rt timestamp, rid long")
        ldf = spark.createDataFrame(left, "lid long, k long, lt timestamp")
        out = asof_join(
            ldf, rdf, left_key="k", right_key="k",
            left_time="lt", right_time="rt",
            right_cols=["rid"], right_tie="rid",
        )
        got = {r.lid: r.asof_rid for r in out.collect()}
        expected = {}
        for lid, k, lt in left:
            cands = [(rt, rid) for (rk, rt, rid) in right if rk == k and rt <= lt]
            if cands:
                expected[lid] = max(cands)[1]
        assert got == expected


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        rows = [
            (7, _ts(0), 0),
            (7, _ts(10), 1),     # same session (gap 10m <= 30m)
            (7, _ts(50), 2),     # new session (gap 40m)
            (7, _ts(70), 3),     # same session
            (8, _ts(0), 4),      # separate key
        ]
        e = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
        out = {
            r.event_id: (r.session_seq, r.event_in_session)
            for r in sessionize(e, gap_seconds=1800).collect()
        }
        assert out == {0: (1, 1), 1: (1, 2), 2: (2, 1), 3: (2, 2), 4: (1, 1)}

    def test_exact_gap_boundary_stays_in_session(self, spark):
        rows = [(1, _ts(0), 0), (1, _ts(30), 1)]  # gap == 1800s exactly
        e = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
        out = {r.event_id: r.session_seq for r in sessionize(e, gap_seconds=1800).collect()}
        assert out == {0: 1, 1: 1}
