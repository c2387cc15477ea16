"""As-of join, sessionization, and interval join (operators/temporal.py)."""

import datetime as dt

import pytest

from rust_geo_booleanop_spark.operators import asof_join, interval_join, sessionize

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


class TestIntervalJoin:
    def _naive(self, points, intervals, keyed):
        out = set()
        for pid, pk, pt in points:
            for iid, ik, s, e in intervals:
                if keyed and pk != ik:
                    continue
                if s <= pt < e:
                    out.add((pid, iid))
        return out

    def _run(self, spark, points, intervals, keyed, bucket_seconds):
        pdf = spark.createDataFrame(points, "pid long, user_id long, ts timestamp")
        idf = spark.createDataFrame(
            intervals, "iid long, user_id long, t_start timestamp, t_end timestamp"
        )
        out = interval_join(
            pdf, idf, point_time="ts", start_col="t_start", end_col="t_end",
            key_col="user_id" if keyed else None, bucket_seconds=bucket_seconds,
        )
        return {(r.p_pid, r.i_iid) for r in out.collect()}

    def test_boundaries_half_open(self, spark):
        points = [(0, 1, _ts(0)), (1, 1, _ts(30)), (2, 1, _ts(60))]
        intervals = [(10, 1, _ts(0), _ts(60))]
        got = self._run(spark, points, intervals, keyed=True, bucket_seconds=600)
        # start inclusive, end exclusive
        assert got == {(0, 10), (1, 10)}

    def test_empty_interval_matches_nothing(self, spark):
        points = [(0, 1, _ts(5))]
        intervals = [(10, 1, _ts(5), _ts(5)), (11, 1, _ts(9), _ts(6))]
        assert self._run(spark, points, intervals, keyed=True, bucket_seconds=60) == set()

    def test_multi_slot_interval_yields_each_pair_once(self, spark):
        # interval spans many 60s slots; every matching pair must appear once
        points = [(i, 1, _ts(i)) for i in range(0, 20)]
        intervals = [(10, 1, _ts(3), _ts(17))]
        pdf = spark.createDataFrame(points, "pid long, user_id long, ts timestamp")
        idf = spark.createDataFrame(
            intervals, "iid long, user_id long, t_start timestamp, t_end timestamp"
        )
        rows = interval_join(
            pdf, idf, "ts", "t_start", "t_end", key_col="user_id", bucket_seconds=60
        ).collect()
        pairs = [(r.p_pid, r.i_iid) for r in rows]
        assert sorted(pairs) == [(i, 10) for i in range(3, 17)]

    @pytest.mark.parametrize("keyed", [True, False])
    @pytest.mark.parametrize("bucket_seconds", [60, 3600, 86400])
    def test_matches_naive_theta_join(self, spark, keyed, bucket_seconds):
        import random

        rng = random.Random(4)
        points = [
            (i, rng.randrange(4), T0 + dt.timedelta(seconds=rng.randrange(0, 86400)))
            for i in range(120)
        ]
        intervals = []
        for i in range(40):
            s = T0 + dt.timedelta(seconds=rng.randrange(0, 86400))
            intervals.append(
                (i, rng.randrange(4), s, s + dt.timedelta(seconds=rng.randrange(0, 7200)))
            )
        got = self._run(spark, points, intervals, keyed, bucket_seconds)
        assert got == self._naive(
            [(p, k, t) for p, k, t in points], intervals, keyed
        )

    def test_pre_epoch_negative_micros(self, spark):
        # truncating DIV (not floor) is fine as long as both sides share
        # it; pin that claim on negative unix micros
        t0 = dt.datetime(1969, 12, 31, 23, 0, 0)
        points = [(i, 1, t0 + dt.timedelta(minutes=20 * i)) for i in range(9)]
        intervals = [(7, 1, t0 + dt.timedelta(minutes=30),
                      t0 + dt.timedelta(minutes=150))]
        got = self._run(spark, points, intervals, keyed=True, bucket_seconds=3600)
        expected = {(pid, 7) for pid, _, pt in points
                    if intervals[0][2] <= pt < intervals[0][3]}
        assert got == expected and expected  # non-vacuous

    def test_plan_has_no_nested_loop_join(self, spark):
        pdf = spark.createDataFrame([(0, 1, _ts(0))], "pid long, user_id long, ts timestamp")
        idf = spark.createDataFrame(
            [(0, 1, _ts(0), _ts(9))],
            "iid long, user_id long, t_start timestamp, t_end timestamp",
        )
        plan = (
            interval_join(pdf, idf, "ts", "t_start", "t_end", key_col="user_id")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan


class TestFunnelSteps:
    def _run(self, spark, rows, steps):
        from rust_geo_booleanop_spark.operators import funnel_steps

        df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
        out = funnel_steps(df, steps)
        return {r.step_index: (r.step, r.n_users) for r in out.collect()}

    def test_strictly_ordered_progression(self, spark):
        import datetime as dt

        t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
        rows = [
            # user 1 completes the funnel in order
            (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
            # user 2 clicks BEFORE viewing -> stops at view
            (2, t(5), "view"), (2, t(4), "click"),
            # user 3 views only
            (3, t(1), "view"),
            # user 4 never views (click+purchase don't count)
            (4, t(1), "click"), (4, t(2), "purchase"),
        ]
        got = self._run(spark, rows, ["view", "click", "purchase"])
        assert got == {1: ("view", 3), 2: ("click", 1), 3: ("purchase", 1)}

    def test_same_timestamp_does_not_advance(self, spark):
        import datetime as dt

        t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
        rows = [(1, t(1), "view"), (1, t(1), "click"), (1, t(2), "click")]
        got = self._run(spark, rows, ["view", "click"])
        # the t(1) click ties the first view -> only the t(2) click counts
        assert got == {1: ("view", 1), 2: ("click", 1)}

    def test_min_first_event_is_the_anchor(self, spark):
        import datetime as dt

        t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
        # second view at t5 is irrelevant: click at t3 > first view t1
        rows = [(1, t(1), "view"), (1, t(5), "view"), (1, t(3), "click")]
        got = self._run(spark, rows, ["view", "click"])
        assert got == {1: ("view", 1), 2: ("click", 1)}

    def test_counts_non_increasing_random(self, spark):
        import datetime as dt
        import random

        rng = random.Random(31)
        types = ["view", "click", "purchase"]
        rows = [
            (u, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=rng.randrange(10000)),
             rng.choice(types + ["error"]))
            for u in range(40) for _ in range(rng.randrange(0, 12))
        ]
        got = self._run(spark, rows, types)
        ns = [got[i][1] for i in (1, 2, 3)]
        assert ns[0] >= ns[1] >= ns[2]

    def test_empty_steps_raises(self, spark):
        import pytest as _pytest

        from rust_geo_booleanop_spark.operators import funnel_steps

        df = spark.createDataFrame([], "user_id long, ts timestamp, event_type string")
        with _pytest.raises(ValueError):
            funnel_steps(df, [])


class TestLatestSnapshot:
    def test_ties_resolve_by_tie_col(self, spark):
        import datetime as dt

        from rust_geo_booleanop_spark.operators import latest_snapshot

        t = dt.datetime(2024, 1, 1)
        rows = [(1, t, 10, "a"), (1, t, 11, "b"), (2, t, 5, "c")]
        df = spark.createDataFrame(rows, "k long, ts timestamp, id long, v string")
        got = {(r.k): (r.id, r.v)
               for r in latest_snapshot(df, "k", "ts", "id").collect()}
        assert got == {1: (11, "b"), 2: (5, "c")}

    def test_latest_time_wins(self, spark):
        import datetime as dt

        from rust_geo_booleanop_spark.operators import latest_snapshot

        rows = [(1, dt.datetime(2024, 1, d), d, "x") for d in (3, 1, 2)]
        df = spark.createDataFrame(rows, "k long, ts timestamp, id long, v string")
        got = latest_snapshot(df, "k", "ts", "id").collect()
        assert len(got) == 1 and got[0].id == 3

    def test_plan_uses_window_group_limit(self, spark):
        from rust_geo_booleanop_spark.operators import latest_snapshot

        df = spark.createDataFrame(
            [(1, 1, 1)], "k long, ts long, id long"
        )
        plan = latest_snapshot(df, "k", "ts", "id")._jdf.queryExecution(
        ).executedPlan().toString()
        assert "WindowGroupLimit" in plan


def test_asof_join_excludes_null_time_right_rows(spark):
    """A right row with NULL time satisfies no `r.time <= l.time`
    predicate; without the up-front filter the ascending sort would put
    it FIRST and carry it onto left rows that have no true predecessor."""
    from rust_geo_booleanop_spark.operators import asof_join

    left = spark.createDataFrame([(1, 5.0)], "k int, t double")
    right = spark.createDataFrame(
        [(1, None, "ghost"), (None, 1.0, "nokey")],
        "k int, t double, payload string",
    )
    out = asof_join(left, right, "k", "k", "t", "t", ["payload"], "payload")
    assert out.count() == 0

    # and a real predecessor still wins over the excluded rows
    right2 = spark.createDataFrame(
        [(1, None, "ghost"), (1, 3.0, "real")],
        "k int, t double, payload string",
    )
    got = asof_join(left, right2, "k", "k", "t", "t", ["payload"], "payload").collect()
    assert [(r.k, r.asof_payload) for r in got] == [(1, "real")]
