"""Batch event-time operator tests — notably the equivalence between
the hash-join range count and its linear single-window form."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_his_spark.operators.event_time import (
    range_join_count,
    range_join_count_linear,
)
from etl_his_spark.sources.readers import read_table


def _sorted_rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple(str(x) for x in t),
    )


def test_range_join_linear_equivalent_on_events(spark, sf_dir):
    """Same (left row → count) map as the join+residual form on the
    real events table, including sub-second timestamp boundaries."""
    e = read_table(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    right = e.select("user_id", "ts")
    joined = range_join_count(errors, right, "user_id", "ts", "ts", 3600)
    linear = range_join_count_linear(errors, right, "user_id", "ts", "ts", 3600)
    assert _sorted_rows(joined) == _sorted_rows(linear)


def test_range_join_linear_hot_entity_and_nulls(spark):
    """Skewed key (one entity owns nearly all rows), NULL entities on
    both sides, and exact boundary timestamps t-Δ (included) and t
    (excluded)."""
    t0 = datetime.datetime(2024, 1, 1)

    def ts(seconds):
        return t0 + datetime.timedelta(seconds=seconds)

    # hot entity 1: marker every second for 500s; entity 2 sparse; NULLs
    right_rows = [(1, ts(i)) for i in range(500)]
    right_rows += [(2, ts(10)), (2, ts(100)), (None, ts(50))]
    left_rows = [
        (100, 1, ts(500)),   # window [440,500): 60 markers
        (101, 1, ts(60)),    # window [0,60): 60 markers
        (102, 1, ts(0)),     # nothing strictly before 0
        (103, 2, ts(70)),    # window [10,70): marker at 10 in (>=), 100 out
        (104, None, ts(100)),  # NULL entity: matches nothing
    ]
    right = spark.createDataFrame(right_rows, "user_id long, ts timestamp")
    left = spark.createDataFrame(
        left_rows, "event_id long, user_id long, ts timestamp"
    )
    linear = range_join_count_linear(left, right, "user_id", "ts", "ts", 60)
    got = {r["event_id"]: r["n_in_range"] for r in linear.collect()}
    assert got == {100: 60, 101: 60, 102: 0, 103: 1, 104: 0}
    joined = range_join_count(left, right, "user_id", "ts", "ts", 60)
    assert _sorted_rows(joined) == _sorted_rows(linear)


def test_range_join_linear_subsecond_boundary(spark):
    """Markers offset by microseconds around the bounds: the frame is
    evaluated at µs resolution, not whole seconds."""
    t0 = datetime.datetime(2024, 1, 1)
    us = datetime.timedelta(microseconds=1)
    dt = datetime.timedelta(seconds=60)
    left = spark.createDataFrame(
        [(1, 7, t0)], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (7, t0 - dt - us),  # just below lower bound: out
            (7, t0 - dt),       # exactly lower bound: in (>=)
            (7, t0 - us),       # just before t: in
            (7, t0),            # exactly t: out (<)
        ],
        "user_id long, ts timestamp",
    )
    got = range_join_count_linear(left, right, "user_id", "ts", "ts", 60)
    assert got.first()["n_in_range"] == 2


def test_markov_transitions_reference(spark, sf_dir):
    import pyarrow.parquet as pq
    from collections import Counter, defaultdict

    from etl_his_spark.registry import QUERIES

    rows = pq.read_table(f"{sf_dir}/events.parquet").to_pylist()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    trans = Counter()
    for evs in by_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            trans[(a, b)] += 1
    n_from = Counter()
    for (a, _), n in trans.items():
        n_from[a] += n
    got = {
        (r["event_type"], r["next_type"]): r
        for r in QUERIES["events_markov_transitions"](spark, sf_dir).collect()
    }
    assert set(got) == set(trans)
    for (a, b), n in trans.items():
        r = got[(a, b)]
        assert r["n"] == n
        assert r["n_from"] == n_from[a]
        assert r["prob"] == n / n_from[a]
    # rows per from-state sum to 1 (exact integer ratios)
    for a in n_from:
        assert abs(sum(r["prob"] for k, r in got.items() if k[0] == a) - 1) < 1e-9


def test_key_skew_top10(spark, sf_dir):
    import pyarrow.parquet as pq
    from collections import Counter

    from etl_his_spark.registry import QUERIES

    rows = pq.read_table(f"{sf_dir}/orders.parquet").to_pylist()
    cnt = Counter(r["o_custkey"] for r in rows)
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = QUERIES["stats_key_skew"](spark, sf_dir).collect()
    assert [(r["key"], r["n"]) for r in
            sorted(got, key=lambda r: (-r["n"], r["key"]))] == want
    for r in got:
        assert r["total"] == len(rows)
        assert r["n_keys"] == len(cnt)
        assert r["share"] == r["n"] / len(rows)


def test_seasonal_naive_reference(spark, sf_dir):
    import pyarrow.parquet as pq
    from collections import defaultdict

    from etl_his_spark.registry import QUERIES

    rows = pq.read_table(f"{sf_dir}/orders.parquet").to_pylist()
    monthly = defaultdict(int)
    for r in rows:
        d = r["o_orderdate"]
        monthly[(d.year, d.month)] += round(r["o_totalprice"] * 100)
    seq = sorted(monthly)
    got = {
        (r["yr"], r["mo"]): r
        for r in QUERIES["orders_seasonal_naive"](spark, sf_dir).collect()
    }
    expect = {}
    for i, ym in enumerate(seq):
        if i >= 12:
            expect[ym] = (monthly[ym], monthly[seq[i - 12]])
    assert set(got) == set(expect)
    for ym, (rev, fc) in expect.items():
        r = got[ym]
        assert (r["revenue_cents"], r["forecast_cents"]) == (rev, fc)
        assert r["error_cents"] == rev - fc
        assert r["ape"] == abs(rev - fc) / fc


def test_churn_training_set_reference(spark, sf_dir):
    import pyarrow.parquet as pq
    from collections import defaultdict

    from etl_his_spark.registry import QUERIES

    rows = pq.read_table(f"{sf_dir}/events.parquet").to_pylist()
    max_ts = max(r["ts"] for r in rows)
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    got = {
        r["user_id"]: r
        for r in QUERIES["events_churn_training_set"](spark, sf_dir).collect()
    }
    assert set(got) == set(by_user)
    for uid, evs in by_user.items():
        r = got[uid]
        assert r["n_events"] == len(evs)
        assert r["revenue_cents"] == sum(
            round((e["value"] or 0) * 100)
            for e in evs if e["event_type"] == "purchase"
        )
        assert r["days_active"] == len({e["ts"].date() for e in evs})
        # engine convention (unix_timestamp / date_diff'second'):
        # truncate each timestamp to whole seconds BEFORE subtracting
        last = max(e["ts"] for e in evs)
        silence = int(
            (
                max_ts.replace(microsecond=0) - last.replace(microsecond=0)
            ).total_seconds()
        )
        assert r["silence_secs"] == silence
        assert r["churned"] == (silence >= 86400)
    # the label must discriminate on the fixture
    labels = [r["churned"] for r in got.values()]
    assert any(labels) and not all(labels)


def test_dau_wau_reference(spark, sf_dir):
    import pyarrow.parquet as pq
    from collections import defaultdict
    from datetime import timedelta

    from etl_his_spark.registry import QUERIES

    rows = pq.read_table(f"{sf_dir}/events.parquet").to_pylist()
    by_day = defaultdict(set)
    for r in rows:
        by_day[r["ts"].date()].add(r["user_id"])
    got = {
        r["day"]: r
        for r in QUERIES["events_dau_wau_stickiness"](spark, sf_dir).collect()
    }
    assert set(got) == set(by_day)
    for d, users in by_day.items():
        week = set()
        for back in range(7):
            week |= by_day.get(d - timedelta(days=back), set())
        r = got[d]
        assert r["dau"] == len(users)
        assert r["wau"] == len(week)
        assert r["stickiness"] == len(users) / len(week)
