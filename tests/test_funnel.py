"""Ordered-funnel semantics: steps must occur strictly in sequence."""

from __future__ import annotations

import datetime as dt

from etl_his_spark.plans.queries_funnel import events_funnel_ordered


def _ev(i, ts, user, typ):
    return (i, dt.datetime.fromisoformat(ts), user, typ, 1.0, "{}")


def test_funnel_requires_strict_order(spark, tmp_path, monkeypatch):
    rows = [
        # user 1: full ordered funnel
        _ev(1, "2024-01-01T10:00", 1, "view"),
        _ev(2, "2024-01-01T11:00", 1, "click"),
        _ev(3, "2024-01-01T12:00", 1, "purchase"),
        # user 2: purchase BEFORE click → depth stops at 2
        _ev(4, "2024-01-01T10:00", 2, "view"),
        _ev(5, "2024-01-01T12:00", 2, "click"),
        _ev(6, "2024-01-01T11:00", 2, "purchase"),
        # user 3: click before view → depth 1 (view exists, click unordered)
        _ev(7, "2024-01-01T10:00", 3, "click"),
        _ev(8, "2024-01-01T11:00", 3, "view"),
        # user 4: never viewed → depth 0
        _ev(9, "2024-01-01T10:00", 4, "signup"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    # route read_table("events") at the fixture dir to this frame
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = {r.user_id: r for r in events_funnel_ordered(spark, sf).collect()}
    assert out[1].funnel_depth == 3
    assert out[2].funnel_depth == 2 and out[2].t_purchase is None
    assert out[3].funnel_depth == 1 and out[3].t_click is None
    assert out[4].funnel_depth == 0 and out[4].t_view is None
