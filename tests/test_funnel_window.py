"""Timed-funnel boundary semantics: a step landing EXACTLY at the 24h
limit converts (<=, not <); one millisecond later does not. Differential
vs the registered oracle on the same synthetic files."""

from __future__ import annotations

import datetime as dt
import os

import duckdb

from bigdatatiler_spark.registry import load_all
from tools.check_oracle import table_hash

T0 = dt.datetime(2025, 6, 1)
DAY_MS = 86_400_000


def _write_fixture(spark, path):
    rows = []
    eid = 0

    def ev(user, offset_ms, ty):
        nonlocal eid
        eid += 1
        rows.append(
            (eid, T0 + dt.timedelta(milliseconds=offset_ms), user, ty, 1.0, "{}")
        )

    # user 1: view EXACTLY at the 24h boundary → converts step 2
    ev(1, 0, "signup"); ev(1, DAY_MS, "view")
    # user 2: view one ms past the boundary → does NOT convert
    ev(2, 0, "signup"); ev(2, DAY_MS + 1, "view")
    # user 3: full chain, each step inside its window, but the purchase
    # is 3 days after signup (windows anchor per-step, not at signup)
    ev(3, 0, "signup")
    ev(3, DAY_MS - 1, "view")
    ev(3, 2 * DAY_MS - 2, "click")
    ev(3, 3 * DAY_MS - 3, "purchase")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "events.parquet")
    )


def test_funnel_window_boundary(spark, tmp_path):
    path = str(tmp_path)
    _write_fixture(spark, path)
    spec = load_all()["events_funnel_windowed"]
    sdf = spec.fn(spark, path)
    srows = [tuple(r) for r in sdf.collect()]
    (n_signup, n_view, n_click, n_purchase, rate) = srows[0]
    assert (n_signup, n_view, n_click, n_purchase) == (3, 2, 1, 1)
    assert rate == 3333  # 1/3 on the e4 grid, floored
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{os.path.join(path, 'events.parquet')}/*.parquet')"
    )
    res = con.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    assert sorted(sdf.columns) == sorted(ocols)
    assert table_hash(list(sdf.columns), srows) == table_hash(
        ocols, res.fetchall()
    )
