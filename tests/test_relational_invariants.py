"""Semantic invariants for relational rows whose value-correctness lives in
the driver's DuckDB gate — these pin the properties a hash compare can't
express (conservation, gap bounds, packing of sessions).
"""

import pandas as pd

from linkgraph.relational import _SESSION_GAP_S, q_sessionize

SF = "/root/testdata/sf0.001"


def test_sessionize_invariants(spark):
    out = q_sessionize(spark, SF).toPandas()
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()

    # every event lands in exactly one session
    assert int(out["n_events"].sum()) == len(ev)
    assert (out["dur_us"] >= 0).all()
    assert (out["n_types"] >= 1).all()

    # recompute per-user from scratch: within a session no idle gap exceeds
    # the threshold; across consecutive sessions the boundary gap does
    gap_us = _SESSION_GAP_S * 1_000_000
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    ev["us"] = ev["ts"].astype("int64") // 1000  # ns -> us
    for uid, grp in ev.groupby("user_id"):
        us = grp["us"].to_numpy()
        sess, bounds = 1, []
        start = 0
        for i in range(1, len(us)):
            if us[i] - us[i - 1] > gap_us:
                bounds.append((sess, start, i))
                sess += 1
                start = i
        bounds.append((sess, start, len(us)))
        mine = out[out["user_id"] == uid].sort_values("sess")
        assert len(mine) == len(bounds)
        for (s, lo, hi), row in zip(bounds, mine.itertuples()):
            assert row.sess == s
            assert row.n_events == hi - lo
            assert row.dur_us == int(us[hi - 1] - us[lo])


def test_moving_window_matches_python(spark):
    """Time-range trailing window vs a from-scratch per-user replication."""
    from collections import defaultdict

    from linkgraph.relational import _MOVING_RANGE_S, q_moving_window

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet").toPandas()
    got = {
        (r["user_id"], r["event_id"]): (r["n_1h"], r["val_1h"])
        for r in q_moving_window(spark, sf).collect()
    }
    by_user = defaultdict(list)
    for r in ev.itertuples():
        by_user[r.user_id].append((r.ts.timestamp(), r.event_id, r.value))
    n_checked = 0
    for uid, rows in by_user.items():
        rows.sort()
        for ts, eid, _v in rows:
            inside = [v for (t2, _e, v) in rows if ts - _MOVING_RANGE_S <= t2 <= ts]
            exp_n, exp_s = len(inside), round(sum(inside), 3)
            gn, gs = got[(uid, eid)]
            assert gn == exp_n, (uid, eid)
            assert abs(gs - exp_s) < 1e-6, (uid, eid)
            n_checked += 1
    assert n_checked == len(got)
