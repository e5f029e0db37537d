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
