"""Distribution-statistics audits (§2.15 rows 209-211) vs from-scratch
numpy / pure-python references at sf0.001: inter-event burstiness, degree
Gini, and the train/val two-sample KS distance."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pytest

from linkgraph.datapipe import split_ks
from linkgraph.graphstats import _directed_simple, q_degree_gini
from linkgraph.relational import (
    q_cohort_retention,
    q_tool_runs,
    q_user_burstiness,
)

SF_DIR = "/root/testdata/sf0.001"


def test_burstiness_matches_numpy(spark):
    """B = (sigma - mu)/(sigma + mu) over floor-second gaps, per user."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", "event_id", "ts"
    )
    rows = ev.collect()
    per_user = defaultdict(list)
    for r in rows:
        # floor-second UTC epoch, matching unix_seconds / epoch_ms // 1000
        # (ts is TIMESTAMP_NTZ -> naive datetime; pin UTC explicitly so the
        # test does not depend on the driver's local timezone)
        s = math.floor(
            r["ts"].replace(tzinfo=__import__("datetime").timezone.utc).timestamp()
        )
        per_user[r["user_id"]].append((s, r["event_id"]))
    expect = {}
    for u, evs in per_user.items():
        evs.sort()
        gaps = np.diff(np.array([s for s, _ in evs], dtype=np.int64))
        if len(gaps) < 2:
            continue
        mu = gaps.mean()
        sigma = gaps.std()  # population
        expect[u] = 0.0 if sigma + mu == 0 else (sigma - mu) / (sigma + mu)
    got = {
        r["user_id"]: r for r in q_user_burstiness(spark, SF_DIR).collect()
    }
    assert set(got) == set(expect)
    for u, ref in expect.items():
        assert got[u]["burstiness"] == pytest.approx(ref, abs=1e-6), u
        gaps = np.diff(
            np.array(sorted(s for s, _ in per_user[u]), dtype=np.int64)
        )
        n = len(gaps)
        assert got[u]["n_gaps"] == n
        assert got[u]["sum_gap_s"] == int(gaps.sum())
        assert got[u]["disp"] == int(
            n * int((gaps.astype(object) ** 2).sum()) - int(gaps.sum()) ** 2
        )


def test_degree_gini_matches_numpy(spark):
    """Histogram-based Gini == the textbook sorted-rank formula."""
    dk = [(r["s"], r["t"]) for r in _directed_simple(spark, SF_DIR).collect()]
    outd = Counter(s for s, _ in dk)
    verts = {v for e in dk for v in e}
    d = np.sort(np.array([outd.get(v, 0) for v in verts], dtype=np.int64))
    n = len(d)
    ranks = np.arange(1, n + 1, dtype=np.int64)
    # exact-integer textbook formula: G = (2*sum(i*d_i) - (n+1)*T) / (n*T),
    # half-up micro rounding — the same arithmetic the query promises
    s = int((ranks * d).sum())
    t = int(d.sum())
    gn, gd = 2 * s - (n + 1) * t, n * t
    expect_micro = (2_000_000 * gn + gd) // (2 * gd)
    row = q_degree_gini(spark, SF_DIR).first()
    assert row["n_vertices"] == n
    assert row["sum_deg"] == t
    assert row["gini_micro"] == expect_micro
    assert 0 <= row["gini_micro"] <= 1_000_000


def test_split_ks_matches_numpy(spark):
    """Exact integer KS == numpy ECDF max-gap on the same split."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    rows = con.execute(
        "SELECT CAST(('0x' || substr(md5(concat_ws(':', 'split', "
        "CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 100 AS b, "
        "len(string_split(lower(trim(text)), ' ')) AS x FROM documents"
    ).fetchall()
    train = np.sort(np.array([x for b, x in rows if b >= 20], dtype=np.int64))
    val = np.sort(
        np.array([x for b, x in rows if 10 <= b < 20], dtype=np.int64)
    )
    xs = np.unique(np.concatenate([train, val]))
    nt, nv = len(train), len(val)
    ct = np.searchsorted(train, xs, side="right").astype(np.int64)
    cv = np.searchsorted(val, xs, side="right").astype(np.int64)
    # exact-integer ECDF gap: |F_t - F_v| = |ct*nv - cv*nt| / (nt*nv)
    num = np.abs(ct * nv - cv * nt)
    ksn = int(num.max())
    expect_micro = (2_000_000 * ksn + nt * nv) // (2 * nt * nv)
    row = split_ks(spark, SF_DIR).first()
    assert row["n_train"] == nt
    assert row["n_val"] == nv
    assert row["ks_micro"] == expect_micro
    # the reported location is the SMALLEST x achieving the max gap
    assert row["ks_at"] == int(xs[np.argmax(num)])


@pytest.fixture(scope="module")
def user_streams(spark):
    """Per-user event streams ordered by (epoch_us, event_id)."""
    import datetime as dt

    rows = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", "event_id", "event_type", "ts"
    ).collect()
    per_user = defaultdict(list)
    for r in rows:
        us = int(
            r["ts"].replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
        )
        per_user[r["user_id"]].append((us, r["event_id"], r["event_type"]))
    for evs in per_user.values():
        evs.sort()
    return per_user


def test_tool_runs_matches_pure_python(spark, user_streams):
    """Run-length encoding of consecutive identical event types."""
    stats = defaultdict(lambda: [0, 0, 0])  # type -> [n_runs, total, max]
    for evs in user_streams.values():
        i = 0
        while i < len(evs):
            j = i
            while j < len(evs) and evs[j][2] == evs[i][2]:
                j += 1
            s = stats[evs[i][2]]
            s[0] += 1
            s[1] += j - i
            s[2] = max(s[2], j - i)
            i = j
    got = {r["event_type"]: r for r in q_tool_runs(spark, SF_DIR).collect()}
    assert set(got) == set(stats)
    for t, (n, tot, mx) in stats.items():
        assert got[t]["n_runs"] == n
        assert got[t]["total_len"] == tot
        assert got[t]["max_run"] == mx
        assert got[t]["mean_run_micro"] == (2_000_000 * tot + n) // (2 * n)


def test_cohort_retention_matches_pure_python(spark, user_streams):
    """Distinct active users per (first-event floor-week, week offset)."""
    cells = Counter()
    for u, evs in user_streams.items():
        weeks = sorted({us // 1_000_000 // 604800 for us, _, _ in evs})
        for w in weeks:
            cells[(weeks[0], w - weeks[0])] += 1
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in q_cohort_retention(spark, SF_DIR).collect()
    }
    assert got == dict(cells)
    # offset-0 cell of each cohort counts the whole cohort
    cohort_sizes = Counter(
        min(us // 1_000_000 // 604800 for us, _, _ in evs)
        for evs in user_streams.values()
    )
    for cw, size in cohort_sizes.items():
        assert got[(cw, 0)] == size


def test_active_users_matches_pure_python(spark, user_streams):
    """Exact DAU/WAU/MAU rolling distinct counts per epoch day."""
    from linkgraph.relational import _MAU_DAYS, _WAU_DAYS, q_active_users

    ud = set()
    for u, evs in user_streams.items():
        for us, _, _ in evs:
            ud.add((u, us // 1_000_000 // 86400))
    days = sorted({d for _, d in ud})
    got = {r["day"]: r for r in q_active_users(spark, SF_DIR).collect()}
    assert sorted(got) == days
    for day in days:
        dau = {u for u, d in ud if d == day}
        wau = {u for u, d in ud if day - _WAU_DAYS < d <= day}
        mau = {u for u, d in ud if day - _MAU_DAYS < d <= day}
        r = got[day]
        assert (r["dau"], r["wau"], r["mau"]) == (len(dau), len(wau), len(mau))
        assert r["stickiness_micro"] == (
            2_000_000 * len(dau) + len(mau)
        ) // (2 * len(mau))
