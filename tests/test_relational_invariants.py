"""Semantic invariants for relational rows whose value-correctness lives in
the driver's DuckDB gate — these pin the properties a hash compare can't
express (conservation, gap bounds, packing of sessions).
"""

import numpy as np
import pandas as pd
import pytest

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


def test_funnel_matches_python(spark):
    """Ordered funnel vs a from-scratch per-user replication: stage entry
    requires a strictly later event than the previous stage's entry."""
    from linkgraph.relational import _FUNNEL, q_funnel

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet").toPandas()
    entry = {}
    stage_users = []
    cur = {}
    for i, stage in enumerate(_FUNNEL):
        nxt = {}
        sub = ev[ev.event_type == stage]
        for r in sub.itertuples():
            if i == 0:
                t = nxt.get(r.user_id)
                nxt[r.user_id] = min(t, r.ts) if t is not None else r.ts
            else:
                t_prev = cur.get(r.user_id)
                if t_prev is not None and r.ts > t_prev:
                    t = nxt.get(r.user_id)
                    nxt[r.user_id] = min(t, r.ts) if t is not None else r.ts
        stage_users.append(len(nxt))
        cur = nxt
    got = {
        r["stage"]: r["n_users"] for r in q_funnel(spark, sf).collect()
    }
    assert [got[s] for s in _FUNNEL] == stage_users
    assert stage_users[0] >= stage_users[1] >= stage_users[2]
    assert stage_users[2] > 0  # the fixture must exercise the full funnel


def test_rate_anomaly_matches_python(spark):
    """Trailing z-score vs a from-scratch replication over hourly counts;
    the baseline frame must be strictly historical (no self-inclusion)."""
    import statistics as st
    from collections import Counter, defaultdict

    from linkgraph.relational import _ANOM_BASELINE, _ANOM_Z, q_rate_anomaly

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet").toPandas()
    counts = Counter(
        (r.event_type, r.ts.floor("h")) for r in ev.itertuples()
    )
    by_type = defaultdict(list)
    for (et, hour), n in sorted(counts.items()):
        by_type[et].append((hour, n))
    exp = {}
    for et, rows in by_type.items():
        for i, (hour, n) in enumerate(rows):
            frame = [x for _, x in rows[max(0, i - _ANOM_BASELINE) : i]]
            if len(frame) < 2:
                continue
            sd = st.stdev(frame)
            if sd > 0:
                z = round((n - st.mean(frame)) / sd, 6) + 0.0
                if abs(z) >= _ANOM_Z:
                    exp[(et, hour)] = (n, z)
    got = {
        (r["event_type"], r["hour"]): (r["n"], r["z"])
        for r in q_rate_anomaly(spark, sf).collect()
    }
    assert set(got) == set(exp)
    for k, (n, z) in exp.items():
        assert got[k][0] == n
        assert abs(got[k][1] - z) < 2e-6, k
    assert exp, "fixture produced zero anomalies — threshold too strict"


def test_scd2_interval_invariants(spark):
    """SCD2 fold: per key the validity intervals must tile (each version
    closes exactly at its successor's start), exactly one current row per
    key, and updated keys carry exactly two versions."""
    from collections import defaultdict

    from linkgraph.relational import _SCD2_MOD, q_scd2

    sf = "/root/testdata/sf0.001"
    rows = q_scd2(spark, sf).collect()
    by_key = defaultdict(list)
    for r in rows:
        by_key[r["c_custkey"]].append(r)
    for k, vs in by_key.items():
        vs.sort(key=lambda r: r["valid_from"])
        assert sum(r["is_current"] for r in vs) == 1
        assert vs[-1]["valid_to"] is None and vs[-1]["is_current"] == 1
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to"] == b["valid_from"]  # intervals tile
        exp_versions = 2 if k % _SCD2_MOD == 0 else 1
        assert len(vs) == exp_versions, k
        if exp_versions == 2:
            assert vs[-1]["segment"] == "UPGRADED"


def test_session_paths_matches_python(spark):
    """Session path mining vs a from-scratch sessionize + prefix + count."""
    from collections import Counter, defaultdict

    from linkgraph.relational import (
        _PATH_LEN,
        _PATH_TOPK,
        _SESSION_GAP_S,
        q_session_paths,
    )

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet").toPandas()
    by_user = defaultdict(list)
    for r in ev.itertuples():
        by_user[r.user_id].append((int(r.ts.timestamp() * 1_000_000), r.event_id, r.event_type))
    paths: Counter = Counter()
    for rows in by_user.values():
        rows.sort()
        sess = []
        prev = None
        for us, _eid, et in rows:
            if prev is None or us - prev > _SESSION_GAP_S * 1_000_000:
                if sess:
                    paths[">".join(sess[:_PATH_LEN])] += 1
                sess = []
            sess.append(et)
            prev = us
        if sess:
            paths[">".join(sess[:_PATH_LEN])] += 1
    exp = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:_PATH_TOPK]
    got = [
        (r["path"], r["n_sessions"])
        for r in q_session_paths(spark, sf).orderBy("rank").collect()
    ]
    assert got == exp


def test_bloom_semijoin_matches_python(spark):
    """Bloom pruning vs a from-scratch python Bloom filter: identical pass
    set (so no false negatives by construction), identical FP count."""
    import hashlib

    from linkgraph.relational import (
        _BLOOM_K,
        _BLOOM_M,
        _BLOOM_SEG,
        q_bloom_semijoin,
    )

    sf = "/root/testdata/sf0.001"
    got = q_bloom_semijoin(spark, sf).collect()[0]

    cust = spark.read.parquet(f"{sf}/customer.parquet").toPandas()
    orders = spark.read.parquet(f"{sf}/orders.parquet").toPandas()
    build = set(cust.loc[cust["c_mktsegment"] == _BLOOM_SEG, "c_custkey"])

    def bits_of(k):
        return tuple(
            int(hashlib.md5(f"bloom{j}:{k}".encode()).hexdigest()[:15], 16)
            % _BLOOM_M
            for j in range(_BLOOM_K)
        )

    bitset = {b for k in build for b in bits_of(k)}
    n_member = n_pass = n_fp = 0
    for k in orders["o_custkey"]:
        member = k in build
        passed = all(b in bitset for b in bits_of(int(k)))
        n_member += member
        n_pass += passed
        n_fp += passed and not member
        assert passed or not member  # Bloom admits no false negatives

    assert got["n_probe"] == len(orders)
    assert got["n_member"] == n_member
    assert got["n_bloom_pass"] == n_pass
    assert got["n_false_pos"] == n_fp


def test_kmv_distinct_matches_python(spark):
    """KMV sketch estimate vs a from-scratch python replication, plus the
    exact-count fallback for groups smaller than k."""
    import hashlib

    from linkgraph.relational import _KMV_K, _KMV_SCALE, q_kmv_distinct

    sf = "/root/testdata/sf0.001"
    got = {
        r["event_type"]: (r["n_exact"], r["n_est"], r["rel_err"])
        for r in q_kmv_distinct(spark, sf).collect()
    }
    ev = spark.read.parquet(f"{sf}/events.parquet").toPandas()
    by_type: dict[str, set[int]] = {}
    for r in ev.itertuples():
        by_type.setdefault(r.event_type, set()).add(int(r.user_id))
    for et, users in by_type.items():
        hs = sorted(
            int(hashlib.md5(f"kmv:{u}".encode()).hexdigest()[:15], 16)
            for u in users
        )
        n = len(hs)
        est = (_KMV_K - 1) * _KMV_SCALE / hs[_KMV_K - 1] if n >= _KMV_K else float(n)
        assert got[et][0] == n
        assert got[et][1] == pytest.approx(round(est, 4), abs=1e-3)
        assert got[et][2] == pytest.approx(round((est - n) / n, 6), abs=2e-6)
    assert set(got) == set(by_type)


def test_tool_latency_matches_numpy(spark):
    """Per-tool gap percentiles vs a from-scratch pandas/numpy recompute
    (type-7 interpolation, the definition both engines use)."""
    import numpy as np

    from linkgraph.relational import q_tool_latency

    out = q_tool_latency(spark, SF).toPandas().set_index("event_type")
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    ev["us"] = ev["ts"].astype("int64") // 1000  # ns -> us
    ev["gap"] = ev.groupby("user_id")["us"].diff()
    g = ev.dropna(subset=["gap"])
    for et, grp in g.groupby("event_type"):
        gaps = grp["gap"].to_numpy(dtype=np.float64)
        assert out.loc[et, "n_gaps"] == len(gaps)
        assert out.loc[et, "p50_s"] == pytest.approx(
            float(np.percentile(gaps, 50)) / 1e6, abs=2e-3
        )
        assert out.loc[et, "p95_s"] == pytest.approx(
            float(np.percentile(gaps, 95)) / 1e6, abs=2e-3
        )
        assert out.loc[et, "max_us"] == int(gaps.max())


def test_tool_position_matches_python(spark):
    """Quantized relative positions vs a pandas recompute."""
    import numpy as np

    from linkgraph.relational import q_tool_position

    out = q_tool_position(spark, SF).toPandas().set_index("event_type")
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    ev["rk"] = ev.groupby("user_id").cumcount() + 1
    ev["n"] = ev.groupby("user_id")["rk"].transform("max")
    ev["posq"] = (ev["rk"] * 1_000_000) // ev["n"]
    for et, grp in ev.groupby("event_type"):
        q = grp["posq"].to_numpy(dtype=np.float64)
        assert out.loc[et, "n_events"] == len(q)
        assert out.loc[et, "mean_relpos"] == pytest.approx(
            round(float(q.mean()) / 1e6, 6), abs=1e-6
        )
        assert out.loc[et, "p50_relpos"] == pytest.approx(
            float(np.percentile(q, 50)) / 1e6, abs=2e-6
        )
    # relative positions live in (0, 1]
    assert (out["mean_relpos"] > 0).all() and (out["mean_relpos"] <= 1).all()


def test_basket_lift_matches_python(spark):
    """Top-20 lift pairs == a from-scratch itertools/Counter reference."""
    from collections import Counter
    from itertools import combinations

    from linkgraph.io import load_table
    from linkgraph.relational import (
        _BASKET_MIN_PAIR,
        _BASKET_TOPK,
        q_basket_lift,
    )

    sf = "/root/testdata/sf0.001"
    li = (
        load_table(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    baskets: dict[int, set] = {}
    for r in li:
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    n_orders = len(baskets)
    per_part: Counter = Counter()
    pair_cnt: Counter = Counter()
    for parts in baskets.values():
        per_part.update(parts)
        pair_cnt.update(combinations(sorted(parts), 2))

    import math

    rows = []
    for (a, b), n_ab in pair_cnt.items():
        if n_ab < _BASKET_MIN_PAIR:
            continue
        lift_micro = math.floor(
            1_000_000 * n_ab * n_orders / (per_part[a] * per_part[b])
        )
        rows.append((lift_micro, a, b, n_ab, per_part[a], per_part[b]))
    rows.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = [
        (a, b, n_ab, na, nb, n_orders, lm)
        for lm, a, b, n_ab, na, nb in rows[:_BASKET_TOPK]
    ]

    got = [
        (
            r["part_a"], r["part_b"], r["n_ab"], r["n_a"], r["n_b"],
            r["n_orders"], r["lift_micro"],
        )
        for r in q_basket_lift(spark, sf).collect()
    ]
    assert got == want


def test_rfm_scores_quintiles(spark):
    """RFM invariants: quintiles are balanced the ANSI-ntile way, scores
    are monotone in their metric, and the segment string recombines the
    three scores."""
    from linkgraph.relational import q_rfm_scores

    out = q_rfm_scores(spark, "/root/testdata/sf0.001").toPandas()
    n = len(out)
    base, extra = divmod(n, 5)
    for col, metric, asc in (
        ("r_q", "recency_days", True),
        ("f_q", "frequency", False),
        ("m_q", "monetary_cents", False),
    ):
        sizes = out[col].value_counts().to_dict()
        assert set(sizes) == set(range(1, 6))
        # first (n mod 5) buckets get the extra row (ANSI ntile)
        assert all(
            sizes[q] == base + (1 if q <= extra else 0) for q in range(1, 6)
        )
        # monotone: a strictly better metric value never lands in a
        # strictly worse quintile
        s = out.sort_values([metric, "custkey"], ascending=[asc, True])
        assert (np.diff(s[col].to_numpy()) >= 0).all()
    assert (
        out["rfm"]
        == out["r_q"].astype(str) + out["f_q"].astype(str) + out["m_q"].astype(str)
    ).all()


def test_decayed_activity_matches_python(spark):
    """Exact integer-micro decay sums == a from-scratch python replay."""
    import math

    from linkgraph.io import load_table
    from linkgraph.relational import _DECAY_HALFLIFE_D, q_decayed_activity

    ev = (
        load_table(spark, SF, "events").select("user_id", "ts").collect()
    )
    ref = max(r["ts"].date() for r in ev)
    per_user: dict[int, list[int]] = {}
    for r in ev:
        per_user.setdefault(r["user_id"], []).append(
            (ref - r["ts"].date()).days
        )
    want = {
        u: (
            len(ages),
            min(ages),
            sum(
                math.floor(1_000_000 * 2.0 ** (-a / _DECAY_HALFLIFE_D))
                for a in ages
            ),
        )
        for u, ages in per_user.items()
    }
    got = {
        r["user_id"]: (r["n_events"], r["last_age_days"], r["score_micro"])
        for r in q_decayed_activity(spark, SF).collect()
    }
    assert got == want


def test_order_backlog_sweep_invariants(spark):
    """Sweep conservation: deltas sum to zero, n_open is the prefix sum,
    never negative, and the peak matches a brute-force interval count."""
    from linkgraph.io import load_table
    from linkgraph.relational import q_order_backlog

    out = q_order_backlog(spark, SF).toPandas()
    assert int(out["delta"].sum()) == 0
    assert (out["n_open"] >= 0).all()
    assert (out["delta"].cumsum() == out["n_open"]).all()

    o = {
        r["o_orderkey"]: r["o_orderdate"].date()
        for r in load_table(spark, SF, "orders").collect()
    }
    ends: dict[int, object] = {}
    for r in (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .collect()
    ):
        d = r["l_shipdate"].date()
        k = r["l_orderkey"]
        if k not in ends or d > ends[k]:
            ends[k] = d
    ivs = [(o[k], max(ends[k], o[k])) for k in ends if k in o]

    import datetime

    peak_row = out.loc[out["n_open"].idxmax()]
    peak_day = datetime.date.fromisoformat(peak_row["day"])
    brute = sum(1 for s, e in ivs if s <= peak_day <= e)
    assert brute == peak_row["n_open"]


def test_zorder_layout_pruning_win(spark):
    """Morton-key audit: z-keys round-trip the bit interleave, touched
    flags match a python replay, and the z-layout opens no more files
    than the 1-D layout (the pruning win Z-ORDER exists for)."""
    from linkgraph.io import load_table
    from linkgraph.relational import _Z_BITS, _Z_BOX, q_zorder_layout

    out = q_zorder_layout(spark, SF).toPandas()

    def morton(x, y):
        z = 0
        for i in range(_Z_BITS):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    lo_c, hi_c, lo_m, hi_m = _Z_BOX
    cells: dict[int, list] = {}
    for r in load_table(spark, SF, "orders").select(
        "o_custkey", "o_orderdate"
    ).collect():
        cb = r["o_custkey"] % 16
        mb = (r["o_orderdate"].month - 1) % 16
        cells.setdefault(morton(cb, mb), []).append((cb, mb))
    want = {
        z: (
            len(v),
            int(any(lo_c <= cb <= hi_c and lo_m <= mb <= hi_m for cb, mb in v)),
            int(any(lo_c <= cb <= hi_c for cb, _mb in v)),
        )
        for z, v in cells.items()
    }
    got = {
        r["zkey"]: (r["n_rows"], r["z_touched"], r["d1_touched"])
        for _i, r in out.iterrows()
    }
    assert got == want
    assert out["z_touched"].sum() <= out["d1_touched"].sum()
    # the box is a strict 2-D restriction, so with data in every month
    # bucket the z layout must be strictly better here
    assert out["z_touched"].sum() < out["d1_touched"].sum()


def test_last_touch_attribution_matches_python(spark):
    """Carry-forward attribution == a per-user python replay; every
    purchase is attributed exactly once."""
    import math

    from linkgraph.io import load_table
    from linkgraph.relational import (
        _CONV_TYPE,
        _TOUCH_TYPES,
        q_last_touch_attribution,
    )

    ev = (
        load_table(spark, SF, "events")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect()
    )
    streams: dict[int, list] = {}
    for r in ev:
        streams.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"], r["value"])
        )
    want: dict[str, list] = {}
    n_purch = 0
    for _u, s in streams.items():
        s.sort(key=lambda t: (t[0], t[1]))
        last = None
        for _ts, _id, typ, val in s:
            if typ in _TOUCH_TYPES:
                last = typ
            if typ == _CONV_TYPE:
                n_purch += 1
                ch = last or "direct"
                want.setdefault(ch, [0, 0])
                want[ch][0] += 1
                want[ch][1] += math.floor(val * 100)

    got = {
        r["channel"]: [r["n_conversions"], r["revenue_cents"]]
        for r in q_last_touch_attribution(spark, SF).collect()
    }
    assert got == want
    assert sum(v[0] for v in got.values()) == n_purch


def test_cusum_changepoint_matches_python(spark):
    from linkgraph.relational import q_cusum_changepoint

    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["day"] = ev["ts"].dt.floor("D")
    want = {}
    for typ, grp in ev.groupby("event_type"):
        daily = grp.groupby("day").size().sort_index()
        xs = daily.to_numpy()
        days = daily.index
        n = len(xs)
        total = int(xs.sum())
        best = None
        s = 0
        for t in range(1, n):  # t < n
            s += int(xs[t - 1])
            d = abs(n * s - t * total)
            if best is None or d > best[0]:
                best = (d, t, s)
        d, t, s = best
        epoch = int((days[t - 1] - pd.Timestamp("1970-01-01")).days)
        want[typ] = (
            epoch, d, n,
            (s * 1_000_000) // t,
            ((total - s) * 1_000_000) // (n - t),
        )

    got = {
        r["event_type"]: (
            r["cp_epoch_day"], r["d_stat"], r["n_days"],
            r["pre_micro"], r["post_micro"],
        )
        for r in q_cusum_changepoint(spark, SF).collect()
    }
    assert got == want


def test_benford_audit_matches_python(spark):
    from linkgraph.relational import _BENFORD_MICRO, q_benford_audit

    o = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    digits = o["o_totalprice"].apply(lambda x: int(str(int(np.floor(x)))[0]))
    cnt = digits.value_counts().to_dict()
    nn = len(o)
    got = {r["digit"]: r for r in q_benford_audit(spark, SF).collect()}
    assert set(got) == set(cnt)
    for d, n in cnt.items():
        r = got[d]
        assert r["n"] == n
        assert r["p_micro"] == _BENFORD_MICRO[d]
        assert r["dev_micro"] == abs(n * 1_000_000 - nn * _BENFORD_MICRO[d])
    # Benford shares sum to ~1 (within rounding of the 9 micro constants)
    assert abs(sum(_BENFORD_MICRO.values()) - 1_000_000) <= 5


def test_table_profile_matches_pandas(spark):
    from linkgraph.relational import _PROFILE_COLS, q_table_profile

    o = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    got = {r["col_name"]: r for r in q_table_profile(spark, SF).collect()}
    assert set(got) == set(_PROFILE_COLS)
    for c in _PROFILE_COLS:
        r = got[c]
        assert r["n_rows"] == len(o)
        assert r["n_null"] == int(o[c].isna().sum())
        assert r["n_distinct"] == o[c].nunique()
        assert r["min_s"] == str(o[c].min())
        assert r["max_s"] == str(o[c].max())


def test_sft_pairs_matches_python(spark):
    from linkgraph.relational import _SFT_CTX_BUDGET, _SFT_RESP_TYPE, q_sft_pairs

    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    want = {}
    for _uid, grp in ev.groupby("user_id"):
        cum = 0
        for t, (_, r) in enumerate(grp.iterrows(), start=1):
            tok = 1 + len(r["props"]) // 4
            if r["event_type"] == _SFT_RESP_TYPE and t > 1:
                want[r["event_id"]] = (
                    t, t - 1, cum, tok,
                    min(cum, _SFT_CTX_BUDGET), int(cum <= _SFT_CTX_BUDGET),
                )
            cum += tok

    got = {
        r["event_id"]: (
            r["turn_idx"], r["ctx_turns"], r["ctx_tokens"], r["resp_tokens"],
            r["trunc_ctx_tokens"], r["fits"],
        )
        for r in q_sft_pairs(spark, SF).collect()
    }
    assert got == want
    # every pair keeps a positive context and trunc never exceeds budget
    assert all(v[2] > 0 and v[4] <= _SFT_CTX_BUDGET for v in got.values())


def _md5i(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_spatial_nn_join_matches_python(spark):
    from linkgraph.relational import _GEO_CELL, _GEO_SCALE, q_spatial_nn_join

    cust = spark.read.parquet(f"{SF}/customer.parquet").toPandas()
    supp = spark.read.parquet(f"{SF}/supplier.parquet").toPandas()
    spts = [
        (
            int(k),
            _md5i(f"sx:{k}") % _GEO_SCALE,
            _md5i(f"sy:{k}") % _GEO_SCALE,
        )
        for k in supp["s_suppkey"]
    ]
    by_cell: dict[tuple, list] = {}
    for k, sx, sy in spts:
        by_cell.setdefault((sx // _GEO_CELL, sy // _GEO_CELL), []).append((k, sx, sy))

    want = {}
    for ck in cust["c_custkey"]:
        x = _md5i(f"sx:{ck}") % _GEO_SCALE
        y = _md5i(f"sy:{ck}") % _GEO_SCALE
        cx, cy = x // _GEO_CELL, y // _GEO_CELL
        cands = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cands += by_cell.get((cx + dx, cy + dy), [])
        if not cands:
            continue
        best = min(cands, key=lambda s: ((x - s[1]) ** 2 + (y - s[2]) ** 2, s[0]))
        want[int(ck)] = (best[0], (x - best[1]) ** 2 + (y - best[2]) ** 2)

    got = {
        r["c_custkey"]: (r["s_suppkey"], r["d2"])
        for r in q_spatial_nn_join(spark, SF).collect()
    }
    assert got == want


def test_k_anonymity_matches_pandas(spark):
    from linkgraph.relational import _KANON_K, q_k_anonymity

    c = spark.read.parquet(f"{SF}/customer.parquet").toPandas()
    sizes = c.groupby(["c_nationkey", "c_mktsegment"]).size()
    got = {
        (r["c_nationkey"], r["c_mktsegment"]): (r["n"], r["safe"])
        for r in q_k_anonymity(spark, SF).collect()
    }
    assert set(got) == set(sizes.index)
    for key, n in sizes.items():
        assert got[key] == (n, int(n >= _KANON_K))


def test_skyline_parts_matches_bruteforce(spark):
    from linkgraph.relational import q_skyline_parts

    p = spark.read.parquet(f"{SF}/part.parquet").toPandas()
    pts = [
        (int(r["p_partkey"]), int(r["p_size"]), round(r["p_retailprice"] * 100))
        for _, r in p.iterrows()
    ]
    def dominated(a):
        return any(
            b[1] >= a[1] and b[2] >= a[2] and (b[1] > a[1] or b[2] > a[2])
            for b in pts
            if b[0] != a[0]
        )
    want = {(k, s, c) for (k, s, c) in pts if not dominated((k, s, c))}
    got = {
        (r["p_partkey"], r["p_size"], r["cents"])
        for r in q_skyline_parts(spark, SF).collect()
    }
    assert got == want


def test_winsorize_stats_matches_numpy(spark):
    from linkgraph.relational import _WINSOR_PCT, q_winsorize_stats

    o = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    cents = np.round(o["o_totalprice"].to_numpy() * 100).astype(np.int64)
    n = len(cents)
    k = max(1, n // _WINSOR_PCT)
    srt = np.sort(cents)
    lo, hi = int(srt[k - 1]), int(srt[n - k])
    r = q_winsorize_stats(spark, SF).collect()[0]
    assert (r["n"], r["k"], r["lo_cents"], r["hi_cents"]) == (n, k, lo, hi)
    assert r["sum_cents"] == int(cents.sum())
    assert r["winsor_sum_cents"] == int(np.clip(cents, lo, hi).sum())
    assert r["n_clip_lo"] == int((cents < lo).sum())
    assert r["n_clip_hi"] == int((cents > hi).sum())
    # clipping can only move the sum toward the cuts, never past them
    assert n * lo <= r["winsor_sum_cents"] <= n * hi


def _trunc_div(a: int, b: int) -> int:
    # Spark DIV / DuckDB // truncate toward zero (unlike python //)
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_fk_integrity_matches_pandas(spark):
    from linkgraph.relational import _FK_RELATIONS, q_fk_integrity

    got = {r["relation"]: r for r in q_fk_integrity(spark, SF).collect()}
    assert set(got) == {name for name, *_ in _FK_RELATIONS}
    for name, child, ck, parent, pk in _FK_RELATIONS:
        c = spark.read.parquet(f"{SF}/{child}.parquet").toPandas()[ck]
        p = spark.read.parquet(f"{SF}/{parent}.parquet").toPandas()[pk]
        r = got[name]
        assert r["n_child"] == len(c)
        assert r["n_parents"] == len(p)
        assert r["n_orphans"] == int((~c.isin(set(p))).sum())
        assert r["n_childless"] == int((~p.isin(set(c))).sum())
    # the synthetic star schema is orphan-free by construction
    assert all(r["n_orphans"] == 0 for r in got.values())


def test_theil_sen_trend_matches_python(spark):
    from linkgraph.relational import q_theil_sen_trend

    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["t"] = (ev["ts"].dt.floor("D") - pd.Timestamp("1970-01-01")).dt.days
    want = {}
    for typ, grp in ev.groupby("event_type"):
        daily = sorted(grp.groupby("t").size().items())
        slopes = sorted(
            _trunc_div((y2 - y1) * 1_000_000, t2 - t1)
            for i, (t1, y1) in enumerate(daily)
            for (t2, y2) in daily[i + 1 :]
        )
        n = len(slopes)
        want[typ] = (n, slopes[(n + 1) // 2 - 1])

    got = {
        r["event_type"]: (r["n_pairs"], r["slope_micro_med"])
        for r in q_theil_sen_trend(spark, SF).collect()
    }
    assert got == want


def test_auc_mann_whitney_matches_scipy_style(spark):
    from linkgraph.relational import _AUC_POS_TYPE, q_auc_mann_whitney

    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    score = np.round(ev["value"].to_numpy() * 1_000_000).astype(np.int64)
    pos = (ev["event_type"] == _AUC_POS_TYPE).to_numpy()
    # float reference AUC via average ranks (pandas implements midranks)
    ranks = pd.Series(score).rank(method="average").to_numpy()
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    u = ranks[pos].sum() - n_pos * (n_pos + 1) / 2
    auc = u / (n_pos * n_neg)

    r = q_auc_mann_whitney(spark, SF).collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (n_pos, n_neg)
    assert r["u2"] == int(round(2 * u))
    assert r["auc_micro"] == (r["u2"] * 1_000_000) // (2 * n_pos * n_neg)
    assert abs(r["auc_micro"] / 1e6 - auc) < 1e-5


def test_calibration_bins_matches_python(spark):
    from linkgraph.relational import _AUC_POS_TYPE, _CAL_BINS, q_calibration_bins

    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    score = np.round(ev["value"].to_numpy() * 1_000_000).astype(np.int64)
    pos = (ev["event_type"] == _AUC_POS_TYPE).to_numpy().astype(np.int64)
    mn, mx = int(score.min()), int(score.max())
    bins = (score - mn) * _CAL_BINS // (mx - mn + 1)
    got = {r["bin"]: r for r in q_calibration_bins(spark, SF).collect()}
    for b in np.unique(bins):
        m = bins == b
        r = got[int(b)]
        assert r["n"] == int(m.sum())
        assert r["n_pos"] == int(pos[m].sum())
        assert r["pos_rate_micro"] == (int(pos[m].sum()) * 1_000_000) // int(m.sum())
        assert r["mean_score_micro"] == int(score[m].sum()) // int(m.sum())
    assert sum(r["n"] for r in got.values()) == len(ev)


def test_chi2_independence_matches_python(spark):
    from linkgraph.relational import q_chi2_independence

    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    # Spark dayofweek: Sunday=1..Saturday=7
    dow = ev["ts"].dt.dayofweek.to_numpy()  # pandas: Monday=0..Sunday=6
    dow = (dow + 1) % 7 + 1
    ct = pd.crosstab(ev["event_type"], dow)
    n = int(ct.to_numpy().sum())
    rt = ct.sum(axis=1)
    cs = ct.sum(axis=0)
    chi2_micro = 0
    chi2_float = 0.0
    for t in ct.index:
        for d in ct.columns:
            o, r, c = int(ct.loc[t, d]), int(rt[t]), int(cs[d])
            diff = n * o - r * c
            chi2_micro += (diff * diff * 1_000_000) // (n * r * c)
            e = r * c / n
            chi2_float += (o - e) ** 2 / e

    got = q_chi2_independence(spark, SF).collect()[0]
    assert got["n"] == n
    assert got["n_types"] == ct.shape[0]
    assert got["n_dows"] == ct.shape[1]
    assert got["dof"] == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert got["chi2_micro"] == chi2_micro
    # quantization error is at most one micro-unit per cell
    assert abs(got["chi2_micro"] / 1e6 - chi2_float) < ct.size / 1e6 + 1e-6


def test_poisson_bootstrap_matches_python(spark):
    import hashlib

    from linkgraph.relational import (
        _BOOT_B,
        _POIS_CDF_MICRO,
        q_poisson_bootstrap,
    )

    od = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    cents = np.round(od["o_totalprice"].to_numpy() * 100).astype(np.int64)
    keys = od["o_orderkey"].to_numpy()

    def w_of(b, k):
        u = int(hashlib.md5(f"boot:{b}:{k}".encode()).hexdigest()[:15], 16) % 1_000_000
        for w, t in enumerate(_POIS_CDF_MICRO):
            if u < t:
                return w
        return len(_POIS_CDF_MICRO)

    means = []
    for b in range(_BOOT_B):
        ws = np.array([w_of(b, int(k)) for k in keys], dtype=np.int64)
        means.append((int((ws * cents).sum()) * 1_000_000) // int(ws.sum()))
    means.sort()
    klo = max(1, _BOOT_B * 5 // 100)

    r = q_poisson_bootstrap(spark, SF).collect()[0]
    assert r["b_reps"] == _BOOT_B
    assert r["n_rows"] == len(od)
    assert r["point_mean_micro"] == (int(cents.sum()) * 1_000_000) // len(od)
    assert r["lo_micro"] == means[klo - 1]
    assert r["med_micro"] == means[(_BOOT_B + 1) // 2 - 1]
    assert r["hi_micro"] == means[_BOOT_B - klo]
    assert r["lo_micro"] <= r["med_micro"] <= r["hi_micro"]


def test_holt_winters_matches_python(spark):
    from linkgraph.relational import _HW_HORIZON, q_holt_winters

    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    days = (ev["ts"].dt.floor("D") - pd.Timestamp("1970-01-01")).dt.days
    daily = sorted(days.groupby(days).size().items())
    Y = [y * 1_000_000 for _, y in daily]
    lv, tr = Y[0], (Y[1] - Y[0]) if len(Y) > 1 else 0
    want = [(1, daily[0][0], daily[0][1], lv, tr)]
    for t in range(1, len(Y)):
        ln = _trunc_div(Y[t] + lv + tr, 2)
        tr = _trunc_div((ln - lv) + 3 * tr, 4)
        lv = ln
        want.append((t + 1, daily[t][0], daily[t][1], lv, tr))
    for h in range(1, _HW_HORIZON + 1):
        want.append((len(Y) + h, daily[-1][0] + h, None, lv + h * tr, tr))

    got = [
        (r["idx"], r["day"], r["y"], r["level_micro"], r["trend_micro"])
        for r in q_holt_winters(spark, SF).orderBy("idx").collect()
    ]
    assert got == want
    # smoothing sanity: levels track the data scale (within min..max micro)
    ys = [y for _, y in daily]
    lo, hi = min(ys) * 1_000_000, max(ys) * 1_000_000
    for _, _, y, lmic, _ in got:
        if y is not None:
            assert lo - (hi - lo) <= lmic <= hi + (hi - lo)


def test_burt_constraint_matches_python(spark):
    from linkgraph.linkpred import _BURT_FP, _BURT_MAX_DEG, q_burt_constraint

    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    ek = []
    for uid, grp in ev.groupby("user_id"):
        types = grp["event_type"].tolist()
        ek += list(zip(types, types[1:]))
        ek += [(f"user:{uid}", t) for t in types]
    vset = {s for s, _ in ek} | {t for _, t in ek}
    uv = {(min(s, t), max(s, t)) for s, t in ek if s != t}
    nbrs = {}
    for u, v in uv:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    deg = {v: len(ns) for v, ns in nbrs.items()}
    want = {}
    for i in vset:
        ns = nbrs.get(i, set())
        con = 0
        for j in ns:
            x = _BURT_FP // deg[i] + sum(
                _BURT_FP // (deg[i] * deg[q])
                for q in ns & nbrs[j]
                if deg[q] <= _BURT_MAX_DEG
            )
            con += (x * x) // _BURT_FP
        want[i] = (len(ns), con)

    got = {
        r["vkey"]: (r["deg"], r["constraint_micro"])
        for r in q_burt_constraint(spark, SF).collect()
    }
    assert got == want
    # a dyad (deg-1 vertex whose sole neighbor caps out) has x = 1e6 →
    # constraint exactly 1e6; and constraints are nonnegative by squares
    assert all(c >= 0 for _, c in got.values())


def test_item_cf_matches_python(spark):
    from itertools import combinations

    from linkgraph.relational import _ITEMCF_MIN_CO, _ITEMCF_TOPK, q_item_cf

    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    baskets = li.groupby("l_orderkey")["l_partkey"].apply(lambda s: set(s))
    n_p, co = {}, {}
    for b in baskets:
        for p in b:
            n_p[p] = n_p.get(p, 0) + 1
        for x, y in combinations(sorted(b), 2):
            co[(x, y)] = co.get((x, y), 0) + 1
    want = {}
    for i in n_p:
        cands = []
        for (x, y), c in co.items():
            if c < _ITEMCF_MIN_CO:
                continue
            if x == i:
                j = y
            elif y == i:
                j = x
            else:
                continue
            cands.append(((c * c * 1_000_000) // (n_p[i] * n_p[j]), j, c))
        cands.sort(key=lambda t: (-t[0], t[1]))
        for rk, (s, j, c) in enumerate(cands[:_ITEMCF_TOPK], 1):
            want[(i, j)] = (c, n_p[i], n_p[j], s, rk)

    got = {
        (r["partkey"], r["rec_partkey"]): (
            r["co"], r["n_i"], r["n_j"], r["cos2_micro"], r["rk"]
        )
        for r in q_item_cf(spark, SF).collect()
    }
    assert got == want


def test_skew_profile_matches_python(spark):
    import hashlib

    from linkgraph.relational import _SKEW_P, q_skew_profile

    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    cnt = li.groupby("l_partkey").size().to_dict()

    def route(k):
        return int(hashlib.md5(f"route:{k}".encode()).hexdigest()[:15], 16) % _SKEW_P

    parts = {}
    for k, c in cnt.items():
        parts.setdefault(route(int(k)), []).append((int(k), int(c)))
    total = sum(cnt.values())
    want = {}
    for p, kcs in parts.items():
        n_rows = sum(c for _, c in kcs)
        top = min(kcs, key=lambda t: (-t[1], t[0]))
        want[p] = (
            n_rows,
            len(kcs),
            (n_rows * _SKEW_P * 1_000_000) // total,
            top[0],
            top[1],
        )

    got = {
        r["part"]: (
            r["n_rows"], r["n_keys"], r["share_micro"],
            r["top_key"], r["top_key_rows"],
        )
        for r in q_skew_profile(spark, SF).collect()
    }
    assert got == want
    assert sum(v[0] for v in got.values()) == len(li)


def test_join_full_outer_three_regions(spark):
    from linkgraph.relational import q_join_full_outer

    out = q_join_full_outer(spark, SF).toPandas()
    c = spark.read.parquet(f"{SF}/customer.parquet").toPandas()
    o = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    mx = int(c["c_custkey"].max())
    lkeys = set(c.loc[c["c_custkey"] * 3 <= mx * 2, "c_custkey"])
    rcnt = o[o["o_custkey"] * 3 >= mx].groupby("o_custkey").size().to_dict()
    assert set(out["custkey"]) == lkeys | set(rcnt)
    got = out.set_index("custkey")
    left_only = both = right_only = 0
    for k in lkeys | set(rcnt):
        r = got.loc[k]
        assert r["has_customer"] == (1 if k in lkeys else 0)
        if k in rcnt:
            assert r["n_orders"] == rcnt[k]
        else:
            assert pd.isna(r["n_orders"])
        left_only += k in lkeys and k not in rcnt
        both += k in lkeys and k in rcnt
        right_only += k not in lkeys and k in rcnt
    # the construction must actually produce all three join regions
    assert left_only > 0 and both > 0 and right_only > 0


def test_bisect_median_matches_numpy(spark):
    from linkgraph.relational import q_bisect_median

    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    cents = np.sort(np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64))
    n = len(cents)
    k = (n + 1) // 2
    r = q_bisect_median(spark, SF).collect()[0]
    assert (r["n"], r["k"]) == (n, k)
    assert r["median_cents"] == int(cents[k - 1])


def test_isotonic_calibration_matches_sequential_pava(spark):
    """The synchronized parallel pooling must land on TRUE PAVA's fixed
    point (classical order-independence of pool-adjacent-violators),
    checked against a from-scratch sequential PAVA with exact fractions."""
    from fractions import Fraction

    from linkgraph.relational import (
        _AUC_POS_TYPE,
        _CAL_BINS,
        q_isotonic_calibration,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    score = np.round(ev["value"].to_numpy() * 1_000_000).astype(np.int64)
    pos = (ev["event_type"] == _AUC_POS_TYPE).to_numpy().astype(np.int64)
    mn, mx = int(score.min()), int(score.max())
    bins = (score - mn) * _CAL_BINS // (mx - mn + 1)
    stats = []
    for b in np.unique(bins):
        m = bins == b
        stats.append([int(b), int(m.sum()), int(pos[m].sum())])

    # sequential PAVA with back-merging (textbook version, exact rationals)
    blocks = [[n, p, [b]] for b, n, p in stats]
    i = 0
    while i < len(blocks) - 1:
        if Fraction(blocks[i][1], blocks[i][0]) > Fraction(
            blocks[i + 1][1], blocks[i + 1][0]
        ):
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            blocks[i][2] += blocks[i + 1][2]
            del blocks[i + 1]
            while i > 0 and Fraction(blocks[i - 1][1], blocks[i - 1][0]) > Fraction(
                blocks[i][1], blocks[i][0]
            ):
                blocks[i - 1][0] += blocks[i][0]
                blocks[i - 1][1] += blocks[i][1]
                blocks[i - 1][2] += blocks[i][2]
                del blocks[i]
                i -= 1
        else:
            i += 1
    want = {}
    for n, p, bs in blocks:
        for b in bs:
            want[b] = (p * 1_000_000) // n

    got = {r["bin"]: r for r in q_isotonic_calibration(spark, SF).collect()}
    assert {b: r["iso_rate_micro"] for b, r in got.items()} == want
    # invariants: monotone fit, conservation of counts, raw rates exact
    seq = [got[b]["iso_rate_micro"] for b in sorted(got)]
    assert seq == sorted(seq)
    for b, n, p in stats:
        assert got[b]["n"] == n and got[b]["n_pos"] == p
        assert got[b]["raw_rate_micro"] == (p * 1_000_000) // n


def test_cuped_adjust_matches_python(spark):
    """Exact-integer CUPED replay from scratch (md5 arms, floor-division
    micro algebra), plus the variance-reduction sanity: the pooled theta
    actually shrinks the between-user variance of the adjusted metric."""
    import hashlib

    from linkgraph.relational import _CUPED_SPLIT_DAY, q_cuped_adjust

    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["day"] = pd.to_datetime(ev["ts"]).dt.day
    per = (
        ev.assign(
            x=(ev["day"] < _CUPED_SPLIT_DAY).astype(int),
            y=(ev["day"] >= _CUPED_SPLIT_DAY).astype(int),
        )
        .groupby("user_id")[["x", "y"]]
        .sum()
    )

    def arm(uid):
        h = int(
            hashlib.md5(f"arm:{uid}".encode()).hexdigest()[:15], 16
        )
        return h % 2

    def fdiv(a, b):
        return (a - (((a % b) + b) % b)) // b

    per["arm"] = [arm(u) for u in per.index]
    gn, gsx, gsy = len(per), int(per.x.sum()), int(per.y.sum())
    sxx = int((per.x * per.x).sum())
    sxy = int((per.x * per.y).sum())
    theta = fdiv(1_000_000 * (gn * sxy - gsx * gsy), gn * sxx - gsx * gsx)

    got = {r["arm"]: r for r in q_cuped_adjust(spark, SF).collect()}
    assert set(got) == {0, 1}
    for a, grp in per.groupby("arm"):
        n, sx, sy = len(grp), int(grp.x.sum()), int(grp.y.sum())
        mean_y = fdiv(1_000_000 * sy, n)
        dx = fdiv(1_000_000 * sx, n) - fdiv(1_000_000 * gsx, gn)
        adj = mean_y - fdiv(theta * dx, 1_000_000)
        r = got[a]
        assert (r["n"], r["sum_x"], r["sum_y"]) == (n, sx, sy)
        assert r["theta_micro"] == theta
        assert r["mean_y_micro"] == mean_y
        assert r["mean_adj_micro"] == adj

    # variance reduction: float CUPED on the same per-user table
    xv = per.x.to_numpy(float)
    yv = per.y.to_numpy(float)
    th = np.cov(xv, yv, bias=True)[0, 1] / np.var(xv)
    adj_vals = yv - th * (xv - xv.mean())
    assert np.var(adj_vals) < np.var(yv)
    assert theta > 0  # periods positively correlate on this fixture


def test_events_autocorr_matches_numpy(spark):
    """Exact-integer ACF == numpy's float ACF on the same daily series
    (micro-rounded), plus the scaling identities."""
    from linkgraph.relational import _ACF_MAX_LAG, q_events_autocorr

    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    days = pd.to_datetime(ev["ts"]).dt.day
    series = days.value_counts().sort_index()
    x = series.to_numpy(np.int64)
    d = series.index.to_numpy(np.int64)
    n, s = len(x), int(x.sum())
    cx = {int(dd): int(n * xx - s) for dd, xx in zip(d, x)}
    den = sum(v * v for v in cx.values())

    got = {r["k"]: r for r in q_events_autocorr(spark, SF).collect()}
    assert set(got) == set(range(1, _ACF_MAX_LAG + 1))
    for k in range(1, _ACF_MAX_LAG + 1):
        num = sum(
            cx[dd] * cx[dd + k] for dd in cx if dd + k in cx
        )
        npairs = sum(1 for dd in cx if dd + k in cx)
        r = got[k]
        assert r["n_pairs"] == npairs
        assert r["num_scaled"] == num
        assert r["den_scaled"] == den
        fl = 1_000_000 * num
        assert r["r_micro"] == (fl - (((fl % den) + den) % den)) // den
        # the micro value is within one rounding step of the exact ratio,
        # and a valid correlation
        assert abs(r["r_micro"] / 1e6 - num / den) < 2e-6
        assert abs(num / den) <= 1.0 + 1e-12
