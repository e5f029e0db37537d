"""textops (BPE induction / skip-gram PMI / posting compression /
Kaplan-Meier) vs pure-python single-node references, at sf0.001."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from linkgraph.textops import _BPE_ROUNDS, q_bpe_merges

SF_DIR = "/root/testdata/sf0.001"


def _ref_bpe(word_freq: dict[str, int], rounds: int):
    """Sequential reference BPE trainer (greedy left-to-right merge
    application, lexicographic tiebreak on the winning pair)."""
    types = {w: list(w) for w in word_freq}
    merges = []
    for _ in range(rounds):
        pc: Counter = Counter()
        for w, syms in types.items():
            n = word_freq[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += n
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        for w, syms in types.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            types[w] = out
    return merges


def test_bpe_merges_match_sequential_reference(spark):
    rows = q_bpe_merges(spark, SF_DIR).orderBy("round").collect()
    assert len(rows) == _BPE_ROUNDS

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    wf: Counter = Counter()
    for r in docs:
        for w in r["text"].strip().lower().split(" "):
            if w:
                wf[w] += 1
    ref = _ref_bpe(dict(wf), _BPE_ROUNDS)

    got = [(r["lhs"], r["rhs"], r["pair_n"]) for r in rows]
    assert got == ref


def test_skipgram_pmi_matches_reference(spark):
    import math

    from linkgraph.textops import _PMI_TOPK, _PMI_WINDOW, q_skipgram_pmi

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    unig: Counter = Counter()
    pc: Counter = Counter()
    for r in docs:
        ws = r["text"].strip().lower().split(" ")
        unig.update(ws)
        for i, w1 in enumerate(ws):
            for j in range(i + 1, min(i + _PMI_WINDOW, len(ws) - 1) + 1):
                pc[(min(w1, ws[j]), max(w1, ws[j]))] += 1
    T = sum(unig.values())
    D = sum(pc.values())
    ref = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:_PMI_TOPK]

    rows = q_skipgram_pmi(spark, SF_DIR).orderBy(
        F.desc("n_pair"), "a", "b"
    ).collect()
    assert [((r["a"], r["b"]), r["n_pair"]) for r in rows] == ref
    for r in rows:
        a, b, n = r["a"], r["b"], r["n_pair"]
        want = math.log2(n * T * T / (D * unig[a] * unig[b]))
        assert abs(r["pmi"] - want) < 1e-5


def test_posting_compression_matches_reference(spark):
    from linkgraph.textops import _POSTING_TOPK, q_posting_compression

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    postings: dict[str, set[int]] = {}
    for r in docs:
        for w in r["text"].strip().lower().split(" "):
            postings.setdefault(w, set()).add(r["doc_id"])

    def vlen(g: int) -> int:
        n = 1
        while g >= 128:
            g >>= 7
            n += 1
        return n

    ref = {}
    for w, ids in postings.items():
        s = sorted(ids)
        gaps = [s[0] + 1] + [b - a for a, b in zip(s, s[1:])]
        ref[w] = (len(s), 8 * len(s), sum(vlen(g) for g in gaps))

    rows = q_posting_compression(spark, SF_DIR).collect()
    assert len(rows) == min(_POSTING_TOPK, len(postings))
    want_order = sorted(ref.items(), key=lambda kv: (-kv[1][0], kv[0]))
    for r, (w, (df, raw, var)) in zip(rows, want_order):
        assert (r["word"], r["df"], r["raw_bytes"], r["varint_bytes"]) == (
            w, df, raw, var,
        )
        assert abs(r["savings"] - (1 - var / raw)) < 1e-9


def test_km_survival_matches_reference(spark):
    from linkgraph.textops import _KM_GAP_US, q_km_survival

    evs = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_user: dict[int, list[int]] = {}
    max_us = 0
    from datetime import timezone

    for r in evs:
        ts = r["ts"].replace(tzinfo=timezone.utc)
        us = int(round(ts.timestamp() * 1_000_000))
        by_user.setdefault(r["user_id"], []).append(us)
        max_us = max(max_us, us)

    durs: list[tuple[int, bool]] = []  # (t_minutes, censored)
    for times in by_user.values():
        times.sort()
        start = prev = times[0]
        for u in times[1:]:
            if u - prev > _KM_GAP_US:
                durs.append(((prev - start) // 60_000_000, False))
                start = u
            prev = u
        durs.append(
            ((prev - start) // 60_000_000, prev > max_us - _KM_GAP_US)
        )

    # product-limit over ascending event times
    from collections import defaultdict

    d_t: dict[int, int] = defaultdict(int)
    c_t: dict[int, int] = defaultdict(int)
    for t, cen in durs:
        (c_t if cen else d_t)[t] += 1
    n_risk = len(durs)
    s = 1.0
    ref = []
    for t in sorted(set(d_t) | set(c_t)):
        if d_t[t] > 0:
            s *= 1.0 - d_t[t] / n_risk if d_t[t] < n_risk else 0.0
            ref.append((t, n_risk, d_t[t], c_t[t], s))
        n_risk -= d_t[t] + c_t[t]

    rows = q_km_survival(spark, SF_DIR).orderBy("t").collect()
    assert [
        (r["t"], r["n_risk"], r["d_events"], r["c_censored"]) for r in rows
    ] == [x[:4] for x in ref]
    for r, x in zip(rows, ref):
        assert abs(r["survival"] - x[4]) < 1e-5


def test_bpe_greedy_nonoverlap_convention(spark):
    """'aaaa' with merge (a,a) must become [aa, aa], the BPE greedy
    left-to-right convention — not [aa, a, a] (string-replace drift)
    nor [aa, aa] skipped."""
    from pyspark.sql import functions as F

    from linkgraph.textops import _apply_merge

    cur = spark.createDataFrame(
        [("aaaa", 1)], "word string, n long"
    ).select("word", "n", F.split("word", "").alias("s"))
    top = spark.createDataFrame(
        [("a", "a", 3)], "ma string, mb string, mn long"
    )
    out = _apply_merge(cur, top).collect()[0]["s"]
    assert out == ["aa", "aa"]
