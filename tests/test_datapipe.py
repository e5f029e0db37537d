"""Invariant tests for the corpus-pipeline ops (datapipe.py §2.13/§2.14).

The cross-engine value oracle is the driver's DuckDB gate; these tests pin
the SEMANTIC invariants that a hash compare alone can't express (packing
bounds, sampling determinism, tf-idf internal consistency).
"""

import numpy as np
import pytest

from linkgraph.datapipe import (
    _PACK_BIN_TOKENS,
    doc_pack_sequences,
    doc_stratified_sample,
    doc_tfidf,
)

SF = "/root/testdata/sf0.001"


def test_pack_sequences_invariants(spark):
    out = doc_pack_sequences(spark, SF).toPandas()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()

    # every doc lands in exactly one (shard, seq) bin
    assert int(out["n_docs"].sum()) == n_docs
    assert out["seq"].min() == 0
    # greedy contiguous packing: a bin holds the docs whose FIRST token
    # falls inside it, so its token sum is < budget + the straddling doc;
    # bound it by budget + the corpus max doc length
    from pyspark.sql import functions as F

    max_doc = docs.select(
        F.max(F.size(F.split(F.lower(F.trim(F.col("text"))), " ")))
    ).collect()[0][0]
    assert (out["sum_tokens"] < _PACK_BIN_TOKENS + max_doc).all()
    # within a shard, seq ids are dense 0..k (cumsum never skips a bin
    # unless a doc longer than the budget spans several — covered above)
    for _shard, grp in out.groupby("shard"):
        seqs = np.sort(grp["seq"].to_numpy())
        assert seqs[0] == 0
        assert (np.diff(seqs) >= 1).all()


def test_stratified_sample_deterministic_and_bounded(spark):
    a = doc_stratified_sample(spark, SF).toPandas().set_index("lang")
    b = doc_stratified_sample(spark, SF).toPandas().set_index("lang")
    # pure function of doc_id -> identical across runs
    assert a.sort_index().equals(b.sort_index())
    assert (a["n_sampled"] <= a["n_total"]).all()
    assert a["n_sampled"].sum() > 0


def test_tfidf_consistency(spark):
    out = doc_tfidf(spark, SF).toPandas()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(out) > 0
    assert (out["df"] <= n_docs).all()
    assert (out["total_tf"] >= out["df"]).all()  # tf >= 1 per contributing doc
    # scores match the formula re-derived locally
    expect = np.round(
        out["total_tf"].to_numpy()
        * np.log((n_docs + 1.0) / (out["df"].to_numpy() + 1.0)),
        6,
    )
    assert np.allclose(out["tfidf"].to_numpy(), expect, atol=1e-9)
    # sorted desc with word tiebreak
    assert (np.diff(out["tfidf"].to_numpy()) <= 1e-12).all()


def test_cluster_pairs_transitive_closure(spark):
    """Planted chain 1~2~3~4 (4 never paired with 1 directly) must collapse
    to canon 1; a separate pair {10,11} stays its own cluster; singletons
    (docs with no near-dup) emit nothing."""
    from linkgraph.datapipe import cluster_pairs

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    got = {
        int(r["doc_id"]): int(r["canon_doc"])
        for r in cluster_pairs(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_contamination_membership_and_recount(spark):
    """Contaminated docs must be test-split members, and each reported
    overlap count must match a from-scratch python recompute of shared
    6-gram sets against the train split."""
    import hashlib

    from linkgraph.datapipe import _CONTAM_N, _TEST_PCT, _VAL_PCT, doc_contamination

    out = doc_contamination(spark, SF).toPandas()
    assert len(out) > 0

    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()

    def bucket(doc_id):
        h = hashlib.md5(f"split:{doc_id}".encode()).hexdigest()[:15]
        return int(h, 16) % 100

    def grams(text):
        w = text.strip().lower().split(" ")
        return {
            " ".join(w[i : i + _CONTAM_N])
            for i in range(len(w) - _CONTAM_N + 1)
        }

    train_grams = {}
    for r in docs.itertuples():
        if bucket(r.doc_id) >= _TEST_PCT + _VAL_PCT:
            train_grams[int(r.doc_id)] = grams(r.text)

    by_doc = {int(r.doc_id): r for r in out.itertuples()}
    for doc_id, row in by_doc.items():
        assert bucket(doc_id) < _TEST_PCT  # test-split member
        g = grams(docs.loc[docs["doc_id"] == doc_id, "text"].iloc[0])
        shared = set().union(*(g & tg for tg in train_grams.values()))
        hits = sum(1 for tg in train_grams.values() if g & tg)
        assert row.n_shared_grams == len(shared)
        assert row.n_train_docs_hit == hits
    # and no contaminated test doc was missed
    for r in docs.itertuples():
        if bucket(r.doc_id) < _TEST_PCT:
            g = grams(r.text)
            if any(g & tg for tg in train_grams.values()):
                assert int(r.doc_id) in by_doc


def test_ngram_ops_survive_short_docs(spark, tmp_path):
    """Docs shorter than the n-gram must emit ZERO grams, not crash.

    Spark's sequence(1, 0) is descending [1, 0] (unlike DuckDB's empty
    generate_series), so unguarded short docs threw
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT and diverged from the oracle
    (ADVICE r03 #1).  Covers bigrams, 3-gram shingles (minhash path) and
    the 6-gram contamination op.
    """
    from linkgraph.datapipe import (
        _shingles_df,
        doc_bigram_topk,
        doc_contamination,
    )

    rows = [
        (0, "one", "en", "s", 3),
        (1, "two words", "en", "s", 9),
        (2, "now three words", "en", "s", 15),
        (3, "a longer doc with six words", "en", "s", 27),
        (4, "", "en", "s", 0),
    ]
    sf = str(tmp_path / "sf_short")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")

    bg = doc_bigram_topk(spark, sf).toPandas()
    # doc0 and doc4 contribute nothing; doc1 one bigram; doc2 two; doc3 five
    assert int(bg["n"].sum()) == 0 + 1 + 2 + 5

    sh = _shingles_df(spark, sf).toPandas()
    assert set(sh[sh["doc_id"] == 0]["shingle"]) == set()
    assert len(sh[sh["doc_id"] == 2]) == 1  # exactly one 3-gram

    # 6-grams: only doc3 has >= 6 words -> no cross-doc overlap possible,
    # and crucially no crash on the five short docs
    out = doc_contamination(spark, sf).toPandas()
    assert len(out) == 0


def test_doc_bigram_lm_matches_python(spark):
    """Add-one-smoothed bigram-LM scoring vs a from-scratch Counter model."""
    import math
    from collections import Counter

    from linkgraph.datapipe import doc_bigram_lm
    from linkgraph.io import load_table

    sf = "/root/testdata/sf0.001"
    docs = {
        r["doc_id"]: r["text"].strip().lower().split(" ")
        for r in load_table(spark, sf, "documents").select("doc_id", "text").collect()
    }
    cab: Counter = Counter()
    ca: Counter = Counter()
    vocab = set()
    per_doc: dict[int, list[tuple[str, str]]] = {}
    for doc_id, words in docs.items():
        vocab.update(words)
        grams = list(zip(words, words[1:]))
        per_doc[doc_id] = grams
        for a, b in grams:
            cab[(a, b)] += 1
            ca[a] += 1
    V = float(len(vocab))

    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
        for r in doc_bigram_lm(spark, sf).collect()
    }
    expected_docs = {d for d, g in per_doc.items() if g}
    assert set(got) == expected_docs
    for doc_id in expected_docs:
        grams = per_doc[doc_id]
        nll = [-math.log((cab[g] + 1.0) / (ca[g[0]] + V)) for g in grams]
        assert got[doc_id][0] == len(grams)
        assert got[doc_id][1] == pytest.approx(
            round(sum(nll) / len(nll), 6), abs=2e-6
        ), doc_id


def test_length_buckets_invariants(spark):
    """doc_length_buckets: every doc assigned once; buckets are ascending
    token-count ranges (ntile semantics); batch ids contiguous from 0 with
    every batch ≤ _LB_BATCH and all but the last full; deterministic."""
    from linkgraph.datapipe import _LB_BATCH, _LB_BUCKETS, doc_length_buckets

    out = doc_length_buckets(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(out) == n_docs
    assert len({r["doc_id"] for r in out}) == n_docs

    by_bucket: dict[int, list] = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert set(by_bucket) <= set(range(1, _LB_BUCKETS + 1))

    prev_max = None
    for b in sorted(by_bucket):
        toks = [r["n_tokens"] for r in by_bucket[b]]
        if prev_max is not None:
            assert min(toks) >= prev_max  # ties may straddle, order may not
        prev_max = max(toks)
        sizes: dict[int, int] = {}
        for r in by_bucket[b]:
            sizes[r["batch_id"]] = sizes.get(r["batch_id"], 0) + 1
        assert set(sizes) == set(range(len(sizes)))
        last = len(sizes) - 1
        for bid, c in sizes.items():
            assert c == _LB_BATCH if bid < last else c <= _LB_BATCH

    again = doc_length_buckets(spark, SF).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in out]


def test_weighted_sample_matches_python_and_biases_long_docs(spark):
    """doc_weighted_sample vs a from-scratch A-ES replication (same salted
    md5 randomness), plus the statistical point of the op: the
    token-weighted sample must skew longer than the corpus."""
    import hashlib
    import math
    from collections import Counter

    from linkgraph.datapipe import _WS_K, _WS_SCALE, doc_weighted_sample

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    keyed = []
    for doc_id, text in docs.items():
        n = len(text.strip().lower().split(" "))
        if n <= 0:
            continue
        h = int(hashlib.md5(f"wsample:{doc_id}".encode()).hexdigest()[:15], 16)
        keyed.append((math.log((h + 1.0) / _WS_SCALE) / n, doc_id, n))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    exp = [(d, n, round(k, 6) + 0.0) for k, d, n in keyed[:_WS_K]]

    got = [
        (r["doc_id"], r["n_tokens"], r["skey"])
        for r in doc_weighted_sample(spark, SF).collect()
    ]
    assert got == exp

    corpus_mean = sum(n for _, _, n in keyed) / len(keyed)
    sample_mean = sum(n for _, n, _ in got) / len(got)
    assert sample_mean > corpus_mean


def test_mixture_sample_matches_python(spark):
    """doc_mixture_sample vs a from-scratch fixed-weight domain-reweighting
    computation (same salted md5 selection), including the rate formula
    and the induced per-source sampled totals."""
    import hashlib

    from linkgraph.datapipe import _MIX_BUDGET, _MIX_SCALE, doc_mixture_sample

    rows = spark.read.parquet(f"{SF}/documents.parquet").collect()
    per: dict[str, list] = {}
    for r in rows:
        n = len(r["text"].strip().lower().split(" "))
        h = int(
            hashlib.md5(f"mix:{r['doc_id']}".encode()).hexdigest()[:15], 16
        )
        per.setdefault(r["source"], []).append((r["doc_id"], n, (h + 1.0) / _MIX_SCALE))
    tok_total = sum(n for docs in per.values() for _, n, _ in docs)
    w = {s: float(int(s[3:]) + 1) for s in per}
    w_total = sum(w.values())
    exp = {}
    for s, docs in per.items():
        tokens_in = sum(n for _, n, _ in docs)
        rate = min(1.0, _MIX_BUDGET * tok_total * (w[s] / w_total) / tokens_in)
        chosen = [(d, n) for d, n, u in docs if u < rate]
        exp[s] = (
            len(docs), tokens_in, round(rate, 6) + 0.0,
            len(chosen), sum(n for _, n in chosen),
        )

    got = {
        r["source"]: (
            r["n_docs"], r["tokens_in"], r["rate"],
            r["n_sampled"], r["tokens_sampled"],
        )
        for r in doc_mixture_sample(spark, SF).collect()
    }
    assert got == exp
    # higher-indexed sources get higher rates (the weight actually bites)
    rates = {s: v[2] for s, v in got.items()}
    assert rates["src19"] > rates["src0"]
    assert any(v[3] > 0 for v in got.values())


def test_dedup_retention_accounting(spark):
    """doc_dedup_retention must tie out against independent recomputations:
    exact_removed from a pandas groupby on text, near_removed from the
    doc_dedup_clusters output restricted to exact-canonical docs, and the
    identity n_docs = exact_removed + near_removed + retained."""
    from linkgraph.datapipe import doc_dedup_clusters, doc_dedup_retention
    from linkgraph.io import load_table

    row = doc_dedup_retention(spark, SF).first()
    docs = load_table(spark, SF, "documents").select("doc_id", "text").toPandas()
    assert row["n_docs"] == len(docs)
    keep = docs.groupby("text")["doc_id"].transform("min")
    exact_kept_ids = set(docs.loc[docs["doc_id"] == keep, "doc_id"])
    assert row["exact_removed"] == len(docs) - len(exact_kept_ids)
    clus = doc_dedup_clusters(spark, SF).toPandas()
    near = clus[
        (clus["doc_id"] != clus["canon_doc"])
        & clus["doc_id"].isin(exact_kept_ids)
    ]
    assert row["near_removed"] == len(near)
    assert row["retained"] == row["n_docs"] - row["exact_removed"] - row["near_removed"]
    assert row["retained"] > 0


def test_doc_containment_finds_planted_quotes(spark):
    """Containment pairs vs a from-scratch replication of the rare-shingle
    blocking + exact containment; every planted quote whose shingles pass
    the rare-df rule must surface with containment 1.0, and quote→source
    pairs are structurally guaranteed containment 1.0 whenever found."""
    from collections import Counter, defaultdict

    from linkgraph.datapipe import (
        _QUOTE_MOD,
        _QUOTE_OFFSET,
        _QUOTE_WORDS,
        CONTAIN_RARE_DF,
        CONTAIN_TAU,
        doc_containment,
    )
    from linkgraph.io import load_table

    sf_dir = "/root/testdata/sf0.001"
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    corpus = dict(docs)
    for doc_id, text in docs.items():
        if doc_id % _QUOTE_MOD == 0:
            words = text.strip().lower().split(" ")[:_QUOTE_WORDS]
            corpus[doc_id + _QUOTE_OFFSET] = " ".join(words)

    def grams(text):
        w = text.strip().lower().split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    gsets = {d: grams(t) for d, t in corpus.items()}
    df: Counter = Counter()
    for gs in gsets.values():
        for g in gs:
            df[g] += 1
    by_gram = defaultdict(set)
    for d, gs in gsets.items():
        for g in gs:
            if df[g] <= CONTAIN_RARE_DF:
                by_gram[g].add(d)
    cands = set()
    for ds in by_gram.values():
        ds = sorted(ds)
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                cands.add((a, b))
    exp = {}
    for a, b in cands:
        ga, gb = gsets[a], gsets[b]
        small, big = (a, b) if (len(ga), a) <= (len(gb), b) else (b, a)
        c = len(ga & gb) / len(gsets[small])
        if c >= CONTAIN_TAU:
            exp[(small, big)] = round(c, 6)

    got = {
        (r["doc_small"], r["doc_big"]): r["containment"]
        for r in doc_containment(spark, sf_dir).collect()
    }
    assert got == exp
    planted = [(s, b) for (s, b) in got if s >= _QUOTE_OFFSET and b == s - _QUOTE_OFFSET]
    assert len(planted) > 0
    assert all(got[p] == 1.0 for p in planted)


def test_doc_dsir_select_matches_python(spark):
    """DSIR importance resampling vs a from-scratch Counter replication:
    identical top-K set, scores, and deterministic (score, doc_id) cut —
    and the selected set must be enriched in the target language."""
    import math
    from collections import Counter

    from linkgraph.datapipe import (
        _DSIR_TARGET_LANG,
        _DSIR_TOPK,
        doc_dsir_select,
    )
    from linkgraph.io import load_table

    sf_dir = "/root/testdata/sf0.001"
    docs = [
        (r["doc_id"], r["lang"], r["text"])
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        .collect()
    ]
    toks = {d: str(t).lower().strip().split(" ") for d, _l, t in docs}
    lang = {d: l for d, l, _t in docs}

    ct: Counter = Counter()
    cb: Counter = Counter()
    for d, ws in toks.items():
        cb.update(ws)
        if lang[d] == _DSIR_TARGET_LANG:
            ct.update(ws)
    tt, tb, v = sum(ct.values()), sum(cb.values()), len(cb)
    lr = {
        w: math.log((ct.get(w, 0) + 1.0) / (tt + v))
        - math.log((cb[w] + 1.0) / (tb + v))
        for w in cb
    }
    scored = sorted(
        (
            (round(sum(lr[w] for w in ws) / len(ws), 6), d)
            for d, ws in toks.items()
        ),
        key=lambda x: (-x[0], x[1]),
    )
    exp = {(d, lang[d], len(toks[d]), s) for s, d in scored[:_DSIR_TOPK]}

    got = {
        (r["doc_id"], r["lang"], r["n_tokens"], r["logratio"])
        for r in doc_dsir_select(spark, sf_dir).collect()
    }
    assert got == exp

    # semantics: the selected set is enriched in the target language
    base_rate = sum(1 for d in lang.values() if d == _DSIR_TARGET_LANG) / len(lang)
    sel_rate = sum(1 for _d, l, _n, _s in got if l == _DSIR_TARGET_LANG) / len(got)
    assert sel_rate > base_rate


def test_doc_bpe_merges_matches_python(spark):
    """Distributed BPE trainer vs a from-scratch sequential reference:
    identical merge sequence (pair + weighted count per round), including
    the left-to-right non-overlapping merge semantics within a word."""
    from collections import Counter

    from linkgraph.datapipe import _BPE_MERGES, doc_bpe_merges
    from linkgraph.io import load_table

    sf_dir = "/root/testdata/sf0.001"
    texts = [
        str(r["text"]).lower().strip()
        for r in load_table(spark, sf_dir, "documents").select("text").collect()
    ]
    wc: Counter = Counter(w for t in texts for w in t.split(" ") if w)
    state = {w: tuple(w) for w in wc}

    exp = []
    for t in range(_BPE_MERGES):
        cnt: Counter = Counter()
        for w, freq in wc.items():
            s = state[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += freq
        (a, b), c = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        exp.append((t + 1, a, b, c))
        for w, s in state.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            state[w] = tuple(out)

    got = [
        (r["merge_round"], r["sym_a"], r["sym_b"], r["pair_count"])
        for r in doc_bpe_merges(spark, sf_dir).orderBy("merge_round").collect()
    ]
    assert got == exp
    # merged symbols must actually grow past single characters by round k
    assert any(len(a) + len(b) > 2 for _r, a, b, _c in got)


def test_doc_bpe_encode_matches_python(spark):
    """Corpus-wide BPE application vs the sequential reference: per-doc
    whitespace word counts and token counts under the merged vocabulary."""
    from collections import Counter

    from linkgraph.datapipe import _BPE_MERGES, doc_bpe_encode
    from linkgraph.io import load_table

    sf_dir = "/root/testdata/sf0.001"
    docs = {
        r["doc_id"]: str(r["text"]).lower().strip()
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    wc: Counter = Counter(w for t in docs.values() for w in t.split(" ") if w)
    state = {w: tuple(w) for w in wc}
    for _t in range(_BPE_MERGES):
        cnt: Counter = Counter()
        for w, freq in wc.items():
            s = state[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += freq
        (a, b), _c = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        for w, s in state.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            state[w] = tuple(out)

    exp = {}
    for doc_id, t in docs.items():
        words = [w for w in t.split(" ") if w]
        if words:
            exp[doc_id] = (len(words), sum(len(state[w]) for w in words))

    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in doc_bpe_encode(spark, sf_dir).collect()
    }
    assert got == exp
    # BPE must actually compress: fewer tokens than characters, more than words
    n_words = sum(v[0] for v in exp.values())
    n_tokens = sum(v[1] for v in exp.values())
    n_chars = sum(len(w) * f for w, f in wc.items())
    assert n_words < n_tokens < n_chars


def test_doc_edit_dups_matches_python(spark):
    """Levenshtein rerank vs a from-scratch DP implementation over the same
    LSH candidate list: identical surviving pairs and similarities, and the
    rerank must actually reject most candidates (discrimination)."""
    from linkgraph.datapipe import EDIT_SIM_TAU, _lsh_candidates, doc_edit_dups
    from linkgraph.io import load_table

    sf_dir = "/root/testdata/sf0.001"
    texts = {
        r["doc_id"]: str(r["text"]).lower().strip()
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    cand = [
        (r["doc_a"], r["doc_b"])
        for r in _lsh_candidates(spark, sf_dir).collect()
    ]
    assert cand, "fixture must produce LSH candidates"

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[len(b)]

    exp = {}
    for a, b in cand:
        ta, tb = texts[a], texts[b]
        sim = 1.0 - lev(ta, tb) / max(len(ta), len(tb), 1)
        if sim >= EDIT_SIM_TAU:
            exp[(a, b)] = round(sim, 6)

    got = {
        (r["doc_a"], r["doc_b"]): r["edit_sim"]
        for r in doc_edit_dups(spark, sf_dir).collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-9
    # the rerank must discriminate, not rubber-stamp the candidate list
    assert 0 < len(got) < len(cand)


def test_ann_trunc_recall_matches_numpy(spark):
    """Matryoshka truncation audit vs a numpy replication, plus the MRL
    monotonicity property: longer prefixes can only help average recall."""
    import numpy as np

    from linkgraph.datapipe import (
        ANN_K,
        ANN_QUERIES,
        _TRUNC_DIM,
        ann_trunc_recall,
    )
    from linkgraph.io import load_table

    sf_dir = "/root/testdata/sf0.001"
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    E = np.array(
        [r["embedding"] for r in sorted(rows, key=lambda r: r["vec_id"])],
        dtype=np.float64,
    )

    def topk(M):
        sims = (M / np.linalg.norm(M, axis=1, keepdims=True)) @ (
            M / np.linalg.norm(M, axis=1, keepdims=True)
        ).T
        out = {}
        for q in range(ANN_QUERIES):
            order = sorted(
                (i for i in range(len(M)) if i != q),
                key=lambda i: (-sims[q, i], i),
            )
            out[q] = set(order[:ANN_K])
        return out

    full, tr = topk(E), topk(E[:, :_TRUNC_DIM])
    exp = {q: len(full[q] & tr[q]) for q in range(ANN_QUERIES)}

    got = {
        r["q_id"]: r["n_overlap"] for r in ann_trunc_recall(spark, sf_dir).collect()
    }
    assert got == exp
    # monotone in prefix length on average (the property MRL relies on)
    tr8 = topk(E[:, :8])
    mean8 = sum(len(full[q] & tr8[q]) for q in full) / len(full)
    mean16 = sum(exp.values()) / len(exp)
    full_self = topk(E[:, : E.shape[1]])
    assert mean8 <= mean16 <= ANN_K
    assert all(len(full[q] & full_self[q]) == ANN_K for q in full)


def test_lang_temperature_mix_matches_numpy(spark):
    from linkgraph.datapipe import _TEMP_ALPHA, lang_temperature_mix

    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    toks = (
        docs.assign(n=docs["text"].map(lambda t: len(t.strip().lower().split(" "))))
        .groupby("lang")["n"]
        .sum()
    )
    p = toks / toks.sum()
    q_raw = np.power(toks.to_numpy(dtype=np.float64), _TEMP_ALPHA)
    q = q_raw / q_raw.sum()

    out = lang_temperature_mix(spark, SF).toPandas().set_index("lang")
    assert list(out.index) == sorted(toks.index)
    for lang in toks.index:
        assert out.loc[lang, "tokens"] == toks[lang]
        assert out.loc[lang, "p"] == pytest.approx(p[lang], abs=1e-6)
        assert out.loc[lang, "q"] == pytest.approx(
            q[list(toks.index).index(lang)], abs=1e-6
        )
    # temperature flattening: every language's q is strictly between its
    # natural share and the uniform share (the whole point of the exponent)
    uni = 1.0 / len(toks)
    for lang in toks.index:
        lo, hi = sorted((p[lang], uni))
        assert lo - 1e-9 <= out.loc[lang, "q"] <= hi + 1e-9
    assert out["q"].sum() == pytest.approx(1.0, abs=1e-5)
    # boost > 1 exactly for the below-uniform (low-resource) languages
    for lang in toks.index:
        assert (out.loc[lang, "boost"] > 1) == (p[lang] < uni)


def test_doc_span_dedup_matches_python(spark):
    import hashlib

    from linkgraph.datapipe import _SPAN_K, doc_span_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()

    def md5i(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    # from-scratch: positional gram table -> shared hashes -> island merge
    grams = {}  # h -> set(doc_id)
    pos = {}  # doc_id -> (n_words, [(p, h)])
    for _, row in docs.iterrows():
        w = row["text"].strip().lower().split(" ")
        ps = []
        for i in range(len(w) - _SPAN_K + 1):
            h = md5i(" ".join(w[i : i + _SPAN_K]))
            ps.append((i + 1, h))
            grams.setdefault(h, set()).add(row["doc_id"])
        pos[row["doc_id"]] = (len(w), ps)
    shared = {h for h, d in grams.items() if len(d) >= 2}

    expected = {}
    for doc_id, (n_words, ps) in pos.items():
        hit = sorted(p for p, h in ps if h in shared)
        if not hit:
            continue
        islands = []
        for p in hit:
            if islands and p <= islands[-1][1] + 1:
                islands[-1][1] = max(islands[-1][1], p + _SPAN_K - 1)
            else:
                islands.append([p, p + _SPAN_K - 1])
        dup = sum(e - s + 1 for s, e in islands)
        expected[doc_id] = (n_words, len(islands), dup)

    out = doc_span_dedup(spark, SF).toPandas().set_index("doc_id")
    assert set(out.index) == set(expected)
    for doc_id, (n_words, n_spans, dup) in expected.items():
        assert out.loc[doc_id, "n_words"] == n_words
        assert out.loc[doc_id, "n_spans"] == n_spans
        assert out.loc[doc_id, "dup_tokens"] == dup
        assert out.loc[doc_id, "dup_frac"] == pytest.approx(
            round(dup / n_words, 6), abs=1e-9
        )
    # exact duplicate docs must be fully covered by one span
    dup_texts = docs[docs.duplicated("text", keep=False)]
    for doc_id in dup_texts["doc_id"]:
        n_words = expected.get(doc_id, (0, 0, 0))[0]
        if doc_id in expected and n_words >= _SPAN_K:
            assert expected[doc_id][2] == n_words


def test_doc_quality_filter_per_language_top_half(spark):
    """Per-language cume_dist thresholding: within every language the kept
    set is exactly the docs at-or-above the in-language median score (ties
    inclusive), and the scores/languages agree with the standalone
    doc_quality / doc_langid rows."""
    from linkgraph.datapipe import doc_langid, doc_quality, doc_quality_filter

    out = doc_quality_filter(spark, SF).toPandas()
    q = {int(r["doc_id"]): r["quality_score"] for r in doc_quality(spark, SF).collect()}
    lg = {int(r["doc_id"]): r["lang_pred"] for r in doc_langid(spark, SF).collect()}
    assert {int(d): s for d, s in zip(out["doc_id"], out["quality_score"])} == q
    assert {int(d): l for d, l in zip(out["doc_id"], out["lang_pred"])} == lg
    for lang, grp in out.groupby("lang_pred"):
        scores = sorted(grp["quality_score"])
        n = len(scores)
        for r in grp.itertuples():
            n_le = sum(1 for s in scores if s <= r.quality_score)
            assert r.keep == (1 if round(n_le / n, 6) >= 0.5 else 0)
        kept = grp[grp["keep"] == 1]
        assert len(kept) >= n // 2  # at least the top half survives
        # the kept multiset is exactly the top-|kept| slice of sorted scores
        assert sorted(kept["quality_score"]) == scores[n - len(kept):]


def test_inverted_index_matches_python(spark):
    """Posting lists == a from-scratch Python index over the same token
    stream (df cut, doc-ordered doc:tf encoding, totals)."""
    from collections import Counter, defaultdict

    from linkgraph.datapipe import _IDX_MIN_DF, inverted_index
    from linkgraph.io import load_table

    docs = {
        int(r["doc_id"]): r["text"]
        for r in load_table(spark, SF, "documents").collect()
    }
    idx = defaultdict(Counter)
    for doc_id, text in docs.items():
        for w in text.lower().strip().split(" "):
            if w:
                idx[w][doc_id] += 1
    want = {
        w: (
            len(c),
            sum(c.values()),
            ",".join(f"{d}:{c[d]}" for d in sorted(c)),
        )
        for w, c in idx.items()
        if len(c) >= _IDX_MIN_DF
    }
    got = {
        r["word"]: (r["df"], r["total_tf"], r["postings"])
        for r in inverted_index(spark, SF).collect()
    }
    assert got == want
    assert want  # the df cut must not empty the fixture index


def test_word_pmi_matches_python(spark):
    """PMI rows == a from-scratch Counter replication (doc cap, pair
    floor, single-division rounding)."""
    import math
    from collections import Counter
    from itertools import combinations

    from linkgraph.datapipe import _PMI_MAX_WORDS, _PMI_MIN_PAIR, word_pmi
    from linkgraph.io import load_table

    docs = {
        int(r["doc_id"]): sorted({w for w in r["text"].lower().strip().split(" ") if w})
        for r in load_table(spark, SF, "documents").collect()
    }
    docs = {d: ws for d, ws in docs.items() if len(ws) <= _PMI_MAX_WORDS}
    n = len(docs)
    cf: Counter = Counter()
    pf: Counter = Counter()
    for ws in docs.values():
        cf.update(ws)
        pf.update(combinations(ws, 2))
    want = {
        (p, q): (c, round(math.log((c * n) / (cf[p] * cf[q])), 6))
        for (p, q), c in pf.items()
        if c >= _PMI_MIN_PAIR
    }
    got = {
        (r["p"], r["q"]): (r["n_pair"], r["pmi"])
        for r in word_pmi(spark, SF).collect()
    }
    assert got == want
    assert want  # floor must not empty the fixture


def test_doc_ppjoin_is_exact_complete(spark):
    """Prefix-filtered join vs python brute force over ALL pairs — the
    completeness guarantee means equality, not recall."""
    from linkgraph.datapipe import PP_TAU, _shingles_df, doc_ppjoin

    sf = "/root/testdata/sf0.001"
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in doc_ppjoin(spark, sf).collect()
    }
    sets: dict[int, set[str]] = {}
    for r in _shingles_df(spark, sf).collect():
        sets.setdefault(r["doc_id"], set()).add(r["shingle"])
    ids = sorted(sets)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter:
                j = inter / (len(sets[a]) + len(sets[b]) - inter)
                if j >= PP_TAU:
                    want[(a, b)] = round(j, 6)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-6)
    assert want  # the corpus actually contains >= tau pairs


def test_leakfree_split_no_torn_clusters(spark):
    """Planted clusters must land whole in one split; the assignment must
    match a from-scratch md5 replication of the unit hash; and the naive
    per-doc split must tear at least one planted cluster (the failure mode
    this op exists to prevent)."""
    import hashlib

    from linkgraph.datapipe import _TEST_PCT, _VAL_PCT, _leakfree_assign

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    clus = spark.createDataFrame(
        [(3, 3), (7, 3), (11, 3), (20, 20), (21, 20)],
        "doc_id long, canon_doc long",
    )
    out = _leakfree_assign(docs, clus).toPandas().set_index("doc_id")
    assert len(out) == 200

    # clustered docs carry the canonical unit; everyone else themselves
    assert out.loc[7, "unit"] == 3 and out.loc[11, "unit"] == 3
    assert out.loc[21, "unit"] == 20
    assert out.loc[5, "unit"] == 5

    # same-cluster docs share one split
    assert len({out.loc[i, "split"] for i in (3, 7, 11)}) == 1
    assert len({out.loc[i, "split"] for i in (20, 21)}) == 1

    # split == pure function of the unit, replicated from scratch
    def expect(unit):
        b = int(hashlib.md5(f"lfsplit:{unit}".encode()).hexdigest()[:15], 16) % 100
        if b < _TEST_PCT:
            return "test"
        if b < _TEST_PCT + _VAL_PCT:
            return "val"
        return "train"

    for i in range(200):
        assert out.loc[i, "split"] == expect(int(out.loc[i, "unit"])), i

    # contrast: the naive per-doc split tears the {3,7,11} chain
    def naive(doc_id):
        b = int(hashlib.md5(f"split:{doc_id}".encode()).hexdigest()[:15], 16) % 100
        if b < _TEST_PCT:
            return "test"
        if b < _TEST_PCT + _VAL_PCT:
            return "val"
        return "train"

    assert len({naive(i) for i in (3, 7, 11)}) > 1


def test_leakfree_split_accounting(spark):
    """End-to-end summary at sf0.001: docs fully partitioned, units never
    exceed docs, and every split the per-doc naive split produced is a
    valid label."""
    from linkgraph.datapipe import doc_split_leakfree

    out = doc_split_leakfree(spark, SF).toPandas()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert int(out["n_docs"].sum()) == n_docs
    assert (out["n_units"] <= out["n_docs"]).all()
    assert set(out["split"]) <= {"train", "val", "test"}


def test_hrw_minimal_movement_and_replication(spark):
    """The rendezvous property: dropping the last shard relocates ONLY the
    docs that lived on it — every other assignment is unchanged.  And the
    argmax must match a from-scratch md5 replication."""
    import hashlib

    from linkgraph.datapipe import _HRW_SHARDS, _hrw_assign

    docs = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    full = {
        int(r["doc_id"]): int(r["shard"])
        for r in _hrw_assign(docs, _HRW_SHARDS).collect()
    }
    small = {
        int(r["doc_id"]): int(r["shard"])
        for r in _hrw_assign(docs, _HRW_SHARDS - 1).collect()
    }

    def h(doc_id, s):
        return int(
            hashlib.md5(f"hrw:{doc_id}:{s}".encode()).hexdigest()[:15], 16
        )

    for i in range(300):
        want = max(range(_HRW_SHARDS), key=lambda s: (h(i, s), s))
        assert full[i] == want, i
        if full[i] != _HRW_SHARDS - 1:
            # minimal movement: survivors keep their shard
            assert small[i] == full[i], i

    moved = [i for i in range(300) if full[i] == _HRW_SHARDS - 1]
    assert moved  # the dropped shard held someone
    # every shard is actually used (balance sanity at n=300, S=8)
    assert set(full.values()) == set(range(_HRW_SHARDS))


def test_dedup_best_picks_cluster_argmax(spark):
    """best_doc must be the cluster member with the highest ROUNDED
    quality score (doc_id tiebreak), recomputed from scratch."""
    from linkgraph.datapipe import (
        STOPWORDS_EN,
        doc_dedup_best,
        doc_dedup_clusters,
    )

    out = doc_dedup_best(spark, SF).toPandas()
    clus = doc_dedup_clusters(spark, SF).toPandas()
    if clus.empty:
        assert out.empty
        return
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    txt = dict(zip(docs["doc_id"], docs["text"]))

    def q(doc_id):
        w = txt[doc_id].strip().lower().split(" ")
        sr = sum(1 for x in w if x in STOPWORDS_EN) / len(w)
        ttr = len(set(w)) / len(w)
        return round(0.5 * sr + 0.3 * ttr + 0.2 * (len(w) >= 20), 6)

    groups = clus.groupby("canon_doc")["doc_id"].apply(list).to_dict()
    want = {
        c: min(members, key=lambda i: (-q(i), i))
        for c, members in groups.items()
    }
    got = dict(zip(out["cluster"], out["best_doc"]))
    assert got == want
    sizes = dict(zip(out["cluster"], out["n_docs"]))
    assert sizes == {c: len(m) for c, m in groups.items()}
    for _, r in out.iterrows():
        assert r["best_q"] == q(int(r["best_doc"]))


def test_span_mask_matches_python(spark):
    """Masked-position counts vs a from-scratch md5 replication, plus the
    structural invariants (short docs unmasked, coverage bounds)."""
    import hashlib

    from linkgraph.datapipe import _SPAN_EVERY, _SPAN_LEN, doc_span_mask

    out = doc_span_mask(spark, SF).toPandas().set_index("doc_id")
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    for _, drow in docs.iterrows():
        did = int(drow["doc_id"])
        w = drow["text"].strip().lower().split(" ")
        n = len(w)
        nspans = n // _SPAN_EVERY
        cov = set()
        if n >= _SPAN_EVERY:
            for i in range(1, nspans + 1):
                h = int(
                    hashlib.md5(f"span:{did}:{i}".encode()).hexdigest()[:15], 16
                ) % (n - (_SPAN_LEN - 1))
                cov.update(range(h, h + _SPAN_LEN))
        r = out.loc[did]
        assert r["n_tokens"] == n
        assert r["n_spans"] == nspans
        assert r["masked"] == len(cov), did
        assert r["visible"] == n - len(cov)
        assert r["masked"] <= nspans * _SPAN_LEN
        if n >= _SPAN_EVERY:
            assert r["masked"] >= _SPAN_LEN  # at least one span lands


def test_dedup_sources_matrix_recount(spark):
    """Pair/cluster counts per source pair vs an itertools recount over the
    actual cluster membership."""
    from collections import Counter as C
    from itertools import combinations

    from linkgraph.datapipe import doc_dedup_clusters, doc_dedup_sources

    out = doc_dedup_sources(spark, SF).toPandas()
    clus = doc_dedup_clusters(spark, SF).toPandas()
    if clus.empty:
        assert out.empty
        return
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    src = dict(zip(docs["doc_id"], docs["source"]))
    pairs = C()
    clusters = C()
    for _, members in clus.groupby("canon_doc")["doc_id"]:
        ms = sorted(members)
        seen = set()
        for x, y in combinations(ms, 2):
            k = tuple(sorted((src[x], src[y])))
            pairs[k] += 1
            seen.add(k)
        for k in seen:
            clusters[k] += 1
    got_pairs = {
        (r["source_a"], r["source_b"]): r["n_pairs"] for _, r in out.iterrows()
    }
    got_clusters = {
        (r["source_a"], r["source_b"]): r["n_clusters"]
        for _, r in out.iterrows()
    }
    assert got_pairs == dict(pairs)
    assert got_clusters == dict(clusters)


def test_bm25_topk_matches_python(spark):
    """Top-10 BM25 per query doc == a from-scratch Okapi implementation
    (same k1/b, same rounded-score-then-doc_id ranking)."""
    import math
    from collections import Counter

    from linkgraph.datapipe import (
        _BM25_B,
        _BM25_K1,
        _BM25_QUERY_DOCS,
        _BM25_TOPK,
        bm25_topk,
    )
    from linkgraph.io import load_table

    docs = {
        int(r["doc_id"]): [
            w for w in r["text"].lower().strip().split(" ") if w
        ]
        for r in load_table(spark, SF, "documents").collect()
    }
    tf = {d: Counter(ws) for d, ws in docs.items()}
    dl = {d: len(ws) for d, ws in docs.items()}
    n_docs = len(docs)
    avgdl = sum(dl.values()) / n_docs
    df = Counter()
    for c in tf.values():
        df.update(c.keys())

    want = {}
    for q in _BM25_QUERY_DOCS:
        qws = set(docs[q])
        scores = {}
        for d, c in tf.items():
            s = 0.0
            for w in qws & set(c):
                idf = math.log(1.0 + (n_docs - df[w] + 0.5) / (df[w] + 0.5))
                s += (
                    idf
                    * c[w]
                    * (_BM25_K1 + 1)
                    / (
                        c[w]
                        + _BM25_K1
                        * (1 - _BM25_B + _BM25_B * dl[d] / avgdl)
                    )
                )
            if s:
                scores[d] = round(s, 6)
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        want[q] = [(r + 1, d) for r, (d, _s) in enumerate(top[:_BM25_TOPK])]

    got = {}
    rows = bm25_topk(spark, SF).collect()
    for r in rows:
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
        assert r["score"] > 0
    assert {q: sorted(v) for q, v in got.items()} == {
        q: sorted(v) for q, v in want.items()
    }
    # ranks are contiguous 1..k per query (no gaps at the cut boundary)
    for q in _BM25_QUERY_DOCS:
        assert sorted(r for r, _d in got[q]) == list(range(1, len(got[q]) + 1))


def test_simhash_pairs_matches_bruteforce(spark):
    """Pigeonhole band-join pairs == exact O(n^2) Hamming<=3 sweep over
    the collected signatures (lossless-blocking guarantee)."""
    from linkgraph.datapipe import _SH_HAM_MAX, doc_simhash, simhash_pairs

    sf = "/root/testdata/sf0.01"   # sf0.001 has too few docs for pairs
    sig = {
        r["doc_id"]: r["simhash"]
        for r in doc_simhash(spark, sf).collect()
    }
    ids = sorted(sig)
    ref = {
        (a, b): bin(sig[a] ^ sig[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(sig[a] ^ sig[b]).count("1") <= _SH_HAM_MAX
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(spark, sf).collect()
    }
    assert got == ref
    assert len(got) > 0  # the fixture actually exercises the band join


def test_doc_winnow_matches_python(spark):
    """Window counts / fingerprint selection / cross-doc sharing vs a
    from-scratch sequential winnowing pass (Schleimer et al. definition:
    min hash per window, rightmost on ties)."""
    import hashlib

    from linkgraph.datapipe import _WINNOW_K, _WINNOW_W, doc_winnow
    from linkgraph.io import load_table

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF, "documents")
        .select("doc_id", "text").collect()
    }
    ref = {}
    fps: dict = {}
    for did, text in docs.items():
        ws = text.strip().lower().split(" ")
        grams = [
            " ".join(ws[i: i + _WINNOW_K])
            for i in range(len(ws) - _WINNOW_K + 1)
        ]
        hs = [hashlib.md5(g.encode()).hexdigest()[:15] for g in grams]
        nwin = len(hs) - _WINNOW_W + 1
        if nwin <= 0:
            continue
        sel = set()
        for p in range(nwin):
            mn = min(hs[p: p + _WINNOW_W])
            rp = max(
                j for j in range(p, p + _WINNOW_W) if hs[j] == mn
            )
            sel.add((mn, rp))
        ref[did] = (nwin, sel)
        fps[did] = {h for h, _ in sel}
    shared_count = {}
    for did, f in fps.items():
        shared_count[did] = sum(
            1 for h in f
            if any(h in f2 for d2, f2 in fps.items() if d2 != did)
        )
    got = {r["doc_id"]: r for r in doc_winnow(spark, SF).collect()}
    assert set(got) == set(ref)
    for did, (nwin, sel) in ref.items():
        assert got[did]["n_windows"] == nwin
        assert got[did]["n_fp"] == len(sel)
        assert got[did]["n_fp_shared"] == shared_count[did]


def test_rrf_fusion_consistency_and_dense_ranks(spark):
    """RRF output is internally consistent (score recomputable from the
    reported per-system ranks, contiguous fused ranks, pool bounds) and the
    dense-side ranks agree with a from-scratch numpy exact-cosine ranking."""
    from linkgraph.datapipe import (
        _BM25_QUERY_DOCS,
        _RRF_K,
        _RRF_POOL,
        _RRF_TOPK,
        rrf_fusion,
    )
    from linkgraph.io import load_table

    out = rrf_fusion(spark, SF).toPandas()

    # structural invariants
    assert set(out["query_id"]) == set(_BM25_QUERY_DOCS)
    for q, grp in out.groupby("query_id"):
        assert list(grp.sort_values("rank")["rank"]) == list(
            range(1, len(grp) + 1)
        )
        assert len(grp) <= _RRF_TOPK
        s = grp.sort_values("rank")["rrf_score"].to_numpy()
        assert (np.diff(s) <= 1e-12).all()  # non-increasing
    assert ((out["r_sparse"] >= 0) & (out["r_sparse"] <= _RRF_POOL)).all()
    assert ((out["r_dense"] >= 0) & (out["r_dense"] <= _RRF_POOL)).all()
    # a fused doc must come from at least one system pool
    assert ((out["r_sparse"] > 0) | (out["r_dense"] > 0)).all()

    # score == 1/(K+r_sparse) + 1/(K+r_dense) over the present systems
    want_score = np.where(
        out["r_sparse"] > 0, 1.0 / (_RRF_K + out["r_sparse"]), 0.0
    ) + np.where(out["r_dense"] > 0, 1.0 / (_RRF_K + out["r_dense"]), 0.0)
    assert np.allclose(out["rrf_score"], np.round(want_score, 6), atol=5e-7)

    # dense ranks match a numpy exact-cosine reference (rounded-sim,
    # doc_id tiebreak — the same ordering contract as the engine)
    em = load_table(spark, SF, "embeddings").toPandas()
    ids = em["vec_id"].to_numpy(np.int64)
    mat = np.stack([np.asarray(e, dtype=np.float64) for e in em["embedding"]])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    for q in _BM25_QUERY_DOCS:
        qi = int(np.searchsorted(ids, q))
        sims = np.round(mat @ mat[qi], 6)
        cand = [(s, i) for s, i in zip(sims, ids) if i != q]
        cand.sort(key=lambda t: (-t[0], t[1]))
        rank_of = {i: r + 1 for r, (_s, i) in enumerate(cand[:_RRF_POOL])}
        sub = out[(out["query_id"] == q) & (out["r_dense"] > 0)]
        for _, row in sub.iterrows():
            assert rank_of[int(row["doc_id"])] == int(row["r_dense"])


def test_mmr_rerank_greedy_optimality(spark):
    """Each MMR pick is greedy-optimal: replaying the selection with a
    from-scratch numpy rel/sim computation, the picked doc's MMR score is
    >= every unpicked candidate's (within a rounding-boundary tolerance),
    and the reported mmr_score matches the recomputed one."""
    from linkgraph.datapipe import (
        _BM25_QUERY_DOCS,
        _MMR_DIV,
        _MMR_POOL,
        _MMR_REL,
        mmr_rerank,
    )
    from linkgraph.io import load_table

    out = mmr_rerank(spark, SF).toPandas()
    em = load_table(spark, SF, "embeddings").toPandas()
    ids = em["vec_id"].to_numpy(np.int64)
    mat = np.stack([np.asarray(e, dtype=np.float64) for e in em["embedding"]])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    idx = {int(i): p for p, i in enumerate(ids)}
    tol = 2e-6

    assert set(out["query_id"]) == set(_BM25_QUERY_DOCS)
    for q, grp in out.groupby("query_id"):
        grp = grp.sort_values("rank")
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        assert grp["doc_id"].is_unique

        qi = idx[int(q)]
        rel_all = np.round(mat @ mat[qi], 6)
        cand = sorted(
            ((r, int(i)) for r, i in zip(rel_all, ids) if int(i) != int(q)),
            key=lambda t: (-t[0], t[1]),
        )[: _MMR_POOL + 2]  # +2: tolerate pool-cut rounding boundaries
        pool = {d for _r, d in cand}
        rel = {d: r for r, d in cand}

        sel: list[int] = []
        for _, row in grp.iterrows():
            d = int(row["doc_id"])
            assert d in pool
            def score(c):
                if not sel:
                    return rel[c]
                ms = max(
                    np.round(float(mat[idx[c]] @ mat[idx[s]]), 6) for s in sel
                )
                return _MMR_REL * rel[c] - _MMR_DIV * ms
            got = score(d)
            assert abs(got - row["mmr_score"]) < tol
            best_other = max(
                (score(c) for c in pool if c not in sel and c != d),
                default=-np.inf,
            )
            assert got >= best_other - tol
            sel.append(d)


def test_doc_cdc_chunks_matches_python(spark):
    """CDC chunking == a from-scratch sequential rolling-boundary replay,
    and the shared tail provably produces cross-doc chunk sharing."""
    import hashlib

    from linkgraph.datapipe import (
        _CDC_MOD,
        _CDC_TAIL,
        _CDC_W,
        doc_cdc_chunks,
    )
    from linkgraph.io import load_table

    def h15(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    docs = {
        r["doc_id"]: (r["text"].strip().lower() + " " + _CDC_TAIL).split(" ")
        for r in load_table(spark, SF, "documents").collect()
    }
    fp_docs: dict[int, set] = {}
    stats = {}
    per_doc_fps = {}
    for d, ws in docs.items():
        chunks, cur = [], []
        for i, w in enumerate(ws):
            cur.append(w)
            if i >= _CDC_W - 1 and h15(" ".join(ws[i - 3 : i + 1])) % _CDC_MOD == 0:
                chunks.append(cur)
                cur = []
        if cur:
            chunks.append(cur)
        fps = [h15(" ".join(c)) for c in chunks]
        per_doc_fps[d] = fps
        for f in fps:
            fp_docs.setdefault(f, set()).add(d)
        stats[d] = (len(ws), len(chunks), max(len(c) for c in chunks))

    want = {
        d: (
            n_toks,
            n_chunks,
            mx,
            sum(1 for f in per_doc_fps[d] if len(fp_docs[f]) >= 2),
        )
        for d, (n_toks, n_chunks, mx) in stats.items()
    }
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_chunks"], r["max_chunk_toks"],
            r["n_shared_chunks"],
        )
        for r in doc_cdc_chunks(spark, SF).collect()
    }
    assert got == want
    assert any(v[3] > 0 for v in got.values())  # the fixture tail shares
