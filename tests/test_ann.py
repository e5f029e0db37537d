"""LSH ANN scale path vs the exact brute-force baseline (linkgraph/ann.py).

The driver's embeddings testdata is uniformly random (near-orthogonal —
measured same-label mean cos ~0.0), which is the regime where no LSH
configuration is useful and also not the regime the op exists for.  The
recall tests therefore run on PLANTED near-duplicates (dup = base + small
noise, cos >= ~0.95) written as an embeddings.parquet in a tmp dir, through
the same public functions.  Determinism is tested on the real testdata.
"""

import numpy as np
import pandas as pd
import pytest

from linkgraph.ann import (
    ann_lsh_topk,
    emb_near_dups_exact,
    emb_near_dups_lsh,
    lsh_buckets,
)
from linkgraph.datapipe import ann_topk_cosine
from linkgraph.io import load_table

SF = "/root/testdata/sf0.001"
N_BASE, N_DUP, DIM = 400, 100, 64


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """ids 0..99 are noisy duplicates of ids 100..199."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((N_BASE, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dups = base[:N_DUP] + 0.18 * rng.standard_normal((N_DUP, DIM)) / np.sqrt(DIM)
    M = np.vstack([dups, base]).astype(np.float32)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(M), dtype=np.int64),
            "embedding": list(M),
            "label": np.zeros(len(M), dtype=np.int32),
        }
    )
    d = tmp_path_factory.mktemp("planted")
    pdf.to_parquet(d / "embeddings.parquet")
    return str(d)


def test_lsh_buckets_deterministic(spark):
    em = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    a = lsh_buckets(em, 64).toPandas().sort_values(["vec_id", "bucket"]).reset_index(drop=True)
    b = lsh_buckets(em, 64).toPandas().sort_values(["vec_id", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == em.count() * 8  # one bucket per (vector, table)


def test_ann_lsh_finds_planted_neighbors(spark, planted_dir):
    nq = 50
    exact = ann_topk_cosine(spark, planted_dir).where(f"q_id < {nq}").toPandas()
    approx = ann_lsh_topk(spark, planted_dir, k=1, n_queries=nq).toPandas()
    top1 = exact[exact["rk"] == 1][["q_id", "vec_id"]]
    got = approx[approx["rk"] == 1][["q_id", "vec_id"]]
    merged = top1.merge(got, on="q_id", suffixes=("_e", "_a"))
    hit = (merged["vec_id_e"] == merged["vec_id_a"]).mean()
    assert hit >= 0.8, f"top-1 recall {hit:.2f} on planted duplicates"
    # planted truth: query i's nearest neighbour is i + N_DUP
    truth_hit = (top1["vec_id"] == top1["q_id"] + N_DUP).mean()
    assert truth_hit == 1.0


def test_ann_lsh_rerank_is_exact(spark, planted_dir):
    nq = 20
    exact = ann_topk_cosine(spark, planted_dir).where(f"q_id < {nq}").toPandas()
    approx = ann_lsh_topk(spark, planted_dir, k=10, n_queries=nq).toPandas()
    merged = approx.merge(exact, on=["q_id", "vec_id"], suffixes=("_a", "_e"))
    assert len(merged) > 0
    assert (merged["cos_sim_a"] == merged["cos_sim_e"]).all()


@pytest.fixture(scope="module")
def planted_dir_32(tmp_path_factory):
    """Same planted layout at a DIFFERENT embedding width (32-d): guards the
    r02 regression where the LSH path hardcoded dim=64 and silently
    mis-hashed any other width."""
    dim = 32
    rng = np.random.default_rng(11)
    base = rng.standard_normal((200, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dups = base[:50] + 0.15 * rng.standard_normal((50, dim)) / np.sqrt(dim)
    M = np.vstack([dups, base]).astype(np.float32)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(M), dtype=np.int64),
            "embedding": list(M),
            "label": np.zeros(len(M), dtype=np.int32),
        }
    )
    d = tmp_path_factory.mktemp("planted32")
    pdf.to_parquet(d / "embeddings.parquet")
    return str(d)


def test_ann_lsh_works_on_32d(spark, planted_dir_32):
    nq = 30
    exact = ann_topk_cosine(spark, planted_dir_32).where(f"q_id < {nq}").toPandas()
    approx = ann_lsh_topk(spark, planted_dir_32, k=1, n_queries=nq).toPandas()
    top1 = exact[exact["rk"] == 1][["q_id", "vec_id"]]
    got = approx[approx["rk"] == 1][["q_id", "vec_id"]]
    merged = top1.merge(got, on="q_id", suffixes=("_e", "_a"))
    hit = (merged["vec_id_e"] == merged["vec_id_a"]).mean()
    assert hit >= 0.8, f"top-1 recall {hit:.2f} on 32-d planted duplicates"
    # planted truth at 32-d: query i's nearest neighbour is i + 50
    assert (top1["vec_id"] == top1["q_id"] + 50).mean() == 1.0


def test_ann_ivf_exhaustive_probe_equals_exact(spark, planted_dir):
    """nprobe == n_cells probes every inverted list: IVF must reproduce the
    brute-force top-k exactly (same pairs, same cosines)."""
    from linkgraph.ann import _ivf_topk, _vectors
    from pyspark.sql import functions as F

    nq = 20
    v = _vectors(spark, planted_dir)
    ivf = _ivf_topk(v, F.col("vec_id") < nq, k=5, n_cells=8, nprobe=8).toPandas()
    exact = ann_topk_cosine(spark, planted_dir).where(f"q_id < {nq}").toPandas()
    a = ivf.sort_values(["q_id", "rk"]).reset_index(drop=True)
    e = exact.sort_values(["q_id", "rk"]).reset_index(drop=True)
    assert (a[["q_id", "vec_id", "rk"]].values == e[["q_id", "vec_id", "rk"]].values).all()
    assert np.allclose(a["cos_sim"], e["cos_sim"])


def test_ann_ivf_finds_planted_neighbors(spark, planted_dir):
    """Probe-restricted IVF (nprobe << n_cells): a planted duplicate points
    the same direction as its source, so the source's cell is always probed
    and top-1 recall on the planted truth must be high."""
    from linkgraph.ann import _ivf_topk, _vectors
    from pyspark.sql import functions as F

    nq = 50
    v = _vectors(spark, planted_dir)
    ivf = _ivf_topk(v, F.col("vec_id") < nq, k=1, n_cells=8, nprobe=2).toPandas()
    got = ivf[ivf["rk"] == 1]
    hit = (got["vec_id"] == got["q_id"] + N_DUP).mean()
    assert hit >= 0.9, f"IVF top-1 planted recall {hit:.2f}"


def test_ann_ivf_kmeans_quantizer(spark, planted_dir):
    """Distributed spherical k-means quantizer (VERDICT r03 item 6):
    deterministic, strictly-non-worse quantization than the fixed seed, and
    at least as good planted top-1 recall through the identical search
    machinery."""
    from linkgraph.ann import _centroids_kmeans, _centroids_np, _ivf_topk, _vectors
    from pyspark.sql import functions as F

    v = _vectors(spark, planted_dir)
    C_fixed = _centroids_np(v, 8)
    C_a = _centroids_kmeans(v, 8, iters=3)
    C_b = _centroids_kmeans(v, 8, iters=3)
    assert np.array_equal(C_a, C_b), "k-means must be bit-deterministic"
    assert not np.allclose(C_a, C_fixed), "training must move the centroids"
    # spherical k-means objective: mean max-cosine to the nearest centroid
    M = np.stack(
        [np.asarray(r["e"]) for r in v.select("e").orderBy(F.col("vec_id")).collect()]
    )
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    obj_fixed = (M @ C_fixed.T).max(axis=1).mean()
    obj_train = (M @ C_a.T).max(axis=1).mean()
    assert obj_train >= obj_fixed, (obj_train, obj_fixed)

    nq = 50
    ivf = _ivf_topk(
        v, F.col("vec_id") < nq, k=1, n_cells=8, nprobe=2, quantizer="kmeans"
    ).toPandas()
    got = ivf[ivf["rk"] == 1]
    hit = (got["vec_id"] == got["q_id"] + N_DUP).mean()
    assert hit >= 0.9, f"k-means IVF top-1 planted recall {hit:.2f}"


def test_emb_near_dups_lsh_vs_exact(spark, planted_dir):
    tau = 0.9
    exact = emb_near_dups_exact(spark, planted_dir, tau=tau).toPandas()
    lsh = emb_near_dups_lsh(spark, planted_dir, tau=tau).toPandas()
    e = set(zip(exact["a"], exact["b"]))
    l = set(zip(lsh["a"], lsh["b"]))
    assert len(e) >= N_DUP * 0.9  # the planting worked
    assert l <= e, "LSH produced a pair the exact path rejects"
    assert len(l) / len(e) >= 0.8, f"near-dup recall {len(l)/len(e):.2f}"


def test_ann_pq_finds_planted_neighbors(spark, planted_dir):
    """PQ-ADC (compressed-domain scan): a noisy planted duplicate's codes
    stay close to its source's, so ADC top-1 recall on the planted truth
    must be high even at 4x16 (16-bit) codes."""
    from linkgraph.ann import _pq_adc_topk, _vectors
    from pyspark.sql import functions as F

    nq = 50
    v = _vectors(spark, planted_dir)
    pq = _pq_adc_topk(v, F.col("vec_id") < nq, k=3).toPandas()
    by_q = pq.sort_values(["q_id", "adc_score"], ascending=[True, False])
    top1 = by_q.groupby("q_id").head(1)
    hit = (top1["vec_id"] == top1["q_id"] + N_DUP).mean()
    assert hit >= 0.8, f"PQ-ADC top-1 planted recall {hit:.2f}"


def test_ann_pq_codebooks_deterministic_and_exact_on_copies(spark):
    """Codebook training is RNG-free (two runs bit-identical), and an
    EXACT scaled copy encodes to the same codes as its source, making its
    ADC score equal the source self-score — the invariant the
    ann_pq_recall gate builds on."""
    import numpy as np

    from linkgraph.ann import (
        _planted_vectors,
        _pq_codebooks,
        _pq_encode_udf,
        ann_pq_recall,
    )

    v = _planted_vectors(spark, SF)
    B1 = _pq_codebooks(v)
    B2 = _pq_codebooks(v)
    assert (B1 == B2).all()

    enc = _pq_encode_udf(B1)
    from linkgraph.ann import N_PLANTED, PLANT_OFFSET
    from pyspark.sql import functions as F

    codes = {
        r["vec_id"]: tuple(r["c"])
        for r in v.where(
            (F.col("vec_id") < N_PLANTED) | (F.col("vec_id") >= PLANT_OFFSET)
        ).select("vec_id", enc("e").alias("c")).collect()
    }
    for i in range(N_PLANTED):
        assert codes[i] == codes[i + PLANT_OFFSET]

    assert ann_pq_recall(spark, SF).first()["recall_ok"] == 1


def test_emb_semdedup_drops_planted_copies(spark):
    """SemDeDup gate invariants on the planted union at sf0.001:
    every planted copy (same direction as its source => same cell,
    cos 1.0) is dropped; recomputing the greedy rule from the output's
    own cell assignment confirms each drop has an earlier kept-or-dropped
    cell-mate at tau and each kept vector has none."""
    from pyspark.sql import functions as F

    from linkgraph.ann import (
        N_PLANTED,
        PLANT_OFFSET,
        PLANT_TAU,
        _planted_vectors,
        emb_semdedup,
    )

    out = emb_semdedup(spark, SF).toPandas().set_index("vec_id")
    # planted copies must all be dropped, and share their source's cell
    for i in range(N_PLANTED):
        assert out.loc[i + PLANT_OFFSET, "dropped"] == 1
        assert out.loc[i + PLANT_OFFSET, "cell"] == out.loc[i, "cell"]
    # greedy rule recomputed from raw vectors: dropped <=> exists an
    # earlier same-cell vector at cos >= tau
    v = _planted_vectors(spark, SF).select("vec_id", "e").toPandas()
    import numpy as np

    M = np.stack(v["e"].to_numpy()).astype(np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    ids = v["vec_id"].to_numpy()
    cells = out.loc[ids, "cell"].to_numpy()
    order = np.argsort(ids)
    for pos in order:
        same = (cells == cells[pos]) & (ids < ids[pos])
        has_earlier = bool(
            same.any()
            and (np.round(M[same] @ M[pos], 6) >= PLANT_TAU).any()
        )
        assert has_earlier == bool(out.loc[ids[pos], "dropped"]), ids[pos]


def test_emb_random_projection_matches_numpy(spark):
    """Arrow-matmul quantized random projection vs a from-scratch numpy
    replication — exact integer equality (the int quantization makes the
    result order-independent)."""
    import numpy as np

    from linkgraph.ann import RP_OUT_DIM, RP_SCALE, _rp_signs, emb_random_projection
    from linkgraph.io import load_table

    sf_dir = "/root/testdata/sf0.001"
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    ids = [r["vec_id"] for r in rows]
    S = _rp_signs(RP_OUT_DIM, X.shape[1])
    Y = np.floor(X * RP_SCALE).astype(np.int64) @ S.T
    exp = {(v, j): int(Y[k, j]) for k, v in enumerate(ids) for j in range(RP_OUT_DIM)}
    got = {
        (r["vec_id"], r["j"]): r["y"]
        for r in emb_random_projection(spark, sf_dir).collect()
    }
    assert got == exp
    # JL sanity: projected dot products correlate with original cosines
    # on at least one pair (weak structural check, exactness is above)
    assert len(got) == len(ids) * RP_OUT_DIM


def test_knn_graph_mutual_matches_numpy(spark):
    """Mutual k-NN edges vs a dense numpy top-k with identical rounding
    and tiebreak (rounded cosine desc, vec_id asc)."""
    from linkgraph.ann import KNN_K, knn_graph_mutual

    got = {
        (r["a"], r["b"]): r["cos_sim"]
        for r in knn_graph_mutual(spark, SF).collect()
    }
    em = load_table(spark, SF, "embeddings").toPandas()
    ids = em["vec_id"].to_numpy()
    X = np.stack(em["embedding"].to_numpy()).astype(np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = np.round(Xn @ Xn.T, 6)
    topk = {}
    for i, vid in enumerate(ids):
        cand = [(-C[i, j], ids[j]) for j in range(len(ids)) if j != i]
        cand.sort()
        topk[vid] = {b for _, b in cand[:KNN_K]}
    want = {}
    for i, a in enumerate(ids):
        for j, b in enumerate(ids):
            if a < b and b in topk[a] and a in topk[b]:
                want[(a, b)] = C[i, j]
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=2e-6)


def test_emb_drift_matches_numpy(spark):
    """Drift report vs a from-scratch numpy replication with the same
    quantization."""
    import numpy as np

    from linkgraph.ann import DRIFT_SCALE, emb_drift

    row = emb_drift(spark, SF).first()
    pdf = spark.read.parquet(f"{SF}/embeddings.parquet").toPandas()
    E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    Q = np.floor(E * DRIFT_SCALE)
    ma = Q[ids % 2 == 0].mean(axis=0) / DRIFT_SCALE
    mb = Q[ids % 2 == 1].mean(axis=0) / DRIFT_SCALE
    assert row["n_a"] == int((ids % 2 == 0).sum())
    assert row["n_b"] == int((ids % 2 == 1).sum())
    assert row["dim"] == E.shape[1]
    cos = float(ma @ mb / np.linalg.norm(ma) / np.linalg.norm(mb))
    assert row["cos_means"] == pytest.approx(round(cos, 6), abs=1e-6)
    assert row["l2_shift"] == pytest.approx(
        round(float(np.linalg.norm(ma - mb)), 6), abs=1e-6
    )
    # zero-mean corpus: the centroids are noise vectors, so their cosine
    # is unconstrained — only well-definedness is invariant here
    assert -1.0 <= row["cos_means"] <= 1.0
    assert row["l2_shift"] >= 0.0


def test_emb_knn_label_purity_matches_numpy(spark):
    """Per-label kNN agreement == a from-scratch numpy exact-cosine
    reference (same rounded-sim + vec_id-tiebreak neighbour ranking)."""
    import numpy as np

    from linkgraph.ann import KNN_K, _PURITY_MICRO, emb_knn_label_purity
    from linkgraph.io import load_table

    sf = "/root/testdata/sf0.001"
    em = load_table(spark, sf, "embeddings").toPandas()
    ids = em["vec_id"].to_numpy(np.int64)
    labels = dict(zip(ids, em["label"].to_numpy(np.int64)))
    mat = np.stack([np.asarray(e, dtype=np.float64) for e in em["embedding"]])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]

    per_label: dict[int, list[tuple[int, int]]] = {}
    sims = np.round(mat @ mat.T, 6)
    for i, a in enumerate(ids):
        cand = sorted(
            ((sims[i, j], int(b)) for j, b in enumerate(ids) if b != a),
            key=lambda t: (-t[0], t[1]),
        )[:KNN_K]
        agree = sum(1 for _s, b in cand if labels[b] == labels[int(a)])
        per_label.setdefault(labels[int(a)], []).append((agree, len(cand)))

    want = {}
    for lab, rows in per_label.items():
        sa = sum(a for a, _k in rows)
        sk = sum(k for _a, k in rows)
        want[lab] = (
            len(rows),
            sa,
            int(np.floor(_PURITY_MICRO * sa / sk)),
            sum(1 for a, k in rows if a == k),
            sum(1 for a, _k in rows if a == 0),
        )

    got = {
        r["label"]: (
            r["n_vecs"], r["sum_agree"], r["agree_micro"],
            r["n_pure"], r["n_isolated"],
        )
        for r in emb_knn_label_purity(spark, sf).collect()
    }
    assert got == want


def test_emb_label_outliers_matches_numpy(spark):
    """Per-label anchor-cosine stats == a from-scratch numpy reference."""
    import numpy as np

    from linkgraph.ann import _OUTLIER_TAU_MICRO, emb_label_outliers
    from linkgraph.io import load_table

    sf = "/root/testdata/sf0.001"
    em = load_table(spark, sf, "embeddings").toPandas()
    ids = em["vec_id"].to_numpy(np.int64)
    labels = em["label"].to_numpy(np.int64)
    mat = np.stack([np.asarray(e, dtype=np.float64) for e in em["embedding"]])
    nrm = np.linalg.norm(mat, axis=1)

    want = {}
    for lab in np.unique(labels):
        sel = labels == lab
        sub_ids, sub = ids[sel], mat[sel]
        anchor = sub[np.argmin(sub_ids)]
        an = np.linalg.norm(anchor)
        cos = sub @ anchor / (nrm[sel] * an)
        micro = np.floor(1_000_000 * cos).astype(np.int64)
        want[int(lab)] = (
            int(sel.sum()),
            int(np.floor(micro.sum() / len(micro))),
            int(micro.min()),
            int((micro < _OUTLIER_TAU_MICRO).sum()),
        )

    got = {
        r["label"]: (
            r["n_vecs"], r["mean_cos_micro"], r["min_cos_micro"], r["n_outliers"]
        )
        for r in emb_label_outliers(spark, sf).collect()
    }
    assert got == want


def test_emb_int8_audit_matches_numpy(spark):
    """Int8 audit == a from-scratch numpy symmetric quantizer."""
    import numpy as np

    from linkgraph.ann import emb_int8_audit
    from linkgraph.io import load_table

    sf = "/root/testdata/sf0.001"
    em = load_table(spark, sf, "embeddings").toPandas()
    mat = np.stack(
        [np.asarray(e, dtype=np.float64) for e in em["embedding"]]
    )
    s = np.abs(mat).max(axis=0)
    q = np.clip(np.round(127.0 * mat / s), -127.0, 127.0)
    err = np.abs(mat - q * s / 127.0)
    err_micro = np.floor(1_000_000 * err).astype(np.int64)
    sat = (np.abs(q) == 127.0).astype(np.int64)

    got = {r["dim"]: r for r in emb_int8_audit(spark, sf).collect()}
    assert set(got) == set(range(mat.shape[1]))
    for d in range(mat.shape[1]):
        r = got[d]
        assert r["n_vals"] == mat.shape[0]
        assert r["scale_micro"] == int(np.floor(1_000_000 * s[d]))
        assert r["n_sat"] == int(sat[:, d].sum())
        assert r["max_err_micro"] == int(err_micro[:, d].max())
        assert r["sum_err_micro"] == int(err_micro[:, d].sum())
        # quantization never saturates more than the two extreme points
        # unless the distribution is degenerate; at least the max |x|
        # itself always saturates
        assert r["n_sat"] >= 1


def test_emb_power_iter_aligns_with_numpy_eigvec(spark):
    """The 3-round integer-scaled iterate must align with the true dominant
    eigenvector of the quantized second-moment matrix (|cos| close to 1),
    and must replay exactly under the same integer recurrence in numpy."""
    from linkgraph.ann import _PI_QSCALE, _PI_ROUNDS, _PI_USCALE, emb_power_iter

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings").toPandas()
    X = np.stack(emb["embedding"].map(lambda v: np.asarray(v, dtype=np.float64)))
    Q = np.round(_PI_QSCALE * X).astype(np.int64)
    C = Q.T @ Q

    # exact integer replay of the engine recurrence
    u = np.full(C.shape[0], _PI_USCALE, dtype=object)
    for _ in range(_PI_ROUNDS):
        w = C.astype(object) @ u
        m = max(abs(int(x)) for x in w)
        u = np.array(
            [int(np.sign(int(x))) * ((abs(int(x)) * _PI_USCALE) // m) for x in w],
            dtype=object,
        )
    ref = np.array([int(x) for x in u], dtype=np.int64)

    got = emb_power_iter(spark, sf).toPandas().sort_values("dim")
    assert (got["component"].to_numpy(np.int64) == ref).all()

    evals, evecs = np.linalg.eigh(C.astype(np.float64))
    top = evecs[:, -1]
    g = ref.astype(np.float64)
    cos = abs(g @ top) / (np.linalg.norm(g) * np.linalg.norm(top))
    assert cos > 0.99


def test_emb_meandot_audit_matches_numpy_bruteforce(spark):
    """The Gram-identity shortcut == numpy O(n^2) pair enumeration on the
    same floor-quantized int64 vectors, per label."""
    from linkgraph.ann import _MEANDOT_QSCALE, emb_meandot_audit

    rows = (
        load_table(spark, SF, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    by_label: dict[int, list] = {}
    for r in rows:
        q = np.floor(
            np.asarray(r["embedding"], dtype=np.float64) * _MEANDOT_QSCALE
        ).astype(np.int64)
        by_label.setdefault(int(r["label"]), []).append(q)

    got = {r["label"]: r for r in emb_meandot_audit(spark, SF).collect()}
    assert set(got) == set(by_label)
    for lbl, vecs in by_label.items():
        M = np.stack(vecs)
        n = len(vecs)
        sum_sq = int((M * M).sum())
        norm_sq = int((M.sum(axis=0) ** 2).sum())
        pair = sum(
            int(M[i] @ M[j]) for i in range(n) for j in range(i + 1, n)
        )
        r = got[lbl]
        assert r["n"] == n
        assert r["n_pairs"] == n * (n - 1) // 2
        assert r["sum_sq_norm"] == sum_sq
        assert r["norm_sq_sum"] == norm_sq
        assert r["pair_dot_sum"] == pair
        assert norm_sq - sum_sq == 2 * pair  # the identity itself


def test_emb_meandot_audit_overflow_raises_loudly(spark, tmp_path):
    """Past the documented int64 bound the audit must FAIL, not wrap
    (ADVICE r05): 4 vectors of [1e5] quantize to s = 4e9 per dim, whose
    square (1.6e19) exceeds 2^63-1.  DuckDB raises on the same input; the
    runtime guard makes the Spark side raise too instead of silently
    returning a wrapped (wrong) integer."""
    from linkgraph.ann import emb_meandot_audit

    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, 0, [1.0e5]) for i in range(4)],
        "vec_id long, label int, embedding array<double>",
    ).write.parquet(f"{sf}/embeddings.parquet")
    with pytest.raises(Exception, match="overflows int64"):
        emb_meandot_audit(spark, sf).collect()
