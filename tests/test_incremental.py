"""Dynamic-graph warm start (linkgraph/incremental.py): appending new
conversations and re-converging from the previous state must reach the same
fixed point in fewer supersteps than a cold start."""

import numpy as np
from pyspark.sql import functions as F

from linkgraph.derive import build_graph
from linkgraph.incremental import ranks_by_key, warm_pagerank_init
from linkgraph.pregel import GraphContext, PageRankProgram, run_program
from linkgraph.synth import synth_transcripts

P = 8
TOL = 1e-6


def _ranks(state_df, n):
    pdf = state_df.select("vid", "rank").toPandas()
    out = np.zeros(n)
    out[pdf["vid"].to_numpy(np.int64)] = pdf["rank"].to_numpy(np.float64)
    return out


def test_warm_start_reconverges_faster_to_same_fixed_point(spark):
    base_t = synth_transcripts(spark, n_conversations=60, seed=42)
    extra_t = synth_transcripts(spark, n_conversations=6, seed=43).withColumn(
        "conv_id", F.concat(F.lit("x"), F.col("conv_id"))
    )
    grown_t = base_t.unionByName(extra_t)

    g0 = build_graph(base_t)
    ctx0 = GraphContext.build(g0, P)
    cold0 = run_program(ctx0, PageRankProgram(tol=TOL), max_iter=200)
    assert cold0.converged
    prev = ranks_by_key(g0, cold0.state)

    g1 = build_graph(grown_t)
    ctx1 = GraphContext.build(g1, P)
    cold1 = run_program(ctx1, PageRankProgram(tol=TOL), max_iter=200)
    assert cold1.converged

    warm_init = warm_pagerank_init(ctx1, g1, prev)
    warm1 = run_program(
        ctx1, PageRankProgram(tol=TOL), max_iter=200, init_state=warm_init
    )
    assert warm1.converged
    assert warm1.supersteps < cold1.supersteps, (
        f"warm {warm1.supersteps} !< cold {cold1.supersteps}"
    )

    n = ctx1.n_vertices
    np.testing.assert_allclose(
        _ranks(warm1.state, n), _ranks(cold1.state, n), atol=2e-5
    )
    ctx0.unpersist()
    ctx1.unpersist()


def test_warm_start_handles_shrunken_graph(spark):
    """Edge/vertex DELETIONS (conversations aged out): warm-starting on a
    SUBSET graph must reach the subset's own fixed point — departed
    vertices' state is dropped by the key join and the renormalization
    restores the PageRank invariant, so deletions need no special path."""
    full_t = synth_transcripts(spark, n_conversations=60, seed=42)
    # delete an entire actor (all its turns): removes its vertex and
    # re-links the surrounding consecutive-turn edges — a real deletion
    # delta, unlike dropping whole conversations (whose actors/tools are
    # shared and so survive in other conversations)
    victim = sorted(r[0] for r in full_t.select("role").distinct().collect())[-1]
    kept_t = full_t.where(F.col("role") != victim)

    g0 = build_graph(full_t)
    ctx0 = GraphContext.build(g0, P)
    cold0 = run_program(ctx0, PageRankProgram(tol=TOL), max_iter=200)
    assert cold0.converged
    prev = ranks_by_key(g0, cold0.state)

    g1 = build_graph(kept_t)
    ctx1 = GraphContext.build(g1, P)
    assert ctx1.n_vertices < ctx0.n_vertices  # deletions actually happened
    cold1 = run_program(ctx1, PageRankProgram(tol=TOL), max_iter=200)
    assert cold1.converged

    warm_init = warm_pagerank_init(ctx1, g1, prev)
    # the warm vector must be a valid distribution on the NEW vertex set
    s = warm_init.agg(F.sum("rank")).collect()[0][0]
    assert abs(s - 1.0) < 1e-9
    warm1 = run_program(
        ctx1, PageRankProgram(tol=TOL), max_iter=200, init_state=warm_init
    )
    assert warm1.converged
    n = ctx1.n_vertices
    np.testing.assert_allclose(
        _ranks(warm1.state, n), _ranks(cold1.state, n), atol=2e-5
    )
    assert warm1.supersteps <= cold1.supersteps
    ctx0.unpersist()
    ctx1.unpersist()


def test_warm_components_same_labels_fewer_supersteps(spark):
    """Incremental CC (additive delta): warm-seeded hash-min must produce
    EXACTLY the cold run's labels on the grown graph, in no more
    supersteps."""
    from linkgraph.incremental import comps_by_key, warm_components_init
    from linkgraph.pregel import ComponentsProgram

    base_t = synth_transcripts(spark, n_conversations=60, seed=42)
    extra_t = synth_transcripts(spark, n_conversations=6, seed=43).withColumn(
        "conv_id", F.concat(F.lit("x"), F.col("conv_id"))
    )
    grown_t = base_t.unionByName(extra_t)

    g0 = build_graph(base_t)
    ctx0 = GraphContext.build(g0, P)
    cold0 = run_program(ctx0, ComponentsProgram(), max_iter=100)
    assert cold0.converged
    prev = comps_by_key(g0, cold0.state)

    g1 = build_graph(grown_t)
    ctx1 = GraphContext.build(g1, P)
    cold1 = run_program(ctx1, ComponentsProgram(), max_iter=100)
    assert cold1.converged

    warm_init = warm_components_init(ctx1, g1, prev)
    # every seed must already sit inside the vertex's true new component
    truth = {r["vid"]: r["comp"] for r in cold1.state.collect()}
    for r in warm_init.collect():
        assert truth[r["comp"]] == truth[r["vid"]]
    warm1 = run_program(
        ctx1, ComponentsProgram(), max_iter=100, init_state=warm_init
    )
    assert warm1.converged
    assert warm1.supersteps <= cold1.supersteps
    got = {r["vid"]: r["comp"] for r in warm1.state.collect()}
    assert got == truth
    ctx0.unpersist()
    ctx1.unpersist()
