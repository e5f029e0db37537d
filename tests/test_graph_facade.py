"""Graph façade == direct engine calls (linkgraph/graph.py).

The façade must add ergonomics only — every method's output is asserted
EQUAL (exact rows) to the corresponding direct run_program / module-call
path on the same fixture, and the CSR context must be built once and
shared across calls.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.pregel import (
    ComponentsProgram,
    GraphContext,
    PageRankProgram,
    run_program,
)
from linkgraph.synth import synth_transcripts


@pytest.fixture(scope="module")
def facade(spark):
    t = synth_transcripts(spark, n_conversations=60, seed=5)
    g = Graph.from_transcripts(t, P=8)
    yield g
    g.unpersist()


def test_page_rank_equals_direct(spark, facade):
    got = {
        r["vid"]: r["rank"] for r in facade.page_rank(tol=1e-6).collect()
    }
    ctx = GraphContext.build(facade.tables, 8)
    try:
        want = {
            r["vid"]: r["rank"]
            for r in run_program(
                ctx, PageRankProgram(tol=1e-6)
            ).state.collect()
        }
    finally:
        ctx.unpersist()
    assert got == want  # bit-identical: same engine, same plan


def test_components_equals_direct_and_names_attached(facade):
    df = facade.connected_components()
    assert set(df.columns) == {"vid", "vkey", "vtype", "comp"}
    got = {r["vid"]: r["comp"] for r in df.collect()}
    want = {
        r["vid"]: r["comp"]
        for r in run_program(facade.ctx, ComponentsProgram()).state.collect()
    }
    assert got == want
    # vkey/vtype really are the vertex table's
    v = {r["vid"]: (r["vkey"], r["vtype"]) for r in facade.vertices.collect()}
    assert all(
        (r["vkey"], r["vtype"]) == v[r["vid"]] for r in df.collect()
    )


def test_ctx_built_once_and_shared(facade):
    c1 = facade.ctx
    facade.label_propagation(max_iter=3)
    facade.bfs(facade.vertices.limit(1).select("vid"), max_iter=4)
    assert facade.ctx is c1


def test_triangles_and_hits_delegate(facade):
    from linkgraph.hits import hits_scores
    from linkgraph.triangles import count_triangles

    assert facade.triangle_count() == count_triangles(facade.tables).total
    got = {
        r["vid"]: (r["authority"], r["hub"])
        for r in facade.hits(iters=3).collect()
    }
    want = {
        r["vid"]: (r["authority"], r["hub"])
        for r in hits_scores(facade.tables, iters=3).collect()
    }
    # HITS sums floats across tasks, so two runs of the SAME code can
    # differ by an ulp in the merge order — compare within 1e-12, unlike
    # the integer-state programs above which are bit-identical.
    assert set(got) == set(want)
    for vid, (a, h) in want.items():
        assert got[vid][0] == pytest.approx(a, rel=1e-12, abs=1e-15)
        assert got[vid][1] == pytest.approx(h, rel=1e-12, abs=1e-15)


def test_from_tables_roundtrip(spark, facade):
    g2 = Graph.from_tables(
        facade.vertices, facade.edges, facade.degrees, P=8
    )
    assert g2.degrees is facade.degrees
    # degrees derived when omitted
    g3 = Graph.from_tables(facade.vertices, facade.edges, P=8)
    a = {r["vid"]: r["out_deg"] for r in facade.degrees.collect()}
    b = {r["vid"]: r["out_deg"] for r in g3.degrees.collect()}
    assert a == b


def test_shortest_paths_and_core(facade):
    src = facade.vertices.orderBy("vid").limit(1).select("vid")
    d = facade.shortest_paths(src)
    assert set(d.columns) == {"vid", "vkey", "vtype", "dist"}
    # source distance is 0
    svid = src.collect()[0]["vid"]
    assert d.where(F.col("vid") == svid).collect()[0]["dist"] == 0.0
    core = facade.core_members(k=2)
    assert set(core.columns) == {"vid", "core_deg"}
    assert core.where(F.col("core_deg") < 2).count() == 0
