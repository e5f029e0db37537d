"""Triangle counting (op 51) vs networkx + numpy reference + goldens."""

import networkx as nx
import pytest

from linkgraph.derive import build_graph
from linkgraph.ref_single_node import triangles_ref
from linkgraph.synth import micro_transcripts, synth_transcripts
from linkgraph.triangles import count_triangles

from .conftest import edges_numpy

GOLDEN_TOTALS = {"tri3": 1, "path4": 0, "two2cycles": 0, "star_hub": 0, "dup_self": 1}


@pytest.mark.parametrize("name,total", GOLDEN_TOTALS.items())
def test_golden_totals(spark, name, total):
    g = build_graph(micro_transcripts(spark, name))
    res = count_triangles(g)
    assert res.total == total
    res.unpersist()


def test_synth_vs_references(spark):
    g = build_graph(synth_transcripts(spark, n_conversations=60, seed=42))
    src, dst, _w, n = edges_numpy(g)
    res = count_triangles(g)

    per_ref, total_ref = triangles_ref(src, dst, n)
    assert res.total == total_ref

    got = {r["vid"]: r["n_tri"] for r in res.per_vertex.collect()}
    for v in range(n):
        assert got.get(v, 0) == per_ref[v]

    G = nx.Graph()
    G.add_nodes_from(range(n))
    G.add_edges_from((s, d) for s, d in zip(src, dst) if s != d)
    nx_tri = nx.triangles(G)
    assert res.total == sum(nx_tri.values()) // 3
    for v in range(n):
        assert got.get(v, 0) == nx_tri[v]
    res.unpersist()
