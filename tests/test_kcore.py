"""k-core peeling (linkgraph/kcore.py): converged fixed point must equal
networkx's k_core exactly, on a graph where peeling actually removes
vertices."""

import networkx as nx
from pyspark.sql import functions as F

from linkgraph.derive import build_graph
from linkgraph.kcore import kcore_members
from linkgraph.synth import synth_transcripts


def _nx_graph(g):
    rows = g.edges.select("src", "dst").collect()
    G = nx.Graph()
    G.add_nodes_from(r["vid"] for r in g.vertices.select("vid").collect())
    G.add_edges_from((r["src"], r["dst"]) for r in rows if r["src"] != r["dst"])
    return G


def test_kcore_matches_networkx_at_max_core(spark):
    g = build_graph(synth_transcripts(spark, n_conversations=60, seed=42))
    G = _nx_graph(g)
    cn = nx.core_number(G)
    kmax = max(cn.values())
    assert kmax >= 2, "fixture must have a nontrivial core"
    expect = {v for v, c in cn.items() if c >= kmax}
    assert 0 < len(expect) < G.number_of_nodes(), "core must be a proper subset"

    got = kcore_members(g.edges, kmax)
    vids = {r["vid"] for r in got.select("vid").collect()}
    assert vids == expect

    # reported induced degrees match networkx's induced subgraph
    sub = G.subgraph(expect)
    degs = {r["vid"]: r["core_deg"] for r in got.collect()}
    assert degs == {v: d for v, d in sub.degree()}


def test_kcore_fixed_iters_prefix_of_convergence(spark):
    """j fixed peels then convergence == straight convergence (the gate row
    runs the fixed-iteration form; its semantics must be a prefix of the
    fixed point)."""
    g = build_graph(synth_transcripts(spark, n_conversations=40, seed=7))
    G = _nx_graph(g)
    kmax = max(nx.core_number(G).values())
    full = {r["vid"] for r in kcore_members(g.edges, kmax).select("vid").collect()}
    fixed2 = {
        r["vid"]
        for r in kcore_members(g.edges, kmax, fixed_iters=2).select("vid").collect()
    }
    # after 2 peels the survivor set is a superset of the fixed point
    assert fixed2 >= full


def test_onion_layers_match_python_peel(spark):
    """Layer indices vs a from-scratch python replication of the fixed-
    round peel, and consistency with kcore survivors (layer 0 == k-core
    members at the same depth)."""
    from linkgraph.kcore import engine_kcore, engine_onion

    SF = "/root/testdata/sf0.001"
    out = {r["vkey"]: r["layer"] for r in engine_onion(spark, SF).collect()}
    core = {r["vkey"] for r in engine_kcore(spark, SF).collect()}

    # rebuild the undirected simple graph exactly as the engine does
    from linkgraph.flagship import events_graph
    from linkgraph.io import load_table

    g = events_graph(load_table(spark, SF, "events"))
    vk = {r["vid"]: r["vkey"] for r in g.vertices.collect()}
    und = set()
    for r in g.edges.collect():
        if r["src"] != r["dst"]:
            und.add((r["src"], r["dst"]))
            und.add((r["dst"], r["src"]))
    alive = {a for a, _ in und}
    want = {}
    K, ITERS = 3, 8
    for i in range(1, ITERS + 1):
        deg = {}
        for a, b in und:
            if a in alive and b in alive:
                deg[a] = deg.get(a, 0) + 1
        new_alive = {v for v, c in deg.items() if c >= K}
        for v in alive - new_alive:
            want[vk[v]] = i
        alive = new_alive
    for v in alive:
        want[vk[v]] = 0
    assert out == want
    assert {v for v, l in out.items() if l == 0} == core
