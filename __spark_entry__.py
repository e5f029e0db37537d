"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``linkgraph`` package (SURVEY.md §7 layout);
this module is the thin adapter the driver imports.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver's correctness gate records only the FIRST 50 rows of
# ``queries()`` iteration order.  This list pins the window so that rows
# lacking a driver-green CORRECTNESS record in ANY prior round come first
# (VERDICT r03 "Next round" #1): the 21 never-driver-rowed rows +
# ``pagerank_top10`` (red in r1, never re-rowed), then the 14 rows whose
# last green was r2 (rotated out of the r3 window), then any rows new this
# round.  Everything else follows in registry order; the union of
# driver-green rows across rounds then covers the whole registry.
# tests/test_gate_window.py trips if a registry row ever falls outside
# both this window and the cross-round green union.
_GATE_PRIORITY = [
    # never driver-green (r1-r3)
    "engine_sssp", "engine_ppr", "engine_hits",
    "clustering_coeff", "jaccard_pairs", "adamic_adar",
    "degree_hist", "random_walks",
    "doc_dedup_clusters", "doc_tfidf", "doc_bigram_topk",
    "doc_stratified_sample", "doc_pack_sequences", "doc_chunk",
    "doc_contamination",
    "ann_ivf_topk", "ann_ivf_recall",
    "media_stats", "media_decode", "media_frames", "media_resize",
    "pagerank_top10",
    # new in r4
    "ann_ivf_kmeans_recall",
    "graph_reciprocity", "degree_assortativity", "engine_diameter2sweep",
    "url_host_edges", "doc_pii", "doc_repetition", "token_zipf",
    "host_pagerank", "doc_bigram_lm", "component_sizes",
    "anf_kmv", "ktruss_edges", "doc_entropy", "url_dedup",
    "engine_eigenvector", "modularity", "transitivity",
    "tool_cousage", "doc_length_buckets", "betweenness_pivots",
    "doc_weighted_sample", "temporal_paths2", "doc_mixture_sample",
    "bridge_edges", "ann_pq_recall",
    "emb_semdedup", "doc_dedup_retention", "rrf_fusion", "mmr_rerank", "host_anchor_terms", "emb_knn_label_purity", "basket_lift", "crawl_budget", "event_trigrams", "rfm_scores", "emb_label_outliers", "link_negatives", "decayed_activity", "emb_int8_audit", "order_backlog", "zorder_layout", "last_touch_attribution", "engine_msbfs", "doc_cdc_chunks", "engine_kcenter", "engine_ltcascade", "cliques4", "emb_power_iter",
    "bpe_merges", "skipgram_pmi", "posting_compression", "km_survival",
    "reach2_hist", "doc_trigram_novelty", "triangle_doulion",
    "emb_meandot_audit", "cuped_adjust", "markov_accuracy",
    "events_autocorr",
    "cusum_changepoint", "benford_audit", "table_profile", "sft_pairs",
    "markov_stationary", "spatial_nn_join", "k_anonymity",
    "skyline_parts", "winsorize_stats", "fk_integrity", "theil_sen_trend",
    "auc_mann_whitney", "calibration_bins", "engine_widest", "chi2_independence", "poisson_bootstrap", "holt_winters", "burt_constraint", "item_cf", "skew_profile", "join_full_outer", "bisect_median", "isotonic_calibration", "attack_tolerance",
    # NOTE: ann_lsh_topk / ann_pq_topk are rows-only by design (no oracle)
    # and can never enter the green union — they are exempted in
    # tests/test_gate_window.py (their correctness is gated by the
    # hash-checked ann_lsh_recall / ann_pq_recall rows) rather than pinned
    # to window slots that full hash rows can use.
    # last green in r2 — refresh before they go stale
    "doc_exact_dedup", "doc_minhash", "doc_near_dups", "doc_simhash",
    "doc_token_stats", "doc_quality", "doc_langid", "doc_fingerprint",
    "doc_split",
    "ann_topk_cosine", "ann_lsh_recall",
    "emb_near_dups_exact", "emb_near_dups_lsh",
]


def _prioritize(d: dict) -> dict:
    head = {n: d[n] for n in _GATE_PRIORITY if n in d}
    head.update({n: v for n, v in d.items() if n not in head})
    return head


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Events interaction graph -> 5 PageRank supersteps -> top-10 vertices
    (SURVEY.md §3 trace B, FIXTURES.md §4).
    """
    from linkgraph.flagship import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Relational ◇ ops come from linkgraph.relational.REGISTRY (each with a
    DuckDB oracle); iterative graph ops are listed without oracles (driver
    records rows-only; their exactness is covered by the pytest oracles —
    networkx / numpy single-node reference, SURVEY.md §5).
    """
    from linkgraph.ann import registry as ann_registry
    from linkgraph.datapipe import registry as datapipe_registry
    from linkgraph.engine_queries import registry as engine_registry
    from linkgraph.flagship import flagship
    from linkgraph.graphstats import registry as graphstats_registry
    from linkgraph.multimodal import registry as multimodal_registry
    from linkgraph.relational import REGISTRY
    from linkgraph.textops import registry as textops_registry
    from linkgraph.webpipe import registry as webpipe_registry

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: fn for name, (fn, _sql) in REGISTRY.items()
    }
    out.update({name: fn for name, (fn, _sql) in engine_registry().items()})
    out.update({name: fn for name, (fn, _sql) in datapipe_registry().items()})
    out.update({name: fn for name, (fn, _sql) in ann_registry().items()})
    out.update({name: fn for name, (fn, _sql) in multimodal_registry().items()})
    out.update({name: fn for name, (fn, _sql) in graphstats_registry().items()})
    out.update({name: fn for name, (fn, _sql) in webpipe_registry().items()})
    out.update({name: fn for name, (fn, _sql) in textops_registry().items()})
    out["pagerank_top10"] = lambda spark, sf_dir: flagship(spark, sf_dir)
    return _prioritize(out)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each SQL-expressible query (same
    column aliases as the Spark side; floats rounded on both sides)."""
    from linkgraph.ann import registry as ann_registry
    from linkgraph.datapipe import registry as datapipe_registry
    from linkgraph.engine_queries import registry as engine_registry
    from linkgraph.graphstats import registry as graphstats_registry
    from linkgraph.multimodal import registry as multimodal_registry
    from linkgraph.relational import REGISTRY
    from linkgraph.textops import registry as textops_registry
    from linkgraph.webpipe import registry as webpipe_registry

    from linkgraph.graph_oracles import pagerank_fixed_sql

    out = {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
    for reg in (engine_registry(), datapipe_registry(), ann_registry(),
                multimodal_registry(), graphstats_registry(), webpipe_registry(),
                textops_registry()):
        out.update({name: sql for name, (_fn, sql) in reg.items() if sql is not None})
    # flagship: fixed 5-superstep PageRank, top-10 -> unrolled-CTE oracle
    out["pagerank_top10"] = pagerank_fixed_sql(5, limit=10, with_vid=True)
    return _prioritize(out)
