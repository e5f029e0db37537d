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
# (VERDICT r05 "Next round" #1).  After the r5 gate landed, the cross-round
# driver-green union covers 163/263 oracled rows; 100 rows have never had a
# driver CORRECTNESS row.  This r6 rotation puts the next 50 of those 100
# first, in the queue order the r5 list already established
# (burt_constraint … doc_edit_dups); the remaining 50 queue rows follow for
# the r7 rotation, then everything already green in registry order.
# tests/test_gate_window.py trips if a window slot is wasted on an
# already-green row while un-green rows wait outside.
_GATE_PRIORITY = [
    # ---- r6 window: next 50 rows never driver-verified in r1-r5 ----
    "burt_constraint",
    "item_cf", "skew_profile", "join_full_outer", "bisect_median",
    "isotonic_calibration", "attack_tolerance",
    "running_distinct", "unpivot_lineitem", "moving_window_1h",
    "funnel_conversion", "rate_anomaly", "scd2_customers", "session_paths",
    "tool_latency", "tool_position", "user_burstiness", "tool_runs",
    "cohort_retention", "active_users", "bloom_semijoin", "kmv_distinct",
    "engine_components_warm", "engine_bipartite", "engine_onion", "bowtie",
    "engine_salsa", "neighbor_sample", "node2vec_walks",
    "simhash_pairs", "doc_winnow", "split_ks", "doc_split_leakfree",
    "doc_shard_hrw", "doc_dedup_best", "doc_span_mask", "doc_dedup_sources",
    "doc_ppjoin", "doc_quality_filter", "inverted_index", "bm25_topk",
    "langid_confusion", "word_pmi", "doc_keywords", "doc_containment_pairs",
    "doc_dsir_select", "doc_bpe_merges", "doc_bpe_encode",
    "doc_bpe_fertility", "lang_temperature_mix",
    # ---- still un-green after the r6 window (50 rows, the r7 rotation) ----
    "doc_span_dedup",
    "doc_edit_dups", "ann_trunc_recall", "emb_drift",
    "emb_random_projection", "knn_graph_mutual",
    "media_phash", "media_energy", "media_trim",
    "densest_subgraph", "engine_matching", "percolation_giant",
    "vertex_cover", "edge_churn", "decayed_pagerank", "rich_club",
    "community_conductance", "degree_gini", "type_mixing",
    "degree_connectivity", "transition_entropy", "engine_msf",
    "feature_prop", "partition_cut", "louvain_sync", "label_spread",
    "engine_coloring", "engine_mis", "wl_refine", "rectangles",
    "hitting_prob", "dag_levels", "triangle_communities", "rank_stability",
    "powerlaw_alpha", "edge_embeddedness", "densification_curve",
    "triad_census", "simrank_pairs",
    "url_blocklist", "rank_weighted_sample", "host_spam_mass",
    "doc_line_dedup", "doc_gopher_rules", "token_cms_topk", "doc_nfc",
    "heaps_law", "doc_readability", "hapax_rate", "doc_distinct_ngrams",
    # ---- r5 window rows, all driver-green in CORRECTNESS_r05 ----
    "rrf_fusion", "mmr_rerank", "host_anchor_terms", "emb_knn_label_purity",
    "basket_lift", "crawl_budget", "event_trigrams", "rfm_scores",
    "emb_label_outliers", "link_negatives", "decayed_activity",
    "emb_int8_audit", "order_backlog", "zorder_layout",
    "last_touch_attribution", "engine_msbfs", "doc_cdc_chunks",
    "engine_kcenter", "engine_ltcascade", "cliques4", "emb_power_iter",
    "bpe_merges", "skipgram_pmi", "posting_compression", "km_survival",
    "reach2_hist", "doc_trigram_novelty", "triangle_doulion",
    "emb_meandot_audit", "cuped_adjust", "markov_accuracy",
    "events_autocorr",
    "cusum_changepoint", "benford_audit", "table_profile", "sft_pairs",
    "markov_stationary", "spatial_nn_join", "k_anonymity",
    "skyline_parts", "winsorize_stats", "fk_integrity", "theil_sen_trend",
    "auc_mann_whitney", "calibration_bins", "engine_widest",
    "chi2_independence", "poisson_bootstrap", "holt_winters",
    "streaming_sink_counts",
    # NOTE: ann_lsh_topk / ann_pq_topk are rows-only by design (no oracle)
    # and can never enter the green union — they are exempted in
    # tests/test_gate_window.py (their correctness is gated by the
    # hash-checked ann_lsh_recall / ann_pq_recall rows) rather than pinned
    # to window slots that full hash rows can use.
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
    from linkgraph.streaming import registry as streaming_registry
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
    out.update({name: fn for name, (fn, _sql) in streaming_registry().items()})
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
    from linkgraph.streaming import registry as streaming_registry
    from linkgraph.textops import registry as textops_registry
    from linkgraph.webpipe import registry as webpipe_registry

    from linkgraph.graph_oracles import pagerank_fixed_sql

    out = {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
    for reg in (engine_registry(), datapipe_registry(), ann_registry(),
                multimodal_registry(), graphstats_registry(), webpipe_registry(),
                textops_registry(), streaming_registry()):
        out.update({name: sql for name, (_fn, sql) in reg.items() if sql is not None})
    # flagship: fixed 5-superstep PageRank, top-10 -> unrolled-CTE oracle
    out["pagerank_top10"] = pagerank_fixed_sql(5, limit=10, with_vid=True)
    return _prioritize(out)
