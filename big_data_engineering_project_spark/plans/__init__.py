"""Named query plans + DuckDB oracle SQL (the driver contract).

Importing this package populates the registry: every operator from
SURVEY.md §2 (and the north-star pipeline extensions) is exposed as a
named (spark, sf_dir) → DataFrame builder with, where SQL-expressible,
a matching ANSI-SQL oracle string.

Export order (`get_queries` / `get_oracles`) is GATE-PRIORITY order,
not registration order: harnesses that verify a bounded prefix of the
registry (the driver's correctness gate checked exactly the first 50
entries in rounds 1-2) must reach every operator family. The explicit
`DRIVER_PRIORITY` prefix below front-loads the LLM-pipeline operators
(dedup, ANN, text analysis, sampling, PII, temporal joins) alongside
one representative of each reference-operator family; the remainder —
all of which already hold driver-verified green rows in the committed
CORRECTNESS_r01/r02 artifacts — follow in registration order.
"""

from big_data_engineering_project_spark.plans.registry import (
    REGISTRY,
    QuerySpec,
)

# Populate the registry (import side effects; registration order is the
# within-module display order used by bench.py and docs).
from big_data_engineering_project_spark.plans import queries_reference  # noqa: E402,F401
from big_data_engineering_project_spark.plans import queries_tpch  # noqa: E402,F401
from big_data_engineering_project_spark.plans import queries_tpch2  # noqa: E402,F401
from big_data_engineering_project_spark.plans import queries_pipeline  # noqa: E402,F401
from big_data_engineering_project_spark.plans import queries_temporal  # noqa: E402,F401
from big_data_engineering_project_spark.plans import queries_behavior  # noqa: E402,F401
from big_data_engineering_project_spark.plans import queries_multimodal  # noqa: E402,F401

# First-50 gate priority: every query family gets at least one slot.
# The names NOT listed here (and therefore exported last) are exactly
# the ones with driver-green rows in BOTH committed r01 and r02
# artifacts — demoting them loses no verified evidence, while the
# previously-unchecked pipeline/temporal/sketch queries gain gate
# slots. Any NEW query must be inserted here (demoting an
# already-green reference query) or it will not receive a
# driver-verified row; keep the list at exactly 50 names.
DRIVER_PRIORITY: tuple[str, ...] = (
    # LLM-pipeline: dedup family
    "q_dedup_exact",
    "q_doc_fingerprint",
    "q_dedup_ngram_jaccard",
    "q_dedup_minhash_lsh",
    "q_simhash_neardups",
    "q_dedup_clusters",
    "q_semantic_dedup_pairs",
    # Round-5 rotation: q_editdist_neardups + q_embedding_centroids
    # (registered last round with no driver row — one was red until
    # this round's quantization fix) and the two new multimodal
    # queries take the slots of q_minhash_signatures, q_simhash_buckets,
    # q_tokenized_docs, q_counts_by_type — all four driver-green in the
    # committed r04 gate (and earlier artifacts).
    "q_editdist_neardups",
    # LLM-pipeline: similarity / ANN
    "q_embedding_topk",
    "q_embedding_neardup_pairs",
    "q_embedding_centroids",
    "q_embedding_lsh_topk",
    "q_embedding_ivf_topk",
    "q_embedding_kmeans",
    # Multimodal (round 5: driver-facing decode + histogram + frames;
    # q_media_frame_means takes q_stemmed_docs' slot — frame means has
    # an EXACT oracle where stemmed_docs is rows-only, so the slot buys
    # a strictly stronger check; stemmed_docs keeps pytest unit-vector
    # coverage + full-sweep rows-only evidence)
    "q_media_decode_stats",
    "q_media_histogram_topk",
    "q_media_frame_means",
    # LLM-pipeline: text analysis
    "q_lang_id",
    "q_token_stats_by_source",
    "q_bpe_token_counts",
    "q_repetition_scores",
    "q_tfidf_top_terms",
    "q_mean_token_freq",
    "q_collocations",
    "q_pii_redaction",
    # LLM-pipeline: sampling / mixing + composed curation pass
    # (round 6: q_hash_split — driver-green in the committed r04 AND
    # r05 gates — rotates out for the new πps weighted sample, whose
    # oracle additionally proves the integer Horvitz-Thompson path)
    "q_weighted_sample_ht",
    "q_stratified_sample",
    "q_mixing_weights",
    "q_pack_sequences",
    "q_decontaminate_train",
    "q_curation_pipeline",
    # LLM-pipeline: segment-level (line-style) dedup signal
    "q_dup_segment_fraction",
    # Temporal joins (q_spike_window_counts demoted r5, driver-green
    # r03+r04; the salted as-of takes its slot — its oracle is the
    # direct ASOF JOIN, so the gate proves salted ≡ unsalted each round)
    "q_asof_last_purchase",
    "q_asof_salted",
    # Round-6 rotation: the salted-FORWARD as-of completes the
    # {backward, forward} × {unsalted, salted} matrix under the gate;
    # q_quality_scores demoted (driver-green in the committed r04 AND
    # r05 gates; the text-analysis family keeps 7 other slots).
    "q_asof_forward_salted",
    # Sketches / hierarchical rollup + set algebra
    "q_kmv_distinct_users",
    "q_kmv_set_ops",
    "q_rollup_cascade",
    # Behavior analytics (round 4 + round-5 cohort/WAU; round 6 demotes
    # q_session_stats, q_event_transitions, q_user_rolling_avg — each
    # driver-green in the committed r04 AND r05 gates — to slot in the
    # round-6 sketch/join operators below; the family keeps 4 slots)
    # (round 6 cont.: q_funnel_conversion + q_value_quantiles_by_type
    # — both driver-green in the committed r04 AND r05 gates — rotate
    # out for integer PageRank, the registry's only ITERATIVE
    # fixed-point under an exact oracle, and the LOCF gap-fill, the
    # temporal family's continuous-grid member)
    "q_cohort_retention",
    "q_rolling_active_users",
    "q_pagerank_event_graph",
    "q_gap_fill_6h",
    # Round-6 additions: the count-min estimator and the bloom-pruned
    # semi join are END-TO-END proven by their oracles (CM counters are
    # bit-identical cross-engine; bloom ≡ plain EXISTS), and the Q21
    # last-to-ship analysis is the most join+window-complex member of
    # the completed TPC-H suite — the gate's one slot covers the
    # suite's hardest shape.
    "q_cm_heavy_hitters",
    "q_bloom_semi_orders",
    "q_blocking_suppliers",
    # Round-5 text/sampling additions
    "q_bigram_min_prob",
    "q_importance_weights",
    "q_chunk_documents",
    # Reference operators (one slot per family; every name demoted over
    # rounds 4-5 — q_counts_by_type_hour, q_filter_high_value,
    # q_time_of_day, q_clean_text, q_sentiment, q_udtf_word_positions,
    # q_counts_by_type, q_peak_hour_per_type, q_zscore_anomalies,
    # q_word_counts_top15, q_enrich_events, q_tumbling_hourly_counts,
    # q_pricing_summary — holds driver-green rows in two or more
    # committed artifacts)
    "q_serving_try_cast",
    # TPC-H joins / SQL surface
    "q_nation_revenue",
)


def _ordered_names() -> list[str]:
    missing = [n for n in DRIVER_PRIORITY if n not in REGISTRY]
    if missing:  # drift guard: a renamed query must update the priority list
        raise KeyError(f"DRIVER_PRIORITY names not in registry: {missing}")
    rest = [n for n in REGISTRY if n not in set(DRIVER_PRIORITY)]
    return list(DRIVER_PRIORITY) + rest


def get_queries():
    """name → builder, gate-priority order (see module docstring)."""
    return {n: REGISTRY[n].builder for n in _ordered_names()}


def get_oracles():
    """name → DuckDB SQL, gate-priority order, rows-only queries omitted."""
    return {
        n: REGISTRY[n].oracle
        for n in _ordered_names()
        if REGISTRY[n].oracle is not None
    }


__all__ = [
    "REGISTRY",
    "QuerySpec",
    "get_queries",
    "get_oracles",
    "DRIVER_PRIORITY",
]
