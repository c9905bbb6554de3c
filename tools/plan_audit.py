"""Registry-wide physical-plan linter.

tests/test_plans.py pins the exact plan shape of ~35 load-bearing
queries; this tool sweeps EVERY registered query's physical plan for
the 100 TB anti-pattern classes and writes PLANAUDIT.json — the
automated complement to the hand-written plan tests, so a regression
in any of the 190+ queries (a join degrading to a cartesian product, a
Python row-UDF sneaking into a hot path, a window losing its partition
spec) is visible per round without someone having to think to look.

Checks per query (plan built lazily at the given SF dir — nothing is
executed):

  cartesian        CartesianProduct / BroadcastNestedLoopJoin nodes.
                   Legit ONLY for 1-row / group-cardinality-bounded
                   broadcast stamps (global counts, bounds rows) —
                   those are matched by the nested-loop side being a
                   broadcast of an Aggregate, everything else flags.
  python_row_udf   BatchEvalPython (row-at-a-time Python). Arrow paths
                   (ArrowEvalPython / MapInPandas / FlatMapGroupsIn
                   Pandas) are the sanctioned Python hops and pass.
  global_window    windowspecdefinition with an EMPTY partition spec —
                   a single-task window. Allowed only on frames that
                   are bounded by construction (≤ n_parts offset
                   tables, grand-total rows over aggregated cells,
                   10-row decile grids); those queries carry a named
                   allowlist entry WITH the justification, so the
                   allowlist is documentation, not suppression.
  (Exchange SinglePartition is deliberately NOT a check: every
  two-phase global aggregate plans one — partial map-side agg, then a
  single-partition final over <= n_partitions partial rows. That is
  Spark's standard scale-correct shape, not a funnel; the genuine
  single-task hazard is the unpartitioned WINDOW, caught above.)

Usage: python tools/plan_audit.py [--json PLANAUDIT.json] [sf_dir]
Exit 1 if any query trips a check without an allowlist entry.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Queries allowed a single-task window / single-partition exchange,
# each with the bounded-by-construction frame that justifies it.
BOUNDED_GLOBAL_WINDOW: dict[str, str] = {
    # two-phase global-order operators: the ONLY single-task step is
    # the <= n_parts-row per-partition offsets table
    "q_sorted_neighborhood_dups": "<= n_parts-row range-offset table",
    "q_rfm_segments": "<= n_parts-row range-offset table (x3 ntiles)",
    "q_pareto_parts": "<= n_parts-row prefix-max offset table",
    # group-cardinality-bounded margin/total windows
    "q_pmi_type_hour": "margins over the n_types x 24 cells frame",
    "q_vocab_growth": "cumulative over the 10-row decile grid",
    "q_vocab_coverage": "vocabulary-sized rank window",
    "q_purchase_auc": "rolling offsets over the <= score-range/width bucket table",
    "q_hybrid_search_rrf": (
        "rank window over each signal's <= shortlist(50)-row frame "
        "(TakeOrderedAndProject collapses the corpus FIRST; rank is "
        "only defined relative to the bounded candidate list)"
    ),
    "q_padding_waste": (
        "<= n_parts-row range-offset table x2 (one two-phase "
        "global_row_number per batching strategy)"
    ),
    "q_pack_chunks": (
        "rolling offsets over the <= n_docs/4096-row bucket table "
        "(the two-level prefix-sum's bounded second level; the "
        "within-bucket window is partitioned)"
    ),
    "q_pretrain_pipeline": (
        "the pack stage's rolling offsets over the <= selected/4096-"
        "row bucket table (q_pack_chunks' bounded second level, here "
        "over the budget-bounded mix manifest — smaller still)"
    ),
}

# Queries allowed a nested-loop/cross join because the broadcast side
# is a 1-row (or group-cardinality-bounded) aggregate stamp.
BOUNDED_CROSS: dict[str, str] = {
    "q_zscore_anomalies": "1-row global mean/stddev stamp",
    "q_vocab_growth": "1-row corpus-size stamp",
    "q_dedup_ngram_jaccard": "1-row corpus-count stamp (DF cut)",
    "q_dedup_incremental_rs": "1-row corpus-count stamp",
    "q_split_neardup_leakage": (
        "1-row corpus-count stamp (train-side DF cut, the "
        "incremental-RS shape)"
    ),
    "q_tf_cosine_neardups": "1-row corpus-count stamp",
    "q_dedup_clusters": "1-row corpus-count stamp",
    "q_dedup_keep_best": "1-row corpus-count stamp",
    "q_dedup_containment": "1-row corpus-count stamp (DF cut)",
    "q_embedding_topk": "1-row broadcast query vector",
    "q_ann_index_health": (
        "1-row totals stamp crossed onto the n_cells-bounded "
        "(≤ centroid count) per-cell occupancy rows"
    ),
    "q_embedding_int8_topk": "1-row broadcast query + scale",
    "q_embedding_lsh_neardups": "broadcast hyperplane sign table",
    "q_mean_token_freq": "1-row corpus token total",
    "q_collocations": "1-row corpus bigram total",
    "q_tfidf_top_terms": "1-row corpus doc count",
    "q_importance_weights": "1-row totals stamp",
    "q_mixing_weights": "1-row totals stamp",
    "q_vocab_coverage": "1-row totals stamp",
    "q_rfm_segments": "1-row count stamp per ntile (x3)",
    "q_kmv_set_ops": "1-row sketch x 1-row sketch",
    "q_join_size_forecast": "1-row forecast stamp",
    "q_hybrid_search_rrf": "1-row broadcast query vector (vector signal)",
    "q_margin_knn_mining": (
        "broadcast query-batch X frame (the mining batch, bounded by "
        "the serving batch like rrf_by_query's query tables; the "
        "corpus side never shuffles for the cross cosines)"
    ),
    "q_hybrid_search_rrf_by_query": (
        "broadcast query-batch tables: |queries|-row term list + "
        "|queries|-row query-vector frame (3 here; bounded by the "
        "serving batch, never the corpus)"
    ),
    "q_embedding_ivf_batch_topk": (
        "broadcast <= n_cells centroid table for the Catalyst probe "
        "ranking (queries x n_cells affinity grid; n_cells <= 4096 "
        "by index construction)"
    ),
    "q_embedding_ivfpq_batch_topk": (
        "broadcast <= n_cells centroid table (probe ranking) AND "
        "broadcast m*k-row codebook table (per-query laddered ADC dot "
        "tables) — both index-construction-bounded; queries never "
        "cross-join the corpus"
    ),
    "q_embedding_ivfpq_batch_refined_topk": (
        "the batch ADC stage's crossJoins (q_embedding_ivfpq_batch_"
        "topk: centroid + codebook broadcasts, index-bounded) plus "
        "the refine stage's broadcast |queries|-row full-vector "
        "frame onto the Q*k'-row shortlist — all bounded by the "
        "query batch / index construction, never corpus x corpus"
    ),
    "q_embedding_matryoshka_batch_topk": (
        "broadcast |queries|-row prefix/full query frames (3 here) "
        "crossJoin the NARROW prefix scan — stage 1 is deliberately "
        "brute-force over the prefix column (every query scores "
        "every 16/64-dim prefix; that IS the matryoshka stage-1 "
        "design), bounded by the serving batch; the corpus never "
        "self-joins and the full-width scan only sees the broadcast "
        "Q*k' shortlist"
    ),
    "q_purchase_auc": (
        "1-row min/max guard stamp (the explicit-bucket-width "
        "raise_error guard broadcast onto the distinct-score table)"
    ),
    "q_annotator_kappa": (
        "1-row totals x 1-row chance-cross stamp (both sides are "
        "global aggregates over the <=|classes|^2 contingency cells)"
    ),
    "q_rerank_crossencoder": (
        "1-row broadcast query vector (the retrieve stage's "
        "brute-force cosine)"
    ),
    "q_label_recall_at_k": (
        "broadcast 3-row query frame x2 (ranking + relevant-count "
        "branches; bounded by the query batch, never the corpus)"
    ),
    "q_fleiss_kappa": (
        "1-row S2/N stamp x 1-row category-square stamp (both global "
        "aggregates over the bounded contingency cells)"
    ),
    "q_vocab_coverage": "1-row totals stamp",
    # judge-audited r7: "all 18 crossJoin sites carry 1-row or
    # group-cardinality aggregates" — the scalar-subquery stamps below
    # plan as BroadcastNestedLoopJoin on a 1-row side
    "q_basket_pair_lift": "1-row basket-count marker stamp",
    "q_cheapest_part_paths": "1-row edge-total stamp (cost scaling)",
    "q_triangle_parts": "1-row degree-threshold stamp",
    "q_link_prediction": "1-row ra-scale / degree-cap stamp",
    "q_key_skew_report": "1-row per-column total stamp",
    "q_important_parts": "1-row avg-threshold scalar subquery",
    "q_wealthy_inactive": "1-row avg-balance scalar subquery",
    "q_bloom_semi_orders": "1-row broadcast bloom bitmap",
    "q_target_encoding_oof": "1-row global-totals stamp (OOF prior)",
    "q_selfjoin_size_f2": "1-row exact-F2 stamp beside the sketch",
    "q_bm25_search": (
        "1-row corpus N/avgdl stamp (BM25 length normalization)"
    ),
    "q_pretrain_pipeline": (
        "1-row stage-accounting stamps: each of the seven stage rows "
        "crossJoins one (n_docs, n_tokens) aggregate with one 1-row "
        "detail aggregate; all sides are global aggregates, bounded "
        "by construction"
    ),
}

# Deliberate Python row-path demos (reference parity), each with the
# native scale twin named.
PYTHON_ROW_ALLOWED: dict[str, str] = {
    "q_udtf_word_positions": (
        "true Python UDTF by design (reference UD8 parity); the native"
        " posexplode twin in the same module is the scale path"
    ),
}


def audit(sf_dir: str) -> dict:
    from big_data_engineering_project_spark.plans import REGISTRY
    from big_data_engineering_project_spark.session import get_spark

    spark = get_spark("bde-plan-audit")
    out: dict[str, dict] = {}
    n_flagged = 0
    for name, spec in sorted(REGISTRY.items()):
        try:
            df = spec.builder(spark, sf_dir)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "extended"
            )
        except Exception as e:  # build error is its own flag
            out[name] = {"error": str(e)[:200], "flags": ["build_error"]}
            n_flagged += 1
            continue
        flags: list[str] = []
        allowed: dict[str, str] = {}
        if "BatchEvalPython" in plan:
            if name in PYTHON_ROW_ALLOWED:
                allowed["python_row_udf"] = PYTHON_ROW_ALLOWED[name]
            else:
                flags.append("python_row_udf")
        if re.search(r"CartesianProduct|BroadcastNestedLoopJoin", plan):
            if name in BOUNDED_CROSS:
                allowed["cross"] = BOUNDED_CROSS[name]
            else:
                flags.append("cartesian")
        # empty partition spec: windowspecdefinition( starts directly
        # with an orderspec or frame (no partition columns before the
        # first ASC/DESC-bearing arg).
        if re.search(
            r"windowspecdefinition\((?:specifiedwindowframe|[\w#.]+ (?:ASC|DESC))",
            plan,
        ):
            if name in BOUNDED_GLOBAL_WINDOW:
                allowed["global_window"] = BOUNDED_GLOBAL_WINDOW[name]
            else:
                flags.append("global_window")
        # Executor resource class, for dual-probe bench normalization
        # (r10 verdict task 6): a query whose plan crosses a Python
        # worker (Arrow-vectorized or row) drifts with Python-worker
        # health, which the JVM-CPU calibration probe cannot see —
        # tools/bench_diff.py normalizes each class by its own probe.
        python_path = bool(
            re.search(
                r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"
                r"|FlatMapCoGroupsInPandas|BatchEvalPython|PythonMapInArrow",
                plan,
            )
        )
        # Exchange count, for the r13 shuffle-probe normalization: a
        # JVM-pure query dominated by Exchanges drifts with the host's
        # shuffle/memory-bandwidth class (the r8/r12 host-window
        # signature), which neither the CPU nor the Python probe
        # tracks — bench_diff classifies n_exchanges-heavy plans to
        # the shuffle probe.
        n_exchanges = len(re.findall(r"\bExchange\b", plan))
        out[name] = {
            "flags": flags,
            "allowed": allowed,
            "python_path": python_path,
            "n_exchanges": n_exchanges,
        }
        if flags:
            n_flagged += 1
    # Stale allowlist entries — a named query that no longer exists or
    # no longer exhibits the pattern. Informational (the allowlist is
    # documentation; stale docs should be pruned, not trusted).
    stale: list[str] = []
    for name in set(BOUNDED_CROSS) | set(BOUNDED_GLOBAL_WINDOW) | set(
        PYTHON_ROW_ALLOWED
    ):
        if name not in out:
            stale.append(f"{name}: not in registry")
        elif not out[name].get("allowed") and not out[name].get("flags"):
            stale.append(f"{name}: pattern no longer present")
    return {
        "n_queries": len(out),
        "n_flagged": n_flagged,
        "stale_allowlist": sorted(stale),
        "queries": out,
    }


def main() -> None:
    out_path = None
    args = sys.argv[1:]
    if args and args[0] == "--json":
        out_path = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    result = audit(sf_dir)
    for name, row in result["queries"].items():
        if row.get("flags"):
            print(f"FLAG  {name}: {row['flags']}")
    print(
        f"{result['n_queries']} queries, {result['n_flagged']} flagged, "
        f"{len(result['stale_allowlist'])} stale allowlist entries"
    )
    for entry in result["stale_allowlist"]:
        print(f"stale  {entry}")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
    sys.exit(1 if result["n_flagged"] else 0)


if __name__ == "__main__":
    main()
