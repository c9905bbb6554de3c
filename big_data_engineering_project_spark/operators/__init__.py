"""Relational + pipeline operators (SURVEY.md §2).

analytics  — A1–A9, W1, O1–O6, U1 (the notebook's query set)
joins      — broadcast/sort-merge/semi/anti layer (§2.5 north-star)
anomaly    — A6+M2+F6 z-score (batch + foreachBatch form)
serving    — the Athena serving query port (P8 try_cast + F2 filters)
dedup      — exact / minhash-LSH / simhash / n-gram-Jaccard /
             embedding near-dup (north-star training-data ops)
similarity — brute-force + LSH-bucketed ANN over embeddings
text_analysis — lang-ID, quality score, token stats, fingerprints
temporal   — as-of join matrix, band join, gap-fill LOCF, OHLC bars
behavior   — sessions, funnel, transitions, rolling, journeys
sketches   — KMV, count-min, histogram/HDR quantiles
graph      — PageRank, label propagation, triangle counting
sampling   — hash splits, stratified, πps + Horvitz-Thompson
profiling  — table profile, FK-orphan audit, key-skew report
cdc        — SCD Type 2 history, as-of snapshots, table diff
association — market-basket frequent pairs + lift
bloom      — broadcast bloom-pruned semi join
redaction / upsert — PII regexes; keyed upsert + bucketed tables
"""
