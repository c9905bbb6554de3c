"""Candidate-discipline growth probe (r8 verdict task 7).

For the four round-8 pair-generating operators — TF-cosine near-dups,
shingle-containment near-supersets, cosine-LSH embedding near-dups,
and link prediction's wedge join — measures CANDIDATES GENERATED vs
PAIRS VERIFIED at two scale factors, so SCALING.md can pin that the
candidate cuts (DF band, stop-shingle analog, max_bucket_fraction,
hub-center cap) actually bound growth instead of merely existing.

Each candidate stage below replicates the operator's own candidate
sub-plan (file:line cited inline); the verified count is the REAL
operator/registered-query output. If an operator's candidate rule
changes, update the matching stanza here — the numbers land in
SCALING.md's round table either way, so drift is visible as a
discontinuity.

Usage: python tools/growth_probe.py [sf_dir ...]
Prints one JSON line per (operator, sf).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from big_data_engineering_project_spark.session import get_spark  # noqa: E402
from big_data_engineering_project_spark.sources.catalog import load_table  # noqa: E402


def tf_cosine(spark, sf_dir: str) -> dict:
    # candidate rule of operators/dedup.py:tf_cosine_pairs — pairs
    # sharing >=1 term with df in [2, 0.1*n]; verified = registered
    # q_tf_cosine_neardups output
    from big_data_engineering_project_spark.plans import REGISTRY

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id").alias("_id"),
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"),
    ).filter(F.col("w") != "")
    tf = toks.groupBy("_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.count()
    rare = (
        tf.groupBy("w")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter((F.col("_df") >= 2) & (F.col("_df") <= int(0.1 * n_docs)))
        .select("w")
    )
    tfr = tf.join(rare, "w")
    cand = (
        tfr.alias("a")
        .join(
            tfr.alias("b"),
            (F.col("a.w") == F.col("b.w")) & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id"), F.col("b._id"))
        .distinct()
        .count()
    )
    verified = REGISTRY["q_tf_cosine_neardups"].builder(spark, sf_dir).count()
    return {"n_docs": n_docs, "candidates": cand, "verified": verified}


def containment(spark, sf_dir: str) -> dict:
    # candidate rule of operators/dedup.py:shingle_containment_pairs —
    # distinct pairs sharing >=1 NON-STOP shingle (the inverted-index
    # join after the registered query's stop-shingle cut, before the
    # integer threshold); verified = q_dedup_containment
    from big_data_engineering_project_spark.operators.dedup import (
        hashed_shingle_table,
    )
    from big_data_engineering_project_spark.plans import REGISTRY
    from big_data_engineering_project_spark.plans.queries_pipeline import (
        MAX_SHINGLE_DF_FRAC,
        MIN_SHINGLE_DF_CUT,
    )

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    hashed = hashed_shingle_table(docs, "doc_id", "text", 3).persist()
    inv = hashed.select("doc", F.explode("hv").alias("s"))
    cut = max(MIN_SHINGLE_DF_CUT, int(MAX_SHINGLE_DF_FRAC * n_docs), 1)
    hot = (
        inv.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > cut)
        .select("s")
    )
    inv = inv.join(F.broadcast(hot), "s", "left_anti")
    cand = (
        inv.alias("a")
        .join(
            inv.alias("b"),
            (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc"), F.col("b.doc"))
        .distinct()
        .count()
    )
    verified = REGISTRY["q_dedup_containment"].builder(spark, sf_dir).count()
    hashed.unpersist()
    return {"n_docs": n_docs, "candidates": cand, "verified": verified}


def cosine_lsh(spark, sf_dir: str) -> dict:
    # candidate rule of operators/similarity.py:cosine_lsh_neardups —
    # distinct pairs sharing an allowed (band, bkey) bucket, with the
    # same max_bucket_fraction cut as the registered query; verified =
    # q_embedding_lsh_neardups output
    from big_data_engineering_project_spark.operators.similarity import (
        neardup_sign_matrix,
        spread,
    )
    from big_data_engineering_project_spark.plans import REGISTRY

    dims, n_bits, band_bits, scale, frac = 64, 24, 6, 1000, 0.1
    emb = load_table(spark, sf_dir, "embeddings")
    q = spread(emb).select(
        F.col("vec_id").alias("_id"),
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * F.lit(scale)).cast("long"),
        ).alias("_qv"),
    )
    signs = neardup_sign_matrix(dims, n_bits)
    sgn = spark.createDataFrame(
        [(i, j, signs[i][j]) for i in range(dims) for j in range(n_bits)],
        "i int, j int, s int",
    )
    comp = q.select("_id", F.posexplode("_qv").alias("i", "v"))
    proj = (
        comp.join(F.broadcast(sgn), "i")
        .groupBy("_id", "j")
        .agg(F.sum(F.col("v") * F.col("s")).alias("_p"))
    )
    bands = (
        proj.groupBy("_id", (F.col("j") - F.col("j") % band_bits).alias("_j0"))
        .agg(
            F.sum(
                F.when(
                    F.col("_p") >= 0,
                    F.expr(f"shiftleft(1, j % {band_bits})"),
                ).otherwise(F.lit(0))
            ).alias("bkey")
        )
        .select(
            "_id",
            (F.col("_j0") / band_bits).cast("int").alias("band"),
            F.col("bkey").cast("long").alias("bkey"),
        )
    )
    n = q.count()
    allowed = (
        bands.groupBy("band", "bkey")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") <= int(-(-frac * n // 1)))
        .select("band", "bkey")
    )
    bands = bands.join(F.broadcast(allowed), ["band", "bkey"], "left_semi")
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id"), F.col("b._id"))
        .distinct()
        .count()
    )
    verified = (
        REGISTRY["q_embedding_lsh_neardups"].builder(spark, sf_dir).count()
    )
    return {"n_vectors": n, "candidates": cand, "verified": verified}


def link_pred(spark, sf_dir: str) -> dict:
    # candidate rule of operators/graph.py:link_prediction — wedges
    # through capped centers (the registered hub cap, plans/
    # queries_warehouse.py:_LINKPRED_MAX_CENTER_DEG); verified =
    # q_link_prediction output (>=1 common neighbor, non-adjacent)
    from big_data_engineering_project_spark.operators.association import (
        frequent_pairs,
    )
    from big_data_engineering_project_spark.plans import REGISTRY
    from big_data_engineering_project_spark.plans.queries_warehouse import (
        _LINKPRED_MAX_CENTER_DEG,
        _TRI_MIN_SUPPORT,
    )

    li = load_table(spark, sf_dir, "lineitem")
    e = (
        frequent_pairs(li, "l_orderkey", "l_partkey")
        .filter(F.col("pair_support") >= _TRI_MIN_SUPPORT)
        .select(F.col("item_a").alias("a"), F.col("item_b").alias("b"))
    )
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = (
        und.groupBy("a")
        .agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") <= _LINKPRED_MAX_CENTER_DEG)
    )
    ctr = und.join(deg, "a").select(F.col("a").alias("z"), F.col("b").alias("n"))
    wedges = (
        ctr.alias("l")
        .join(
            ctr.alias("r"),
            (F.col("l.z") == F.col("r.z")) & (F.col("l.n") < F.col("r.n")),
        )
        .count()
    )
    verified = REGISTRY["q_link_prediction"].builder(spark, sf_dir).count()
    return {
        "n_edges": e.count(),
        "candidates": wedges,
        "verified": verified,
    }


def minhash_lsh(spark, sf_dir: str) -> dict:
    # candidate rule of operators/dedup.py:minhash_lsh_pairs — distinct
    # doc pairs sharing >=1 (band, bucket) from minhash_band_buckets
    # over the same shared shingle frame the registered query uses;
    # verified = q_dedup_minhash_lsh output (Jaccard >= threshold)
    from big_data_engineering_project_spark.operators.dedup import (
        minhash_band_buckets,
        with_minhash_signature,
    )
    from big_data_engineering_project_spark.plans import REGISTRY
    from big_data_engineering_project_spark.plans.queries_pipeline import (
        NGRAM_N,
        _shared_hashed,
    )

    hashed = _shared_hashed(spark, sf_dir, NGRAM_N)
    n_docs = hashed.count()
    sigs = with_minhash_signature(hashed).select("doc", "sig")
    buckets = minhash_band_buckets(sigs)
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc"), F.col("b.doc"))
        .distinct()
        .count()
    )
    verified = REGISTRY["q_dedup_minhash_lsh"].builder(spark, sf_dir).count()
    return {"n_docs": n_docs, "candidates": cand, "verified": verified}


def simhash_bands(spark, sf_dir: str) -> dict:
    # candidate rule of operators/dedup.py:simhash_neardup_pairs
    # (strategy='bands'): distinct doc pairs matching >=1 of the
    # max_hamming+1 pigeonhole bands of the 60-bit mixed fingerprint;
    # verified = q_simhash_neardups output (popcount(xor) <= k)
    from big_data_engineering_project_spark.operators import dedup
    from big_data_engineering_project_spark.plans import REGISTRY
    from big_data_engineering_project_spark.plans.queries_pipeline import (
        _NEARDUP_BITS,
        _NEARDUP_MAX_HAMMING,
    )
    from big_data_engineering_project_spark.sources.catalog import spread

    bits, k = _NEARDUP_BITS, _NEARDUP_MAX_HAMMING
    docs = spread(load_table(spark, sf_dir, "documents"))
    n_docs = docs.count()
    fp = docs.select(
        F.col("doc_id").alias("doc"),
        dedup.simhash_mixed_col(
            dedup.tokens_col(F.col("text")), bits=bits
        ).alias("simhash"),
    )
    banded = dedup.simhash_band_table(fp, bits, k).drop("simhash")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc"), F.col("b.doc"))
        .distinct()
        .count()
    )
    verified = REGISTRY["q_simhash_neardups"].builder(spark, sf_dir).count()
    return {"n_docs": n_docs, "candidates": cand, "verified": verified}


def simhash_bands_weighted(spark, sf_dir: str) -> dict:
    # r10 verdict task 7: the IDF-weighted fingerprint experiment
    # (operators/dedup.py:simhash_weighted_fingerprints) measured
    # beside the unweighted row — same band layout, same popcount<=k
    # verify, but bit votes are floor(log2(n/df)) instead of +-1.
    # `verified_overlap` counts weighted-verified pairs that the
    # UNWEIGHTED operator also verifies: the semantics change, so the
    # default only flips if the trade (candidate mass/precision)
    # justifies deliberately regenerating the registered oracle.
    from big_data_engineering_project_spark.operators import dedup
    from big_data_engineering_project_spark.plans import REGISTRY
    from big_data_engineering_project_spark.plans.queries_pipeline import (
        _NEARDUP_BITS,
        _NEARDUP_MAX_HAMMING,
    )
    from big_data_engineering_project_spark.sources.catalog import spread

    bits, k = _NEARDUP_BITS, _NEARDUP_MAX_HAMMING
    docs = spread(load_table(spark, sf_dir, "documents"))
    n_docs = docs.count()
    fp = dedup.simhash_weighted_fingerprints(docs, "doc_id", "text", bits=bits)
    banded = dedup.simhash_band_table(fp, bits, k).drop("simhash")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b")
        )
        .distinct()
    )
    fa = fp.select(F.col("doc").alias("doc_a"), F.col("simhash").alias("__fa"))
    fb = fp.select(F.col("doc").alias("doc_b"), F.col("simhash").alias("__fb"))
    verified_df = (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .filter(
            F.bit_count(F.col("__fa").bitwiseXOR(F.col("__fb"))) <= k
        )
        .select("doc_a", "doc_b")
    )
    verified = verified_df.count()
    unweighted = (
        REGISTRY["q_simhash_neardups"]
        .builder(spark, sf_dir)
        .select("doc_a", "doc_b")
    )
    overlap = verified_df.join(unweighted, ["doc_a", "doc_b"], "left_semi").count()
    return {
        "n_docs": n_docs,
        "candidates": cand.count(),
        "verified": verified,
        "verified_overlap_with_unweighted": overlap,
        "unweighted_verified": unweighted.count(),
    }


def phash_bands(spark, sf_dir: str) -> dict:
    # candidate rule of operators/dedup.py:phash_neardup_pairs —
    # distinct media pairs matching >=1 pigeonhole band of the two-word
    # 64-bit aHash (the SHARED phash_band_table, so this replica cannot
    # drift from the shipped rule); verified = q_media_phash_neardups
    # output (popcount(xor) <= k over both words)
    from big_data_engineering_project_spark.multimodal.columns import (
        load_media,
        perceptual_hash,
    )
    from big_data_engineering_project_spark.operators.dedup import (
        phash_band_table,
    )
    from big_data_engineering_project_spark.plans import REGISTRY
    from big_data_engineering_project_spark.plans.queries_multimodal import (
        _PHASH_K,
    )

    media = load_media(spark, sf_dir)
    n_media = media.count()
    banded = phash_band_table(perceptual_hash(media), _PHASH_K)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc"), F.col("b.doc"))
        .distinct()
        .count()
    )
    verified = (
        REGISTRY["q_media_phash_neardups"].builder(spark, sf_dir).count()
    )
    return {"n_media": n_media, "candidates": cand, "verified": verified}


def fs_blocking(spark, sf_dir: str) -> dict:
    # candidate discipline of operators/linkage.py:fellegi_sunter_pairs
    # as registered (q_fs_linkage_scores): (nation, segment) blocks,
    # degenerate blocks > 500 rows cut BEFORE the self-join. Every
    # blocked pair is scored (scoring filters nothing), so `candidates`
    # IS the pair mass the blocking admits — the growth number — and
    # the discriminative outputs are the link/possible verdict counts.
    from big_data_engineering_project_spark.operators.linkage import (
        fellegi_sunter_pairs,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
        (F.col("c_acctbal") >= 0).alias("bal_pos"),
        (F.expr("CAST(right(c_name, 1) AS INT)") % 2).alias("name_par"),
    )
    n_rows = cust.count()
    blk = cust.groupBy("nk", "seg").agg(F.count(F.lit(1)).alias("c"))
    kept_blocks = blk.filter(F.col("c") <= 500)
    pairs = fellegi_sunter_pairs(
        cust,
        "id",
        ["nk", "seg"],
        [("bal_band", 18, -7), ("bal_pos", 2, -12), ("name_par", 5, -5)],
        max_block_size=500,
    )
    agg = pairs.agg(
        F.count(F.lit(1)).alias("cand"),
        F.sum(F.when(F.col("score") >= 20, 1).otherwise(0)).alias("links"),
        F.sum(
            F.when((F.col("score") >= 0) & (F.col("score") < 20), 1)
            .otherwise(0)
        ).alias("possible"),
    ).collect()[0]
    mx = blk.agg(F.max("c").alias("m")).collect()[0]["m"]
    return {
        "n_rows": n_rows,
        "n_blocks": blk.count(),
        "blocks_kept": kept_blocks.count(),
        "largest_block": int(mx),
        "candidates": int(agg["cand"]),
        "verified": int(agg["links"]),
        "possible": int(agg["possible"]),
    }


def pretrain_pipeline(spark, sf_dir: str) -> dict:
    """Composed-pipeline growth row (r12 verdict task 7): the
    per-stage SURVIVOR accounting of the registered
    q_pretrain_pipeline (gate → lang-ID → dedup → decontam → mix →
    pack), as stage-survivor doc fractions vs the raw corpus, plus
    the dedup stage's candidate mass (the MinHash band-bucket pair
    count over the GATE+LANG survivor set — the composed interaction
    a 100 TB operator actually runs: the gate shrinks the corpus the
    dedup stage shingles, so candidate growth must be read at the
    composed stage input, not the raw corpus). The stage rows are the
    registered query's own output (exact-oracle-gated), so this probe
    can't drift from the operator."""
    from big_data_engineering_project_spark.plans import REGISTRY

    rows = REGISTRY["q_pretrain_pipeline"].builder(spark, sf_dir).collect()
    rows = sorted(rows, key=lambda r: r["stage_idx"])
    raw_docs = rows[0]["n_docs"]
    stages = {
        r["stage"]: {
            "n_docs": r["n_docs"],
            "n_tokens": r["n_tokens"],
            "frac_of_raw": round(r["n_docs"] / raw_docs, 4) if raw_docs else None,
        }
        for r in rows
    }
    # dedup-stage candidate mass over the COMPOSED survivor input:
    # replicate the gate+lang survivor selection the registered
    # pipeline feeds its dedup stage (queries_pipeline.py:
    # q_pretrain_pipeline — fused text_profile_col → source_gate_finish
    # → lang == 'en'), then the band-bucket candidate rule
    # (dedup.py:minhash_lsh_pairs) on the survivor-filtered shared
    # shingle frame, exactly as hashed2 in the query body.
    from big_data_engineering_project_spark.operators.dedup import (
        minhash_band_buckets,
        with_minhash_signature,
    )
    from big_data_engineering_project_spark.operators.governance import (
        source_gate_finish,
    )
    from big_data_engineering_project_spark.operators.text_analysis import (
        fingerprint_col,
        text_profile_col,
    )
    from big_data_engineering_project_spark.plans.queries_pipeline import (
        _GATE_MAX_DUP,
        _GATE_MIN_DOCS,
        _GATE_MIN_Q,
        NGRAM_N,
        _shared_hashed,
    )

    docs = load_table(spark, sf_dir, "documents")
    prof = text_profile_col(F.col("text"))
    base = docs.select(
        F.col("doc_id").alias("doc"),
        "source",
        prof.alias("_p"),
        F.coalesce(fingerprint_col(F.col("text")), F.lit(-1).cast("long")).alias(
            "fp"
        ),
    ).select(
        "doc",
        "source",
        F.col("_p.lang").alias("lang"),
        F.floor(F.col("_p.quality") * F.lit(1048576.0))
        .cast("long")
        .alias("q_int"),
        "fp",
    )
    state = base.groupBy("source", F.col("fp").alias("__fp")).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("q_int").cast("long").alias("__sq"),
    )
    passed = (
        source_gate_finish(state, _GATE_MIN_DOCS, _GATE_MIN_Q, _GATE_MAX_DUP)
        .filter(F.col("passed"))
        .select("source")
    )
    surv = (
        base.join(F.broadcast(passed), "source")
        .filter(F.col("lang") == "en")
        .select("doc")
    )
    n_surv = surv.count()
    hashed2 = _shared_hashed(spark, sf_dir, NGRAM_N).join(
        surv, "doc", "left_semi"
    )
    buckets = minhash_band_buckets(
        with_minhash_signature(hashed2).select("doc", "sig")
    )
    cand = (
        buckets.alias("a")
        .join(
            buckets.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc"), F.col("b.doc"))
        .distinct()
        .count()
    )
    return {
        "stages": stages,
        "dedup_input_docs": n_surv,
        "dedup_candidates": cand,
        "cand_frac_of_n2": round(cand / (n_surv * (n_surv - 1) / 2), 6)
        if n_surv > 1
        else None,
    }


PROBES = {
    "tf_cosine_neardups": tf_cosine,
    "containment_neardups": containment,
    "cosine_lsh_neardups": cosine_lsh,
    "link_prediction": link_pred,
    "minhash_lsh_neardups": minhash_lsh,
    "simhash_band_neardups": simhash_bands,
    "simhash_band_weighted": simhash_bands_weighted,
    "phash_band_neardups": phash_bands,
    "fs_blocking": fs_blocking,
    "pretrain_pipeline": pretrain_pipeline,
}


def main() -> int:
    args = sys.argv[1:]
    ops = None
    if args and args[0] == "--ops":
        ops = set(args[1].split(","))
        args = args[2:]
        unknown = ops - set(PROBES)
        if unknown:
            print(f"unknown ops: {sorted(unknown)}", file=sys.stderr)
            return 2
    sf_dirs = args or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark("growth-probe")
    for sf_dir in sf_dirs:
        for name, fn in PROBES.items():
            if ops is not None and name not in ops:
                continue
            row = {"op": name, "sf_dir": sf_dir, **fn(spark, sf_dir)}
            print(json.dumps(row), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
