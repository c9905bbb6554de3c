"""Bloom-filter join pruning (Bloom 1970; the explicit form of the
runtime row-level filtering modern engines inject automatically).

Shape: a semi/anti join where the build side's key set is first
compressed to a w-bit bitmap (k portable hashes per key) that
BROADCASTS in kilobytes, pruning the probe side BEFORE its rows enter
the join exchange. The final exact join still runs — on the survivors
only — so false positives are removed and the operator's result is
EXACTLY the plain semi join (which is what the DuckDB oracle checks).

Scale math: probing 100 TB against a 1e8-key build side, the raw
semi join shuffles every probe row; with a 1-MB bloom at ~1% false-
positive rate the exchange carries only matching rows + 1% noise.
Spark's own InjectRuntimeFilter does this for some shuffle-join shapes
(it exists precisely because this wins), but its bloom expressions are
not SQL-registered and it never fires for broadcast-able builds or
pre-computed sketch tables; this operator makes the pattern explicit,
portable, and storable (the bitmap is an array<long> column you can
write to parquet and reuse across runs — e.g. a decontamination
eval-set bloom applied to every future training shard).

Everything stays JVM-side whole-stage codegen: bit positions are
seeded xxhash64 (see _positions for why the portable hash family is
NOT needed here), the bitmap build is a bounded two-level aggregation
(≤ w/64 word groups, then one row), and the probe test is one getbit
per hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_WIDTH_BITS = 1 << 16  # 8 KiB bitmap
DEFAULT_K = 2


def _positions(h: Column, width_bits: int, k: int) -> list[Column]:
    """k bit positions for a key column: xxhash64(h, seed_i) mod w.

    Unlike the KMV/CM sketches — whose counter VALUES surface in query
    results and therefore use the portable cross-engine hash — the
    bloom filter's bits never appear in a result (the exact join
    scrubs them), so the positions can use Spark's native xxhash64:
    well-mixed on structured/sequential keys (where an affine family
    clusters and the false-positive rate collapses to ~1) and
    whole-stage-codegen cheap. `h` may be ANY column type xxhash64
    accepts, including the raw join key."""
    return [F.pmod(F.xxhash64(h, F.lit(i)), F.lit(width_bits)) for i in range(k)]


def bloom_build(
    keys: DataFrame,
    hash_col: str,
    width_bits: int = DEFAULT_WIDTH_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """1-row DataFrame [`bloom`: array<long> of length w/64] over the
    build side's `hash_col` (any xxhash64-able column, e.g. the raw
    join key). Two bounded
    aggregations: per-word OR of one-hot longs (≤ w/64 groups, partial
    agg map-side — the exchange never exceeds w/64 rows per partition
    no matter the key count), then one row assembling the dense array.
    """
    n_words = width_bits // 64
    pos = F.explode(F.array(*_positions(F.col(hash_col), width_bits, k)))
    words = (
        keys.select(pos.alias("p"))
        .groupBy((F.col("p") / 64).cast("int").alias("w_idx"))
        .agg(
            # bit_or of one-hot longs: each position contributes its bit.
            # (F.shiftleft only takes literal shift amounts — SQL form.)
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT)))"
            ).alias("word")
        )
    )
    word_map = F.map_from_entries(
        F.collect_list(F.struct(F.col("w_idx"), F.col("word")))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        lambda i: F.coalesce(F.element_at(word_map, i), F.lit(0).cast("long")),
    )
    return words.agg(dense.alias("bloom"))


def bloom_might_contain(
    bloom: Column, h: Column, width_bits: int = DEFAULT_WIDTH_BITS, k: int = DEFAULT_K
) -> Column:
    """True iff ALL k bits for `h` are set — may be a false positive
    (bounded by the classic (1-e^{-kn/w})^k), never a false negative."""
    tests = [
        F.getbit(
            F.element_at(bloom, (p / 64).cast("int") + 1),
            F.pmod(p, 64).cast("int"),
        )
        == 1
        for p in _positions(h, width_bits, k)
    ]
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out


def bloom_semi_join(
    probe: DataFrame,
    build_keys: DataFrame,
    probe_hash: str,
    build_hash: str,
    width_bits: int = DEFAULT_WIDTH_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Exact left-semi join of `probe` against `build_keys` on hash
    equality, with a bloom prefilter: the w-bit bitmap broadcasts and
    drops non-matching probe rows BEFORE the exact semi join sees
    them, so the join exchange carries matches + the false-positive
    residue instead of the full probe table. Result is provably the
    plain semi join (false positives die in the exact join; false
    negatives cannot exist). `probe_hash` and `build_hash` may name
    the SAME column (the natural "join on orderkey" call): the build
    key is aliased internally so the exact-join condition never sees
    an ambiguous reference."""
    bloom = bloom_build(build_keys, build_hash, width_bits, k)
    pruned = probe.join(F.broadcast(bloom)).filter(
        bloom_might_contain(F.col("bloom"), F.col(probe_hash), width_bits, k)
    ).drop("bloom")
    build_side = build_keys.select(
        F.col(build_hash).alias("__bloom_bk")
    ).distinct()
    return pruned.join(
        build_side,
        pruned[probe_hash] == build_side["__bloom_bk"],
        "left_semi",
    )
