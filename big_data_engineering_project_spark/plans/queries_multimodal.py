"""Multimodal queries — the driver-facing surface of
`multimodal/columns.py` (decode + feature-extract over binary media
columns via mapInPandas).

The testdata directory has no media table, so the queries run over the
deterministic BDE1 fixture — written ONCE per SF as a parquet table
(partitioned by `kind`) and read back, so every query exercises the
real production path: a binary-column parquet scan whose metadata
prunes without touching blob bytes, sized to `sf_dir` (25 / 250 /
2 500 blobs at sf0.001/0.01/0.1; `media_fixture_n` = count(events)//40
so the oracle derives the SAME size from the events view without
seeing sf_dir). Because every blob byte is the closed-form
`(media_id + i*31) % 256`, an EXACT DuckDB oracle exists: it
recomputes the decode from the same integer formulas with
`generate_series`, so the comparison checks the whole scan →
mapInPandas decode path (Arrow batching, schema, per-blob arithmetic)
against an independent derivation — at every SF the sweeps run.

Scale posture: `decode_media` and `extract_features` are
partition-parallel mapInPandas over whatever media DataFrame they're
given — at 100 TB the same plans run over a bigger version of exactly
this scan (see multimodal/columns.py module docstring); the
kind='video' frame query prunes to the video partition before any
byte is read (plan-asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_engineering_project_spark.multimodal.columns import (
    decode_media,
    extract_features,
    load_media,
    sample_frames,
)
from big_data_engineering_project_spark.plans.registry import register

_BINS = 16

# DuckDB mirror of the synthetic_media fixture (multimodal/columns.py:
# kind = [image,audio,video][i%3], w = 8+(i%5)*4, h = 8+(i%3)*4),
# sized like media_fixture_n: count(events) // 40 — row_number over
# events stands in for range(n), which DuckDB won't take a subquery in.
_FIXTURE_CTE = """m AS (
  SELECT rn - 1 AS media_id,
         ['image', 'audio', 'video'][CAST((rn - 1) % 3 AS INT) + 1] AS kind,
         8 + ((rn - 1) % 5) * 4 AS width,
         8 + ((rn - 1) % 3) * 4 AS height
  FROM (SELECT row_number() OVER (ORDER BY event_id) AS rn FROM events)
  WHERE rn <= (SELECT COUNT(*) // 40 FROM events)
)"""


@register(
    "q_media_decode_stats",
    oracle=f"""
WITH {_FIXTURE_CTE}
SELECT media_id, kind, CAST(width AS INT) AS width,
       CAST(height AS INT) AS height,
       CAST(width * height AS BIGINT) AS n_pixels,
       CAST(SUM((media_id + (j - 1) * 31) % 256) AS DOUBLE)
         / (width * height) AS mean_intensity
FROM m, unnest(generate_series(1, width * height)) AS t(j)
GROUP BY media_id, kind, width, height
ORDER BY media_id
""",
    doc="Per-media decode over binary blobs (mapInPandas, Arrow "
    "batches): width/height/n_pixels/mean_intensity per blob, checked "
    "against a closed-form integer oracle. mean_intensity is one "
    "int-sum / int-len division per media — no double accumulation, "
    "so the comparison is exact.",
    tags=("multimodal",),
)
def q_media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = load_media(spark, sf_dir)
    return decode_media(media).orderBy("media_id")


@register(
    "q_media_histogram_topk",
    oracle=f"""
WITH {_FIXTURE_CTE},
b AS (
  SELECT kind,
         ((media_id + (j - 1) * 31) % 256) * {_BINS} // 256 AS bin
  FROM m, unnest(generate_series(1, width * height)) AS t(j)
),
tot AS (SELECT kind, bin, COUNT(*) AS total FROM b GROUP BY 1, 2),
r AS (
  SELECT kind, bin, total,
         ROW_NUMBER() OVER (PARTITION BY kind
                            ORDER BY total DESC, bin) AS rank
  FROM tot
)
SELECT kind, CAST(bin AS BIGINT) AS bin, CAST(total AS BIGINT) AS total,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 3 ORDER BY kind, rank
""",
    doc="Corpus-level byte-histogram analysis: extract_features "
    "(mapInPandas) emits exact integer bin counts per blob; the "
    "per-kind totals sum LONGs (combine-order independent), and the "
    "top-3 bins per kind use a total order (total DESC, bin ASC). "
    "The metadata join never ships blob bytes. Headline-benched over "
    "the sf-scaled parquet fixture (2 500 blobs at sf0.1).",
    headline=True,
    tags=("multimodal",),
)
def q_media_histogram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = load_media(spark, sf_dir)
    feats = extract_features(media, bins=_BINS)
    kinds = media.select("media_id", "kind")
    ex = feats.join(F.broadcast(kinds), "media_id").select(
        "kind", F.posexplode("counts").alias("bin", "cnt")
    )
    tot = ex.groupBy("kind", F.col("bin").cast("long").alias("bin")).agg(
        F.sum("cnt").alias("total")
    )
    w = Window.partitionBy("kind").orderBy(F.desc("total"), F.asc("bin"))
    return (
        tot.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .orderBy("kind", "rank")
    )


_FRAME_STEP = 4


@register(
    "q_media_frame_means",
    oracle=f"""
WITH {_FIXTURE_CTE},
v AS (SELECT media_id, width, height FROM m WHERE kind = 'video'),
f AS (
  SELECT media_id, width, i AS frame_idx
  FROM v, unnest(generate_series(0, height - 1, {_FRAME_STEP})) AS s(i)
)
SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(SUM((media_id + (frame_idx * width + (c - 1)) * 31) % 256)
            AS DOUBLE) / width AS frame_mean
FROM f, unnest(generate_series(1, width)) AS t(c)
GROUP BY media_id, frame_idx, width
ORDER BY media_id, frame_idx
""",
    doc=f"Video frame sampling (every {_FRAME_STEP}th frame) through "
    "the mapInPandas frame decoder: per-frame mean intensity vs the "
    "closed-form byte oracle. The row-explosion (one row per sampled "
    "frame) happens JVM-side before the Python decode — the plumbing "
    "a real ffmpeg frame extractor would use.",
    tags=("multimodal",),
)
def q_media_frame_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = load_media(spark, sf_dir)
    return (
        sample_frames(media, every_n=_FRAME_STEP)
        .select(
            "media_id",
            F.col("frame_idx").cast("long").alias("frame_idx"),
            "frame_mean",
        )
        .orderBy("media_id", "frame_idx")
    )


@register(
    "q_media_phash_groups",
    oracle=f"""
WITH {_FIXTURE_CTE},
px AS (
  SELECT media_id, width, height, t.j - 1 AS i,
         (media_id + (t.j - 1) * 31) % 256 AS v
  FROM m, unnest(generate_series(1, width * height)) AS t(j)
),
cells AS (
  SELECT media_id, ((i // width) * 8) // height AS r,
         ((i % width) * 8) // width AS c,
         SUM(v) AS cs, COUNT(*) AS cn
  FROM px GROUP BY 1, 2, 3
),
tots AS (SELECT media_id, SUM(v) AS ts, COUNT(*) AS tn FROM px GROUP BY 1),
bits AS (
  SELECT cells.media_id, r * 8 + c AS k,
         CASE WHEN cs * tn > ts * cn THEN 1 ELSE 0 END AS b
  FROM cells JOIN tots ON tots.media_id = cells.media_id
),
hashes AS (
  SELECT media_id,
    CAST(SUM(CASE WHEN k < 32 THEN b * (1 << k) ELSE 0 END) AS BIGINT)
      AS ahash_hi,
    CAST(SUM(CASE WHEN k >= 32 THEN b * (1 << (k - 32)) ELSE 0 END) AS BIGINT)
      AS ahash_lo
  FROM bits GROUP BY media_id
)
SELECT ahash_hi, ahash_lo, CAST(COUNT(*) AS BIGINT) AS n_media,
       CAST(MIN(media_id) AS BIGINT) AS first_media
FROM hashes GROUP BY 1, 2 ORDER BY first_media
""",
    doc="Perceptual-hash duplicate groups over binary media blobs: "
    "aHash (8x8 cell means vs global mean, all cross-multiplied "
    "integers — no float, no division) computed in the Arrow "
    "mapInPandas decode seam, packed into two BIGINT halves, grouped "
    "exactly — the multimodal member of the dedup family, checked "
    "against the closed-form fixture oracle "
    "(multimodal/columns.py:perceptual_hash)",
    tags=("multimodal", "dedup"),
)
def q_media_phash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.multimodal.columns import (
        perceptual_hash,
    )

    media = load_media(spark, sf_dir)
    return (
        perceptual_hash(media)
        .groupBy("ahash_hi", "ahash_lo")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_media"),
            F.min("media_id").cast("long").alias("first_media"),
        )
        .orderBy("first_media")
    )


_PHASH_K = 3

# the hashes CTE (aHash replay from the closed-form fixture) is shared
# with q_media_phash_groups' oracle
_HASHES_CTE = f"""px AS (
  SELECT media_id, width, height, t.j - 1 AS i,
         (media_id + (t.j - 1) * 31) % 256 AS v
  FROM m, unnest(generate_series(1, width * height)) AS t(j)
),
cells AS (
  SELECT media_id, ((i // width) * 8) // height AS r,
         ((i % width) * 8) // width AS c,
         SUM(v) AS cs, COUNT(*) AS cn
  FROM px GROUP BY 1, 2, 3
),
tots AS (SELECT media_id, SUM(v) AS ts, COUNT(*) AS tn FROM px GROUP BY 1),
bits AS (
  SELECT cells.media_id, r * 8 + c AS k,
         CASE WHEN cs * tn > ts * cn THEN 1 ELSE 0 END AS b
  FROM cells JOIN tots ON tots.media_id = cells.media_id
),
hashes AS (
  SELECT media_id,
    CAST(SUM(CASE WHEN k < 32 THEN b * (1 << k) ELSE 0 END) AS BIGINT)
      AS ahash_hi,
    CAST(SUM(CASE WHEN k >= 32 THEN b * (1 << (k - 32)) ELSE 0 END) AS BIGINT)
      AS ahash_lo
  FROM bits GROUP BY media_id
)"""


@register(
    "q_media_phash_neardups",
    oracle=f"""
WITH {_FIXTURE_CTE},
{_HASHES_CTE}
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.ahash_hi, b.ahash_hi))
            + bit_count(xor(a.ahash_lo, b.ahash_lo)) AS BIGINT) AS hamming
FROM hashes a JOIN hashes b ON a.media_id < b.media_id
WHERE bit_count(xor(a.ahash_hi, b.ahash_hi))
      + bit_count(xor(a.ahash_lo, b.ahash_lo)) <= {_PHASH_K}
ORDER BY id_a, id_b
""",
    doc=f"Perceptual-hash NEAR-duplicate image pairs (Hamming ≤ "
    f"{_PHASH_K} over the 64-bit aHash) — the cross-modal member of "
    "the near-dup family: a one-pixel-noise or re-encoded copy that "
    "exact pHash grouping misses. Candidates via the SimHash "
    "pigeonhole bands applied to the two BIGINT hash halves (k+1 "
    "disjoint bands, ≥1 must match — exact, never all-pairs; a "
    "boundary-straddling band composes from both words), verified by "
    "popcount(xor) over candidates only; pixel bytes stopped at the "
    "Arrow decode seam that produced the hashes. The oracle replays "
    "the closed-form fixture aHash and takes all-pairs popcount — "
    "band candidates ⊇ every true pair by pigeonhole, so the two "
    "derivations must agree exactly "
    "(operators/dedup.py:phash_neardup_pairs)",
    tags=("multimodal", "dedup"),
    invariants=(
        "tests/test_multimodal.py::test_phash_neardup_planted_copy_and_bands",
    ),
)
def q_media_phash_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.multimodal.columns import (
        perceptual_hash,
    )
    from big_data_engineering_project_spark.operators.dedup import (
        phash_neardup_pairs,
    )

    media = load_media(spark, sf_dir)
    return phash_neardup_pairs(
        perceptual_hash(media), max_hamming=_PHASH_K
    ).orderBy("id_a", "id_b")


@register(
    "q_audio_frame_energy",
    oracle=f"""
WITH {_FIXTURE_CTE},
au AS (
  SELECT media_id, width * height AS len FROM m WHERE kind = 'audio'
),
en AS (
  SELECT au.media_id, CAST(g.i // 64 AS INT) AS frame,
         SUM(CAST(((au.media_id + g.i * 31) % 256 - 128)
             * ((au.media_id + g.i * 31) % 256 - 128) AS BIGINT)) AS e
  FROM au, unnest(generate_series(0, au.len - 1)) AS g(i)
  WHERE g.i < (au.len // 64) * 64
  GROUP BY 1, 2
),
picked AS (
  SELECT media_id, frame, e,
         ROW_NUMBER() OVER (PARTITION BY media_id
                            ORDER BY e DESC, frame ASC) AS rn
  FROM en
),
agg AS (
  SELECT en.media_id,
         CAST(COUNT(*) AS BIGINT) AS n_frames,
         CAST(SUM(en.e) AS BIGINT) AS total_energy,
         CAST(MAX(CASE WHEN p.rn = 1 THEN p.frame END) AS INT) AS peak_frame,
         CAST(MAX(CASE WHEN p.rn = 1 THEN p.e END) AS BIGINT) AS peak_energy
  FROM en
  JOIN picked p ON p.media_id = en.media_id AND p.frame = en.frame
  GROUP BY 1
)
SELECT au.media_id,
       COALESCE(agg.n_frames, CAST(0 AS BIGINT)) AS n_frames,
       COALESCE(agg.total_energy, CAST(0 AS BIGINT)) AS total_energy,
       COALESCE(agg.peak_frame, CAST(-1 AS INT)) AS peak_frame,
       COALESCE(agg.peak_energy, CAST(0 AS BIGINT)) AS peak_energy
FROM au LEFT JOIN agg ON agg.media_id = au.media_id
ORDER BY 1
""",
    doc="Audio waveform framing + energy over the binary media column "
    "— the multimodal family's audio path, and the one needing NO "
    "codec seam (payload bytes ARE u8-PCM samples): 64-sample "
    "non-overlapping frames, integer energy Σ(s−128)² per frame, "
    "peak frame first-index tie rule; bytes stop at the Arrow-"
    "batched mapInPandas, 5 small columns leave. Exact oracle "
    "re-derives every sample from the closed-form fixture "
    "(multimodal/columns.py:frame_energy)",
    tags=("multimodal",),
)
def q_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.multimodal.columns import (
        frame_energy,
    )

    media = load_media(spark, sf_dir)
    return frame_energy(media, frame_len=64).orderBy("media_id")


_SCENE_CUT_T = 100_000


@register(
    "q_video_scene_cuts",
    oracle=f"""
WITH {_FIXTURE_CTE},
vu AS (
  SELECT media_id, width AS w, height AS h FROM m WHERE kind = 'video'
),
dd AS (
  SELECT vu.media_id, CAST(g.i // vu.w AS INT) AS frame,
         SUM(CAST(
           ((vu.media_id + g.i * 31) % 256
             - (vu.media_id + (g.i - vu.w) * 31) % 256)
           * ((vu.media_id + g.i * 31) % 256
             - (vu.media_id + (g.i - vu.w) * 31) % 256) AS BIGINT)) AS d
  FROM vu, unnest(generate_series(0, vu.w * vu.h - 1)) AS g(i)
  WHERE g.i >= vu.w
  GROUP BY 1, 2
),
agg AS (
  SELECT media_id,
         CAST(SUM(CASE WHEN d >= {_SCENE_CUT_T} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_cuts,
         CAST(COALESCE(MIN(CASE WHEN d >= {_SCENE_CUT_T} THEN frame END),
                       -1) AS INT) AS first_cut,
         CAST(MAX(d) AS BIGINT) AS max_diff,
         CAST(SUM(d) AS BIGINT) AS total_diff
  FROM dd GROUP BY 1
)
SELECT vu.media_id,
       CAST(vu.h AS BIGINT) AS n_frames,
       COALESCE(agg.n_cuts, CAST(0 AS BIGINT)) AS n_cuts,
       COALESCE(agg.first_cut, CAST(-1 AS INT)) AS first_cut,
       COALESCE(agg.max_diff, CAST(0 AS BIGINT)) AS max_diff,
       COALESCE(agg.total_diff, CAST(0 AS BIGINT)) AS total_diff
FROM vu LEFT JOIN agg ON agg.media_id = vu.media_id
ORDER BY 1
""",
    doc="Video scene-cut detection over the binary media column — "
    "the video-path member completing the image/audio/video modality "
    "triple with NO codec seam (the payload IS height frames of "
    "width pixels, the frame-row convention sample_frames strides): "
    "per-frame difference energy Σ(f_i−f_{i−1})², integer threshold "
    "cut rule, first-cut frame index. Bytes stop at the Arrow "
    "mapInPandas; six integer columns leave; the kind filter prunes "
    "partitions before any blob is read. Exact oracle re-derives "
    "every pixel pair from the closed-form fixture "
    "(multimodal/columns.py:scene_cuts)",
    headline=True,
    tags=("multimodal",),
)
def q_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.multimodal.columns import (
        scene_cuts,
    )

    media = load_media(spark, sf_dir)
    return scene_cuts(media, threshold=_SCENE_CUT_T).orderBy("media_id")
