"""Multimodal plumbing tests: binary round-trip through Parquet,
Arrow-batched decode, deterministic features, frame-sampling explosion,
and the NotImplementedError seam for real formats."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_engineering_project_spark.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    sample_frames,
    synthetic_media,
)


def test_binary_roundtrip_parquet(spark, tmp_path):
    media = synthetic_media(spark, 12)
    media.write.mode("overwrite").parquet(str(tmp_path / "media"))
    back = spark.read.parquet(str(tmp_path / "media"))
    assert back.schema == MEDIA_SCHEMA
    a = {r["media_id"]: bytes(r["blob"]) for r in media.collect()}
    b = {r["media_id"]: bytes(r["blob"]) for r in back.collect()}
    assert a == b


def test_decode_media_matches_metadata(spark):
    media = synthetic_media(spark, 30)
    out = decode_media(media)
    joined = out.join(
        media.select("media_id", F.col("width").alias("w"), F.col("height").alias("h")),
        "media_id",
    )
    bad = joined.filter(
        (F.col("width") != F.col("w"))
        | (F.col("height") != F.col("h"))
        | (F.col("n_pixels") != F.col("w") * F.col("h"))
    )
    assert bad.count() == 0
    # blob column dropped from decoded output
    assert "blob" not in out.columns


def test_decode_is_deterministic(spark):
    m = synthetic_media(spark, 10)
    a = decode_media(m).orderBy("media_id").collect()
    b = decode_media(m).orderBy("media_id").collect()
    assert a == b


def test_unknown_format_raises_not_implemented(spark):
    bad = spark.createDataFrame(
        [Row(media_id=1, kind="image", width=2, height=2, blob=b"JPEG....")],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="NotImplementedError|real media decoding"):
        decode_media(bad).collect()


def test_features_are_normalized_histograms(spark):
    feats = extract_features(synthetic_media(spark, 10), bins=16).collect()
    for r in feats:
        assert len(r["histogram"]) == 16
        assert abs(sum(r["histogram"]) - 1.0) < 1e-9


def test_frame_sampling_explodes_rows(spark):
    media = synthetic_media(spark, 30)
    frames = sample_frames(media, every_n=4)
    n_videos = media.filter(F.col("kind") == "video").count()
    assert frames.count() > n_videos  # multiple frames per video
    assert frames.select("media_id").distinct().count() == n_videos
    # deterministic frame means
    assert frames.orderBy("media_id", "frame_idx").collect() == (
        sample_frames(media, every_n=4).orderBy("media_id", "frame_idx").collect()
    )


def test_perceptual_hash_groups_visual_duplicates(spark):
    """Two blobs with IDENTICAL pixel content but different media_ids
    must collide on the aHash (the dedup claim), and a different
    picture must not; hash is invariant to uniform brightness shift
    (every pixel +const leaves cell-vs-global comparisons unchanged)
    — the property that makes aHash perceptual rather than exact."""
    import struct as _s

    from big_data_engineering_project_spark.multimodal.columns import (
        MAGIC,
        MEDIA_SCHEMA,
        perceptual_hash,
    )
    from pyspark.sql import Row

    w, h = 16, 8

    def blob(pixels):
        return MAGIC + _s.pack(">HH", w, h) + bytes(pixels)

    base = [(i * 37 + (i // w) * 11) % 200 for i in range(w * h)]
    shifted = [p + 50 for p in base]  # uniform brightness shift
    other = [(i * 13) % 256 for i in range(w * h)]
    rows = [
        Row(media_id=0, kind="image", width=w, height=h, blob=blob(base)),
        Row(media_id=1, kind="image", width=w, height=h, blob=blob(base)),
        Row(media_id=2, kind="image", width=w, height=h, blob=blob(shifted)),
        Row(media_id=3, kind="image", width=w, height=h, blob=blob(other)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    hashes = {
        r["media_id"]: (r["ahash_hi"], r["ahash_lo"])
        for r in perceptual_hash(df).collect()
    }
    assert hashes[0] == hashes[1]  # exact visual duplicate collides
    assert hashes[0] == hashes[2]  # brightness-shifted still collides
    assert hashes[0] != hashes[3]  # different picture separates


def test_phash_neardup_planted_copy_and_bands(spark):
    """phash_neardup_pairs (the cross-modal near-dup member): a
    one-pixel-noise copy (aHash Hamming 1) pairs with its original at
    k=3; an inverted copy (Hamming 64) does not; and the banded
    candidate rule is EXACT — operator pairs equal the brute-force
    all-pairs popcount over the same hashes, planted or not."""
    import struct as _s

    from big_data_engineering_project_spark.multimodal.columns import (
        MAGIC,
        MEDIA_SCHEMA,
        perceptual_hash,
        synthetic_media,
    )
    from big_data_engineering_project_spark.operators.dedup import (
        phash_neardup_pairs,
    )

    base = synthetic_media(spark, 12).collect()
    orig = next(r for r in base if r["media_id"] == 0)  # w=h=8
    w, h = orig["width"], orig["height"]
    pay = list(bytes(orig["blob"])[8 : 8 + w * h])
    ts, tn = sum(pay), len(pay)
    noisy = list(pay)
    # push ONE below-mean pixel to 255: flips that cell's bit, the
    # slight global-mean shift leaves the rest (verified Hamming 1)
    noisy[next(i for i, v in enumerate(pay) if v * tn <= ts)] = 255
    inverted = [255 - v for v in pay]

    def blob(pixels):
        return MAGIC + _s.pack(">HH", w, h) + bytes(pixels)

    extra = [
        Row(media_id=100, kind="image", width=w, height=h,
            blob=blob(noisy)),
        Row(media_id=101, kind="image", width=w, height=h,
            blob=blob(inverted)),
    ]
    media = spark.createDataFrame(base + extra, MEDIA_SCHEMA)
    hashes = perceptual_hash(media)
    hs = {
        r["media_id"]: (r["ahash_hi"] | (r["ahash_lo"] << 32))
        for r in hashes.collect()
    }
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_neardup_pairs(hashes, max_hamming=3).collect()
    )
    want = sorted(
        (a, b, bin(hs[a] ^ hs[b]).count("1"))
        for a in hs
        for b in hs
        if a < b and bin(hs[a] ^ hs[b]).count("1") <= 3
    )
    assert got == want
    pair_ids = {(a, b) for a, b, _d in got}
    assert (0, 100) in pair_ids      # planted noisy copy found
    assert (0, 101) not in pair_ids  # scrambled copy rejected
    d_planted = next(d for a, b, d in got if (a, b) == (0, 100))
    assert 1 <= d_planted <= 3


def test_frame_energy_framing_tie_and_subframe(spark):
    """64-sample framing over the synthetic fixture: counts match
    len//64, tail samples are dropped, peak is the FIRST max frame,
    and energies re-derive from the closed-form bytes exactly."""
    from big_data_engineering_project_spark.multimodal.columns import (
        frame_energy,
        synthetic_media,
    )

    media = synthetic_media(spark, n=12)
    got = {
        r["media_id"]: r
        for r in frame_energy(media, frame_len=64).collect()
    }
    audio = {i: (8 + (i % 5) * 4, 8 + (i % 3) * 4) for i in range(12) if i % 3 == 1}
    assert set(got) == set(audio)
    for mid, (w, h) in audio.items():
        samples = [((mid + i * 31) % 256) - 128 for i in range(w * h)]
        nf = len(samples) // 64
        ens = [
            sum(s * s for s in samples[f * 64 : (f + 1) * 64])
            for f in range(nf)
        ]
        r = got[mid]
        assert r["n_frames"] == nf
        assert r["total_energy"] == sum(ens)
        assert r["peak_energy"] == max(ens)
        assert r["peak_frame"] == ens.index(max(ens))


def test_frame_energy_zero_frame_blob(spark):
    """r9 ADVICE #4: an audio blob shorter than frame_len emits the
    documented (n_frames=0, peak_frame=-1) row — and the registered
    oracle now LEFT JOINs from the audio universe so both sides agree
    on such blobs instead of passing by fixture luck."""
    import struct as _s

    from big_data_engineering_project_spark.multimodal.columns import (
        MAGIC,
        MEDIA_SCHEMA,
        frame_energy,
    )
    from pyspark.sql import Row

    short = MAGIC + _s.pack(">HH", 5, 6) + bytes(range(30))  # 30 < 64
    full = MAGIC + _s.pack(">HH", 8, 16) + bytes(i % 256 for i in range(128))
    rows = [
        Row(media_id=1, kind="audio", width=5, height=6, blob=short),
        Row(media_id=2, kind="audio", width=8, height=16, blob=full),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in frame_energy(df, frame_len=64).collect()}
    assert set(got) == {1, 2}
    assert (got[1]["n_frames"], got[1]["peak_frame"]) == (0, -1)
    assert (got[1]["total_energy"], got[1]["peak_energy"]) == (0, 0)
    assert got[2]["n_frames"] == 2


def test_scene_cuts_reference_and_edge_cases(spark):
    """scene_cuts vs a pure-python re-derivation on the fixture
    (diff-into-frame indexing, first-cut tie rule), plus the
    sub-2-frame edge row the oracle left-joins for."""
    import struct as _s

    from big_data_engineering_project_spark.multimodal.columns import (
        MAGIC,
        MEDIA_SCHEMA,
        scene_cuts,
        synthetic_media,
    )
    from pyspark.sql import Row

    media = synthetic_media(spark, n=12)
    T = 100_000
    got = {r["media_id"]: r for r in scene_cuts(media, T).collect()}
    vids = {i: (8 + (i % 5) * 4, 8 + (i % 3) * 4) for i in range(12) if i % 3 == 2}
    assert set(got) == set(vids)
    for mid, (w, h) in vids.items():
        p = [(mid + k * 31) % 256 for k in range(w * h)]
        d = [
            sum((p[i * w + j] - p[(i - 1) * w + j]) ** 2 for j in range(w))
            for i in range(1, h)
        ]
        cuts = [i + 1 for i, e in enumerate(d) if e >= T]
        r = got[mid]
        assert r["n_frames"] == h
        assert r["n_cuts"] == len(cuts)
        assert r["first_cut"] == (cuts[0] if cuts else -1)
        assert r["max_diff"] == max(d)
        assert r["total_diff"] == sum(d)

    # single-frame video: no diffs, documented sentinel row
    one = MAGIC + _s.pack(">HH", 6, 1) + bytes(range(6))
    df = spark.createDataFrame(
        [Row(media_id=7, kind="video", width=6, height=1, blob=one)],
        MEDIA_SCHEMA,
    )
    r = scene_cuts(df, T).collect()[0]
    assert (r["n_frames"], r["n_cuts"], r["first_cut"]) == (1, 0, -1)
    assert (r["max_diff"], r["total_diff"]) == (0, 0)

    # r10 ADVICE #3: a TRUNCATED blob (header declares more payload
    # than the blob holds) must fail with a descriptive per-row error
    # naming the media_id, not an opaque reshape ValueError
    import pytest

    trunc = MAGIC + _s.pack(">HH", 6, 4) + bytes(range(10))  # needs 24
    bad = spark.createDataFrame(
        [Row(media_id=13, kind="video", width=6, height=4, blob=trunc)],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception) as exc:
        scene_cuts(bad, T).collect()
    assert "media_id=13" in str(exc.value) and "truncated" in str(exc.value)
