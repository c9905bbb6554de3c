"""Binary media columns + mapInPandas processing.

Design for 100 TB of media:
- media lives in Parquet as `binary` with typed metadata beside it
  (kind/width/height/duration) so filters prune WITHOUT touching bytes
  (column pruning: a `WHERE kind='image' AND width>100` scan never
  reads the blob column);
- decode/feature-extract run as `mapInPandas` — Arrow ships each
  partition's rows to Python in batches, the UDF is the only Python in
  the pipeline, and parallelism = partitions;
- real codecs (PIL/ffmpeg) are NOT in this container: `decode_media`
  handles the synthetic `BDE1` fixture format deterministically and
  raises NotImplementedError for real formats — the seam where a
  production deployment plugs in the actual codec.

Synthetic `BDE1` blob layout (deterministic, self-describing):
  bytes 0-3   magic b"BDE1"
  bytes 4-5   width  (uint16 BE)
  bytes 6-7   height (uint16 BE)
  bytes 8+    payload: (width*height) pseudo-pixel bytes,
              byte[i] = (seed + i*31) % 256
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = b"BDE1"

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("blob", BinaryType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("mean_intensity", DoubleType()),
    ]
)


def _make_blob(media_id: int, width: int, height: int) -> bytes:
    payload = bytes((media_id + i * 31) % 256 for i in range(width * height))
    return MAGIC + struct.pack(">HH", width, height) + payload


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic media fixture (seeded by media_id, no RNG)."""
    rows = []
    for i in range(n):
        w, h = 8 + (i % 5) * 4, 8 + (i % 3) * 4
        rows.append(
            Row(
                media_id=i,
                kind=("image", "audio", "video")[i % 3],
                width=w,
                height=h,
                blob=_make_blob(i, w, h),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_fixture_n(spark: SparkSession, sf_dir: str) -> int:
    """SF-scaled fixture size, derived from the events table so the
    DuckDB oracle can derive the SAME number without seeing `sf_dir`:
    n = count(events) // 40 (events is exactly sf-linear: 1 000 rows at
    sf0.001 → 25 media, 250 at sf0.01, 2 500 at sf0.1)."""
    from big_data_engineering_project_spark.sources.catalog import load_table

    return load_table(spark, sf_dir, "events").count() // 40


def media_fixture_path(sf_dir: str) -> str:
    """Writable per-SF parquet location for the media fixture (the
    testdata dir is read-only; content is deterministic, so a shared
    temp-dir cache is safe to reuse across sessions)."""
    import os
    import tempfile

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(
        tempfile.gettempdir(), "bde_media_fixtures", f"{sf_name}"
    )


def load_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media table AS A PARQUET SCAN, sized to the SF: builds the
    deterministic fixture once per (machine, SF) and reads it back, so
    media queries exercise the real path — a binary-column parquet
    scan, partitioned by `kind` for partition pruning (a kind='video'
    filter never opens image/audio files, and metadata-only queries
    never read the blob column; cf. module docstring)."""
    import os

    from big_data_engineering_project_spark.sources.catalog import (
        ensure_engine_confs,
    )

    # The media path bypasses load_table entirely when the fixture is
    # already built, so a media query running FIRST in a vanilla driver
    # session would otherwise reach its Arrow UDF without the package
    # zip or engine confs (the r12 verify-drive regression): ensure
    # both here, like load_table does for catalog tables.
    ensure_engine_confs(spark)
    path = media_fixture_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        n = media_fixture_n(spark, sf_dir)
        tmp = f"{path}.tmp-{os.getpid()}"
        (
            synthetic_media(spark, n)
            .repartition(max(spark.sparkContext.defaultParallelism // 4, 1))
            .write.mode("overwrite")
            .partitionBy("kind")
            .parquet(tmp)
        )
        import shutil

        if os.path.exists(path):  # stale partial write (no _SUCCESS)
            shutil.rmtree(path, ignore_errors=True)
        try:
            os.rename(tmp, path)
        except OSError:  # lost a build race: another session won; use theirs
            shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(path).select(
        "media_id", "kind", "width", "height", "blob"
    )


def _unpack_checked_header(mid, blob: bytes) -> tuple[int, int]:
    """(width, height) of a BDE1 blob after validating the magic AND
    that the payload really holds width·height bytes: a truncated
    blob must fail with a per-row error naming the media_id, not an
    opaque frombuffer/reshape ValueError deep inside the Arrow
    worker (r10 ADVICE #3). Non-BDE1 magic stays the codec seam
    (NotImplementedError)."""
    if blob[:4] != MAGIC:
        raise NotImplementedError(
            "real media decoding requires codec libraries "
            "not present in this environment"
        )
    w, h = struct.unpack(">HH", blob[4:8])
    if len(blob) < 8 + w * h:
        raise ValueError(
            f"media_id={mid}: truncated blob — header declares "
            f"{w}x{h} = {8 + w * h} bytes incl. header, blob holds "
            f"{len(blob)}"
        )
    return w, h


def _decode_one(blob: bytes) -> tuple[int, int, int, float]:
    if blob[:4] != MAGIC:
        # The production seam: plug PIL/soundfile/ffmpeg in here.
        raise NotImplementedError(
            "real media decoding requires codec libraries not present "
            "in this environment; only the BDE1 fixture format decodes"
        )
    w, h = struct.unpack(">HH", blob[4:8])
    payload = blob[8 : 8 + w * h]
    # Vectorized byte sum (guide-§4 lesson: hand whole buffers to
    # native code, never loop bytes in Python). int(ndarray.sum()) is
    # the same exact integer Python's sum(bytes) produces, so the
    # mean's IEEE division is bit-identical to the scalar form.
    mean = (
        int(np.frombuffer(payload, dtype=np.uint8).sum(dtype=np.int64))
        / len(payload)
        if payload
        else 0.0
    )
    return w, h, len(payload), mean


def decode_media(media: DataFrame) -> DataFrame:
    """Decode blobs partition-parallel via mapInPandas (Arrow batches).

    The output drops the blob column — decoded features are orders of
    magnitude smaller, so downstream stages never shuffle raw bytes.
    """

    from big_data_engineering_project_spark.sources.catalog import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(media.sparkSession)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["blob"].map(_decode_one)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": decoded.map(lambda t: t[0]),
                    "height": decoded.map(lambda t: t[1]),
                    "n_pixels": decoded.map(lambda t: t[2]),
                    "mean_intensity": decoded.map(lambda t: t[3]),
                }
            )

    # Project to exactly the columns the function touches — an opaque
    # mapInPandas defeats Catalyst column pruning (guide §4), so the
    # select is the only thing keeping unused columns off the Arrow
    # boundary and out of the scan.
    return media.select("media_id", "kind", "blob").mapInPandas(
        decode, DECODED_SCHEMA
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        # exact integer bin counts beside the normalized histogram:
        # corpus-level aggregates sum `counts` (LONG, order-independent,
        # cross-engine exact) instead of the normalized doubles
        StructField("counts", ArrayType(LongType())),
        StructField("histogram", ArrayType(DoubleType())),
    ]
)


def extract_features(media: DataFrame, bins: int = 16) -> DataFrame:
    """Byte-histogram 'embedding' per blob (the deterministic stand-in
    for a vision/audio encoder; same mapInPandas shape a real encoder
    batch-inference job would use)."""

    from big_data_engineering_project_spark.sources.catalog import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(media.sparkSession)

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            all_counts, hists = [], []
            for blob in pdf["blob"]:
                # Vectorized binning (was a per-byte Python loop — the
                # guide-§4 anti-pattern): bin = b·bins // 256 over the
                # uint8 buffer, exact integer arithmetic, so counts are
                # identical to the scalar form; the normalized doubles
                # divide the same exact integers.
                payload = np.frombuffer(blob, dtype=np.uint8)[8:]
                counts = np.bincount(
                    payload.astype(np.int64) * bins // 256,
                    minlength=bins,
                ).astype(np.int64)
                total = max(len(payload), 1)
                all_counts.append(counts.tolist())
                hists.append((counts / total).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "counts": all_counts,
                    "histogram": hists,
                }
            )

    return media.select("media_id", "blob").mapInPandas(
        featurize, FEATURE_SCHEMA
    )


def sample_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame sampling STUB: the row-explosion plumbing is real
    (one output row per sampled frame index), the pixel decode is the
    fixture codec. Real video needs ffmpeg — NotImplementedError seam
    in _decode_one applies."""
    from big_data_engineering_project_spark.sources.catalog import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(media.sparkSession)

    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), (F.col("height") - 1), F.lit(every_n))
        ).alias("frame_idx"),
        "blob",
    )

    def decode_frame(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_mean": []}
            for mid, idx, blob in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["blob"]
            ):
                w, h = struct.unpack(">HH", blob[4:8])
                line = blob[8 + idx * w : 8 + (idx + 1) * w]
                rows["media_id"].append(mid)
                rows["frame_idx"].append(idx)
                rows["frame_mean"].append(sum(line) / max(len(line), 1))
            yield pd.DataFrame(rows)

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_mean", DoubleType()),
        ]
    )
    return frames.mapInPandas(decode_frame, out_schema)


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("ahash_hi", LongType()),
        StructField("ahash_lo", LongType()),
    ]
)


def perceptual_hash(media: DataFrame) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint per media blob —
    the multimodal member of the dedup family: two images that differ
    by re-encoding/minor noise land on the same 64-bit signature, so
    exact groupBy on the hash finds visual duplicates without pairwise
    pixel comparison (band the bits like SimHash for near-dups).

    Pipeline (all INTEGER, so the closed-form fixture oracle is
    exact): decode → map every pixel (y, x) to the 8×8 grid cell
    (y·8 div h, x·8 div w) → per-cell intensity sums → bit(r,c) = 1
    iff cell_sum·total_n > total_sum·cell_n (the cross-multiplied
    mean comparison — no division, no float) → bits pack into two
    BIGINT halves (bit 63 in one word would need the sign bit).
    Decoding runs in the same Arrow-batched mapInPandas seam as
    decode_media — bytes stop at the UDF; only (id, hi, lo) leave.
    """
    import numpy as np

    from big_data_engineering_project_spark.sources.catalog import (
        ensure_package_on_executors,
    )

    # Like every other mapInPandas seam in this module: the UDF body
    # pickles by module reference, so the package zip must be on the
    # executors EVEN IF no load_table call preceded this query (the
    # driver's vanilla session + a warm media fixture is exactly that
    # order — caught by the r12 verify drive, where this was the one
    # seam missing the call and q_media_phash_* failed when run first).
    ensure_package_on_executors(media.sparkSession)

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, his, los = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                blob = bytes(blob)
                w, h = _unpack_checked_header(mid, blob)
                arr = np.frombuffer(
                    blob[8 : 8 + w * h], dtype=np.uint8
                ).astype(np.int64).reshape(h, w)
                r = (np.arange(h, dtype=np.int64) * 8) // h
                c = (np.arange(w, dtype=np.int64) * 8) // w
                cell = (r[:, None] * 8 + c[None, :]).ravel()
                flat = arr.ravel()
                sums = np.bincount(cell, weights=flat, minlength=64).astype(
                    np.int64
                )  # float64 accumulation is exact: sums < 2^53
                cnts = np.bincount(cell, minlength=64).astype(np.int64)
                ts, tn = int(flat.sum()), w * h
                bits = (sums * tn > ts * cnts).astype(np.int64)
                hi = int(sum(int(bits[k]) << k for k in range(32)))
                lo = int(sum(int(bits[k]) << (k - 32) for k in range(32, 64)))
                ids.append(int(mid))
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {"media_id": ids, "ahash_hi": his, "ahash_lo": los}
            )

    return media.select("media_id", "blob").mapInPandas(
        hash_batches, PHASH_SCHEMA
    )


FRAME_ENERGY_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("total_energy", LongType()),
        StructField("peak_frame", IntegerType()),
        StructField("peak_energy", LongType()),
    ]
)


def frame_energy(media: DataFrame, frame_len: int = 64) -> DataFrame:
    """Audio waveform framing + energy — the audio-path member of the
    multimodal family, and the one that needs NO codec seam: the
    payload bytes ARE the samples (unsigned 8-bit PCM convention,
    centered at 128), so the whole decode→frame→energy pipeline is
    real arithmetic, not a stub. Per audio blob: non-overlapping
    frames of `frame_len` samples (tail partial frame dropped — the
    standard STFT framing convention), energy(f) = Σ (s−128)² over
    the frame; emits n_frames, total energy over full frames, and
    the peak frame (ties → smallest index). All INTEGER, so the
    closed-form fixture oracle is exact.

    Scale shape: same Arrow-batched mapInPandas seam as decode_media
    — blob bytes stop at the UDF, only 5 small columns leave; kind
    pruning happens on the partition column before any byte is read.
    A real 16-bit/real-codec deployment swaps np.frombuffer's dtype /
    adds the decoder inside the same seam."""
    import numpy as np

    from big_data_engineering_project_spark.sources.catalog import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(media.sparkSession)
    audio = media.filter(F.col("kind") == "audio").select("media_id", "blob")

    def energize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [],
                "n_frames": [],
                "total_energy": [],
                "peak_frame": [],
                "peak_energy": [],
            }
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                blob = bytes(blob)
                w, h = _unpack_checked_header(mid, blob)
                samples = (
                    np.frombuffer(blob[8 : 8 + w * h], dtype=np.uint8)
                    .astype(np.int64)
                    - 128
                )
                nf = len(samples) // frame_len
                if nf == 0:
                    rows["media_id"].append(mid)
                    rows["n_frames"].append(0)
                    rows["total_energy"].append(0)
                    rows["peak_frame"].append(-1)
                    rows["peak_energy"].append(0)
                    continue
                fr = samples[: nf * frame_len].reshape(nf, frame_len)
                en = (fr * fr).sum(axis=1)
                peak = int(en.argmax())  # argmax returns FIRST max: tie rule
                rows["media_id"].append(mid)
                rows["n_frames"].append(nf)
                rows["total_energy"].append(int(en.sum()))
                rows["peak_frame"].append(peak)
                rows["peak_energy"].append(int(en[peak]))
            yield pd.DataFrame(rows)

    return audio.mapInPandas(energize, FRAME_ENERGY_SCHEMA)


SCENE_CUT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("n_cuts", LongType()),
        StructField("first_cut", IntegerType()),
        StructField("max_diff", LongType()),
        StructField("total_diff", LongType()),
    ]
)


def scene_cuts(media: DataFrame, threshold: int = 100_000) -> DataFrame:
    """Video scene-cut detection — the video-path member of the
    multimodal family that, like the audio `frame_energy`, needs NO
    codec seam: the fixture layout already treats the payload as
    `height` frames of `width` pixels (the same frame-row convention
    `sample_frames` strides over), so the whole decode → frame-diff →
    threshold pipeline is real integer arithmetic. Per video blob:
    diff energy d(i) = Σ_j (frame_i[j] − frame_{i−1}[j])² for
    i = 1..h−1, a cut wherever d(i) ≥ threshold; emits frame count,
    cut count, FIRST cut frame (the index of the new scene's first
    frame; −1 when none), max and total diff energy. All INTEGER, so
    the closed-form fixture oracle is exact. Videos with fewer than
    two frames emit (n_cuts=0, first_cut=−1, max=total=0), mirrored
    by the oracle's left join from the video universe (the r9
    audio-path zero-frame lesson, applied on day one here).

    Scale shape: identical to frame_energy — blob bytes stop at the
    Arrow mapInPandas seam, six small integer columns leave; the
    kind='video' filter prunes partitions before any byte moves. A
    real deployment swaps the frombuffer reshape for the ffmpeg
    decode inside the same seam and keeps the plan.
    """
    import numpy as np

    from big_data_engineering_project_spark.sources.catalog import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(media.sparkSession)
    video = media.filter(F.col("kind") == "video").select("media_id", "blob")

    def cutize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [],
                "n_frames": [],
                "n_cuts": [],
                "first_cut": [],
                "max_diff": [],
                "total_diff": [],
            }
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                blob = bytes(blob)
                w, h = _unpack_checked_header(mid, blob)
                rows["media_id"].append(mid)
                if h < 2 or w == 0:
                    rows["n_frames"].append(int(h))
                    rows["n_cuts"].append(0)
                    rows["first_cut"].append(-1)
                    rows["max_diff"].append(0)
                    rows["total_diff"].append(0)
                    continue
                frames = (
                    np.frombuffer(blob[8 : 8 + w * h], dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(h, w)
                )
                d = ((frames[1:] - frames[:-1]) ** 2).sum(axis=1)
                cuts = np.nonzero(d >= threshold)[0]
                rows["n_frames"].append(int(h))
                rows["n_cuts"].append(int(len(cuts)))
                # d[i-1] is the diff INTO frame i: report the frame idx
                rows["first_cut"].append(
                    int(cuts[0]) + 1 if len(cuts) else -1
                )
                rows["max_diff"].append(int(d.max()))
                rows["total_diff"].append(int(d.sum()))
            yield pd.DataFrame(rows)

    return video.mapInPandas(cutize, SCENE_CUT_SCHEMA)
