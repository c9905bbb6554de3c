"""Guards for the round-over-round tooling itself: tools/bench_diff.py
must be able to read every COMMITTED bench artifact, including the one
whose driver capture was head-truncated (BENCH_r07.json, parsed: null
— the r8 verdict's broken comparison)."""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

import bench_diff  # noqa: E402


def test_salvage_reconstructs_truncated_tail():
    full = {
        "metric": "headline_queries_total",
        "value": 3.0,
        "queries": {"q_a": 1.0, "q_b": 2.0, "q_brace{}": 0.5},
        "calibration": {"pre_sec": 1.1, "post_sec": 1.3},
    }
    line = json.dumps(full)
    # Head-truncate past the opening brace, like the driver's
    # last-2000-chars capture did to the r7 line.
    doc = bench_diff.salvage(line[7:])
    assert doc["queries"] == full["queries"]
    assert doc["calibration"] == full["calibration"]


def test_salvage_raises_when_queries_gone():
    import pytest

    with pytest.raises(ValueError):
        bench_diff.salvage('"calibration": {"pre_sec": 1}}')


def test_load_reads_every_committed_bench_artifact():
    import glob

    arts = sorted(glob.glob(os.path.join(ROOT, "BENCH_r0*.json")))
    assert arts, "no committed bench artifacts found"
    for path in arts:
        raw = json.load(open(path))
        if "parsed" not in raw and "queries" not in raw:
            continue  # pre-protocol round shapes (r1-r2)
        try:
            doc = bench_diff.load(path)
        except ValueError:
            # Only tolerable for artifacts whose tail truly lost the
            # queries object — assert that is the case.
            assert '"queries"' not in raw.get("tail", ""), path
            continue
        assert isinstance(doc.get("queries"), dict) and doc["queries"], path
