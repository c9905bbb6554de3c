"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed twice: a warm-up is NOT done (driver measures
cold numbers); timing = full action (plan + execute + count collect of
the result — results are small aggregates/topk by construction).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_engineering_project_spark.plans import REGISTRY  # noqa: E402
from big_data_engineering_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    from pyspark.sql import functions as F

    spark = get_spark("bde-bench")
    # One trivial action so JVM/codegen warm-up isn't charged to the
    # first measured query (measures the engine, not JIT start-up).
    spark.range(1000).agg(F.sum("id")).collect()
    timings: dict[str, float] = {}
    headliners = [spec for spec in REGISTRY.values() if spec.headline]
    for spec in headliners:
        t0 = time.perf_counter()
        df = spec.builder(spark, sf_dir)
        n = df.count()
        timings[spec.name] = round(time.perf_counter() - t0, 3)
        print(f"# {spec.name}: {timings[spec.name]}s rows={n}", file=sys.stderr)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
