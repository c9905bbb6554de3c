"""Same-session calibrated A/B for the r5→r6 bench drift (r6 verdict
task 2): is the uniform ~1.14–1.31× inflation of unchanged queries a
HOST effect (shared-VM contention — the noise ledger's hypothesis) or
a real fixed-overhead creep from the 36%-larger registry/session?

Protocol, all inside ONE Spark session on an idle machine:
  1. calibration probe (bench.calibration_probe — fixture-free,
     registry-free, CPU-bound; moves with host speed only);
  2. the r5∩r6 common headline queries, bench protocol (1 warm-up +
     3 timed reps, median), in BENCH_r05 key order;
  3. probe again (drift WITHIN the session would invalidate step 2).

Reading the result: the common-query total ratio vs each artifact is
compared per query. If today's ratio vs r5 is uniform AND today's
probe differs across rounds once future artifacts carry probes, the
drift divides out. For THIS first calibrated round, the decision rule
is: a per-query ratio spread that is tight around its median (uniform
scaling) with a stable probe pre≈post says the inflation is a
between-session environment shift, not any query's plan — because a
registry/session overhead would have to inflate all 26 heterogeneous
plans by the same multiplicative factor while leaving the probe and
the intra-session reps flat, which no per-query fixed cost does.

Writes one line to PROGRESS.jsonl and prints a summary.
"""

from __future__ import annotations

import datetime
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from big_data_engineering_project_spark.plans import REGISTRY  # noqa: E402
from big_data_engineering_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def load_queries(path: str) -> dict[str, float]:
        with open(path) as fh:
            d = json.load(fh)
        return (d.get("parsed") or d)["queries"]

    r5 = load_queries(os.path.join(REPO, "BENCH_r05.json"))
    r6 = load_queries(os.path.join(REPO, "BENCH_r06.json"))
    common = [q for q in r5 if q in r6 and q in REGISTRY]

    spark = get_spark("bde-calibrate-ab")
    from pyspark.sql import functions as F

    spark.range(1000).agg(F.sum("id")).collect()
    cal_pre = bench.calibration_probe(spark)
    print(f"# probe pre: {cal_pre}", file=sys.stderr)

    timings: dict[str, float] = {}
    for i, name in enumerate(common):
        spec = REGISTRY[name]
        for _ in range(1 + (1 if i == 0 else 0)):
            spec.builder(spark, sf_dir).count()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 3))
        timings[name] = round(statistics.median(runs), 3)
        print(f"# {name}: {timings[name]}s runs={runs}", file=sys.stderr)

    cal_post = bench.calibration_probe(spark)
    print(f"# probe post: {cal_post}", file=sys.stderr)
    spark.stop()

    tot_now = sum(timings.values())
    tot_r5 = sum(r5[q] for q in common)
    tot_r6 = sum(r6[q] for q in common)
    ratios_r5 = sorted(timings[q] / r5[q] for q in common if r5[q] > 0)
    med = statistics.median(ratios_r5)
    iqr = (
        ratios_r5[3 * len(ratios_r5) // 4] - ratios_r5[len(ratios_r5) // 4]
    )
    probe_stable = (
        abs(cal_post["sec"] - cal_pre["sec"])
        / max(cal_pre["sec"], cal_post["sec"])
        < 0.25
    )
    uniform = iqr < 0.35 * med
    verdict = (
        "host"
        if (uniform and probe_stable)
        else ("investigate" if probe_stable else "unstable-session")
    )
    record = {
        "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        "what": "calibrated_ab_r7",
        "common_n": len(common),
        "total_now": round(tot_now, 3),
        "total_r5": round(tot_r5, 3),
        "total_r6": round(tot_r6, 3),
        "ratio_vs_r5": round(tot_now / tot_r5, 3),
        "ratio_vs_r6": round(tot_now / tot_r6, 3),
        "per_query_ratio_vs_r5_median": round(med, 3),
        "per_query_ratio_vs_r5_iqr": round(iqr, 3),
        "probe_pre_sec": cal_pre["sec"],
        "probe_post_sec": cal_post["sec"],
        "conclusion": verdict,
        "queries": timings,
    }
    with open(os.path.join(REPO, "PROGRESS.jsonl"), "a") as fh:
        fh.write(json.dumps(record) + "\n")
    print(json.dumps({k: v for k, v in record.items() if k != "queries"}))


if __name__ == "__main__":
    main()
