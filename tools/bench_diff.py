"""Round-over-round bench comparison: per-query ratios against a prior
BENCH artifact, with the noise ledger's thresholds applied.

Usage: python tools/bench_diff.py BENCH_r04.json BENCH_r05.json
       python tools/bench_diff.py BENCH_r04.json /tmp/bench_now.json

Accepts either the driver artifact shape ({"parsed": {...}}) or
bench.py's raw stdout line shape ({"queries": {...}}). Queries present
in only one file are listed separately so added/removed headliners
can't silently skew the total.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as fh:
        doc = json.load(fh)
    if "parsed" in doc and doc["parsed"]:
        doc = doc["parsed"]
    return doc["queries"]


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    common = sorted(set(old) & set(new))
    rows = [(n, old[n], new[n], new[n] / old[n] if old[n] else float("inf"))
            for n in common]
    rows.sort(key=lambda r: r[3], reverse=True)
    print(f"{'query':<28} {'old':>7} {'new':>7} {'ratio':>6}")
    for n, o, w, r in rows:
        flag = "  <-- check" if r > 1.2 else ""
        print(f"{n:<28} {o:>7.3f} {w:>7.3f} {r:>6.2f}{flag}")
    so, sn = sum(old[n] for n in common), sum(new[n] for n in common)
    print(f"\ncommon total: {so:.3f} -> {sn:.3f}  ({sn / so:.2f}x over "
          f"{len(common)} queries)")
    for label, names in (("only-old", set(old) - set(new)),
                         ("only-new", set(new) - set(old))):
        if names:
            print(f"{label}: {sorted(names)}")
    print("\nnote: >1.2x flags need the noise-ledger treatment "
          "(bench.py docstring) - idle machine, run profile, git log -L "
          "on the operator body - before being called regressions.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
