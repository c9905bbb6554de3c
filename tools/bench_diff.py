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


def _balanced_object(text: str, start: int) -> str | None:
    """The substring of `text` from the '{' at `start` to its matching
    '}' (string-literal aware), or None if unbalanced (truncated)."""
    depth, in_str, esc = 0, False, False
    for i in range(start, len(text)):
        ch = text[i]
        if in_str:
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
            continue
        if ch == '"':
            in_str = True
        elif ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                return text[start : i + 1]
    return None


def salvage(tail: str) -> dict:
    """Reconstruct the fields bench_diff needs from a driver `tail`
    whose JSON line was truncated at the HEAD (the driver keeps only
    the last 2000 stdout chars; BENCH_r07.json lost its opening brace
    and `parsed` is null). Brace-matches the `queries` and
    `calibration` sub-objects — both live near the line's start, so
    head-truncation that reaches them means the artifact is truly
    unusable and we raise."""
    doc: dict = {}
    for key in ("queries", "calibration"):
        at = tail.find(f'"{key}"')
        if at < 0:
            continue
        brace = tail.find("{", at)
        if brace < 0:
            continue
        obj = _balanced_object(tail, brace)
        if obj is not None:
            try:
                doc[key] = json.loads(obj)
            except json.JSONDecodeError:
                pass
    if "queries" not in doc:
        raise ValueError(
            "tail salvage failed: no balanced 'queries' object in tail"
        )
    return doc


def load(path: str) -> dict:
    with open(path) as fh:
        doc = json.load(fh)
    if "parsed" in doc:
        if doc["parsed"]:
            doc = doc["parsed"]
        else:  # truncated driver capture (e.g. BENCH_r07.json)
            doc = salvage(doc.get("tail", ""))
    return doc


def probe_sec(doc: dict) -> float | None:
    """Median-ish calibration figure from an artifact: the mean of the
    pre/post probe runs (both are medians of REPS already)."""
    cal = doc.get("calibration") or {}
    pre, post = cal.get("pre_sec"), cal.get("post_sec")
    if pre and post:
        return (pre + post) / 2.0
    return None


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old_doc, new_doc = load(sys.argv[1]), load(sys.argv[2])
    old, new = old_doc["queries"], new_doc["queries"]
    # Probe normalization: if both artifacts carry the CPU-bound
    # calibration probe, divide the raw ratio by the probe ratio —
    # what's left is plan/engine change, not host-speed drift.
    po, pn = probe_sec(old_doc), probe_sec(new_doc)
    probe_ratio = (pn / po) if (po and pn) else None
    common = sorted(set(old) & set(new))
    rows = [(n, old[n], new[n], new[n] / old[n] if old[n] else float("inf"))
            for n in common]
    rows.sort(key=lambda r: r[3], reverse=True)
    norm_hdr = f" {'norm':>6}" if probe_ratio else ""
    print(f"{'query':<28} {'old':>7} {'new':>7} {'ratio':>6}{norm_hdr}")
    for n, o, w, r in rows:
        nr = r / probe_ratio if probe_ratio else None
        flagged = (nr if nr is not None else r) > 1.2
        flag = "  <-- check" if flagged else ""
        norm_s = f" {nr:>6.2f}" if nr is not None else ""
        print(f"{n:<28} {o:>7.3f} {w:>7.3f} {r:>6.2f}{norm_s}{flag}")
    so, sn = sum(old[n] for n in common), sum(new[n] for n in common)
    print(f"\ncommon total: {so:.3f} -> {sn:.3f}  ({sn / so:.2f}x over "
          f"{len(common)} queries)")
    if probe_ratio:
        print(f"calibration probe: {po:.3f} -> {pn:.3f} "
              f"({probe_ratio:.2f}x host drift); probe-normalized "
              f"common total ratio: {sn / so / probe_ratio:.2f}x")
    else:
        print("calibration probe missing from one side - raw ratios only")
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
