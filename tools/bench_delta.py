"""Prev-round lane-delta check (round-5 verdict ask #3, relocated: bench.py
is frozen for measurement this round, so the check runs as a post-hoc tool
over the artifacts instead of inside the bench).

Usage:
    python tools/bench_delta.py [current_lanes_detail.json] [prev_BENCH_rNN.json]

Compares each lane's time against the previous round's best-known time and
flags lanes slower than ``threshold`` (default 1.5x, env BENCH_DELTA_MAX),
attaching the lane's recorded load context so a contended window is visible
next to the regression claim. Exit code 1 when any flagged lane lacks a
load excuse (load_before > 2.0 counts as contended on this host).
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    cur_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH/lanes_detail.json"
    prev_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_r05.json"
    threshold = float(os.environ.get("BENCH_DELTA_MAX", "1.5"))

    with open(cur_path) as f:
        cur = json.load(f)
    with open(prev_path) as f:
        prev = json.load(f)

    # previous best per lane: queries_min if the driver artifact, else queries
    if "parsed" in prev and prev["parsed"]:
        prev_q = prev["parsed"].get("queries_min") or prev["parsed"]["queries"]
    else:
        prev_q = prev.get("queries_min") or prev["queries"]
    cur_q = cur["queries"]
    lanes = cur.get("lanes", {})

    flagged, clean_flagged = [], []
    for name, sec in sorted(cur_q.items()):
        base = prev_q.get(name)
        if base is None or base <= 0:
            print(f"NEW    {name}: {sec}s (no previous round)")
            continue
        ratio = sec / base
        load = (lanes.get(name) or {}).get("load_before")
        mark = "SLOWER" if ratio > threshold else ("faster" if ratio < 1 / threshold else "  ok  ")
        if ratio > threshold:
            flagged.append(name)
            if load is not None and load <= 2.0:
                clean_flagged.append(name)
        print(
            f"{mark} {name}: {sec}s vs {base}s (x{ratio:.2f}"
            + (f", load_before={load}" if load is not None else "")
            + ")"
        )
    if flagged:
        print(f"\nflagged >{threshold}x: {flagged}")
        print(f"flagged with clean load (<=2.0): {clean_flagged}")
    return 1 if clean_flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
