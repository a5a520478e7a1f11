#!/usr/bin/env python3
"""Distill a full bench artifact (BENCH_LAST.json shape) into the
checked-in per-query cpu reference BENCH_REF.json the self-healing
retry compares against. Refresh from a CLEAN run whenever the board
changes, BEFORE the closing run, so every query has a reference cost.

Usage: python3 tools/mkref.py [in=BENCH_LAST.json] [out=BENCH_REF.json]
"""
import json, sys, os

src = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/BENCH_LAST.json"
out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/BENCH_REF.json"
a = json.load(open(src))
cpu = {k: v for k, v in a.get("cpu_s", {}).items() if isinstance(v, (int, float))}
wall = {k: v for k, v in a.get("queries", {}).items() if isinstance(v, (int, float))}
if not cpu:
    sys.exit(f"{src} has no numeric cpu_s map — run the full-artifact bench first")
ref = {
    "source": os.path.basename(src),
    "sf": os.path.basename(a.get("sf", "sf0.1")),
    "calib_cpu_s": a.get("calib_cpu_s", -1.0),
    "cpu_s": dict(sorted(cpu.items())),
    # Per-query WALL from the same clean run: the round-12 acceptance
    # bar (wall <= 2x ref-wall OR cpu <= 2x ref-cpu) and the parent's
    # shard-median heat detector both read it.
    "wall_s": dict(sorted(wall.items())),
}
json.dump(ref, open(out, "w"), indent=1)
print(f"wrote {out}: {len(cpu)} query references, calib {ref['calib_cpu_s']}")
