#!/bin/bash
# Repro loop for the q80/q81b hot-CPU mode (round-11 "What's wrong" #2:
# q81b burned 8.1x its reference process-CPU on the record run, all
# three attempts hot, while the same code/data costs ~18 cpu-s on a
# clean run). Runs the suspect queries in N sequential FRESH JVMs on an
# otherwise idle box and prints each run's wall/cpu/jit/gc from the
# artifact — if the multi-x mode never appears across many isolated
# runs, it is environmental (co-tenant heat), not an in-process JIT
# mode. Usage: tools/cpurepro.sh [N=6] [queries] [sfdir]
set -uo pipefail
N="${1:-6}"
QS="${2:-q80_trained_adc_search,q81b_classifier_margin}"
SF="${3:-/root/testdata/sf0.1}"
for i in $(seq 1 "$N"); do
  OUT=$(mktemp /tmp/graft-cpurepro.XXXXXX.json)
  SPARK_GRAFT_ONLY="$QS" bash tools/runbench.sh "$OUT" 1g 32 "$SF" >/dev/null 2>&1 || true
  python3 - "$OUT" "$i" <<'PY'
import json, sys
try:
    a = json.load(open(sys.argv[1]))
except Exception as e:
    print(f"run {sys.argv[2]}: artifact unreadable ({e})"); raise SystemExit
for q in sorted(a.get("queries", {})):
    w = a["queries"][q]
    c = a.get("cpu_s", {}).get(q)
    j = a.get("jit_s", {}).get(q)
    g = a.get("gc_s", {}).get(q)
    print(f"run {sys.argv[2]} {q}: wall={w} cpu={c} jit={j} gc={g}")
print(f"run {sys.argv[2]} calib: wall={a.get('calib_wall_s')} cpu={a.get('calib_cpu_s')}")
PY
  rm -f "$OUT"
done
