#!/bin/bash
# TPU runbook for round 3 — run SOLO (no concurrent CPU pytest: device_time
# differencing skews under host load). Each step logs to /tmp/runbook/.
# Order matters: smoke (strip kernels never ran compiled) -> tune (persists
# per-chip tables the later benches read) -> suites.
set -x
mkdir -p /tmp/runbook
cd /root/repo

step() {  # step <name> <timeout-s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date)) ==="
  timeout "$t" "$@" > "/tmp/runbook/$name.log" 2>&1
  echo "$name exit=$?" | tee -a /tmp/runbook/summary.txt
}

step smoke    1800 python scratch_tpu_smoke.py
step tune     5400 python bench.py --tune
step bench    1200 python bench.py
step suite    3600 python bench.py --suite
step varlen   1800 python bench.py --mode varlen
step targetted 1800 python benchmarks/targetted_bench.py
echo "RUNBOOK DONE $(date)" | tee -a /tmp/runbook/summary.txt
