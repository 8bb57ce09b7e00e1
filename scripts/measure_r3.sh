#!/bin/bash
# Third TPU measurement pass (sort-scatter hook write + k/R ESS sweep +
# official bench records). Resumable: completed steps are skipped.
#
# Usage: bash scripts/measure_r3.sh [outdir]
set -u
OUT=${1:-/tmp/measure3_r2}
mkdir -p "$OUT"
cd /root/repo

probe() {
  timeout 120 python -c "
import jax
assert jax.devices()[0].platform == 'tpu'
import jax.numpy as jnp
assert float(jnp.sum(jnp.arange(8.0))) == 28.0
" >/dev/null 2>&1
}

echo "[measure_r3] waiting for TPU tunnel..." >&2
until probe; do sleep 120; done
echo "[measure_r3] tunnel up" >&2
# Single CPU core: flag measurement-in-progress so the test runner's
# YIELD_WHILE gate (scripts/run_tests.sh) pauses between files.
touch /tmp/tpu_busy
trap 'rm -f /tmp/tpu_busy' EXIT

run() { # run <name> <timeout_s> <cmd...> — skips completed steps
  local name=$1 to=$2; shift 2
  if grep -q "^exit=0" "$OUT/$name.out" 2>/dev/null; then
    echo "[measure_r3] $name: already done, skipping" >&2
    return 0
  fi
  echo "[measure_r3] $name" >&2
  timeout "$to" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  echo "exit=$? $(date +%H:%M:%S)" >> "$OUT/$name.out"
  probe || { echo "[measure_r3] tunnel dropped" >&2; exit 1; }
}

# Queue order: the diag carry A/B first (it decides the per-timestep floor
# — the ESS lever at high cluster_every), then bench-lattice cluster
# breakdowns, then official bench rows. profile_sortk moved LAST: its fully
# unrolled bitonic network OOM-killed the remote compile helper once
# (MEASUREMENTS_r2.md); it gets one retry after everything else.
run ess32_k8_r512 2400 python scripts/ess32.py 32 512 32 8
run profile_diag_r512 3600 python scripts/profile_diag.py 32 512
run profile_cluster_r512 3600 python scripts/profile_cluster.py 32 512
run bench_headline 4800 env ISING_BENCH_WAIT=600 python bench.py
run ess32_k3_r1024 3000 python scripts/ess32.py 32 1024 18 3
run tempering_16 2400 python scripts/profile_tempering.py 16 64
run profile_cluster_r256 3000 python scripts/profile_cluster.py 32 256
run bench_suite 7200 env ISING_BENCH_WAIT=600 python bench.py --suite --no-sse
run profile_sortk 3600 python scripts/profile_sortk.py 32 256

echo "[measure_r3] done" >&2
date > "$OUT/done_at.txt"
