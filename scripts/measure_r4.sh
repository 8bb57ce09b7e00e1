#!/bin/bash
# Fourth TPU measurement pass: the ESS ladder and cluster profile with the
# in-VMEM bitonic sort kernel enabled (run after scripts/profile_sortk.py
# validates it on hardware). Resumable: completed steps are skipped.
#
# Usage: bash scripts/measure_r4.sh [outdir]
set -u
OUT=${1:-/tmp/measure4_r2}
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

echo "[measure_r4] waiting for TPU tunnel..." >&2
until probe; do sleep 120; done
echo "[measure_r4] tunnel up" >&2
# Single CPU core: flag measurement-in-progress so the test runner's
# YIELD_WHILE gate (scripts/run_tests.sh) pauses between files.
touch /tmp/tpu_busy
trap 'rm -f /tmp/tpu_busy' EXIT

run() { # run <name> <timeout_s> <cmd...> — skips completed steps
  local name=$1 to=$2; shift 2
  if grep -q "^exit=0" "$OUT/$name.out" 2>/dev/null; then
    echo "[measure_r4] $name: already done, skipping" >&2
    return 0
  fi
  echo "[measure_r4] $name" >&2
  timeout "$to" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  echo "exit=$? $(date +%H:%M:%S)" >> "$OUT/$name.out"
  probe || { echo "[measure_r4] tunnel dropped" >&2; exit 1; }
}

run profile_cluster_k 3000 env ISING_SORT_KERNEL=1 python scripts/profile_cluster.py 32 256
run ess32_k3_kern 2400 env ISING_SORT_KERNEL=1 python scripts/ess32.py 32 256 18 3
run ess32_k4_kern 2400 env ISING_SORT_KERNEL=1 python scripts/ess32.py 32 256 20 4
run ess32_k6_r512_kern 2400 env ISING_SORT_KERNEL=1 python scripts/ess32.py 32 512 24 6
run ess32_k8_r512_kern 2400 env ISING_SORT_KERNEL=1 python scripts/ess32.py 32 512 32 8
run bench_headline_k 4200 env ISING_SORT_KERNEL=1 ISING_BENCH_WAIT=600 python bench.py

echo "[measure_r4] done" >&2
date > "$OUT/done_at.txt"
