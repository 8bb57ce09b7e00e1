#!/bin/bash
# Unattended TPU measurement pass: waits for the tunnel, then runs the
# pending component profiles (CLAUDE.md "Pending TPU re-measurement") and
# the bench suite, saving outputs under /tmp/measure/.
#
# Usage: bash scripts/measure_all.sh [outdir]
set -u
OUT=${1:-/tmp/measure}
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

echo "[measure_all] waiting for TPU tunnel..." >&2
until probe; do sleep 120; done
date > "$OUT/tpu_up_at.txt"
echo "[measure_all] tunnel up; profiling" >&2

run() { # run <name> <timeout_s> <cmd...> — resumable: skips completed steps
  local name=$1 to=$2; shift 2
  if grep -q "^exit=0" "$OUT/$name.out" 2>/dev/null; then
    echo "[measure_all] $name: already done, skipping" >&2
    return 0
  fi
  echo "[measure_all] $name" >&2
  timeout "$to" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  echo "exit=$? $(date +%H:%M:%S)" >> "$OUT/$name.out"
}

run profile_32 2400 python scripts/profile_32.py 32 64
probe || { echo "[measure_all] tunnel dropped" >&2; exit 1; }
run profile_rvb_04 2400 python scripts/profile_rvb.py 4 10 64
probe || { echo "[measure_all] tunnel dropped" >&2; exit 1; }
run profile_rvb_06 3000 python scripts/profile_rvb.py 6 10 64
probe || { echo "[measure_all] tunnel dropped" >&2; exit 1; }
run bench_headline 4200 env ISING_BENCH_WAIT=60 python bench.py
probe || { echo "[measure_all] tunnel dropped" >&2; exit 1; }
run bench_suite 5400 env ISING_BENCH_WAIT=60 python bench.py --suite
echo "[measure_all] done" >&2
date > "$OUT/done_at.txt"
