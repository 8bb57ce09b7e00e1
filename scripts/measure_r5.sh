#!/bin/bash
# Round-3 TPU measurement pass, in VERDICT.md priority order:
#   1. RVB active-slot compaction A/B (the round's structural item #5)
#   2. diag carry A/B rerun at R=512 + _parallel_weights breakdown
#      (decides ISING_DIAG_KERNEL, VERDICT #3; feeds the ESS goal #2)
#   3. long-series ESS ladder rows (Weak #7)
#   4. official bench headline + full suite JSONL (VERDICT #1/#4)
#   5. sort-kernel TPU validation last (compile-helper OOM risk)
# Resumable: completed steps are skipped.
#
# Usage: bash scripts/measure_r5.sh [outdir]
set -u
OUT=${1:-/tmp/measure1_r3}
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

echo "[measure_r5] waiting for TPU tunnel..." >&2
until probe; do sleep 120; done
echo "[measure_r5] tunnel up" >&2
# Single CPU core: flag measurement-in-progress so the test runner's
# YIELD_WHILE gate (scripts/run_tests.sh) pauses between files.
touch /tmp/tpu_busy
trap 'rm -f /tmp/tpu_busy' EXIT

run() { # run <name> <timeout_s> <cmd...> — skips completed steps
  local name=$1 to=$2; shift 2
  if grep -q "^exit=0" "$OUT/$name.out" 2>/dev/null; then
    echo "[measure_r5] $name: already done, skipping" >&2
    return 0
  fi
  echo "[measure_r5] $name" >&2
  timeout "$to" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  echo "exit=$? $(date +%H:%M:%S)" >> "$OUT/$name.out"
  probe || { echo "[measure_r5] tunnel dropped" >&2; exit 1; }
}

run time_rvb_ab 3000 python scripts/time_rvb.py 64 4 6
run profile_diag2_r512 3600 python scripts/profile_diag2.py 32 512
run profile_diag_rerun 3600 python scripts/profile_diag.py 32 512
run profile_diag_r64 3600 python scripts/profile_diag.py 32 64
run profile_cluster_r512 3600 python scripts/profile_cluster.py 32 512
run profile_prep_r512 3600 python scripts/profile_prep.py 32 512
run tune_hook_r512 3600 python scripts/tune_hook.py 32 512
run profile_sortk 3600 python scripts/profile_sortk.py 32 256
run profile_sg_r512 3600 python scripts/profile_sg.py 32 512
run profile_cluster2_r512 3600 python scripts/profile_cluster.py 32 512
run ess32_k6_r512_long 3000 python scripts/ess32.py 32 512 40 6 8
run ess32_k4_r512_long 3000 python scripts/ess32.py 32 512 40 4 8
run ess32_k6_r1024 3000 python scripts/ess32.py 32 1024 30 6 4
run bench_headline 4800 env ISING_BENCH_WAIT=600 python bench.py
run suite_json 9000 env ISING_BENCH_WAIT=600 python bench.py --no-sse \
  --suite-json "$OUT/suite_r3.jsonl"
run profile_sortk 3600 python scripts/profile_sortk.py 32 256

echo "[measure_r5] done" >&2
date > "$OUT/done_at.txt"
