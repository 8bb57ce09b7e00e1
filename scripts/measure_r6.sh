#!/bin/bash
# Round-4 TPU measurement pass (new image: PYTHONPATH kept, persistent
# compile cache on). Order:
#   1. sort-kernel first TPU validation (raised scoped-VMEM cap)
#   2. cluster profile under the new image (+ sort-kernel A/B if 1 passes)
#   3. hook fixpoint n_compress tuning
#   4. long-series ESS ladder rows (north star >= 10k)
#   5. official bench headline (cache-warm timing check)
#   6. full reference suite JSONL incl. rvb_cold_7/8, two_d_rvb_32
# Resumable: completed steps are skipped.
#
# Usage: bash scripts/measure_r6.sh [outdir]
set -u
OUT=${1:-/tmp/measure_r4}
mkdir -p "$OUT"
cd /root/repo

probe() {
  timeout 180 python -c "
import jax
assert jax.devices()[0].platform == 'tpu'
import jax.numpy as jnp
assert float(jnp.sum(jnp.arange(8.0))) == 28.0
" >/dev/null 2>&1
}

echo "[measure_r6] waiting for TPU tunnel..." >&2
until probe; do sleep 120; done
echo "[measure_r6] tunnel up" >&2
touch /tmp/tpu_busy
trap 'rm -f /tmp/tpu_busy' EXIT

run() { # run <name> <timeout_s> <cmd...> — skips completed steps
  local name=$1 to=$2; shift 2
  if grep -q "^exit=0" "$OUT/$name.out" 2>/dev/null; then
    echo "[measure_r6] $name: already done, skipping" >&2
    return 0
  fi
  echo "[measure_r6] $name" >&2
  timeout "$to" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  echo "exit=$? $(date +%H:%M:%S)" >> "$OUT/$name.out"
  until probe; do
    echo "[measure_r6] tunnel down; waiting" >&2
    sleep 120
  done
}

run profile_sortk 2400 python scripts/profile_sortk.py 32 256
run profile_cluster_r512 3600 python scripts/profile_cluster.py 32 512
run tune_hook_r512 3600 python scripts/tune_hook.py 32 512
run ess32_k6_r512_long 3600 python scripts/ess32.py 32 512 40 6 8
run ess32_k4_r512_long 3600 python scripts/ess32.py 32 512 40 4 8
run ess32_k6_r1024 3600 python scripts/ess32.py 32 1024 30 6 4
run bench_headline 2700 python bench.py
run suite_json 9000 python bench.py --no-sse --suite-json "$OUT/suite_r4.jsonl"

echo "[measure_r6] done" >&2
date > "$OUT/done_at.txt"
