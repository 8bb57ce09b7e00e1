#!/bin/bash
# Round-5 TPU measurement queue. Design constraints (CLAUDE.md): single CPU
# core (compiles are minutes each for 32^2-sized programs; never two heavy
# processes), flaky tunnel (probe + wait between steps), persistent compile
# cache works and is THE mechanism that makes the driver's end-of-round
# `python bench.py` land: every step here doubles as a cache pre-warm.
#
# Order: pin discovery (growth shapes) -> pinned ess32 pre-warm (the ONE
# program the driver's run dispatches) -> k-ladder (same program, traced
# flags -> zero extra compiles) -> warm bench verification -> profiles /
# gate decisions -> suite deep rows (long tail, each row independently
# recorded).
#
# Usage: bash scripts/measure_r8.sh [outdir]
set -u
OUT=${1:-/tmp/measure_r5}
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

echo "[measure_r8] waiting for TPU tunnel..." >&2
until probe; do sleep 120; done
echo "[measure_r8] tunnel up" >&2
touch /tmp/tpu_busy
trap 'rm -f /tmp/tpu_busy' EXIT

run() { # run <name> <timeout_s> <cmd...> — skips completed steps
  local name=$1 to=$2; shift 2
  if grep -q "^exit=0" "$OUT/$name.out" 2>/dev/null; then
    echo "[measure_r8] $name: already done, skipping" >&2
    return 0
  fi
  echo "[measure_r8] $name ($(date +%H:%M:%S))" >&2
  timeout "$to" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  echo "exit=$? $(date +%H:%M:%S)" >> "$OUT/$name.out"
  until probe; do
    echo "[measure_r8] tunnel down; waiting" >&2
    sleep 120
  done
}

# 1. Pin discovery (writes .ess32_pins.json; growth shapes were partially
#    cached by the round-4 driver attempts).
run pin_discovery_r512 5400 env ISING_ESS_NOPIN=1 ISING_ESS_CHUNK=2 \
  python scripts/ess32.py 32 512 8 1 1

# 2. Pinned pre-warm: compiles the ONE pinned program (cutoff+caps pinned,
#    traced thinning flags). THE step that makes the driver's ess32 land.
run ess32_pinned_k6 5400 python scripts/ess32.py 32 512 24 6 4

# 3. k-ladder: same program, different flag inputs -> seconds per row.
run ess32_pinned_k1 900 python scripts/ess32.py 32 512 24 1 4
run ess32_pinned_k2 900 python scripts/ess32.py 32 512 24 2 4
run ess32_pinned_k3 900 python scripts/ess32.py 32 512 24 3 4
run ess32_pinned_k4 900 python scripts/ess32.py 32 512 24 4 4
run ess32_pinned_k8 900 python scripts/ess32.py 32 512 24 8 4
# Long-series confirmation at the ladder optimum (>= 50*tau samples).
run ess32_pinned_k6_long 1800 python scripts/ess32.py 32 512 24 6 12

# 4. Warm bench end-to-end (the exact driver invocation; must finish well
#    under the driver's window and carry sse32_ess_per_sec).
run bench_warm 2700 python bench.py

# 5. Cluster profile + hook tuning at the production shape (the round-5
#    optimization targets), then the sort-kernel TPU decision data.
run profile_cluster_r512 5400 python scripts/profile_cluster.py 32 512
run tpu_kernel_tests 2400 env JAX_REAL_TPU=1 python -m pytest \
  tests/test_tpu_kernels.py -x -q
# profile_sortk: kernel measured 5-10x slower than lax.sort and DELETED (r5)
run tune_hook_r512 3600 python scripts/tune_hook.py 32 512

# 6. Reference suite JSONL (long tail; per-row appends survive crashes).
run suite_json 14400 python bench.py --no-sse --suite-json "$OUT/suite_r5.jsonl"

# 7. Final warm bench re-verification (post any code changes this session).
run bench_warm2 2700 python bench.py

echo "[measure_r8] done" >&2
date > "$OUT/done_at.txt"
