#!/bin/bash
# Follow-on TPU measurement pass (run after scripts/measure_all.sh):
#   1. replica-count scaling of the 32^2 sweep,
#   2. the Pallas diagonal carry kernel vs the speculative scan,
#   3. the north-star ESS/sec sweep over replica counts.
# Outputs under /tmp/measure2/.
set -u
OUT=${1:-/tmp/measure2}
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

echo "[measure_more] waiting for TPU tunnel..." >&2
until probe; do sleep 120; done
echo "[measure_more] tunnel up" >&2

run() { # run <name> <timeout_s> <env...> <cmd...> — skips completed steps
  local name=$1 to=$2; shift 2
  if grep -q "^exit=0" "$OUT/$name.out" 2>/dev/null; then
    echo "[measure_more] $name: already done, skipping" >&2
    return 0
  fi
  echo "[measure_more] $name" >&2
  timeout "$to" env "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  echo "exit=$? $(date +%H:%M:%S)" >> "$OUT/$name.out"
}

# Diag carry kernel first (smallest program; validates the kernel compiles
# and runs on hardware before anything heavier).
run diag_kernel_32 1800 ISING_DIAG_KERNEL=1 python scripts/profile_32.py 32 64
probe || { echo "[measure_more] tunnel dropped" >&2; exit 1; }
# Pallas gather kernel vs the einsum/native paths + labels end-to-end.
run take_kernel_32 2400 NONE=1 python scripts/profile_take.py 32 64
probe || { echo "[measure_more] tunnel dropped" >&2; exit 1; }
# Pallas flip-parity kernel, then all three kernels together.
run parity_kernel_32 1800 ISING_PARITY_KERNEL=1 python scripts/profile_32.py 32 64
probe || { echo "[measure_more] tunnel dropped" >&2; exit 1; }
run allkernels_32 1800 ISING_DIAG_KERNEL=1 ISING_PARITY_KERNEL=1 ISING_TAKE_KERNEL=1 python scripts/profile_32.py 32 64
probe || { echo "[measure_more] tunnel dropped" >&2; exit 1; }
run ess32_allkernels 3000 ISING_DIAG_KERNEL=1 ISING_PARITY_KERNEL=1 ISING_TAKE_KERNEL=1 python scripts/ess32.py 32 64,256
probe || { echo "[measure_more] tunnel dropped" >&2; exit 1; }
run r_scaling 3000 NONE=1 python scripts/profile_r_scaling.py 32 1.0 64,128,256,512
probe || { echo "[measure_more] tunnel dropped" >&2; exit 1; }
run ess32 3000 NONE=1 python scripts/ess32.py 32 64,128,256,512
probe || { echo "[measure_more] tunnel dropped" >&2; exit 1; }
run ess32_kernel 3000 ISING_DIAG_KERNEL=1 python scripts/ess32.py 32 64,256
probe || { echo "[measure_more] tunnel dropped" >&2; exit 1; }
run ess32_k2 3000 NONE=1 python scripts/ess32.py 32 256 16 2
run ess32_k3 3000 NONE=1 python scripts/ess32.py 32 256 16 3
echo "[measure_more] done" >&2
date > "$OUT/done_at.txt"
