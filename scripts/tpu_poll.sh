#!/bin/bash
# Poll the axon TPU tunnel until it answers a tiny op; write a flag file.
# Usage: bash scripts/tpu_poll.sh [flagfile]
FLAG=${1:-/tmp/tpu_up}
rm -f "$FLAG"
while true; do
  # NOTE: do NOT strip PYTHONPATH here — the round-4 image ships the axon
  # plugin via PYTHONPATH=/root/.axon_site (earlier images required the
  # opposite; see bench.py::_wait_for_tpu).
  if timeout 120 python -c "
import jax
assert jax.devices()[0].platform == 'tpu'
import jax.numpy as jnp
assert float(jnp.sum(jnp.arange(8.0))) == 28.0
" >/dev/null 2>&1; then
    date > "$FLAG"
    echo "[tpu_poll] tunnel up $(date)"
    exit 0
  fi
  echo "[tpu_poll] down $(date)"
  sleep 60
done
