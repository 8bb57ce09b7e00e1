#!/usr/bin/env python
"""A/B the heat-bath proposal sampler on TPU: jnp.searchsorted (old route)
vs tables.searchsorted_left's two-level compare-count (new default), at the
reference heat-bath suite shapes. Marginal methodology per CLAUDE.md.

Usage: python scripts/profile_heatbath.py [L] [R]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.sse import diagonal as _diag
from isingmontecarlo_tpu.sse import tables as _tables
from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, multi_sweep

L = int(sys.argv[1]) if len(sys.argv) > 1 else 16
R = int(sys.argv[2]) if len(sys.argv) > 2 else 256

print(f"device: {jax.devices()[0]}", file=sys.stderr)
g = QmcIsingGraph(
    lattice.bench_two_d_periodic(L), transverse=1.0, replicas=R, seed=7
)
g.set_enable_heatbath(True)
beta = jnp.float32(1.0)
stable = 0
for _ in range(40):
    g.sse, ns, _, _ = multi_sweep(
        g.sse, beta, g.model, 2, hb=g._hb_tables, heatbath=True
    )
    float(jnp.sum(ns))
    before = g.cutoff
    g._maybe_grow()
    stable = stable + 1 if g.cutoff == before else 0
    if stable >= 2:
        break
print(f"cutoff={g.cutoff}", file=sys.stderr)
sse0, model, hbt = g.sse, g.model, g._hb_tables


def marginal(name, n1=2, n2=8):
    def run(n, r):
        # Vary an input each call: the tunnel short-circuits identical
        # re-executions (CLAUDE.md). A global spin flip is Z2-exact.
        s, ns, _, _ = multi_sweep(
            sse0._replace(state=sse0.state ^ jnp.bool_(r % 2)),
            beta, model, n, hb=hbt, heatbath=True,
        )
        return float(jnp.sum(ns))

    def best(n):
        run(n, 0)  # compile
        b = 1e9
        for r in range(2, 6):
            t0 = time.perf_counter()
            run(n, r)
            b = min(b, time.perf_counter() - t0)
        return b

    per = (best(n2) - best(n1)) / (n2 - n1)
    print(f"{name:<44} {per*1e3:9.3f} ms/batched sweep", flush=True)
    return per


marginal("heat-bath sweep (two-level searchsorted)")

_old = _diag._searchsorted_left
_diag._searchsorted_left = lambda t, q, on_tpu=None: jnp.searchsorted(
    t, q
).astype(jnp.int32)
jax.clear_caches()
try:
    marginal("heat-bath sweep (jnp.searchsorted)")
finally:
    _diag._searchsorted_left = _old
print("done")
