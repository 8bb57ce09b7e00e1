#!/usr/bin/env python
"""Replica-count scaling of the SSE sweep: per-replica-timestep cost at
R in {64, 128, 256, 512, 1024} (or a custom list).

TPU VPU lanes are 128-wide, so R=64 half-fills the minor dimension of every
[.., R] tensor; the MXU one-hot gathers also amortize with R. If the batched
sweep cost grows sub-linearly in R, the bench suite should run more replicas
(aggregate ESS/s is what the north star counts). Marginal methodology as in
profile_32.py. Usage: python scripts/profile_r_scaling.py [L] [beta] [R,R,...]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, multi_sweep, sweep

L = int(sys.argv[1]) if len(sys.argv) > 1 else 32
beta = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
R_LIST = (
    tuple(int(r) for r in sys.argv[3].split(","))
    if len(sys.argv) > 3
    else (64, 128, 256, 512, 1024)
)

print(f"device: {jax.devices()[0]}", file=sys.stderr)
edges = lattice.frustrated_square(L, L)
b = jnp.float32(beta)

for R in R_LIST:
    g = QmcIsingGraph(edges, transverse=1.0, replicas=R, seed=1234)
    for _ in range(4):
        g.sse, ns, _, _ = multi_sweep(g.sse, b, g.model, 6)
        float(jnp.sum(ns))
        g._maybe_grow()
    sse, model = g.sse, g.model

    def mk(n):
        # Chain the state through the scan and consume state + ops so the
        # measured body is the real sweep: a non-chained body that only sums
        # ``new.ops.bond`` lets XLA dead-code-eliminate the entire cluster
        # update + resample (they touch inputs/outputs/state, not bond) —
        # that bug made an earlier version of this script report ~3.8 ms
        # "sweeps" that were just the diagonal update.
        @jax.jit
        def run(r):
            def step(s, i):
                new, _ = sweep(s._replace(key=jax.random.key(i + r)), b,
                               model)
                return new, None
            out, _ = jax.lax.scan(step, sse, jnp.arange(n))
            return (jnp.sum(out.ops.bond).astype(jnp.float32)
                    + jnp.sum(out.state))
        return lambda r: run(jnp.int32(r * 131))

    f1, f2 = mk(2), mk(6)
    f1(0), f2(0)
    float(f1(1)), float(f2(1))

    def best(f):
        out = 1e9
        for r in range(2, 6):
            t0 = time.perf_counter()
            float(f(r))
            out = min(out, time.perf_counter() - t0)
        return out

    per = (best(f2) - best(f1)) / 4
    print(
        f"R={R:<4} cutoff={g.cutoff:<6} sweep {per*1e3:8.1f} ms  "
        f"per-replica {per/R*1e6:8.1f} us  ({R/per:,.0f} replica-sweeps/s)"
    )
