#!/usr/bin/env python
"""Time the RVB workloads (two_d_rvb_{04,06}, beta=10) on the current code."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, multi_sweep

for L in (4, 6):
    n = L * L
    edges = lattice.frustrated_square(L, L)
    g = QmcIsingGraph(edges, transverse=1.0, replicas=64, seed=1234)
    g.set_run_rvb(True, updates_per_timestep=(n + 1) // 2)
    kw = dict(**g._rvb_args())
    b = jnp.float32(10.0)
    stable = 0
    for _ in range(40):
        g.sse, ns, _, _ = multi_sweep(g.sse, b, g.model, 2, **kw)
        float(jnp.sum(ns))
        before = g.cutoff
        g._maybe_grow()
        stable = stable + 1 if g.cutoff == before else 0
        if stable >= 2:
            break
    for _ in range(2):
        g.sse, ns, _, _ = multi_sweep(g.sse, b, g.model, 4, **kw)
        float(jnp.sum(ns))
        g._maybe_grow()

    def timed(nn):
        t0 = time.perf_counter()
        _, ns, _, _ = multi_sweep(g.sse, b, g.model, nn, **kw)
        float(jnp.sum(ns))
        return time.perf_counter() - t0

    timed(2)
    timed(8)
    t1 = min(timed(2) for _ in range(2))
    t2 = min(timed(8) for _ in range(2))
    per = (t2 - t1) / 6
    print(f"two_d_rvb_{L:02d}: {per*1e3:9.1f} ms/timestep (batched, R=64, "
          f"cutoff={g.cutoff})")
