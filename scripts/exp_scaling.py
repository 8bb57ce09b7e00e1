#!/usr/bin/env python
"""Replica-count scaling of the 32^2 SSE sweep (north star #2).

For each R: equilibrate, measure marginal batched-sweep time (two run
lengths, readback-forced) and energy-series ESS/sec. The MXU one-hot label
gathers scale sub-linearly in R, so larger R should raise ESS/s until some
piece saturates. Usage: python scripts/exp_scaling.py [L] [R1,R2,...]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.analysis import effective_sample_size
from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, multi_sweep

L = int(sys.argv[1]) if len(sys.argv) > 1 else 32
Rs = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else (64, 128, 256))]

print(f"device: {jax.devices()[0]}", file=sys.stderr)
edges = lattice.frustrated_square(L, L)
beta = jnp.float32(1.0)

for R in Rs:
    g = QmcIsingGraph(edges, transverse=1.0, replicas=R, seed=1234)
    stable = 0
    for _ in range(40):
        g.sse, ns, _, _ = multi_sweep(g.sse, beta, g.model, 2)
        float(jnp.sum(ns))
        before = g.cutoff
        g._maybe_grow()
        stable = stable + 1 if g.cutoff == before else 0
        if stable >= 2:
            break
    for _ in range(2):
        g.sse, ns, _, _ = multi_sweep(g.sse, beta, g.model, 6)
        float(jnp.sum(ns))
        g._maybe_grow()

    def run(n):
        t0 = time.perf_counter()
        g.sse, ns, _, _ = multi_sweep(g.sse, beta, g.model, n)
        float(jnp.sum(ns))
        return time.perf_counter() - t0, np.asarray(ns)

    run(2); run(8)  # compile both lengths
    t2, _ = run(2)
    series = []
    t8 = float("inf")
    for _ in range(3):
        t, ns = run(8)
        t8 = min(t8, t)
        series.append(ns)
    per_sweep = (t8 - t2) / 6
    ess = effective_sample_size(np.concatenate(series, axis=0))
    ess_rate = ess / (3 * 8 * per_sweep)  # ESS over the measured wall time
    print(
        f"L={L} R={R:<4} cutoff={g.cutoff} {per_sweep*1e3:8.1f} ms/batched-sweep "
        f"{R/per_sweep:10.0f} replica-sweeps/s  ESS/s~{ess_rate:8.0f}"
    )
