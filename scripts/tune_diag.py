#!/usr/bin/env python
"""Tune the diagonal-update scan unroll factor on TPU."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.sse import diagonal as _diag
from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, multi_sweep

L = int(sys.argv[1]) if len(sys.argv) > 1 else 32
R = int(sys.argv[2]) if len(sys.argv) > 2 else 64

edges = lattice.frustrated_square(L, L)
g = QmcIsingGraph(edges, transverse=1.0, replicas=R, seed=1234)
beta = jnp.float32(1.0)
for i in range(4):
    g.sse, ns, _, _ = multi_sweep(g.sse, beta, g.model, 6)
    float(jnp.sum(ns))
    g._maybe_grow()
print(f"cutoff={g.cutoff}", file=sys.stderr)

ops0, state0, model = g.sse.ops, g.sse.state, g.model

for unroll in (1, 2, 4, 8, 16, 32):
    def f(r, u=unroll):
        o = _diag.diagonal_update(
            ops0, state0, beta, jax.random.key(r), model, unroll=u
        )
        return float(jnp.sum(o.bond))

    f(0)
    best = float("inf")
    for r in range(1, 4):
        t0 = time.perf_counter()
        f(r)
        best = min(best, time.perf_counter() - t0)
    print(f"unroll={unroll:<3} {best*1e3:8.1f} ms")
