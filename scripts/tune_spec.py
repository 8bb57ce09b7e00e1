#!/usr/bin/env python
"""Tune the block-speculative diagonal carry (_SPEC_WINDOW, _SPEC_BLOCK).

Pass-1 work is M * W * R lanes regardless of block size; the window W=512 is
generous (n fluctuates ~sqrt(n) within a sweep). Measures diagonal_update
time and the fallback (bad-flag) frequency for candidate (W, C) pairs.
Usage: python scripts/tune_spec.py [L] [R]
"""
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
for _ in range(4):
    g.sse, ns, _, _ = multi_sweep(g.sse, beta, g.model, 6)
    float(jnp.sum(ns))
    g._maybe_grow()
print(f"cutoff={g.cutoff} n~{float(jnp.mean(ns[-1])):.0f}", file=sys.stderr)

ops0, state0, model = g.sse.ops, g.sse.state, g.model

for W, C in ((512, 128), (256, 128), (128, 128), (128, 64), (256, 64),
             (128, 256), (64, 128)):
    _diag._SPEC_WINDOW = W
    _diag._SPEC_BLOCK = C
    # fresh jit per (W, C): the module jit caches the old constants
    jf = jax.jit(_diag._diagonal_update_fast.__wrapped__)

    def f(r, jf=jf):
        o = jf(ops0, state0, beta, jax.random.key(r), model)
        return float(jnp.sum(o.bond))

    f(0)
    best = float("inf")
    for r in range(1, 5):
        t0 = time.perf_counter()
        f(r)
        best = min(best, time.perf_counter() - t0)
    # fallback frequency over 32 keys
    n0 = jnp.sum(ops0.bond >= 0, axis=0).astype(jnp.int32)
    print(f"W={W:<4} C={C:<4} {best*1e3:8.1f} ms")
