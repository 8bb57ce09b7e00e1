#!/usr/bin/env python
"""Component breakdown for the 32^2 SSE sweep on TPU (roadmap #1 baseline).

Times, with marginal-rate methodology (vary inputs, force readback):
  - diagonal_update
  - worldline_maps (the sort)
  - cluster_labels (the propagation loop)
  - cluster_update (labels + flips + state rebuild)
  - full sweep
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.sse import cluster as _cluster
from isingmontecarlo_tpu.sse import diagonal as _diag
from isingmontecarlo_tpu.sse import opstring as _ops
from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, multi_sweep, sweep

L = int(sys.argv[1]) if len(sys.argv) > 1 else 32
R = int(sys.argv[2]) if len(sys.argv) > 2 else 64

print(f"device: {jax.devices()[0]}", file=sys.stderr)
edges = lattice.frustrated_square(L, L)
g = QmcIsingGraph(edges, transverse=1.0, replicas=R, seed=1234)
beta = jnp.float32(1.0)
for i in range(4):
    g.sse, ns, _, _ = multi_sweep(g.sse, beta, g.model, 6)
    float(jnp.sum(ns))
    g._maybe_grow()
    print(f"equil {i}: cutoff={g.cutoff} n~{float(jnp.mean(ns[-1])):.0f}",
          file=sys.stderr)

sse = g.sse
model = g.model
ops0 = sse.ops
state0 = sse.state


def timed(name, fn, reps=3):
    # warm/compile
    fn(0)
    best = float("inf")
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        fn(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:<24} {best*1e3:9.1f} ms")
    return best


@jax.jit
def f_diag(ops, state, key):
    o = _diag.diagonal_update(ops, state, beta, key, model)
    return jnp.sum(o.bond)


@jax.jit
def f_maps(ops, x):
    wnext, wprev, leg_var, (order, svar, seg_start) = _ops.worldline_maps(
        ops._replace(bond=ops.bond + x - x), model)
    return jnp.sum(wnext) + jnp.sum(order)


@jax.jit
def f_labels(ops, x):
    o = ops._replace(bond=ops.bond + x - x)
    labels = _cluster.cluster_labels(o, model)
    return jnp.sum(labels)


@jax.jit
def f_cluster(ops, state, key):
    o, s = _cluster.cluster_update(ops, state, key, model)
    return jnp.sum(o.bond) + jnp.sum(s)


@jax.jit
def f_sweep(sse):
    new, _ = sweep(sse, beta, model)
    return jnp.sum(new.ops.bond) + jnp.sum(new.state)


timed("diagonal_update", lambda r: float(f_diag(ops0, state0, jax.random.key(r))))
timed("worldline_maps", lambda r: float(f_maps(ops0, jnp.int32(r))))
timed("maps+cluster_labels", lambda r: float(f_labels(ops0, jnp.int32(r))))
timed("cluster_update", lambda r: float(f_cluster(ops0, state0, jax.random.key(r))))
timed("full sweep", lambda r: float(f_sweep(sse._replace(key=jax.random.key(r)))))
print(f"cutoff={g.cutoff}")
