#!/usr/bin/env python
"""Component breakdown for the 32^2 SSE sweep on TPU (roadmap #1 baseline).

Marginal methodology (see CLAUDE.md): each component is iterated inside ONE
jitted lax.scan whose body depends on the loop index (so XLA cannot hoist
it), timed at two loop lengths, and the difference quotient removes the
~28 ms per-dispatch tunnel latency that would otherwise inflate every
single-call number. Usage: python scripts/profile_32.py [L] [R]
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
caps = g._cluster_caps  # host-tracked static label/edge caps (production path)
lc, ec = caps or (None, None)
print(f"cluster caps: {caps}", file=sys.stderr)


def marginal(name, body, n1=2, n2=6):
    """body(c: f32, i: i32) -> f32 runs the component once."""

    def mk(n):
        @jax.jit
        def run(r):
            def step(c, i):
                return body(c, i + r).astype(jnp.float32), None
            out, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(n))
            return out
        return lambda r: run(jnp.int32(r * 131))

    f1, f2 = mk(n1), mk(n2)
    f1(0), f2(0)  # compile
    float(f1(1)), float(f2(1))

    def best(f):
        b = 1e9
        for r in range(2, 6):
            t0 = time.perf_counter()
            float(f(r))
            b = min(b, time.perf_counter() - t0)
        return b

    per = (best(f2) - best(f1)) / (n2 - n1)
    print(f"{name:<24} {per*1e3:9.1f} ms")
    return per


marginal("diagonal_update", lambda c, i: c + jnp.sum(_diag.diagonal_update(
    ops0, state0, beta, jax.random.key(i), model).bond))


def _maps_body(c, i):
    wnext, wprev, leg_var, (order, svar, seg_start) = _ops.worldline_maps(
        ops0._replace(bond=ops0.bond + (i >> 30)), model)
    return c + jnp.sum(wnext) + jnp.sum(order)


marginal("worldline_maps", _maps_body)

marginal("maps+cluster_labels", lambda c, i: c + jnp.sum(
    _cluster.cluster_labels(
        ops0._replace(bond=ops0.bond + (i >> 30)), model,
        label_cap=lc, edge_cap=ec,
    )))


def _cl_body(c, i):
    o, s = _cluster.cluster_update(
        ops0, state0, jax.random.key(i), model,
        label_cap=lc, edge_cap=ec,
    )
    return c + jnp.sum(o.bond) + jnp.sum(s)


marginal("cluster_update", _cl_body)


def _sweep_body(c, i):
    new, _ = sweep(
        sse._replace(key=jax.random.key(i)), beta, model, cluster_caps=caps
    )
    return c + jnp.sum(new.ops.bond) + jnp.sum(new.state)


marginal("full sweep", _sweep_body)
print(f"cutoff={g.cutoff}")
