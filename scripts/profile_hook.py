#!/usr/bin/env python
"""Fine-grained breakdown of the cluster label fixpoint at the 32^2 shape:
the hook scatter, one full hook round, the whole fixpoint at several
``n_compress`` settings, and segment_graph. Decides whether the next kernel
targets the scatter or the loop structure.

Usage: python scripts/profile_hook.py [L] [R]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.sse import cluster as _cluster
from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, multi_sweep

L = int(sys.argv[1]) if len(sys.argv) > 1 else 32
R = int(sys.argv[2]) if len(sys.argv) > 2 else 64

print(f"device: {jax.devices()[0]}", file=sys.stderr)
edges = lattice.frustrated_square(L, L)
g = QmcIsingGraph(edges, transverse=1.0, replicas=R, seed=1234)
beta = jnp.float32(1.0)
for _ in range(4):
    g.sse, ns, _, _ = multi_sweep(g.sse, beta, g.model, 6)
    float(jnp.sum(ns))
    g._maybe_grow()
ops0, model = g.sse.ops, g.model
sg = jax.jit(_cluster.segment_graph)(ops0, model)
u, v, S = sg.u, sg.v, sg.S
E = u.shape[0]
print(f"cutoff={g.cutoff} S={S} E={E}", file=sys.stderr)
cols = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[None, :], (E, R))
P0 = jnp.tile(jnp.arange(S, dtype=jnp.int32)[:, None], (1, R))


def marginal(name, body, n1=2, n2=6):
    def mk(n):
        @jax.jit
        def run(r):
            def step(c, i):
                return body(c, i + r).astype(jnp.float32), None
            out, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(n))
            return out
        return lambda r: run(jnp.int32(r * 131))

    f1, f2 = mk(n1), mk(n2)
    float(f1(0)), float(f2(0))
    float(f1(1)), float(f2(1))

    def best(f):
        b = 1e9
        for r in range(2, 6):
            t0 = time.perf_counter()
            float(f(r))
            b = min(b, time.perf_counter() - t0)
        return b

    per = (best(f2) - best(f1)) / (n2 - n1)
    print(f"{name:<44} {per*1e3:9.3f} ms")
    return per


# The raw scatter-min alone (the hook write).
marginal(
    "scatter-min [E,R] -> [S,R]",
    lambda c, i: c + jnp.sum(P0.at[jnp.minimum(v + (i >> 30), S - 1), cols]
                             .min(jnp.minimum(u, v))),
)

# The double-sort rewrite of the same write (cluster._scatter_min_rows).
marginal(
    "sort-min [E,R] -> [S,R]",
    lambda c, i: c + jnp.sum(_cluster._scatter_min_rows(
        P0, jnp.minimum(v + (i >> 30), S - 1), jnp.minimum(u, v))),
)

# One full hook round: 2 gathers + minmax + scatter + 2 compress jumps.
def one_round(c, i):
    P = P0 + (i >> 30)
    pu = _cluster._take0_fast(P, u)
    pv = _cluster._take0_fast(P, v)
    m = jnp.minimum(pu, pv)
    mx = jnp.maximum(pu, pv)
    Pn = P.at[mx, cols].min(m)
    for _ in range(2):
        Pn = _cluster._take0_fast(Pn, Pn)
    return c + jnp.sum(Pn)


marginal("one hook round (gathers+scatter+2 jumps)", one_round)

# Whole fixpoint at different compress counts.
for nc in (1, 2, 4, 8):
    marginal(
        f"hook_compress fixpoint n_compress={nc}",
        lambda c, i, nc=nc: c + jnp.sum(_cluster._hook_compress_labels(
            jnp.minimum(u + (i >> 30), S - 1), v, S, n_compress=nc)),
    )

marginal(
    "segment_graph",
    lambda c, i: c + jnp.sum(_cluster.segment_graph(
        ops0._replace(bond=ops0.bond + (i >> 30)), model).u),
)
