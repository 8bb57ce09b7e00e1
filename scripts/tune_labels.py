#!/usr/bin/env python
"""Tune the segment-graph label relaxation (n_relax, n_jump) on TPU.

Equilibrates an L^2 TFIM op string, then for each knob combination times the
full label computation (segment_graph + relaxation) and reports the while
iteration count.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.sse import cluster as _cluster
from isingmontecarlo_tpu.sse import opstring as _ops
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

ops0 = g.sse.ops
model = g.model


def relax_counted(u, v, S, n_relax, n_jump):
    E, Rr = u.shape
    cols = jnp.broadcast_to(jnp.arange(Rr, dtype=jnp.int32)[None, :], (E, Rr))
    W0 = jnp.tile(jnp.arange(S, dtype=jnp.int32)[:, None], (1, Rr))

    def body(state):
        W, _, it = state
        Wn = W
        for _ in range(n_relax):
            a = _cluster._take0_fast(Wn, u)
            bb = _cluster._take0_fast(Wn, v)
            m = jnp.minimum(a, bb)
            Wn = Wn.at[u, cols].min(m).at[v, cols].min(m)
        for _ in range(n_jump):
            Wn = jnp.minimum(Wn, _cluster._take0_fast(Wn, Wn))
        return Wn, jnp.any(Wn != W), it + 1

    W, _, it = jax.lax.while_loop(
        lambda s: s[1], body, (W0, jnp.asarray(True), jnp.int32(0))
    )
    return W, it


def hook_compress_counted(u, v, S, n_compress):
    """Hook-and-compress CC: hook min(P[u],P[v]) onto the larger endpoint
    *label* row, then pointer-jump n_compress times. Converges in ~log
    rounds (parent chains halve each jump)."""
    E, Rr = u.shape
    cols = jnp.broadcast_to(jnp.arange(Rr, dtype=jnp.int32)[None, :], (E, Rr))
    P0 = jnp.tile(jnp.arange(S, dtype=jnp.int32)[:, None], (1, Rr))

    def body(state):
        P, _, it = state
        pu = _cluster._take0_fast(P, u)
        pv = _cluster._take0_fast(P, v)
        m = jnp.minimum(pu, pv)
        mx = jnp.maximum(pu, pv)
        Pn = P.at[mx, cols].min(m)
        for _ in range(n_compress):
            Pn = _cluster._take0_fast(Pn, Pn)
        return Pn, jnp.any(Pn != P), it + 1

    P, _, it = jax.lax.while_loop(
        lambda s: s[1], body, (P0, jnp.asarray(True), jnp.int32(0))
    )
    return P, it


@functools.partial(jax.jit, static_argnames=("n_relax", "n_jump", "mode"))
def run(ops, x, n_relax, n_jump, mode="relax"):
    o = ops._replace(bond=ops.bond + x - x)
    sg = _cluster.segment_graph(o, model)
    seg_in, u, v, S = sg.seg_in, sg.u, sg.v, sg.S
    if mode == "relax":
        W, it = relax_counted(u, v, S, n_relax, n_jump)
    else:
        W, it = hook_compress_counted(u, v, S, n_jump)
    return jnp.sum(W) + jnp.sum(seg_in), it


def measure(label, *a, **kw):
    s, it = run(ops0, jnp.int32(0), *a, **kw)
    float(s)  # compile+complete
    best = float("inf")
    for r in range(1, 4):
        t0 = time.perf_counter()
        s, it = run(ops0, jnp.int32(r), *a, **kw)
        float(s)
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:8.1f} ms  iters={int(it)}")


@jax.jit
def labels_both(ops):
    sg = _cluster.segment_graph(ops, model)
    u, v, S = sg.u, sg.v, sg.S
    Wr, _ = relax_counted(u, v, S, 1, 0)
    Ph, _ = hook_compress_counted(u, v, S, 2)
    return Wr, Ph


import numpy as np  # noqa: E402

Wr, Ph = jax.device_get(labels_both(ops0))
for r in range(Wr.shape[1]):
    a, b = Wr[:, r], Ph[:, r]
    f = {}
    g2 = {}
    for x, y in zip(a, b):
        assert f.setdefault(x, y) == y, f"partition mismatch r={r}"
        assert g2.setdefault(y, x) == x, f"partition mismatch r={r}"
print("hook/relax partitions identical")

for n_compress in (1, 2, 3, 4):
    measure(f"hook compress={n_compress}", 0, n_compress, mode="hook")
for n_relax, n_jump in [(2, 1), (3, 1)]:
    measure(f"relax={n_relax} jump={n_jump}", n_relax, n_jump)
