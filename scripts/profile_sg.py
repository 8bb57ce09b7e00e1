#!/usr/bin/env python
"""Stage-by-stage breakdown of segment_graph at production shape (32^2
BENCH lattice, R=512): after the lane-major fetches the build still costs
~26 ms — this locates it (fetches / leg sort / cumsum / back sort / wrap
placement). Marginal methodology per CLAUDE.md.

Usage: python scripts/profile_sg.py [L] [R]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.sse import cluster as _cluster
from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, multi_sweep
from isingmontecarlo_tpu.sse.opstring import op_vars
from isingmontecarlo_tpu.sse.tables import bond_fetch

L = int(sys.argv[1]) if len(sys.argv) > 1 else 32
R = int(sys.argv[2]) if len(sys.argv) > 2 else 512

print(f"device: {jax.devices()[0]}", file=sys.stderr)
edges = lattice.bench_two_d_periodic(L)
g = QmcIsingGraph(edges, transverse=1.0, replicas=R, seed=7)
beta = jnp.float32(1.0)
stable = 0
for i in range(40):
    g.sse, ns, _, _ = multi_sweep(g.sse, beta, g.model, 2)
    float(jnp.sum(ns))
    before = g.cutoff
    g._maybe_grow()
    stable = stable + 1 if g.cutoff == before else 0
    if stable >= 2:
        break
print(f"cutoff={g.cutoff} caps={g._cluster_caps}", file=sys.stderr)
ops0, model = g.sse.ops, g.model
M, R = ops0.bond.shape
K = ops0.max_legs
KM = K * M
N = model.nvars
S = M + N + 1


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
    print(f"{name:<46} {per*1e3:9.3f} ms", flush=True)
    return per


def stages(i, upto):
    ops = ops0._replace(bond=ops0.bond + (i >> 30))
    valid_op = ops.bond >= 0
    b = jnp.maximum(ops.bond, 0)
    vars_kmr = op_vars(ops, model)
    edge_t = (model.is_constant & (model.arity() == 1)).astype(jnp.int32)
    is_edge = (bond_fetch(edge_t, b) == 1) & valid_op
    acc = jnp.sum(vars_kmr) + jnp.sum(is_edge)
    if upto == "fetch":
        return acc
    leg_var = vars_kmr.reshape(KM, R)
    p_of_f = jnp.arange(KM, dtype=jnp.int32) % M
    key = jnp.where(leg_var >= 0, leg_var * M + p_of_f[:, None],
                    _cluster._SORT_BIG)
    iota_f = jnp.broadcast_to(
        jnp.arange(KM, dtype=jnp.int32)[:, None], (KM, R)
    )
    edge_leg = jnp.broadcast_to(is_edge[None], (K, M, R)).reshape(KM, R)
    skey, order, edge_s = jax.lax.sort(
        (key, iota_f, edge_leg.astype(jnp.int32)), dimension=0, num_keys=1
    )
    acc = acc + jnp.sum(skey) + jnp.sum(order) + jnp.sum(edge_s)
    if upto == "sort":
        return acc
    valid_j = skey < _cluster._SORT_BIG
    svar = jnp.where(valid_j, skey // M, -1)
    seg_start = jnp.concatenate(
        [jnp.ones((1, R), bool), svar[1:] != svar[:-1]], axis=0
    )
    edge_jj = (edge_s == 1) & valid_j
    break_in = seg_start & valid_j
    edge_i = edge_jj.astype(jnp.int32)
    c = jnp.cumsum(break_in.astype(jnp.int32) + edge_i, axis=0)
    seg_in_j = jnp.where(valid_j, c - edge_i - 1, S - 1)
    seg_out_j = jnp.where(valid_j, c - 1, S - 1)
    acc = acc + jnp.sum(seg_in_j) + jnp.sum(seg_out_j)
    if upto == "cumsum":
        return acc
    _, seg_in_f, seg_out_f = jax.lax.sort(
        (order, seg_in_j, seg_out_j), dimension=0, num_keys=1
    )
    return acc + jnp.sum(seg_in_f) + jnp.sum(seg_out_f)


for st in ("fetch", "sort", "cumsum", "back"):
    marginal(f"stages through {st}", lambda c, i, st=st: c + stages(i, st))

marginal("segment_graph total", lambda c, i: c + jnp.sum(
    _cluster.segment_graph(ops0._replace(bond=ops0.bond + (i >> 30)),
                           model).u
))
print("done")
