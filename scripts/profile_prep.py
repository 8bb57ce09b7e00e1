#!/usr/bin/env python
"""Primitive-level A/B for the diagonal precompute's prep stage at
production shapes ([M~7000, R=512] on the 32^2 bench lattice): decides the
layout redesign of _parallel_weights (VERDICT r2 Next #2b).

Rows:
- row gather  bond_vars[b] -> [M, R, K]        (current prep)
- relayout    [M, R, K] -> [K, M, R]           (proposed K-major move)
- swapaxes    [M, R, K] -> [M, K, R]           (what parity_bits does today)
- elementwise chain in [M, R, K] vs [K, M, R]  (lane-utilization check)
- take0 per leg: bond_vars[:, k][b] via the digit-gather kernel
- row_select diag_w (current w_new) vs class-table where-chain (proposed)

Marginal methodology per CLAUDE.md. Usage: python scripts/profile_prep.py [L] [R]
"""
import os
import sys
import time

import jax

if os.environ.get("ISING_FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.ops.take_kernel import take0
from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, multi_sweep
from isingmontecarlo_tpu.sse.tables import row_select

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

model = g.model
ops = g.sse.ops
M, R = ops.bond.shape
K = ops.max_legs
NB = model.nbonds
print(f"M={M} R={R} K={K} NB={NB}", file=sys.stderr)

interp = jax.default_backend() != "tpu"


def marginal(name, body, n1=2, n2=8):
    def run(n):
        @jax.jit
        def f(c0):
            def it(c, i):
                return body(c, i), None
            c, _ = jax.lax.scan(it, c0, jnp.arange(n))
            return c
        c = f(jnp.float32(1.0))
        float(jnp.sum(c))  # force readback (CLAUDE.md tunnel note)
        t0 = time.perf_counter()
        for rep in range(3):
            c = f(jnp.float32(1.0 + rep))
            float(jnp.sum(c))
        return (time.perf_counter() - t0) / 3

    t1, t2 = run(n1), run(n2)
    ms = (t2 - t1) / (n2 - n1) * 1e3
    print(f"{name:48s} {ms:8.3f} ms")


b = jnp.maximum(ops.bond, 0)  # [M, R]
bv = model.bond_vars  # [NB, K]

marginal("row gather bond_vars[b] -> [M,R,K]",
         lambda c, i: c + jnp.sum((bv[(b + i) % NB]).astype(jnp.float32)))
mrk = bv[b].astype(jnp.int32)
marginal("relayout [M,R,K] -> [K,M,R]",
         lambda c, i: c + jnp.sum(
             jnp.moveaxis(mrk + i, -1, 0).astype(jnp.float32)))
marginal("swapaxes [M,R,K] -> [M,K,R]",
         lambda c, i: c + jnp.sum(
             (mrk + i).swapaxes(1, 2).astype(jnp.float32)))
marginal("gather+relayout fused (bv.T[:, b])",
         lambda c, i: c + jnp.sum((bv.T[:, (b + i) % NB]).astype(jnp.float32)))

chain_mrk = mrk
chain_kmr = jnp.moveaxis(mrk, -1, 0)


def chain(x, i):
    y = x + i
    for _ in range(10):
        y = (y ^ (y >> 3)) + 1
    return jnp.sum(y.astype(jnp.float32))


marginal("30-op elementwise chain [M,R,K]", lambda c, i: c + chain(chain_mrk, i))
marginal("30-op elementwise chain [K,M,R]", lambda c, i: c + chain(chain_kmr, i))

tab_r = jnp.broadcast_to((bv[:, 0] + 1)[:, None], (NB, R)).astype(jnp.int32)
marginal("take0 per leg (1 call, [NB,R] table)",
         lambda c, i: c + jnp.sum(
             take0(tab_r, ((b + i) % NB), interpret=interp)
             .astype(jnp.float32)))

si = jnp.sum(
    (ops.inputs.astype(jnp.int32))
    * (1 << jnp.arange(K, dtype=jnp.int32))[:, None, None],
    axis=0,
)  # [M, R]
marginal("row_select diag_w[b, si] (current)",
         lambda c, i: c + jnp.sum(row_select(model.diag_w, (b + i) % NB, si)))

# class-table path: w = sum_{c,s} (cls == c)(si == s) wtab[c, s]
import numpy as np

dw = np.asarray(model.diag_w)
uq = np.unique(dw, axis=0)
print(f"distinct diag_w rows: {uq.shape[0]}", file=sys.stderr)
cls_np = np.zeros(NB, np.int32)
for ci, row in enumerate(uq):
    cls_np[np.all(dw == row[None], axis=1)] = ci
wtab = jnp.asarray(uq, jnp.float32)  # [C, S]
C, S = wtab.shape
# Generic class fetch: take0 on the tiny class ids (values < 2^14).
cls_r = jnp.broadcast_to(jnp.asarray(cls_np)[:, None], (NB, R)).astype(
    jnp.int32
)


def w_from_cls(cl, si):
    w = jnp.zeros(cl.shape, jnp.float32)
    for ci in range(C):
        for s in range(S):
            w = jnp.where((cl == ci) & (si == s), wtab[ci, s], w)
    return w


def class_w(c, i):
    bb = (b + i) % NB
    cl = take0(cls_r, bb, interpret=interp)  # [M, R]
    return c + jnp.sum(w_from_cls(cl, si))


marginal(f"class-table w (take0 cls + {C * S} selects)", class_w)

# Contiguous-range class fetch (uniform-coupling TFIM layout: classes are
# [0, ne) two-site, [ne, ne+n) transverse, [ne+n, NB) longitudinal) — pure
# compares, no gather at all. Valid iff every class is one contiguous id
# range (relabel by first occurrence, then check monotone).
_, first_idx = np.unique(cls_np, return_index=True)
relabel = np.zeros(C, np.int32)
relabel[np.argsort(first_idx)] = np.arange(C)
cls_seq = relabel[cls_np]
if np.all(np.diff(cls_seq) >= 0):
    cls_np = cls_seq
    wtab = jnp.asarray(np.asarray(wtab)[np.argsort(relabel)], jnp.float32)
    bounds = np.searchsorted(cls_np, np.arange(1, C))  # class start ids

    def class_w_range(c, i):
        bb = (b + i) % NB
        cl = jnp.zeros(bb.shape, jnp.int32)
        for bd in bounds:
            cl = cl + (bb >= int(bd)).astype(jnp.int32)
        return c + jnp.sum(w_from_cls(cl, si))

    marginal(f"class-table w (range compares + {C * S} selects)",
             class_w_range)
else:
    print("  (classes not contiguous; range path n/a)", file=sys.stderr)
print("done")
