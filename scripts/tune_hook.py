#!/usr/bin/env python
"""Tune the hook-and-compress label fixpoint at production shape: scan the
pointer-jump count (``cluster._N_COMPRESS``) through the real capped
``cluster_labels`` path (sort-scatter hook writes, take0 gathers) on the
32^2 BENCH lattice. The fixpoint was 66.6 ms of the ~130 ms cluster update
at R=512 (profile_cluster, 2026-08-21). Marginal methodology per CLAUDE.md.

Usage: python scripts/tune_hook.py [L] [R]
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
R = int(sys.argv[2]) if len(sys.argv) > 2 else 512

print(f"device: {jax.devices()[0]}", file=sys.stderr)
edges = lattice.bench_two_d_periodic(L)
# Steady-state pin (see scripts/ess32.py): avoid cold growth-shape compiles.
import json

try:
    with open("/root/repo/.ess32_pins.json") as _f:
        _pin = json.load(_f).get(f"{L},{R}")
except (OSError, ValueError):
    _pin = None
g = QmcIsingGraph(
    edges, transverse=1.0, replicas=R, seed=7,
    cutoff=_pin[0] if _pin else None,
)
if _pin:
    g._cluster_caps = (_pin[1], _pin[2])
beta = jnp.float32(1.0)
stable = 0
for i in range(60 if _pin else 40):
    g.sse, ns, _, _ = multi_sweep(g.sse, beta, g.model, 2)
    float(jnp.sum(ns))
    before = g.cutoff
    g._maybe_grow()
    if _pin:
        continue
    stable = stable + 1 if g.cutoff == before else 0
    if stable >= 2:
        break
if _pin:
    g._cluster_caps = tuple(_pin[1:])
lc, ec = g._cluster_caps
print(f"cutoff={g.cutoff} caps={g._cluster_caps}", file=sys.stderr)
ops0, model = g.sse.ops, g.model


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
    print(f"{name:<44} {per*1e3:9.3f} ms", flush=True)
    return per


def labels_body(c, i):
    ops = ops0._replace(bond=ops0.bond + (i >> 30))
    lab = _cluster.cluster_labels(ops, model, label_cap=lc, edge_cap=ec)
    return c + jnp.sum(lab)


for nc in (1, 2, 3, 4):
    _cluster._N_COMPRESS = nc
    jax.clear_caches()
    marginal(f"cluster_labels n_compress={nc}", labels_body)
_cluster._N_COMPRESS = 2
print("done")
