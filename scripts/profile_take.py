#!/usr/bin/env python
"""Micro-bench: per-replica gather paths at the 32^2 label shapes.

Compares the native gather, the MXU one-hot einsum (``_mm_take0``), and the
Pallas two-stage digit kernel (``ops/take_kernel.py``) with the marginal
methodology (scan of the component at two lengths, index-dependent body).
Then times ``cluster_labels`` with the kernel forced on vs off.

Usage: python scripts/profile_take.py [L] [R]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.ops.take_kernel import take0
from isingmontecarlo_tpu.sse import cluster as _cluster
from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, multi_sweep

L = int(sys.argv[1]) if len(sys.argv) > 1 else 32
R = int(sys.argv[2]) if len(sys.argv) > 2 else 64

print(f"device: {jax.devices()[0]}", file=sys.stderr)


_QUICK = os.environ.get("ISING_PROFILE_QUICK", "") == "1"


def marginal(name, body, n1=4, n2=16):
    if _QUICK:
        n1, n2 = 1, 2
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
    print(f"{name:<40} {per*1e3:9.3f} ms")
    return per


for C, E, tag in ((3328, 4352, "hook"), (5152, 5152, "apply")):
    key = jax.random.key(0)
    tbl = jax.random.randint(key, (C, R), 0, C, dtype=jnp.int32)
    idx = jax.random.randint(jax.random.key(1), (E, R), 0, C, jnp.int32)

    def nat(c, i, tbl=tbl, idx=idx):
        t = tbl + (i >> 30)
        return c + jnp.sum(jnp.take_along_axis(t, idx, axis=0))

    def mm(c, i, tbl=tbl, idx=idx):
        return c + jnp.sum(_cluster._mm_take0(tbl + (i >> 30), idx))

    def pk(c, i, tbl=tbl, idx=idx):
        return c + jnp.sum(take0(
            tbl + (i >> 30), idx,
            interpret=jax.default_backend() != "tpu",
        ))

    marginal(f"{tag} [{C},{R}]<-[{E},{R}] native", nat)
    marginal(f"{tag} [{C},{R}]<-[{E},{R}] mm_take0", mm)
    marginal(f"{tag} [{C},{R}]<-[{E},{R}] pallas", pk)

# End-to-end: cluster_labels with the kernel on vs off.
edges = lattice.frustrated_square(L, L)
g = QmcIsingGraph(edges, transverse=1.0, replicas=R, seed=1234)
beta = jnp.float32(1.0)
for _ in range(4):
    g.sse, ns, _, _ = multi_sweep(g.sse, beta, g.model, 6)
    float(jnp.sum(ns))
    g._maybe_grow()
ops0, model = g.sse.ops, g.model
print(f"cutoff={g.cutoff}", file=sys.stderr)

marginal(
    "segment_graph (sorts+cumsum+wrap)",
    lambda c, i: c + jnp.sum(_cluster.segment_graph(
        ops0._replace(bond=ops0.bond + (i >> 30)), model).u),
    n1=2, n2=6,
)

for force in (False, True):
    _cluster._FORCE_TAKE_KERNEL = force
    _cluster.cluster_update.clear_cache()
    marginal(
        f"cluster_labels kernel={force}",
        lambda c, i: c + jnp.sum(_cluster.cluster_labels(
            ops0._replace(bond=ops0.bond + (i >> 30)), model)),
        n1=2, n2=6,
    )

    def _cl(c, i):
        o, s = _cluster.cluster_update(ops0, state := g.sse.state,
                                       jax.random.key(i), model)
        return c + jnp.sum(o.bond) + jnp.sum(s)

    marginal(f"cluster_update kernel={force}", _cl, n1=2, n2=6)
