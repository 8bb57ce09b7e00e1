#!/usr/bin/env python
"""Component breakdown of the RVB timestep at true (grown) cutoffs.

Marginal methodology: each component is iterated inside ONE jitted
lax.scan, timed at two loop lengths, and the difference quotient removes the
~28 ms tunnel dispatch latency. Usage: python scripts/profile_rvb.py [L] [beta] [R]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.sse import rvb as _rvb
from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, multi_sweep

L = int(sys.argv[1]) if len(sys.argv) > 1 else 4
beta = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
R = int(sys.argv[3]) if len(sys.argv) > 3 else 64
n = L * L
U = (n + 1) // 2

print(f"device: {jax.devices()[0]}", file=sys.stderr)
edges = lattice.frustrated_square(L, L)
g = QmcIsingGraph(edges, transverse=1.0, replicas=R, seed=1234)
g.set_run_rvb(True, updates_per_timestep=U)
kw = dict(**g._rvb_args())
b = jnp.float32(beta)
stable = 0
for _ in range(40):
    g.sse, ns, _, _ = multi_sweep(g.sse, b, g.model, 2, **kw)
    float(jnp.sum(ns))
    before = g.cutoff
    g._maybe_grow()
    stable = stable + 1 if g.cutoff == before else 0
    if stable >= 2:
        break
for _ in range(2):
    g.sse, ns, _, _ = multi_sweep(g.sse, b, g.model, 4, **kw)
    float(jnp.sum(ns))
    g._maybe_grow()
print(f"L={L} beta={beta} R={R} cutoff={g.cutoff} "
      f"n~{float(jnp.mean(ns[-1])):.0f}", file=sys.stderr)

sse, model, tables = g.sse, g.model, g._rvb_tables
ops0, state0 = sse.ops, sse.state
M = ops0.cutoff


def marginal(name, mk_loop, n1=2, n2=8, per_iters=1):
    """mk_loop(n) -> jitted fn(r) running the component n times."""
    f1, f2 = mk_loop(n1), mk_loop(n2)
    f1(0), f2(0)  # compile
    float(f1(1)), float(f2(1))

    def best(f):
        b = 1e9
        for r in range(2, 6):
            t0 = time.perf_counter()
            float(f(r))
            b = min(b, time.perf_counter() - t0)
        return b

    per = (best(f2) - best(f1)) / (n2 - n1) / per_iters
    print(f"{name:<34} {per*1e3:9.2f} ms")
    return per


def scan_loop(body):
    def mk(n):
        @jax.jit
        def run(r):
            def step(c, i):
                return body(c, i + r).astype(jnp.float32), None
            out, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(n))
            return out
        return lambda r: run(jnp.int32(r * 131))
    return mk


inv = _rvb._const_inventory(ops0, model)
cvar, cpos, cnext, valid, ncount, has_const = jax.tree.map(
    jax.block_until_ready, inv
)

marginal("const_inventory", scan_loop(
    lambda c, i: c + jnp.sum(_rvb._const_inventory(
        ops0._replace(bond=ops0.bond + (i >> 30)), model)[0])
))

marginal(f"builds x{U} (vmapped)", scan_loop(
    lambda c, i: c + jnp.sum(jax.vmap(
        lambda kk: _rvb._build_cluster(
            kk, ops0, model, tables, cvar, cpos, cnext, valid, ncount,
            has_const)
    )(jax.random.split(jax.random.key(i), U)))
))

popped1 = jax.vmap(
    lambda kk: _rvb._build_cluster(
        kk, ops0, model, tables, cvar, cpos, cnext, valid, ncount, has_const)
)(jax.random.split(jax.random.key(7), U))

marginal(f"cluster_masks x{U}", scan_loop(
    lambda c, i: c + jnp.sum(jax.vmap(
        lambda p: _rvb._cluster_masks(
            p, ops0, model, cvar, cpos, cnext, valid)[1]
    )(popped1 ^ (i < 0)))
))

in01, tog1 = jax.vmap(
    lambda p: _rvb._cluster_masks(p, ops0, model, cvar, cpos, cnext, valid)
)(popped1)

marginal("fused_vectorized x1", scan_loop(
    lambda c, i: c + jnp.sum(_rvb._fused_vectorized(
        ops0, state0 ^ (i < 0), model, tables, in01[0], tog1[0],
        jax.random.key(i))[0])
))

marginal(f"rvb_sweep (U={U})", scan_loop(
    lambda c, i: c + jnp.sum(_rvb.rvb_sweep(
        ops0, state0 ^ (i < 0), jax.random.key(i), model, tables, U)[2])
))
