#!/usr/bin/env python
"""Tempering overhead check (VERDICT round-1 item #3): the fused
run/swap/sample chunk (`tempering_sweep_chunk`) must be within ~20% of the
bare `multi_sweep` at the same replica count — i.e. the device-side label
swap adds negligible cost and there is no per-sweep host dispatch.

Times one jitted chunk of NS sweeps both ways at two lengths (marginal
methodology, CLAUDE.md). Usage: python scripts/profile_tempering.py [L] [R]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.parallel.tempering import (
    TemperingContainer, tempering_sweep_chunk,
)
from isingmontecarlo_tpu.sse.ising import multi_sweep

L = int(sys.argv[1]) if len(sys.argv) > 1 else 16
R = int(sys.argv[2]) if len(sys.argv) > 2 else 64

print(f"device: {jax.devices()[0]}", file=sys.stderr)
edges = lattice.bench_two_d_periodic(L)
betas = np.linspace(0.5, 1.5, R)
tc = TemperingContainer(edges, transverse=1.0, betas=betas, seed=3)
tc.timesteps(30)  # growth phase
g = tc.graph
print(f"cutoff={g.cutoff}", file=sys.stderr)


def time_fn(fn, n1=4, n2=12):
    fns = {}
    for n in (n1, n2):
        fns[n] = fn(n)
        fns[n](0)
        float(jnp.sum(fns[n](1)))

    def best(n):
        b = 1e9
        for r in range(2, 6):
            t0 = time.perf_counter()
            float(jnp.sum(fns[n](r)))
            b = min(b, time.perf_counter() - t0)
        return b

    return (best(n2) - best(n1)) / (n2 - n1)


def bare(n):
    @jax.jit
    def run(r):
        sse, ns, _, _ = multi_sweep(
            g.sse._replace(key=jax.random.key(r)), tc.betas, g.model, n,
            cluster_caps=g._cluster_caps,
        )
        return ns.astype(jnp.float32).sum() + jnp.sum(sse.state)
    return lambda r: run(jnp.int32(r))


def fused(n):
    do_swap = jnp.ones((n,), bool)

    @jax.jit
    def run(r):
        sse, betas, scales, hb, parity, nswaps, ns, _, _ = (
            tempering_sweep_chunk(
                g.sse._replace(key=jax.random.key(r)), tc.betas, tc.scales,
                jnp.int32(0), do_swap, g.model, n,
                cluster_caps=g._cluster_caps,
            )
        )
        return (ns.astype(jnp.float32).sum() + jnp.sum(sse.state)
                + jnp.sum(betas) + nswaps)
    return lambda r: run(jnp.int32(r))


t_bare = time_fn(bare)
t_fused = time_fn(fused)
print(f"bare multi_sweep          {t_bare*1e3:9.2f} ms/sweep")
print(f"fused sweep+swap chunk    {t_fused*1e3:9.2f} ms/sweep")
print(f"overhead                  {100*(t_fused/t_bare-1):9.1f} %")
