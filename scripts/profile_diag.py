#!/usr/bin/env python
"""A/B the diagonal-update carry paths on the 32^2 BENCH lattice.

At high ``cluster_every`` the diagonal update is the per-timestep floor of
the ESS north star. Its one sequential dependence (the op count ``n``) has
three implementations (sse/diagonal.py): the block-speculative XLA scan
(default; pass-1 work is M*R*_SPEC_WINDOW elementwise ops — 128x the
sequential work, cheap at R=64 but suspect at R=512), the Pallas VMEM-carry
kernel (ops/diag_carry.py, gated off after losing at R=64), and the plain
sequential scan. This measures all of them, plus the precompute
(_parallel_weights) alone, at production shapes so the gate can be decided
per the measured optimum. Marginal methodology per CLAUDE.md.

Usage: python scripts/profile_diag.py [L] [R]
"""
import os
import sys
import time

import jax

if os.environ.get("ISING_FORCE_CPU") == "1":
    # CPU smoke drives: JAX_PLATFORMS is ignored in this image (CLAUDE.md).
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.sse import diagonal as _diag
from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, multi_sweep

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
print(f"cutoff={g.cutoff}", file=sys.stderr)

sse, model = g.sse, g.model
ops0, state0 = sse.ops, sse.state


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


def diag_body(c, i):
    out = _diag.diagonal_update(
        ops0._replace(bond=ops0.bond + (i >> 30)), state0, beta,
        jax.random.key(i), model,
    )
    return c + jnp.sum(out.bond)


def pw_body(c, i):
    u1 = jax.random.uniform(jax.random.key(i), ops0.bond.shape)
    b_new, bits_new, w_new, _ = _diag._parallel_weights(
        ops0._replace(bond=ops0.bond + (i >> 30)), state0, u1, model,
        None, False,
    )
    return c + jnp.sum(b_new) + jnp.sum(w_new)


# --- spec window 128 (forced: the auto gate picks the carry kernel at
# R >= 256 since 2026-08-21) --------------------------------------------------
_diag._FORCE_CARRY_KERNEL = False
jax.clear_caches()
marginal("diag spec W=128", diag_body)
marginal("  _parallel_weights alone", pw_body)

# --- Pallas carry kernel ------------------------------------------------------
_diag._FORCE_CARRY_KERNEL = True
jax.clear_caches()
marginal("diag carry kernel", diag_body)
_diag._FORCE_CARRY_KERNEL = None

# --- narrower spec windows ----------------------------------------------------
for w in (64, 32):
    _diag._SPEC_WINDOW = w
    jax.clear_caches()
    marginal(f"diag spec W={w}", diag_body)
_diag._SPEC_WINDOW = 128

# --- plain sequential scan ----------------------------------------------------
_diag._SPEC_MIN_M = 1 << 30
jax.clear_caches()
marginal("diag sequential scan", diag_body)
_diag._SPEC_MIN_M = 2048
_diag._FORCE_CARRY_KERNEL = None
print("done")
