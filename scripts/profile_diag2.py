#!/usr/bin/env python
"""Fine-grained breakdown of the diagonal precompute (_parallel_weights)
on the 32^2 BENCH lattice — profile_diag showed the precompute is ~2/3 of
the 44 ms diagonal update at R=512, far above its streaming speed of light.
Rows: PRNG generation (threefry vs rbg), input prep, the parity kernel
alone, the packed-XLA parity path, and the weight-table row selects.
Marginal methodology per CLAUDE.md.

Usage: python scripts/profile_diag2.py [L] [R]
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
print(f"cutoff={g.cutoff}", file=sys.stderr)

sse, model = g.sse, g.model
ops0, state0 = sse.ops, sse.state
M, R = ops0.bond.shape
K = ops0.max_legs
N = model.nvars
NB = model.nbonds
W = -(-N // 16)


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


# --- PRNG cost ---------------------------------------------------------------
marginal("uniform [3,M,R] threefry", lambda c, i: c + jnp.sum(
    jax.random.uniform(jax.random.key(i), (3, M, R))
))
marginal("uniform [2,M,R] threefry", lambda c, i: c + jnp.sum(
    jax.random.uniform(jax.random.key(i), (2, M, R))
))
try:
    from jax.extend import random as jex_random

    rbg = jax.random.key(0, impl="rbg")

    marginal("uniform [3,M,R] rbg", lambda c, i: c + jnp.sum(
        jax.random.uniform(jax.random.fold_in(rbg, i), (3, M, R))
    ))
except Exception as e:  # pragma: no cover - informational
    print(f"rbg unavailable: {e}")

# --- input prep (everything before the parity kernel) ------------------------
rows = jnp.arange(R, dtype=jnp.int32)


def prep(c, i):
    ops = ops0._replace(bond=ops0.bond + (i >> 30))
    u1 = jax.random.uniform(jax.random.key(i), (M, R))
    b_new = jnp.minimum((u1 * NB).astype(jnp.int32), NB - 1)
    vars_all = model.bond_vars[jnp.maximum(ops.bond, 0)]
    leg_ok = (vars_all >= 0) & (ops.bond >= 0)[..., None]
    tog = jnp.moveaxis(ops.inputs != ops.outputs, 0, -1) & leg_ok
    v_idx = jnp.where(leg_ok, vars_all, N)
    vq = model.bond_vars[b_new]
    q_ok = vq >= 0
    vq_s = jnp.where(q_ok, vq, 0)
    return (
        c + jnp.sum(v_idx) + jnp.sum(tog) + jnp.sum(vq_s) + jnp.sum(q_ok)
        + jnp.sum(b_new)
    )


marginal("prep (gathers/transposes/b_new)", prep)


# --- parity kernel alone ([K, M, R] interface) -------------------------------
def mk_inputs(i):
    ops = ops0._replace(bond=ops0.bond + (i >> 30))
    on_tpu = jax.default_backend() == "tpu"
    u1 = jax.random.uniform(jax.random.key(i), (M, R))
    b_new = jnp.minimum((u1 * NB).astype(jnp.int32), NB - 1)
    sent = 16 * W
    b_safe = jnp.maximum(ops.bond, 0)
    bv_nn = jnp.where(model.bond_vars >= 0, model.bond_vars, sent)
    v_idx = jnp.stack(
        [_diag._bond_fetch(bv_nn[:, k], b_safe, on_tpu) for k in range(K)]
    )
    vq = jnp.stack(
        [_diag._bond_fetch(bv_nn[:, k], b_new, on_tpu) for k in range(K)]
    )
    tog = ops.inputs != ops.outputs
    st_pad = jnp.pad(
        state0.astype(jnp.int32), ((0, 0), (0, sent - N))
    ).reshape(R, W, 16)
    state_w = jnp.sum(
        st_pad << jnp.arange(16, dtype=jnp.int32)[None, None, :], axis=-1
    )
    return state_w, v_idx, tog, vq


def kern(c, i):
    from isingmontecarlo_tpu.ops.parity_kernel import parity_bits

    state_w, v_idx, tog, vq = mk_inputs(i)
    pb, sb = parity_bits(
        jnp.zeros((R, W), jnp.int32), state_w, v_idx, tog, vq,
        interpret=jax.default_backend() != "tpu",
    )
    return c + jnp.sum(pb) + jnp.sum(sb)


marginal("prep + parity kernel", kern)

# --- full precompute: kernel vs packed XLA ------------------------------------
def pw(c, i):
    u1 = jax.random.uniform(jax.random.key(i), (M, R))
    b_new, bits_new, w_new, _ = _diag._parallel_weights(
        ops0._replace(bond=ops0.bond + (i >> 30)), state0, u1, model,
        None, False,
    )
    return c + jnp.sum(b_new) + jnp.sum(w_new)


marginal("_parallel_weights (parity kernel)", pw)
_diag._FORCE_PARITY_KERNEL = False
jax.clear_caches()
marginal("_parallel_weights (packed XLA)", pw)
_diag._FORCE_PARITY_KERNEL = None
jax.clear_caches()

# --- weight-table row selects --------------------------------------------------
b0 = jnp.minimum(
    jax.random.randint(jax.random.key(9), (M, R), 0, NB), NB - 1
)
si0 = jax.random.randint(jax.random.key(10), (M, R), 0, 1 << K)
marginal("row_select diag_w [M,R]", lambda c, i: c + jnp.sum(
    row_select(model.diag_w, jnp.minimum(b0 ^ (i >> 30), NB - 1), si0)
))
_rows = jnp.arange(R, dtype=jnp.int32)
marginal("class-table w [M,R] (take0 cls + chain)", lambda c, i: c + jnp.sum(
    _diag._weight_lookup(
        model, jnp.minimum(b0 ^ (i >> 30), NB - 1), si0, None, _rows,
        jax.default_backend() == "tpu",
    )
))

# --- everything after the precompute (w_cur/si_cur + decisions) ---------------
marginal("diagonal_update total", lambda c, i: c + jnp.sum(
    _diag.diagonal_update(
        ops0._replace(bond=ops0.bond + (i >> 30)), state0, beta,
        jax.random.key(i), model,
    ).bond
))
print("done")
