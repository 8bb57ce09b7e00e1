#!/usr/bin/env python
"""TPU validation + A/B timing for the in-VMEM bitonic sort kernel
(ops/sort_kernel.py): Mosaic-compiles it at the production shapes, checks
bit-exactness vs lax.sort, then times bare sorts and the full cluster path
kernel-on vs kernel-off. Usage: python scripts/profile_sortk.py [L] [R]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.ops import sort_kernel as sk
from isingmontecarlo_tpu.sse import cluster as _cluster
from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, multi_sweep

L = int(sys.argv[1]) if len(sys.argv) > 1 else 32
R = int(sys.argv[2]) if len(sys.argv) > 2 else 256

print(f"device: {jax.devices()[0]}", file=sys.stderr)
_INTERP = jax.default_backend() != "tpu"  # CPU smoke runs in interpret mode
_SHAPES = (
    [(300, 1), (600, 2)] if _INTERP
    else [(6000, 1), (8192, 2), (13760, 2), (16384, 3)]
)

# --- 1) bit-exactness on hardware at production-like shapes -----------------
for rows, nops in _SHAPES:
    k = jax.random.key(rows)
    perm = jax.random.permutation(k, jnp.arange(rows, dtype=jnp.int32))
    key = jnp.stack([jnp.roll(perm, r * 7) for r in range(128)], axis=1)
    pays = [
        jax.random.randint(jax.random.fold_in(k, i), (rows, 128), 0, 1 << 20)
        for i in range(nops - 1)
    ]
    got = jax.jit(lambda *a: sk.sort_rows(*a, interpret=_INTERP))(key, *pays)
    want = jax.lax.sort((key, *pays), dimension=0, num_keys=1)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    print(f"exact rows={rows} nops={nops} ok", flush=True)


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


# --- 2) bare sort A/B at the hot shapes --------------------------------------
for rows, nops in ([(512, 1)] if _INTERP else [(8192, 1), (13760, 2), (16384, 2)]):
    key0 = jax.random.randint(jax.random.key(1), (rows, R), 0, 1 << 24)

    def xla_body(c, i, key0=key0, nops=nops):
        ops = (key0 ^ i,) + tuple(key0 + j for j in range(nops - 1))
        out = jax.lax.sort(ops, dimension=0, num_keys=1)
        return c + jnp.float32(jnp.sum(out[0][0]))

    def k_body(c, i, key0=key0, nops=nops):
        ops = (key0 ^ i,) + tuple(key0 + j for j in range(nops - 1))
        out = sk.sort_rows(*ops, interpret=_INTERP)
        return c + jnp.float32(jnp.sum(out[0][0]))

    marginal(f"lax.sort  [{rows},{R}] x{nops}", xla_body)
    marginal(f"sort_rows [{rows},{R}] x{nops}", k_body)

# --- 3) cluster path A/B ------------------------------------------------------
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
print(f"cutoff={g.cutoff} caps={g._cluster_caps}", file=sys.stderr)
ops0, state0, model = g.sse.ops, g.sse.state, g.model
lc, ec = g._cluster_caps

lab_off = lab_on = None
for force in (False, True):
    _cluster._FORCE_SORT_KERNEL = force
    _cluster.cluster_update.clear_cache()
    tag = "kernel-on " if force else "kernel-off"
    lab = np.asarray(
        _cluster.cluster_labels(ops0, model, label_cap=lc, edge_cap=ec)
    )
    if force:
        lab_on = lab
    else:
        lab_off = lab
    marginal(f"segment_graph      ({tag})", lambda c, i: c + jnp.sum(
        _cluster.segment_graph(ops0._replace(bond=ops0.bond + (i >> 30)),
                               model).u))
    marginal(f"cluster_update     ({tag})", lambda c, i: c + jnp.sum(
        _cluster.cluster_update(
            ops0._replace(bond=ops0.bond + (i >> 30)), state0,
            jax.random.key(i), model, label_cap=lc, edge_cap=ec,
        )[1]))
np.testing.assert_array_equal(lab_off, lab_on)
print("labels bit-identical kernel on/off ok")
_cluster._FORCE_SORT_KERNEL = None
print("done")
